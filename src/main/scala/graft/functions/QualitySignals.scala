package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All five pre-training quality signals of one document in ONE pass
  * over its UTF-8 bytes — the quality-gate kernel.
  *
  * Output: `struct<n_tokens, n_chars, n_sym, n_distinct, n_stop>`
  * (all int64):
  *  - `n_tokens`  — non-empty space-separated tokens;
  *  - `n_chars`   — codepoints outside Java-regex `\s`
  *                  (`[ \t\n\x0B\f\r]` — ASCII only, the non-Unicode
  *                  default both engines use);
  *  - `n_sym`     — codepoints matching `[^A-Za-z0-9\s]` (every
  *                  non-ASCII codepoint qualifies);
  *  - `n_distinct`— distinct tokens (binary equality);
  *  - `n_stop`    — tokens (with multiplicity) in the stopword set.
  *
  * Why an expression and not the composed-builtin soup it replaces
  * (`size(filter(split(text," ")))` ×7 + two `regexp_replace` lengths
  * + `array_distinct` + a stopword-`isin` filter): every lambda in a
  * higher-order builtin gets fresh ExprIds, so the seven
  * `filter(split(...))` subtrees are all DIFFERENT trees to
  * subexpression elimination — the gate re-tokenized every document
  * about ten times per evaluation, interpreted (HOFs are
  * CodegenFallback), re-boxing each token. The prep pipeline evaluates
  * the gate on two corpus branches (main + language-count), so at
  * 100 TB the redundancy is ~20 tokenizations per surviving document.
  * This kernel tokenizes ONCE, classifies each byte as it passes, and
  * is deterministic with value equality — so the repeated
  * `GetStructField(kernel(text))` references across the gate's seven
  * conjuncts (and across a telemetry projection's five columns)
  * collapse to one evaluation per row under codegen subexpression
  * elimination.
  *
  * Semantics are bit-identical to the composed form (and the DuckDB
  * oracle): tokens split on the SPACE character only (`split(text," ")`
  * — a token may contain tabs/newlines), `\s`/alnum classes are the
  * ASCII Java-regex defaults, codepoints are counted by UTF-8 lead
  * bytes exactly as `length()` does, and token equality is binary —
  * the same equality `array_distinct` and `INSET` use. NULL text →
  * NULL struct (each composed signal was NULL), via the default
  * null-intolerant eval.
  */
final case class QualitySignalsExpr(child: Expression,
    stopwords: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = QualitySignalsExpr.Schema
  override def prettyName: String = "graft_quality_signals"

  // built once per task (the expression is serialized to executors;
  // the set rebuilds lazily there), shared by eval and codegen
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    QualitySignalsExpr.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.QualitySignalsExpr.compute(
         |  $c, $setRef);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): QualitySignalsExpr = copy(child = newChild)
}

object QualitySignalsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  /** One tight loop per document; called from both the interpreted
    * eval and the generated code. `getBytes` may copy once (row-buffer
    * slice); token slices afterwards are zero-copy `fromBytes` views. */
  def compute(text: UTF8String,
      stop: java.util.HashSet[UTF8String]): GenericInternalRow = {
    val b = text.getBytes
    val n = b.length
    var nTok = 0L
    var nChars = 0L
    var nSym = 0L
    var nStop = 0L
    val distinct = new java.util.HashSet[UTF8String]()
    var tokStart = -1
    var i = 0
    while (i <= n) {
      val boundary = i == n || b(i) == 0x20
      if (boundary) {
        if (tokStart >= 0) { // close the current token
          nTok += 1
          val tok = UTF8String.fromBytes(b, tokStart, i - tokStart)
          distinct.add(tok)
          if (stop.contains(tok)) nStop += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      if (i < n) {
        val ci = b(i) & 0xFF
        if ((ci & 0xC0) != 0x80) { // codepoint start (length() counts these)
          if (ci < 0x80) { // ASCII: Java-regex \s and [A-Za-z0-9]
            val ws = ci == 0x20 || ci == 0x09 || ci == 0x0A ||
              ci == 0x0B || ci == 0x0C || ci == 0x0D
            if (!ws) {
              nChars += 1
              val alnum = (ci >= '0' && ci <= '9') ||
                (ci >= 'A' && ci <= 'Z') || (ci >= 'a' && ci <= 'z')
              if (!alnum) nSym += 1
            }
          } else { // non-ASCII codepoint: not \s, not [A-Za-z0-9]
            nChars += 1
            nSym += 1
          }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, nChars, nSym,
      distinct.size.toLong, nStop))
  }

  def apply(text: Column, stopwords: Seq[String]): Column =
    GraftColumn(QualitySignalsExpr(GraftColumn.expr(text), stopwords))
}
