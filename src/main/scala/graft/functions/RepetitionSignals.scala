package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The repetition/boilerplate signals of one document in ONE pass —
  * token count, distinct-token count, and the maximum word-trigram
  * multiplicity.
  *
  * Output: `struct<n_tokens, n_distinct, max_trigram_count>` (int64).
  *
  * Why an expression: the composed formulation ran the corpus through
  * THREE exchanges and a join — explode(tokens) → groupBy(doc) for the
  * token stats, explode(trigrams) → groupBy(doc, ngram) →
  * groupBy(doc) for the trigram max — to produce three per-document
  * integers. Every signal is local to one document, so at 100 TB all
  * three exchanges (the widest carrying one row per corpus TRIGRAM)
  * are pure waste. This kernel computes them in one byte walk.
  *
  * Semantics are bit-identical to the composed form (and the DuckDB
  * oracle):
  *  - tokens are `split(text, " ")` parts with limit -1 — EMPTY parts
  *    included (consecutive/leading/trailing spaces), so
  *    `n_tokens = spaces + 1` and `""` is a countable, distinct-able
  *    token (`explode` emitted it too);
  *  - trigrams are `concat_ws(" ", slice(toks, i, 3))` — three
  *    consecutive parts re-joined by single spaces, which is exactly
  *    the original SUBSTRING from the start of part i to the end of
  *    part i+2 (parts are separated by single spaces), so each
  *    trigram is a zero-copy slice; fewer than 3 parts → 0 (the
  *    composed form's left-join `coalesce`);
  *  - token/trigram equality is binary (`count_distinct` / groupBy).
  *
  * NULL text → NULL struct (callers reproduce the composed form's
  * explode-drop by filtering nulls first).
  */
final case class RepetitionSignals(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = RepetitionSignals.Schema
  override def prettyName: String = "graft_repetition_signals"

  override def nullSafeEval(input: Any): Any =
    RepetitionSignals.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionSignals.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionSignals = copy(child = newChild)
}

object RepetitionSignals {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_trigram_count", LongType, nullable = false)))

  /** One walk per document; called from both the interpreted eval and
    * the generated code. Token and trigram values are zero-copy
    * `fromBytes` views into the (at most once copied) byte array. */
  def compute(text: UTF8String): GenericInternalRow = {
    val b = text.getBytes
    val n = b.length
    // part boundaries: part j spans [starts(j), ends(j))
    var nParts = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var partStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        if (nParts == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nParts * 2)
          ends = java.util.Arrays.copyOf(ends, nParts * 2)
        }
        starts(nParts) = partStart
        ends(nParts) = i
        nParts += 1
        partStart = i + 1
      }
      i += 1
    }
    val distinct = new java.util.HashSet[UTF8String]()
    var j = 0
    while (j < nParts) {
      distinct.add(UTF8String.fromBytes(b, starts(j), ends(j) - starts(j)))
      j += 1
    }
    var maxTri = 0L
    if (nParts >= 3) {
      val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
      var k = 0
      while (k + 2 < nParts) {
        // trigram = the original substring spanning parts k..k+2
        val tri = UTF8String.fromBytes(b, starts(k), ends(k + 2) - starts(k))
        val prev = counts.get(tri)
        val c = if (prev == null) 1L else prev.longValue() + 1L
        counts.put(tri, java.lang.Long.valueOf(c))
        if (c > maxTri) maxTri = c
        k += 1
      }
    }
    new GenericInternalRow(Array[Any](nParts.toLong,
      distinct.size.toLong, maxTri))
  }

  def apply(text: Column): Column =
    GraftColumn(RepetitionSignals(GraftColumn.expr(text)))
}
