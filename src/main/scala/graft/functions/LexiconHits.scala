package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-lexicon stopword hit counts of one document in ONE pass — the
  * language-ID kernel.
  *
  * Output: `struct<n_tokens, <name>_hits...>` (all int64, one hits
  * field per lexicon in the order given).
  *
  * Why an expression: the composed formulation
  * (`explode(split(lower(text), "\s+"))` → `groupBy(doc_id)` with one
  * conditional sum per language) shuffles the corpus's ENTIRE token
  * stream to count a handful of per-document integers — at 100 TB the
  * explode multiplies the exchange by mean tokens/doc (hundreds), and
  * it is the only reason language ID isn't a narrow projection. This
  * kernel lowercases once (`UTF8String.toLowerCase` — the exact
  * `lower()` semantics), walks the bytes once, and classifies each
  * token against a word→lexicon-bitmask map (words shared by several
  * lexicons, e.g. "de"/"la"/"un", count for each). Language ID becomes
  * a shuffle-free scan.
  *
  * Semantics are bit-identical to the composed form (and the DuckDB
  * oracle): tokenization is `split(lower(text), "\s+")` — parts
  * separated by RUNS of Java-regex `\s` (`[ \t\n\x0B\f\r]`, ASCII
  * only), so `n_tokens` counts the leading/trailing empty parts Java
  * split keeps with limit -1 (= ws-runs + 1; empty text → 1); those
  * empty parts hit no lexicon (no lexicon contains ""). Byte scanning
  * is UTF-8-safe: continuation bytes are ≥ 0x80 and can never collide
  * with the ASCII `\s` set. Token equality is binary post-lowercase —
  * the same equality the composed `isin` used. NULL text → NULL struct
  * (callers that must reproduce the composed form's explode-drop
  * filter nulls first).
  */
final case class LexiconHits(child: Expression,
    lexicons: Seq[(String, Seq[String])]) extends UnaryExpression {

  require(lexicons.nonEmpty, "at least one lexicon required")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(
    StructField("n_tokens", LongType, nullable = false) +:
      lexicons.map { case (name, _) =>
        StructField(s"${name}_hits", LongType, nullable = false)
      })
  override def prettyName: String = "graft_lexicon_hits"

  // word -> bitmask of lexicon indices; built once per task, shared by
  // eval and codegen (k <= 64 lexicons — a Long bitmask)
  @transient private lazy val wordMask: java.util.HashMap[UTF8String, java.lang.Long] = {
    require(lexicons.size <= 64, s"at most 64 lexicons, got ${lexicons.size}")
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    lexicons.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << i)))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    LexiconHits.compute(input.asInstanceOf[UTF8String], wordMask,
      lexicons.size)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("wordMask", wordMask,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String,java.lang.Long>")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.LexiconHits.compute(
         |  $c, $mapRef, ${lexicons.size});""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LexiconHits = copy(child = newChild)
}

object LexiconHits {

  @inline private def isWs(ci: Int): Boolean =
    ci == 0x20 || ci == 0x09 || ci == 0x0A || ci == 0x0B ||
      ci == 0x0C || ci == 0x0D

  /** One tight loop per document; called from both the interpreted
    * eval and the generated code. */
  def compute(text: UTF8String,
      wordMask: java.util.HashMap[UTF8String, java.lang.Long],
      k: Int): GenericInternalRow = {
    val b = text.toLowerCase.getBytes
    val n = b.length
    val hits = new Array[Long](k)
    var wsRuns = 0L
    var inWs = false
    var tokStart = -1
    var i = 0
    while (i <= n) {
      val ws = i < n && isWs(b(i) & 0xFF)
      if (i == n || ws) {
        if (tokStart >= 0) { // close the current (non-empty) token
          val mask = wordMask.get(UTF8String.fromBytes(b, tokStart,
            i - tokStart))
          if (mask != null) {
            var m = mask.longValue()
            while (m != 0L) {
              hits(java.lang.Long.numberOfTrailingZeros(m)) += 1L
              m &= m - 1L
            }
          }
          tokStart = -1
        }
        if (ws && !inWs) wsRuns += 1L
      } else if (tokStart < 0) tokStart = i
      inWs = ws
      i += 1
    }
    // Java split(regex, -1): parts = separator runs + 1 (leading and
    // trailing empty parts kept; empty text -> [""] -> 1)
    val out = new Array[Any](k + 1)
    out(0) = wsRuns + 1L
    var j = 0
    while (j < k) { out(j + 1) = hits(j); j += 1 }
    new GenericInternalRow(out)
  }

  def apply(text: Column, lexicons: Seq[(String, Seq[String])]): Column =
    GraftColumn(LexiconHits(GraftColumn.expr(text), lexicons))
}

/** Per-term frequencies of one document in ONE pass — the BM25 tf
  * kernel, [[LexiconHits]]'s retrieval-scoring sibling with the OTHER
  * tokenization the library pins: tokens are non-empty
  * space-separated parts (`filter(split(text, " "), _ != "")` — the
  * quality-gate/BM25 convention; a token may contain tabs/newlines),
  * matching is case-sensitive binary equality.
  *
  * Output: `struct<dl, tf_0..tf_{n-1}>` (int64) — document length
  * (non-empty token count) and one frequency per query term in the
  * given order.
  *
  * Why: BM25's per-document stage exploded the corpus's token stream
  * through a `groupBy(doc_id)` exchange to compute these integers —
  * the same waste [[LexiconHits]] removes from language ID. With this
  * kernel the per-doc frame is a narrow projection; only the 1-row
  * corpus-stats aggregate and the top-k remain, neither of which
  * carries per-token rows. NULL text → NULL struct (callers filter
  * nulls first, reproducing the composed form's pre-explode filter).
  */
final case class TermHits(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  // empty `terms` is allowed: the struct degenerates to just `dl`,
  // the shape bm25TopKMulti uses for its narrow document-length frame
  require(terms.distinct == terms, "terms must be distinct")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(
    StructField("dl", LongType, nullable = false) +:
      terms.indices.map(i =>
        StructField(s"tf_$i", LongType, nullable = false)))
  override def prettyName: String = "graft_term_hits"

  @transient private lazy val termIdx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TermHits.compute(input.asInstanceOf[UTF8String], termIdx, terms.size)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("termIdx", termIdx,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String,java.lang.Integer>")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.TermHits.compute(
         |  $c, $mapRef, ${terms.size});""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TermHits = copy(child = newChild)
}

object TermHits {

  /** One tight loop per document; called from both the interpreted
    * eval and the generated code. */
  def compute(text: UTF8String,
      termIdx: java.util.HashMap[UTF8String, Integer],
      k: Int): GenericInternalRow = {
    val b = text.getBytes
    val n = b.length
    var dl = 0L
    val tfs = new Array[Long](k)
    var tokStart = -1
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        if (tokStart >= 0) { // close the (non-empty) token
          dl += 1L
          val idx = termIdx.get(UTF8String.fromBytes(b, tokStart,
            i - tokStart))
          if (idx != null) tfs(idx.intValue()) += 1L
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    val out = new Array[Any](k + 1)
    out(0) = dl
    var j = 0
    while (j < k) { out(j + 1) = tfs(j); j += 1 }
    new GenericInternalRow(out)
  }

  def apply(text: Column, terms: Seq[String]): Column =
    GraftColumn(TermHits(GraftColumn.expr(text), terms))
}
