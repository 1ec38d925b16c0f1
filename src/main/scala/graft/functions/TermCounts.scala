package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The term-frequency map of one document in ONE pass —
  * `map<term, count>` over the doc's non-empty space-separated tokens
  * (the BM25/quality-gate tokenization; case-sensitive).
  *
  * Why an expression: TF-IDF's tf stage exploded the corpus token
  * stream and aggregated it through a `groupBy(doc, term)` exchange —
  * the widest shuffle in the operator, one row per corpus TOKEN. The
  * per-document frequencies are local, so this kernel folds them in
  * one walk; `explode(graft_term_counts(text))` then yields the same
  * (doc, term, tf) rows as a NARROW projection, map-keys are the
  * doc's distinct tokens for free (each key appears once), and the
  * downstream document-frequency aggregate starts from per-doc-unique
  * rows exactly as it did from the groupBy output.
  *
  * Key order in the map is insertion order (first occurrence in the
  * document) — callers must not depend on row order, same as the
  * groupBy output order they replaced. NULL text → NULL map.
  */
final case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_term_counts"

  override def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): TermCounts = copy(child = newChild)
}

object TermCounts {

  /** One walk per document; called from both the interpreted eval and
    * the generated code. Token slices are zero-copy views; insertion
    * order preserved so output is deterministic per document. */
  def compute(text: UTF8String): MapData = {
    val b = text.getBytes
    val n = b.length
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var tokStart = -1
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        if (tokStart >= 0) { // close the (non-empty) token
          val tok = UTF8String.fromBytes(b, tokStart, i - tokStart)
          val c = counts.get(tok)
          if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    val k = counts.size()
    val keys = new Array[Any](k)
    val vals = new Array[Any](k)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue()(0)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(vals))
  }

  def apply(text: Column): Column =
    GraftColumn(TermCounts(GraftColumn.expr(text)))
}

/** `size(split(text, sep))` without materializing the token array — a
  * document's token COUNT as two byte-counting modes:
  *
  *  - `bySpaceOnly = true`  ≡ `size(split(text, " "))`: Java split on
  *    the literal space with limit -1 keeps every empty part, so the
  *    count is exactly (space bytes) + 1;
  *  - `bySpaceOnly = false` ≡ `size(split(text, "\s+"))`: parts are
  *    separated by runs of Java-regex `\s` (ASCII), leading/trailing
  *    empty parts kept, so the count is (ws runs) + 1.
  *
  * Callers wanting `split(trim(text), ...)` wrap `trim` themselves —
  * the trim stays visible in the plan and keeps its exact
  * spaces-only semantics. Why: the chunking/packing/corpus-stats
  * paths evaluated a full `split` — one boxed UTF8String per token,
  * hundreds per document — only to take the array's length. NULL →
  * NULL, identical to `size(split(NULL))` under
  * `legacySizeOfNull=false`.
  */
final case class SplitCount(child: Expression, bySpaceOnly: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_split_count"

  override def nullSafeEval(input: Any): Any =
    SplitCount.compute(input.asInstanceOf[UTF8String], bySpaceOnly)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SplitCount.compute($c, $bySpaceOnly);")

  override protected def withNewChildInternal(
      newChild: Expression): SplitCount = copy(child = newChild)
}

object SplitCount {

  @inline private def isWs(ci: Int): Boolean =
    ci == 0x20 || ci == 0x09 || ci == 0x0A || ci == 0x0B ||
      ci == 0x0C || ci == 0x0D

  def compute(text: UTF8String, bySpaceOnly: Boolean): Long = {
    val b = text.getBytes
    val n = b.length
    var cnt = 0L
    if (bySpaceOnly) {
      var i = 0
      while (i < n) { if (b(i) == 0x20) cnt += 1L; i += 1 }
    } else {
      var inWs = false
      var i = 0
      while (i < n) {
        val ws = isWs(b(i) & 0xFF)
        if (ws && !inWs) cnt += 1L
        inWs = ws
        i += 1
      }
    }
    cnt + 1L
  }

  def apply(text: Column, bySpaceOnly: Boolean): Column =
    GraftColumn(SplitCount(GraftColumn.expr(text), bySpaceOnly))
}

/** `regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")` — the
  * BPE-ish pre-tokenizer count — as one byte walk.
  *
  * Java regex alternation is ordered and greedy, so at every position
  * the match is: a maximal ASCII-letter run, else a maximal digit run,
  * else exactly ONE codepoint that is neither alphanumeric nor `\s`
  * (every non-ASCII codepoint lands here); `\s` (ASCII) matches
  * nothing and is skipped. The walk counts letter runs, digit runs,
  * and individual symbol codepoints — the same total, without the
  * regex engine. NULL → NULL.
  */
final case class BpeishTokenCount(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpeish_count"

  override def nullSafeEval(input: Any): Any =
    BpeishTokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeishTokenCount.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): BpeishTokenCount = copy(child = newChild)
}

object BpeishTokenCount {

  def compute(text: UTF8String): Long = {
    val b = text.getBytes
    val n = b.length
    var cnt = 0L
    var i = 0
    while (i < n) {
      val ci = b(i) & 0xFF
      if (ci < 0x80) {
        if ((ci >= 'A' && ci <= 'Z') || (ci >= 'a' && ci <= 'z')) {
          cnt += 1L // letter run
          i += 1
          while (i < n && {
            val c2 = b(i) & 0xFF
            (c2 >= 'A' && c2 <= 'Z') || (c2 >= 'a' && c2 <= 'z')
          }) i += 1
        } else if (ci >= '0' && ci <= '9') {
          cnt += 1L // digit run
          i += 1
          while (i < n && { val c2 = b(i) & 0xFF; c2 >= '0' && c2 <= '9' })
            i += 1
        } else {
          val ws = ci == 0x20 || ci == 0x09 || ci == 0x0A ||
            ci == 0x0B || ci == 0x0C || ci == 0x0D
          if (!ws) cnt += 1L // single ASCII symbol
          i += 1
        }
      } else {
        cnt += 1L // one non-ASCII codepoint = one symbol match
        i += 1
        while (i < n && (b(i) & 0xC0) == 0x80) i += 1 // continuations
      }
    }
    cnt
  }

  def apply(text: Column): Column =
    GraftColumn(BpeishTokenCount(GraftColumn.expr(text)))
}
