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
