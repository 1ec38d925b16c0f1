package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** How many DISTINCT word n-grams of one document appear in a fixed
  * n-gram set — the decontamination membership test as one pass.
  *
  * Why an expression: the join formulation exploded every corpus
  * document into its n-gram rows and aggregated the matches back
  * through a `groupBy(doc)` exchange — per-token corpus rows for a
  * per-document integer, the same shape every other r17 kernel
  * removed. When the holdout fits the broadcast budget (the operator
  * already counts it), the set rides the expression as ONE reference
  * object (the `NearestCentroids` bounded-collect precedent) and each
  * document answers locally; the oversized-holdout path keeps the
  * shuffled join.
  *
  * Semantics are bit-identical to the join form: n-grams are
  * `concat_ws(" ", slice(split(text, " "), i, n))` — i.e. the original
  * substring spanning n consecutive space-split parts (empty parts
  * included, exactly as `Corpus.wordNgrams` built them); fewer than n
  * parts → 0; the count is over DISTINCT matched n-grams
  * (`count_distinct`). NULL text → NULL (the caller coalesces to 0,
  * as the left join did).
  */
final case class NgramMatches(child: Expression, n: Int,
    grams: Array[String]) extends UnaryExpression {

  require(n > 0, s"n must be positive: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ngram_matches"

  @transient private lazy val gramSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](grams.length * 2)
    grams.foreach(g => s.add(UTF8String.fromString(g)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    NgramMatches.compute(input.asInstanceOf[UTF8String], n, gramSet)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("gramSet", gramSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NgramMatches.compute(
         |  $c, $n, $setRef);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramMatches = copy(child = newChild)

  // the array field breaks case-class equality; compare by value so
  // subexpression elimination and plan matching still fire
  override def equals(other: Any): Boolean = other match {
    case o: NgramMatches => o.child == child && o.n == n &&
      java.util.Arrays.equals(o.grams.asInstanceOf[Array[AnyRef]],
        grams.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(n),
      Integer.valueOf(java.util.Arrays.hashCode(
        grams.asInstanceOf[Array[AnyRef]])))
}

object NgramMatches {

  /** One walk per document: part boundaries once, then each n-gram is
    * the zero-copy substring spanning n consecutive parts; distinct
    * MATCHED grams counted in a (matched-only) set. */
  def compute(text: UTF8String, n: Int,
      grams: java.util.HashSet[UTF8String]): Long = {
    val b = text.getBytes
    val len = b.length
    var nParts = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var partStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || b(i) == 0x20) {
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
    if (nParts < n) return 0L
    val matched = new java.util.HashSet[UTF8String]()
    var k = 0
    while (k + n - 1 < nParts) {
      val g = UTF8String.fromBytes(b, starts(k),
        ends(k + n - 1) - starts(k))
      if (grams.contains(g)) matched.add(g)
      k += 1
    }
    matched.size.toLong
  }

  def apply(text: Column, n: Int, grams: Array[String]): Column =
    GraftColumn(NgramMatches(GraftColumn.expr(text), n, grams))
}
