package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** The `n` nearest centroids of one fixed-point vector, by integer
  * squared-L2 with ties to the smallest centroid id — the k-means
  * assignment/probe kernel as ONE native codegen'd loop.
  *
  * Output: `array<struct<d: long, cid: long>>` of the `min(n, k)`
  * smallest `(dist2, cid)` pairs in ascending `(d, cid)` order.
  *
  * Why an expression and not the composed-builtin fold it replaces
  * (`array_min`/`array_sort` over k per-centroid
  * `aggregate(zip_with(...))` structs — the measured history, 100×
  * ScaleSmoke corpus, 200k vecs × ~1021 DISTINCT centroids × 64 dims):
  *
  *  - the composed form bakes k·d literal AST nodes into the plan (the
  *    constant-pool/driver hazard the centroid cap bounds but does not
  *    remove), and every HOF lambda is interpreted — per row it
  *    allocates k zip arrays and boxes k·d longs. Measured 246 s for
  *    the final assignment scan;
  *  - the r15 numbers looked 4× better only by accident: the synthetic
  *    scaled corpus's stride-100 seeds were 100 COPIES of 20 base
  *    vectors, and Catalyst subexpression elimination deduplicated the
  *    identical literal subtrees — a real corpus's distinct centroids
  *    get no such discount;
  *  - this expression stores the centroid matrix as ONE flat
  *    `long[k·d]` reference object (serialized once per task, zero AST
  *    growth, zero constant-pool pressure) and runs the k·d
  *    multiply-adds in a tight primitive loop inside whole-stage
  *    codegen. Same arithmetic, same tie-break, bit-identical output.
  *
  * Determinism contract (the DuckDB-oracle pin): pure int64 arithmetic,
  * centroids iterated in ascending-cid order, strict `<` replacement —
  * so equal distances keep the earlier (smaller) cid, exactly the
  * `(d, cid)` lexicographic order the composed form sorted by.
  */
final case class NearestCentroids(child: Expression, cids: Array[Long],
    flat: Array[Long], dim: Int, n: Int)
    extends UnaryExpression {

  require(cids.nonEmpty && dim > 0 && n > 0 &&
    flat.length == cids.length * dim,
    s"bad centroid geometry: k=${cids.length} dim=$dim flat=${flat.length}")

  // ExpectsInputTypes/AbstractDataType are private[sql] in Spark 4.1.2's
  // ScalaSig outside an org.apache.spark.sql package, so type-check with
  // public types directly (the MinHashSignature pattern).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", LongType, nullable = false),
      StructField("cid", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(input: Any): Any =
    NearestCentroids.compute(
      input.asInstanceOf[ArrayData], cids, flat, dim, n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val flatRef = ctx.addReferenceObj("flat", flat, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NearestCentroids.compute(
         |  $c, $cidsRef, $flatRef, $dim, $n);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroids = copy(child = newChild)

  // Array fields break case-class equality (reference equality would
  // defeat subexpression elimination and plan matching) — compare by
  // value.
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroids =>
      o.child == child && o.dim == dim && o.n == n &&
        java.util.Arrays.equals(o.cids, cids) &&
        java.util.Arrays.equals(o.flat, flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(dim),
      Integer.valueOf(n), Integer.valueOf(java.util.Arrays.hashCode(cids)),
      Integer.valueOf(java.util.Arrays.hashCode(flat)))
}

object NearestCentroids {

  /** One tight loop per row; called from both the interpreted eval and
    * the generated code. Maintains the running n-smallest `(d, cid)`
    * by insertion (n is 1..tens); strict `<` keeps the earlier —
    * smaller — cid on distance ties.
    *
    * Input contract (validated ONCE per row, before the k·d loop): the
    * vector must be dense with at least `dim` non-null elements —
    * unlike the prefix-tolerant kernels in VectorOps, a short or
    * null-holed vector here would silently assign to a wrong centroid
    * (reading 0s / garbage), so it fails fast with a diagnostic
    * instead. Validation also COPIES the dim-long query prefix into a
    * primitive array, so the hot k·d loop indexes a local `long[]`
    * rather than virtual-dispatching `ArrayData.getLong` k·dim times. */
  def compute(arr: ArrayData, cids: Array[Long], flat: Array[Long],
      dim: Int, n: Int): ArrayData = {
    if (arr.numElements() < dim)
      throw new IllegalArgumentException(
        s"graft_nearest_centroids requires dense vectors of >= $dim " +
          s"elements, got ${arr.numElements()}")
    val q = new Array[Long](dim)
    var j0 = 0
    while (j0 < dim) {
      if (arr.isNullAt(j0))
        throw new IllegalArgumentException(
          s"graft_nearest_centroids requires non-null vector elements; " +
            s"element $j0 is null")
      q(j0) = arr.getLong(j0)
      j0 += 1
    }
    val k = cids.length
    val m = math.min(n, k)
    val bestD = new Array[Long](m)
    val bestC = new Array[Long](m)
    java.util.Arrays.fill(bestD, Long.MaxValue)
    var c = 0
    while (c < k) {
      val base = c * dim
      var s = 0L
      var j = 0
      while (j < dim) {
        val diff = q(j) - flat(base + j)
        s += diff * diff
        j += 1
      }
      if (s < bestD(m - 1)) {
        var pos = m - 1
        while (pos > 0 && s < bestD(pos - 1)) {
          bestD(pos) = bestD(pos - 1)
          bestC(pos) = bestC(pos - 1)
          pos -= 1
        }
        bestD(pos) = s
        bestC(pos) = cids(c)
      }
      c += 1
    }
    val rows = new Array[Any](m)
    var i = 0
    while (i < m) {
      rows(i) = new GenericInternalRow(Array[Any](bestD(i), bestC(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Column-level entry point: centroids sorted by cid, flattened. */
  def apply(fx: Column, cents: Seq[(Long, Array[Long])], n: Int): Column = {
    val sorted = cents.sortBy(_._1)
    val dim = sorted.head._2.length
    sorted.foreach(c => require(c._2.length == dim,
      s"centroid ${c._1} dim ${c._2.length} != $dim"))
    GraftColumn(NearestCentroids(GraftColumn.expr(fx),
      sorted.map(_._1).toArray, sorted.flatMap(_._2).toArray, dim, n))
  }
}
