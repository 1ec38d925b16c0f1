package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd vector kernels for the similarity operators.
  *
  * Why expressions and not the `zip_with`/`aggregate` higher-order
  * builtins they replace: HOFs are interpreted — every element allocates a
  * lambda frame and boxes through `InternalRow`, and nothing inside the
  * lambda participates in whole-stage codegen or subexpression
  * elimination. The ANN hot path evaluates these kernels per candidate
  * pair (cosine) and per corpus row × hash table (projections), which at
  * 100 TB is exactly the interpreted overhead the MinHashSignature rewrite
  * already measured as dominant (see its scaladoc). Both kernels run one
  * tight JVM loop inside codegen.
  *
  * Semantics are bit-identical to the composed-builtin formulations (and
  * thus to the DuckDB oracle):
  *  - accumulation is the same left-to-right fold order;
  *  - the fixed-point conversion `round(x·10^6)` rounds half away from
  *    zero, matching Spark's `round` (BigDecimal HALF_UP) and DuckDB's
  *    `round` — NOT `Math.round`, which rounds half toward +∞ and would
  *    flip negative-tie components.
  *
  * Deliberate divergence on MALFORMED input: a length-mismatched pair (or
  * an embedding shorter than the plane dimension) computes over the common
  * prefix, where the `zip_with` formulation would null-pad and propagate
  * NULL through the fold. Likewise a NULL ELEMENT inside an array is
  * SKIPPED (contributes 0 to the accumulator) — checked explicitly with
  * `isNullAt`, so GenericArrayData and UnsafeArrayData agree (unchecked,
  * Generic would NPE on unboxing while Unsafe silently reads 0) — where
  * the HOF fold would null the whole result. Embeddings are fixed-width
  * non-null by schema, so either shape means corruption; pinned
  * prefix/skip semantics keep the kernels codegen-simple (primitive,
  * non-nullable outputs) and, unlike engine-dependent NPEs, are at least
  * deterministic. `NearestCentroids` (assignment, where a wrong answer is
  * silent) instead validates and throws — see its scaladoc.
  */
object VectorOps {

  /** Fixed-point component: `round(double(x) * 1e6)` half-away-from-zero. */
  @inline def fixedPoint(x: Double): Long = {
    val a = x * 1000000.0
    (if (a >= 0) Math.floor(a + 0.5) else Math.ceil(a - 0.5)).toLong
  }
}

/** `rows` integer projections of one embedding in ONE pass: output
  * `array<long>` where entry `r` is `Σ_d fixedPoint(emb(d)) ·
  * signs(r·dim + d)` — every hash table × hyperplane row of the ANN index
  * computed together, so the per-element fixed-point conversion is done
  * once regardless of how many planes consume it.
  */
final case class SignProjections(child: Expression, rows: Int,
    signs: Array[Long])
    extends UnaryExpression {

  // ExpectsInputTypes/AbstractDataType are private[sql] in Spark 4.1.2's
  // ScalaSig outside an org.apache.spark.sql package, so type-check with
  // public types directly (the MinHashSignature pattern).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_projections"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    SignProjections.compute(
      input.asInstanceOf[ArrayData], rows, signs, isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.SignProjections.compute(
         |  $c, $rows, $signsRef, $isFloat);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignProjections = copy(child = newChild)

  // Array[Long] breaks case-class equality (reference equality on arrays
  // would defeat subexpression elimination — the probe derivations read
  // this expression many times per row), so compare signs by value.
  override def equals(other: Any): Boolean = other match {
    case s: SignProjections =>
      s.child == child && s.rows == rows &&
        java.util.Arrays.equals(s.signs, signs)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(rows),
      Integer.valueOf(java.util.Arrays.hashCode(signs)))
}

object SignProjections {

  /** One pass: fixed-point each element once, scatter into all rows. */
  def compute(arr: ArrayData, rows: Int, signs: Array[Long],
      isFloat: Boolean): ArrayData = {
    val dim = signs.length / rows
    val n = math.min(arr.numElements(), dim)
    val acc = new Array[Long](rows)
    var d = 0
    while (d < n) {
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      val v = VectorOps.fixedPoint(x)
      var r = 0
      while (r < rows) {
        acc(r) += v * signs(r * dim + d)
        r += 1
      }
      d += 1
    }
    new GenericArrayData(acc)
  }

  /** Column-level entry point; `signs` is one Seq per projection row. */
  def apply(emb: Column, signs: Seq[Seq[Long]]): Column =
    GraftColumn(SignProjections(GraftColumn.expr(emb), signs.length,
      signs.flatten.toArray))
}

/** Nearest-centroid id by cosine similarity — the IVF assignment step as
  * ONE codegen'd scalar kernel: a row's list assignment is a pure function
  * of (embedding, centroid matrix), so it needs no join, no aggregation,
  * and no shuffle — just a per-row O(C·dim) loop over a broadcast-style
  * literal matrix. Per-centroid similarity is computed EXACTLY like
  * [[CosineSimilarity.compute]] (same fold order, same
  * `dot / sqrt / sqrt` sequence), so assignment and rescoring can never
  * disagree about a similarity value; ties break toward the smallest
  * centroid id (`ids` must be ascending; strict `>` keeps the first max),
  * mirroring the oracle's `ORDER BY sim DESC, cid ASC`.
  */
final case class NearestCentroid(child: Expression, ids: Array[Long],
    cents: Array[Double], dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_centroid"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(
      input.asInstanceOf[ArrayData], ids, cents, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NearestCentroid.compute(
         |  $c, $idsRef, $centsRef, $dim, $isFloat);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case n: NearestCentroid =>
      n.child == child && n.dim == dim &&
        java.util.Arrays.equals(n.ids, ids) &&
        java.util.Arrays.equals(n.cents, cents)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(dim),
      Integer.valueOf(java.util.Arrays.hashCode(ids)),
      Integer.valueOf(java.util.Arrays.hashCode(cents)))
}

object NearestCentroid {

  /** Scan centroids in ascending-id order keeping the strictly-best
    * cosine — identical arithmetic to [[CosineSimilarity.compute]]. */
  def compute(arr: ArrayData, ids: Array[Long], cents: Array[Double],
      dim: Int, isFloat: Boolean): Long = {
    val n = math.min(arr.numElements(), dim)
    var best = 0L
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < ids.length) {
      val off = c * dim
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val y = cents(off + i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      val sim = dot / Math.sqrt(na) / Math.sqrt(nb)
      if (sim > bestSim) { bestSim = sim; best = ids(c) }
      c += 1
    }
    best
  }

  /** Column-level entry point; `centroids` as (id, vector) in ascending
    * id order, padded/truncated to `dim` components. */
  def apply(emb: Column, centroids: Seq[(Long, Array[Double])],
      dim: Int): Column = {
    require(centroids.map(_._1) == centroids.map(_._1).sorted,
      "centroid ids must be ascending (tiebreak contract)")
    val flat = new Array[Double](centroids.length * dim)
    centroids.zipWithIndex.foreach { case ((_, v), c) =>
      System.arraycopy(v, 0, flat, c * dim, math.min(v.length, dim))
    }
    GraftColumn(NearestCentroid(GraftColumn.expr(emb),
      centroids.map(_._1).toArray, flat, dim))
  }
}

/** Cosine similarity of two embeddings as one fused loop: dot product and
  * both norms accumulate together (three doubles per element), then
  * `dot / sqrt(na) / sqrt(nb)` — the identical operation/order sequence as
  * the `aggregate(zip_with(...))` fold it replaces, so results are
  * bit-exact with the previous formulation and the DuckDB oracle.
  */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_similarity"

  private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.CosineSimilarity.compute(
         |  $a, $b, $leftFloat, $rightFloat);""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / Math.sqrt(na) / Math.sqrt(nb)
  }

  def apply(a: Column, b: Column): Column =
    GraftColumn(
      CosineSimilarity(GraftColumn.expr(a), GraftColumn.expr(b)))
}

/** Exact int64 dot product of two integral arrays in one fused loop —
  * the int8-rescore kernel: replaces the interpreted
  * `aggregate(zip_with(a·cast·long * b·cast·long))` fold the quantized
  * ANN family scored with (per pair it allocated a zip array and boxed
  * every element; at a 100× full-pass rescore that interpretation was
  * the entire cost — the same HOF lesson as [[CosineSimilarity]] and
  * `NearestCentroids`). Same left-to-right summation over the common
  * prefix, exact int64 throughout (64-dim int8: |dot| ≤ 64·127² —
  * 21 spare bits even at 4k dims), so results are bit-identical to the
  * composed form and the DuckDB oracle. Squared norms are
  * `IntDotProduct(q, q)`.
  *
  * Same deliberate prefix semantics on malformed (length-mismatched)
  * input as the other kernels in this file — see the file doc.
  */
final case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def code(t: DataType): Int = t match {
    case ArrayType(org.apache.spark.sql.types.ByteType, _) => 0
    case ArrayType(org.apache.spark.sql.types.ShortType, _) => 1
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case _ => -1
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (code(left.dataType) >= 0 && code(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral-array inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"

  private lazy val aCode = code(left.dataType)
  private lazy val bCode = code(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    IntDotProduct.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], aCode, bCode)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.IntDotProduct.compute(
         |  $a, $b, $aCode, $bCode);""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {

  @inline private def get(a: ArrayData, i: Int, code: Int): Long =
    code match {
      case 0 => a.getByte(i).toLong
      case 1 => a.getShort(i).toLong
      case 2 => a.getInt(i).toLong
      case _ => a.getLong(i)
    }

  def compute(a: ArrayData, b: ArrayData, aCode: Int, bCode: Int): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      // null elements skipped (contribute 0) — see the file doc
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += get(a, i, aCode) * get(b, i, bCode)
      i += 1
    }
    s
  }

  def apply(a: Column, b: Column): Column =
    GraftColumn(
      IntDotProduct(GraftColumn.expr(a), GraftColumn.expr(b)))
}

/** Exact int64 squared-L2 distance of two integral arrays in one fused
  * loop — the IVF candidate-rescore kernel: replaces the interpreted
  * `aggregate(zip_with((x-y)·(x-y)))` fold `Clustering.dist2` scored
  * candidates with, evaluated once per (query × probed-candidate) pair.
  * Same left-to-right summation over the common prefix, exact int64
  * throughout (fixed-point components are ≤ ~2^20, so each squared
  * term fits with >20 spare bits at 4k dims), so results are
  * bit-identical to the composed form and the DuckDB oracle.
  *
  * Same deliberate prefix semantics on malformed (length-mismatched)
  * input as the other kernels in this file — see the file doc.
  */
final case class IntSquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  private def code(t: DataType): Int = t match {
    case ArrayType(org.apache.spark.sql.types.ByteType, _) => 0
    case ArrayType(org.apache.spark.sql.types.ShortType, _) => 1
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case _ => -1
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (code(left.dataType) >= 0 && code(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral-array inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_l2sq"

  private lazy val aCode = code(left.dataType)
  private lazy val bCode = code(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    IntSquaredL2.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], aCode, bCode)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.IntSquaredL2.compute(
         |  $a, $b, $aCode, $bCode);""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntSquaredL2 =
    copy(left = newLeft, right = newRight)
}

object IntSquaredL2 {

  @inline private def get(a: ArrayData, i: Int, code: Int): Long =
    code match {
      case 0 => a.getByte(i).toLong
      case 1 => a.getShort(i).toLong
      case 2 => a.getInt(i).toLong
      case _ => a.getLong(i)
    }

  def compute(a: ArrayData, b: ArrayData, aCode: Int, bCode: Int): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      // null elements skipped (contribute 0) — see the file doc
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = get(a, i, aCode) - get(b, i, bCode)
        s += d * d
      }
      i += 1
    }
    s
  }

  def apply(a: Column, b: Column): Column =
    GraftColumn(
      IntSquaredL2(GraftColumn.expr(a), GraftColumn.expr(b)))
}

/** `transform(emb, x -> floor(x * scale + 0.5))` as one fused loop —
  * the fixed-point quantizer feeding the k-means / IVF integer
  * kernels. Same IEEE arithmetic per element (widen to double,
  * multiply, add, floor — deterministic everywhere, no HALF_UP
  * ambiguity), null elements stay null; replaces an interpreted
  * per-element lambda evaluated once per corpus row.
  */
final case class FixedPointQuantize(child: Expression, scale: Double)
    extends UnaryExpression {

  private def code(t: DataType): Int = t match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case _ => -1
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (code(child.dataType) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got " +
        child.dataType.catalogString)
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "graft_fx_quantize"

  private lazy val tCode = code(child.dataType)

  override def nullSafeEval(input: Any): Any =
    FixedPointQuantize.compute(input.asInstanceOf[ArrayData], scale, tCode)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.FixedPointQuantize.compute(
         |  $c, $scale, $tCode);""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): FixedPointQuantize = copy(child = newChild)
}

object FixedPointQuantize {

  def compute(a: ArrayData, scale: Double, tCode: Int): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = if (tCode == 0) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = java.lang.Math.floor(d * scale + 0.5d).toLong
      } // else: null element stays null (transform's per-element null)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(emb: Column, scale: Double): Column =
    GraftColumn(FixedPointQuantize(GraftColumn.expr(emb), scale))
}

/** `Similarity.scalarQuantize`'s int8 quantizer as one fused loop:
  * maxabs over `|coalesce(x, 0)|`, all-zero when the max is 0 (or the
  * array is empty), else `floor(x·127/maxabs + 0.5)` per element —
  * the exact composed arithmetic (null elements quantize as 0.0, the
  * float kernels' `toD` contract), byte output always in [-127, 127].
  * Replaces three interpreted per-element lambdas per corpus row in
  * the quantized-ANN family.
  */
final case class ScalarQuantizeInt8(child: Expression)
    extends UnaryExpression {

  private def code(t: DataType): Int = t match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case _ => -1
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (code(child.dataType) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got " +
        child.dataType.catalogString)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def prettyName: String = "graft_int8_quantize"

  private lazy val tCode = code(child.dataType)

  override def nullSafeEval(input: Any): Any =
    ScalarQuantizeInt8.compute(input.asInstanceOf[ArrayData], tCode)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ScalarQuantizeInt8.compute(
         |  $c, $tCode);""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): ScalarQuantizeInt8 = copy(child = newChild)
}

object ScalarQuantizeInt8 {

  def compute(a: ArrayData, tCode: Int): ArrayData = {
    val n = a.numElements()
    @inline def toD(i: Int): Double =
      if (a.isNullAt(i)) 0.0d
      else if (tCode == 0) a.getFloat(i).toDouble
      else a.getDouble(i)
    var maxabs = 0.0d
    var i = 0
    while (i < n) {
      val v = java.lang.Math.abs(toD(i))
      // array_max orders NaN greatest: one NaN element poisons maxabs
      // (the composed form then floors NaN per element -> all zeros)
      if (java.lang.Double.isNaN(v)) { maxabs = Double.NaN; i = n }
      else if (v > maxabs) maxabs = v
      i += 1
    }
    val out = new Array[Any](n)
    if (maxabs == 0.0d) {
      var j = 0
      while (j < n) { out(j) = 0.toByte; j += 1 }
    } else {
      var j = 0
      while (j < n) {
        out(j) = java.lang.Math.floor(toD(j) * 127.0d / maxabs + 0.5d)
          .toByte
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  def apply(emb: Column): Column =
    GraftColumn(ScalarQuantizeInt8(GraftColumn.expr(emb)))
}
