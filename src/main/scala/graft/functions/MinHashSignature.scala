package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's full MinHash
  * signature in ONE pass: every `shingleLen`-char window of the input is
  * hashed with the polynomial `h(i) = (Σ_j cp(i+j)·131^(n-1-j)) mod
  * (2^31-1)` and, per seed, `min(h ⊕ seed)` is folded on the fly. Output:
  * `array<long>` of `seeds.length` signature values.
  *
  * Why an expression and not composed builtins (the measured history of
  * this hot path, sf0.1, 5k docs): higher-order `transform` formulations
  * are interpreted — no codegen, no CSE inside lambda bodies (2.9 s);
  * per-window `substr` is O(len²) because `UTF8String.substring` scans
  * from the start (13.9 s); explode + codegen'd `element_at` hashing was
  * the best composition (0.8 s) but still pays one interpreted
  * array-build per doc, ~290 exploded rows per doc, and a groupBy(doc)
  * shuffle. This expression runs the whole fold in one tight JVM loop per
  * document inside whole-stage codegen — no explode, no shuffle, no
  * per-window allocation (0.1 s; and at 100 TB the removed per-doc
  * interpreter overhead and shuffle are what matter).
  *
  * Semantics are byte-identical to the composed pipeline and the DuckDB
  * oracle SQL ([[graft.SparkEntry.oracleSql]] generates the same formula
  * from [[MinHashSignature.hashPows]]): characters past end-of-string
  * count 0 (docs shorter than `shingleLen` hash their zero-padded
  * prefix); code points are per UTF-16 unit, parity with SQL-engine
  * `ascii(substr(...))` holds for BMP text.
  *
  * Reference behavior analog: banded MinHash over character shingles
  * (`smoltable` has no dedup operators; this is part of the
  * training-data-pipeline extension surface).
  */
final case class MinHashSignature(child: Expression, shingleLen: Int,
    seeds: Array[Long])
    extends UnaryExpression {

  // ExpectsInputTypes/AbstractDataType are private[sql] in Spark 4.1.2's
  // ScalaSig outside an org.apache.spark.sql package, so type-check with
  // public types directly.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"

  private lazy val pows: Array[Long] =
    MinHashSignature.hashPows(shingleLen).toArray

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(
      input.asInstanceOf[UTF8String].toString, shingleLen, pows, seeds)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val powsRef = ctx.addReferenceObj("pows", pows, "long[]")
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashSignature.compute(
         |  $c.toString(), $shingleLen, $powsRef, $seedsRef);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)

  // Array[Long] breaks case-class equality/semanticEquals (reference
  // equality on arrays would defeat subexpression elimination and plan
  // matching), so compare seeds by value.
  override def equals(other: Any): Boolean = other match {
    case m: MinHashSignature =>
      m.child == child && m.shingleLen == shingleLen &&
        java.util.Arrays.equals(m.seeds, seeds)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(shingleLen),
      Integer.valueOf(java.util.Arrays.hashCode(seeds)))
}

object MinHashSignature {

  /** 2^31 - 1 (Mersenne prime), the polynomial hash modulus. */
  val HashP: Long = 2147483647L

  /** `131^k mod HashP` for k = 0..n-1. Pure 64-bit arithmetic, so the
    * identical formula runs in any ANSI SQL engine — which is what makes
    * the signatures oracle-verifiable. */
  def hashPows(n: Int): Seq[Long] =
    Iterator.iterate(1L)(x => x * 131 % HashP).take(n).toSeq

  /** One tight loop per document; called from both the interpreted eval
    * and the generated code. `len - n + 1` windows (min 1 — short docs
    * hash their zero-padded prefix), each window's hash XOR-folded into
    * the per-seed running minimum. */
  def compute(s: String, n: Int, pows: Array[Long],
      seeds: Array[Long]): ArrayData = {
    val len = s.length
    val nW = math.max(len - (n - 1), 1)
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    var i = 0
    while (i < nW) {
      var h = 0L
      var j = 0
      while (j < n) {
        val cp = if (i + j < len) s.charAt(i + j).toLong else 0L
        h += cp * pows(n - 1 - j)
        j += 1
      }
      h %= HashP
      var k = 0
      while (k < seeds.length) {
        val x = h ^ seeds(k)
        if (x < mins(k)) mins(k) = x
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-level entry point. */
  def apply(text: Column, shingleLen: Int, seeds: Seq[Long]): Column =
    GraftColumn(
      MinHashSignature(GraftColumn.expr(text), shingleLen, seeds.toArray))
}
