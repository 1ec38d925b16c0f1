package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The 60-bit profile difference-hash of a BINARY payload in one byte
  * walk — the perceptual-dedup STUB path
  * ([[graft.operators.Multimodal.perceptualHashes]]'s fallback for
  * payloads no image reader claims) as a codegen'd kernel, so the SQL
  * door (`graft_phash`) computes the identical hash inside whole-stage
  * codegen.
  *
  * Semantics (one definition, shared with the operator through
  * [[ProfileHash60.compute]]): segment `j` of the N byte values is the
  * positions `k` with `k*61 div N = j`; its level is
  * `floor(sum/count)` of the UNSIGNED byte values (0 for an empty
  * segment when N < 61); bit `j` is set iff `level[j] < level[j+1]`.
  * 60 bits keeps the hash positive int64. A length-preserving local
  * edit perturbs only the segments it touches, so near-identical
  * payloads land within a few bits — what makes the 4×15 Hamming
  * banding work.
  *
  * This kernel is STUB-ONLY by design: real image decode is imperative
  * per-batch codec work ([[graft.operators.Multimodal]]'s
  * `mapPartitions` contract) and cannot be a Catalyst expression; on a
  * corpus with claimable image payloads use the operator, whose result
  * equals this kernel exactly for every unclaimable payload.
  * NULL payload → NULL. */
final case class ProfileHash60(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash"

  override def nullSafeEval(input: Any): Any =
    ProfileHash60.computeBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ProfileHash60.computeBytes($c);")

  override protected def withNewChildInternal(
      newChild: Expression): ProfileHash60 = copy(child = newChild)
}

object ProfileHash60 {

  val Segments: Int = 61 // 60 adjacent comparisons = 60 bits

  /** The shared arithmetic over any integer value profile (payload
    * bytes for the stub path, luminance samples for real images). */
  def compute(vals: Array[Int]): Long = {
    val n = vals.length
    val sums = new Array[Long](Segments)
    val cnts = new Array[Long](Segments)
    var k = 0
    while (k < n) {
      val s = (k.toLong * Segments / n).toInt
      sums(s) += vals(k); cnts(s) += 1; k += 1
    }
    var h = 0L
    var j = 0
    var prev = if (cnts(0) == 0L) 0L else sums(0) / cnts(0)
    while (j < Segments - 1) {
      val next = if (cnts(j + 1) == 0L) 0L else sums(j + 1) / cnts(j + 1)
      if (prev < next) h |= 1L << j
      prev = next
      j += 1
    }
    h
  }

  /** [[compute]] over a payload's unsigned byte values (the stub
    * profile; called from generated code). */
  def computeBytes(payload: Array[Byte]): Long = {
    val vals = new Array[Int](payload.length)
    var i = 0
    while (i < payload.length) { vals(i) = payload(i) & 0xff; i += 1 }
    compute(vals)
  }
}
