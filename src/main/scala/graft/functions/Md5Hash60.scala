package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's 60-bit md5 coin — `conv(substring(md5(x),1,15),16,10)`
  * — read directly from digest bytes.
  *
  * Why an expression: the composed form FORMATS the full 16-byte
  * digest as a 32-char hex string, substrings it, and re-PARSES 15 hex
  * chars back into a long — per row. Hex char k is nibble k of the
  * digest big-endian, so the value is just bytes 0..6 plus the high
  * nibble of byte 7 (the same read [[SimHashFingerprint]] uses). Every
  * deterministic sampler (threshold / weighted / stratified / split /
  * rebalance), the KMV sketch's per-row hash, shard routing and the
  * whitespace fingerprint flip this coin once per row — at 100 TB the
  * format-and-reparse detour is pure waste on every one of them.
  *
  * Bit-identical to the composed form and the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`; the JVM twin
  * is [[graft.model.PortableHash.md5Long60]] (OperatorsSpec pins all
  * three). Input is the STRING whose UTF-8 bytes feed md5 — callers
  * cast non-strings first, exactly as the composed `md5(cast(...))`
  * did. NULL → NULL.
  */
final case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_hash60"

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Hash60.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash60 = copy(child = newChild)
}

object Md5Hash60 {

  private val Md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): Long = {
    val b = text.getBytes
    val md = Md5.get()
    md.update(b, 0, b.length)
    val d = md.digest() // resets for the next row
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  def apply(text: Column): Column =
    GraftColumn(Md5Hash60(GraftColumn.expr(text)))
}

/** The whitespace-normalized content fingerprint —
  * `md5Hash60(regexp_replace(lower(text), "\s+", " "))` — without
  * materializing the normalized string: lowercase once
  * (`UTF8String.toLowerCase`, the exact `lower()`), then stream the
  * bytes into the digest collapsing every Java-`\s` run (ASCII) to a
  * single space as they pass (runs at the edges included, exactly as
  * the regex replaced them). Same 60-bit digest read as [[Md5Hash60]].
  * NULL → NULL, as the composed chain propagated it.
  */
final case class NormalizedFingerprint(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_normalized_fingerprint"

  override def nullSafeEval(input: Any): Any =
    NormalizedFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizedFingerprint.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizedFingerprint = copy(child = newChild)
}

object NormalizedFingerprint {

  private val Md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val Space = Array[Byte](0x20)

  @inline private def isWs(ci: Int): Boolean =
    ci == 0x20 || ci == 0x09 || ci == 0x0A || ci == 0x0B ||
      ci == 0x0C || ci == 0x0D

  def compute(text: UTF8String): Long = {
    val b = text.toLowerCase.getBytes
    val n = b.length
    val md = Md5.get()
    var i = 0
    while (i < n) {
      if (isWs(b(i) & 0xFF)) {
        md.update(Space, 0, 1) // one space per \s-run
        i += 1
        while (i < n && isWs(b(i) & 0xFF)) i += 1
      } else {
        val seg = i
        i += 1
        while (i < n && !isWs(b(i) & 0xFF)) i += 1
        md.update(b, seg, i - seg)
      }
    }
    val d = md.digest()
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  def apply(text: Column): Column =
    GraftColumn(NormalizedFingerprint(GraftColumn.expr(text)))
}
