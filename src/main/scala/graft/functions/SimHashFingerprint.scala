package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftColumn
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The SimHash fingerprint of one document in ONE pass — per-bit
  * majority vote of md5-derived hashes over the doc's DISTINCT word
  * tokens, as a single int64.
  *
  * Why an expression: the composed formulation exploded the token
  * stream, ran a corpus-wide `distinct()` exchange on (doc, token),
  * and a second `groupBy(doc)` exchange carrying `nBits`
  * conditional-sum votes — two corpus exchanges for one integer per
  * document. Every input to the fingerprint is local to the document,
  * so this kernel tokenizes, dedups into a hash set, hashes, and
  * votes in one walk; SimHash becomes a narrow projection and only
  * the (tiny) fingerprint-band comparisons downstream ever shuffle.
  *
  * Semantics are bit-identical to the composed form (and the DuckDB
  * oracle):
  *  - tokens are `split(text, " ")` parts with limit -1 — the EMPTY
  *    token from consecutive/leading/trailing spaces participates
  *    (once, post-distinct) exactly as it did through `explode`;
  *  - the per-token hash is `conv(substring(md5(tok),1,15),16,10)` —
  *    the first 60 bits of the md5 digest, read here directly from
  *    digest bytes (hex char k is nibble k big-endian, so hex chars
  *    0..14 = bytes 0..6 plus the high nibble of byte 7) instead of
  *    formatting and re-parsing a hex string;
  *  - vote per bit b is +1 if `(th >> b) & 1` else -1 over distinct
  *    tokens (exact int arithmetic — order-free), fingerprint sums
  *    `1L << b` where the vote is strictly positive.
  *
  * NULL text → NULL (callers filter nulls to reproduce the composed
  * form's explode-drop).
  */
final case class SimHashFingerprint(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits > 0 && nBits <= 60, s"nBits must be in 1..60, got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashFingerprint.compute(input.asInstanceOf[UTF8String], nBits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashFingerprint.compute($c, $nBits);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashFingerprint = copy(child = newChild)
}

object SimHashFingerprint {

  // one digest per executor thread, reset by digest() — getInstance
  // per row would pay a provider lookup per document
  private val Md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** One walk per document; called from both the interpreted eval and
    * the generated code. */
  def compute(text: UTF8String, nBits: Int): Long = {
    val b = text.getBytes
    val n = b.length
    // distinct tokens (split on SPACE, empties included — explode
    // emitted them and distinct kept one)
    val distinct = new java.util.HashSet[UTF8String]()
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        distinct.add(UTF8String.fromBytes(b, tokStart, i - tokStart))
        tokStart = i + 1
      }
      i += 1
    }
    val md = Md5.get()
    val votes = new Array[Int](nBits)
    val it = distinct.iterator()
    while (it.hasNext) {
      val tok = it.next().getBytes
      md.update(tok, 0, tok.length)
      val d = md.digest() // resets for the next token
      // first 15 hex chars = bytes 0..6 plus the HIGH nibble of byte 7
      var th = 0L
      var j = 0
      while (j < 7) { th = (th << 8) | (d(j) & 0xFFL); j += 1 }
      th = (th << 4) | ((d(7) & 0xF0L) >>> 4)
      var bit = 0
      while (bit < nBits) {
        if (((th >>> bit) & 1L) == 1L) votes(bit) += 1
        else votes(bit) -= 1
        bit += 1
      }
    }
    var fp = 0L
    var bit = 0
    while (bit < nBits) {
      if (votes(bit) > 0) fp |= 1L << bit
      bit += 1
    }
    fp
  }

  def apply(text: Column, nBits: Int): Column =
    GraftColumn(SimHashFingerprint(GraftColumn.expr(text), nBits))
}
