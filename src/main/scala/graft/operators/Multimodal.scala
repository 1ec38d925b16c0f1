package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: treat image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, and run decode /
  * feature-extraction as a batched partition-level pipeline (the Scala
  * analog of `mapInPandas`: one iterator per partition, work proceeds in
  * batches, schema declared up front).
  *
  * Image payloads are decoded for REAL: [[decodeHeader]] asks the JRE's
  * `javax.imageio` registry for a reader claiming the byte stream (PNG,
  * JPEG, GIF, BMP, WBMP in a stock JRE) and reads width/height/components
  * from the header — no full pixel decode, so cost stays proportional to
  * header size, not image size. Payloads no reader recognizes (or other
  * media types — audio/video codecs are not in the JRE) fall back to
  * [[decodeStub]], which derives deterministic pseudo-dimensions so the
  * pipeline stays total and oracle-testable on synthetic corpora.
  *
  * The `mapPartitions` shape is DELIBERATE even where an expression could
  * compute the fallback arithmetic: a codec is imperative per-batch work
  * that cannot be a Catalyst expression, and the point of this operator is
  * to pin down that production shape (schema contract, batching, memory
  * bounds).
  */
object Multimodal {

  /** Output schema of the feature extractor (declared up front, exactly like
    * a mapInPandas schema contract). */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false)))

  /** Strong magic-number check gating the ImageIO probe. The JDK registry
    * also ships readers with WEAK signatures (BMP sniffs only the 2-byte
    * `BM`, WBMP a leading type byte) that would happily claim text
    * payloads and "decode" garbage dimensions from them — so only formats
    * whose magic is long enough to be unambiguous are handed to a reader.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean = {
    def at(i: Int, b: Int) = i < p.length && p(i) == b.toByte
    // PNG: 89 50 4E 47 0D 0A 1A 0A
    (at(0, 0x89) && at(1, 0x50) && at(2, 0x4e) && at(3, 0x47) &&
      at(4, 0x0d) && at(5, 0x0a) && at(6, 0x1a) && at(7, 0x0a)) ||
    // JPEG: FF D8 FF
    (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) ||
    // GIF87a / GIF89a
    (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8') &&
      (at(4, '7') || at(4, '9')) && at(5, 'a'))
  }

  /** Real image-header decode via the `javax.imageio` reader registry:
    * width/height straight from the container header and channel count from
    * the reader's raw image type — pixels are never decoded. Returns None
    * when the payload lacks a strong image magic ([[looksLikeImage]]) or no
    * installed reader claims it. The stream is an explicit
    * `MemoryCacheImageInputStream` — the `ImageIO.createImageInputStream`
    * default spools every payload through a disk temp file, which would
    * turn the per-row header sniff into file I/O.
    */
  private def decodeHeader(payload: Array[Byte]): Option[(Long, Long, Long)] = {
    if (!looksLikeImage(payload)) return None
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val w = r.getWidth(0).toLong
          val h = r.getHeight(0).toLong
          val types = r.getImageTypes(0)
          val channels =
            if (types.hasNext) types.next().getNumComponents.toLong else 3L
          Some((w, h, channels))
        } finally r.dispose()
      }
    } catch {
      case scala.util.control.NonFatal(_) => None // truncated/corrupt header
    } finally iis.close()
  }

  /** Fallback decode for payloads [[decodeHeader]] cannot claim: derives
    * deterministic pseudo-dimensions from an md5 of the payload, keeping
    * the pipeline total and oracle-testable on synthetic (non-image)
    * corpora.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val width = java.lang.Long.parseLong(hex.substring(0, 4), 16) % 1024
    val height = java.lang.Long.parseLong(hex.substring(4, 8), 16) % 1024
    (width, height, 3L)
  }

  /** Binary-payload feature extraction over (doc_id, payload binary) rows.
    * Partition-level batched processing: no per-row UDF dispatch, the
    * iterator is consumed lazily so memory stays bounded by the Parquet
    * batch size regardless of partition size.
    */
  def extractFeatures(binaryDocs: DataFrame): DataFrame = {
    val spark = binaryDocs.sparkSession
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    binaryDocs.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, c) = decodeHeader(payload).getOrElse(decodeStub(payload))
          Row(id, payload.length.toLong, w, h, c)
        }
      }
  }

  /** Demo pipeline over the documents table: text → utf-8 binary payload
    * (standing in for an image blob) → batched decode → features. */
  def documentFeatures(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    extractFeatures(docs.select(col("doc_id"),
      encode(col("text"), "utf-8").as("payload")))
  }
}
