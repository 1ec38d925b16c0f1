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
  * The actual media decode is a STUB — this container has no image/audio
  * codecs — but the Spark-side plumbing is real: binary payload column,
  * explicit output schema, partition-preserving `mapPartitions`, and
  * deterministic features so the pipeline is oracle-testable. Swap
  * [[decodeStub]] for a real codec (e.g. JNI/FFI image decoder) to
  * productionize.
  *
  * NOTE the md5-derived stub features themselves COULD be pure Catalyst
  * expressions (the DuckDB oracle proves it) — the `mapPartitions` shape is
  * kept DELIBERATELY, because a real codec is imperative per-batch work
  * that cannot be a Catalyst expression, and the point of this operator is
  * to pin down that production shape (schema contract, batching, memory
  * bounds), not the stub arithmetic.
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

  /** STUB media decode: derives deterministic pseudo-dimensions from an md5
    * of the payload. A real implementation would parse the container format
    * here; everything around it (batching, schema, partitioning) is what a
    * production decode pipeline needs.
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
          val (w, h, c) = decodeStub(payload)
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
