package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.core.{Catalog, Smoltable}
import graft.model.ColumnFamilyDefinition

/** Exactly-once streaming ingest into a wide-column table
  * ([[StreamOps.ingestEventsIntoTable]] → `Smoltable.writeBulkOnce`):
  * batches land once across query restarts on one checkpoint, and a
  * re-delivered batch id (foreachBatch's at-least-once crash window) is
  * skipped by the manifest's high-water mark.
  */
class StreamingIngestSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("ingest lands every event exactly once across a query restart; " +
      "redelivered batch ids are skipped") {
    withTempDir { tmp =>
      val in = java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$tmp/in/events.parquet"))
      var mtime = 1700000000000L
      def writeBatch(name: String, ids: Range): Unit = {
        val rdd = spark.sparkContext.parallelize(ids.map { i =>
          org.apache.spark.sql.Row(i.toLong,
            1770000000000000000L + i * 1000000L, i.toLong % 7,
            s"et${i % 3}", i * 1.5) }, 1)
        val stage = s"$tmp/stage/$name"
        spark.createDataFrame(rdd, schema).write.parquet(stage)
        import scala.jdk.CollectionConverters._
        val part = {
          val s = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
          try s.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
          finally s.close()
        }
        val dst = in.resolve(s"$name.parquet")
        java.nio.file.Files.move(part, dst)
        mtime += 10000
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(mtime))
      }

      val cat = new Catalog(s"$tmp/cat")
      val t = Smoltable.open(spark, cat, "events")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("ev")))
      val ck = s"$tmp/ck"

      // run 1: 10 events land
      writeBatch("b0", 1 to 10)
      StreamOps.ingestEventsIntoTable(spark, s"$tmp/in", t, ck)
      assert(t.count() == (10L, 10L))
      val hw1 = t.manifest.lastIngestBatch
      assert(hw1 >= 0L, "ingest must record its high-water batch id")

      // query dies (stopped); more input arrives; run 2 resumes on the
      // SAME checkpoint: only the new file lands, nothing re-lands
      writeBatch("b1", 11 to 15)
      StreamOps.ingestEventsIntoTable(spark, s"$tmp/in", t, ck)
      assert(t.count() == (15L, 15L),
        "restart must land exactly the new events")
      assert(t.manifest.lastIngestBatch > hw1)

      // all 15 cells exactly once, values intact
      val cells = t.cellsFor(None)
        .select(col("row_key"), col("value.f64"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(cells.length == 15)
      assert(cells.map(_._1).distinct.length == 15,
        "no duplicate coordinates after restart")
      assert(cells.toMap.apply("000000000003") == 4.5)

      // the crash window itself: foreachBatch re-delivers an
      // already-committed batch id -> writeBulkOnce must SKIP
      val hw = t.manifest.lastIngestBatch
      val dup = spark.range(1).selectExpr(
        "'000000000099' as row_key", "'ev' as family",
        "'etX' as qualifier", "cast(0 as bigint) as ts")
        .withColumn("value", graft.SparkEntry.cellValueStruct(
          lit("f64"), lit(null).cast("string"), lit(1.0)))
      assert(!t.writeBulkOnce(hw, dup), "redelivered batch must skip")
      assert(t.count() == (15L, 15L), "skip must not append")
      // ...and the NEXT id lands normally
      assert(t.writeBulkOnce(hw + 1, dup))
      assert(t.count() == (16L, 16L))
    }
  }
}
