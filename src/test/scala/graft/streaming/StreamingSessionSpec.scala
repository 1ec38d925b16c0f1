package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The stateful streaming sessionizer must agree with the batch-equivalent
  * window pipeline: every session the stream CLOSES (a later event or the
  * event-time timeout ended it) matches the batch session exactly; the only
  * admissible difference is each user's final session, which stays open
  * until the watermark passes the gap.
  */
class StreamingSessionSpec extends SparkSuite {

  test("state survives micro-batch boundaries (3 files, 1 per trigger)") {
    val dir = "/root/testdata/sf0.001"
    withTempDir { tmp =>
      // split events into 3 time-ordered files so sessions SPAN batches:
      // a session open at a file boundary must continue, not restart
      // (EventsSource normalizes ts to epoch-ns Long for any encoding)
      val ev = graft.sources.EventsSource.readEvents(spark, dir)
        .select(col("event_id"), col("ts"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("ts")
      val n = ev.count()
      val rows = ev.collect()
      rows.grouped((n / 3 + 1).toInt).zipWithIndex.foreach { case (chunk, i) =>
        spark.createDataFrame(
            spark.sparkContext.parallelize(chunk.toSeq, 1), ev.schema)
          .write.parquet(s"$tmp/in/part$i/events.parquet")
      }
      // stream the three chunks as three separate micro-batches
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val streamed = {
        val s = spark
        import s.implicits._
        val src = s.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("event_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("ts",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.DoubleType))))
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$tmp/in/*/events.parquet")
        // reuse the production operator body via a temp view of the source:
        // easier to drive it directly through a memory sink here
        val withTs = src
          .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
          .withWatermark("event_ts", "1 hour")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_ts"))
          .as[(Long, Long, Long, java.sql.Timestamp)]
        val out = withTs.groupByKey(_._1)
          .flatMapGroupsWithState[StreamOps.OpenSession, StreamOps.SessionOut](
            OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
            StreamOps.sessionFold(30L * 60 * 1000000000L))
          .toDF()
        val name = s"msess_${System.nanoTime()}"
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName(name).start()
        try q.processAllAvailable() finally q.stop()
        s.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
      }

      val batch = StreamOps.sessionize(
          spark.read.parquet(s"$tmp/in/*/events.parquet").select(
            col("user_id"), col("ts"), col("event_id")))
        .select("user_id", "session_id", "n_events", "session_start",
          "session_end")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet

      // closed sessions (every batch session except each user's last or
      // timeout-closed tails) must match across batch boundaries
      assert(streamed.nonEmpty)
      val spurious = streamed -- batch
      assert(spurious.isEmpty, s"cross-batch state diverged: ${spurious.take(3)}")
      val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2))
        .values.toSet
      val missing = (batch -- lastPerUser) -- streamed
      assert(missing.isEmpty, s"stream lost sessions: ${missing.take(3)}")
    }
  }


  test("streaming sessions == batch sessions minus each user's open tail") {
    val dir = "/root/testdata/sf0.001"

    val streamed = StreamOps.streamingSessionize(spark, dir)
      .select("user_id", "session_id", "n_events", "session_start", "session_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    val ev = graft.sources.EventsSource.readEvents(spark, dir).select(
      col("user_id").cast("long").as("user_id"),
      col("ts"),
      col("event_id").cast("long").as("event_id"))
    val batch = StreamOps.sessionize(ev)
      .select("user_id", "session_id", "n_events", "session_start", "session_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    // batch sessions split into closed ones + each user's last (open tail)
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    val closedBatch = batch -- lastPerUser

    assert(streamed.nonEmpty, "stream emitted no closed sessions")
    val missing = closedBatch -- streamed
    val spurious = streamed -- batch
    assert(missing.isEmpty, s"stream lost sessions: ${missing.take(3)}")
    assert(spurious.isEmpty, s"stream invented sessions: ${spurious.take(3)}")
    // the stream may additionally have closed some tails via timeout; both
    // closed-only and closed+tail outcomes are covered by the two asserts
  }

  test("file-sink sessionize emits exactly the memory-sink sessions, on RocksDB state") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_id", "n_events", "session_start",
        "session_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    val viaMemory = rows(StreamOps.streamingSessionize(spark, dir))
    val out = java.nio.file.Files.createTempDirectory("ss_out").toString
    val ck = java.nio.file.Files.createTempDirectory("ss_ck").toString
    val viaFiles = rows(
      StreamOps.streamingSessionizeToFiles(spark, dir, out, ck))
    assert(viaFiles == viaMemory,
      "the scale-shape sink must emit the identical session set")
    // prove the RocksDB provider actually ran: its checkpoints are .zip
    // snapshots (+ .changelog), never the HDFSBacked provider's .delta
    val stateFiles = StreamingSessionSpec.stateFileNames(ck)
    assert(stateFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB-format state files under $ck/state: $stateFiles")
    assert(!stateFiles.exists(_.endsWith(".delta")),
      "default-provider .delta files present — RocksDB was not in effect")
    // and the provider conf was restored after the run (getOption yields
    // the SQLConf DEFAULT once unset, so assert we're off RocksDB, not None)
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .contains(StreamOps.RocksDBProvider))
  }
}

object StreamingSessionSpec {
  /** All file names under a streaming checkpoint's state/ directory. */
  def stateFileNames(checkpointDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val state = java.nio.file.Paths.get(checkpointDir, "state")
    java.nio.file.Files.walk(state).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(_.getFileName.toString).toSeq
  }
}
