package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The append-mode file-sink window aggregation (the scale path) must emit
  * exactly the FINALIZED windows of the complete batch aggregation: every
  * window whose end the watermark passed, none newer, all values equal.
  */
class StreamingWindowSinkSpec extends SparkSuite {

  test("append-mode file sink emits exactly the watermark-finalized windows") {
    val dir = "/root/testdata/sf0.001"
    withTempDir { tmp =>
      val out = StreamOps.hourlyWindowAggToFiles(spark, dir,
        s"$tmp/out", s"$tmp/chk")
        .select(unix_micros(col("window_start")).as("ws"),
          col("event_type"), col("n_events"), col("value_sum"))
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap

      val ev = graft.sources.EventsSource.readEvents(spark, dir)
        .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      val batch = ev
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("cast(round(value * 1000000) as bigint)")).as("value_sum"))
        .select(unix_micros(col("window.start")).as("ws"),
          unix_micros(col("window.end")).as("we"),
          col("event_type"), col("n_events"), col("value_sum"))
        .collect()
      val maxTs = ev.agg(max(unix_micros(col("event_ts")))).head().getLong(0)
      val watermark = maxTs - 3600L * 1000000L // 1 hour delay
      val finalized = batch.filter(_.getLong(1) <= watermark)
        .map(r => (r.getLong(0), r.getString(2)) ->
          (r.getLong(3), r.getLong(4))).toMap

      assert(out.nonEmpty)
      assert(out == finalized,
        s"emitted ${out.size} windows, expected ${finalized.size} finalized")
    }
  }

  test("window file sink survives kill + resume on one checkpoint: " +
      "every finalized window lands exactly once") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    // hour-aligned base so window starts are exactly predictable
    val W0 = 1769997600L * 1000000000L // 2026-02-01-ish, hour-aligned
    val M = 60L * 1000000000L          // one minute in ns
    val H = 60 * M
    withTempDir { tmp =>
      val in = java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$tmp/in/events.parquet"))
      // explicit, strictly increasing mtimes: the file source orders and
      // dedupes discovered files by (path, timestamp)
      var mtime = 1700000000000L
      def writeBatch(name: String,
          rows: Seq[(Long, Long, String)]): Unit = {
        val rdd = spark.sparkContext.parallelize(rows.map {
          case (id, ts, et) =>
            org.apache.spark.sql.Row(id, ts, 1L, et, 1.0) }, 1)
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
      val out = s"$tmp/out"
      val ck = s"$tmp/ck"
      val prev = spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        StreamOps.RocksDBProvider)
      try {
        def startQuery() =
          StreamOps.hourlyWindowAggStream(spark, s"$tmp/in")
            .writeStream.outputMode("append").format("parquet")
            .option("path", out).option("checkpointLocation", ck).start()

        // ---- run 1: window W0 fills, pusher closes it, query dies ----
        // 3 'a' events in [W0, W0+1h); pusher p1 at W0+3h10m moves the
        // watermark to W0+2h10m > W0+1h, finalizing W0
        writeBatch("b0", Seq(
          (1L, W0 + 10 * M, "a"), (2L, W0 + 20 * M, "a"),
          (3L, W0 + 30 * M, "a"), (4L, W0 + 3 * H + 10 * M, "z")))
        val q1 = startQuery()
        q1.processAllAvailable()
        // more input arrives, then the query stops WITHOUT draining —
        // whether b1 was untouched, mid-batch, or committed at stop
        // time, the resumed query must converge to the same output
        writeBatch("b1", Seq(
          (5L, W0 + 3 * H + 20 * M, "a"), // joins p1's window W3
          (6L, W0 + 6 * H, "q")))         // pusher: finalizes W3
        q1.stop()

        // ---- run 2: resume on the same checkpoint ----
        // exactly once: W0 (already landed by the killed run) must not
        // re-emit, W3 must emit once with BOTH its events (state survived
        // the restart); q's window at W0+6h is still open — not emitted
        val w0us = W0 / 1000L
        val w3us = (W0 + 3 * H) / 1000L
        val expected = Set(
          (w0us, "a", 3L), (w3us, "z", 1L), (w3us, "a", 1L))
        def readOut(): Seq[(Long, String, Long)] =
          spark.read.parquet(out)
            .select(unix_micros(col("window_start")), col("event_type"),
              col("n_events"))
            .collect().toSeq
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        val q2 = startQuery()
        var rows: Seq[(Long, String, Long)] = Nil
        try {
          q2.processAllAvailable()
          // the watermark advance recovered from run 1's torn tail may
          // finalize W3 in a trailing no-data micro-batch that can lag
          // processAllAvailable's return under load — poll to the fixed
          // point (bounded; duplicates never self-heal, so waiting
          // cannot mask an exactly-once violation)
          val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
          rows = readOut()
          while (rows.toSet != expected && System.nanoTime < deadline) {
            Thread.sleep(200)
            q2.processAllAvailable()
            rows = readOut()
          }
        } finally q2.stop()

        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$out/_spark_metadata")),
          "file sink must write its exactly-once commit log")
        assert(rows.toSet == expected, s"got ${rows.sorted}")
        assert(rows.length == rows.distinct.length,
          s"duplicate window rows after resume: ${rows.sorted}")
      } finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
