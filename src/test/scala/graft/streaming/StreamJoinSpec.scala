package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Stream-stream interval join (click→purchase attribution): boundary
  * semantics on a planted fixture, and equivalence to the batch interval
  * join over real testdata — the property the DuckDB oracle re-checks at
  * sf0.01 (`ext_stream_join`).
  */
class StreamJoinSpec extends SparkSuite {

  // µs-aligned epoch-ns base in 2026 (inside the events range gate)
  private val T0 = 1770000000000000000L
  private val S = 1000000000L // one second in ns
  private val H = 3600 * S

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String)]): Unit = {
    spark.createDataFrame(rows.map { case (id, ts, u, et) =>
      (id, ts, u, et, 1.0) })
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("interval-join boundaries: inclusive both ends, per-user, no " +
      "clicks after the purchase") {
    withTempDir { tmp =>
      writeEvents(tmp.toString, Seq(
        (1L, T0, 1L, "purchase"),          // B1
        (10L, T0, 1L, "click"),            // C1: ts == buy ts -> in
        (11L, T0 - 24 * H, 1L, "click"),   // C2: exactly 24h back -> in
        (12L, T0 - 24 * H - S, 1L, "click"), // beyond horizon -> out
        (13L, T0 + S, 1L, "click"),        // after the buy -> out
        (14L, T0, 2L, "click"),            // other user -> out for B1
        (2L, T0 + 2 * H, 2L, "purchase"))) // B2: picks up C5=14
      val got = StreamOps.attributionJoin(spark, tmp.toString)
        .select(col("buy_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (1L, 11L), (2L, 14L)), s"got $got")
    }
  }

  test("streaming drain equals the batch interval join on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.attributionJoin(spark, dir)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = graft.sources.EventsSource.readEvents(spark, dir)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("bu"),
        col("ts").as("bts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val batch = buys.join(clicks,
        col("bu") === col("cu") && col("cts") <= col("bts") &&
          col("cts") >= col("bts") - lit(24L * 3600 * 1000000000L))
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed.nonEmpty, "expected at least one attributed pair")
    assert(streamed == batch,
      s"streamed ${streamed.size} pairs, batch ${batch.size}")
  }

  test("salted streaming join ≡ unsalted: identical pair set, no " +
      "duplicates from click replication (sf0.001 differential)") {
    val dir = "/root/testdata/sf0.001"
    val plain = StreamOps.attributionJoin(spark, dir)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = StreamOps.attributionJoinSalted(spark, dir)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.length == salted.distinct.length,
      "bucket replication produced duplicate pairs")
    assert(salted.toSet == plain,
      s"diff: ${(salted.toSet -- plain) ++ (plain -- salted.toSet)}")
    assert(plain.nonEmpty)
  }

  test("salted streaming join: cross-bucket pairs found exactly once " +
      "(planted horizon-boundary fixture)") {
    withTempDir { tmp =>
      val HB = 24 * H // horizon == bucket size, in ns
      // bucket boundary at a multiple of 24h from epoch; plant a click
      // just before it and a buy just after: they pair ONLY via the
      // click's +1 replica. Same-bucket and out-of-horizon pins too.
      val b20 = (T0 / HB) * HB // a 24h boundary near T0
      writeEvents(tmp.toString, Seq(
        (1L, b20 + S, 1L, "purchase"),       // pairs with 10 (cross), 11 (same)
        (10L, b20 - S, 1L, "click"),         // previous bucket, in horizon
        (11L, b20 + S / 2, 1L, "click"),     // same bucket
        (12L, b20 - 24 * H - S, 1L, "click"), // beyond horizon -> out
        (2L, b20 + 2 * H, 2L, "purchase"))) // other user, no clicks
      val got = StreamOps.attributionJoinSalted(spark, tmp.toString)
        .select(col("buy_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length, s"dup pairs: $got")
      assert(got.toSet == Set((1L, 10L), (1L, 11L)), s"got ${got.toSet}")
    }
  }

  test("left-outer emission cutoff: null rows exactly for purchases at " +
      "or below (wm_ms - 1) * 1000, wm = min side watermark, ms-floored") {
    val U = 1000L // one µs in ns
    withTempDir { tmp =>
      // click max has a fractional-ms tail (T0+30h + 1.5ms) so this
      // pins the ms FLOOR; buy max at T0+40h so the click side is the
      // min watermark. wm_ms = ms(T0) + 29h + 1ms; cutoff C =
      // (wm_ms-1)*1000 µs = T0+29h in µs.
      val wmNs = T0 + 29 * H + 1000 * U // truncated wm, in ns
      writeEvents(tmp.toString, Seq(
        (10L, T0, 1L, "click"),                    // C1 matches B1
        (11L, T0 + 30 * H + 1500 * U, 9L, "click"), // watermark mover
        (1L, T0, 1L, "purchase"),                  // matched -> emitted
        (2L, T0 + 1 * H, 2L, "purchase"),          // old unmatched -> null row
        (3L, wmNs, 3L, "purchase"),                // == wm -> held
        (4L, wmNs - 500 * U, 4L, "purchase"),      // C + 500µs -> held
        (5L, wmNs - 1000 * U, 5L, "purchase"),     // == C exactly -> null row
        (6L, T0 + 40 * H, 6L, "purchase")))        // newest -> held
      val got = StreamOps.attributionJoinOuter(spark, tmp.toString)
        .select(col("buy_id"), col("click_id"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, -1L), (5L, -1L)), s"got $got")
    }
  }

  test("left-outer equals the batch left join with the watermark cutoff " +
      "on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.attributionJoinOuter(spark, dir)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    val ev = graft.sources.EventsSource.readEvents(spark, dir)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("bu"),
        col("ts").as("bts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        col("ts").as("cts"))
    def maxNs(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0)
    val wmMs = math.min(maxNs(buys, "bts"), maxNs(clicks, "cts")) /
      1000000L - 3600000L
    val cutoffNs = (wmMs - 1) * 1000L * 1000L
    val matched = buys.join(clicks,
        col("bu") === col("cu") && col("cts") <= col("bts") &&
          col("cts") >= col("bts") - lit(24L * 3600 * 1000000000L))
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val matchedBuys = matched.map(_._1)
    val nulls = buys.filter(col("bts") <= cutoffNs)
      .collect().map(_.getLong(0)).filterNot(matchedBuys).map((_, -1L)).toSet

    assert(streamed == matched ++ nulls,
      s"streamed ${streamed.size}, expected ${(matched ++ nulls).size}")
    assert(nulls.nonEmpty, "fixture should contain unattributed purchases")
  }

  test("join state survives kill + resume on one checkpoint: every " +
      "attributed pair lands exactly once") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val M = 60L * S
    withTempDir { tmp =>
      val in = java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$tmp/in/events.parquet"))
      // explicit, strictly increasing mtimes: the file source orders and
      // dedupes discovered files by (path, timestamp)
      var mtime = 1700000000000L
      def writeBatch(name: String,
          rows: Seq[(Long, Long, Long, String)]): Unit = {
        val rdd = spark.sparkContext.parallelize(rows.map {
          case (id, ts, u, et) =>
            org.apache.spark.sql.Row(id, ts, u, et, 1.0) }, 1)
        val stage = s"$tmp/stage/$name"
        spark.createDataFrame(rdd, schema).write.parquet(stage)
        import scala.jdk.CollectionConverters._
        val part = {
          val st = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
          try st.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
          finally st.close()
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
          StreamOps.attributionJoinStream(spark, s"$tmp/in")
            .writeStream.outputMode("append").format("parquet")
            .option("path", out).option("checkpointLocation", ck).start()

        // ---- run 1: C1+B1 pair emitted, then the query dies with b1
        // in an arbitrary torn state (untouched / mid-batch / committed)
        writeBatch("b0", Seq(
          (10L, T0, 1L, "click"),              // C1
          (1L, T0 + 10 * M, 1L, "purchase")))  // B1 -> (B1,C1)
        val q1 = startQuery()
        q1.processAllAvailable()
        writeBatch("b1", Seq(
          (2L, T0 + 20 * M, 1L, "purchase"),   // B2 -> (B2,C1): needs
                                               // C1's buffered state to
                                               // survive the restart
          (11L, T0 + 30 * M, 2L, "click"),     // C2
          (3L, T0 + 40 * M, 2L, "purchase")))  // B3 -> (B3,C2)
        q1.stop()

        // ---- run 2: resume on the same checkpoint ----
        val expected = Set((1L, 10L), (2L, 10L), (3L, 11L))
        def readOut(): Seq[(Long, Long)] =
          spark.read.parquet(out).select(col("buy_id"), col("click_id"))
            .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
        val q2 = startQuery()
        var rows: Seq[(Long, Long)] = Nil
        try {
          q2.processAllAvailable()
          // bounded poll to the fixed point (same rationale as
          // StreamingWindowSinkSpec: duplicates never self-heal, so
          // waiting cannot mask an exactly-once violation)
          val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
          rows = readOut()
          while (rows.toSet != expected && System.nanoTime < deadline) {
            Thread.sleep(200)
            q2.processAllAvailable()
            rows = readOut()
          }
        } finally q2.stop()

        assert(rows.toSet == expected, s"got ${rows.sorted}")
        assert(rows.length == rows.distinct.length,
          s"duplicate pairs after resume: ${rows.sorted}")
      } finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("the join plan is the symmetric streaming join, watermarked on " +
      "both sides") {
    withTempDir { tmp =>
      writeEvents(tmp.toString, Seq(
        (1L, T0, 1L, "purchase"), (10L, T0, 1L, "click")))
      val df = StreamOps.attributionJoinStream(spark, tmp.toString)
      assert(df.isStreaming)
      // both watermarks present in the analyzed plan; the physical
      // streaming join node only materializes at query start, so pin
      // the logical shape (EventTimeWatermark twice + Join)
      val plan = df.queryExecution.analyzed.toString
      assert("EventTimeWatermark".r.findAllIn(plan).size == 2, plan)
      assert(plan.contains("Join Inner"), plan)
    }
  }
}
