package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming as-of join: cutoff + match semantics on a planted fixture,
  * equivalence to the batch carry-forward as-of over real testdata
  * (the property the DuckDB oracle re-checks at sf0.01), and the
  * sealed-prefix fold's invariants driven directly.
  */
class StreamAsOfSpec extends SparkSuite {

  private val T0 = 1770000000000000000L // µs-aligned epoch-ns in 2026
  private val S = 1000000000L
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

  test("fixture: nearest prior click wins, equal-ts inclusive, ties to " +
      "largest id, pre-history buy emits nulls, post-cutoff buy held") {
    withTempDir { tmp =>
      writeEvents(tmp.toString, Seq(
        (10L, T0, 1L, "click"),
        (11L, T0 + 2 * H, 1L, "click"),
        (12L, T0 + 2 * H, 1L, "click"),      // tie at same ts -> id 12
        (1L, T0 - S, 1L, "purchase"),        // before any click -> nulls
        (2L, T0, 1L, "purchase"),            // equal ts -> click 10
        (3L, T0 + 5 * H, 1L, "purchase"),    // after ties -> click 12
        (4L, T0 + 100 * H, 1L, "purchase"),  // newest event: above cutoff
        (20L, T0 + 50 * H, 2L, "click")))    // advances watermark only
      val got = StreamOps.streamingAsOf(spark, tmp.toString)
        .collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))
        }.toMap
      // watermark = max(event ms) - 1h = T0+99h -> buys 1..3 sealed,
      // buy 4 still buffered
      assert(got.keySet == Set(1L, 2L, 3L), s"emitted ${got.keySet}")
      assert(got(1L).isEmpty)
      assert(got(2L).contains(10L))
      assert(got(3L).contains(12L))
    }
  }

  test("streaming drain ≡ batch as-of join below the cutoff (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.streamingAsOf(spark, dir)
      .collect().map { r =>
        (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toSet

    val ev = graft.sources.EventsSource.readEvents(spark, dir)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"),
        expr("ts div 1000").as("buy_ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        expr("ts div 1000").as("click_ts_us"))
    val wmMs = ev.filter(col("event_type").isin("click", "purchase"))
      .agg(max(expr("ts div 1000000"))).head().getLong(0) - 3600000L
    val batch = graft.operators.AsOfJoin.asOfJoin(buys, clicks, "user_id",
        "buy_ts_us", "click_ts_us", "click_id")
      .filter(col("buy_ts_us") <= (wmMs - 1L) * 1000L)
      .select(col("buy_id"), col("click_id"))
      .collect().map { r =>
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
      }.toSet

    assert(streamed.nonEmpty && streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("compressed click state survives kill + resume on RocksDB: a " +
      "purchase in run 2 matches a click consumed in run 1") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    withTempDir { tmp =>
      val in = java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$tmp/in/events.parquet"))
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
      // run 1: two clicks for user 1 (the newer one, id 11, must be the
      // carried survivor) + a watermark pusher 2h later — both clicks
      // seal and compress; the query stops
      writeBatch("b0", Seq(
        (10L, T0, 1L, "click"),
        (11L, T0 + S, 1L, "click"),
        (90L, T0 + 2 * H, 98L, "click")))
      StreamOps.streamingAsOfToFiles(spark, s"$tmp/in", out, ck)
      // run 2 on the same checkpoint: a purchase ABOVE run 1's
      // watermark (so it is fresh, not late) + a sealing pusher. The
      // match can only come from run 1's compressed state — the source
      // will not replay b0
      writeBatch("b1", Seq(
        (5L, T0 + 3 * H, 1L, "purchase"),
        (91L, T0 + 200 * H, 99L, "click")))
      val got = StreamOps.streamingAsOfToFiles(spark, s"$tmp/in", out, ck)
        .collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))
        }
      assert(got.length == 1 && got.head == (5L -> Some(11L)),
        s"resume must match buy 5 to run-1 click 11 exactly once: " +
          got.mkString(","))
    }
  }

  test("fold compresses the sealed prefix to one click and holds " +
      "unsealed tails") {
    // exercise the sealed-prefix walk: many clicks below cutoff
    // must collapse to the newest, buys above cutoff must not emit.
    val fixture = Seq(
      (1L, 1000L, 10L, false), (1L, 2000L, 11L, false),
      (1L, 3000L, 12L, false), (1L, 2500L, 5L, true))
    withTempDir { tmp =>
      writeEvents(tmp.toString, fixture.map { case (u, tsUs, id, isBuy) =>
        (id, T0 + tsUs * 1000L, u,
          if (isBuy) "purchase" else "click")
      } :+ ((99L, T0 + 10L * H, 2L, "click")))
      val out = StreamOps.streamingAsOf(spark, tmp.toString).collect()
      assert(out.length == 1 && out.head.getLong(0) == 5L &&
        out.head.getLong(3) == 11L,
        s"buy 5 must match click 11 (2000 ≤ 2500 < 3000): " +
          out.mkString(","))
    }
  }
}
