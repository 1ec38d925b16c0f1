package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the events ingestion adapter against EVERY physical `ts` encoding
  * the driver has shipped (or could ship), so the next testdata
  * regeneration cannot silently break the events consumers again — round
  * 12 lost 5 queries to an error, 1 to a silently wrong answer, and 3
  * specs to exactly that drift.
  *
  * Encodings covered:
  *   - plain `INT64` epoch-ns — byte-identical to what the nanosAsLong
  *     conf yields for `TIMESTAMP(NANOS)` files (Spark cannot WRITE
  *     nanos parquet, but the loaded shape — `LongType` raw ns — is the
  *     same, so this exercises the identical adapter branch);
  *   - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` (TIMESTAMP_NTZ) — the
  *     r12-regenerated driver encoding;
  *   - `TIMESTAMP(MICROS, isAdjustedToUTC=true)` (TIMESTAMP) — the
  *     third plausible drift.
  */
class EventsSourceSpec extends SparkSuite {

  // µs-aligned epoch-ns in 2026 so every encoding represents them exactly
  private val TsNs = Seq(
    1770000000000000000L, 1770000001500000000L, 1770003600250000000L)

  private def writeFixture(dir: String, tsExpr: String): Unit = {
    val rows = TsNs.zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts, 100L + i, s"et$i", i * 1.5)
    }
    spark.createDataFrame(rows)
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value")
      .withColumn("ts", expr(tsExpr)).drop("ts_ns")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readBack(dir: String): Set[(Long, Long)] =
    EventsSource.readEvents(spark, dir)
      .select(col("event_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("readEvents normalizes all three physical encodings identically") {
    withTempDir { tmp =>
      writeFixture(s"$tmp/ns_long", "ts_ns")
      writeFixture(s"$tmp/us_ntz",
        "cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)")
      writeFixture(s"$tmp/us_tz", "timestamp_micros(ts_ns div 1000)")

      val expected = TsNs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }.toSet
      assert(readBack(s"$tmp/ns_long") == expected)
      assert(readBack(s"$tmp/us_ntz") == expected)
      assert(readBack(s"$tmp/us_tz") == expected)
    }
  }

  test("streaming path produces identical windows from ns-long and µs-ntz") {
    withTempDir { tmp =>
      writeFixture(s"$tmp/ns_long", "ts_ns")
      writeFixture(s"$tmp/us_ntz",
        "cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)")
      def windows(dir: String) = graft.streaming.StreamOps
        .hourlyWindowAgg(spark, dir)
        .select(unix_micros(col("window_start")), col("event_type"),
          col("n_events"), col("value_sum"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val a = windows(s"$tmp/ns_long")
      val b = windows(s"$tmp/us_ntz")
      assert(a.nonEmpty)
      assert(a == b, s"encodings diverged: $a vs $b")
    }
  }

  test("probe range gate rejects a unit-mismatched encoding loudly") {
    withTempDir { tmp =>
      // epoch-µs stored as plain INT64: the adapter's LongType branch
      // would read it as ns (≈1970) — exactly the r12 silent-wrongness
      // shape; the gate must throw instead of emitting compressed windows
      writeFixture(s"$tmp/us_long", "ts_ns div 1000")
      val e = intercept[IllegalArgumentException] {
        EventsSource.probeTsTypeChecked(spark, s"$tmp/us_long")
      }
      assert(e.getMessage.contains("sanity gate"))
    }
  }

  test("true TIMESTAMP(NANOS) file reads correctly with NO conf leak") {
    // Spark cannot write nanos parquet; the fixture is a checked-in
    // pyarrow file (src/test/resources/events_nanos). This is the one
    // encoding whose footer inference needs the legacy nanosAsLong conf —
    // readEvents must scope it to its own schema probe.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val dir = getClass.getResource("/events_nanos").getPath
    val got = EventsSource.readEvents(spark, dir)
      .select(col("event_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == TsNs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }.toSet)
    // the conf did NOT leak into the session: a DIRECT read of the same
    // nanos file (any other TIMESTAMP(NANOS) source) still fails loudly
    // instead of silently loading as raw Longs
    assert(spark.conf.getOption(key).forall(_ == "false"))
    intercept[Throwable] {
      spark.read.parquet(s"$dir/events.parquet").schema
    }
  }

  test("streaming path handles true NANOS without the session conf") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val dir = getClass.getResource("/events_nanos").getPath
    val wins = graft.streaming.StreamOps.hourlyWindowAgg(spark, dir)
      .select(unix_micros(col("window_start")), col("event_type"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    // exact windows: a µs-misread (the ×1000 failure shape) would
    // collapse all three events into one 1970-era window
    assert(wins == Set(
      (1769997600000000L, "et0", 1L),
      (1769997600000000L, "et1", 1L),
      (1770001200000000L, "et2", 1L)))
    assert(spark.conf.getOption(key).forall(_ == "false"))
  }

  test("same-path regeneration re-probes and re-gates (fingerprinted cache)") {
    withTempDir { tmp =>
      import org.apache.spark.sql.types._
      val dir = s"$tmp/regen"
      // generation 1: plain INT64 epoch-ns
      writeFixture(dir, "ts_ns")
      assert(EventsSource.probeTsTypeChecked(spark, dir) == LongType)
      // generation 2, SAME path, different encoding: a path-keyed cache
      // would serve the stale LongType and mis-normalize silently
      writeFixture(dir,
        "cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)")
      assert(EventsSource.probeTsTypeChecked(spark, dir) == TimestampNTZType)
      assert(readBack(dir) ==
        TsNs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }.toSet)
      // generation 3: unit-mismatched bytes — the RE-GATE must fire (a
      // skipped gate would emit 1970-compressed timestamps silently)
      writeFixture(dir, "ts_ns div 1000")
      val e = intercept[IllegalArgumentException] {
        EventsSource.readEvents(spark, dir)
      }
      assert(e.getMessage.contains("sanity gate"))
    }
  }

  test("probe accepts all valid encodings and caches per path") {
    withTempDir { tmp =>
      writeFixture(s"$tmp/ns_long", "ts_ns")
      writeFixture(s"$tmp/us_ntz",
        "cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)")
      import org.apache.spark.sql.types._
      assert(EventsSource.probeTsTypeChecked(spark, s"$tmp/ns_long") == LongType)
      assert(EventsSource.probeTsTypeChecked(spark,
        s"$tmp/us_ntz") == TimestampNTZType)
    }
  }
}
