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
