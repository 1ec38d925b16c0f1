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
      val maxTs = ev.agg(max(unix_micros(col("event_ts")))).head.getLong(0)
      val watermark = maxTs - 3600L * 1000000L // 1 hour delay
      val finalized = batch.filter(_.getLong(1) <= watermark)
        .map(r => (r.getLong(0), r.getString(2)) ->
          (r.getLong(3), r.getLong(4))).toMap

      assert(out.nonEmpty)
      assert(out == finalized,
        s"emitted ${out.size} windows, expected ${finalized.size} finalized")
    }
  }
}
