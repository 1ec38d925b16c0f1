package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native-operator variants must agree with their hand-rolled
  * equivalents on real data:
  *  - `sessionizeNative` (Spark `session_window`) vs `sessionize`
  *    (window functions) — identical sessions except the documented
  *    boundary case (gap EXACTLY == 30 min: native splits, window
  *    functions keep), which the µs-granular testdata must not contain
  *    for the sets to match;
  *  - `slidingWindowAgg` (streaming, overlapping windows) vs the batch
  *    window(2h, 1h) aggregation over the same events.
  */
class NativeWindowOpsSpec extends SparkSuite {

  private val Dir = "/root/testdata/sf0.001"

  private def events = graft.sources.EventsSource.readEvents(spark, Dir)
    .select(col("user_id").cast("long").as("user_id"),
      expr("(ts div 1000) * 1000").as("ts"),
      col("event_id").cast("long").as("event_id"))

  test("session_window sessions match the window-function sessionizer") {
    import org.apache.spark.sql.expressions.Window
    val gapNs = 30L * 60 * 1000000000L
    val native = StreamOps.sessionizeNative(events)
      .select("user_id", "n_events", "session_start", "session_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // hand-rolled equivalent with the NATIVE boundary semantics (a gap
    // EQUAL to 30 min splits — session_window's half-open windows), so
    // the comparison is exact whatever gaps the testdata happens to
    // contain, instead of relying on no exactly-30-min gap existing
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"))
    val handRolledGe = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_s", when(col("prev_ts").isNull ||
        col("ts") - col("prev_ts") >= gapNs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select("user_id", "n_events", "session_start", "session_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(native.nonEmpty)
    assert(native == handRolledGe,
      s"native-only: ${(native -- handRolledGe).take(3)}, " +
        s"hand-rolled-only: ${(handRolledGe -- native).take(3)}")
    // and the documented divergence from the strict-> sessionize is
    // bounded: session COUNTS can only differ where an exact-gap split
    // occurred, never the covered event mass
    val strictEvents = StreamOps.sessionize(events)
      .agg(sum(col("n_events"))).head().getLong(0)
    val nativeEvents = native.toSeq.map(_._2).sum
    assert(nativeEvents == strictEvents)
  }

  test("session_window runs unchanged as a STREAMING query (append mode " +
      "emits exactly the watermark-finalized sessions)") {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 30L * 60 * 1000000L
    // the scaladoc claim under test: the same groupBy(session_window)
    // aggregation, applied to the streaming source with a watermark
    val name = s"nsess_${System.nanoTime()}"
    val q = StreamOps.eventsStream(spark, Dir)
      .withWatermark("event_ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("event_ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("n_events"),
        col("session_start"), col("session_end"))
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val batch = StreamOps.sessionizeNative(
        events.select(col("user_id"), col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // watermark after the single data batch: max event time - 1 hour.
    // append mode emits a session once the watermark passes its window
    // end (= last event + gap); leave the == boundary undetermined so
    // the pin is not sensitive to Spark's <-vs-<= eviction choice
    val wmUs = events.agg(max(expr("ts div 1000"))).head().getLong(0) -
      3600L * 1000000L
    def endUs(s: (Long, Long, Long, Long)) = s._4 / 1000L + gapUs
    val must = batch.filter(endUs(_) < wmUs)
    val may = batch.filter(endUs(_) <= wmUs)
    assert(streamed.nonEmpty)
    assert((must -- streamed).isEmpty,
      s"finalized sessions not emitted: ${(must -- streamed).take(3)}")
    assert((streamed -- may).isEmpty,
      s"unfinalized/invented sessions emitted: ${(streamed -- may).take(3)}")
  }

  test("streaming sliding windows match the batch overlap expansion") {
    val streamed = StreamOps.slidingWindowAgg(spark, Dir)
      .select(unix_micros(col("window_start")).as("ws"), col("event_type"),
        col("n_events"), col("value_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val batch = graft.sources.EventsSource.readEvents(spark, Dir)
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 1000000) as bigint)")).as("value_sum"))
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"),
        col("n_events"), col("value_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // every (hour-window, type) pair must appear in exactly two sliding
    // windows' worth of coverage: total sliding events = 2x tumbling
    val tumbling = StreamOps.hourlyWindowAgg(spark, Dir)
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(streamed.values.map(_._1).sum == 2 * tumbling)
  }
}
