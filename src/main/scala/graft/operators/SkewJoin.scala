package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant interval join: the equality key is SALTED with a
  * horizon-sized event-time bucket, so one hot key's join work spreads
  * over (key, bucket) partitions instead of landing on a single reducer.
  *
  * The attribution joins (`StreamOps.attributionJoin*`) hash-partition
  * by user — correct until one user is a bot/celebrity producing a
  * significant fraction of all events, at which point ONE task owns the
  * whole key (AQE skew handling does not apply to stateful streaming,
  * and for batch sort-merge joins it splits only the probe side). The
  * classic fix is key salting; for an INTERVAL join the right salt is
  * not random — it is the event-time bucket, because time also bounds
  * which rows can pair:
  *
  *  - bucket size = the join horizon; `bucket(t) = floor(t / horizon)`;
  *  - a matching right row (click) has `ts_r ∈ [ts_l - horizon, ts_l]`,
  *    so `bucket(ts_r) ∈ {bucket(ts_l) - 1, bucket(ts_l)}`;
  *  - replicate each RIGHT row to `bucket(ts_r)` and `bucket(ts_r) + 1`
  *    and join on `(key, bucket(ts_l))` + the interval predicate: every
  *    qualifying pair is found exactly once (via the replica whose
  *    bucket equals the left row's), no dedup pass needed.
  *
  * Cost/benefit at 100 TB: 2× the right side's shuffle volume buys a
  * per-task bound of one (key, horizon-window) of data — a hot key's
  * month of events becomes 30 daily tasks instead of one monthly task.
  * Use when key skew is known/measured; the unsalted join is cheaper
  * when keys are well distributed. Both return identical results
  * (differential-pinned by SkewJoinSpec, same DuckDB oracle as the
  * unsalted `ext_stream_join`).
  */
object SkewJoin {

  /** `floorDiv(ts, bucketSize)` over a SQL timestamp expression, for
    * `bucketSize > 0`: Spark's `div` truncates toward zero, so negative
    * non-exact quotients shift down by one. Both terms codegen. ONE
    * definition shared by the batch salted join below and the streaming
    * twin (`StreamOps.attributionJoinStreamSalted`) so the two can
    * never disagree on pre-1970 timestamps. */
  def floorBucket(tsSql: String, bucketSize: Long): Column = {
    require(bucketSize > 0, s"bucket size must be positive: $bucketSize")
    expr(s"($tsSql) div $bucketSize" +
      s" - (CASE WHEN ($tsSql) % $bucketSize < 0 THEN 1 ELSE 0 END)")
  }

  /** `left` rows paired with `right` rows of the same `key` whose
    * `rightTs` lies in `[leftTs - horizonNs, leftTs]` (both inclusive),
    * via the time-bucket-salted plan. Timestamp columns are epoch-ns
    * longs (bucketing uses INTEGER division — a double division would
    * lose µs precision at 10^18 ns magnitudes). Bucketing is FLOOR
    * division, not Spark's truncate-toward-zero `div`: truncation would
    * merge buckets -1 and 0 for pre-1970 timestamps and the
    * exactly-once pairing guarantee (bucket(ts_r) ∈ {bucket(ts_l)-1,
    * bucket(ts_l)}) would silently drop cross-epoch pairs. Output: the
    * `left` columns then the `right` columns, minus the right key
    * duplicate. */
  def intervalJoinBucketed(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      horizonNs: Long): DataFrame = {
    require(horizonNs > 0, s"horizon must be positive, got $horizonNs")
    val l = left.withColumn("__bucket", floorBucket(leftTs, horizonNs))
    val r = right.withColumn("__bucket",
      explode(array(floorBucket(rightTs, horizonNs),
        floorBucket(rightTs, horizonNs) + 1)))
    l.join(r,
        l(key) === r(key) && l("__bucket") === r("__bucket") &&
          l(leftTs) >= r(rightTs) &&
          r(rightTs) >= l(leftTs) - horizonNs,
        "inner")
      .drop(l("__bucket")).drop(r("__bucket")).drop(r(key))
  }
}
