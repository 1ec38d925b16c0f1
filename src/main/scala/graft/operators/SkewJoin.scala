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

  /** `left` rows paired with `right` rows of the same `key` whose
    * `rightTs` lies in `[leftTs - horizonNs, leftTs]` (both inclusive),
    * via the time-bucket-salted plan. Timestamp columns are epoch-ns
    * longs. Output: all `left` columns, then all `right` columns. */
  def intervalJoinBucketed(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      horizonNs: Long): DataFrame = {
    require(horizonNs > 0, s"horizon must be positive, got $horizonNs")
    val bucketL = (col(leftTs) / horizonNs).cast("long")
    val bucketR = (col(rightTs) / horizonNs).cast("long")
    val replicated = right
      .withColumn("__bucket_base", bucketR)
      .withColumn("__rep", explode(array(lit(0L), lit(1L))))
      .withColumn("__bucket", col("__bucket_base") + col("__rep"))
      .drop("__bucket_base", "__rep")
    left.withColumn("__bucket", bucketL)
      .join(replicated,
        left(key) === replicated(key) &&
          col(s"`$leftTs`") >= col(s"`$rightTs`") &&
          col(s"`$rightTs`") >= col(s"`$leftTs`") - horizonNs,
        "inner")
      .where(left.col("__bucket") === replicated.col("__bucket"))
      .drop("__bucket")
  }
}
