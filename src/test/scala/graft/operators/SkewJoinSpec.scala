package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The time-bucket-salted interval join: identical results to the plain
  * interval join (differential over real testdata), exactly-once pair
  * discovery across bucket boundaries, and the skew mechanism itself —
  * a hot key's rows spread over many (key, bucket) groups.
  */
class SkewJoinSpec extends SparkSuite {

  private val H24 = 24L * 3600 * 1000000000L

  private def sides(dir: String) = {
    val ev = graft.sources.EventsSource.readEvents(spark, dir)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"),
        col("ts").as("buy_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    (buys, clicks)
  }

  test("bucketed interval join ≡ plain interval join (differential, " +
      "sf0.001 + sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (buys, clicks) = sides(dir)
      val plain = buys.join(clicks,
          buys("user_id") === clicks("user_id") &&
            col("click_ts") <= col("buy_ts") &&
            col("click_ts") >= col("buy_ts") - H24)
        .select(col("buy_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val salted = SkewJoin.intervalJoinBucketed(
          buys, clicks, "user_id", "buy_ts", "click_ts", H24)
        .select(col("buy_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(salted.length == salted.distinct.length,
        s"duplicate pairs from bucket replication in $dir")
      assert(salted.toSet == plain, s"$dir: salted ${salted.length} " +
        s"pairs vs plain ${plain.size}")
      assert(plain.nonEmpty)
    }
  }

  test("cross-boundary pairs found exactly once via the replica bucket") {
    import spark.implicits._
    val B = H24 // bucket size == horizon
    // click just before a bucket boundary, buy just after it: they pair
    // ONLY through the click's +1 replica; a same-bucket pair and an
    // out-of-horizon pair pin both directions
    val buys = Seq(
      (1L, 1L, 10 * B + 1000L),      // pairs with click 10 (cross-boundary)
      (2L, 1L, 10 * B + 2000L),      // also pairs with click 11 (same bucket)
      (3L, 2L, 12 * B)).toDF("buy_id", "user_id", "buy_ts")
    val clicks = Seq(
      (10L, 1L, 10 * B - 500L),      // previous bucket, within horizon
      (11L, 1L, 10 * B + 1500L),     // same bucket as buy 2
      (12L, 2L, 11 * B - 1L))        // exactly horizon+1ns before buy 3? no:
      .toDF("click_id", "user_id", "click_ts")
    // expected: buy1·click10 (cross-boundary, via the +1 replica),
    // buy2·click10 (cross-boundary), buy2·click11 (same bucket);
    // NOT buy1·click11 (click after the buy) and NOT buy3·click12
    // (gap = B+1 ns > horizon)
    val got = SkewJoin.intervalJoinBucketed(
        buys, clicks, "user_id", "buy_ts", "click_ts", H24)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L)), s"got $got")
  }

  test("randomized differential: salted ≡ plain on boundary-heavy data " +
      "(200 seeded trials worth of rows)") {
    import spark.implicits._
    val B = H24
    val rnd = new scala.util.Random(0xC0FFEE)
    // timestamps clustered AT bucket boundaries (±2ns) plus uniform
    // fill — the distribution most likely to expose an off-by-one in
    // the replica arithmetic
    def ts(): Long = {
      val bucket = 100L + rnd.nextInt(4)
      if (rnd.nextBoolean()) bucket * B + (rnd.nextInt(5) - 2).toLong
      else bucket * B + math.abs(rnd.nextLong() % B)
    }
    val buys = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, ts()))
      .toDF("buy_id", "user_id", "buy_ts")
    val clicks = (1 to 200).map(i =>
      (1000L + i, (rnd.nextInt(5) + 1).toLong, ts()))
      .toDF("click_id", "user_id", "click_ts")
    val plain = buys.join(clicks,
        buys("user_id") === clicks("user_id") &&
          col("click_ts") <= col("buy_ts") &&
          col("click_ts") >= col("buy_ts") - B)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SkewJoin.intervalJoinBucketed(
        buys, clicks, "user_id", "buy_ts", "click_ts", B)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.length == salted.distinct.length)
    assert(salted.toSet == plain,
      s"diff: ${(salted.toSet -- plain) ++ (plain -- salted.toSet)}")
    assert(plain.size > 100, s"fixture too sparse: ${plain.size}")
  }

  test("negative (pre-1970) timestamps: floor bucketing keeps the " +
      "documented invariant bucket(ts_r) ∈ {bucket(ts_l)-1, bucket(ts_l)}" +
      " — differential vs plain across the epoch") {
    import spark.implicits._
    val B = H24
    val rnd = new scala.util.Random(0xBEEF)
    // timestamps straddling 0 and negative bucket boundaries (±2ns at
    // -2B, -B, 0, B) plus uniform fill over [-3B, 3B)
    def ts(): Long = {
      if (rnd.nextBoolean()) (rnd.nextInt(4) - 2).toLong * B + (rnd.nextInt(5) - 2).toLong
      else (rnd.nextLong() % (3 * B))
    }
    val buys = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, ts())).toDF("buy_id", "user_id", "buy_ts")
    val clicks = (1 to 200).map(i =>
      (1000L + i, (rnd.nextInt(5) + 1).toLong, ts())).toDF("click_id", "user_id", "click_ts")
    val plain = buys.join(clicks,
        buys("user_id") === clicks("user_id") &&
          col("click_ts") <= col("buy_ts") &&
          col("click_ts") >= col("buy_ts") - B)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SkewJoin.intervalJoinBucketed(
        buys, clicks, "user_id", "buy_ts", "click_ts", B)
      .select(col("buy_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.length == salted.distinct.length,
      "duplicate pair across the epoch boundary")
    assert(salted.toSet == plain,
      s"diff: ${(salted.toSet -- plain) ++ (plain -- salted.toSet)}")
    assert(plain.size > 50, s"fixture too sparse: ${plain.size}")
  }

  test("floorBucket (the helper BOTH salted twins share) is true floor " +
      "division, not truncate-toward-zero") {
    import spark.implicits._
    val got = Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L).toDF("t")
      .select(SkewJoin.floorBucket("t", 2L).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-2L, -1L, -1L, 0L, 0L, 1L, 1L), s"got $got")
  }

  test("a hot key's work spreads over (key, bucket) groups") {
    import spark.implicits._
    // one user, events across 30 days: the plain join keys everything
    // into ONE group; the salted key makes ~30 groups
    val n = 3000
    val clicks = (1 to n).map(i =>
      (i.toLong, 7L, i.toLong * 864L * 1000000000L)) // ~30 days span
      .toDF("click_id", "user_id", "click_ts")
    val grouped = clicks
      .withColumn("__bucket", expr(s"click_ts div $H24"))
      .groupBy("user_id", "__bucket").count()
      .collect().map(_.getAs[Long]("count"))
    assert(grouped.length >= 25, s"expected ~30 buckets, ${grouped.length}")
    assert(grouped.max < n, "no single (key,bucket) group holds all rows")
  }
}
