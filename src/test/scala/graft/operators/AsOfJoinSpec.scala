package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The carry-forward as-of join: differential against the naive
  * inequality-join + rank-1 formulation (the semantics oracle, ruinous
  * at scale), edge semantics (inclusive equal-ts match, tie-break to
  * largest id, unmatched lefts survive with nulls), and plan shape
  * (exactly one exchange).
  */
class AsOfJoinSpec extends SparkSuite {

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

  /** Quadratic reference implementation: all prior pairs, rank 1 by
    * (click_ts desc, click_id desc) — the definition, minus the scale. */
  private def naive(buys: DataFrame, clicks: DataFrame): Set[(Long, Option[Long])] = {
    val joined = buys.join(clicks,
        buys("user_id") === clicks("user_id") &&
          col("click_ts") <= col("buy_ts"), "left")
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("buy_id"))
          .orderBy(col("click_ts").desc_nulls_last, col("click_id").desc_nulls_last)))
      .filter(col("_rk") === 1)
    joined.select(col("buy_id"), col("click_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
  }

  test("as-of join ≡ naive rank-1 inequality join (sf0.001 + sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (buys, clicks) = sides(dir)
      val fast = AsOfJoin.asOfJoin(buys, clicks, "user_id",
          "buy_ts", "click_ts", "click_id")
        .select(col("buy_id"), col("click_id"))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      assert(fast.length == fast.toSet.size, s"$dir: duplicate buy rows")
      val want = naive(buys, clicks)
      assert(fast.toSet == want, s"$dir: ${fast.length} vs ${want.size}")
      assert(want.exists(_._2.isDefined), s"$dir: no matched rows at all")
      assert(fast.length == buys.count(), s"$dir: lost/duplicated left rows")
    }
  }

  test("edge semantics: equal-ts match is inclusive, ties take the " +
      "largest id, unmatched lefts keep nulls") {
    import spark.implicits._
    val buys = Seq(
      (100L, 7L, 1000L),  // equal-ts click 1000 must match
      (101L, 7L, 999L),   // before any click -> nulls
      (102L, 7L, 5000L),  // two clicks at ts 2000 -> larger click_id wins
      (103L, 8L, 1000L)   // key with no clicks -> nulls
    ).toDF("buy_id", "user_id", "buy_ts")
    val clicks = Seq(
      (10L, 7L, 1000L),
      (11L, 7L, 2000L),
      (12L, 7L, 2000L)
    ).toDF("click_id", "user_id", "click_ts")
    val got = AsOfJoin.asOfJoin(buys, clicks, "user_id",
        "buy_ts", "click_ts", "click_id")
      .select(col("buy_id"), col("click_id"), col("click_ts"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(got(100L).contains((10L, 1000L)), s"equal-ts: ${got(100L)}")
    assert(got(101L).isEmpty, s"pre-history buy matched: ${got(101L)}")
    assert(got(102L).contains((12L, 2000L)), s"tie-break: ${got(102L)}")
    assert(got(103L).isEmpty, s"clickless key matched: ${got(103L)}")
  }

  test("plan: exactly one exchange (union + single keyed sort window)") {
    val (buys, clicks) = sides("/root/testdata/sf0.001")
    val plan = AsOfJoin.asOfJoin(buys, clicks, "user_id",
        "buy_ts", "click_ts", "click_id")
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"as-of must not plan a join:\n$plan")
  }

  test("payload-column overlap is rejected") {
    import spark.implicits._
    val a = Seq((1L, 2L, 3L)).toDF("k", "ts", "x")
    val b = Seq((1L, 2L, 3L)).toDF("k", "rts", "x")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(a, b, "k", "ts", "rts", "x")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("fuzz: ≡ naive on dense random data (hot keys, heavy ts ties, " +
      "empty sides) across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      // dense domains force collisions: few keys, tiny ts range
      val nl = rnd.nextInt(40)
      val nr = rnd.nextInt(40)
      val lRows = (0 until nl).map(i =>
        (100L + i, rnd.nextInt(5).toLong, rnd.nextInt(12).toLong))
      val rRows = (0 until nr).map(i =>
        (500L + i, rnd.nextInt(5).toLong, rnd.nextInt(12).toLong))
      val parts = 1 + rnd.nextInt(7)
      val lt = lRows.toDF("buy_id", "user_id", "buy_ts").repartition(parts)
      val rt = rRows.toDF("click_id", "user_id", "click_ts")
        .repartition(1 + rnd.nextInt(7))
      val fast = AsOfJoin.asOfJoin(lt, rt, "user_id",
          "buy_ts", "click_ts", "click_id")
        .select(col("buy_id"), col("click_id")).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      val want = lRows.map { case (bid, k, bts) =>
        val cands = rRows.filter(c => c._2 == k && c._3 <= bts)
        (bid, if (cands.isEmpty) None
          else Some(cands.maxBy(c => (c._3, c._1))._1))
      }.toSet
      assert(fast == want, s"trial $trial (nl=$nl nr=$nr): " +
        s"${(fast diff want).take(3)} vs ${(want diff fast).take(3)}")
    }
  }

  test("NULL semantics mirror SQL ASOF LEFT JOIN: null-ts/key right " +
      "rows never match; null-ts/key left rows emit with nulls") {
    import spark.implicits._
    val buys = Seq(
      (100L, Some(7L), Some(5L)),   // real buy after the null-ts click
      (101L, Some(7L), None),       // null buy ts -> no match, kept
      (102L, None, Some(5L))        // null key -> no match, kept
    ).toDF("buy_id", "user_id", "buy_ts")
    val clicks = Seq(
      (10L, Some(7L), None),        // null click ts: never matchable
      (11L, None, Some(1L)),        // null key: never matchable
      (12L, Some(7L), Some(3L))     // the only legitimate match
    ).toDF("click_id", "user_id", "click_ts")
    val got = AsOfJoin.asOfJoin(buys, clicks, "user_id",
        "buy_ts", "click_ts", "click_id")
      .select(col("buy_id"), col("click_id")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.size == 3, s"all left rows must survive: $got")
    assert(got(100L).contains(12L), s"buy 100: ${got(100L)}")
    assert(got(101L).isEmpty, s"null-ts buy matched: ${got(101L)}")
    assert(got(102L).isEmpty, s"null-key buy matched: ${got(102L)}")
  }

  test("TIMESTAMP ts columns are accepted via unix_micros and give the " +
      "identical result as the equivalent epoch-µs longs") {
    import spark.implicits._
    val buysL = Seq((1L, 10L, 100_000_000L), (2L, 10L, 200_000_000L),
        (3L, 20L, 150_000_000L))
      .toDF("buy_id", "user_id", "buy_ts")
    val clicksL = Seq((11L, 10L, 100_000_000L), (12L, 10L, 150_000_000L),
        (13L, 20L, 160_000_000L))
      .toDF("click_id", "user_id", "click_ts")
    val wantRows = AsOfJoin.asOfJoin(buysL, clicksL, "user_id",
        "buy_ts", "click_ts", "click_id")
      .select(col("buy_id"), col("click_id")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    // same data, TIMESTAMP-typed on both sides
    val buysT = buysL.withColumn("buy_ts", expr("timestamp_micros(buy_ts)"))
    val clicksT = clicksL.withColumn("click_ts",
      expr("timestamp_micros(click_ts)"))
    val gotT = AsOfJoin.asOfJoin(buysT, clicksT, "user_id",
        "buy_ts", "click_ts", "click_id")
      .select(col("buy_id"), col("click_id")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(gotT == wantRows, s"TIMESTAMP run $gotT vs long run $wantRows")
    assert(wantRows == Set((1L, Some(11L)), (2L, Some(12L)),
      (3L, None)), s"fixture drifted: $wantRows")
    // anything else (e.g. string) still rejects
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(
        buysL.withColumn("buy_ts", col("buy_ts").cast("string")),
        clicksL, "user_id", "buy_ts", "click_ts", "click_id")
    }
    assert(e.getMessage.contains("integral epoch or TIMESTAMP"))
  }
}
