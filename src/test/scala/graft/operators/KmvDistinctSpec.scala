package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The bounded KMV distinct sketch: exact below k, accurate above it,
  * deterministic under any partitioning (set-union merge), map-side
  * partial aggregation in the plan, and callable from SQL.
  */
class KmvDistinctSpec extends SparkSuite {

  private def estimate(n: Int, k: Int, parts: Int): Double = {
    import spark.implicits._
    (1 to n).toDF("v").repartition(parts)
      .agg(Corpus.kmvDistinct(col("v"), k).as("est"))
      .head().getDouble(0)
  }

  test("exact below k: the sketch IS the distinct set") {
    assert(estimate(40, 64, 3) == 40.0)
    // duplicates collapse like DISTINCT
    import spark.implicits._
    val withDups = (1 to 40).flatMap(v => Seq(v, v, v)).toDF("v")
      .agg(Corpus.kmvDistinct(col("v"), 64).as("est")).head().getDouble(0)
    assert(withDups == 40.0)
  }

  test("estimate branch lands within the k=256 error budget (~3/sqrt(k))") {
    val n = 20000
    val est = estimate(n, 256, 8)
    val rel = math.abs(est - n) / n
    assert(rel < 3.0 / math.sqrt(256.0), s"est=$est rel=$rel")
  }

  test("partition-independent: 1 vs 17 partitions give the identical " +
      "double (set-union merge has no order sensitivity)") {
    val a = estimate(5000, 64, 1)
    val b = estimate(5000, 64, 17)
    assert(a == b, s"$a != $b")
  }

  test("plan does map-side partials: partial + final aggregate nodes") {
    import spark.implicits._
    val df = (1 to 100).map(v => (v % 5, v)).toDF("g", "v")
      .groupBy("g").agg(Corpus.kmvDistinct(col("v")).as("est"))
    val plan = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_graft_kmv_distinct") ||
      plan.contains("partial graft_kmv_distinct") ||
      plan.toLowerCase.contains("partial"), plan)
  }

  test("streaming aggregation state: streamed daily estimates equal " +
      "the batch sketch") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamOps
      .dailyKmvDistinctUsers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val batch = graft.sources.EventsSource.readEvents(spark, dir)
      .withColumn("day_us",
        expr("(ts div 86400000000000) * 86400000000"))
      .groupBy("day_us")
      .agg(Corpus.kmvDistinct(col("user_id")).as("est"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"${streamed.size} streamed vs ${batch.size} batch windows")
  }

  test("type contract: non-BIGINT input is an ANALYSIS error, not an " +
      "executor ClassCastException; out-of-domain longs are rejected loudly") {
    import spark.implicits._
    graft.sql.GraftFunctions.register(spark)
    Seq(("a", "x"), ("a", "y")).toDF("g", "s")
      .createOrReplaceTempView("kmv_bad_type")
    val analysisErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT g, graft_kmv_distinct(s, 64) FROM kmv_bad_type GROUP BY g")
        .collect()
    }
    assert(analysisErr.getMessage.toLowerCase.contains("graft_kmv_distinct")
        || analysisErr.getMessage.toLowerCase.contains("bigint"),
      s"unexpected analysis message: ${analysisErr.getMessage}")
    // raw longs outside [0, 2^60) — e.g. negative ids — must fail loudly,
    // not produce a silently wrong (even negative) estimate
    Seq(("a", -5L), ("a", 3L)).toDF("g", "v")
      .createOrReplaceTempView("kmv_bad_domain")
    val execErr = intercept[Exception] {
      spark.sql(
        "SELECT g, graft_kmv_distinct(v, 64) FROM kmv_bad_domain GROUP BY g")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(execErr).exists(
        _.getMessage != null) && causes(execErr)
      .flatMap(c => Option(c.getMessage)).exists(_.contains("uniform-hash domain")),
      s"expected domain rejection, got: ${execErr.getMessage}")
  }

  test("SQL route equals the DataFrame route") {
    import spark.implicits._
    graft.sql.GraftFunctions.register(spark)
    (1 to 3000).map(v => (s"g${v % 3}", v.toLong)).toDF("g", "v")
      .createOrReplaceTempView("kmv_probe")
    val sql = spark.sql(
      """SELECT g, graft_kmv_distinct(graft_sample_hash(v), 64) AS est
        |FROM kmv_probe GROUP BY g""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val df = spark.table("kmv_probe").groupBy("g")
      .agg(Corpus.kmvDistinct(col("v"), 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sql == df, s"$sql vs $df")
    assert(sql.size == 3)
  }
}
