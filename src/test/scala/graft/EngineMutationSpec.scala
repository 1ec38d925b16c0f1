package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The engine-path mutation oracle rows (`eng_delete_row`,
  * `eng_gc_version`, `eng_write_upsert`) verified against an INDEPENDENT
  * in-Spark reconstruction of the post-mutation state from the source
  * parquet — the same relationship the driver's DuckDB gate has to the
  * queries, so a contract drift lands as a red test before a red round.
  *
  * Reference semantics under test: filtered + whole-row delete
  * (`smoltable/src/table/mod.rs:567-598`, `tests/delete_column_filter.rs`),
  * version-limit GC (`mod.rs:455-562`, `tests/gc.rs`), and batch-write
  * LWW overwrite (`table/writer.rs:46-79`).
  */
class EngineMutationSpec extends SparkSuite {

  private val Dir = "/root/testdata/sf0.001"

  /** Independent rebuild of the orders cell view (dup of SparkEntry's
    * mapping ON PURPOSE: an accidental change there must disagree here). */
  private def expectedOrderCells: DataFrame = {
    val o = spark.read.parquet(s"$Dir/orders.parquet")
    def cell(fam: String, qual: String, vs: org.apache.spark.sql.Column,
        vd: org.apache.spark.sql.Column) =
      o.select(
        lpad(col("o_orderkey").cast("string"), 10, "0").as("row_key"),
        lit(fam).as("family"), lit(qual).as("qualifier"),
        lit(0L).as("ts"),
        vs.cast("string").as("vs"), vd.cast("double").as("vd"))
    cell("o", "status", col("o_orderstatus"), lit(null))
      .unionAll(cell("o", "priority", col("o_orderpriority"), lit(null)))
      .unionAll(cell("o", "custkey", col("o_custkey").cast("string"),
        lit(null)))
      .unionAll(cell("m", "total", lit(null), col("o_totalprice")))
      .unionAll(cell("m", "date",
        date_format(col("o_orderdate"), "yyyy-MM-dd"), lit(null)))
  }

  private def assertSameCells(got: DataFrame, want: DataFrame): Unit = {
    val cols = Seq("row_key", "family", "qualifier", "ts", "vs", "vd")
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    assert(g.count() == w.count())
    assert(g.exceptAll(w).isEmpty && w.exceptAll(g).isEmpty)
  }

  test("eng_delete_row: filtered + whole-row delete survive correctly") {
    val got = SparkEntry.queries("eng_delete_row")(spark, Dir)
    val want = expectedOrderCells
      .filter(col("row_key") < "0000000100")
      .filter(col("row_key") =!= "0000000007")
      .filter(!(col("row_key") === "0000000042" &&
        col("family") === "o" && col("qualifier") === "status"))
    assertSameCells(got, want)
  }

  test("eng_gc_version: newest-100-per-column survive on the real table") {
    val got = SparkEntry.queries("eng_gc_version")(spark, Dir)
    val pts = graft.sources.EventsSource.readEvents(spark, Dir)
      .groupBy(col("event_type"), expr("(ts div 1000) * 1000").as("ts"))
      .agg(max(col("value")).as("vd"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("ts").desc)
    val want = pts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 100)
      .select(col("event_type").as("row_key"), lit("value").as("family"),
        lit("").as("qualifier"), col("ts"),
        lit(null).cast("string").as("vs"), col("vd"))
    assertSameCells(got, want)
  }

  test("eng_gc_ttl: injected-clock TTL GC drops exactly the expired cells") {
    val got = SparkEntry.queries("eng_gc_ttl")(spark, Dir)
    val pts = graft.sources.EventsSource.readEvents(spark, Dir)
      .groupBy(col("event_type"), expr("(ts div 1000) * 1000").as("ts"))
      .agg(max(col("value")).as("vd"))
    val want = pts
      .filter(!(col("ts") > 0 &&
        (lit(1707868800L) - expr("ts div 1000000000")) > 2592000L))
      .select(col("event_type").as("row_key"), lit("value").as("family"),
        lit("").as("qualifier"), col("ts"),
        lit(null).cast("string").as("vs"), col("vd"))
    assertSameCells(got, want)
    // the cut is real: some cells died, some survived
    assert(got.count() > 0 && got.count() < pts.count())
  }

  test("eng_write_upsert: same-coordinate overwrite LWW-resolves, new column surfaces") {
    val got = SparkEntry.queries("eng_write_upsert")(spark, Dir)
    import spark.implicits._
    val upd = Seq(
      ("0000000001", "o", "status", 0L, Option("X"), Option.empty[Double]),
      ("0000000001", "o", "note", 0L, Option("updated"),
        Option.empty[Double]),
      ("0000000042", "m", "total", 0L, Option.empty[String], Option(123.45))
    ).toDF("row_key", "family", "qualifier", "ts", "vs", "vd")
    val base = expectedOrderCells.withColumn("seq", lit(1L))
    val unioned = base.unionAll(upd.withColumn("seq", lit(2L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("row_key", "family", "qualifier", "ts")
      .orderBy(col("seq").desc)
    val want = unioned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("row_key") < "0000000100")
    assertSameCells(got, want)

    // the overwrite actually took: status of row 1 reads back as the
    // batch's value, not the bulk load's
    val status1 = got.filter(col("row_key") === "0000000001" &&
      col("family") === "o" && col("qualifier") === "status")
      .select("vs").collect().map(_.getString(0)).toSeq
    assert(status1 == Seq("X"))
  }

  test("mutating a clone never dirties the shared engine cache") {
    // construction above already cloned+mutated; the cached table the
    // read-path eng_ rows share must still hold the full cell set
    val scan = SparkEntry.queries("eng_get_row")(spark, Dir)
    val want = expectedOrderCells.filter(col("row_key") === "0000000001")
    assertSameCells(scan, want)
  }
}
