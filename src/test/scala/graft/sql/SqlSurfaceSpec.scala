package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{Catalog, CellOps, Smoltable}
import graft.model._

/** The SQL face: spark.sql over the registered views must (a) agree with
  * the Scala verbs, and (b) stay plan-native — predicates push through
  * the view into the parquet scan, so SQL costs what the verb costs. */
class SqlSurfaceSpec extends SparkSuite {

  private def titleCells(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("row_key", "title").selectExpr(
      "row_key", "'title' as family", "'' as qualifier",
      "cast(0 as bigint) as ts",
      "named_struct('vtype', 'string', 's', title, " +
        "'b', cast(null as boolean), 'u8', cast(null as smallint), " +
        "'i32', cast(null as int), 'i64', cast(null as long), " +
        "'f32', cast(null as float), 'f64', cast(null as double)) as value")
  }

  test("wide-column scan via spark.sql matches the Scala verb, with " +
      "row-key pushdown through the view") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "web")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("title")))
      t.writeBulk(titleCells(Seq(
        "org.apache.spark" -> "Apache Spark",
        "org.apache.kafka" -> "Apache Kafka",
        "com.github.a" -> "GitHub A",
        "de.wikipedia" -> "Wikipedia")))

      val views = SqlSurface.registerCatalog(spark, cat)
      assert(views == Seq("graft_web"))

      val sqlRes = spark.sql(
        "SELECT row_key, vs FROM graft_web WHERE row_key LIKE 'org.%' " +
          "ORDER BY row_key")
      val viaSql = sqlRes.collect().map(r => (r.getString(0), r.getString(1)))
      val viaVerb = CellOps.scanCells(t.cellsFor(None),
          ScanInput(ScanMode.Prefix("org.")))
        .select(col("row_key"), col("value.s"))
        .orderBy("row_key")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(viaSql.toSeq == Seq(
        "org.apache.kafka" -> "Apache Kafka",
        "org.apache.spark" -> "Apache Spark"))
      assert(viaSql.toSeq == viaVerb.toSeq)

      // plan-native, not a materialized shim: the LIKE 'org.%' lands in
      // the parquet scan's pushed filters (prefix seek via row-group
      // stats at scale), proving the view inlines into Catalyst
      val plan = sqlRes.queryExecution.executedPlan.toString
      assert(plan.contains("StringStartsWith(row_key,org.)"),
        s"row-key predicate not pushed to the scan:\n$plan")
    }
  }

  test("dedup + text analysis via spark.sql match the operator API") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val views = SqlSurface.registerPipeline(spark, docs)
    assert(views.contains("graft_dedup_exact"))

    // exact-dup groups through SQL == through the operator
    val viaSql = spark.sql(
      "SELECT h, keep_id, dup_count FROM graft_dedup_exact " +
        "WHERE dup_count > 1 ORDER BY h")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val viaApi = graft.operators.Dedup.exact(docs)
      .filter(col("dup_count") > 1).orderBy("h")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaSql.toSeq == viaApi.toSeq)

    // views COMPOSE: join the cluster view back to the corpus in SQL
    val kept = spark.sql(
      """SELECT count(*) AS n FROM graft_docs d
        |JOIN graft_dedup_clusters c ON d.doc_id = c.doc_id
        |WHERE c.doc_id = c.component""".stripMargin)
      .head().getLong(0)
    val total = docs.count()
    assert(kept > 0 && kept <= total)

    // token counts agree on a spot row
    val tcSql = spark.sql(
      "SELECT ws_tokens FROM graft_token_counts WHERE doc_id = 0")
      .head().getLong(0)
    val tcApi = graft.operators.TextAnalysis.tokenCounts(docs)
      .filter(col("doc_id") === 0).head().getAs[Long]("ws_tokens")
    assert(tcSql == tcApi)
  }
}
