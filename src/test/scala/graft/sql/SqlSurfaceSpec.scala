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

  test("graft_scan TVF: scan verb in FROM matches the Scala verb, " +
      "prefix pushed to the scan, literal args enforced") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "web")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("title")))
      t.writeBulk(titleCells(Seq(
        "org.apache.spark" -> "Apache Spark",
        "org.apache.kafka" -> "Apache Kafka",
        "org.apache.arrow" -> "Apache Arrow",
        "com.github.a" -> "GitHub A")))
      SqlSurface.registerScanTvf(spark, cat)

      val sqlRes = spark.sql(
        "SELECT row_key, vs FROM graft_scan('web', 'org.') ORDER BY row_key")
      val viaVerb = CellOps.scanCells(t.cellsFor(None),
          ScanInput(ScanMode.Prefix("org.")))
        .select(col("row_key"), col("value.s"))
        .orderBy("row_key")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(sqlRes.collect().map(r => (r.getString(0), r.getString(1)))
        .toSeq == viaVerb.toSeq)
      assert(viaVerb.length == 3)

      // the TVF splices a plan, not rows: the prefix predicate must land
      // in the parquet scan's pushed filters like the view route does
      val plan = sqlRes.queryExecution.executedPlan.toString
      assert(plan.contains("StringStartsWith(row_key,org.)"),
        s"prefix not pushed through the TVF:\n$plan")

      // row_limit arg maps to the engine's distributed ROW limit:
      // 2 rows in key order, each with its whole cell set
      val limited = spark.sql(
        "SELECT row_key FROM graft_scan('web', 'org.', 2)")
        .collect().map(_.getString(0)).toSet
      assert(limited == Set("org.apache.arrow", "org.apache.kafka"))

      // planning args must be literals — a column reference is a
      // resolution-time error, not a silent empty result
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM graft_scan('web', substring(rand(), 0, 1))")
          .collect()
      }
      assert(err.getMessage.contains("literal"),
        s"expected literal-arg rejection, got: ${err.getMessage}")
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

  test("native graft_* SQL functions resolve, agree with the Scala API, " +
      "and stay inside whole-stage codegen") {
    GraftFunctions.register(spark)

    // cosine: exact on an orthonormal pair
    assert(spark.sql(
      "SELECT graft_cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .head().getDouble(0) == 1.0)
    assert(math.abs(spark.sql(
      "SELECT graft_cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d))")
      .head().getDouble(0)) < 1e-15)

    // minhash signature via SQL == the expression API the dedup
    // pipeline uses (same kernel, same seeds)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(5)
    docs.createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash_signature(text) AS sig FROM mh_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = docs.select(col("doc_id"),
        graft.functions.MinHashSignature(col("text"), 8,
          graft.operators.Dedup.DefaultSeeds).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)

    // sample hash via SQL == Corpus.sampleHash bit-for-bit: one
    // sampling coin, whichever surface flips it
    val shSql = spark.sql(
      "SELECT doc_id, graft_sample_hash(doc_id) AS p FROM mh_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shApi = docs.select(col("doc_id"),
        graft.operators.Corpus.sampleHash(col("doc_id")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shSql == shApi)
    assert(shSql.values.forall(p => p >= 0L && p < (1L << 60)))

    // codegen'd, not a UDF: the SQL plan keeps the kernel inside a
    // WholeStageCodegen stage (a Scala UDF would break the span)
    val plan = spark.sql(
      "SELECT graft_minhash_signature(text) FROM mh_docs")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"),
      s"expected a WholeStageCodegen stage around the kernel:\n$plan")

    // the round-19 perceptual stub kernel: SQL door == the operator's
    // mapPartitions stub path (text corpus ⇒ all-stub), and codegen'd
    val phSql = spark.sql(
      "SELECT doc_id, graft_phash(encode(text, 'utf-8')) AS h " +
        "FROM mh_docs WHERE text IS NOT NULL")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val phApi = graft.operators.Multimodal.perceptualHashes(
        docs.filter(col("text").isNotNull).select(col("doc_id"),
          org.apache.spark.sql.functions.encode(col("text"), "utf-8")
            .as("payload")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(phSql == phApi)
    val phPlan = spark.sql(
      "SELECT graft_phash(encode(text, 'utf-8')) FROM mh_docs")
      .queryExecution.executedPlan.toString
    assert(phPlan.contains("*(1)"),
      s"graft_phash must stay inside WholeStageCodegen:\n$phPlan")

    // the round-17 one-pass text kernels: SQL door == Scala API door
    val qSql = spark.sql(
      "SELECT doc_id, graft_quality_signals(text).n_tokens AS n, " +
        "graft_simhash(text, 16) AS sh, " +
        "graft_repetition_signals(text).max_trigram_count AS tri " +
        "FROM mh_docs WHERE text IS NOT NULL")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val qApi = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.QualitySignalsExpr(col("text"),
          graft.operators.TextAnalysis.DefaultStopwords)
          .getField("n_tokens").as("n"),
        graft.functions.SimHashFingerprint(col("text"), 16).as("sh"),
        graft.functions.RepetitionSignals(col("text"))
          .getField("max_trigram_count").as("tri"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(qSql == qApi)
    // term-counts map explodes into the same (term, tf) rows the
    // TF-IDF tf stage consumes
    val tcSql2 = spark.sql(
      "SELECT doc_id, t.term, t.tf FROM mh_docs " +
        "LATERAL VIEW explode(graft_term_counts(text)) t AS term, tf " +
        "WHERE text IS NOT NULL")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val tcApi2 = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TermCounts(col("text")))
          .as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(tcSql2 == tcApi2)

    // count kernels: SQL door == the builtin formulas they replace
    val cnt = spark.sql(
      "SELECT sum(graft_split_count(text)) AS a, " +
        "sum(graft_split_count(trim(text), false)) AS b, " +
        "sum(graft_bpeish_count(text)) AS c FROM mh_docs " +
        "WHERE text IS NOT NULL").head()
    val cntRef = spark.sql(
      "SELECT sum(size(split(text, ' '))) AS a, " +
        "sum(size(split(trim(text), '\\\\s+'))) AS b, " +
        "sum(regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]')) " +
        "AS c FROM mh_docs WHERE text IS NOT NULL").head()
    assert(cnt.getLong(0) == cntRef.getLong(1 - 1) &&
      cnt.getLong(1) == cntRef.getLong(1) && cnt.getLong(2) == cntRef.getLong(2),
      s"count doors diverge: $cnt vs $cntRef")

    // arity errors are loud
    intercept[Exception] {
      spark.sql("SELECT graft_cosine_similarity(array(1.0d))").collect()
    }
  }

  test("GraftExtensions injects the same list at session build time") {
    // the injection list is the registry list (one definition); applying
    // the extension to a fresh SparkSessionExtensions must accept every
    // triple without throwing — full resolution behavior is covered by
    // the register() tests above on the live session
    new GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
  }
}
