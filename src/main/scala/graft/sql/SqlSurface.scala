package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Catalog, Smoltable}

/** SQL exposure of the engine: temp views over the SAME lazy plans the
  * Scala API builds, so `spark.sql` users query wide-column tables and
  * the pipeline operators directly.
  *
  * This is not reference parity (the reference has no SQL surface,
  * `server/src/main.rs:133-146` is a JSON HTTP API) — it is the natural
  * Spark-native face of an "analytics engine": a temp view inlines its
  * plan into Catalyst, so SQL predicates push THROUGH the view into the
  * parquet scans (row-key pushdown over the lg-partitioned layout —
  * asserted by SqlSurfaceSpec's plan check), views compose/join freely
  * with any other table the session knows, and nothing materializes
  * until the user's query runs. At 100 TB the view layer adds zero cost:
  * it is purely plan-time.
  */
object SqlSurface {

  /** Register one wide-column table as `<viewName>`: the LWW-resolved
    * logical cell frame (`row_key, family, qualifier, ts, value` plus
    * `vs`/`vd` convenience projections of the string/f64 arms — the
    * dominant cell types in practice). Internal physical columns
    * (`lg`, `seq`, `bucket`) stay hidden: they are layout, not data. */
  def registerTable(s: SparkSession, t: Smoltable,
      viewName: String): Unit = {
    val cells = t.allCells
      .select(col("row_key"), col("family"), col("qualifier"), col("ts"),
        col("value"),
        col("value.s").as("vs"), col("value.f64").as("vd"))
    cells.createOrReplaceTempView(viewName)
  }

  /** Register every table of `cat` as `<prefix><table>` views. Returns
    * the view names registered. Table names are validated identifiers
    * ([[graft.model.ColumnKey.isValidIdentifier]]), so the view name
    * needs no quoting beyond backticks for `#`/`$`/`.`/`-`; SQL callers
    * use `` `prefix-name` `` syntax for those. */
  def registerCatalog(s: SparkSession, cat: Catalog,
      prefix: String = "graft_"): Seq[String] = {
    GraftFunctions.register(s)
    cat.listTables().map { name =>
      val view = s"$prefix$name"
      registerTable(s, Smoltable.open(s, cat, name), view)
      view
    }
  }

  /** Register the LLM-pipeline operators over a documents corpus as
    * `<prefix>*` views: the corpus itself, exact-dup groups, MinHash
    * candidate pairs, near-dup clusters, and per-doc text analysis.
    * Lazy — a SQL query touching only `<prefix>docs` never runs the
    * dedup machinery — EXCEPT `<prefix>dedup_clusters`: connected
    * components is an iterative algorithm (actions per round), so that
    * view materializes its cluster map AT REGISTRATION; pass
    * `includeClusters = false` to skip it when only the lazy views are
    * needed (the `sql_*` contract rows do). Returns the view names
    * registered. */
  def registerPipeline(s: SparkSession, docs: DataFrame,
      prefix: String = "graft_",
      includeClusters: Boolean = true): Seq[String] = {
    GraftFunctions.register(s)
    import graft.operators.{Dedup, TextAnalysis}
    val pairs = Dedup.minhashCandidates(docs)
    val clusterViews =
      if (!includeClusters) Nil
      else Seq("dedup_clusters" -> docs.select(col("doc_id"))
        .join(Dedup.connectedComponents(pairs), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component")))
    val views = Seq(
      "docs" -> docs,
      "dedup_exact" -> Dedup.exact(docs),
      "minhash_pairs" -> pairs) ++ clusterViews ++ Seq(
      "text_quality" -> TextAnalysis.qualityFeatures(docs),
      "token_counts" -> TextAnalysis.tokenCounts(docs))
    views.map { case (suffix, df) =>
      val view = s"$prefix$suffix"
      df.createOrReplaceTempView(view)
      view
    }
  }

  /** Register `graft_scan(table, prefix[, row_limit])` as a SQL TABLE
    * function: `SELECT * FROM graft_scan('orders', '00000001', 100)`
    * reaches the engine's scan verb without any pre-registered view —
    * the last piece of the SQL surface (scalar functions and views
    * already exist; this makes the SCAN itself first-class in FROM).
    *
    * Spark-first mechanics: the builder is registered in the session's
    * `TableFunctionRegistry` (the same registry `range(...)` lives in),
    * so the analyzer invokes it DURING resolution and splices the
    * returned logical plan into the query — the TVF costs nothing at
    * runtime, and everything downstream (predicate pushdown into the
    * lg-partitioned parquet, column pruning of unselected projections)
    * applies to the spliced plan exactly as to a view. Arguments must
    * be foldable literals — they parameterize PLANNING (which table,
    * which prefix, how many rows), mirroring how the reference's scan
    * verb takes them in the request body
    * (`smoltable/src/query/row.rs:12-30`). The limit maps to the
    * engine's distributed row-limit operator, not a plain LIMIT: it
    * bounds distinct ROWS, carrying each row's full cell set. */
  def registerScanTvf(s: SparkSession, cat: Catalog,
      name: String = "graft_scan"): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import graft.core.CellOps
    import graft.model.{ScanInput, ScanMode}
    val builder: Seq[Expression] => LogicalPlan = args => {
      def litVal(i: Int, what: String): Any = args(i) match {
        case Literal(v, _) if v != null => v
        case other => throw new IllegalArgumentException(
          s"$name: $what must be a non-null literal, got ${other.sql}")
      }
      if (args.length < 2 || args.length > 3)
        throw new IllegalArgumentException(
          s"$name(table, prefix[, row_limit]) takes 2 or 3 arguments, " +
            s"got ${args.length}")
      val table = String.valueOf(litVal(0, "table"))
      val prefix = String.valueOf(litVal(1, "prefix"))
      val rowLimit =
        if (args.length == 3) Some(String.valueOf(litVal(2, "row_limit")).toInt)
        else None
      val t = Smoltable.open(s, cat, table)
      val df = CellOps.scanCells(t.cellsFor(None),
          ScanInput(ScanMode.Prefix(prefix), rowLimit = rowLimit))
        .select(col("row_key"), col("family"), col("qualifier"), col("ts"),
          col("value.s").as("vs"), col("value.f64").as("vd"))
      df.queryExecution.logical
    }
    s.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "internal")
  }
}
