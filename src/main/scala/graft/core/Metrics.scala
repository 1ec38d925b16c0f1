package graft.core

import org.apache.spark.sql.SparkSession

import graft.model._

/** Metrics self-tables: the engine eats its own dog food by storing
  * time-series data points in regular smoltables, mirroring the reference's
  * per-table `_mtx_{name}` and global `_metrics` tables
  * (`server/src/metrics.rs:10-38`, `server/src/app_state.rs:40-43`).
  *
  * Data points are F64 cells versioned by write-time nanoseconds under
  * `value:` of a row keyed by the metric name (`lat#write#cell`,
  * `lat#read#row`, ...). Dashboards read the newest N versions
  * (`cell_limit: 720` — `server/src/html.rs:72-193`); retention is a
  * byte-capped FIFO ([[MetricsTable.enforceCap]], the analog of the
  * reference's FIFO compaction strategy capped at 1 MiB).
  */
final class MetricsTable private (val table: Smoltable) {

  /** Record one data point for a metric row (now-ns version timestamp).
    * Reference macro: `data_point!` (`server/src/metrics.rs:40-45`). */
  def dataPoint(metric: String, value: Double, tsNanos: Option[Long] = None): Unit =
    dataPoints(Seq(metric -> value), tsNanos)

  /** Record several metrics in ONE write batch (one parquet append), the
    * shape of the reference's per-API-call `write_batch` with multiple
    * `lat#*` rows (`server/src/api/write.rs:103-110`). */
  def dataPoints(points: Seq[(String, Double)],
      tsNanos: Option[Long] = None): Unit =
    table.write(points.map { case (metric, value) =>
      RowWriteItem(metric, Seq(
        ColumnWriteItem(ColumnKey.of("value:"), tsNanos, CellValue.F64(value))))
    })

  /** Newest `limit` points for a metric, newest first (dashboard read
    * path: multi-get with `cell_limit: 720`). */
  def latest(metric: String, limit: Int = 720): Seq[(Long, Double)] = {
    val out = table.getRow(GetRowInput(metric, columnCellLimit = Some(limit)))
    out.row.toSeq.flatMap(_.columns.get("value")).flatMap(_.get(""))
      .flatten.collect { case GCell(t, CellValue.F64(v)) => (t, v) }
  }

  /** FIFO retention: when the table exceeds `capBytes` on disk, drop the
    * oldest versions until each metric keeps at most `keepVersions`.
    * The reference gets this from a byte-capped FIFO compaction strategy
    * (`server/src/metrics.rs:14-23`); here it is an explicit maintenance
    * rewrite, run opportunistically after writes. ONE Spark job: the
    * dropped count is the GC rewrite's own observed dead-cell metric
    * ([[CellOps.gcSurvivors]]) — no before/after table counts.
    */
  def enforceCap(capBytes: Long = 1024 * 1024, keepVersions: Int = 720): Long =
    if (table.catalog.diskSpaceUsage(table.name) <= capBytes) 0L
    else table.runVersionGcWith(Map("value" ->
      GcSettings(versionLimit = Some(keepVersions))))
}

object MetricsTable {
  /** System-table name, reference convention `_mtx_{table}` /  `_metrics`
    * (`server/src/main.rs:59-96`). */
  def nameFor(userTable: Option[String]): String =
    userTable.map(t => s"_mtx_$t").getOrElse("_metrics")

  def open(spark: SparkSession, catalog: Catalog,
      userTable: Option[String]): MetricsTable = {
    val t = Smoltable.open(spark, catalog, nameFor(userTable))
    if (!t.listColumnFamilies.exists(_.name == "value"))
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
    new MetricsTable(t)
  }
}
