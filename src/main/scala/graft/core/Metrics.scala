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

  /** Coalescing variant for per-call latency recording: points accumulate
    * in a process-wide per-table buffer and land as ONE write batch when
    * `flushEvery` have gathered — a busy server writes O(1/flushEvery)
    * parquet segments + manifest lines instead of one per API call
    * (between FIFO-cap rewrites the per-call appends were hundreds of
    * tiny files). Each point's version timestamp is captured at BUFFER
    * time, so coalescing never changes what a dashboard reads — only
    * when it becomes visible (bounded by the 60 s system sweep, which
    * flushes all buffers; unflushed points die with the process, the
    * same fire-and-forget durability the reference's `.ok()` gives). */
  def dataPointsBuffered(points: Seq[(String, Double)],
      flushEvery: Int = MetricsTable.DefaultFlushEvery,
      tsNanos: Option[Long] = None): Unit = {
    val ts = tsNanos.getOrElse(MetricsTable.nowNanos)
    val buf = MetricsTable.bufferFor(table)
    val drained = buf.synchronized {
      points.foreach { case (m, v) => buf += ((m, v, ts)) }
      if (buf.size >= flushEvery) { val d = buf.toVector; buf.clear(); d }
      else Vector.empty
    }
    writeBuffered(drained)
  }

  /** Drain this table's buffer to disk (the sweep / shutdown / test
    * hook — restores `dataPoint`-visible semantics on demand). */
  def flushBuffered(): Unit = {
    val buf = MetricsTable.bufferFor(table)
    val drained = buf.synchronized {
      val d = buf.toVector; buf.clear(); d
    }
    writeBuffered(drained)
  }

  /** One write batch preserving each point's buffer-time version. The
    * write is OUTSIDE the buffer lock: a Spark append under the lock
    * would serialize every concurrent recorder behind it. */
  private[core] def writeBuffered(pts: Vector[(String, Double, Long)]): Unit =
    if (pts.nonEmpty)
      table.write(pts.map { case (metric, value, ts) =>
        RowWriteItem(metric, Seq(ColumnWriteItem(
          ColumnKey.of("value:"), Some(ts), CellValue.F64(value))))
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
    * rewrite, run opportunistically after writes. ONE Spark job in the
    * common case: the dropped count is the GC rewrite's own observed
    * dead-cell metric ([[CellOps.gcSurvivors]]) — no before/after table
    * counts.
    *
    * BYTE-driven fallback (round 17 — full FIFO parity): a version
    * trim alone cannot shrink a WIDE table (many metric rows, few
    * versions each), while the reference's FIFO drops its oldest
    * segments regardless of shape. When the table is still over budget
    * after the version trim, the oldest CELLS across all metrics are
    * evicted: one tiny aggregate finds the version-timestamp cutoff at
    * the byte-budget quantile, and a TTL GC pass (explicit clock —
    * deterministic) drops everything older. Worst case two rewrites
    * per enforcement, only ever when over budget. */
  def enforceCap(capBytes: Long = 1024 * 1024, keepVersions: Int = 720): Long = {
    if (table.catalog.diskSpaceUsage(table.name) <= capBytes) return 0L
    var dropped = table.runVersionGcWith(Map("value" ->
      GcSettings(versionLimit = Some(keepVersions))))
    // COMMITTED bytes, not filesystem du: just-retired segments from
    // the trim above may linger until their read pins drain, and
    // counting them would overstate the overshoot and evict too deep.
    // The byte→cell mapping is nonlinear (parquet framing, encoding),
    // so one quantile pass can undershoot — re-check the committed
    // footprint and iterate, bounded, until under budget or no pass
    // makes progress (round 18; r17 ran exactly one pass unchecked).
    var passes = 0
    var after = table.manifest.dataFiles.map(_.size).sum
    while (after > capBytes && capBytes > 0 && passes < 4) {
      val keepFrac = math.max(0.0, math.min(1.0,
        capBytes.toDouble / after.toDouble))
      val cut = table.allCells
        .agg(org.apache.spark.sql.functions
          .expr(s"approx_percentile(ts, ${1.0 - keepFrac}d)"))
        .head()
      if (cut.isNullAt(0)) return dropped // empty table: nothing to evict
      val cutoffNanos = cut.getLong(0)
      // TTL death is strict `clock - ts > ttl`, so ttl = clock - cutoff
      // keeps ts >= cutoff — the newest ~keepFrac of cells. The GC
      // clock is max(wall-now, cutoff): with wall-now alone, a FUTURE-
      // stamped cutoff (clock skew / future-dated writes reaching the
      // budget quantile) made the subtraction negative, the 1 s floor
      // took over, and the pass evicted essentially every cell; anchored
      // at the cutoff, the eviction boundary tracks the cutoff itself.
      val clock = math.max(MetricsTable.nowNanos, cutoffNanos)
      val ttlSecs =
        math.max(1L, (clock - cutoffNanos) / 1000000000L)
      val got = table.runVersionGcWith(
        Map("value" -> GcSettings(ttlSecs = Some(ttlSecs))), clock)
      dropped += got
      if (got == 0L) return dropped // no progress: stop rather than spin
      after = table.manifest.dataFiles.map(_.size).sum
      passes += 1
    }
    dropped
  }
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

  /** Segment-coalescing threshold for [[MetricsTable.dataPointsBuffered]]. */
  val DefaultFlushEvery = 64

  /** FIFO byte cap for metrics tables, from `SMOLTABLE_METRICS_CAP_MB`
    * (reference `server/src/env.rs:26-31`): default 1 MB, parsed as the
    * reference's u16 — an invalid or out-of-range value rejects at
    * startup (its `expect`) rather than silently running uncapped. */
  def envCapBytes(env: Map[String, String] = sys.env): Long = {
    val mb = env.getOrElse("SMOLTABLE_METRICS_CAP_MB", "1")
    mb.toIntOption.filter(m => m >= 0 && m <= 65535) match {
      case Some(m) => m.toLong * 1024 * 1024
      case None => throw new IllegalArgumentException(
        s"invalid metrics cap MB setting, can be up to 65535: $mb")
    }
  }

  private[core] def nowNanos: Long = {
    val i = java.time.Instant.now()
    i.getEpochSecond * 1000000000L + i.getNano
  }

  /** Process-wide buffers keyed by (catalog, metrics table) — instances
    * of [[MetricsTable]] are opened per call, so the buffer must outlive
    * them (the same keying as [[Smoltable]]'s per-table locks). */
  private val buffers = new java.util.concurrent.ConcurrentHashMap[
    String, scala.collection.mutable.ArrayBuffer[(String, Double, Long)]]()

  private def bufferFor(t: Smoltable) =
    buffers.computeIfAbsent(s"${t.catalog.baseDir}\t${t.name}",
      _ => scala.collection.mutable.ArrayBuffer.empty)

  /** Drop any buffered-but-unflushed points of one metrics table AND its
    * map entry (table deletion: the points' table is gone; flushing later
    * would recreate it, and dropped tables must not leak map entries).
    * A point recorded by a concurrently in-flight verb into the removed
    * buffer object is lost — the fire-and-forget contract. */
  def discardBuffer(catalog: Catalog, userTable: Option[String]): Unit = {
    val buf = buffers.remove(s"${catalog.baseDir}\t${nameFor(userTable)}")
    if (buf != null) buf.synchronized(buf.clear())
  }

  /** Flush every buffered metrics table of `catalog` (the 60 s system
    * sweep's visibility bound). Resurrect-proof by construction:
    *  - empty buffers are skipped without opening the table (`open`
    *    creates the directory);
    *  - non-empty buffers flush UNDER the catalog's DDL lock with a
    *    user-table existence check, so a concurrent (or already
    *    completed) table delete can never interleave a recreate — a
    *    buffer whose user table is gone is discarded instead (points an
    *    in-flight verb managed to record after the drop die here, the
    *    fire-and-forget contract);
    *  - a failing table re-buffers its drained points and does not stop
    *    the sweep for the remaining tables. */
  def flushAll(spark: SparkSession, catalog: Catalog): Unit = {
    val prefix = s"${catalog.baseDir}\t"
    buffers.forEach { (key, buf) =>
      if (key.startsWith(prefix)) try {
        if (buf.synchronized(buf.nonEmpty)) {
          val table = key.substring(prefix.length)
          val user =
            if (table == nameFor(None)) None
            else Some(table.stripPrefix("_mtx_"))
          catalog.ddlLock.synchronized {
            if (user.forall(catalog.tableExists)) {
              val mt = open(spark, catalog, user) // open BEFORE draining
              val drained = buf.synchronized {
                val d = buf.toVector; buf.clear(); d
              }
              if (drained.nonEmpty)
                try mt.writeBuffered(drained)
                catch { case e: Exception =>
                  buf.synchronized(drained.foreach(buf += _))
                  throw e
                }
            } else buffers.remove(key)
          }
        }
      } catch { case _: Exception => () }
    }
  }
}
