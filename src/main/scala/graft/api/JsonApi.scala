package graft.api

import graft.core.{Catalog, ColumnWriteItem, RowWriteItem, Smoltable}
import graft.json.JsonValue
import graft.json.JsonValue._
import graft.model._

/** JSON API parity layer: accepts and produces the reference server's exact
  * wire shapes, so a client of the reference's REST API can drive this
  * engine unchanged (minus the HTTP transport).
  *
  * Wire contracts ported from:
  *  - write: `server/src/api/write.rs` + `smoltable/src/table/writer.rs:12-26`
  *    (`{"items":[{"row_key":..,"cells":[{"column_key":..,"time"?:..,
  *    "type":..,"value":..}]}]}`)
  *  - get rows: `server/src/api/get_rows.rs` + `smoltable/src/query/row.rs`
  *  - scan: `server/src/api/scan.rs` + `smoltable/src/query/scan.rs`
  *  - count: `server/src/api/count.rs` + `smoltable/src/query/count.rs`
  *  - delete: `server/src/api/delete_row.rs`
  *  - envelope: `server/src/response.rs:14-19`
  *    (`{"time_ms":..,"status":..,"message":..,"result":..}`)
  */
final class JsonApi(catalog: Catalog, spark: org.apache.spark.sql.SparkSession,
    /** Record per-call `lat#*` latency points into each table's `_mtx_{t}`
      * metrics table, as the reference server does on every API call
      * (`server/src/api/write.rs:103-110`, `get_rows.rs:70-77`,
      * `scan.rs:64-71`, `delete_row.rs:76-83`). Off by default: metrics
      * self-hosting adds a write per query (SURVEY §7.4 #5's
      * write-amplification loop), which benches and embedded use don't
      * want; the server ([[graft.tools.Serve]]) turns it on. */
    val recordLatencies: Boolean = false) {

  import graft.core.MetricsTable

  /** Fire-and-forget latency points, coalesced: points buffer in-process
    * and land as one parquet append per
    * [[graft.core.MetricsTable.DefaultFlushEvery]] points (the 60 s
    * system sweep flushes stragglers), so a busy server's per-call
    * recording doesn't churn one tiny segment per API call. Failures are
    * swallowed like the reference's `.ok()` — a metrics write must never
    * fail the verb that produced it. System tables don't self-report. */
  private def recordLat(tableName: String, points: (String, Double)*): Unit =
    if (recordLatencies && !tableName.startsWith("_"))
      try MetricsTable.open(spark, catalog, Some(tableName))
        .dataPointsBuffered(points)
      catch { case _: Exception => () }

  /** Identifier + system-prefix rules per `server/src/identifier.rs` and the
    * `_` system-table convention (`server/src/main.rs:60`). */
  private def validateTableName(name: String): Option[String] =
    if (name.startsWith("_")) Some("Invalid table name")
    else if (!ColumnKey.isValidIdentifier(name)) Some("Invalid table name")
    else None

  private def table(name: String): Smoltable =
    Smoltable.open(spark, catalog, name)

  private def envelope(timeMs: Long, status: Int, message: String,
      result: String): String =
    s"""{"time_ms":$timeMs,"status":$status,"message":${Json.quote(message)},"result":$result}"""

  /** Times the handler body and maps parse/validation failures to the
    * reference's 400 envelope (`server/src/api/mod.rs` `bad_request`) —
    * malformed JSON, unknown column families, a missing scan mode, etc.
    * produce `{"status":400,...}` instead of escaping to the caller.
    */
  private def timed[T](f: => (Int, String, String)): String = {
    val t0 = System.nanoTime()
    val (status, msg, result) =
      try f
      catch {
        // input-shaped failures only — IllegalStateException (e.g. a
        // corrupt manifest) is server-side and must surface as 500
        case e @ (_: IllegalArgumentException | _: NoSuchElementException |
            _: NumberFormatException | _: IndexOutOfBoundsException) =>
          (400, Option(e.getMessage).getOrElse("Bad request"), "null")
      }
    envelope((System.nanoTime() - t0) / 1000000L, status, msg, result)
  }

  // -------------------------------------------------------------- parsing

  private def parseFilter(o: JsonValue): Option[ColumnFilter] = {
    def key(v: JsonValue) = ColumnKey.of(v.asString)
    o.get("key").map(k => ColumnFilter.Key(key(k)))
      .orElse(o.get("multi_key").map(m =>
        ColumnFilter.Multi(m.asArray.map(key))))
      .orElse(o.get("prefix").map(p => ColumnFilter.Prefix(key(p))))
  }

  private def parseCellValue(cell: JsonValue): CellValue = {
    val v = cell.get("value").getOrElse(JNull)
    cell.get("type").map(_.asString).getOrElse("string") match {
      case "string"  => CellValue.S(v.asString)
      case "boolean" => CellValue.B(v.asBoolean)
      case "byte"    => CellValue.Byte(v.asLong.toShort)
      case "i32"     => CellValue.I32(v.asLong.toInt)
      case "i64"     => CellValue.I64(v.asLong)
      case "f32"     => CellValue.F32(v.asDouble.toFloat)
      case "f64"     => CellValue.F64(v.asDouble)
      case other => throw new IllegalArgumentException(s"unknown type $other")
    }
  }

  private def parseRowInput(item: JsonValue): GetRowInput = {
    val row = item.get("row").getOrElse(JObject(Map.empty))
    val column = item.get("column")
    GetRowInput(
      key = row.get("key").map(_.asString).getOrElse(""),
      filter = column.flatMap(parseFilter),
      rowCellLimit = row.get("cell_limit").map(_.asLong.toInt),
      columnCellLimit =
        column.flatMap(_.get("cell_limit")).map(_.asLong.toInt))
  }

  private def parseScanMode(row: JsonValue): ScanMode =
    row.get("prefix").map(p => ScanMode.Prefix(p.asString))
      .orElse(row.get("range").map { r =>
        ScanMode.Range(
          r.get("start").map(_.asString).getOrElse(""),
          r.get("end").map(_.asString).getOrElse(""),
          r.get("inclusive").exists(_.asBoolean))
      })
      .getOrElse(throw new IllegalArgumentException("missing scan mode"))

  private def parseScanInput(body: JsonValue): ScanInput = {
    val row = body.get("row").getOrElse(JObject(Map.empty))
    val column = body.get("column")
    ScanInput(
      mode = parseScanMode(row),
      filter = column.flatMap(parseFilter),
      rowLimit = row.get("limit").map(_.asLong.toInt),
      rowOffset = row.get("offset").map(_.asLong),
      rowCellLimit = row.get("cell_limit").map(_.asLong.toInt),
      columnCellLimit = column.flatMap(_.get("cell_limit")).map(_.asLong.toInt),
      globalCellLimit =
        body.get("cell").flatMap(_.get("limit")).map(_.asLong.toInt),
      sample = row.get("sample").map(_.asDouble.toFloat),
      // graft extensions beyond the reference wire shape (both default
      // false): reference-exact per-cell sampling/offset advancement and
      // chunk-granular scanned-cell accounting (COVERAGE divergences 1/6)
      perCellDiffusion =
        body.get("per_cell_diffusion").exists(_.asBoolean),
      chunkGranularMetrics =
        body.get("chunk_granular_metrics").exists(_.asBoolean))
  }

  // ------------------------------------------------------------ rendering

  private def renderRows(rows: Seq[GRow]): String =
    rows.map(_.toJson).mkString("[", ",", "]")

  // ------------------------------------------------------------- handlers

  /** Shared guard sequence of every per-table verb (`write.rs:34-52`,
    * `get_rows.rs:31-47`, `scan.rs:25-41`, `count.rs:22-40`,
    * `delete_row.rs:33-50`, `create_column_family.rs:46-62`): system
    * prefix → `sysStatus` (400 everywhere except the column-family
    * route's 403), invalid identifier → 400, unknown table → the 404
    * envelope. Verbs never auto-create: the reference routes through its
    * table registry and a miss is a miss. */
  private def withExistingTable(name: String, sysStatus: Int = 400)(
      body: Smoltable => (Int, String, String)): (Int, String, String) =
    if (name.startsWith("_")) (sysStatus, "Invalid table name", "null")
    else if (!ColumnKey.isValidIdentifier(name))
      (400, "Invalid table name", "null")
    else Smoltable.openExisting(spark, catalog, name) match {
      // non-creating open: a delete racing this verb can no longer be
      // resurrected by open's createDirectories ([[Smoltable.openExisting]])
      case None => (404, "Table not found", "null")
      case Some(t) => body(t)
    }

  /** Serializes create/delete DDL — the analog of the reference's
    * `tables.write().await` registry lock: without it two concurrent
    * creates could both see "absent" and both return 201. The lock is
    * the CATALOG's ([[Catalog.ddlLock]]) so the metrics sweep's
    * existence-checked flush serializes with deletes too. Reads don't
    * take it (the reference's read verbs hold only the read lock). */
  private def ddlLock = catalog.ddlLock

  /** `PUT /v1/table/{name}` — create table (`create_table.rs`): 400
    * invalid/system name, 409 "Conflict" if it exists, 201 on success. */
  def createTable(name: String): String = timed {
    validateTableName(name) match {
      case Some(err) => (400, err, "null")
      case None => ddlLock.synchronized {
        if (catalog.tableExists(name)) (409, "Conflict", "null")
        else {
          table(name)
          (201, "Table created successfully", "null")
        }
      }
    }
  }

  /** `POST /v1/table/{name}/column-family` — create column families
    * (`create_column_family.rs`): system name → 403, invalid → 400,
    * unknown table → 404, existing family → 409, success → 201. */
  def createColumnFamilies(name: String, body: String): String = timed {
    val json = JsonValue.parse(body)
    val fams = json.get("column_families").map(_.asArray).getOrElse(Nil).map { f =>
      val gc = f.get("gc_settings")
      ColumnFamilyDefinition(
        f.get("name").map(_.asString).getOrElse(""),
        GcSettings(
          versionLimit = gc.flatMap(_.get("version_limit")).map(_.asLong.toInt),
          ttlSecs = gc.flatMap(_.get("ttl_secs")).map(_.asLong)))
    }
    if (fams.exists(f => !ColumnKey.isValidIdentifier(f.name)))
      (400, "Invalid column family name", "null")
    else withExistingTable(name, sysStatus = 403) { t =>
      val existing = t.listColumnFamilies.map(_.name).toSet
      fams.find(f => existing(f.name)) match {
        case Some(f) =>
          (409, s"Column family ${f.name} already exists", "null")
        case None =>
          t.createColumnFamilies(fams,
            localityGroup = json.get("locality_group").exists(_.asBoolean))
          (201, "Column families created successfully", "null")
      }
    }
  }

  /** `POST /v1/table/{name}/write` — empty items rejected BEFORE name
    * validation (`write.rs:30-32`, the JSON extractor order). */
  def write(name: String, body: String): String = timed {
    val t0 = System.nanoTime()
    val json = JsonValue.parse(body)
    val items = json.get("items").map(_.asArray).getOrElse(Nil).map { item =>
      RowWriteItem(
        rowKey = item.get("row_key").map(_.asString).getOrElse(""),
        cells = item.get("cells").map(_.asArray).getOrElse(Nil).map { c =>
          ColumnWriteItem(
            column = ColumnKey.of(
              c.get("column_key").map(_.asString).getOrElse("")),
            ts = c.get("time").map(_.asLong),
            value = parseCellValue(c))
        })
    }
    if (items.isEmpty) (400, "Items array should not be empty", "null")
    else withExistingTable(name) { t =>
      t.write(items)
      val cellCount = items.map(_.cells.size).sum
      val microsTotal = (System.nanoTime() - t0) / 1000L
      val microsPerCell =
        if (cellCount == 0) 0L else microsTotal / cellCount
      recordLat(name, "lat#write#cell" -> microsPerCell.toDouble,
        "lat#write#batch" -> microsTotal.toDouble)
      (200, "Data ingestion successful",
        s"""{"micros_per_cell":$microsPerCell,"items":{"row_count":${items.size},"cell_count":$cellCount}}""")
    }
  }

  /** `POST /v1/table/{name}/rows` — multi-get. */
  def getRows(name: String, body: String): String = timed {
    val t0 = System.nanoTime()
    val json = JsonValue.parse(body)
    val items = json.get("items").map(_.asArray).getOrElse(Nil)
      .map(parseRowInput)
    withExistingTable(name) { t =>
      val out = t.multiGet(items)
      val microsPerRow = if (out.rows.isEmpty) 0L
        else (System.nanoTime() - t0) / 1000L / out.rows.size
      recordLat(name, "lat#read#row" -> microsPerRow.toDouble)
      (200, "Query successful",
        s"""{"rows":${renderRows(out.rows)},"affected_locality_groups":${out.metrics.affectedLocalityGroups},"cells_scanned_count":${out.metrics.cellsScanned},"rows_scanned_count":${out.metrics.rowsScanned},"bytes_scanned_count":${out.metrics.bytesScanned}}""")
    }
  }

  /** `POST /v1/table/{name}/scan`. */
  def scan(name: String, body: String): String = timed {
    val t0 = System.nanoTime()
    val in = parseScanInput(JsonValue.parse(body))
    withExistingTable(name) { t =>
      val out = t.scan(in)
      recordLat(name,
        "lat#read#pfx" -> ((System.nanoTime() - t0) / 1000L).toDouble)
      (200, "Query successful",
        s"""{"rows":${renderRows(out.rows)},"affected_locality_groups":${out.metrics.affectedLocalityGroups},"cells_scanned_count":${out.metrics.cellsScanned},"rows_scanned_count":${out.metrics.rowsScanned},"bytes_scanned_count":${out.metrics.bytesScanned}}""")
    }
  }

  /** `POST /v1/table/{name}/count`. */
  def count(name: String, body: String): String = timed {
    val json = JsonValue.parse(body)
    val row = json.get("row").getOrElse(JObject(Map.empty))
    val in = CountInput(
      mode = parseScanMode(row),
      filter = json.get("column").flatMap(parseFilter))
    withExistingTable(name) { t =>
      val out = t.scanCount(in)
      (200, "Query successful",
        s"""{"affected_locality_groups":${out.affectedLocalityGroups},"cell_count":${out.cellCount},"row_count":${out.rowCount},"bytes_scanned_count":${out.bytesScanned}}""")
    }
  }

  /** `DELETE /v1/table/{name}/row`. */
  def deleteRow(name: String, body: String): String = timed {
    val t0 = System.nanoTime()
    val json = JsonValue.parse(body)
    val rowKey = json.get("row_key").map(_.asString).getOrElse("")
    val filter = json.get("column_filter").flatMap(parseFilter)
    withExistingTable(name) { t =>
      val deleted = t.deleteRow(rowKey, filter)
      val microsTotal = (System.nanoTime() - t0) / 1000L
      val microsPerItem = if (deleted == 0) 0L else microsTotal / deleted
      recordLat(name, "lat#del#row" -> microsTotal.toDouble,
        "lat#del#cell" -> microsPerItem.toDouble)
      (202, "Deletion completed successfully",
        s"""{"micros_per_item":$microsPerItem,"deleted_cells_count":$deleted}""")
    }
  }

  /** `GET /v1/table` — list tables with the reference's full detail
    * (`server/src/api/list_tables.rs:30-111`): column families with GC
    * settings, locality groups, per-partition paths + segment counts
    * (parquet file counts, `smoltable/src/table/mod.rs:888-904`), disk
    * usage, and global cache stats (Spark block-manager storage memory
    * standing in for the reference's block cache).
    */
  def listTables(): String = timed {
    import graft.core.TableManifest
    // user tables only: the reference's registry never holds the `_`
    // system tables (its metrics live in partitions, not the registry)
    val tables = catalog.listTables().filterNot(_.startsWith("_")).map { name =>
      val t = table(name)
      val m = t.manifest
      val fams = m.families.map { f =>
        val vl = f.gc.versionLimit.map(_.toString).getOrElse("null")
        val ttl = f.gc.ttlSecs.map(_.toString).getOrElse("null")
        s"""{"name":${Json.quote(f.name)},"gc_settings":{"version_limit":$vl,"ttl_secs":$ttl}}"""
      }.mkString("[", ",", "]")
      val lgs = m.localityGroups.map(g =>
        s"""{"id":${Json.quote(g.id)},"column_families":${g.families.map(Json.quote).mkString("[", ",", "]")}}""")
        .mkString("[", ",", "]")
      // partitions: manifest + default data partition + one per lg
      // (reference shape `PartitionListEntry` + segment counts)
      val partEntries =
        Seq(s"_man_$name" -> t.manifestFilePath.toString) ++
          ((TableManifest.DefaultGroup +: m.localityGroups.map(_.id)).map { lg =>
            val pname = if (lg == TableManifest.DefaultGroup) s"_dat_$name"
              else s"_lg_${lg}_$name"
            pname -> t.partitionPath(lg).toString
          })
      val parts = partEntries.zipWithIndex.map { case ((pname, path), i) =>
        val segs =
          if (i == 0) 0
          else {
            val lg = (TableManifest.DefaultGroup +: m.localityGroups.map(_.id))(i - 1)
            t.segmentCount(lg)
          }
        s"""{"name":${Json.quote(pname)},"path":${Json.quote(path)},"segment_count":$segs}"""
      }.mkString("[", ",", "]")
      s"""{"name":${Json.quote(name)},"column_families":$fams,"locality_groups":$lgs,"partitions":$parts,"disk_space_in_bytes":${catalog.diskSpaceUsage(name)}}"""
    }
    val cacheStats = {
      val statuses = spark.sparkContext.getExecutorMemoryStatus.values
      val used = statuses.map { case (max, remaining) => max - remaining }.sum
      val blocks = spark.sparkContext.getRDDStorageInfo
        .map(_.numCachedPartitions).sum
      s"""{"block_count":$blocks,"memory_usage_in_bytes":$used}"""
    }
    (200, "Tables retrieved successfully",
      s"""{"tables":{"count":${tables.size},"items":${tables.mkString("[", ",", "]")}},"cache_stats":$cacheStats}""")
  }

  /** `GET /v1/table/{name}/metrics`. The reference registers this route but
    * its success path is `unimplemented!()`
    * (`server/src/api/metrics.rs:29-30`); only the unknown-table branch is
    * reachable, returning the 404 envelope (`metrics.rs:38-44`). Mirrored
    * exactly: unknown table → 404 envelope, known table → the panic
    * surfaces as the transport's plain-text 500 (`server/src/error.rs`).
    * Metrics remain queryable the reference's own way — a scan on the
    * `_mtx_*` system tables ([[graft.core.MetricsTable]]).
    */
  def tableMetrics(name: String): String = timed {
    // plain existence check, INCLUDING system tables: the reference
    // persists `_metrics` as a registry entry (`main.rs:64`
    // `persist_user_table("_metrics")`), so a registry hit on a system
    // table reaches the unimplemented!() 500 too. `tableExists` itself
    // rejects "." / ".." / nested paths (never registry entries).
    if (catalog.tableExists(name))
      throw new IllegalStateException(
        "not implemented: metrics route is unimplemented!() upstream")
    (404, "Table not found", "null")
  }

  /** `DELETE /v1/table/{name}` — `server/src/api/delete_table.rs`:
    * system/invalid names → 400, unknown table → 404 envelope, success →
    * 202 `{"micros": ...}`; the table's metrics partitions are deleted
    * WITH it (`delete_table.rs:50-58`), including any still-buffered
    * latency points (so a later coalesced flush can't resurrect the
    * dropped `_mtx_` table). */
  def deleteTable(name: String): String = timed {
    val t0 = System.nanoTime()
    validateTableName(name) match {
      case Some(msg) => (400, msg, "null")
      case None => ddlLock.synchronized {
        if (!catalog.tableExists(name)) (404, "Table not found", "null")
        else {
          catalog.dropTable(name)
          MetricsTable.discardBuffer(catalog, Some(name))
          catalog.dropTable(MetricsTable.nameFor(Some(name)))
          (202, "Deletion completed successfully",
            s"""{"micros":${(System.nanoTime() - t0) / 1000L}}""")
        }
      }
    }
  }

  /** `GET /` — server-rendered metrics dashboard ([[Dashboard]]), the
    * reference's `render_dashboard` (`server/src/html.rs:11-197`). */
  def dashboardHtml(): String = Dashboard.render(catalog, spark)
}
