package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** One cell to write. Reference: `smoltable/src/table/writer.rs:12-19`
  * (`ColumnWriteItem`). `ts = None` defaults to now-nanoseconds.
  */
final case class ColumnWriteItem(
    column: ColumnKey, ts: Option[Long], value: CellValue)

/** Reference: `smoltable/src/table/writer.rs:22-26` (`RowWriteItem`). */
final case class RowWriteItem(rowKey: String, cells: Seq[ColumnWriteItem])

private final case class StoredCell(
    row_key: String, family: String, qualifier: String, ts: Long,
    value: CellPayload, seq: Long, lg: String)

/** Spark-native wide-column table.
  *
  * Physical layout (SURVEY.md §7.1): one canonical Parquet cell table per
  * smoltable under `tables/<name>/data/`, hive-partitioned by locality group
  * (`lg=<id>`), so Catalyst's static partition pruning plays the role of the
  * reference's `get_affected_locality_groups`
  * (`smoltable/src/table/row_reader.rs:6-69`). Within files, cells are sorted
  * by `(row_key, family, qualifier, ts desc)` at write time so Parquet
  * min/max row-group stats give prefix/range seeks for free.
  *
  * Contrast with the reference (`smoltable/src/table/mod.rs`): same data
  * model and query semantics, but execution is declarative — each verb
  * builds a DataFrame plan (see [[CellOps]]) and lets Catalyst pick pruning,
  * pushdown, and join/window strategies, instead of a hand-rolled LSM merge
  * loop.
  *
  * Concurrency: ALL mutations — appends, delete/GC/compaction rewrites,
  * DDL manifest updates, crash recovery — serialize on a per-table
  * reentrant JVM lock ([[withMutationLock]]) and are lossless under
  * concurrency; opens never block behind a running rewrite (recovery is
  * tryLock-and-skip). Reads are snapshot-isolated WITHOUT locking: every
  * plan is built from the manifest's committed file list (never a
  * directory listing), rewrites append new segments and commit the list
  * atomically, and replaced segments are retired — deleted only once no
  * in-flight read verb can still reference them ([[Smoltable.ReadGuard]]).
  * This is the reference's `keyspace.instant()` semantics
  * (`smoltable/src/table/mod.rs:653`, `table/reader.rs:28`) re-derived as
  * the manifest-lists-files design of the open table formats. Verbs
  * (`scan`/`getRow`/`multiGet`/counts) pin their snapshot end-to-end;
  * lazy frames ([[allCells]], [[scanFrame]], [[joinRows]]) pin the file
  * LIST at plan time — wrap plan-build + action in [[withPinnedSnapshot]]
  * to extend the eager verbs' end-to-end guarantee to a caller-driven
  * action. Cross-process mutators still need external coordination, like
  * the reference's single-process keyspace.
  */
final class Smoltable private (
    val spark: SparkSession,
    val catalog: Catalog,
    val name: String
) {
  import spark.implicits._

  private def tableDir: Path = catalog.tablePath(name)
  private def manifestPath: Path = tableDir.resolve("manifest")
  private def dataDir: Path = tableDir.resolve("data")

  def manifest: TableManifest = TableManifest.load(manifestPath)

  // ------------------------------------------------------------------ DDL

  /** Reference: `smoltable/src/table/mod.rs:260-297`
    * (`create_column_families`): persists family defs; `localityGroup=true`
    * places them in a fresh dedicated partition.
    */
  def createColumnFamilies(
      defs: Seq[ColumnFamilyDefinition],
      localityGroup: Boolean = false
  ): Unit = withMutationLock {
    defs.foreach { d =>
      require(ColumnKey.isValidIdentifier(d.name), s"invalid family ${d.name}")
    }
    val m = manifest
    val withFams = m.copy(families = m.families ++ defs)
    val updated =
      if (localityGroup) {
        val id = f"lg${withFams.localityGroups.size + 1}%03d"
        withFams.copy(localityGroups =
          withFams.localityGroups :+ LocalityGroup(id, defs.map(_.name)))
      } else withFams
    TableManifest.store(manifestPath, updated)
  }

  def listColumnFamilies: Seq[ColumnFamilyDefinition] = manifest.families

  /** Declare the hash-bucketed-by-row_key layout (README scale section):
    * cells land in `lg=X/bucket=Y` directories where
    * `Y = md5(row_key) mod n`, so point gets and multi-gets statically
    * prune to the key's bucket directory, and two tables bucketed with the
    * same `n` join co-located per bucket. Must be declared before data
    * lands (like the reference's locality groups, the physical layout is
    * write-time).
    */
  def setBucketCount(n: Int): Unit = withMutationLock {
    require(n > 0, s"bucket count must be positive: $n")
    require(!hasData, "bucketing must be declared before data is written")
    TableManifest.store(manifestPath, manifest.copy(buckets = n))
  }

  /** Bucket id column — md5-derived so the same bucket is computable
    * driver-side ([[bucketOfKey]]) and in plain SQL, with no dependence on
    * Spark's internal hash. */
  private def bucketExpr(n: Int): Column =
    pmod(conv(substring(md5(col("row_key")), 1, 15), 16, 10).cast("long"),
      lit(n.toLong)).cast("int")

  /** Driver-side twin of [[bucketExpr]] for static pruning literals. */
  private def bucketOfKey(key: String, n: Int): Int =
    (PortableHash.md5Long60(key) % n).toInt

  private def partitionCols(m: TableManifest): Seq[String] =
    if (m.buckets > 0) Seq("lg", "bucket") else Seq("lg")

  private def withBucket(df: DataFrame, m: TableManifest): DataFrame =
    if (m.buckets > 0) df.withColumn("bucket", bucketExpr(m.buckets)) else df

  // ---------------------------------------------------------------- write

  private def nowNanos: Long = {
    val i = java.time.Instant.now()
    i.getEpochSecond * 1000000000L + i.getNano
  }

  /** Atomic batch write (one Parquet append per call ≈ one `fjall::Batch`,
    * `smoltable/src/table/writer.rs:46-79`). Cells route to their family's
    * locality-group partition; missing timestamps default to now-ns.
    * Duplicate exact coordinates WITHIN the batch collapse to the last
    * occurrence before appending — the LSM upsert would do the same, and a
    * fresh table skips the cross-batch LWW window, so both copies would
    * otherwise surface ([[maybeLww]]).
    */
  def write(items: Seq[RowWriteItem]): Unit = withMutationLock {
    val m = manifest
    val known = m.families.map(_.name).toSet
    val seqBase = m.nextSeq
    var i = 0
    val rows = items.flatMap { item =>
      item.cells.map { c =>
        require(known.contains(c.column.family),
          s"unknown column family ${c.column.family}")
        i += 1
        StoredCell(
          row_key = item.rowKey,
          family = c.column.family,
          qualifier = c.column.qualifier.getOrElse(""),
          ts = c.ts.getOrElse(nowNanos),
          value = CellPayload(c.value),
          seq = seqBase + i,
          lg = m.groupOf(c.column.family))
      }
    }
    val deduped = rows
      .groupBy(c => (c.row_key, c.family, c.qualifier, c.ts))
      .valuesIterator.map(_.maxBy(_.seq)).toSeq
    withBucket(spark.createDataset(deduped).toDF(), m)
      .sort("lg", "row_key", "family", "qualifier")
      .write.mode("append").partitionBy(partitionCols(m): _*)
      .parquet(dataDir.toString)
    TableManifest.store(manifestPath, m.copy(nextSeq = seqBase + i + 1,
      batchesSinceRewrite = if (m.batchesSinceRewrite == Long.MaxValue) Long.MaxValue else m.batchesSinceRewrite + 1,
      dataFiles = m.dataFiles ++ appendedFiles(m)))
  }

  /** Segment files the append job just wrote, with their sizes (sized at
    * commit so reads never stat): everything on disk that is neither
    * committed (manifest-listed) nor retired-but-pinned. Only called
    * under the mutation lock, so no other append can interleave; crash
    * debris cannot be misattributed because [[recoverRewrite]] removes it
    * before any write verb can run; a concurrent ReadGuard cleanup keeps
    * draining batches in `retiredSet` until their files are actually
    * gone, so a mid-delete segment cannot be misread as newly appended. */
  private def appendedFiles(m: TableManifest): Seq[DataFile] = {
    val live = m.dataFiles.map(_.path).toSet
    val retired = Smoltable.readGuard(catalog, name).retiredSet
    listDataFilesRel().filterNot(f =>
        live(f) || retired(tableDir.resolve(f)))
      .map { f =>
        val p = tableDir.resolve(f)
        DataFile(f, Files.size(p), parquetRowCount(p))
      }
  }

  /** Cell count from ONE local footer read — commit-time metadata (like
    * the size stat beside it), so [[approximateCount]] never needs a job. */
  private def parquetRowCount(p: java.nio.file.Path): Long = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri),
        spark.sessionState.newHadoopConf()))
    try r.getRecordCount finally r.close()
  }

  /** All parquet files under `data/`, as table-dir-relative paths. */
  private def listDataFilesRel(): Seq[String] =
    PathIO.walkFiles(dataDir)(_.getFileName.toString.endsWith(".parquet"))
      .map(f => tableDir.relativize(f).toString)

  /** Bulk load: append a cell DataFrame
    * `(row_key string, family string, qualifier string, ts long, value
    * struct)` without materializing on the driver — the 100 TB ingest path
    * (`write` is for small transactional batches). Cells route to their
    * family's locality-group partition; a cell with an unknown family
    * fails the load INSIDE the write job (the family→group routing
    * expression's fallthrough raises), so validation costs zero extra
    * passes — the previous `distinct()` pre-scan read the entire input a
    * second time, a full extra read of the corpus at the ingest target.
    * The write is all-or-nothing either way: a failed job's partial
    * output is never committed to the manifest (swept as debris on
    * recovery). `seq` is one batch sequence for the whole load (a single
    * "atomic batch" in the reference's sense).
    */
  def writeBulk(cells: DataFrame): Unit = writeBulkCommit(cells, None)

  /** Idempotent [[writeBulk]] for STREAMING ingest
    * (`foreachBatch((df, id) => table.writeBulkOnce(id, cells))`).
    * foreachBatch delivers at-least-once: a crash between the sink
    * write and the checkpoint advance re-delivers the same batch id on
    * restart. The batch's file list and its id commit in ONE manifest
    * store, so the re-delivered batch observes `id <= lastIngestBatch`
    * and skips — exactly-once landing without a distributed
    * transaction, the standard idempotent-sink handshake. Batch ids
    * must be monotonic per query (Structured Streaming's contract for
    * one checkpoint). Returns false iff skipped.
    * Pinned by StreamingIngestSpec's kill+resume + redelivery tests. */
  def writeBulkOnce(batchId: Long, cells: DataFrame): Boolean =
    withMutationLock {
      if (batchId <= manifest.lastIngestBatch) false
      else { writeBulkCommit(cells, Some(batchId)); true }
    }

  private def writeBulkCommit(cells: DataFrame,
      ingest: Option[Long]): Unit = withMutationLock {
    val m = manifest
    val known = m.families.map(_.name)
    val lgMap = known.map(f => f -> m.groupOf(f)).toMap
    val unknownFamily = raise_error(concat(
      lit("unknown column family "), col("family"))).cast("string")
    val lgExpr = known.foldLeft(unknownFamily) { (acc, f) =>
      when(col("family") === f, lgMap(f)).otherwise(acc)
    }
    withBucket(cells
      .withColumn("seq", lit(m.nextSeq))
      .withColumn("lg", lgExpr)
      .select(cellSchema.fieldNames.toIndexedSeq.map(col): _*), m)
      .sortWithinPartitions("lg", "row_key", "family", "qualifier")
      .write.mode("append").partitionBy(partitionCols(m): _*)
      .parquet(dataDir.toString)
    TableManifest.store(manifestPath, m.copy(nextSeq = m.nextSeq + 1,
      batchesSinceRewrite = if (m.batchesSinceRewrite == Long.MaxValue) Long.MaxValue else m.batchesSinceRewrite + 1,
      dataFiles = m.dataFiles ++ appendedFiles(m),
      lastIngestBatch = ingest.getOrElse(m.lastIngestBatch)))
  }

  // ----------------------------------------------------------------- read

  private def hasData: Boolean = manifest.dataFiles.nonEmpty

  private val cellSchema =
    org.apache.spark.sql.Encoders.product[StoredCell].schema

  /** Partition directory columns: `lg` (+ `bucket` on bucketed tables). */
  private def partitionSchema(m: TableManifest) = {
    val base = new org.apache.spark.sql.types.StructType()
      .add("lg", org.apache.spark.sql.types.StringType, nullable = true)
    if (m.buckets > 0)
      base.add("bucket", org.apache.spark.sql.types.IntegerType,
        nullable = true)
    else base
  }

  /** Snapshot scan source: a DataFrame over exactly the manifest's
    * committed `(path, size)` list via
    * [[org.apache.spark.sql.graft.ManifestFileIndex]] — NO filesystem
    * listing and NO stat calls at plan time (sizes ride in the manifest),
    * so planning cost is independent of segment count, and none of
    * `InMemoryFileIndex`'s machinery runs (beyond 32 explicit paths it
    * launches a distributed listing JOB per query just to stat files the
    * manifest already knows). `lg=`/`bucket=` partition columns parse
    * from the listed paths, so static partition pruning applies exactly
    * as with a directory read — and a concurrent rewrite can never make a
    * listed file vanish mid-job (replaced files are retired, not
    * deleted, while pinned). Caller guarantees `m.dataFiles` non-empty. */
  private def snapshotRead(m: TableManifest): DataFrame = {
    val dataSchema = org.apache.spark.sql.types.StructType(
      cellSchema.filterNot(_.name == "lg"))
    org.apache.spark.sql.graft.ManifestFileIndex.frame(
        spark, dataDir.toString,
        m.dataFiles.map(f => (tableDir.resolve(f.path).toString,
          f.sizeOrStat(tableDir))),
        partitionSchema(m), dataSchema)
      // canonical column order (StoredCell puts lg before bucket)
      .select((cellSchema.fieldNames.toSeq ++
        (if (m.buckets > 0) Seq("bucket") else Nil)).map(col): _*)
  }

  /** All cells (LWW-resolved), with the `lg` partition column retained.
    * The plan pins the manifest's file list at creation (snapshot). */
  def allCells: DataFrame = {
    val m = manifest
    if (m.dataFiles.isEmpty) spark.emptyDataset[StoredCell].toDF()
    else maybeLww(snapshotRead(m), m)
  }

  /** With at most one write batch since the last rewrite there are no
    * cross-batch overwrites, so the LWW dedup window (and its shuffle) is
    * skipped — the bulk-load-then-scan fast path. Bulk loads with duplicate
    * exact cell coordinates inside ONE batch should pre-dedup. */
  private def maybeLww(df: DataFrame, m: TableManifest): DataFrame =
    if (m.batchesSinceRewrite > 1) CellOps.lastWriteWins(df) else df

  /** Locality groups a column filter touches; order mirrors the reference
    * (default group first). `smoltable/src/table/row_reader.rs:6-69`.
    */
  def affectedGroups(filter: Option[ColumnFilter]): Seq[String] = {
    val m = manifest
    filter match {
      case None =>
        TableManifest.DefaultGroup +: m.localityGroups.map(_.id)
      case Some(f) =>
        val fams = f.families
        val defaultFams = m.defaultGroupFamilies.toSet
        val hitsDefault = fams.exists(defaultFams.contains)
        val hitGroups = m.localityGroups.filter { g =>
          f match {
            // Multi requires ALL families in the group per the reference's
            // contains_column_families conjunction; Key/Prefix: membership.
            case ColumnFilter.Multi(_) => fams.forall(g.families.contains)
            case _                     => fams.exists(g.families.contains)
          }
        }.map(_.id)
        (if (hitsDefault) Seq(TableManifest.DefaultGroup) else Nil) ++ hitGroups
    }
  }

  /** Cells restricted to the affected locality groups — compiles to static
    * partition pruning on the `lg` dir column. The group filter goes UNDER
    * the LWW window (lg is not a window partition key, so Catalyst could not
    * push it through after the fact). */
  def cellsFor(filter: Option[ColumnFilter]): DataFrame =
    cellsForKeys(filter, Nil)

  /** As [[cellsFor]], additionally pruned to the bucket directories of the
    * given row keys when the table uses the bucketed layout — a point get
    * then reads 1/`buckets` of each affected group, statically. Safe under
    * LWW: a coordinate's duplicates share its row key, hence its bucket.
    */
  def cellsForKeys(filter: Option[ColumnFilter],
      keys: Seq[String]): DataFrame = {
    val m = manifest
    val groups = affectedGroups(filter)
    if (m.dataFiles.isEmpty) allCells
    else {
      var df = snapshotRead(m).filter(col("lg").isin(groups: _*))
      if (m.buckets > 0 && keys.nonEmpty)
        df = df.filter(col("bucket").isin(
          keys.map(bucketOfKey(_, m.buckets)).distinct: _*))
      maybeLww(df, m)
    }
  }

  // -------------------------------------------------------------- queries

  /** JSON-API scan verb. Omitted limits default to the reference's 65535
    * (`mod.rs:635-650`), which also bounds the driver-side assembly — the
    * collect below can never exceed 65535 cells. For unbounded analytical
    * output use [[scanFrame]], which never touches the driver.
    *
    * Single-pass: the scanned-cell/byte accounting rides the result job as
    * `observe` (CollectMetrics) aggregates over the visited-cell superset,
    * and the qualifying-row count is observed at the limit windows inside
    * [[CellOps.scanCells]] — one Spark action, no second read.
    */
  def scan(in: ScanInput): ScanOutput = withReadPin {
    val eff = in.withEngineDefaults
    val groups = affectedGroups(eff.filter)
    if (!hasData) return ScanOutput(Nil, ScanMetrics(groups.size, 0L, 0L, 0L))
    val cellsObs = Observation()
    val rowObs = Observation()
    val surviving = CellOps.scanCells(
      observedVisible(cellsFor(eff.filter), seekStart(eff.mode), cellsObs),
      eff, Some(rowObs))
    val cells = collectCells(surviving)
    val rows = assemble(cells)
    val qualRows = observedLong(rowObs, "qual_rows")
    // Under perCellDiffusion the acceptance fold already publishes the
    // reference's rows_scanned_count verbatim (per-cell ticks, row-limit
    // and global-cell-limit breaks included); otherwise qual_rows is the
    // per-row count and the loop visits one row beyond a binding row limit
    // before breaking (`smoltable/src/table/mod.rs:724-734`).
    val diffused = eff.perCellDiffusion &&
      (eff.sample.exists(_ < 1.0f) || eff.rowOffset.exists(_ > 0))
    val sampled = eff.sample.exists(_ < 1.0f) || eff.rowOffset.exists(_ > 0)
    val globalBound = eff.globalCellLimit.exists(n => cells.size >= n)
    val rowsScanned =
      if (diffused) qualRows
      else if (eff.chunkGranularMetrics && !sampled && globalBound)
        // global break stops the visit loop at the pull after the G-th
        // append — rows visited = distinct rows among the appended cells
        // (every visited row appends its first qualifying cell when the
        // cell limits are nonzero; 0-limit scans append nothing and the
        // G=0 break precedes the first visit — mod.rs:687-689)
        cells.iterator.map(_.getString(0)).toSet.size.toLong
      else eff.rowLimit match {
        case Some(l) => math.min(qualRows, l.toLong + 1)
        case None    => qualRows
      }
    val (cellsScanned, bytesScanned) =
      (if (eff.chunkGranularMetrics)
        chunkEmulated(eff, cells, qualRows, diffused,
          observedLong(rowObs, "brk_kind"), observedString(rowObs, "brk_row"))
       else None)
        .getOrElse((observedLong(cellsObs, "cells"),
          observedLong(cellsObs, "bytes")))
    ScanOutput(rows, ScanMetrics(groups.size, cellsScanned, rowsScanned,
      bytesScanned))
  }

  /** Chunk-fetch emulation for [[ScanInput.chunkGranularMetrics]]: replays
    * the reference reader's adaptive chunking (`table/reader.rs:90-131` —
    * per-group chunk sizes 10, ×2 per fetch to a 128k cap; counters
    * reflect whole fetched chunks) on scans that BREAK early via the
    * global cell limit (`mod.rs:687-689`) or the row limit
    * (`mod.rs:730-733`). Returns None when the default single-action
    * totals are already reference-exact: no early break (out-of-bounds
    * cells only `continue` the reference loop, so range-end termination
    * consumes the keyspace to its end). Sampling/offset make the break
    * position acceptance-dependent; under `perCellDiffusion` the
    * acceptance fold publishes it (`brk_kind`/`brk_row` observation) and
    * the replay proceeds, while the default per-row mode has no faithful
    * break position and falls back to visited-range totals.
    *
    * Fetch arithmetic: the merge loop peeks EVERY group reader on every
    * pull (`merge_reader.rs:27-31`), so at the final pull each reader had
    * fetched chunks covering one cell past its consumed count (or the
    * final cell itself for the group that supplied it):
    * `fetched_g = min(T_g, chunkBound(consumed_g + (owner ? 0 : 1)))`.
    * The follow-up work is two bounded aggregation jobs over the visited
    * range (pushed-down predicates; one more tiny job to locate the
    * break row when the row limit binds) — a deliberate trade of the
    * single-action design for counter fidelity, which is why the mode is
    * flag-gated.
    */
  private def chunkEmulated(eff: ScanInput, survivors: Seq[Row],
      qualRows: Long, diffused: Boolean, brkKind: Long,
      brkRow: Option[String]): Option[(Long, Long)] = {
    val sampled = eff.sample.exists(_ < 1.0f) || eff.rowOffset.exists(_ > 0)
    // under sampling/offset the break position is acceptance-dependent:
    // only the perCellDiffusion fold knows it (published as brk_kind/
    // brk_row); the default per-row mode has no reference-faithful break
    // position to replay, so fall back to visited-range totals there
    if (sampled && !diffused) return None
    val globalBound =
      eff.globalCellLimit.exists(n => survivors.size >= n)
    val rowBound =
      if (diffused) brkKind == 1L
      else eff.rowLimit.exists(l => qualRows > l)
    if (!globalBound && !rowBound) return None
    // a zero global cell limit breaks before the FIRST pull: the merge
    // reader is constructed but never peeked, so nothing is fetched
    if (globalBound && survivors.isEmpty) return Some((0L, 0L))
    val m = manifest
    val start = seekStart(eff.mode)
    def visited = {
      val base = cellsFor(eff.filter)
      if (start.isEmpty) base else base.filter(rawKeyStr >= start)
    }
    // the final pulled cell (row, family, qualifier, ts) and its group:
    // global break happens BEFORE the next pull, so the final pull is the
    // last appended cell; the row-limit break pulls the break row's first
    // QUALIFYING cell (filter-failing cells `continue` before the
    // reference's new-row branch, so they cannot trigger the break)
    val (fRow, fFam, fQual, fTs) =
      if (globalBound) {
        val last = survivors.last
        (last.getString(0), last.getString(1), last.getString(2),
          last.getLong(3))
      } else {
        val bounds = CellOps.modePredicate(eff.mode)
        val qual = eff.filter.foldLeft(visited.filter(bounds))((d, f) =>
          d.filter(CellOps.filterPredicate(f)))
        // under diffusion the break row came out of the acceptance fold
        // (sampling makes it acceptance-dependent); otherwise it is the
        // (rowLimit+1)-th distinct qualifying row
        val breakRow = brkRow.getOrElse {
          val l = eff.rowLimit.get
          qual.select(col("row_key")).distinct()
            .orderBy("row_key").limit(l + 1)
            .collect().map(_.getString(0)).last
        }
        val first = qual.filter(col("row_key") === breakRow)
          .orderBy(CellOps.keyOrder: _*).limit(1).collect().head
        (first.getString(0), first.getString(1), first.getString(2),
          first.getLong(3))
      }
    val consumed = col("row_key") < fRow ||
      (col("row_key") === fRow && (col("family") < fFam ||
        (col("family") === fFam && (col("qualifier") < fQual ||
          (col("qualifier") === fQual && col("ts") >= fTs)))))
    val perGroup = visited.groupBy(col("lg"))
      .agg(cellCountAgg.as("total"),
        org.apache.spark.sql.functions.count(when(consumed, 1)).as("cons"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val owner = m.groupOf(fFam)
    val fetched = perGroup.map { case (g, (total, cons)) =>
      val needed = math.max(1L, cons + (if (g == owner) 0L else 1L))
      g -> math.min(total, chunkBound(needed))
    }
    val cellsScanned = fetched.values.sum
    val fetchedExpr = fetched.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (g, n)) => acc.when(col("lg") === g, lit(n))
    }.otherwise(lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lg")).orderBy(CellOps.keyOrder: _*)
    val bytesScanned = visited
      .withColumn("_fetch_rank", row_number().over(w))
      .filter(col("_fetch_rank") <= fetchedExpr)
      .agg(coalesce(sum(cellBytes), lit(0L)))
      .collect().head.getLong(0)
    Some((cellsScanned, bytesScanned))
  }

  /** Smallest cumulative chunk boundary `>= x` for the reference reader's
    * fetch sizes 10, 20, 40, … capped at 128 000 (`reader.rs:37,109`; the
    * 10 MB memory brake never binds for wide-column cells). */
  private def chunkBound(x: Long): Long = {
    var size = 10L
    var cum = 0L
    while (cum < x) {
      cum += size
      size = math.min(size * 2, 128000L)
    }
    cum
  }

  /** Raw bucket-keyed cells for bucket-wise plans: ONE snapshot file list
    * and manifest load, shared by every per-bucket branch filtering it
    * (each branch still gets static `bucket=` partition pruning). */
  private def bucketedBase(m: TableManifest): DataFrame = snapshotRead(m)

  /** Co-located row join with another table bucketed with the SAME count:
    * ONE join keyed on `(bucket, row_key)`. Both tables hash row keys with
    * the same function and count, so a row key lives in the same bucket on
    * both sides and the bucket-augmented join is exactly the row_key join —
    * but including `bucket` in the key keeps the shuffle aligned with the
    * physical `bucket=` clustering (each shuffle partition draws from few
    * bucket directories per side) and gives AQE a skew handle. Plan size
    * is O(1) in the bucket count — the previous union-of-joins-per-bucket
    * built an n-branch plan whose analysis/codegen time dominated past a
    * few hundred buckets (`BucketedLayoutSpec` pins a 256-bucket plan
    * build under 2 s). Output: `row_key, left_families, right_families`
    * nested maps, inner-joined on keys present in both tables.
    */
  def joinRows(other: Smoltable): DataFrame = {
    val m = manifest
    val om = other.manifest
    val n = m.buckets
    require(n > 0 && om.buckets == n,
      s"co-located join needs equal bucket counts ($n vs ${om.buckets})")
    def side(t: Smoltable, mm: TableManifest, out: String): DataFrame = {
      val base = t.bucketedBase(mm)
      val resolved =
        if (mm.batchesSinceRewrite > 1) CellOps.lastWriteWins(base) else base
      CellOps.assembleRows(resolved, col("value"), extraKeys = Seq("bucket"))
        .withColumnRenamed("families", out)
    }
    side(this, m, "left_families")
      .join(side(other, om, "right_families"), Seq("bucket", "row_key"))
      .select(col("row_key"), col("left_families"), col("right_families"))
  }

  /** Scale path: scan as a distributed nested-row DataFrame
    * `(row_key, families map<family, map<qualifier, array<(ts,v)>>>)` — no
    * driver materialization, no default limits, no metrics instrumentation
    * (filters push down to the parquet scan untouched). The 100 TB
    * scan-to-table route ([[CellOps.assembleRows]]); the caller writes or
    * joins the frame.
    */
  def scanFrame(in: ScanInput): DataFrame =
    CellOps.assembleRows(
      CellOps.scanCells(cellsFor(in.filter), in), col("value"))

  def getRow(in: GetRowInput): GetRowOutput = {
    val out = multiGet(Seq(in))
    GetRowOutput(out.rows.headOption,
      out.metrics.copy(rowsScanned = 1L))
  }

  /** Reference: `smoltable/src/table/mod.rs:600-626` (`multi_get`) — but as
    * ONE Spark plan per distinct option signature (usually one total)
    * instead of the reference's sequential per-key loop: `row_key IN (keys)`
    * is sargable (bucket/file pruning), and every limit window already
    * partitions by `row_key`, so per-key semantics hold inside a single job.
    */
  def multiGet(ins: Seq[GetRowInput]): ScanOutput = withReadPin {
    val groupsTotal = ins.map(i => affectedGroups(i.filter).size).sum
    if (ins.isEmpty || !hasData)
      return ScanOutput(Nil, ScanMetrics(groupsTotal, 0L, ins.size.toLong, 0L))
    var cellsScanned = 0L
    var bytesScanned = 0L
    // results resolved PER BATCH: two inputs for the same key with
    // different filters/limits must each get their own batch's row
    val resolved = new Array[Option[GRow]](ins.size)
    ins.zipWithIndex.toSeq
      .groupBy { case (i, _) => (i.filter, i.rowCellLimit, i.columnCellLimit) }
      .foreach { case (_, batch) =>
        val eff = batch.head._1.withEngineDefaults
        val keys = batch.map(_._1.key).distinct
        val obs = Observation()
        val visible = cellsForKeys(eff.filter, keys)
          .filter(col("row_key").isin(keys: _*) &&
            rawKeyStr >= concat(col("row_key"), lit(getRowSeekSuffix(eff))))
          .observe(obs, cellCountAgg, cellBytesAgg)
        val df = CellOps.getRowCells(visible, eff, keys, Some(lgVisitRank))
        val byKey = assemble(collectCells(df)).map(r => r.rowKey -> r).toMap
        batch.foreach { case (in, idx) => resolved(idx) = byKey.get(in.key) }
        cellsScanned += observedLong(obs, "cells")
        bytesScanned += observedLong(obs, "bytes")
      }
    // rows in input order, duplicates included (reference loop)
    ScanOutput(resolved.toSeq.flatten, ScanMetrics(groupsTotal, cellsScanned,
      ins.size.toLong, bytesScanned))
  }

  /** Single aggregation job: qualifying row/cell counts and visited bytes
    * in one pass (`scan_count`, `smoltable/src/table/mod.rs:361-451`).
    */
  def scanCount(in: CountInput): CountOutput = withReadPin {
    val groups = affectedGroups(in.filter)
    if (!hasData) return CountOutput(0L, 0L, groups.size, 0L)
    var qualPred = CellOps.modePredicate(in.mode)
    in.filter.foreach(f => qualPred = qualPred && CellOps.filterPredicate(f))
    val start = seekStart(in.mode)
    var visible = cellsFor(in.filter)
    if (start.nonEmpty) visible = visible.filter(rawKeyStr >= start)
    val r = visible.agg(
      count_distinct(when(qualPred, col("row_key"))).as("row_count"),
      coalesce(sum(when(qualPred, 1L)), lit(0L)).as("cell_count"),
      coalesce(sum(cellBytes), lit(0L)).as("bytes")).head()
    CountOutput(r.getLong(0), r.getLong(1), groups.size, r.getLong(2))
  }

  /** Exact full count. Reference: `smoltable/src/table/mod.rs:322-359`. */
  def count(): (Long, Long) = withReadPin {
    val r = allCells
      .agg(count_distinct(col("row_key")), org.apache.spark.sql.functions.count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Approximate count: cell count summed from the manifest's per-file
    * row counts (recorded from each segment's own footer at commit) —
    * zero Spark jobs, zero file reads, a true O(manifest) driver sum
    * like the reference's `approximate_len`
    * (`smoltable/src/table/mod.rs:299-320`). Rows estimated as cells /
    * family count. Falls back to a footer-bounded count job only for a
    * manifest written before row counts existed.
    */
  def approximateCount(): (Long, Long) = withReadPin {
    val m = manifest
    val cellCount =
      if (m.dataFiles.isEmpty) 0L
      else if (m.dataFiles.forall(_.rows >= 0)) m.dataFiles.map(_.rows).sum
      else snapshotRead(m).count()
    val cfCount = m.families.size
    if (cfCount == 0) (0L, 0L) else (cellCount / cfCount, cellCount)
  }

  // --------------------------------------------------------- maintenance

  /** Filtered row delete (copy-on-write rewrite across ALL locality groups —
    * deliberately fixing the reference's default-partition-only delete,
    * `smoltable/src/table/mod.rs:589-592`). Returns deleted cell count,
    * observed by the rewrite job itself — one table pass, no before/after
    * counts.
    */
  def deleteRow(rowKey: String, filter: Option[ColumnFilter] = None): Long =
    withMutationLock {
      if (!hasData) 0L
      else {
        val hit = CellOps.deleteHit(rowKey, filter)
        val obs = Observation()
        rewriteData(() => allCells.observe(obs,
          coalesce(sum(when(hit, 1L)), lit(0L)).as("hits")).filter(!hit))
        observedLong(obs, "hits")
      }
    }

  /** Version-limit + TTL garbage collection as a table rewrite ("lazy &
    * async" maintenance job per `docs/.../data-retention.md`).
    * Reference: `smoltable/src/table/mod.rs:455-562`.
    */
  def runVersionGc(): Long = runVersionGcWith(manifest.gcSettings)

  /** GC with explicit settings (maintenance jobs like the metrics FIFO cap
    * override the manifest's per-family options). The dead-cell count is
    * observed by the rewrite job — one table pass.
    */
  def runVersionGcWith(settings: Map[String, GcSettings]): Long =
    runVersionGcWith(settings, nowNanos)

  /** As [[runVersionGcWith]] with an EXPLICIT clock: TTL death is
    * `now - ts > ttl`, so a deterministic `now` makes the same GC pass
    * replayable — what the oracle row `eng_gc_ttl` needs (the reference
    * reads the wall clock inside the pass, `mod.rs:455-562`; injecting
    * it is the testable refactor of the same semantics). */
  def runVersionGcWith(settings: Map[String, GcSettings],
      now: Long): Long =
    withMutationLock {
      if (!settings.values.exists(_.needsGc) || !hasData) 0L
      else {
        val obs = Observation()
        rewriteData(() =>
          CellOps.gcSurvivors(allCells, settings, now, Some(obs)))
        observedLong(obs, "dead")
      }
    }

  /** Crash-safe copy-on-write rewrite with snapshot-isolated readers:
    * write the survivors to `data.tmp`, move each produced segment into
    * its `data/` partition dir (fresh job-unique names — no collisions),
    * COMMIT by storing the manifest's new file list, then RETIRE the
    * replaced segments: they stay on disk until no in-flight read verb
    * can still reference them ([[Smoltable.ReadGuard]]). A reader that
    * pinned the old list keeps reading the old segments; one arriving
    * after the commit sees only the new — `keyspace.instant()` semantics.
    *
    * Crash at ANY point leaves the acknowledged state intact: files moved
    * before the manifest store are unlisted (debris, removed on open);
    * after the store, the OLD files are unlisted and removed on open.
    * There is never a window without a committed, fully-present file set
    * — strictly better than the previous dir-swap, which had
    * `data.old`-shaped failure modes and made concurrent reads racy.
    *
    * Without an explicit partition count the rewrite only sorts WITHIN
    * partitions (no shuffle — and, critically for the observed delete/GC
    * counts, no RangePartitioning boundary-sampling pass, which would
    * execute the plan and its CollectMetrics twice). Source partitions of
    * a filter-only rewrite are already key-ordered file splits, so files
    * stay clustered; a post-LWW rewrite can interleave ranges across
    * files, which [[compact]] (explicit partition count → range
    * repartition) restores. On bucketed tables the range keys INCLUDE
    * `bucket`, so each output partition covers few (lg, bucket) dirs and
    * the file count stays O(max(partitions, buckets)) instead of
    * partitions × buckets.
    */
  private def rewriteData(survivors: () => DataFrame,
      numPartitions: Option[Int] = None): Unit =
    withMutationLock {
      val m = manifest
      val tmp = tableDir.resolve("data.tmp")
      val bucketCol = if (m.buckets > 0) Seq(col("bucket")) else Nil
      val sortCols = col("lg") +: (bucketCol ++
        Seq(col("row_key"), col("family"), col("qualifier")))
      // the survivors plan is BUILT inside the lock (snapshot file list of
      // the current manifest). Serialized construction + execution means
      // no lost updates between concurrent mutations.
      val arranged = numPartitions match {
        // n == 1 ("one ~targetBytes file per partition dir"): range
        // partitioning into one partition is a no-op, but
        // repartitionByRange(1, ...) still pays a boundary-SAMPLING
        // pass that executes the whole survivors plan (scan + LWW
        // window) a SECOND time, and its single output task then
        // writes every lg/bucket dir serially (r21, measured: compact
        // 2.6 s vs 0.8 s for one read+LWW pass at the test table
        // size). Cross-dir global order is irrelevant — the write
        // splits by the partition dirs anyway — so hash-repartition by
        // the partition columns (spread over enough partitions that
        // distinct (lg, bucket) values rarely collide) and sort
        // locally: ONE pass, writers parallel across dirs, still one
        // sorted file per dir.
        case Some(1) =>
          val pcols = partitionCols(m).map(col)
          val dirs = (1 + m.localityGroups.size) * math.max(1, m.buckets)
          survivors().repartition(4 * dirs, pcols: _*)
            .sortWithinPartitions(sortCols: _*)
        case Some(n) => survivors().repartitionByRange(n, sortCols: _*)
          .sortWithinPartitions(sortCols: _*)
        case None => survivors().sortWithinPartitions(sortCols: _*)
      }
      // overwrite mode also clears any stray data.tmp from an old crash.
      arranged.write.mode("overwrite")
        .partitionBy(partitionCols(m): _*)
        .parquet(tmp.toString)
      val moved = PathIO.walkFiles(tmp)(
          _.getFileName.toString.endsWith(".parquet")).map { f =>
        val size = Files.size(f)
        val rows = parquetRowCount(f)
        val target = dataDir.resolve(tmp.relativize(f))
        Files.createDirectories(target.getParent)
        Files.move(f, target, StandardCopyOption.ATOMIC_MOVE)
        DataFile(tableDir.relativize(target).toString, size, rows)
      }
      PathIO.deleteRecursively(tmp)
      // rewritten data is physically LWW-resolved; reads can skip the
      // window until a second batch lands
      TableManifest.store(manifestPath, m.copy(batchesSinceRewrite = 1L,
        dataFiles = moved))
      Smoltable.readGuard(catalog, name)
        .retire(m.dataFiles.map(f => tableDir.resolve(f.path)))
    }

  /** Mutation critical section (reentrant). Serializes appends, rewrites,
    * DDL manifest updates, and crash recovery per table. */
  private def withMutationLock[T](body: => T): T = {
    val lock = Smoltable.mutationLock(catalog, name)
    lock.lock()
    try body finally lock.unlock()
  }

  /** Snapshot window for an eagerly-executing read verb: registers with
    * the table's [[Smoltable.ReadGuard]] BEFORE the body loads the
    * manifest, so every segment the manifest lists is guaranteed to
    * outlive the verb — a rewrite committing concurrently retires (does
    * not delete) the files this verb may be reading. Lock-free for the
    * reader and never blocks mutations. Mutation verbs don't need it:
    * their reads run under the mutation lock, and rewrites serialize. */
  private def withReadPin[T](body: => T): T = {
    val g = Smoltable.readGuard(catalog, name)
    val e = g.enter()
    try body finally g.exit(e)
  }

  /** Pinned-snapshot bracket for the LAZY frames ([[allCells]],
    * [[scanFrame]], [[joinRows]]): frames built AND executed inside
    * `body` get the same end-to-end guarantee the eager verbs have —
    * segments their plans list cannot be deleted by a concurrent
    * delete/GC/compact rewrite until `body` returns (the rewrite
    * commits and retires; deletion waits for the pin to drain). The
    * 100 TB bulk-consumer contract: wrap the whole plan-build + action
    * (write/collect/stream) in one bracket; outside a bracket a lazy
    * frame only pins the file list at plan time, and a rewrite retiring
    * concurrently may delete a listed segment before the action runs.
    * Reentrant with the other verbs; never blocks mutations — a rewrite
    * under the bracket simply defers its file deletion.
    */
  def withPinnedSnapshot[T](body: => T): T = withReadPin(body)

  /** Recovery + debris sweep, run on open. `tryLock`: if the mutation
    * lock is held, a mutation is IN FLIGHT on another thread — its files
    * are not debris and there is nothing to recover, so open returns
    * immediately instead of blocking behind a long rewrite job. When the
    * lock IS free:
    *  - pre-manifest-era `data.old`/`data.tmp` dir-swap debris is rolled
    *    back / cleared (upgrade path);
    *  - a manifest with NO file list over a non-empty data dir (written
    *    by an older version) adopts the directory listing as its
    *    committed set;
    *  - otherwise, parquet files on disk that are neither
    *    manifest-listed nor retired-but-pinned are crash debris from an
    *    unacknowledged append or an uncommitted rewrite — removed, so
    *    disk accounting stays truthful and later appends cannot
    *    misattribute them.
    */
  private[core] def recoverRewrite(): Unit = {
    val lock = Smoltable.mutationLock(catalog, name)
    if (lock.tryLock()) {
      try {
        val old = tableDir.resolve("data.old")
        val tmp = tableDir.resolve("data.tmp")
        if (!Files.exists(dataDir) && Files.exists(old))
          Files.move(old, dataDir, StandardCopyOption.ATOMIC_MOVE)
        PathIO.deleteRecursively(old)
        PathIO.deleteRecursively(tmp)
        val m = manifest
        val listing = listDataFilesRel()
        // adopt the directory listing ONLY for a legacy manifest that
        // never carried a file list; a snapshot-era manifest with a
        // legitimately-empty committed set (delete/GC removed every
        // cell) must NOT resurrect its retired on-disk segments
        if (!m.hasFileList && listing.nonEmpty)
          TableManifest.store(manifestPath, m.copy(dataFiles =
            listing.map(f => DataFile(f, Files.size(tableDir.resolve(f))))))
        else {
          val live = m.dataFiles.map(_.path).toSet
          val retired = Smoltable.readGuard(catalog, name).retiredSet
          listing.filterNot(f =>
              live(f) || retired(tableDir.resolve(f)))
            .foreach(f => Files.deleteIfExists(tableDir.resolve(f)))
        }
      } finally lock.unlock()
    }
  }

  /** Committed parquet segments currently backing the table (retired
    * segments awaiting reader-drain are excluded). */
  def dataFileCount: Int = manifest.dataFiles.size

  /** Committed segments of one locality-group partition — the analog of
    * the reference's per-partition segment count
    * (`smoltable/src/table/mod.rs:888-904`, `list_tables.rs`). */
  def segmentCount(lg: String): Int =
    manifest.dataFiles.count(_.path.startsWith(s"data/lg=$lg/"))

  /** Partition directory path for a locality group (diagnostics). */
  def partitionPath(lg: String): Path = dataDir.resolve(s"lg=$lg")

  /** Manifest file path (diagnostics). */
  def manifestFilePath: Path = manifestPath

  /** File compaction: rewrite all locality-group partitions into row-key-
    * sorted files of ~`targetBytes` (the analog of the reference's levelled
    * compaction with its 64 MiB segment target,
    * `smoltable/src/table/mod.rs:156-165`). Physically applies
    * last-write-wins, i.e. overwritten cell versions are dropped for good —
    * exactly what LSM compaction does. Run periodically after many small
    * appends; scans then read few large sorted files with tight min/max
    * stats instead of one file per historical write batch.
    * Returns (files before, files after).
    */
  def compact(targetBytes: Long = 64L * 1024 * 1024): (Int, Int) = {
    if (!hasData) return (0, 0)
    val before = dataFileCount
    val totalBytes = catalog.diskSpaceUsage(name)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    rewriteData(() => allCells, Some(parts))
    (before, dataFileCount)
  }

  // ------------------------------------------------------------- metrics

  /** The LSM raw key as a string, for seek-position comparisons. The real
    * codec appends 16 negated-timestamp bytes (`cell.rs:168-182`); those
    * never participate in comparisons against a row/column seek position,
    * so the string prefix is enough.
    */
  private def rawKeyStr: Column =
    concat(col("row_key"), lit(":"), col("family"), lit(":"),
      col("qualifier"), lit(":"))

  /** Where the reference reader's range BEGINS: the literal prefix/range
    * start (`smoltable/src/table/mod.rs:662-684` builds the range from the
    * input, not from the first matching key). Static — visited-cell
    * accounting needs no pre-pass to locate the seek position.
    */
  private def seekStart(mode: ScanMode): String = mode match {
    case ScanMode.Prefix(p)      => p
    case ScanMode.Range(s, _, _) => s
  }

  /** get_row seek narrowing (`smoltable/src/table/row_reader.rs:117-131`):
    * an exact Key filter seeks straight to `row:fam(:qual):`; Multi/Prefix
    * post-filter from `row:`. Returned as a suffix appended to the row key,
    * so one static predicate covers every key of a multi-get batch.
    */
  private def getRowSeekSuffix(in: GetRowInput): String = in.filter match {
    case Some(ColumnFilter.Key(k)) => k.qualifier match {
      case Some(q) => s":${k.family}:$q:"
      case None    => s":${k.family}:"
    }
    case _ => ":"
  }

  private def cellCountAgg =
    org.apache.spark.sql.functions.count(lit(1)).as("cells")
  private def cellBytesAgg = coalesce(sum(cellBytes), lit(0L)).as("bytes")

  /** Observed metric with empty-plan tolerance: when AQE proves a subtree
    * empty (e.g. a point get on a missing row after partition pruning) it
    * can eliminate the CollectMetrics node entirely, so the reported map
    * lacks the key — which only happens when the true count is 0. */
  private def observedLong(obs: Observation, key: String): Long =
    obs.get.get(key).map(_.asInstanceOf[Number].longValue).getOrElse(0L)

  private def observedString(obs: Observation, key: String): Option[String] =
    obs.get.get(key).flatMap(v => Option(v).map(_.toString))

  /** Locality-group visit rank for get_row cell-limit truncation: default
    * group first, then manifest order (`row_reader.rs:118-137`). */
  private def lgVisitRank: Column = {
    val order = TableManifest.DefaultGroup +: manifest.localityGroups.map(_.id)
    order.zipWithIndex
      .foldLeft(when(lit(false), lit(0))) { case (acc, (id, idx)) =>
        acc.when(col("lg") === id, lit(idx))
      }
      .otherwise(lit(order.size))
  }

  /** Visited-cell superset of a scan with its accounting attached: cells of
    * the affected groups from the seek position to partition end (the
    * reference reader's range is end-unbounded — `reader.rs:80-148`;
    * termination stops consumption, not the range). The `observe` node is a
    * pushdown barrier, so the later mode/filter predicates cannot prune the
    * parquet read below what the accounting must visit — and the counting
    * itself is free: CollectMetrics aggregates ride the result job.
    */
  private def observedVisible(cells: DataFrame, start: String,
      obs: Observation): DataFrame = {
    val visible = if (start.isEmpty) cells
      else cells.filter(rawKeyStr >= start)
    visible.observe(obs, cellCountAgg, cellBytesAgg)
  }

  /** Encoded byte size of one cell (raw key + tag-encoded value) per the
    * reference codec: key = "row:fam:qual:" + 16-byte ts
    * (`cell.rs:168-182`), value per `cell.rs:43-76`.
    */
  private def cellBytes = {
    val keyLen = length(col("row_key")) + length(col("family")) +
      length(col("qualifier")) + lit(3) + lit(16)
    val valLen = when(col("value.vtype") === "string",
        octet_length(col("value.s")) + 1)
      .when(col("value.vtype") === "boolean", 2)
      .when(col("value.vtype") === "byte", 2)
      .when(col("value.vtype") === "i32", 5)
      .when(col("value.vtype") === "f32", 5)
      .otherwise(9)
    (keyLen + valLen).cast("long")
  }

  // ------------------------------------------------------------ assembly

  private def collectCells(df: DataFrame): Seq[Row] =
    df.select(col("row_key"), col("family"), col("qualifier"), col("ts"),
        col("value"))
      .orderBy(CellOps.keyOrder: _*)
      .collect().toSeq

  /** Driver-side nested-row assembly at the API edge (bounded by query
    * limits). Version lists stay newest-first; map iteration order is
    * insertion order = key order. Reference shape: `smoltable/src/row.rs`.
    */
  private def assemble(cells: Seq[Row]): Seq[GRow] = {
    import scala.collection.mutable
    val rows = mutable.LinkedHashMap.empty[String,
      mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, mutable.ArrayBuffer[GCell]]]]
    cells.foreach { r =>
      val v = r.getStruct(4)
      val payload = CellPayload(
        vtype = v.getString(0),
        s = Option(v.get(1)).map(_.asInstanceOf[String]),
        b = Option(v.get(2)).map(_.asInstanceOf[Boolean]),
        u8 = Option(v.get(3)).map(_.asInstanceOf[Short]),
        i32 = Option(v.get(4)).map(_.asInstanceOf[Int]),
        i64 = Option(v.get(5)).map(_.asInstanceOf[Long]),
        f32 = Option(v.get(6)).map(_.asInstanceOf[Float]),
        f64 = Option(v.get(7)).map(_.asInstanceOf[Double]))
      rows
        .getOrElseUpdate(r.getString(0), mutable.LinkedHashMap.empty)
        .getOrElseUpdate(r.getString(1), mutable.LinkedHashMap.empty)
        .getOrElseUpdate(r.getString(2), mutable.ArrayBuffer.empty)
        .append(GCell(r.getLong(3), payload.toValue))
    }
    rows.map { case (rk, fams) =>
      GRow(rk, fams.map { case (f, quals) =>
        f -> quals.map { case (q, cs) => q -> cs.toSeq }.toMap
      }.toMap)
    }.toSeq
  }
}

object Smoltable {
  /** Per-(catalog, table) JVM locks serializing rewrites and crash
    * recovery — server mode opens a Smoltable per request, and recovery
    * must never mistake an in-flight rewrite's directories for debris.
    * (Cross-process mutators still need external coordination, like the
    * reference's single-process keyspace.) */
  private val swapLocks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.locks.ReentrantLock]()
  private def mutationLock(catalog: Catalog,
      name: String): java.util.concurrent.locks.ReentrantLock =
    swapLocks.computeIfAbsent(s"${catalog.baseDir}/$name",
      _ => new java.util.concurrent.locks.ReentrantLock())

  /** Deferred deletion of replaced segments, the reader half of snapshot
    * isolation (the reference gets this from `keyspace.instant()`; table
    * formats call it vacuum-with-retention — here retention is exact:
    * drain-based, not time-based).
    *
    * A read verb `enter()`s before loading the manifest and `exit()`s
    * after its last action; a rewrite `retire()`s the files it replaced,
    * tagged with a new epoch. A retired batch is deletable once every
    * in-flight reader entered at-or-after its retire epoch (such readers
    * loaded a manifest that no longer lists those files). Single JVM by
    * design, like the mutation locks.
    */
  private[core] final class ReadGuard {
    private var epoch = 0L
    private val active = scala.collection.mutable.Map.empty[Long, Int]
    private var retired = Vector.empty[(Long, Seq[Path])]

    def enter(): Long = synchronized {
      active(epoch) = active.getOrElse(epoch, 0) + 1; epoch
    }

    def exit(e: Long): Unit = {
      synchronized {
        val n = active(e) - 1
        if (n == 0) active.remove(e) else active(e) = n
      }
      cleanup()
    }

    def retire(files: Seq[Path]): Unit = {
      synchronized {
        epoch += 1
        if (files.nonEmpty) retired :+= (epoch, files)
      }
      cleanup()
    }

    /** Epochs whose batches a cleanup call is currently deleting: still
      * visible via [[retiredSet]] (their files may be mid-delete — a
      * concurrent append diffing the disk against live+retired must not
      * misread a not-yet-deleted segment as newly appended and commit a
      * path that is about to vanish), but claimed, so no second cleanup
      * call double-handles them. */
    private var deleting = Set.empty[Long]

    def retiredSet: Set[Path] = synchronized(retired.flatMap(_._2).toSet)

    /** Deletes drained batches. Claiming inside the lock hands each batch
      * to exactly one caller; file IO runs outside the lock; batches
      * leave `retired` only AFTER their files are gone from disk. */
    private def cleanup(): Unit = {
      val claimed = synchronized {
        val minEntry =
          if (active.isEmpty) Long.MaxValue else active.keysIterator.min
        val del = retired.filter { case (r, _) =>
          r <= minEntry && !deleting(r) }
        deleting ++= del.map(_._1)
        del
      }
      if (claimed.nonEmpty) {
        claimed.foreach(_._2.foreach(Files.deleteIfExists(_)))
        synchronized {
          val done = claimed.map(_._1).toSet
          retired = retired.filterNot { case (r, _) => done(r) }
          deleting --= done
        }
      }
    }
  }

  private val readGuards = new java.util.concurrent.ConcurrentHashMap[
    String, ReadGuard]()
  private[core] def readGuard(catalog: Catalog, name: String): ReadGuard =
    readGuards.computeIfAbsent(s"${catalog.baseDir}/$name",
      _ => new ReadGuard)

  /** Tables whose crash-recovery sweep already ran in this JVM. Crash
    * debris can only exist when a PROCESS died mid-mutation; within a
    * live JVM every mutation holds the table lock and maintains the
    * manifest invariants, so the recovery dir walk is needed exactly once
    * per table per process — not on every open (server mode opens a
    * Smoltable per request, and the per-open walk measurably taxed point
    * gets). [[forgetRecovery]] lets crash-simulation tests model a
    * process restart. */
  private val recovered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[core] def forgetRecovery(catalog: Catalog, name: String): Unit =
    recovered.remove(s"${catalog.baseDir}/$name")

  /** Open-or-create, mirroring `Smoltable::open`
    * (`smoltable/src/table/mod.rs:107-154`). */
  def open(spark: SparkSession, catalog: Catalog, name: String): Smoltable = {
    require(ColumnKey.isValidIdentifier(name), s"invalid table name: $name")
    Files.createDirectories(catalog.tablePath(name))
    val t = new Smoltable(spark, catalog, name)
    if (recovered.add(s"${catalog.baseDir}/$name")) t.recoverRewrite()
    t
  }

  /** Temp catalog dirs created by [[openClone]], deleted on JVM exit —
    * clones are throwaway mutation scratch, never a committed artifact. */
  private val cloneDirs = scala.collection.mutable.ArrayBuffer.empty[Path]
  locally {
    sys.addShutdownHook {
      cloneDirs.synchronized(cloneDirs.toList)
        .foreach(PathIO.deleteRecursively)
    }
  }

  /** Open a throwaway CLONE of catalog `srcBase`'s table `name`:
    * recursive copy of the catalog tree into a fresh temp dir (deleted on
    * JVM exit). The engine's mutation verbs rewrite copy-on-write state,
    * so callers that must stay idempotent across runs — the
    * `eng_delete_row`/`eng_gc_version`/`eng_write_upsert` oracle rows and
    * ScaleSmoke's maintenance timings — each mutate a private clone; the
    * shared fingerprint-cached build is never dirtied. */
  def openClone(spark: SparkSession, srcBase: String,
      name: String): Smoltable = {
    val from = Paths.get(srcBase)
    val to = Files.createTempDirectory("graft_mut_")
    PathIO.withStream(Files.walk(from)) { it =>
      it.foreach { p =>
        val dst = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    cloneDirs.synchronized(cloneDirs += to)
    open(spark, new Catalog(to.toString), name)
  }

  /** Fresh throwaway catalog/scratch dir with the same exit-time cleanup
    * as [[openClone]] — for tables (or checkpoints) whose whole lifetime
    * is one oracle/test run, e.g. the streaming-ingest row's target. */
  def scratchDir(prefix: String = "graft_scratch_"): String = {
    val d = Files.createTempDirectory(prefix)
    cloneDirs.synchronized(cloneDirs += d)
    d.toString
  }

  /** Non-creating [[open]] for paths that must treat "absent" as absent —
    * the API verb path. [[open]]'s `createDirectories` makes the classic
    * check-then-open race destructive: a delete landing between an API
    * verb's existence check and its open would be silently undone by an
    * empty resurrected directory (visible to listTables). The reference
    * cannot hit this because verbs hold its registry read lock
    * (`app_state.rs:34`); here the verb path simply never creates. */
  def openExisting(spark: SparkSession, catalog: Catalog,
      name: String): Option[Smoltable] =
    if (!catalog.tableExists(name)) None
    else {
      val t = new Smoltable(spark, catalog, name)
      if (recovered.add(s"${catalog.baseDir}/$name")) t.recoverRewrite()
      Some(t)
    }
}
