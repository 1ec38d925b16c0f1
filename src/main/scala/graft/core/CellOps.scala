package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model._

/** Pure DataFrame pipelines implementing the wide-column query semantics over
  * a canonical cell table with columns
  * `(row_key string, family string, qualifier string, ts long, ...)`.
  *
  * These are shared by the storage engine ([[Smoltable]]) and by the
  * driver-facing demonstration queries ([[graft.SparkEntry]]), so the exact
  * same operator code is what gets verified against the DuckDB oracle.
  *
  * Scale notes (100 TB design intent):
  *  - Per-column / per-row limits are `Window.partitionBy(row_key, ...)` —
  *    shuffle-bounded by key, no global state.
  *  - Global cell limit and row limit compile to TakeOrdered / Limit, which
  *    Spark executes with per-partition pre-limits before a single-partition
  *    final step (no full sort materialization).
  *  - Row offset + deterministic sampling need a global row rank; they rank
  *    the *distinct row keys* (orders of magnitude smaller than cells) with
  *    a fully distributed two-level rank ([[globalRowRank]]) and join back.
  *    The only single-partition step is the cumulative sum over the
  *    per-partition COUNTS — one row per shuffle partition, constant-size —
  *    matching the inherently sequential reference semantics
  *    (`smoltable/src/table/mod.rs:736-756`) without a global sort.
  */
object CellOps {

  /** Key order of the LSM: `(row_key, family, qualifier, !ts)` — ts
    * descending so newest versions come first.
    * Reference: `smoltable/src/cell.rs:168-182` (`format_key`).
    */
  def keyOrder: Seq[Column] =
    Seq(col("row_key").asc, col("family").asc, col("qualifier").asc,
      col("ts").desc)

  /** Column-filter predicate. Qualifier `None` ≡ `""`.
    * Reference: `smoltable/src/cell.rs:214-266` (`satisfies_column_filter`).
    */
  def filterPredicate(f: ColumnFilter): Column = f match {
    case ColumnFilter.Key(k) =>
      k.qualifier match {
        case Some(q) => col("family") === k.family && col("qualifier") === q
        case None    => col("family") === k.family
      }
    case ColumnFilter.Multi(keys) =>
      keys.map(k => filterPredicate(ColumnFilter.Key(k)))
        .reduceOption(_ || _).getOrElse(lit(false))
    case ColumnFilter.Prefix(k) =>
      k.qualifier match {
        case Some(q) =>
          col("family") === k.family && col("qualifier").startsWith(q)
        case None => col("family") === k.family
      }
  }

  /** Scan-mode predicate. The reference's seek-and-terminate loop
    * (`smoltable/src/table/mod.rs:685-716`) is result-equivalent to a plain
    * predicate because cells arrive in global key order; Catalyst pushes this
    * to the Parquet scan (min/max row-group skipping on sorted row_key).
    */
  def modePredicate(mode: ScanMode): Column = mode match {
    case ScanMode.Prefix("") => lit(true)
    case ScanMode.Prefix(p)  => col("row_key").startsWith(p)
    case ScanMode.Range(start, end, incl) =>
      val lower = col("row_key") >= start
      if (incl) lower && col("row_key") <= end
      else lower && col("row_key") < end
  }

  /** Deterministic error-diffusion row sampling.
    *
    * The reference keeps a counter starting at 1.0, adds `rate` per new row,
    * emits when >= 1.0 then subtracts 1 (`smoltable/src/table/mod.rs:736-746`).
    * Closed form over the 1-based row rank i: emit iff
    * `i == 1 || floor(i*rate) > floor((i-1)*rate)`.
    * (Rows are ranked over all rows that pass the column filter, matching the
    * reference's rows_scanned accounting.)
    */
  def sampleEmit(rankCol: Column, rate: Float): Column = {
    val r = lit(rate.toDouble)
    rankCol === 1L ||
      floor(rankCol.cast("double") * r) > floor((rankCol - 1).cast("double") * r)
  }

  /** Dense 1-based global rank of (distinct) `row_key`s as
    * `(row_key, _rk_rank long)`, computed WITHOUT a global sort: range-
    * repartition on the key (so partition order = key order), local sort,
    * then `monotonically_increasing_id` decomposed into its
    * (partition, local index) halves — the id is documented as
    * `pid << 33 | row-index-within-partition`, and evaluation is pinned
    * after the local sort because Catalyst never reorders nondeterministic
    * projections across a Sort. Per-partition counts accumulate into start
    * offsets with a window over ONE ROW PER PARTITION (the only
    * single-partition step — constant-size, the "tiny driver array" as a
    * plan node), and both consumers read the SAME range exchange (reuse),
    * so partition ids agree. The explicit partition count keeps AQE from
    * coalescing the two sides differently.
    *
    * Replaces `row_number().over(Window.orderBy(key))`, which sorts every
    * distinct key in ONE task and cannot survive a 100× scale-up.
    */
  def globalRowRank(keys: DataFrame): DataFrame = {
    val parts = keys.sparkSession.sessionState.conf.numShufflePartitions
    val keyed = keys
      .repartitionByRange(parts, col("row_key"))
      .sortWithinPartitions("row_key")
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33))
    val offsets = keyed.groupBy("_pid").agg(count(lit(1)).as("_pcnt"))
      .withColumn("_poff", coalesce(sum(col("_pcnt")).over(
        Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_pcnt")
    // offsets is provably <= `parts` rows — broadcasting it is bounded by
    // config, not by data (unlike broadcasting the rank frame itself)
    keyed.join(broadcast(offsets), "_pid")
      .select(col("row_key"),
        (col("_mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L) +
          col("_poff")).as("_rk_rank"))
  }

  /** Full scan pipeline: returns the surviving cell rows (all original
    * columns preserved), in no particular order — callers sort/group.
    *
    * Semantics per `smoltable/src/table/mod.rs:630-801` with the limit
    * interplay of SURVEY.md §2.3 #1:
    *   1. scan-mode bounds, 2. column filter, 3. sampling + row offset on the
    *   global row rank, 4. per-column version limit, 5. per-row cell limit
    *   (counting only cells that survived 4), 6. global cell limit in key
    *   order (counting only cells that survived 4+5), 7. row limit on
    *   materialized rows.
    */
  def scanCells(cells: DataFrame, in: ScanInput): DataFrame =
    scanCells(cells, in, None)

  /** As [[scanCells]], additionally publishing the qualifying-row count
    * (distinct rows passing mode + column filter, BEFORE sampling/offset/
    * limits drop any) through `rowObs` as metric `qual_rows` — computed by
    * the same job that produces the result, so the engine's scan verb needs
    * no second pass for its `rows_scanned` accounting. Requires sampling/
    * offset or a per-row cell limit to be present (the engine defaults
    * guarantee the latter); plain pipelines pass `None`.
    */
  def scanCells(cells: DataFrame, in: ScanInput,
      rowObs: Option[Observation]): DataFrame = {
    var df = cells.filter(modePredicate(in.mode))
    in.filter.foreach(f => df = df.filter(filterPredicate(f)))

    val needRowRank = in.sample.exists(_ < 1.0f) || in.rowOffset.exists(_ > 0)
    val needColRank = in.columnCellLimit.isDefined || in.rowCellLimit.isDefined
    // ONE explicit row_key exchange when BOTH limit windows will run
    // (r22, §2.4 — the engine-verb shape, where every omitted limit
    // defaults to 65535 so both are always set): left implicit, the
    // (row_key, family, qualifier) version-limit window and the row_key
    // cell-limit window plan one exchange EACH over the full cell width
    // (the wider hash does not satisfy the narrower clustering, and vice
    // versa); row_key hash-clustering satisfies both. Deliberately NOT
    // applied to single-window or rank-only scans: there the natural
    // plan already has at most one cell-width exchange, and the rank
    // frames re-derive through column-pruned (row_key-only) scans that
    // are cheaper than sharing a full-width shuffle.
    if (in.columnCellLimit.isDefined && in.rowCellLimit.isDefined)
      df = df.repartition(col("row_key"))

    // 3. sampling + offset: global rank over distinct row keys, joined back
    //    (the rank frame is orders of magnitude smaller than the cells; the
    //    join strategy is left to AQE — broadcast when it fits, shuffle
    //    otherwise). With `perCellDiffusion` the rank is replaced by the
    //    reference's sequential per-cell acceptance simulation.
    if (needRowRank && in.perCellDiffusion) {
      val visitW = Window.partitionBy("row_key")
        .orderBy(col("family").asc, col("qualifier").asc, col("ts").desc)
      val parted = df
      df = parted
        .withColumn("_visit_pos", row_number().over(visitW).cast("long"))
      val acc = perCellAcceptance(parted, in)
      df = df.join(acc, Seq("row_key"))
      // qual_rows = the reference's rows_scanned_count: per-row tick totals
      // from the acceptance fold, summed once per row (at its first cell).
      // brk_kind/brk_row expose the fold's break (1 = row-limit break with
      // brk_row the break row, 2 = global-cell-limit stop) for the engine's
      // chunk-granular accounting — the break position under sampling is
      // acceptance-dependent, so only the fold knows it.
      rowObs.foreach { o =>
        df = df.observe(o,
          coalesce(sum(when(col("_visit_pos") === 1L, col("_row_ticks"))),
            lit(0L)).as("qual_rows"),
          coalesce(max(when(col("_visit_pos") === 1L, col("_brk"))),
            lit(0)).as("brk_kind"),
          max(when(col("_visit_pos") === 1L && col("_brk") > 0,
            col("row_key"))).as("brk_row"))
      }
      df = df.filter(col("_accept_pos") > 0L &&
          col("_visit_pos") >= col("_accept_pos"))
        .drop("_visit_pos", "_accept_pos", "_row_ticks", "_brk")
    } else if (needRowRank) {
      val rowRank = globalRowRank(df.select("row_key").distinct())
      df = df.join(rowRank, Seq("row_key"))
      // qualifying rows = max rank, observed before sampling/offset filter
      rowObs.foreach { o =>
        df = df.observe(o, coalesce(max(col("_rk_rank")), lit(0L)).as("qual_rows"))
      }
      in.sample.filter(_ < 1.0f).foreach { rate =>
        df = df.filter(sampleEmit(col("_rk_rank"), rate))
      }
      // Reference offset check is `rows_scanned_count < row_offset` with the
      // counter already incremented, so rank >= offset survives
      // (`smoltable/src/table/mod.rs:753-756`).
      in.rowOffset.filter(_ > 0).foreach { off =>
        df = df.filter(col("_rk_rank") >= off)
      }
      df = df.drop("_rk_rank")
    }

    // 4. per-column version limit (newest first).
    val colW = Window.partitionBy("row_key", "family", "qualifier")
      .orderBy(col("ts").desc)
    if (needColRank) {
      df = df.withColumn("_col_rank", row_number().over(colW))
      in.columnCellLimit.foreach { k =>
        df = df.filter(col("_col_rank") <= k)
      }
      // 5. per-row cell limit: first N surviving cells in key order.
      in.rowCellLimit.foreach { k =>
        val rowW = Window.partitionBy("row_key")
          .orderBy(col("family").asc, col("qualifier").asc, col("ts").desc)
        df = df.withColumn("_row_rank", row_number().over(rowW))
        // each row keeps >=1 cell through the column limit, so rank-1 cells
        // mark qualifying rows exactly once (hash shuffle keeps rows whole)
        if (!needRowRank) rowObs.foreach { o =>
          df = df.observe(o,
            coalesce(sum(when(col("_row_rank") === 1, 1L)), lit(0L))
              .as("qual_rows"))
        }
        df = df.filter(col("_row_rank") <= k).drop("_row_rank")
      }
      df = df.drop("_col_rank")
    }

    // 6. global cell limit: first N surviving cells in global key order
    //    (TakeOrdered — per-partition pre-limit, no full sort).
    in.globalCellLimit.foreach { n =>
      df = df.orderBy(keyOrder: _*).limit(n)
    }

    // 7. row limit: first N materialized rows in row-key order.
    in.rowLimit.foreach { n =>
      // With rowLimit >= globalCellLimit the row limit can never bind: the
      // reference loop checks the global cell count per cell BEFORE row
      // bookkeeping, and cells >= materialized rows, so the global break
      // fires first (`mod.rs:697-699` vs `:724-734`). The engine defaults
      // (both 65535) always take this branch — no extra plan nodes.
      // The diffusion fold also already enforces it (rows past its break
      // are never emitted, and at most rowLimit rows are retained), and
      // the semi-join here is an AQE hazard for the observed metrics: an
      // empty limited side lets AQE collapse the join — and with it the
      // CollectMetrics — before the tick totals are collected.
      val redundant = in.globalCellLimit.exists(g => n >= g) ||
        (needRowRank && in.perCellDiffusion)
      if (!redundant) {
        if (in.globalCellLimit.isDefined) {
          // input already truncated to <= globalCellLimit cells: a global
          // rank window over the bounded remainder is exact and avoids
          // re-reading the source for the key list
          df = df.withColumn("_row_drank",
              dense_rank().over(Window.orderBy(col("row_key"))))
            .filter(col("_row_drank") <= n).drop("_row_drank")
        } else {
          val limited = df.select("row_key").distinct()
            .orderBy("row_key").limit(n)
          df = df.join(broadcast(limited), Seq("row_key"), "left_semi")
        }
      }
    }
    df
  }

  /** The reference's per-cell sampling/offset state machine, run over
    * per-row COLUMN summaries in key order. Returns
    * `(row_key, _accept_pos, _row_ticks, _brk)` for every row the loop
    * visits before terminating:
    *  - `_accept_pos` — the 1-based within-row visit position whose cell
    *    first passed BOTH the f32 error-diffusion gate (`counter += rate`,
    *    accept when `>= 1.0` then `-= 1.0`, starting at 1.0) and the offset
    *    gate (`rows_scanned_count >= offset`); earlier cells are consumed
    *    by the chain and lost, exactly like the reference
    *    (`smoltable/src/table/mod.rs:724-756`). 0 = row rejected.
    *  - `_row_ticks` — how often the row incremented the reference's
    *    `rows_scanned_count`: once per cell up to acceptance (an accepted
    *    row enters the row map, so its later cells skip the new-row
    *    branch), every cell for a rejected row.
    *  - `_brk` — 0 normally; on the terminating row, 1 for the row-limit
    *    break (`mod.rs:726-733`: the visit ticks ONCE — `rows_scanned_count
    *    += 1` precedes the `len()` check — then breaks) or 2 for the
    *    global-cell-limit stop (`mod.rs:687-689`: checked per cell BEFORE
    *    the new-row branch, so the stopped row never ticks). Rows after
    *    the break are neither emitted nor ticked.
    *
    * Both breaks are modeled faithfully:
    *  - the row-limit check compares against rows the map RETAINS — rows
    *    whose acceptance appended at least one cell after the per-column
    *    version limit and per-row cell limit (`rows.retain(column_count >
    *    0)` runs before the `len()` check, so 0-cell-limit rows never
    *    count);
    *  - the global check tracks APPENDED cells via the per-column counts:
    *    a column contributes `min(cells at visit positions >= accept_pos,
    *    column limit, remaining row budget)` — visited-but-dropped cells
    *    do not advance the reference's `cell_count` (`mod.rs:758-787`).
    *    Within-row overshoot is irrelevant: the check is a threshold, and
    *    the result-side truncation to exactly `global_cell_limit` cells is
    *    the downstream TakeOrdered (scan step 6).
    *
    * The fold is a SINGLE-partition pass over one summary row per row key:
    * error diffusion is order-sequential by definition (each decision
    * depends on the full prefix), so the reference semantics cannot be
    * distributed without changing results — which is why this mode is
    * flag-gated and the default stays the rank-based per-row definition.
    * The sequential data is per-column count summaries (not cells),
    * bounded by the distinct-column count of the scan range.
    */
  private def perCellAcceptance(cells: DataFrame, in: ScanInput)
      : DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val rate = in.sample.filter(_ < 1.0f)
    val offset = in.rowOffset.getOrElse(0L)
    val rowLimit = in.rowLimit.map(_.toLong)
    val globalLimit = in.globalCellLimit.map(_.toLong)
    val colCap = in.columnCellLimit.map(_.toLong).getOrElse(Long.MaxValue)
    val rowCap = in.rowCellLimit.map(_.toLong).getOrElse(Long.MaxValue)

    // appended cells if the row is accepted at visit position p: columns in
    // visit order, each contributing its post-acceptance cells up to the
    // version limit, until the row budget is exhausted
    def appendedFrom(p: Long, cols: Seq[(String, String, Long)]): Long = {
      var pos = 0L
      var total = 0L
      val it = cols.iterator
      while (it.hasNext && total < rowCap) {
        val c = it.next()._3
        val lo = pos + 1
        val hi = pos + c
        pos = hi
        val visible = hi - math.max(lo - 1, p - 1)
        if (visible > 0)
          total += math.min(math.min(visible, colCap), rowCap - total)
      }
      total
    }

    cells.groupBy("row_key", "family", "qualifier")
      .agg(count(lit(1)).as("_c"))
      .groupBy("row_key")
      // struct sorts lexicographically by (family, qualifier) = visit order
      .agg(sort_array(collect_list(
        struct(col("family"), col("qualifier"), col("_c")))).as("_cols"))
      .repartitionByRange(1, col("row_key"))
      .sortWithinPartitions("row_key")
      .as[(String, Seq[(String, String, Long)])]
      .mapPartitions { it =>
        var counter = 1.0f
        var rowsScanned = 0L
        var retained = 0L
        var cellCount = 0L
        var done = false
        it.flatMap { case (rk, cols) =>
          if (done) Iterator.empty
          else if (globalLimit.exists(cellCount >= _)) {
            done = true
            Iterator.single((rk, 0L, 0L, 2))
          } else if (rowLimit.exists(retained >= _)) {
            done = true
            Iterator.single((rk, 0L, 1L, 1))
          } else {
            val m = cols.iterator.map(_._3).sum
            var j = 1L
            var accepted = 0L
            while (j <= m && accepted == 0L) {
              rowsScanned += 1
              var pass = true
              rate.foreach { r =>
                counter += r
                if (counter < 1.0f) pass = false else counter -= 1.0f
              }
              if (pass && rowsScanned >= offset) accepted = j
              j += 1
            }
            if (accepted > 0L) {
              val appended = appendedFrom(accepted, cols)
              if (appended > 0L) retained += 1
              cellCount += appended
            }
            Iterator.single((rk, accepted, if (accepted > 0L) accepted else m, 0))
          }
        }
      }.toDF("row_key", "_accept_pos", "_row_ticks", "_brk")
  }

  /** Point-get pipeline: equality on row_key (bucket/file-pruned on a
    * row_key-sorted layout), then filter + limits.
    *
    * Reference: `smoltable/src/table/mod.rs:824-882` + `row_reader.rs`.
    * Note get_row's global cell limit counts *visited* cells including ones
    * dropped by the column limit (unlike scan) — `mod.rs:843-868`.
    */
  def getRowCells(cells: DataFrame, in: GetRowInput): DataFrame =
    getRowCells(cells, in, Seq(in.key))

  /** Multi-key variant: one plan for N keys (`multi_get`,
    * `smoltable/src/table/mod.rs:600-626`). All limit windows partition by
    * `row_key`, so the per-row limit semantics apply to each key
    * independently inside the single job.
    */
  def getRowCells(cells: DataFrame, in: GetRowInput,
      keys: Seq[String]): DataFrame =
    getRowCells(cells, in, keys, None)

  /** As above with an explicit locality-group visit rank: the reference's
    * SingleRowReader drains groups SEQUENTIALLY (default group first, then
    * each group in manifest order — `row_reader.rs:118-137`), so for a row
    * whose families span groups, `cell_limit` truncation must rank by
    * (group visit order, family, qualifier, ts desc), not global column
    * order. The engine passes its manifest order; plain cell views (one
    * implicit group) pass `None`.
    */
  def getRowCells(cells: DataFrame, in: GetRowInput, keys: Seq[String],
      groupOrder: Option[Column]): DataFrame = {
    var df = cells.filter(col("row_key").isin(keys: _*))
    in.filter.foreach(f => df = df.filter(filterPredicate(f)))

    val colW = Window.partitionBy("row_key", "family", "qualifier")
      .orderBy(col("ts").desc)
    df = df.withColumn("_col_rank", row_number().over(colW))
    // Visit order within the single row: group order, then key order.
    in.rowCellLimit.foreach { n =>
      val visitOrder = groupOrder.map(_.asc).toSeq ++
        Seq(col("family").asc, col("qualifier").asc, col("ts").desc)
      val visitW = Window.partitionBy("row_key").orderBy(visitOrder: _*)
      df = df.withColumn("_visit_rank", row_number().over(visitW))
        .filter(col("_visit_rank") <= n)
        .drop("_visit_rank")
    }
    in.columnCellLimit.foreach { k => df = df.filter(col("_col_rank") <= k) }
    df.drop("_col_rank")
  }

  /** Count rows/cells matching mode + filter without materializing rows.
    * Reference: `smoltable/src/table/mod.rs:361-451` (`scan_count`).
    */
  def countCells(cells: DataFrame, in: CountInput): DataFrame = {
    var df = cells.filter(modePredicate(in.mode))
    in.filter.foreach(f => df = df.filter(filterPredicate(f)))
    df.agg(
      count_distinct(col("row_key")).as("row_count"),
      count(lit(1)).as("cell_count"))
  }

  /** Cells surviving a filtered row delete (copy-on-write semantics).
    * Unlike the reference — which only removes from the default partition,
    * leaving locality-group cells behind (`smoltable/src/table/mod.rs:589-592`)
    * — this deletes across all locality groups (SURVEY.md §2.1 #20).
    */
  /** Cells hit by a filtered row delete. */
  def deleteHit(rowKey: String, filter: Option[ColumnFilter]): Column =
    filter.foldLeft(col("row_key") === rowKey) { (p, f) =>
      p && filterPredicate(f)
    }

  def deleteRowRemaining(
      cells: DataFrame, rowKey: String, filter: Option[ColumnFilter]
  ): DataFrame =
    cells.filter(!deleteHit(rowKey, filter))

  /** Cells surviving version/TTL GC given per-family settings.
    * Version limit: keep newest `limit` versions per (row, family, qualifier).
    * TTL: drop cells with ts > 0 older than `ttl` seconds vs `nowNanos`.
    * Reference: `smoltable/src/table/mod.rs:455-562` (`run_version_gc`).
    */
  def gcSurvivors(
      cells: DataFrame,
      settings: Map[String, GcSettings],
      nowNanos: Long
  ): DataFrame = gcSurvivors(cells, settings, nowNanos, None)

  /** As [[gcSurvivors]], additionally publishing the dead-cell count as
    * metric `dead` via `deadObs` — computed by the same job that rewrites
    * the survivors, so GC needs no before/after table counts.
    */
  def gcSurvivors(
      cells: DataFrame,
      settings: Map[String, GcSettings],
      nowNanos: Long,
      deadObs: Option[Observation]
  ): DataFrame = {
    val colW = Window.partitionBy("row_key", "family", "qualifier")
      .orderBy(col("ts").desc)
    val withRank = cells.withColumn("_col_rank", row_number().over(colW))
    val nowSecs = nowNanos / 1000000000L

    val deadByVersion = settings.collect {
      case (fam, gc) if gc.versionLimit.exists(_ > 0) =>
        col("family") === fam && col("_col_rank") > gc.versionLimit.get
    }
    // integer division (`div`), not `/`: ts ~1.7e18 ns loses precision as a
    // double, which could flip second-boundary TTL decisions
    val deadByTtl = settings.collect {
      case (fam, gc) if gc.ttlSecs.exists(_ > 0) =>
        col("family") === fam && col("ts") > 0 &&
          (lit(nowSecs) - expr("ts div 1000000000")) > gc.ttlSecs.get
    }
    val dead = (deadByVersion ++ deadByTtl)
      .reduceOption(_ || _).getOrElse(lit(false))
    var df = withRank
    deadObs.foreach { o =>
      df = df.observe(o,
        coalesce(sum(when(dead, 1L)), lit(0L)).as("dead"))
    }
    df.filter(!dead).drop("_col_rank")
  }

  /** Last-write-wins on the exact cell coordinate `(row_key, family,
    * qualifier, ts)`: keep the highest write sequence. The reference gets
    * this from LSM upsert (same key overwrites); on an append-only table it
    * becomes a windowed dedup.
    */
  def lastWriteWins(cells: DataFrame): DataFrame = {
    val w = Window.partitionBy("row_key", "family", "qualifier", "ts")
      .orderBy(col("seq").desc)
    cells.withColumn("_lww", row_number().over(w))
      .filter(col("_lww") === 1)
      .drop("_lww")
  }

  /** Assemble surviving cells into user-facing rows: ordered cell arrays per
    * column (newest first), nested maps qualifier→cells and family→columns.
    * `valueJson` must render one cell's payload; kept generic so both the
    * engine's typed struct and test fixtures can use it.
    */
  def assembleRows(
      cells: DataFrame, valueCol: Column, extraKeys: Seq[String] = Nil
  ): DataFrame = {
    // struct ordering: sort_array on (ts desc) via descending sort on struct
    // whose first field is ts.
    // Only version arrays need ordering (newest first, = ts desc since the
    // struct's first field dominates sort_array). Map levels are unordered
    // by nature — and sort_array cannot order structs containing maps.
    // `extraKeys` ride through every grouping level (e.g. `bucket` for the
    // co-located join, which joins assembled rows on (bucket, row_key));
    // they must be functionally dependent on row_key or they split rows.
    val cellStruct = struct(col("ts").as("ts"), valueCol.as("v"))
    val keys = extraKeys :+ "row_key"
    cells
      .groupBy((keys ++ Seq("family", "qualifier")).map(col): _*)
      .agg(sort_array(collect_list(cellStruct), asc = false).as("cells"))
      .groupBy((keys :+ "family").map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("qualifier"), col("cells"))))
        .as("columns"))
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("family"), col("columns"))))
        .as("families"))
  }
}
