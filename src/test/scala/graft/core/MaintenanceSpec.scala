package graft.core

import graft.SparkSuite
import graft.model._

/** Metrics self-tables (§2.1 #27) and file compaction maintenance. */
class MaintenanceSpec extends SparkSuite {

  test("metrics table records and reads back data points newest-first") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val m = MetricsTable.open(spark, cat, Some("webtable"))
      assert(m.table.name == "_mtx_webtable")
      for (i <- 1L to 5L) m.dataPoint("lat#write#cell", i * 1.5, Some(i))
      val pts = m.latest("lat#write#cell", limit = 3)
      assert(pts == Seq((5L, 7.5), (4L, 6.0), (3L, 4.5)))
      // other metrics don't interfere
      m.dataPoint("lat#read#row", 42.0, Some(1L))
      assert(m.latest("lat#read#row").map(_._2) == Seq(42.0))
    }
  }

  test("approximateCount is a manifest sum: zero Spark jobs, no file reads") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "apx")
      t.createColumnFamilies(
        Seq(ColumnFamilyDefinition("a"), ColumnFamilyDefinition("b")))
      // several batches -> several manifest entries to sum
      for (batch <- 0 until 3)
        t.write((0 until 10).map(i => RowWriteItem(s"k$batch-$i", Seq(
          ColumnWriteItem(ColumnKey.of("a:x"), Some(1L), CellValue.I64(i)),
          ColumnWriteItem(ColumnKey.of("b:y"), Some(1L), CellValue.S("v"))))))
      val (rows, cells) = t.approximateCount()
      assert(cells == 60L && rows == 30L, s"got ($rows, $cells)")
      assert(t.count() == (30L, 60L)) // exact agrees on a no-overwrite table

      // zero jobs: any approximateCount job event would reach the
      // listener bus BEFORE the marker job's (FIFO), so jobs == 1 after
      // the marker proves the count ran none
      @volatile var jobs = 0
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        assert(t.approximateCount() == ((30L, 60L)))
        // RDD marker = exactly ONE job (no AQE sub-jobs)
        spark.sparkContext.parallelize(Seq(1), 1).count()
        val deadline = System.nanoTime() + 10000000000L
        while (jobs < 1 && System.nanoTime() < deadline) Thread.sleep(20)
        assert(jobs == 1, s"approximateCount ran ${jobs - 1} Spark job(s)")
      } finally spark.sparkContext.removeSparkListener(listener)

      // belt and braces: with the data files physically unreachable the
      // manifest sum still answers — impossible for any file-reading path
      val dataDir = cat.tablePath("apx").resolve("data")
      val hidden = cat.tablePath("apx").resolve("data_hidden")
      java.nio.file.Files.move(dataDir, hidden)
      try assert(t.approximateCount() == ((30L, 60L)))
      finally java.nio.file.Files.move(hidden, dataDir)
    }
  }

  test("buffered metrics coalesce appends: 500 recorded calls stay under " +
      "a handful of segments") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val m = MetricsTable.open(spark, cat, Some("busy"))
      // the per-API-call recording shape, 500 times (what a busy server
      // does between FIFO-cap rewrites): with per-call appends this wrote
      // 500 tiny segments + manifest lines
      for (i <- 1 to 500)
        m.dataPointsBuffered(Seq("lat#read#row" -> i.toDouble),
          tsNanos = Some(i.toLong))
      val expectedFlushes = 500 / MetricsTable.DefaultFlushEvery
      assert(m.table.dataFileCount <= expectedFlushes + 1,
        s"expected <= ${expectedFlushes + 1} coalesced segments, " +
          s"got ${m.table.dataFileCount}")
      // the tail below the threshold is still buffered; an explicit
      // flush (what the 60 s system sweep does) lands it
      val buffered = 500 - expectedFlushes * MetricsTable.DefaultFlushEvery
      m.flushBuffered()
      val (_, cells) = m.table.count()
      assert(cells == 500L, s"all 500 points visible after flush, got $cells")
      assert(buffered > 0) // the scenario really exercised the tail flush
      // newest-first read still works and sees the latest point
      assert(m.latest("lat#read#row", limit = 1).map(_._2) == Seq(500.0))

      // discarding a table's buffer really drops its pending points (the
      // table-drop path): buffer some, discard, flush -> nothing lands
      m.dataPointsBuffered(Seq("lat#read#row" -> 999.0),
        tsNanos = Some(9999L))
      MetricsTable.discardBuffer(cat, Some("busy"))
      m.flushBuffered()
      assert(m.latest("lat#read#row", limit = 1).map(_._2) == Seq(500.0),
        "discarded buffered points must never land")
    }
  }

  test("sweep flush never resurrects a dropped table's metrics") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val m = MetricsTable.open(spark, cat, Some("gone"))
      m.dataPointsBuffered(Seq("lat#read#row" -> 1.0), tsNanos = Some(1L))
      // the deleteTable sequence: discard pending points, drop the dir
      MetricsTable.discardBuffer(cat, Some("gone"))
      cat.dropTable("_mtx_gone")
      // the 60 s sweep's flush must SKIP the dropped table entirely —
      // opening it (even with an empty buffer) would recreate the dir
      MetricsTable.flushAll(spark, cat)
      assert(!java.nio.file.Files.exists(cat.tablePath("_mtx_gone")),
        "flushAll must not recreate a dropped _mtx_ table")
      // even when an in-flight verb re-buffers AFTER the discard (the
      // concurrency window), the sweep discards instead of recreating:
      // the user table is gone, so its points die with it
      m.dataPointsBuffered(Seq("lat#read#row" -> 2.0), tsNanos = Some(2L))
      MetricsTable.flushAll(spark, cat)
      assert(!java.nio.file.Files.exists(cat.tablePath("_mtx_gone")),
        "a post-discard buffered point must not resurrect the table")
    }
  }

  test("metrics FIFO cap trims old versions when over budget; a cap " +
      "the trim cannot reach falls through to the byte pass (quantile " +
      "agg + TTL GC) without touching the kept version window") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val m = MetricsTable.open(spark, cat, None)
      assert(m.table.name == "_metrics")
      for (i <- 1L to 10L) m.dataPoint("sys#mem", i.toDouble, Some(i))

      val actions = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = actions.incrementAndGet()
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      def settled(): Int = {
        var prev = -1; var cur = actions.get; var spins = 0
        while ((cur != prev || cur == 0) && spins < 100) {
          Thread.sleep(50); prev = cur; cur = actions.get; spins += 1
        }
        cur
      }
      spark.listenerManager.register(listener)
      try {
        // capBytes=1 forces the trim; keepVersions=4. The dropped count
        // is the GC rewrites' observed dead-cell metric — no
        // before/after counts. A 1-byte cap can never be reached, so
        // after the trim the byte fallback also runs: its quantile agg
        // + TTL pass are jobs 2 and 3, and with every surviving ts at
        // the newest end it evicts nothing further.
        val dropped = m.enforceCap(capBytes = 1L, keepVersions = 4)
        assert(dropped == 6L)
        assert(settled() == 3,
          "trim + quantile + TTL pass: exactly three jobs")
      } finally spark.listenerManager.unregister(listener)
      assert(m.latest("sys#mem").map(_._1) == Seq(10L, 9L, 8L, 7L))
    }
  }

  test("metrics FIFO cap, WIDE overfill (reference parity): many " +
      "metrics with few versions overflow the real 1 MiB cap, version " +
      "trim can't shrink it, and the byte-driven fallback evicts the " +
      "OLDEST cells across all metrics down to the budget") {
    import org.apache.spark.sql.functions._
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val m = MetricsTable.open(spark, cat, None)
      // 200k single-version metrics with realistic increasing nanos
      // timestamps — the table shape the reference's segment-FIFO
      // handles but a per-metric version window cannot
      val n = 200000L
      val base = 1700000000000000000L
      m.table.writeBulk(spark.range(n).select(
        format_string("m#%06d", col("id")).as("row_key"),
        lit("value").as("family"),
        lit("").as("qualifier"),
        (lit(base) + col("id") * 1000000000L).as("ts"),
        graft.SparkEntry.cellValueStruct(lit("f64"),
          lit(null).cast("string"),
          col("id").cast("double")).as("value")))
      val before = cat.diskSpaceUsage(m.table.name)
      val cap = 1024L * 1024
      assert(before > cap, s"fixture must overfill the cap: $before")
      val dropped = m.enforceCap(capBytes = cap, keepVersions = 720)
      assert(dropped > 0L, "over-budget wide table must evict")
      // committed footprint lands at ~the budget (quantile eviction is
      // approximate; allow modest overshoot, require real shrinkage)
      val after = m.table.manifest.dataFiles.map(_.size).sum
      assert(after <= (cap * 1.5).toLong,
        s"fallback must shrink to the budget class: $after vs $cap")
      // eviction is OLDEST-FIRST across metrics: the survivor set is
      // exactly a SUFFIX of the timestamp order (ids map to ts)
      val survivors = m.table.allCells.select(col("row_key"))
        .collect().map(_.getString(0)).toSet
      assert(survivors.nonEmpty && survivors.size < n)
      val minKept = survivors.min
      val expect = (n - survivors.size until n)
        .map(i => f"m#${i}%06d").toSet
      assert(survivors == expect,
        s"survivors must be the newest suffix; min kept $minKept, " +
          s"kept ${survivors.size}")
      // the newest point is always retained and still served
      assert(m.latest(f"m#${n - 1}%06d").map(_._2) == Seq((n - 1).toDouble))
    }
  }

  test("metrics FIFO cap with FUTURE-stamped cells (clock skew): the " +
      "byte pass anchors its GC clock at the cutoff, evicts oldest-" +
      "first, and cannot near-totally evict the table (r18 fix)") {
    import org.apache.spark.sql.functions._
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val m = MetricsTable.open(spark, cat, None)
      // the wide-overfill shape, but every timestamp is ~11 days in the
      // FUTURE of the wall clock: with the r17 wall-now anchor the TTL
      // clamped to 1 s and the pass evicted essentially every cell
      val n = 200000L
      val base = MetricsTable.nowNanos + 1000000000000000L
      m.table.writeBulk(spark.range(n).select(
        format_string("m#%06d", col("id")).as("row_key"),
        lit("value").as("family"),
        lit("").as("qualifier"),
        (lit(base) + col("id") * 1000000000L).as("ts"),
        graft.SparkEntry.cellValueStruct(lit("f64"),
          lit(null).cast("string"),
          col("id").cast("double")).as("value")))
      val cap = 1024L * 1024
      assert(cat.diskSpaceUsage(m.table.name) > cap)
      val dropped = m.enforceCap(capBytes = cap, keepVersions = 720)
      assert(dropped > 0L, "over-budget table must evict")
      val after = m.table.manifest.dataFiles.map(_.size).sum
      assert(after <= (cap * 1.5).toLong,
        s"must shrink to the budget class: $after vs $cap")
      // the fix's point: a healthy newest fraction SURVIVES (the r17
      // behavior left at most a second's worth of cells)
      val survivors = m.table.allCells.select(col("row_key"))
        .collect().map(_.getString(0)).toSet
      assert(survivors.size > 10000,
        s"future-stamped cells must not trigger near-total eviction: " +
          s"${survivors.size} of $n kept")
      // still strict FIFO: survivors are the newest suffix
      assert(survivors == (n - survivors.size until n)
        .map(i => f"m#${i}%06d").toSet,
        "survivors must be the newest suffix")
    }
  }

  test("open recovers from a crashed rewrite (data.old / data.tmp debris)") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "t")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t.write(Seq(RowWriteItem("row1", Seq(ColumnWriteItem(
        ColumnKey.of("v:"), Some(0L), CellValue.S("keep"))))))

      val tableDir = cat.tablePath("t")
      val data = tableDir.resolve("data")
      val old = tableDir.resolve("data.old")
      val tmp = tableDir.resolve("data.tmp")

      // crash between "move data aside" and "move tmp in": data.old + tmp
      // debris; open rolls back and clears both (the mutation lock was
      // free, so they are provably not an in-flight rewrite's)
      java.nio.file.Files.move(data, old)
      java.nio.file.Files.createDirectories(tmp)
      // a crash means the process died: model the restart, or the
      // once-per-JVM recovery cache will skip the sweep
      Smoltable.forgetRecovery(cat, "t")
      val recovered = Smoltable.open(spark, cat, "t")
      assert(java.nio.file.Files.exists(data))
      assert(!java.nio.file.Files.exists(old) && !java.nio.file.Files.exists(tmp))
      assert(recovered.count() == (1L, 1L))

      // crash after the swap: stray data.old next to a live data dir
      java.nio.file.Files.createDirectories(old)
      Smoltable.forgetRecovery(cat, "t")
      Smoltable.open(spark, cat, "t")
      assert(!java.nio.file.Files.exists(old))
      assert(recovered.count() == (1L, 1L))

      // crash mid-append/mid-rewrite: a parquet file on disk that the
      // manifest never committed is debris — swept on open, and the
      // committed segments survive untouched
      val orphan = data.resolve("lg=_default").resolve("part-orphan.parquet")
      java.nio.file.Files.write(orphan, Array[Byte](1, 2, 3))
      Smoltable.forgetRecovery(cat, "t")
      val swept = Smoltable.open(spark, cat, "t")
      assert(!java.nio.file.Files.exists(orphan))
      assert(swept.count() == (1L, 1L))
    }
  }

  test("bucketed compaction keeps file count O(buckets), not parts x buckets") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "tb")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t.setBucketCount(4)
      for (i <- 1 to 6)
        t.write(Seq(RowWriteItem(f"row$i%02d", Seq(ColumnWriteItem(
          ColumnKey.of("v:"), Some(0L), CellValue.S(s"val$i"))))))
      val (before, after) = t.compact()
      // 6 batches x up-to-4 buckets each before; after, the range keys
      // include `bucket`, so each output partition covers contiguous
      // (lg, bucket) dirs: at most one file per populated bucket (+1 per
      // range-partition boundary, none here with a single partition)
      assert(before > 4, s"pre-compact should have many files, got $before")
      assert(after <= 4, s"post-compact must be <= buckets files, got $after")
      assert(t.count() == (6L, 6L))
      val scan = t.scan(ScanInput(ScanMode.Prefix("row")))
      assert(scan.rows.size == 6)
    }
  }

  test("compaction merges many small write batches, preserving data + LWW") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "t")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      for (i <- 1 to 8)
        t.write(Seq(RowWriteItem(f"row$i%02d", Seq(ColumnWriteItem(
          ColumnKey.of("v:"), Some(0L), CellValue.S(s"val$i"))))))
      // overwrite one cell so compaction has an LWW victim to drop
      t.write(Seq(RowWriteItem("row03", Seq(ColumnWriteItem(
        ColumnKey.of("v:"), Some(0L), CellValue.S("updated"))))))

      val filesBefore = t.dataFileCount
      assert(filesBefore >= 9)
      val (before, after) = t.compact()
      assert(before == filesBefore && after < before)

      assert(t.count() == (8L, 8L))
      val row = t.getRow(GetRowInput("row03")).row.get
      assert(row.columns("v")("").head.value == CellValue.S("updated"))
      // scans still work over the compacted layout
      val scan = t.scan(ScanInput(ScanMode.Prefix("row0")))
      assert(scan.rows.size == 8)

      // r21: the rewrite's files are genuinely row-key-sorted WITHIN
      // each file (the min/max row-group-skipping property) — the
      // parts==1 hash-by-dir write must keep the local sort
      import org.apache.spark.sql.functions.{col, input_file_name}
      val perFile = t.allCells
        .select(input_file_name().as("_f"), col("row_key"))
        .collect().groupBy(_.getString(0))
        .map { case (f, rs) => f -> rs.map(_.getString(1)).toSeq }
      perFile.foreach { case (f, keys) =>
        assert(keys == keys.sorted, s"file $f not row-key-sorted")
      }
    }
  }
}
