package graft.core

import graft.SparkSuite
import graft.model._

/** Remaining reference goldens: filter-driven pruning metrics across
  * locality groups and multi-cell-row prefix scans.
  * Originals: `read_row_simple_column_filter_multiple_locality_groups.rs`,
  * `read_row_multi_column_filter_multiple_locality_groups.rs`,
  * `scan_prefix_simple.rs:180-270`.
  */
class LocalityMetricsSpec extends SparkSuite {

  private def str(v: String) = CellValue.S(v)

  test("Key filter narrows to one of two locality groups (scanned=1)") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("another")),
        localityGroup = true)
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(0L), str("hello")),
        ColumnWriteItem(ColumnKey.of("another:"), Some(0L), str("hello2"))))))

      val byValue = t.getRow(GetRowInput("test",
        filter = Some(ColumnFilter.Key(ColumnKey.of("value:")))))
      assert(byValue.metrics.affectedLocalityGroups == 1)
      assert(byValue.metrics.cellsScanned == 1)
      assert(byValue.row.get.toJson ==
        """{"row_key":"test","columns":{"value":{"":[{"time":0,"type":"string","value":"hello"}]}}}""")

      val byAnother = t.getRow(GetRowInput("test",
        filter = Some(ColumnFilter.Key(ColumnKey.of("another:")))))
      assert(byAnother.metrics.affectedLocalityGroups == 1)
      assert(byAnother.metrics.cellsScanned == 1)
      assert(byAnother.row.get.columns.keySet == Set("another"))
    }
  }

  test("Multi filter across locality groups aggregates affected groups") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("another")),
        localityGroup = true)
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(0L), str("hello")),
        ColumnWriteItem(ColumnKey.of("another:"), Some(0L), str("hello2"))))))

      // Multi over a default-group family only: prunes to default group
      val multiOne = t.getRow(GetRowInput("test",
        filter = Some(ColumnFilter.Multi(Seq(ColumnKey.of("value:"))))))
      assert(multiOne.metrics.affectedLocalityGroups == 1)
      assert(multiOne.metrics.cellsScanned == 1)
      assert(multiOne.row.get.columns.keySet == Set("value"))
    }
  }

  test("chunk-granular accounting matches a hand-computed reference " +
      "fetch trace on early-terminated scans") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("m")),
        localityGroup = true)
      // 60 rows, one cell in each group; merged visit order alternates
      // groups per cell (r00:m, r00:v, r01:m, ...). Every cell encodes to
      // 29 bytes: key 3+1+0+3+16 = 23, value "hello" = 6.
      t.write((0 until 60).map { i =>
        RowWriteItem(f"r$i%02d", Seq(
          ColumnWriteItem(ColumnKey.of("m:"), Some(0L), str("hello")),
          ColumnWriteItem(ColumnKey.of("v:"), Some(0L), str("hello"))))
      })

      // Reference trace, global cell limit 12: the loop breaks before the
      // 13th pull, so the final pull is r05:v. Consumed: 6 cells per
      // group. Owner group (v) needed 6, other (m) needed 7 (peeked one
      // past) -> both inside the first 10-cell chunk: fetched 10 + 10.
      val g12 = t.scan(ScanInput(ScanMode.Prefix(""),
        globalCellLimit = Some(12), chunkGranularMetrics = true))
      assert(g12.rows.size == 6)
      assert(g12.metrics.cellsScanned == 20,
        s"expected 2 first chunks (10+10), got ${g12.metrics.cellsScanned}")
      assert(g12.metrics.bytesScanned == 20L * 29)

      // Global cell limit 26: final pull r12:v, consumed 13 per group ->
      // needed 13/14 crosses the first boundary (10) into the second
      // chunk (20): fetched 30 + 30.
      val g26 = t.scan(ScanInput(ScanMode.Prefix(""),
        globalCellLimit = Some(26), chunkGranularMetrics = true))
      assert(g26.metrics.cellsScanned == 60,
        s"expected 2x(10+20) fetched, got ${g26.metrics.cellsScanned}")
      assert(g26.metrics.bytesScanned == 60L * 29)

      // Row limit 8 (global limit not binding): the break pulls the first
      // cell of the 9th row (r08:m). Consumed m=9 (owner), v=8 (+1
      // peek) -> both within chunk 1: fetched 10 + 10.
      val r8 = t.scan(ScanInput(ScanMode.Prefix(""), rowLimit = Some(8),
        chunkGranularMetrics = true))
      assert(r8.rows.size == 8)
      assert(r8.metrics.cellsScanned == 20)
      assert(r8.metrics.bytesScanned == 20L * 29)

      // No early break: reference consumes the range to its end -> totals
      // (flag on changes nothing).
      val full = t.scan(ScanInput(ScanMode.Prefix("r0"),
        chunkGranularMetrics = true))
      assert(full.metrics.cellsScanned == 120)

      // The default single-action mode reports the visited-range totals
      // (the documented COVERAGE divergence this flag closes).
      val dflt = t.scan(ScanInput(ScanMode.Prefix(""),
        globalCellLimit = Some(12)))
      assert(dflt.metrics.cellsScanned == 120)
    }
  }

  test("chunk-granular row-limit break anchors on the break row's first " +
      "QUALIFYING cell") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      // 20 rows x 3 cells (quals a, b, c); filter selects only qual c, so
      // the reference's new-row branch fires on each row's LAST cell.
      // rowLimit 3 -> break pull is r03:v:c, consumed = 3*3 + 3 = 12
      // (crossing the first 10-cell chunk -> fetched 30). Anchoring on the
      // row's first VISITED cell instead would stop consumed at 10 and
      // fetch only the first chunk.
      t.write((0 until 20).map { i =>
        RowWriteItem(f"r$i%02d", Seq("a", "b", "c").map(q =>
          ColumnWriteItem(ColumnKey.of(s"v:$q"), Some(0L), str("hello"))))
      })
      val out = t.scan(ScanInput(ScanMode.Prefix(""),
        filter = Some(ColumnFilter.Key(ColumnKey.of("v:c"))),
        rowLimit = Some(3), chunkGranularMetrics = true))
      assert(out.rows.size == 3)
      assert(out.metrics.cellsScanned == 30,
        s"expected 10+20 fetched, got ${out.metrics.cellsScanned}")
    }
  }

  test("chunk-granular accounting: zero global cell limit fetches nothing") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t.write((0 until 20).map { i =>
        RowWriteItem(f"r$i%02d", Seq(
          ColumnWriteItem(ColumnKey.of("v:"), Some(0L), str("hello"))))
      })
      val out = t.scan(ScanInput(ScanMode.Prefix(""),
        globalCellLimit = Some(0), chunkGranularMetrics = true))
      assert(out.rows.isEmpty)
      assert(out.metrics.cellsScanned == 0)
      assert(out.metrics.bytesScanned == 0)
    }
  }

  test("chunk-granular accounting crosses boundaries on a single group") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      // 100 single-cell rows (r000..r099, 30 bytes per cell)
      t.write((0 until 100).map { i =>
        RowWriteItem(f"r$i%03d", Seq(
          ColumnWriteItem(ColumnKey.of("v:"), Some(0L), str("hello"))))
      })
      // limit 35: consumed 35 = needed (owner) -> chunks 10+20+40 = 70
      val out = t.scan(ScanInput(ScanMode.Prefix(""),
        globalCellLimit = Some(35), chunkGranularMetrics = true))
      assert(out.metrics.cellsScanned == 70,
        s"expected 10+20+40 fetched, got ${out.metrics.cellsScanned}")
      assert(out.metrics.bytesScanned == 70L * 30)
    }
  }

  test("diffused rows_scanned goldens: per-cell sampling ticks, offset " +
      "catch-up, row-limit break tick, global-cell-limit stop " +
      "(mod.rs:687-756)") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      // 10 rows x 3 cells (quals a, b, c)
      t.write((0 until 10).map { i =>
        RowWriteItem(f"r$i%02d", Seq("a", "b", "c").map(q =>
          ColumnWriteItem(ColumnKey.of(s"v:$q"), Some(0L), str("hello"))))
      })

      // sample 0.5, counter starts 1.0 and ticks once per cell of a
      // not-yet-accepted row: r00 accepts at visit 1 (1.5), r01 at visit 1
      // (1.0), r02..r09 reject visit 1 (0.5) and accept visit 2 (1.0) —
      // losing their first cell. rows_scanned = 1 + 1 + 2*8 = 18.
      val sampled = t.scan(ScanInput(ScanMode.Prefix(""),
        sample = Some(0.5f), perCellDiffusion = true))
      assert(sampled.rows.size == 10)
      assert(sampled.rows.map(_.cellCount).sum == 3 + 3 + 2 * 8)
      assert(sampled.metrics.rowsScanned == 18,
        s"expected 18 per-cell ticks, got ${sampled.metrics.rowsScanned}")
      // the default per-row definition reports the qualifying-row count
      val perRow = t.scan(ScanInput(ScanMode.Prefix(""),
        sample = Some(0.5f)))
      assert(perRow.metrics.rowsScanned == 10)

      // offset 4: r00 ticks all 3 cells (rows_scanned 1..3 < 4) and is
      // rejected; r01 catches up at its first cell (rows_scanned 4 >= 4)
      // and every later row accepts at visit 1. Total = 3 + 9*1 = 12.
      val off = t.scan(ScanInput(ScanMode.Prefix(""),
        rowOffset = Some(4L), perCellDiffusion = true))
      assert(off.rows.map(_.rowKey) == (1 until 10).map(i => f"r$i%02d"))
      assert(off.metrics.rowsScanned == 12)

      // row limit 2 + offset 2: r00 catches up at visit 2 (rows_scanned
      // 2 >= 2), accepted losing cell 1; r01 accepts at visit 1
      // (rows_scanned 3); r02's first visit finds the map full: ONE tick,
      // break. rows_scanned = 2 + 1 + 1 = 4.
      val rl = t.scan(ScanInput(ScanMode.Prefix(""), rowLimit = Some(2),
        rowOffset = Some(2L), perCellDiffusion = true))
      assert(rl.rows.map(_.rowKey) == Seq("r00", "r01"))
      assert(rl.rows.map(_.cellCount).sum == 2 + 3)
      assert(rl.metrics.rowsScanned == 4,
        s"expected break-row tick included, got ${rl.metrics.rowsScanned}")

      // global cell limit 3, sample 0.5: r00 accepts visit 1 and appends 3
      // (cellCount 3 >= 3) — the loop stops BEFORE r01's first visit
      // (the global check precedes the new-row branch). rows_scanned = 1.
      val g = t.scan(ScanInput(ScanMode.Prefix(""),
        globalCellLimit = Some(3), sample = Some(0.5f),
        perCellDiffusion = true))
      assert(g.rows.map(_.rowKey) == Seq("r00"))
      assert(g.rows.map(_.cellCount).sum == 3)
      assert(g.metrics.rowsScanned == 1,
        s"expected global stop before r01, got ${g.metrics.rowsScanned}")
    }
  }

  test("chunk-granular accounting composes with per-cell sampling " +
      "(break position from the acceptance fold)") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      // 20 rows x 2 cells (quals a, b), single locality group
      t.write((0 until 20).map { i =>
        RowWriteItem(f"r$i%02d", Seq("a", "b").map(q =>
          ColumnWriteItem(ColumnKey.of(s"v:$q"), Some(0L), str("hello"))))
      })

      // rowLimit 3, sample 0.5: r00 accepts v1 (2 cells), r01 accepts v1
      // (2 cells), r02 rejects v1 / accepts v2 (1 cell), r03's first visit
      // breaks on the full row map. Break pull = r03:v:a; consumed =
      // 3 rows x 2 cells + 1 = 7 -> first chunk (10) fetched.
      val out = t.scan(ScanInput(ScanMode.Prefix(""), rowLimit = Some(3),
        sample = Some(0.5f), perCellDiffusion = true,
        chunkGranularMetrics = true))
      assert(out.rows.map(_.rowKey) == Seq("r00", "r01", "r02"))
      assert(out.rows.map(_.cellCount).sum == 2 + 2 + 1)
      assert(out.metrics.rowsScanned == 1 + 1 + 2 + 1)
      assert(out.metrics.cellsScanned == 10,
        s"expected first chunk (10), got ${out.metrics.cellsScanned}")

      // global limit 10, sample 0.5 on single-cell rows: accepts land on
      // r00,r01 then every second row; the 10th accept is r17, so consumed
      // = 18 cells -> chunks 10+20 = 30 fetched.
      val t2 = Smoltable.open(spark, new Catalog(dir.toString), "t2")
      t2.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t2.write((0 until 100).map { i =>
        RowWriteItem(f"r$i%02d", Seq(
          ColumnWriteItem(ColumnKey.of("v:"), Some(0L), str("hello"))))
      })
      val g = t2.scan(ScanInput(ScanMode.Prefix(""),
        globalCellLimit = Some(10), sample = Some(0.5f),
        perCellDiffusion = true, chunkGranularMetrics = true))
      assert(g.rows.size == 10)
      assert(g.metrics.rowsScanned == 18)
      assert(g.metrics.cellsScanned == 30,
        s"expected 10+20 fetched, got ${g.metrics.cellsScanned}")
    }
  }

  test("scan_prefix_simple multi-cell rows: prefix 'a' scans 7, 'b' scans 5") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      t.write(Seq(
        RowWriteItem("a", Seq(
          ColumnWriteItem(ColumnKey.of("value:asd"), Some(0L), str("hello")),
          ColumnWriteItem(ColumnKey.of("value:def"), Some(0L), str("hello2")))),
        RowWriteItem("b", Seq(
          ColumnWriteItem(ColumnKey.of("value:yxc"), Some(0L), str("hello")),
          ColumnWriteItem(ColumnKey.of("value:cxy"), Some(0L), str("hello2")))),
        RowWriteItem("ba", Seq(
          ColumnWriteItem(ColumnKey.of("value:asd"), Some(0L), str("hello")))),
        RowWriteItem("c", Seq(
          ColumnWriteItem(ColumnKey.of("value:asd"), Some(0L), str("hello")),
          ColumnWriteItem(ColumnKey.of("value:dsa"), Some(0L), str("hello2"))))))

      val a = t.scan(ScanInput(ScanMode.Prefix("a")))
      assert(a.rows.map(_.rowKey) == Seq("a"))
      assert(a.rows.head.columns("value").keySet == Set("asd", "def"))
      assert(a.metrics.cellsScanned == 7)

      val b = t.scan(ScanInput(ScanMode.Prefix("b")))
      assert(b.rows.map(_.rowKey) == Seq("b", "ba"))
      // row b columns sorted lexicographically: cxy before yxc
      assert(b.rows.head.columns("value").keys.toSeq == Seq("cxy", "yxc"))
      assert(b.metrics.cellsScanned == 5)
    }
  }
}
