package graft.core

import graft.SparkSuite
import graft.model._

/** Ports of the reference's scan golden tests (FIXTURES.md F7) plus the
  * limit-interplay fine print of SURVEY.md §2.3 #1.
  * Originals: `smoltable/tests/scan_*.rs`.
  */
class ScanSpec extends SparkSuite {

  private def str(v: String) = CellValue.S(v)

  /** F7 fixture: rows a, b, ba, c, each one `value:` cell at ts=0. */
  private def f7(dir: java.nio.file.Path): Smoltable = {
    val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
    t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
    t.write(Seq("a", "b", "ba", "c").map(k =>
      RowWriteItem(k, Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(0L), str(s"v-$k"))))))
    t
  }

  test("F7: scan all (empty prefix) returns all rows in key order") {
    withTempDir { dir =>
      val out = f7(dir).scan(ScanInput(ScanMode.Prefix("")))
      assert(out.rows.map(_.rowKey) == Seq("a", "b", "ba", "c"))
      assert(out.metrics.cellsScanned == 4)
      assert(out.metrics.rowsScanned == 4)
    }
  }

  test("F7: prefix 'a' scans from seek to partition end") {
    withTempDir { dir =>
      val out = f7(dir).scan(ScanInput(ScanMode.Prefix("a")))
      assert(out.rows.map(_.rowKey) == Seq("a"))
      // seek at 'a', chunk loads to end: a, b, ba, c
      assert(out.metrics.cellsScanned == 4)
    }
  }

  test("F7: prefix 'b' returns b, ba; scans 3") {
    withTempDir { dir =>
      val out = f7(dir).scan(ScanInput(ScanMode.Prefix("b")))
      assert(out.rows.map(_.rowKey) == Seq("b", "ba"))
      assert(out.metrics.cellsScanned == 3) // b, ba, c after seek
    }
  }

  test("F7: prefix 'b' with row limit 1 stops after first materialized row") {
    withTempDir { dir =>
      val out = f7(dir).scan(ScanInput(ScanMode.Prefix("b"), rowLimit = Some(1)))
      assert(out.rows.map(_.rowKey) == Seq("b"))
      assert(out.metrics.cellsScanned == 3)
      assert(out.metrics.rowsScanned == 2) // breaking row also counted
    }
  }

  test("F7: range ba..c inclusive and exclusive") {
    withTempDir { dir =>
      val t = f7(dir)
      val incl = t.scan(ScanInput(ScanMode.Range("ba", "c", inclusive = true)))
      assert(incl.rows.map(_.rowKey) == Seq("ba", "c"))
      val excl = t.scan(ScanInput(ScanMode.Range("ba", "c", inclusive = false)))
      assert(excl.rows.map(_.rowKey) == Seq("ba"))
    }
  }

  test("row offset skips leading rows (offset counts scanned rows)") {
    withTempDir { dir =>
      val out = f7(dir).scan(ScanInput(ScanMode.Prefix(""), rowOffset = Some(3L)))
      // rank >= 3: rows ba, c survive (reference `rows_scanned < offset` skip)
      assert(out.rows.map(_.rowKey) == Seq("ba", "c"))
    }
  }

  test("deterministic sampling: first row always emitted, then error diffusion") {
    withTempDir { dir =>
      val out = f7(dir).scan(ScanInput(ScanMode.Prefix(""), sample = Some(0.5f)))
      // counter starts at 1.0: emit ranks 1,2,4 of a,b,ba,c
      assert(out.rows.map(_.rowKey) == Seq("a", "b", "c"))
    }
  }

  test("globalRowRank is dense 1..N across many partitions, with no " +
      "single-partition key sort and no row_number window") {
    import spark.implicits._
    // 10k keys, deliberately unsorted input, forced through many partitions
    val keys = spark.createDataset(
      scala.util.Random.shuffle((0 until 10000).toVector)
        .map(i => f"k$i%05d")).toDF("row_key").repartition(16)
    val ranked = CellOps.globalRowRank(keys)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      s"rank must not come from a global row_number window:\n$plan")
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"),
      s"keys must be range-partitioned for the two-level rank:\n$plan")
    val got = ranked.orderBy("row_key").select("_rk_rank")
      .as[Long].collect().toSeq
    assert(got == (1L to 10000L), "rank must be dense 1..N in key order")
  }

  test("global cell limit truncates in key order") {
    withTempDir { dir =>
      val out = f7(dir).scan(ScanInput(ScanMode.Prefix(""),
        globalCellLimit = Some(2)))
      assert(out.rows.map(_.rowKey) == Seq("a", "b"))
    }
  }

  test("limit interplay: per-column then per-row then global (SURVEY §2.3 #1)") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      // 2 rows x 2 columns x 3 versions
      for (rk <- Seq("r1", "r2"); q <- Seq("qa", "qb"); ts <- 1L to 3L)
        t.write(Seq(RowWriteItem(rk, Seq(
          ColumnWriteItem(ColumnKey.of(s"value:$q"), Some(ts), str(s"$rk-$q-$ts"))))))

      // col limit 2 keeps ts 3,2 per column; row limit 3 keeps qa(2) + qb(1);
      // global limit 5 keeps r1's 3 + r2's first 2
      val out = t.scan(ScanInput(ScanMode.Prefix(""),
        columnCellLimit = Some(2), rowCellLimit = Some(3),
        globalCellLimit = Some(5)))
      val r1 = out.rows.find(_.rowKey == "r1").get
      assert(r1.columns("value")("qa").map(_.time) == Seq(3L, 2L))
      assert(r1.columns("value")("qb").map(_.time) == Seq(3L))
      val r2 = out.rows.find(_.rowKey == "r2").get
      assert(r2.cellCount == 2)
      assert(r2.columns("value")("qa").map(_.time) == Seq(3L, 2L))
    }
  }

  test("F8: counts track writes (write_count.rs)") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:asd"), Some(0L), str("a"))))))
      assert(t.count() == (1L, 1L))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:def"), Some(0L), str("b"))))))
      assert(t.count() == (1L, 2L))
      t.write(Seq(RowWriteItem("test2", Seq(
        ColumnWriteItem(ColumnKey.of("value:asd"), Some(0L), str("c"))))))
      assert(t.count() == (2L, 3L))
      t.write(Seq(RowWriteItem("test2", Seq(
        ColumnWriteItem(ColumnKey.of("value:def"), Some(0L), str("d"))))))
      assert(t.count() == (2L, 4L))
    }
  }

  test("duplicate coordinates WITHIN one write batch collapse to the last") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      // fresh table (LWW window skipped) — intra-batch dedup must handle it
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(5L), str("first")),
        ColumnWriteItem(ColumnKey.of("value:"), Some(5L), str("second"))))))
      assert(t.count() == (1L, 1L))
      val row = t.getRow(GetRowInput("test")).row.get
      assert(row.columns("value")("").map(_.value) == Seq(CellValue.S("second")))
    }
  }

  test("overwriting same (row, column, ts) is last-write-wins, not a new cell") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(5L), str("old"))))))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(5L), str("new"))))))
      assert(t.count() == (1L, 1L))
      val row = t.getRow(GetRowInput("test")).row.get
      assert(row.columns("value")("").head.value == CellValue.S("new"))
    }
  }

  test("F9: filtered deletes (delete_column_filter.rs)") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      def load(): Unit = t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:abc"), Some(0L), str("1")),
        ColumnWriteItem(ColumnKey.of("value:asd"), Some(0L), str("2")),
        ColumnWriteItem(ColumnKey.of("value:def"), Some(0L), str("3"))))))

      load()
      assert(t.deleteRow("test",
        Some(ColumnFilter.Key(ColumnKey.of("value:asd")))) == 1L)
      assert(t.count() == (1L, 2L))

      assert(t.deleteRow("test",
        Some(ColumnFilter.Prefix(ColumnKey.of("value:a")))) == 1L)
      assert(t.count() == (1L, 1L))

      assert(t.deleteRow("test", None) == 1L)
      assert(t.count() == (0L, 0L))

      load()
      assert(t.deleteRow("test", Some(ColumnFilter.Multi(Seq(
        ColumnKey.of("value:abc"), ColumnKey.of("value:def"))))) == 2L)
      assert(t.count() == (1L, 1L))
    }
  }

  test("F10: version-limit GC keeps newest 3 of 5") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(
        ColumnFamilyDefinition("value", GcSettings(versionLimit = Some(3)))))
      for (ts <- 1L to 5L)
        t.write(Seq(RowWriteItem("test", Seq(
          ColumnWriteItem(ColumnKey.of("value:"), Some(ts), str(s"v$ts"))))))
      assert(t.count()._2 == 5L)
      assert(t.runVersionGc() == 2L)
      val row = t.getRow(GetRowInput("test")).row.get
      assert(row.columns("value")("").map(_.time) == Seq(5L, 4L, 3L))
    }
  }

  test("F10: TTL GC drops ancient cells, keeps fresh ones") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      // TTL must outlive any suite-scheduling pause between the fresh
      // write and the GC run (a 5s TTL flaked on a loaded sandbox when
      // >5s elapsed in between); 1h keeps the semantics — the ts=1..5ns
      // cells are ~56 years past TTL either way.
      t.createColumnFamilies(Seq(
        ColumnFamilyDefinition("value", GcSettings(ttlSecs = Some(3600L)))))
      val now = java.time.Instant.now()
      val nowNs = now.getEpochSecond * 1000000000L + now.getNano
      for (ts <- 1L to 5L)
        t.write(Seq(RowWriteItem("test", Seq(
          ColumnWriteItem(ColumnKey.of("value:"), Some(ts), str(s"v$ts"))))))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(nowNs), str("fresh"))))))
      assert(t.count()._2 == 6L)
      assert(t.runVersionGc() == 5L)
      val row = t.getRow(GetRowInput("test")).row.get
      assert(row.columns("value")("").map(_.value) == Seq(CellValue.S("fresh")))
    }
  }

  test("locality-group pruning reduces scanned cells and bytes") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("language")))
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("title")),
        localityGroup = true)
      t.write(Seq("a", "b", "c", "d").map(k => RowWriteItem(k, Seq(
        ColumnWriteItem(ColumnKey.of("title:"), Some(0L), str(s"t-$k")),
        ColumnWriteItem(ColumnKey.of("language:"), Some(0L), str("en"))))))

      val full = t.scan(ScanInput(ScanMode.Prefix("")))
      val pruned = t.scan(ScanInput(ScanMode.Prefix(""),
        filter = Some(ColumnFilter.Key(ColumnKey.of("title:")))))
      assert(full.metrics.affectedLocalityGroups == 2)
      assert(pruned.metrics.affectedLocalityGroups == 1)
      assert(pruned.metrics.cellsScanned == 4)
      assert(full.metrics.cellsScanned == 8)
      assert(pruned.metrics.bytesScanned < full.metrics.bytesScanned)
      assert(pruned.rows.size == 4)
    }
  }

  test("omitted scan limits default to 65535 (u16::MAX) like the reference") {
    withTempDir { dir =>
      import org.apache.spark.sql.functions._
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      // 66k one-cell rows via the bulk path — crosses the u16::MAX boundary
      val cells = spark.range(66000).select(
        format_string("r%06d", col("id")).as("row_key"),
        lit("value").as("family"), lit("").as("qualifier"), lit(0L).as("ts"),
        struct(lit("string").as("vtype"),
          format_string("v%d", col("id")).as("s"),
          lit(null).cast("boolean").as("b"), lit(null).cast("short").as("u8"),
          lit(null).cast("int").as("i32"), lit(null).cast("long").as("i64"),
          lit(null).cast("float").as("f32"),
          lit(null).cast("double").as("f64")).as("value"))
      t.writeBulk(cells)

      val out = t.scan(ScanInput(ScanMode.Prefix("")))
      assert(out.rows.size == ScanInput.DefaultLimit)
      assert(out.rows.map(_.cellCount).sum == ScanInput.DefaultLimit)
      assert(out.rows.last.rowKey == f"r${ScanInput.DefaultLimit - 1}%06d")
      // With 1-cell rows the GLOBAL cell limit breaks first, and its check
      // precedes row bookkeeping (`mod.rs:697-699`) — the 65536th row is
      // never counted (unlike a pure row-limit break, which counts the
      // breaking row).
      assert(out.metrics.rowsScanned == ScanInput.DefaultLimit.toLong)

      // explicit limits still override the default
      val two = t.scan(ScanInput(ScanMode.Prefix(""), rowLimit = Some(2)))
      assert(two.rows.map(_.rowKey) == Seq("r000000", "r000001"))
    }
  }

  test("scan, get_row, multi_get and scan_count each run ONE action " +
      "(metrics ride the result job, no second pass)") {
    withTempDir { dir =>
      val t = f7(dir)
      val actions = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = actions.incrementAndGet()
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      // listener events are async: wait until the count is nonzero and stable
      def settled(): Int = {
        var prev = -1
        var cur = actions.get
        var spins = 0
        while ((cur != prev || cur == 0) && spins < 100) {
          Thread.sleep(50); prev = cur; cur = actions.get; spins += 1
        }
        cur
      }
      spark.listenerManager.register(listener)
      try {
        actions.set(0)
        t.scan(ScanInput(ScanMode.Prefix("b")))
        assert(settled() == 1, "scan should be a single action")
        actions.set(0)
        t.getRow(GetRowInput("a"))
        assert(settled() == 1, "get_row should be a single action")
        actions.set(0)
        t.multiGet(Seq(GetRowInput("a"), GetRowInput("c")))
        assert(settled() == 1, "multi_get should be a single action")
        actions.set(0)
        t.scanCount(CountInput(ScanMode.Prefix("")))
        assert(settled() == 1, "scan_count should be a single action")
      } finally spark.listenerManager.unregister(listener)
    }
  }

  test("value codec round-trip across all seven types") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "test")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      val vals: Seq[(String, CellValue)] = Seq(
        "s" -> CellValue.S("hello"), "b" -> CellValue.B(true),
        "u8" -> CellValue.Byte(255), "i32" -> CellValue.I32(-123),
        "i64" -> CellValue.I64(1L << 60), "f32" -> CellValue.F32(1.5f),
        "f64" -> CellValue.F64(math.Pi))
      t.write(Seq(RowWriteItem("r", vals.map { case (q, v) =>
        ColumnWriteItem(ColumnKey.of(s"v:$q"), Some(0L), v) })))
      val row = t.getRow(GetRowInput("r")).row.get
      vals.foreach { case (q, v) =>
        assert(row.columns("v")(q).head.value == v, s"qualifier $q")
      }
      // golden JSON shape for one cell (cell.rs:296-314 serde test)
      assert(row.columns("v")("s").head.toJson ==
        """{"time":0,"type":"string","value":"hello"}""")
    }
  }
}
