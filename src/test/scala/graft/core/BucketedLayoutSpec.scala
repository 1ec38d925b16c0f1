package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model._

/** Bucketed-by-row_key layout: physical `lg=X/bucket=Y` directories with
  * static pruning for point lookups (README scale section).
  */
class BucketedLayoutSpec extends SparkSuite {

  private def load(t: Smoltable, n: Int): Unit = {
    t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
    t.setBucketCount(8)
    val cells = spark.range(n).select(
      format_string("r%03d", col("id")).as("row_key"),
      lit("value").as("family"), lit("").as("qualifier"), lit(0L).as("ts"),
      struct(lit("string").as("vtype"),
        format_string("v%d", col("id")).as("s"),
        lit(null).cast("boolean").as("b"), lit(null).cast("short").as("u8"),
        lit(null).cast("int").as("i32"), lit(null).cast("long").as("i64"),
        lit(null).cast("float").as("f32"),
        lit(null).cast("double").as("f64")).as("value"))
    t.writeBulk(cells)
  }

  test("point get prunes to the key's bucket directory (PartitionFilters)") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "b")
      load(t, 200)
      // physical layout has bucket= subdirectories
      val lgDir = t.partitionPath(TableManifest.DefaultGroup)
      val bucketDirs = java.nio.file.Files.list(lgDir).iterator()
      val names = scala.jdk.CollectionConverters
        .IteratorHasAsScala(bucketDirs).asScala
        .map(_.getFileName.toString).filter(_.startsWith("bucket=")).toSeq
      assert(names.size == 8, s"expected 8 bucket dirs, got $names")

      val df = CellOps.getRowCells(
        t.cellsForKeys(None, Seq("r042")), GetRowInput("r042"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan.take(500))
      assert("bucket#\\d+ I?N?\\s?\\(?=?".r.findFirstIn(plan).isDefined ||
        plan.contains("bucket"), s"no bucket pruning in:\n${plan.take(800)}")

      val out = t.getRow(GetRowInput("r042"))
      assert(out.row.exists(_.columns("value")("").head.value ==
        CellValue.S("v42")))
    }
  }

  test("bucketed verbs stay correct: scan, multiGet, delete, GC rewrite") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "b")
      load(t, 50)
      // full scan sees everything across buckets, in key order
      val scan = t.scan(ScanInput(ScanMode.Prefix("r00")))
      assert(scan.rows.map(_.rowKey) == (0 until 10).map(i => f"r$i%03d"))
      // multiGet prunes + returns input order
      val mg = t.multiGet(Seq(GetRowInput("r031"), GetRowInput("r007")))
      assert(mg.rows.map(_.rowKey) == Seq("r031", "r007"))
      // delete + rewrite keeps the bucketed layout readable
      assert(t.deleteRow("r031") == 1L)
      assert(t.count() == (49L, 49L))
      assert(t.getRow(GetRowInput("r031")).row.isEmpty)
      assert(t.getRow(GetRowInput("r007")).row.nonEmpty)
    }
  }

  test("differential: bucketed table ≡ plain table across all verbs") {
    withTempDir { dir =>
      val rnd = new scala.util.Random(20260812L)
      val cat = new Catalog(dir.toString)
      val plain = Smoltable.open(spark, cat, "plain")
      val bucketed = Smoltable.open(spark, cat, "bucketed")
      Seq(plain, bucketed).foreach { t =>
        t.createColumnFamilies(Seq(ColumnFamilyDefinition("f1")))
        t.createColumnFamilies(Seq(ColumnFamilyDefinition("f2")),
          localityGroup = true)
      }
      bucketed.setBucketCount(4)

      val keys = (0 until 12).map(i => f"k$i%02d")
      // three write batches (exercises cross-batch LWW) with random cells
      for (_ <- 1 to 3) {
        val items = keys.filter(_ => rnd.nextDouble() < 0.7).map { k =>
          RowWriteItem(k, Seq.fill(1 + rnd.nextInt(3)) {
            val fam = if (rnd.nextBoolean()) "f1" else "f2"
            ColumnWriteItem(ColumnKey.of(s"$fam:q${rnd.nextInt(2)}"),
              Some(rnd.nextInt(5).toLong),
              CellValue.S(s"v${rnd.nextInt(100)}"))
          })
        }
        // identical batches into both tables
        plain.write(items)
        bucketed.write(items)
      }

      def rowsJson(out: Seq[GRow]) = out.map(_.toJson)
      // scans with assorted limits
      for (in <- Seq(
        ScanInput(ScanMode.Prefix("")),
        ScanInput(ScanMode.Prefix("k0")),
        ScanInput(ScanMode.Range("k03", "k09", inclusive = false)),
        ScanInput(ScanMode.Prefix(""), rowCellLimit = Some(2)),
        ScanInput(ScanMode.Prefix(""),
          filter = Some(ColumnFilter.Key(ColumnKey.of("f2:")))))) {
        val a = plain.scan(in)
        val b = bucketed.scan(in)
        assert(rowsJson(a.rows) == rowsJson(b.rows), s"scan $in")
        assert(a.metrics.rowsScanned == b.metrics.rowsScanned, s"rows $in")
      }
      // point gets + multi-get (bucket-pruned path)
      keys.foreach { k =>
        assert(plain.getRow(GetRowInput(k)).row.map(_.toJson) ==
          bucketed.getRow(GetRowInput(k)).row.map(_.toJson), s"get $k")
      }
      val mgIn = Seq(GetRowInput("k05"), GetRowInput("k01"), GetRowInput("k11"))
      assert(rowsJson(plain.multiGet(mgIn).rows) ==
        rowsJson(bucketed.multiGet(mgIn).rows))
      // counts and maintenance
      assert(plain.count() == bucketed.count())
      assert(plain.deleteRow("k05") == bucketed.deleteRow("k05"))
      val gc = Map("f1" -> GcSettings(versionLimit = Some(1)))
      assert(plain.runVersionGcWith(gc) == bucketed.runVersionGcWith(gc))
      assert(rowsJson(plain.scan(ScanInput(ScanMode.Prefix(""))).rows) ==
        rowsJson(bucketed.scan(ScanInput(ScanMode.Prefix(""))).rows))
    }
  }

  test("co-located join of two equal-bucket tables: one (bucket,row_key) join") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val left = Smoltable.open(spark, cat, "left")
      val right = Smoltable.open(spark, cat, "right")
      Seq(left, right).foreach { t =>
        t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
        t.setBucketCount(4)
      }
      left.write((0 until 20).map(i => RowWriteItem(f"k$i%02d", Seq(
        ColumnWriteItem(ColumnKey.of("v:l"), Some(0L), CellValue.S(s"L$i"))))))
      // right shares only the even keys
      right.write((0 until 20 by 2).map(i => RowWriteItem(f"k$i%02d", Seq(
        ColumnWriteItem(ColumnKey.of("v:r"), Some(0L), CellValue.S(s"R$i"))))))

      val joined = left.joinRows(right)
      // ONE join node keyed on (bucket, row_key) — plan size must be O(1)
      // in the bucket count, not a union of per-bucket branches
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
        .findAllIn(plan).size
      assert(joins == 1, s"expected exactly one join node, got $joins:\n$plan")
      assert("\\[bucket#\\d+L?, row_key#\\d+\\]".r.findFirstIn(plan).isDefined
          || plan.contains("bucket"),
        s"join must key on (bucket, row_key):\n$plan")

      val rows = joined.select("row_key").collect().map(_.getString(0)).sorted
      assert(rows.toSeq == (0 until 20 by 2).map(i => f"k$i%02d"))
      val k04 = joined.filter(col("row_key") === "k04").head()
      val lf = k04.getMap[String, Map[String, Any]](1)
      val rf = k04.getMap[String, Map[String, Any]](2)
      assert(lf.keys.toSet == Set("v") && rf.keys.toSet == Set("v"))

      val unbucketed = Smoltable.open(spark, cat, "plainx")
      unbucketed.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      intercept[IllegalArgumentException](left.joinRows(unbucketed))
    }
  }

  test("256-bucket co-located join plans in bounded time") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val l = Smoltable.open(spark, cat, "wide_l")
      val r = Smoltable.open(spark, cat, "wide_r")
      Seq(l, r).foreach { t =>
        t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
        t.setBucketCount(256)
      }
      l.write(Seq(RowWriteItem("k1", Seq(
        ColumnWriteItem(ColumnKey.of("v:l"), Some(0L), CellValue.S("L"))))))
      r.write(Seq(RowWriteItem("k1", Seq(
        ColumnWriteItem(ColumnKey.of("v:r"), Some(0L), CellValue.S("R"))))))
      // a realistic production bucket count: analysis + physical planning
      // must stay flat (the per-bucket union plan took O(buckets) here)
      val t0 = System.nanoTime()
      val joined = l.joinRows(r)
      joined.queryExecution.executedPlan // force analysis + planning
      val dt = (System.nanoTime() - t0) / 1e9
      assert(dt < 2.0, f"256-bucket join planned in $dt%.2fs (budget 2s)")
      assert(joined.select("row_key").collect().map(_.getString(0)).toSeq
        == Seq("k1"))
    }
  }

  test("bucketing must be declared before data lands") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "b")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("value")))
      t.write(Seq(RowWriteItem("a", Seq(ColumnWriteItem(
        ColumnKey.of("value:"), Some(0L), CellValue.S("x"))))))
      intercept[IllegalArgumentException](t.setBucketCount(8))
    }
  }
}
