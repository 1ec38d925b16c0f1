package graft.core

import graft.SparkSuite
import graft.model._

/** The bulk-ingest and lazy-frame halves of the snapshot story:
  * single-job `writeBulk` validation, the [[Smoltable.withPinnedSnapshot]]
  * bracket, and the manifest's file-list format (sizes + the marker that
  * separates "legitimately empty committed set" from "legacy manifest").
  */
class BulkSnapshotSpec extends SparkSuite {

  private def cellFrame(rows: Int, family: String = "v") =
    spark.range(rows).selectExpr(
      "lpad(cast(id as string), 4, '0') as row_key",
      s"'$family' as family",
      "'' as qualifier",
      "cast(id as bigint) as ts",
      "named_struct('vtype', 'string', 's', concat('val', id), 'b', cast(null as boolean), 'u8', cast(null as smallint), 'i32', cast(null as int), 'i64', cast(null as long), 'f32', cast(null as float), 'f64', cast(null as double)) as value")

  test("writeBulk runs ONE Spark job (no separate validation pre-scan)") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "onejob")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        t.writeBulk(cellFrame(100))
        // listener events are async: wait until the count settles
        var prev = -1
        var n = jobs.get()
        while (n != prev || n == 0) {
          Thread.sleep(50); prev = n; n = jobs.get()
        }
        assert(n == 1, s"bulk load must be one Spark job, saw $n")
      } finally spark.sparkContext.removeSparkListener(listener)
      assert(t.count() == (100L, 100L))
    }
  }

  test("writeBulk rejects an unknown family inside the write job") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "reject")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      val e = intercept[Exception] {
        t.writeBulk(cellFrame(5).unionAll(cellFrame(1, family = "nope")))
      }
      def messages(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
      assert(messages(e).exists(_.contains("unknown column family")),
        s"expected unknown-family failure, got: $e")
      // the failed load committed nothing
      assert(t.count() == (0L, 0L))
      assert(t.manifest.dataFiles.isEmpty)
    }
  }

  test("withPinnedSnapshot: lazy frame executes AFTER rewrites retired " +
      "its segments, then retirees drain on exit") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "pinlazy")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t.writeBulk(cellFrame(10))
      val pinnedCount = t.withPinnedSnapshot {
        val frame = t.allCells // plan lists the pre-rewrite segments
        t.deleteRow("0003") // rewrite #1 commits, retires those segments
        t.compact() // rewrite #2 retires rewrite #1's output too
        frame.count() // executes against files only the pin keeps alive
      }
      assert(pinnedCount == 10L, "pinned plan must see its snapshot")
      assert(t.allCells.count() == 9L, "fresh plan sees the post-delete state")
      // bracket exited with no other pins: retired segments are gone and
      // disk equals the committed set
      val tdir = cat.tablePath("pinlazy")
      val onDisk = PathIO.walkFiles(tdir.resolve("data"))(
        _.getFileName.toString.endsWith(".parquet"))
        .map(f => tdir.relativize(f).toString).toSet
      assert(onDisk == t.manifest.dataFiles.map(_.path).toSet,
        "retired segments must drain once the bracket exits")
    }
  }

  test("manifest round-trips file sizes and the files-count marker") {
    val m = TableManifest(Seq(ColumnFamilyDefinition("v")), Nil, 5L, 2L, 0,
      Seq(DataFile("data/lg=_default/a.parquet", 123L)))
    val rt = TableManifest.deserialize(m.serialize)
    assert(rt.dataFiles == m.dataFiles)
    assert(rt.hasFileList)
    // a size-less `file` line from an older manifest still parses
    val legacy = TableManifest.deserialize("file\tdata/x.parquet")
    assert(legacy.dataFiles == Seq(DataFile("data/x.parquet", -1L)))
    // empty committed set (files 0) is NOT the same as no list at all
    val emptySet = TableManifest.deserialize(
      TableManifest(Nil, Nil, 0L, 1L).serialize)
    assert(emptySet.hasFileList && emptySet.dataFiles.isEmpty)
    assert(!TableManifest.deserialize("seq\t0").hasFileList)
  }

  test("crashed bulk load leaves dataFileCount == 0 and rebuilds cleanly " +
      "(the /tmp engine caches' rebuild guard is crash-safe)") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "crash")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      // simulate a JVM killed mid-writeBulk: the append job finished (a
      // parquet segment is on disk) but the manifest store never ran —
      // run a real writeBulk, then roll the manifest back to its
      // pre-write bytes, leaving the segment as uncommitted debris
      val preWrite = java.nio.file.Files.readAllBytes(t.manifestFilePath)
      t.writeBulk(cellFrame(50))
      assert(t.manifest.dataFiles.nonEmpty)
      java.nio.file.Files.write(t.manifestFilePath, preWrite)
      // the guard counts COMMITTED files, not disk debris → 0 → rebuild
      assert(t.dataFileCount == 0,
        "debris must not count as committed data")
      // a fresh open (next JVM) sweeps the debris before any verb runs,
      // so the rebuild cannot double-count it
      Smoltable.forgetRecovery(cat, "crash")
      val t2 = Smoltable.open(spark, cat, "crash")
      assert(PathIO.walkFiles(cat.tablePath("crash").resolve("data"))(
        _.getFileName.toString.endsWith(".parquet")).isEmpty,
        "open must sweep uncommitted debris")
      t2.writeBulk(cellFrame(50))
      assert(t2.count() == (50L, 50L), "rebuild must serve the full table")
    }
  }

  test("empty committed file set does not resurrect on-disk segments; " +
      "a true legacy manifest still adopts them") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "res")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t.writeBulk(cellFrame(3))
      val manifestPath = t.manifestFilePath
      // snapshot-era manifest whose committed set is legitimately empty
      // (e.g. a delete removed every cell) next to still-on-disk retired
      // segments: open must sweep them, not adopt them
      TableManifest.store(manifestPath, t.manifest.copy(dataFiles = Nil))
      Smoltable.forgetRecovery(cat, "res")
      val swept = Smoltable.open(spark, cat, "res")
      assert(swept.count() == (0L, 0L), "deleted data must stay deleted")
      assert(PathIO.walkFiles(cat.tablePath("res").resolve("data"))(
        _.getFileName.toString.endsWith(".parquet")).isEmpty)

      // true legacy manifest (predates file lists entirely): adopt
      val t2 = Smoltable.open(spark, cat, "leg")
      t2.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t2.writeBulk(cellFrame(3))
      val stripped = new String(java.nio.file.Files.readAllBytes(
          t2.manifestFilePath), java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator
        .filterNot(l => l.startsWith("files\t") || l.startsWith("file\t"))
        .mkString("\n")
      java.nio.file.Files.write(t2.manifestFilePath,
        stripped.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Smoltable.forgetRecovery(cat, "leg")
      val adopted = Smoltable.open(spark, cat, "leg")
      assert(adopted.count() == (3L, 3L), "legacy listing must be adopted")
      assert(adopted.manifest.dataFiles.nonEmpty)
      assert(adopted.manifest.dataFiles.forall(_.size > 0),
        "adoption must record real sizes")
    }
  }
}
