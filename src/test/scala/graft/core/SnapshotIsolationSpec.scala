package graft.core

import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.concurrent.TrieMap

import graft.SparkSuite
import graft.model._

/** Snapshot-isolated reads vs concurrent rewrites: the reference pins every
  * query to `keyspace.instant()` (`smoltable/src/table/mod.rs:653`,
  * `table/reader.rs:28`); here reads pin the manifest's committed file list
  * and rewrites retire (rather than delete) replaced segments until every
  * in-flight reader drains. These specs drive real races: reader threads
  * hammer scan/get/count while a mutator loops delete → re-write → GC →
  * compact rewrites.
  */
class SnapshotIsolationSpec extends SparkSuite {

  private def fill(t: Smoltable, rows: Int): Unit =
    t.writeBulk(spark.range(rows).selectExpr(
      "lpad(cast(id as string), 4, '0') as row_key",
      "'v' as family",
      "'' as qualifier",
      "cast(id as bigint) as ts",
      "named_struct('vtype', 'string', 's', concat('val', id), 'b', cast(null as boolean), 'u8', cast(null as smallint), 'i32', cast(null as int), 'i64', cast(null as long), 'f32', cast(null as float), 'f64', cast(null as double)) as value"))

  test("reads never fail racing delete/GC/compact rewrites") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "race")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      fill(t, 100)

      val stop = new AtomicBoolean(false)
      val failures = TrieMap.empty[String, Throwable]
      val readerOps = new java.util.concurrent.atomic.AtomicLong(0)

      val readers = (1 to 3).map { i =>
        new Thread(() => {
          // each reader reopens the table, like a server request would
          val rt = Smoltable.open(spark, cat, "race")
          while (!stop.get()) {
            try {
              val s = rt.scan(ScanInput(ScanMode.Prefix("00")))
              assert(s.rows.nonEmpty, "prefix 00 rows must survive")
              val g = rt.getRow(GetRowInput("0042"))
              assert(g.row.nonEmpty, "row 0042 is never deleted")
              val (rc, cc) = rt.count()
              assert(rc >= 99L, s"at most one row missing mid-delete: $rc")
              assert(cc >= rc, "cells >= rows")
              readerOps.incrementAndGet()
            } catch {
              case e: Throwable => failures.put(s"reader$i", e); stop.set(true)
            }
          }
        }, s"reader$i")
      }
      readers.foreach(_.start())

      try {
        // mutation storm: every cycle rewrites the whole table at least
        // twice (delete + GC or compact), each commit retiring the
        // previous segment set while readers may still be pinned to it
        for (cycle <- 1 to 4 if !stop.get()) {
          try {
            t.deleteRow("0001")
            t.write(Seq(RowWriteItem("0001", Seq(ColumnWriteItem(
              ColumnKey.of("v:"), Some(1000L + cycle), CellValue.S("back"))))))
            t.runVersionGcWith(Map("v" ->
              GcSettings(versionLimit = Some(1))))
            t.compact()
          } catch {
            case e: Throwable => failures.put(s"mutator@$cycle", e); stop.set(true)
          }
        }
      } finally {
        stop.set(true)
        readers.foreach(_.join(60000))
      }

      assert(failures.isEmpty, s"concurrent read/rewrite failures: " +
        failures.map { case (k, v) => s"$k: $v" }.mkString("; "))
      assert(readerOps.get() > 0, "readers must have made progress")
      // final state intact
      assert(t.count()._1 == 100L)
    }
  }

  test("retired segments are deleted once the last pinned reader drains") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "drain")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      fill(t, 20)
      // rewrite twice; no readers in flight → retired files deleted
      t.deleteRow("0000")
      t.compact()
      val dataDir = cat.tablePath("drain").resolve("data")
      val onDisk = PathIO.walkFiles(dataDir)(
          _.getFileName.toString.endsWith(".parquet"))
        .map(f => cat.tablePath("drain").relativize(f).toString).toSet
      val committed = t.manifest.dataFiles.map(_.path).toSet
      assert(onDisk == committed,
        s"on-disk segments must equal the committed set; " +
          s"stray: ${onDisk -- committed}")
    }
  }

  test("a plan built before a rewrite still reads its pinned snapshot files") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val t = Smoltable.open(spark, cat, "pin")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      fill(t, 10)
      val g = Smoltable.readGuard(cat, "pin")
      val e = g.enter()
      try {
        val before = t.allCells // plan pins the current file list
        t.deleteRow("0003") // rewrite retires those files
        // pinned plan still sees the pre-delete snapshot
        assert(before.count() == 10L)
        // a fresh plan sees the post-delete state
        assert(t.allCells.count() == 9L)
      } finally g.exit(e)
    }
  }
}
