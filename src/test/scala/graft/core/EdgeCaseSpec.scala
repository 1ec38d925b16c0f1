package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model._

/** Empty-table behavior and the distributed (DataFrame-level) row
  * assembly used for large scan outputs. */
class EdgeCaseSpec extends SparkSuite {

  test("all verbs behave on an empty table") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "empty")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      assert(t.count() == (0L, 0L))
      assert(t.approximateCount() == (0L, 0L))
      assert(t.getRow(GetRowInput("nope")).row.isEmpty)
      val scan = t.scan(ScanInput(ScanMode.Prefix("")))
      assert(scan.rows.isEmpty)
      assert(scan.metrics.cellsScanned == 0)
      assert(t.deleteRow("nope") == 0L)
      assert(t.runVersionGc() == 0L)
      assert(t.compact() == (0, 0))
      val cnt = t.scanCount(CountInput(ScanMode.Prefix("x")))
      assert(cnt.rowCount == 0 && cnt.cellCount == 0)
    }
  }

  test("scan limits that exceed data behave as unlimited") {
    withTempDir { dir =>
      val t = Smoltable.open(spark, new Catalog(dir.toString), "t")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("v")))
      t.write(Seq("a", "b").map(k => RowWriteItem(k, Seq(
        ColumnWriteItem(ColumnKey.of("v:"), Some(1L), CellValue.S(k))))))
      val out = t.scan(ScanInput(ScanMode.Prefix(""),
        rowLimit = Some(100), globalCellLimit = Some(100),
        rowCellLimit = Some(100), columnCellLimit = Some(100)))
      assert(out.rows.map(_.rowKey) == Seq("a", "b"))
    }
  }

  test("assembleRows builds nested family->qualifier->versions maps in Spark") {
    import spark.implicits._
    val cells = Seq(
      ("r1", "f1", "q1", 2L, "v2"),
      ("r1", "f1", "q1", 1L, "v1"),
      ("r1", "f2", "", 1L, "x"),
      ("r2", "f1", "q1", 1L, "y"))
      .toDF("row_key", "family", "qualifier", "ts", "v")
    val assembled = CellOps.assembleRows(cells, col("v")).collect()
    assert(assembled.length == 2)
    val r1 = assembled.find(_.getString(0) == "r1").get
    val fams = r1.getMap[String, scala.collection.Map[String,
      scala.collection.Seq[org.apache.spark.sql.Row]]](1)
    assert(fams.keys.toSet == Set("f1", "f2"))
    // newest-first version order inside the cell arrays
    val versions = fams("f1")("q1").map(_.getLong(0)).toSeq
    assert(versions == Seq(2L, 1L))
  }
}
