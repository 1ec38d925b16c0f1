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
