package graft.core

import graft.SparkSuite
import graft.model._

/** Ports of the reference's point-get golden tests.
  * Fixtures: FIXTURES.md F1-F6; originals in `smoltable/tests/read_row_*.rs`.
  */
class ReadRowSpec extends SparkSuite {

  private def str(v: String) = CellValue.S(v)

  private def freshTable(dir: java.nio.file.Path, fams: Seq[String],
      lgFams: Seq[String] = Nil): Smoltable = {
    val cat = new Catalog(dir.toString)
    val t = Smoltable.open(spark, cat, "test")
    if (fams.nonEmpty)
      t.createColumnFamilies(fams.map(ColumnFamilyDefinition(_)))
    if (lgFams.nonEmpty)
      t.createColumnFamilies(
        lgFams.map(ColumnFamilyDefinition(_)), localityGroup = true)
    t
  }

  test("F1: read_row_simple — single cell golden JSON") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("value"))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(0L), str("hello"))))))

      val out = t.getRow(GetRowInput("test"))
      assert(out.metrics.affectedLocalityGroups == 1)
      assert(out.metrics.cellsScanned == 1)
      assert(out.row.get.toJson ==
        """{"row_key":"test","columns":{"value":{"":[{"time":0,"type":"string","value":"hello"}]}}}""")
    }
  }

  test("F2: read_row_simple — two qualifiers") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("value"))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:asd"), Some(0L), str("hello")),
        ColumnWriteItem(ColumnKey.of("value:def"), Some(0L), str("hello2"))))))

      val out = t.getRow(GetRowInput("test"))
      assert(out.metrics.cellsScanned == 2)
      assert(out.row.get.toJson ==
        """{"row_key":"test","columns":{"value":{"asd":[{"time":0,"type":"string","value":"hello"}],"def":[{"time":0,"type":"string","value":"hello2"}]}}}""")
    }
  }

  test("F3: read_row_harder — neighbors don't leak") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("value"))
      t.write(Seq("test", "test2", "test3").map(k =>
        RowWriteItem(k, Seq(
          ColumnWriteItem(ColumnKey.of("value:"), Some(0L), str(s"v-$k"))))))

      val out = t.getRow(GetRowInput("test2"))
      assert(out.row.get.toJson ==
        """{"row_key":"test2","columns":{"value":{"":[{"time":0,"type":"string","value":"v-test2"}]}}}""")
    }
  }

  test("F4: multiple families across locality groups") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("value"), lgFams = Seq("another"))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(0L), str("hello")),
        ColumnWriteItem(ColumnKey.of("another:"), Some(0L), str("hello2"))))))

      val out = t.getRow(GetRowInput("test"))
      assert(out.metrics.affectedLocalityGroups == 2)
      assert(out.metrics.cellsScanned == 2)
      assert(out.row.get.toJson ==
        """{"row_key":"test","columns":{"another":{"":[{"time":0,"type":"string","value":"hello2"}]},"value":{"":[{"time":0,"type":"string","value":"hello"}]}}}""")
    }
  }

  test("F5: column filter Key narrows result and seek") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("value", "another"))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:"), Some(0L), str("hello")),
        ColumnWriteItem(ColumnKey.of("another:"), Some(0L), str("hello2"))))))

      val out = t.getRow(GetRowInput("test",
        filter = Some(ColumnFilter.Key(ColumnKey.of("value:")))))
      assert(out.metrics.affectedLocalityGroups == 1)
      assert(out.metrics.cellsScanned == 1)
      assert(out.row.get.toJson ==
        """{"row_key":"test","columns":{"value":{"":[{"time":0,"type":"string","value":"hello"}]}}}""")
    }
  }

  test("F5: multi column filter") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("value"))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("value:asd"), Some(0L), str("a")),
        ColumnWriteItem(ColumnKey.of("value:def"), Some(0L), str("b")),
        ColumnWriteItem(ColumnKey.of("value:ghi"), Some(0L), str("c"))))))

      val out = t.getRow(GetRowInput("test",
        filter = Some(ColumnFilter.Multi(Seq(
          ColumnKey.of("value:asd"), ColumnKey.of("value:ghi"))))))
      assert(out.metrics.cellsScanned == 3)
      assert(out.row.get.toJson ==
        """{"row_key":"test","columns":{"value":{"asd":[{"time":0,"type":"string","value":"a"}],"ghi":[{"time":0,"type":"string","value":"c"}]}}}""")
    }
  }

  test("multiGet batching == sequential per-key getRow (randomized)") {
    withTempDir { dir =>
      val rnd = new scala.util.Random(20260813L)
      val t = freshTable(dir, Seq("f1", "f2"))
      val keys = (0 until 10).map(i => s"k$i")
      t.write(keys.map { k =>
        RowWriteItem(k, (1 to 1 + rnd.nextInt(4)).map { _ =>
          ColumnWriteItem(
            ColumnKey.of(s"f${1 + rnd.nextInt(2)}:q${rnd.nextInt(2)}"),
            Some(rnd.nextInt(4).toLong), str(s"v${rnd.nextInt(9)}"))
        })
      })
      val ins = (1 to 12).map { _ =>
        GetRowInput(
          key = if (rnd.nextBoolean()) keys(rnd.nextInt(keys.size))
            else s"missing${rnd.nextInt(3)}",
          filter = rnd.nextInt(3) match {
            case 0 => None
            case 1 => Some(ColumnFilter.Key(ColumnKey.of("f1:")))
            case 2 => Some(ColumnFilter.Prefix(ColumnKey.of("f2:q")))
          },
          rowCellLimit = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(3)) else None,
          columnCellLimit = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(2)) else None)
      }
      val batched = t.multiGet(ins).rows.map(_.toJson)
      val sequential = ins.flatMap(i => t.getRow(i).row).map(_.toJson)
      assert(batched == sequential)
    }
  }

  test("multiGet: same key with different filters resolves per input") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("aa", "bb"))
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("aa:"), Some(0L), str("A")),
        ColumnWriteItem(ColumnKey.of("bb:"), Some(0L), str("B"))))))
      val out = t.multiGet(Seq(
        GetRowInput("test", filter = Some(ColumnFilter.Key(ColumnKey.of("aa:")))),
        GetRowInput("test", filter = Some(ColumnFilter.Key(ColumnKey.of("bb:"))))))
      assert(out.rows.size == 2)
      assert(out.rows.map(_.columns.keySet) == Seq(Set("aa"), Set("bb")))
    }
  }

  test("cell limit across locality groups truncates in GROUP visit order") {
    withTempDir { dir =>
      // default-group family sorts LAST alphabetically ("zz"), but the
      // reference's SingleRowReader drains the default group FIRST — a
      // global (family, qualifier) ranking would keep the wrong cell
      val t = freshTable(dir, Seq("zz"))
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("aa")),
        localityGroup = true)
      t.write(Seq(RowWriteItem("test", Seq(
        ColumnWriteItem(ColumnKey.of("zz:q"), Some(0L), str("default-group")),
        ColumnWriteItem(ColumnKey.of("aa:q"), Some(0L), str("lg-group"))))))

      val out = t.getRow(GetRowInput("test", rowCellLimit = Some(1)))
      assert(out.row.get.columns.keySet == Set("zz"))

      val both = t.getRow(GetRowInput("test", rowCellLimit = Some(2)))
      assert(both.row.get.columns.keySet == Set("zz", "aa"))
    }
  }

  test("F6: per-row cell limit 7 over 2 columns x 5 versions (newest first)") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("value"))
      for (ts <- 1L to 5L) {
        t.write(Seq(RowWriteItem("test", Seq(
          ColumnWriteItem(ColumnKey.of("value:asd"), Some(ts), str(s"hello$ts")),
          ColumnWriteItem(ColumnKey.of("value:def"), Some(ts), str(s"hello$ts"))))))
      }
      val out = t.getRow(GetRowInput("test", rowCellLimit = Some(7)))
      assert(out.metrics.cellsScanned == 10)
      val row = out.row.get
      val asd = row.columns("value")("asd").map(_.time)
      val defc = row.columns("value")("def").map(_.time)
      assert(asd == Seq(5L, 4L, 3L, 2L, 1L))
      assert(defc == Seq(5L, 4L))
    }
  }

  test("F6b: per-column cell limit caps each column independently") {
    withTempDir { dir =>
      val t = freshTable(dir, Seq("value"))
      for (ts <- 1L to 5L) {
        t.write(Seq(RowWriteItem("test", Seq(
          ColumnWriteItem(ColumnKey.of("value:asd"), Some(ts), str(s"hello$ts")),
          ColumnWriteItem(ColumnKey.of("value:def"), Some(ts), str(s"hello$ts"))))))
      }
      val out = t.getRow(GetRowInput("test", columnCellLimit = Some(2)))
      val row = out.row.get
      assert(row.columns("value")("asd").map(_.time) == Seq(5L, 4L))
      assert(row.columns("value")("def").map(_.time) == Seq(5L, 4L))
    }
  }
}
