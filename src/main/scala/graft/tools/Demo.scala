package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.model._

/** End-to-end demo of the public API: create a table with locality groups,
  * batch-write the docs webtable example (FIXTURES.md F12), then run each
  * query verb and print results as JSON. Run:
  * `sbt "runMain graft.tools.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft-demo")
    val catalog = new Catalog(base.toString)
    val t = Smoltable.open(spark, catalog, "webtable")

    t.createColumnFamilies(Seq(ColumnFamilyDefinition("language")))
    t.createColumnFamilies(Seq(ColumnFamilyDefinition("title")),
      localityGroup = true)

    val sites = Seq(
      ("org.apache.spark", "Apache Spark", "en"),
      ("org.apache.kafka", "Apache Kafka", "en"),
      ("org.rust-lang", "Rust", "en"),
      ("com.github", "GitHub", "en"),
      ("de.wikipedia", "Wikipedia", "de"),
      ("org.apache.arrow", "Apache Arrow", "en"),
      ("io.k8s", "Kubernetes", "en"),
      ("com.ycombinator.news", "Hacker News", "en"))
    t.write(sites.map { case (key, title, lang) =>
      RowWriteItem(key, Seq(
        ColumnWriteItem(ColumnKey.of("title:"), Some(0L), CellValue.S(title)),
        ColumnWriteItem(ColumnKey.of("language:"), Some(0L), CellValue.S(lang))))
    })

    println("== getRow org.apache.spark ==")
    val got = t.getRow(GetRowInput("org.apache.spark"))
    println(got.row.map(_.toJson).getOrElse("null"))
    println(s"   groups=${got.metrics.affectedLocalityGroups} cells_scanned=${got.metrics.cellsScanned} bytes=${got.metrics.bytesScanned}")

    println("== prefix scan org.apache, title: only (locality-group pruned) ==")
    val scanned = t.scan(ScanInput(
      ScanMode.Prefix("org.apache"),
      filter = Some(ColumnFilter.Key(ColumnKey.of("title:")))))
    scanned.rows.foreach(r => println(r.toJson))
    println(s"   groups=${scanned.metrics.affectedLocalityGroups} cells_scanned=${scanned.metrics.cellsScanned} rows_scanned=${scanned.metrics.rowsScanned} bytes=${scanned.metrics.bytesScanned}")

    println("== full scan, no filter (both groups) ==")
    val full = t.scan(ScanInput(ScanMode.Prefix("")))
    println(s"   rows=${full.rows.size} groups=${full.metrics.affectedLocalityGroups} cells_scanned=${full.metrics.cellsScanned} bytes=${full.metrics.bytesScanned}")

    println("== range scan [com, io) ==")
    val ranged = t.scan(ScanInput(ScanMode.Range("com", "io", inclusive = false)))
    ranged.rows.foreach(r => println(r.rowKey))

    println("== scan_count prefix org. ==")
    val cnt = t.scanCount(CountInput(ScanMode.Prefix("org.")))
    println(s"   rows=${cnt.rowCount} cells=${cnt.cellCount} groups=${cnt.affectedLocalityGroups}")

    println("== counts ==")
    println(s"   exact=${t.count()} approx=${t.approximateCount()}")

    println("== delete row com.github (all families) ==")
    println(s"   deleted=${t.deleteRow("com.github")}")
    println(s"   after=${t.count()}")

    println("== version write + GC (version_limit=2) ==")
    t.createColumnFamilies(Seq(
      ColumnFamilyDefinition("counter", GcSettings(versionLimit = Some(2)))))
    for (ts <- 1L to 5L)
      t.write(Seq(RowWriteItem("org.apache.spark", Seq(
        ColumnWriteItem(ColumnKey.of("counter:hits"), Some(ts),
          CellValue.I64(ts * 100))))))
    val preGc = t.getRow(GetRowInput("org.apache.spark",
      filter = Some(ColumnFilter.Key(ColumnKey.of("counter:hits")))))
    println(s"   versions before GC: ${preGc.row.get.cellCount}")
    println(s"   gc deleted=${t.runVersionGc()}")
    val postGc = t.getRow(GetRowInput("org.apache.spark",
      filter = Some(ColumnFilter.Key(ColumnKey.of("counter:hits")))))
    println(s"   after GC: ${postGc.row.map(_.toJson).getOrElse("null")}")

    println("== distributed row assembly (DataFrame-level nested maps) ==")
    val assembled = graft.core.CellOps.assembleRows(
      t.cellsFor(None).filter(org.apache.spark.sql.functions.col("row_key")
        .startsWith("org.apache")),
      org.apache.spark.sql.functions.col("value.s"))
    assembled.show(2, truncate = 60)

    println("== stateful streaming dedup (flatMapGroupsWithState) ==")
    val dedup = graft.streaming.StreamOps.streamingDedup(
      spark, "/root/testdata/sf0.001")
    println(s"   distinct-hash rows emitted: ${dedup.count()}")

    println("== metrics self-table (_mtx_webtable) ==")
    val mtx = MetricsTable.open(spark, catalog, Some("webtable"))
    for (i <- 1L to 5L) mtx.dataPoint("lat#read#row", 20.0 + i, Some(i))
    println(s"   latest(3) = ${mtx.latest("lat#read#row", 3)}")

    println("== compaction ==")
    val (filesBefore, filesAfter) = t.compact()
    println(s"   files $filesBefore -> $filesAfter; counts after = ${t.count()}")

    println("== JSON API parity layer (reference wire shapes) ==")
    val api = new graft.api.JsonApi(catalog, spark)
    println(api.scan("webtable",
      """{"row":{"prefix":"org.apache","limit":2},"column":{"key":"title:"}}"""))
    println(api.count("webtable", """{"row":{"prefix":"org."}}"""))
    println(api.listTables())

    spark.stop()
  }
}
