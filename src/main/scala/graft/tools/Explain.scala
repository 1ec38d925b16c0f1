package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.model._

/** Dumps formatted physical plans for the load-bearing query shapes so scan
  * pushdown / partition pruning / broadcast / codegen can be eyeballed.
  * Run: `sbt "runMain graft.tools.Explain"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("graft-explain")
    val t = Smoltable.open(spark, new Catalog(base.toString), "t")
    t.createColumnFamilies(Seq(ColumnFamilyDefinition("language")))
    t.createColumnFamilies(Seq(ColumnFamilyDefinition("title")),
      localityGroup = true)
    t.write((1 to 100).map(i => RowWriteItem(f"row$i%04d", Seq(
      ColumnWriteItem(ColumnKey.of("title:"), Some(0L), CellValue.S(s"t$i")),
      ColumnWriteItem(ColumnKey.of("language:"), Some(0L), CellValue.S("en"))))))

    println("\n########## engine: prefix scan + family filter (expect PartitionFilters on lg AND PushedFilters StartsWith on row_key)")
    CellOps.scanCells(
      t.cellsFor(Some(ColumnFilter.Key(ColumnKey.of("title:")))),
      ScanInput(ScanMode.Prefix("row00"),
        filter = Some(ColumnFilter.Key(ColumnKey.of("title:")))))
      .explain("formatted")

    println("\n########## engine: point get (expect PushedFilters EqualTo on row_key)")
    CellOps.getRowCells(t.cellsFor(None), GetRowInput("row0042"))
      .explain("formatted")

    println("\n########## bucketed layout: point get (expect PartitionFilters on lg AND bucket)")
    val tb = Smoltable.open(spark, new Catalog(base.toString), "tb")
    tb.createColumnFamilies(Seq(ColumnFamilyDefinition("title")))
    tb.setBucketCount(8)
    tb.write((1 to 100).map(i => RowWriteItem(f"row$i%04d", Seq(
      ColumnWriteItem(ColumnKey.of("title:"), Some(0L), CellValue.S(s"t$i"))))))
    CellOps.getRowCells(
      tb.cellsForKeys(None, Seq("row0042")), GetRowInput("row0042"))
      .explain("formatted")

    println("\n########## ANN physical layout probe (expect PartitionFilters on l AND bucket at the candidate scan; no data filter doing the pruning)")
    val annDir = base.resolve("ann").toString
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.operators.Similarity.writeBucketedLayout(emb, annDir)
    graft.operators.Similarity.bucketedTopKFromLayout(
        annDir, emb.filter(col("vec_id") < 5), k = 3)
      .explain("formatted")

    println("\n########## q3 join (expect BroadcastHashJoin on customer)")
    val dir = "/root/testdata/sf0.01"
    graft.SparkEntry.queries("q3_shipping_priority")(spark, dir)
      .explain("formatted")

    println("\n########## op15 version limit (expect single shuffle on row_key/family/qualifier + WindowExec)")
    graft.SparkEntry.queries("op15_version_limit")(spark, dir)
      .explain("formatted")

    println("\n########## tfidf (expect partial HashAggregate before the (doc_id, term) exchange; df side joined back; WindowGroupLimit before the final window)")
    graft.SparkEntry.queries("ext_tfidf")(spark, dir)
      .explain("formatted")

    println("\n########## pii scan (expect ONE WholeStageCodegen project over the scan, ReadSchema doc_id+text only, no exchange)")
    graft.SparkEntry.queries("ext_pii_scan")(spark, dir)
      .explain("formatted")

    println("\n########## incremental dedup (expect LeftAnti hash join on the md5 hash, partial-agg before the batch exchange)")
    graft.SparkEntry.queries("ext_dedup_incremental")(spark, dir)
      .explain("formatted")

    println("\n########## as-of join (expect Union -> ONE Exchange hashpartitioning(user_id) -> Sort -> Window running last(); NO join operator, no second exchange)")
    graft.SparkEntry.queries("ext_join_asof")(spark, dir)
      .explain("formatted")

    println("\n########## k-means final assignment (expect scan of vec_id+embedding only -> ONE WholeStageCodegen project with the array_min centroid fold; NO exchange)")
    graft.SparkEntry.queries("ext_cluster_kmeans")(spark, dir)
      .explain("formatted")

    println("\n########## cluster outliers (expect WindowGroupLimit (rank<=5) BEFORE the cid exchange, then the final window)")
    graft.SparkEntry.queries("ext_cluster_outliers")(spark, dir)
      .explain("formatted")

    println("\n########## corpus rebalance (expect BroadcastHashJoin for the per-lang counts + BroadcastNestedLoopJoin for the 1-row min; the corpus side never exchanges)")
    graft.SparkEntry.queries("ext_rebalance_langs")(spark, dir)
      .explain("formatted")

    println("\n########## prep pipeline (expect ONE corpus hash exchange (the md5 dedup groupBy); rebalance/split coins as filters; chunk explode on top)")
    graft.SparkEntry.queries("ext_pipeline_prep")(spark, dir)
      .explain("formatted")

    spark.stop()
  }
}
