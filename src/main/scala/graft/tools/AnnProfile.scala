package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the physical-layout ANN probe (`eng_ann_bucketed`):
  * separates layout build, probe-set planning job, and the main pruned
  * join so the bench number can be attributed.
  * Usage: `runMain graft.tools.AnnProfile [sfDir]`.
  */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-ann-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    val layout = java.nio.file.Files.createTempDirectory("ann_prof").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    time("layout-write")(
      graft.operators.Similarity.writeBucketedLayout(e, layout))
    val q = e.filter(col("vec_id") < 10)
    // warm run end-to-end, then phase-timed warm runs
    time("cold-end-to-end")(
      graft.operators.Similarity.bucketedTopKFromLayout(layout, q, 3)
        .collect())
    for (i <- 1 to 3) {
      time(s"warm-$i-end-to-end")(
        graft.operators.Similarity.bucketedTopKFromLayout(layout, q, 3)
          .collect())
    }
    // pieces: the planning collect alone, then a raw pruned read
    for (i <- 1 to 3) {
      time(s"query-collect-only-$i") {
        q.select(col("vec_id"), col("embedding")).collect()
      }
    }
    time("probe-job-only") {
      graft.operators.Similarity.bucketedTopK(q, q, 3).collect()
    }
    time("layout-listing-only") {
      spark.read.parquet(layout).filter(col("l") === 0 &&
        col("bucket") === 0).count()
    }
    spark.stop()
  }
}
