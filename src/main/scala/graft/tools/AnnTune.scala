package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall/latency sweep for the bucketed ANN parameters (tables × directed
  * probes) against the exact baseline — the measurement loop behind the
  * `tables = 4` default. Usage: `runMain graft.tools.AnnTune [sfDir]`.
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-ann-tune").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, k))
    for (tables <- 1 to 4) {
      val t0 = System.nanoTime()
      val approx = pairs(Similarity.bucketedTopK(q, e, k, tables = tables))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = exact.intersect(approx).size.toDouble / exact.size
      println(f"TABLES=$tables recall@$k=$recall%.3f time=$sec%.2fs")
    }
    // the kmeans-IVF family's dial: nprobe against the INTEGER exact
    // baseline (both all-int64, so recall here is deterministic)
    val exactInt = pairs(
      graft.operators.Clustering.bruteTopKInt(e, numQueries = 20, k = k))
    for (nprobe <- 1 to 5) {
      val t0 = System.nanoTime()
      val approx = pairs(graft.operators.Clustering.ivfTopKKmeans(
        e, nprobe = nprobe, k = k, numQueries = 20))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = exactInt.intersect(approx).size.toDouble / exactInt.size
      println(f"KMEANS_NPROBE=$nprobe recall@$k=$recall%.3f time=$sec%.2fs")
    }
    spark.stop()
  }
}
