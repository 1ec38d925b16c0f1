package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off timing probe for the k-means assignment's k-dependence:
  * times `Clustering.kmeansAssign` on a dir at two centroid caps so a
  * scale regression can be attributed to k (the capped stride) vs
  * everything else (JIT, corpus, machine state).
  * Usage: runMain graft.tools.KmeansProbe <dir> [cap1 cap2 ...]
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_v5_100x_7418e66b")
    val caps = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
      else Seq(1024L, Long.MaxValue)
    val spark = SparkSession.builder()
      .appName("kmeans-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"n=${emb.count()}")
    for (cap <- caps) {
      val t0 = System.nanoTime()
      val out = graft.operators.Clustering.kmeansAssign(emb,
        maxCentroids = cap)
      out.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"cap=$cap%d  time=$secs%.1f s")
    }
    spark.stop()
  }
}
