package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: times the minhash signature + LSH candidate pipeline at
  * sf0.1 (cold and warm) — the feedback loop used to choose the plan shape
  * documented on [[graft.operators.Dedup.minhashSignatures]].
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(s"$tag -> $r SEC=${(System.nanoTime()-t0)/1e9}")
    }
    val sigs = graft.operators.Dedup.minhashSignatures(docs, 8, graft.operators.Dedup.DefaultSeeds)
    time("sigs_forced")(sigs.agg(max(col("m1"))).collect()(0))
    time("sigs_forced2")(sigs.agg(max(col("m1"))).collect()(0))
    for (i <- 1 to 3) {
      val pairs = graft.operators.Dedup.minhashCandidates(docs)
      time(s"pairs$i")(pairs.groupBy().count().collect()(0))
    }
    spark.stop()
  }
}
