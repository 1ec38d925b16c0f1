package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× measurement for VERDICT r21 item 7: does the (doc, term) explode
  * exchange dominate `tfidfTopTerms` at 10× the corpus, and would a
  * term-dictionary int-id shuffle pay for itself? Times the operator at
  * 1× and 10× (key-shifted unions, the ScaleSmoke corpus recipe) and
  * prints per-run seconds plus the executed plan's exchange/join lines
  * at 10×. Decision evidence for OPTIMIZATION_r22.md; not a bench path.
  */
object TfidfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    def scaled(f: Int): DataFrame =
      (0 until f).map(i => docs.select(
        (col("doc_id") + lit(i.toLong * maxId)).as("doc_id"), col("text")))
        .reduce(_ unionAll _)
    def time(tag: String, df: => DataFrame, runs: Int = 3): Unit =
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    time("tfidf 1x",
      graft.operators.TextAnalysis.tfidfTopTerms(scaled(1)))
    time("tfidf 10x",
      graft.operators.TextAnalysis.tfidfTopTerms(scaled(10)))
    val plan10 = graft.operators.TextAnalysis.tfidfTopTerms(scaled(10))
    plan10.write.format("noop").mode("overwrite").save()
    println(plan10.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Window") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
