package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures whether a FILTER over [[graft.operators.TextAnalysis.qualityPasses]]
  * pays the quality kernel once or once-per-rule-reference: times the
  * filter form against the projection form (kernel aliased once, rules
  * over the struct fields) on the same corpus. Scratch diagnostics for
  * the r21 optimization round.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    import graft.operators.TextAnalysis
    time("filter(qualityPasses)") {
      docs.filter(col("text").isNotNull &&
        TextAnalysis.qualityPasses(col("text")))
        .select(col("doc_id"), col("lang"))
    }
    time("project-sig-then-filter") {
      val sig = graft.functions.QualitySignalsExpr(col("text"),
        TextAnalysis.DefaultStopwords)
      val nTok = col("_sig.n_tokens")
      def ratio(f: String) = when(nTok === 0L, lit(0.0))
        .otherwise(col(s"_sig.$f").cast("double") / nTok.cast("double"))
      docs.filter(col("text").isNotNull)
        .withColumn("_sig", sig)
        .filter(nTok >= 10L && nTok <= 100000L &&
          ratio("n_chars") >= 2.0 && ratio("n_chars") <= 12.0 &&
          ratio("n_sym") <= 0.25 && ratio("n_distinct") >= 0.3 &&
          col("_sig.n_stop") >= 1L)
        .select(col("doc_id"), col("lang"))
    }
    spark.stop()
  }
}
