package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off timing probe for the prep-pipeline-v2 cost breakdown: times
  * the gate, redaction, and full pipeline separately on a dir so a
  * scale ratio can be attributed to a stage (quality signals vs PII
  * regexes vs the v1 core) instead of guessed at.
  * Usage: runMain graft.tools.PrepProfile <dir> [runs]
  */
object PrepProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_v5_10x_f03e707")
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .appName("prep-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"n=${docs.count()}")

    import graft.operators.{Corpus, TextAnalysis}
    def time(name: String)(mk: => DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to runs) {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-28s $best%7.3f s")
    }

    time("scan_only")(docs.select(col("doc_id"), col("lang"), col("text")))
    time("gate_filter")(docs.filter(
      TextAnalysis.qualityPasses(col("text"))).select(col("doc_id")))
    time("redact_only")(docs.select(
      length(TextAnalysis.redactedText(col("text"))).as("n")))
    time("gate_plus_redact")(docs
      .filter(TextAnalysis.qualityPasses(col("text")))
      .select(col("doc_id"),
        length(TextAnalysis.redactedText(col("text"))).as("n")))
    time("v1_pipeline_512")(Corpus.prepPipeline(docs))
    time("v2_pipeline_512")(Corpus.prepPipelineV2(docs))
    time("v1_pipeline_32_8")(Corpus.prepPipeline(docs, 32, 8))
    time("v2_pipeline_32_8")(Corpus.prepPipelineV2(docs, 32, 8))
    println("==== v2 32/8 formatted plan ====")
    println(Corpus.prepPipelineV2(docs, 32, 8).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
