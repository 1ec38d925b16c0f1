package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: candidate-pair (edge) counts for the two cluster-dedup
  * scale rows, per corpus dir — `growing` replicates the contract
  * entry's planting rule (duplicates planted across every copy),
  * `fixed` the decomposed row's (copy-0 ids only, constant planted
  * set). The difference isolates how much of the edge growth the
  * planting rule contributes vs the corpus's natural constant-density
  * near-dups (SCALE.md "Cluster dedup decomposed").
  *
  * Usage: `runMain graft.tools.EdgeCount <dir> [dir ...]`
  */
object EdgeCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("graft-edge-count")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val growing = docs.unionAll(docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      val fixed = docs.unionAll(docs
        .filter(col("doc_id") % 50 === 0 && col("doc_id") < 100000000L)
        .select((col("doc_id") + 50000000L).as("doc_id"), col("text")))
      val g = graft.operators.Dedup.minhashCandidates(growing).count()
      val f = graft.operators.Dedup.minhashCandidates(fixed).count()
      println(s"EDGES dir=$dir growing=$g fixed=$f")
    }
    spark.stop()
  }
}
