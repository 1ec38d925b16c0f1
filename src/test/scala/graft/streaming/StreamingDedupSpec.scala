package graft.streaming

import graft.SparkSuite

/** Stateful streaming dedup: first occurrence per content hash across
  * micro-batches, via flatMapGroupsWithState. */
class StreamingDedupSpec extends SparkSuite {

  test("streamingDedup emits one row per distinct text hash") {
    val dir = "/root/testdata/sf0.001"
    val out = StreamOps.streamingDedup(spark, dir)
    val n = out.count()
    val distinctTexts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").distinct().count()
    assert(n == distinctTexts)
    // deterministic keep choice: smallest doc_id per hash
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.functions._
    val expectedKeep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    assert(out.except(expectedKeep).count() == 0)
  }
}
