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

  test("file-sink dedup on RocksDB state matches the memory-sink result") {
    val dir = "/root/testdata/sf0.001"
    val viaMemory = StreamOps.streamingDedup(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val out = java.nio.file.Files.createTempDirectory("sd_out").toString
    val ck = java.nio.file.Files.createTempDirectory("sd_ck").toString
    val viaFiles = StreamOps.streamingDedupToFiles(spark, dir, out, ck)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaFiles == viaMemory)
    val stateFiles = StreamingSessionSpec.stateFileNames(ck)
    assert(stateFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB-format state files under $ck/state: $stateFiles")
    assert(!stateFiles.exists(_.endsWith(".delta")),
      "default-provider .delta files present — RocksDB was not in effect")
  }
}
