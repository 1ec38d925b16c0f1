package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the per-trigger duration breakdown (StreamingQueryProgress
  * durationMs) and the start/drain/stop wall split for one memory-sink
  * stream harness — r21 diagnostics for the streaming rows' fixed
  * lifecycle cost. */
object StreamLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // r22: also A/B the state-store provider for the throwaway
    // memory-sink drains (VERDICT item 8) — "rocksdb" entries run the
    // identical join on RocksDBStateStoreProvider
    val grid: Seq[(Int, String)] =
      if (args.contains("providers"))
        Seq((4, "hdfs"), (4, "rocksdb"), (4, "hdfs"), (4, "rocksdb"),
          (4, "hdfs"), (4, "rocksdb"))
      else if (args.contains("lowparts"))
        Seq(1, 2, 4, 1, 2, 4, 1, 2, 4).map((_, "hdfs"))
      else Seq(4, 8, 16, 4, 8, 16).map((_, "hdfs"))
    grid.zipWithIndex.foreach { case ((parts, provider), i) =>
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, parts.toString)
      val pKey = "spark.sql.streaming.stateStore.providerClass"
      val pPrev = spark.conf.getOption(pKey)
      if (provider == "rocksdb")
        spark.conf.set(pKey,
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
      val t0 = System.nanoTime()
      val ev = {
        import graft.sources.EventsSource
        val dt = EventsSource.probeTsTypeChecked(spark, sfDir)
        spark.readStream.schema(EventsSource.streamSchema(dt))
          .option("pathGlobFilter", "events.parquet").parquet(sfDir)
          .withColumn("ts", EventsSource.tsToNanos(dt, col("ts")))
          .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      }
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"),
          col("user_id").as("buy_user"), col("event_ts").as("buy_ts"))
        .withWatermark("buy_ts", "1 hour")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("click_user"), col("event_ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val joined = buys.join(clicks,
        col("buy_user") === col("click_user") &&
          col("click_ts") <= col("buy_ts") &&
          col("click_ts") >= col("buy_ts") - expr("INTERVAL 24 HOURS"),
        "inner")
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(s"probe_$i").start()
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val t2 = System.nanoTime()
      q.stop()
      val t3 = System.nanoTime()
      spark.conf.set(key, prev)
      pPrev match {
        case Some(v) => spark.conf.set(pKey, v)
        case None    => spark.conf.unset(pKey)
      }
      println(f"run $i parts=$parts provider=$provider: start=${(t1 - t0) / 1e9}%.3f drain=${(t2 - t1) / 1e9}%.3f stop=${(t3 - t2) / 1e9}%.3f")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
