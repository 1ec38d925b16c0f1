package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale check: synthesize a `factor`× copy of the sf dir
  * (union of key-shifted copies — same value distributions, same file
  * format the driver generates) and run a representative slice of the
  * driver-contract queries at 1× and at `factor`×, printing per-query
  * times and the scaled/base ratio.
  *
  * What "good" looks like per query class:
  *  - pruned point/prefix reads (`eng_get_row`, `eng_scan_prefix`,
  *    `op03`): ratio ≈ 1 — the physical layout (lg= pruning, row-group
  *    skipping, bucket pruning) keeps touched bytes constant while the
  *    corpus grows;
  *  - full passes (`op18_full_count`, `ext_dedup_exact`, scans with
  *    global predicates): ratio ≈ factor — linear in input, the best any
  *    full pass can do; SUB-linear here would mean the query skipped
  *    input it should have read;
  *  - shuffle-bound operators (`ext_dedup_minhash`, ANN): ratio between
  *    1 and factor, and crucially not ≫ factor — a super-linear ratio is
  *    the scale-killer signature (all-pairs joins, unbounded fan-out).
  *
  * The scaled corpus is cached under /tmp keyed by (base dir, factor);
  * one-time engine-table / ANN-layout builds on the scaled dir are timed
  * separately (they are ingest, not query, cost).
  *
  * Usage: `runMain graft.tools.ScaleSmoke [sfDir] [factor]`.
  */
object ScaleSmoke {

  /** The measured slice: every §2 operator class (point get, prefix/range
    * scan, limits, sampling, counts, engine-backed reads) plus the
    * LLM-pipeline operators that shuffle (dedup family, ANN both paths). */
  private val Names = Seq(
    "op03_scan_prefix", "op04_scan_range", "op11_row_limit",
    "op16_sampling", "op17_scan_count", "op18_full_count",
    "eng_get_row", "eng_scan_prefix", "eng_locality_scan",
    "ext_dedup_exact", "ext_dedup_minhash", "ext_dedup_simhash",
    "ext_fingerprint", "ext_lang_id",
    "ext_ann_bruteforce", "ext_ann_bucketed", "eng_ann_bucketed")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .appName("graft-scale-smoke").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scaled = scaledDir(spark, base, factor)
    println(s"base=$base scaled=$scaled factor=${factor}x runs=$runs")

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up pass builds the one-time scaled artifacts (engine table,
    // ANN layout) — ingest cost, reported separately from query time
    for (dir <- Seq(base, scaled); n <- Seq("eng_get_row", "eng_ann_bucketed")) {
      val t0 = System.nanoTime()
      sink(graft.SparkEntry.queries(n)(spark, dir))
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt > 2.0) println(f"  [build+warm] $n @ $dir: $dt%.1fs")
    }

    val rows = Names.map { n =>
      val fn = graft.SparkEntry.queries(n)
      def best(dir: String): Double =
        (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          sink(fn(spark, dir))
          (System.nanoTime() - t0) / 1e9
        }.min
      val wb = best(base) // first call on base doubles as per-query warm
      val tb = best(base)
      val ts = best(scaled)
      val ratio = ts / tb
      println(f"$n%-24s base=$tb%7.3fs  ${factor}x=$ts%7.3fs  ratio=$ratio%5.2f")
      (n, tb, ts, ratio, wb)
    }

    val worst = rows.maxBy(_._4)
    println(f"\nworst ratio: ${worst._1} at ${worst._4}%.2f (factor=$factor)")
    val superLinear = rows.filter(_._4 > factor * 1.3)
    println(if (superLinear.isEmpty)
      s"RESULT: no super-linear query at ${factor}x (all ratios <= ${factor}*1.3)"
    else s"RESULT: SUPER-LINEAR: ${superLinear.map(_._1).mkString(", ")}")

    // ANN layout manifest footprint at factor× — the one driver-side
    // planning artifact whose size grows with the corpus layout
    val mf = java.nio.file.Paths.get(
      graft.SparkEntry.annLayoutPath(scaled),
      graft.operators.Similarity.LayoutManifestName)
    if (java.nio.file.Files.exists(mf))
      println(s"ann layout manifest @${factor}x: " +
        s"${java.nio.file.Files.size(mf)} bytes, " +
        s"${java.nio.file.Files.readAllLines(mf).size} lines")
    spark.stop()
  }

  /** Build (or reuse) the `factor`× corpus: each copy `i` shifts every
    * integer key by `i * span` (span chosen per table so padded/string
    * key forms never collide) and perturbs document text with a per-copy
    * suffix, so near-dup structure is preserved instead of multiplied —
    * copy 0 is bit-identical to the base, keeping every key-targeted
    * query (prefix scans, point gets) aimed at real rows. */
  private def scaledDir(spark: SparkSession, base: String,
      factor: Int): String = {
    val dir = s"/tmp/graft_scale_${factor}x_" +
      Integer.toHexString(base.hashCode)
    val ready = java.nio.file.Paths.get(dir, "_READY")
    if (java.nio.file.Files.exists(ready)) return dir

    def copies(table: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$base/$table.parquet")
      (0 until factor).map(i => shift(src, i)).reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    }
    copies("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000000L))
    }
    copies("documents") { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
        .withColumn("text",
          if (i == 0) col("text") else concat(col("text"), lit(s" c$i")))
    }
    copies("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * 100000000L))
    }
    java.nio.file.Files.write(ready, Array.emptyByteArray)
    dir
  }
}
