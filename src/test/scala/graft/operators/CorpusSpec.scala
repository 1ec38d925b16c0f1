package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Corpus]] — deterministic sampling and decontamination, plus the
  * int8 quantized ANN kernel ([[Similarity.scalarQuantize]]).
  */
class CorpusSpec extends SparkSuite {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("stratified exact sample hits ceil(fraction * n) per stratum") {
    val quota = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.2).toLong)
      .toMap
    val got = Corpus.stratifiedSampleExact(docs, "lang", 0.2)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == quota)
  }

  test("stratified sample is deterministic and a subset of the corpus") {
    val a = Corpus.stratifiedSampleExact(docs, "lang", 0.1)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Corpus.stratifiedSampleExact(docs, "lang", 0.1)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.forall(ids))
  }

  test("threshold sample is shuffle-free (no Exchange in the plan)") {
    val df = Corpus.thresholdSample(docs.select(col("doc_id")), 0.25)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("threshold sample quota is near the fraction and deterministic") {
    val n = docs.count().toDouble
    val kept = Corpus.thresholdSample(docs, 0.25).count().toDouble
    // binomial(n, 0.25): allow 5 sigma
    val sigma = math.sqrt(n * 0.25 * 0.75)
    assert(math.abs(kept - n * 0.25) <= 5 * sigma,
      s"kept $kept of $n at fraction 0.25")
  }

  test("threshold and stratified samplers share the same per-doc coin") {
    // A doc kept by thresholdSample at f has hash < f*2^60; the
    // stratified sampler ranks by the SAME hash, so the lowest-hash doc
    // per stratum is always in both samples at any shared fraction.
    import spark.implicits._
    val d = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"))
      .toDF("doc_id", "lang")
    val strat = Corpus.stratifiedSampleExact(d, "lang", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byHash = d.withColumn("h", Corpus.sampleHash(col("doc_id")))
      .collect().map(r => r.getString(1) -> (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (_, rs) => rs.map(_._2).minBy(_._2)._1 }
    assert(byHash.toSet == strat)
  }

  test("decontaminate flags docs sharing a word trigram with the holdout") {
    import spark.implicits._
    val holdout = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx the quick brown yy"),     // shares "the quick brown"
      (2L, "quick brown dog"),           // bigram overlap only -> clean
      (3L, "brown fox jumps high and the quick brown too"), // two matches
      (4L, "totally unrelated words here"),
      (5L, "ab cd")                      // shorter than the n-gram
    ).toDF("doc_id", "text")
    val got = Corpus.decontaminate(corpus, holdout)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got == Map(
      1L -> ((1L, true)), 2L -> ((0L, false)), 3L -> ((2L, true)),
      4L -> ((0L, false)), 5L -> ((0L, false))))
  }

  test("decontaminate within the broadcast budget is a NARROW corpus " +
      "projection (NgramMatches kernel: no explode, no join, no exchange)") {
    val df = Corpus.decontaminate(
      docs.filter(col("doc_id") % 100 =!= 7),
      docs.filter(col("doc_id") % 100 === 7))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ngram_matches"),
      s"expected the membership kernel in the plan:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Generate") &&
      !plan.contains("Join"),
      s"kernel path must not explode/join/shuffle the corpus:\n$plan")
  }

  test("decontaminate strategy differential: shuffle join ≡ broadcast") {
    val corpus = docs.filter(col("doc_id") % 100 =!= 7)
    val holdout = docs.filter(col("doc_id") % 100 === 7)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val viaBroadcast = Corpus.decontaminate(corpus, holdout)
    val viaShuffle = Corpus.decontaminate(corpus, holdout,
      maxBroadcastNgrams = 0L) // force the oversized-holdout path
    assert(rows(viaBroadcast) == rows(viaShuffle))
    assert(rows(viaBroadcast).exists(_._3), "differential needs matches")
  }

  test("decontaminate picks a shuffled hash join for an oversized holdout") {
    val df = Corpus.decontaminate(
      docs.filter(col("doc_id") % 100 =!= 7),
      docs.filter(col("doc_id") % 100 === 7),
      maxBroadcastNgrams = 0L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"oversized holdout not shuffle-joined:\n$plan")
  }

  test("curate composes keeper-dedup, quality gate and decontamination") {
    import spark.implicits._
    // 35 distinct words -> passes the 30-token gate, no repeated trigram
    def longText(seed: String) =
      (1 to 35).map(i => s"$seed$i").mkString(" ")
    val contaminating = "alpha beta gamma"
    val corpus = Seq(
      (1L, longText("dup"), "en"),            // exact dup of 2 -> keeper
      (2L, longText("dup"), "en"),            // dropped (cluster member)
      (3L, "too short", "en"),                // dropped (quality gate)
      (4L, longText("cln") + " " + contaminating, "de"), // contaminated
      (5L, longText("uniq"), "fr")            // clean survivor
    ).toDF("doc_id", "text", "lang")
    val holdout = Seq((100L, s"zz $contaminating yy"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = Corpus.curate(corpus, holdout)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "en"), (5L, "fr")))
  }

  test("topKPerGroup keeps exactly k best per group, map-side limited") {
    val got = Corpus.topKPerGroup(
      docs.select(col("doc_id"), col("lang"), col("n_chars")),
      "lang", "n_chars", 5)
    val counts = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 5L))
    // per group: exactly the 5 largest n_chars (doc_id tiebreak)
    val expect = docs.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).view.mapValues(
        _.sortBy(t => (-t._3, t._1)).take(5).map(_._1).toSet).toMap
    val gotIds = got.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(gotIds == expect.toMap)
    // the plan must pre-truncate per map task BEFORE the exchange
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side WindowGroupLimit:\n$plan")
  }

  test("repetition signals: boilerplate scores low ratio, high trigram") {
    import spark.implicits._
    val docs = Seq(
      (1L, "buy now click here buy now click here buy now click here"),
      (2L, "a quick brown fox jumps over the lazy sleeping dog today"),
      (3L, "xy")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // doc 1: 12 tokens, 4 distinct, "buy now click"/"now click here" x3
    assert(got(1L)._1 == 12L && got(1L)._2 == 4.0 / 12.0 && got(1L)._3 == 3L)
    // doc 2: 11 distinct tokens out of 11, every trigram unique
    assert(got(2L) == ((11L, 1.0, 1L)))
    // doc 3: shorter than a trigram -> max_trigram_count 0
    assert(got(3L) == ((1L, 1.0, 0L)))
  }

  test("int8 quantization stays in [-127, 127] and hits the extremes") {
    import spark.implicits._
    val e = Seq((0L, Array(0.5f, -1.0f, 0.25f, 1.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = e.select(col("vec_id"),
        Similarity.scalarQuantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(q(0L) == Seq[Byte](64, -127, 32, 127))
    assert(q(1L) == Seq[Byte](0, 0, 0, 0)) // zero vector guard
  }

  test("IVF + int8 rescore recalls the quantized brute-force top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.quantizedTopK(q, e, 5))
    val ivf = pairs(Similarity.ivfTopKQuantized(q, e, 5))
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    info(f"IVF+int8 recall@5 vs quantized brute force: $recall%.2f")
    assert(recall >= 0.80, f"recall $recall%.2f below floor")
  }

  test("adaptive quantized IVF: kernel and distributed strategies are " +
      "identical (strategy differential)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val kernel = pairs(Similarity.ivfTopKQuantizedAdaptive(q, e, 5))
    val dist = pairs(Similarity.ivfTopKQuantizedAdaptive(q, e, 5,
      maxKernelCentroids = 0)) // force the broadcast-join path
    assert(kernel == dist)
    assert(kernel.nonEmpty)
  }

  test("quantizedSim scalar matches the hand-computed int8 cosine") {
    import spark.implicits._
    // a=(0.5,-1,0.25,1) -> q=(64,-127,32,127); b=(1,0,0,0) -> q=(127,0,0,0)
    // dot = 64*127, norms: 37378 and 16129
    val df = Seq((Array(0.5f, -1.0f, 0.25f, 1.0f), Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
      .select(Similarity.quantizedSim(col("a"), col("b")).as("s"),
        Similarity.quantizedSim(col("a"), col("a")).as("self"))
    val r = df.head()
    assert(r.getDouble(0) == 64.0 * 127.0 / math.sqrt(37378.0 * 16129.0))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12) // self-sim ~ 1
  }

  test("quantized top-k recall vs float brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, 5))
    val quant = pairs(Similarity.quantizedTopK(q, e, 5))
    val recall = exact.intersect(quant).size.toDouble / exact.size
    info(f"int8 recall@5: $recall%.2f")
    assert(recall >= 0.90, f"recall $recall%.2f below floor")
  }

  test("packSequences: hand-computed bins, bounded payloads, " +
      "contiguous bin ids, partition-independent") {
    import org.apache.spark.sql.functions.{col, max => fmax, min => fmin, sum => fsum}
    import spark.implicits._
    // single shard (shards=1): docs in id order with token counts
    // 1000,1500,600,2000 at budget 2048 -> tokens_before 0,1000,2500,
    // 3100 -> bins 0,0,1,1
    val tiny = Seq((1L, 1000L), (2L, 1500L), (3L, 600L), (4L, 2000L))
      .toDF("doc_id", "n_tokens")
    val got = Corpus.packSequences(tiny, "doc_id", "n_tokens", 2048L,
        shards = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bin")).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L), s"$got")

    // real corpus: every (shard, bin) payload is bounded by
    // budget + one doc, bin ids are 0..max contiguous per shard, and
    // the assignment ignores physical partitioning
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " "))
          .cast("long").as("n_tokens"))
    val budget = 2048L
    val packed = Corpus.packSequences(docs, "doc_id", "n_tokens", budget)
    val maxDoc = docs.agg(fmax(col("n_tokens"))).head().getLong(0)
    val bins = packed.groupBy("shard", "bin")
      .agg(fsum(col("n_tokens")).as("payload"))
      .collect()
    assert(bins.forall(_.getAs[Long]("payload") < budget + maxDoc),
      "a bin exceeded budget + one document")
    val perShard = packed.groupBy("shard")
      .agg(fmin(col("bin")).as("lo"), fmax(col("bin")).as("hi"),
        org.apache.spark.sql.functions.countDistinct(col("bin")).as("n"))
      .collect()
    assert(perShard.forall(r =>
      r.getAs[Long]("lo") == 0L &&
        r.getAs[Long]("n") == r.getAs[Long]("hi") + 1),
      "bin ids must be contiguous from 0 per shard")
    val again = Corpus.packSequences(docs.repartition(17), "doc_id",
        "n_tokens", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("packMultimodal: patch accounting is exact ceil(w/P)*ceil(h/P), " +
      "bins follow the combined cost, and zero-size images reduce to " +
      "the text packer") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // hand-check: P=16. (w,h)=(1,1)->1 patch; (16,16)->1; (17,16)->2;
    // (1023,1023)->64*64=4096 patches
    val tiny = Seq(
      (1L, 100L, 1L, 1L), (2L, 100L, 16L, 16L),
      (3L, 100L, 17L, 16L), (4L, 100L, 1023L, 1023L))
      .toDF("doc_id", "text_tokens", "width", "height")
    val got = Corpus.packMultimodal(tiny, budgetTokens = 8192L,
        shards = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("text_tokens"),
          r.getAs[Long]("patch_tokens"), r.getAs[Long]("bin"))).toMap
    assert(got(1L) == ((101L, 100L, 1L, 0L)), s"${got(1L)}")
    assert(got(2L) == ((101L, 100L, 1L, 0L)))
    assert(got(3L) == ((102L, 100L, 2L, 0L)))
    // tokens_before for doc 4 = 101+101+102 = 304 -> bin 0; its own
    // 4196 tokens spill past the boundary only for FOLLOWING docs
    assert(got(4L) == ((4196L, 100L, 4096L, 0L)))
    // degenerate images (0x0 -> 0 patches): multimodal packing must
    // equal the text packer bit-for-bit (same shards, same cumsum)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " "))
          .cast("long").as("text_tokens"))
    val zeroImg = docs.withColumn("width",
        org.apache.spark.sql.functions.lit(0L))
      .withColumn("height", org.apache.spark.sql.functions.lit(0L))
    val mm = Corpus.packMultimodal(zeroImg, budgetTokens = 2048L)
      .select("doc_id", "shard", "bin", "n_tokens")
      .collect().map(_.toSeq).toSet
    val txt = Corpus.packSequences(docs, "doc_id", "text_tokens", 2048L)
      .collect().map(_.toSeq).toSet
    assert(mm == txt, "zero-image multimodal packing must equal the " +
      "text packer")
  }

  test("weightedThresholdSample: deterministic, subset, monotone in " +
      "weight, and proportional in aggregate") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val tau = 1000000000000000L
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = ids(Corpus.weightedThresholdSample(docs, "doc_id",
      "n_chars", tau))
    // deterministic under repartition
    assert(kept == ids(Corpus.weightedThresholdSample(
      docs.repartition(13), "doc_id", "n_chars", tau)))
    // monotone: doubling every weight keeps a superset
    val doubled = ids(Corpus.weightedThresholdSample(
      docs.withColumn("n_chars", col("n_chars") * lit(2L)),
      "doc_id", "n_chars", tau))
    assert(kept.subsetOf(doubled), "doubling weights must not drop docs")
    // aggregate proportionality: long docs keep at a higher rate
    val med = docs.stat.approxQuantile("n_chars", Array(0.5), 0.0).head
    val long_ = docs.filter(col("n_chars") > med)
    val short_ = docs.filter(col("n_chars") <= med)
    def rate(df: org.apache.spark.sql.DataFrame): Double =
      ids(Corpus.weightedThresholdSample(df, "doc_id", "n_chars", tau))
        .size.toDouble / df.count()
    assert(rate(long_) > rate(short_),
      "higher-weight stratum must keep a larger fraction")
  }

  test("weightedThresholdSample: huge weights keep (P=1), never wrap " +
      "negative and silently drop") {
    import spark.implicits._
    val tau = 1000000000000000L // ext_sample_weighted's tau
    // weights straddling the overflow boundary 2^63/tau ≈ 9223: pre-clamp,
    // w * tau wrapped negative for the large ones and the filter silently
    // dropped rows DuckDB would keep (or error on) — the divergence class
    // ADVICE r14 flagged. All of these have w*tau ≥ 2^60 ⇒ must ALL keep.
    val df = Seq((1L, 9224L), (2L, 100000L), (3L, Long.MaxValue / tau + 7),
        (4L, Long.MaxValue), (5L, 0L),
        // negative weights: P[keep] = 0, including the huge-magnitude
        // ones whose w * tau would wrap POSITIVE ≥ 2^60 un-clamped and
        // silently KEEP (the mirror image of the positive wrap)
        (6L, -1L), (7L, Long.MinValue), (8L, Long.MinValue / tau - 7))
      .toDF("doc_id", "w")
      // NULL weight: least/greatest SKIP null operands, so un-coalesced
      // it would resolve to maxSafeWeight and keep with P~1; the clamp
      // coalesces to 0 first ⇒ drops like every non-positive weight
      .union(Seq(9L).toDF("doc_id")
        .withColumn("w", org.apache.spark.sql.functions.lit(null)
          .cast("long")))
    val kept = Corpus.weightedThresholdSample(df, "doc_id", "w", tau)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L),
      s"huge-weight rows must keep with P=1 and non-positive drop, got $kept")
  }

  test("sampledQuantiles: nearest-rank over the full set when fraction=1") {
    import spark.implicits._
    // group g: values 1..100 -> p50 = 50th smallest = 50, p95 = 95, p99 = 99
    val df = (1 to 100).map(v => ("g", v.toLong, v * 1.0)).toDF("grp", "id", "value")
    val r = Corpus.sampledQuantiles(df, "grp", org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.col("value") * 100), fraction = 1.0)
      .head()
    assert(r.getAs[Long]("n_sample") == 100L)
    assert(r.getAs[Long]("p50") == 5000L)
    assert(r.getAs[Long]("p95") == 9500L)
    assert(r.getAs[Long]("p99") == 9900L)
  }

  test("sampledQuantiles is partition-independent and sample-deterministic") {
    import org.apache.spark.sql.functions.{col, round}
    val ev = graft.sources.EventsSource.readEvents(spark, "/root/testdata/sf0.001")
    def run(parts: Int) = Corpus.sampledQuantiles(
        ev.repartition(parts), "event_type", col("event_id"), round(col("value") * 100))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(run(1) == run(13))
    assert(run(1).nonEmpty)
  }

  test("sampledQuantiles plans one exchange: the sample filter rides the scan") {
    import org.apache.spark.sql.functions.{col, round}
    val ev = graft.sources.EventsSource.readEvents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.sampledQuantiles(ev, "event_type", col("event_id"),
      round(col("value") * 100)).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange (group partitioning), got $exchanges:\n$plan")
  }

  test("chunkDocuments: hand-computed ranges, tiling with exact " +
      "overlap, final clamp, one chunk minimum") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def doc(id: Long, nTok: Int) = (id, Seq.fill(nTok)("w").mkString(" "))
    val docs = Seq(doc(1, 1), doc(2, 32), doc(3, 33), doc(4, 99))
      .toDF("doc_id", "text")
    val got = Corpus.chunkDocuments(docs, chunkTokens = 32, overlap = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._3, c._4)))
      .toMap
    assert(got(1L).toSeq == Seq((0L, 1L)))
    assert(got(2L).toSeq == Seq((0L, 32L)))
    assert(got(3L).toSeq == Seq((0L, 32L), (24L, 33L)))
    // n=99: 1 + ceil(67/24) = 4 chunks; every non-final spans 32,
    // consecutive chunks overlap by exactly 8, final clamps to 99
    assert(got(4L).toSeq ==
      Seq((0L, 32L), (24L, 56L), (48L, 80L), (72L, 99L)))
    got(4L).toSeq.sliding(2).foreach { case Seq((_, e), (s2, _)) =>
      assert(e - s2 == 8L, "overlap must be exactly 8")
    }
    // every token of every doc is covered by at least one chunk
    val covered = got(4L).flatMap { case (s, e) => s until e }.toSet
    assert(covered == (0L until 99L).toSet)

    // real corpus: multi-chunk path exercised, chunk counts match the
    // ws_tokens-derived formula
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counts = Corpus.chunkDocuments(real, 32, 8)
      .groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = TextAnalysis.tokenCounts(real).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    toks.foreach { case (id, n) =>
      val want = if (n <= 32) 1L else 1L + (n - 32 + 23) / 24
      assert(counts(id) == want, s"doc $id: $n tokens -> ${counts(id)}")
    }
    assert(counts.values.exists(_ > 1), "corpus must exercise multi-chunk")
  }

  test("rebalanceGroups: smallest group survives intact, expected " +
      "sizes ~min, corpus never shuffles (broadcast-only plan)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val before = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCnt = before.values.min
    val minLangs = before.filter(_._2 == minCnt).keySet
    val kept = Corpus.rebalanceGroups(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val by = kept.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    minLangs.foreach { l =>
      assert(by(l) == minCnt, s"smallest lang $l must survive intact")
    }
    by.foreach { case (l, n) =>
      // binomial around min: 4σ bound, σ² ≤ cnt·p(1-p) ≤ min
      val tol = 4 * math.sqrt(minCnt.toDouble)
      assert(math.abs(n - minCnt) <= tol, s"$l: $n vs target $minCnt")
    }
    // determinism + subset-of-corpus
    val again = Corpus.rebalanceGroups(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
    val plan = Corpus.rebalanceGroups(docs)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the join:\n$plan")
  }

  test("prepPipeline: train-only, dedup holds (no shared content), " +
      "chunk counts match the formula") {
    import org.apache.spark.sql.functions.{col, md5}
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = Corpus.prepPipeline(docs, chunkTokens = 32, overlap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val outDocs = out.map(_._1).toSet
    assert(outDocs.nonEmpty && out.length > outDocs.size,
      "pipeline must emit multi-chunk docs")
    val splits = Corpus.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    outDocs.foreach { id =>
      assert(splits(id) == "train", s"doc $id is ${splits(id)}")
    }
    val hashes = docs.filter(col("doc_id").isin(outDocs.toSeq: _*))
      .select(md5(col("text"))).collect().map(_.getString(0))
    assert(hashes.length == hashes.distinct.length,
      "two surviving docs share content — dedup stage broken")
    val toks = TextAnalysis.tokenCounts(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (id, chunks) =>
      val n = toks(id)
      val want = if (n <= 32) 1 else 1 + (n - 32 + 23) / 24
      assert(chunks.length == want, s"doc $id: $n tokens, ${chunks.length}")
    }
  }

  test("prepPipelineV2: quality gate drops failing docs, later stages " +
      "see the redacted text, and the two folded stages add ZERO " +
      "exchanges to the fused plan") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val v2docs = Corpus.prepPipelineV2(docs, chunkTokens = 32, overlap = 8)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(v2docs.nonEmpty)
    // every surviving doc passes the gate (one definition of passes)
    val gatePass = TextAnalysis.qualityGate(
        docs.filter(col("text").isNotNull))
      .filter(col("passes") === 1L)
      .collect().map(_.getLong(0)).toSet
    assert(v2docs.subsetOf(gatePass),
      s"${(v2docs -- gatePass).take(3)} survived v2 but fail the gate")
    // ZERO new exchanges: both new stages are narrow projections
    def exchanges(p: String): Int = "Exchange".r.findAllIn(p).size
    val p1 = Corpus.prepPipeline(docs, 32, 8)
      .queryExecution.executedPlan.toString
    val p2 = Corpus.prepPipelineV2(docs, 32, 8)
      .queryExecution.executedPlan.toString
    assert(exchanges(p2) == exchanges(p1),
      s"v2 added exchanges: v1=${exchanges(p1)} v2=${exchanges(p2)}\n$p2")
    assert(!p2.contains("SortMergeJoin"),
      s"fused v2 plan must not corpus-join:\n$p2")
  }

  test("prepPipelineV2Staged computes the identical relation to the " +
      "inline pipeline (one oracle, two execution shapes)") {
    val stagingDir = java.nio.file.Files
      .createTempDirectory("graft-prep-staged").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val inline = rows(Corpus.prepPipelineV2(docs, 32, 8))
    val staged = rows(Corpus.prepPipelineV2Staged(docs, stagingDir, 32, 8))
    assert(staged == inline)
    assert(inline.nonEmpty, "fixture must produce chunks")
    // the staged table holds the gated, REDACTED corpus
    val stagedDocs = spark.read.parquet(stagingDir)
    assert(stagedDocs.columns.sorted.sameElements(
      Array("doc_id", "lang", "text")))
  }

  test("prepPipelineV2Staged recovers from staging debris: a non-empty " +
      "destination without _SUCCESS (crashed build) is swept and " +
      "rebuilt instead of wedging every call (r18 advice)") {
    val stagingDir = java.nio.file.Files
      .createTempDirectory("graft-prep-debris").toString
    // plant debris: a partial table — parquet fragment, no _SUCCESS
    java.nio.file.Files.write(
      java.nio.file.Paths.get(stagingDir, "part-00000.parquet"),
      Array[Byte](1, 2, 3))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val staged = rows(Corpus.prepPipelineV2Staged(docs, stagingDir, 32, 8))
    assert(staged == rows(Corpus.prepPipelineV2(docs, 32, 8)),
      "debris recovery must rebuild the staged table")
    assert(new java.io.File(stagingDir, "_SUCCESS").exists())
    // and a second call reuses the now-complete table untouched
    val mtime = new java.io.File(stagingDir, "_SUCCESS").lastModified
    assert(rows(Corpus.prepPipelineV2Staged(docs, stagingDir, 32, 8))
      == staged)
    assert(new java.io.File(stagingDir, "_SUCCESS").lastModified == mtime,
      "complete table must not be rebuilt")
  }

  test("splitAssign: exhaustive, deterministic, stable under corpus " +
      "growth, ~80/10/10") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val got = Corpus.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == docs.count())
    val by = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(by.keySet == Set("train", "val", "test"))
    val n = got.size.toDouble
    assert(math.abs(by("train") / n - 0.8) < 0.05, by.toString)
    assert(math.abs(by("val") / n - 0.1) < 0.03, by.toString)
    // stability: the assignment over a SUBSET agrees row-for-row
    val sub = Corpus.splitAssign(docs.limit(200)).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    sub.foreach { case (id, s) => assert(got(id) == s) }
  }
}
