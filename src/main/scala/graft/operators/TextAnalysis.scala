package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. Pure Catalyst
  * expressions throughout (codegen-friendly, no UDFs).
  */
object TextAnalysis {

  /** Small stopword lexicons for n-gram-free language scoring. Extend per
    * deployment; kept deliberately tiny so scoring is explainable. */
  val DefaultLexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "de", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "de", "es", "un", "una"))

  /** Language ID via stopword hits: per-language hit counts + argmax
    * (ties and all-zero scores → "und").
    *
    * SHUFFLE-FREE: the counts come from the one-pass
    * [[graft.functions.LexiconHits]] kernel, so the whole operator is
    * a narrow projection — the composed form it replaced exploded the
    * corpus's entire token stream through a `groupBy(doc_id)` exchange
    * (at 100 TB: the scan multiplied by mean tokens/doc) to produce
    * five integers per document. Null-text docs are filtered to match
    * the composed form exactly (its `explode(split(lower(NULL)))`
    * dropped them); [[composedLangId]] is retained as the
    * differential-spec reference. */
  def langId(docs: DataFrame, lexicons: Map[String, Seq[String]] = DefaultLexicons,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val langs = lexicons.keys.toSeq.sorted
    val sig = graft.functions.LexiconHits(col(textCol),
      langs.map(l => l -> lexicons(l)))
    val hits = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id") +:
        sig.getField("n_tokens").as("n_tokens") +:
        langs.map(l => sig.getField(s"${l}_hits").as(s"${l}_hits")): _*)
    val best = langs.map(l => struct(col(s"${l}_hits").as("h"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("h") > a.getField("h"), b).otherwise(a))
    hits.withColumn("predicted_lang",
      when(best.getField("h") > 0, best.getField("l")).otherwise("und"))
  }

  /** The explode + groupBy formulation [[langId]]'s kernel replaced —
    * retained ONLY as the differential-spec reference. */
  private[operators] def composedLangId(docs: DataFrame,
      lexicons: Map[String, Seq[String]] = DefaultLexicons,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))
    val langs = lexicons.keys.toSeq.sorted
    val hits = toks.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      langs.map(l => sum(when(col("tok").isin(lexicons(l): _*), 1)
        .otherwise(0)).as(s"${l}_hits")): _*)
    val best = langs.map(l => struct(col(s"${l}_hits").as("h"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("h") > a.getField("h"), b).otherwise(a))
    hits.withColumn("predicted_lang",
      when(best.getField("h") > 0, best.getField("l")).otherwise("und"))
  }

  /** Quality features: char/token/punctuation counts and mean token
    * length. Single narrow projection — no shuffle at all. */
  def qualityFeatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // count-only: the SplitCount kernel avoids materializing a boxed
    // token array per doc (≡ size(split(text, " ")), long)
    val nTok = graft.functions.SplitCount(col(textCol), bySpaceOnly = true)
    docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      nTok.as("n_tokens"),
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "[.!?,;:]", "")))
        .cast("long").as("n_punct"),
      (length(col(textCol)).cast("double") / nTok.cast("double"))
        .as("mean_token_len"))
  }

  /** Whitespace token count + a BPE-ish regex token count (letters runs,
    * digit runs, single punctuation marks — the usual pre-tokenizer
    * shape). */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.SplitCount(trim(col(textCol)), bySpaceOnly = false)
        .as("ws_tokens"),
      // ≡ regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]") — one
      // byte walk instead of the regex engine (kernel differential in
      // OperatorsSpec)
      graft.functions.BpeishTokenCount(col(textCol))
        .as("bpe_ish_tokens"))

  /** Whitespace-normalized content fingerprint (md5-based 60-bit). Two
    * docs differing only in whitespace share a fingerprint.
    * One-pass kernel since r17: lowercase once, stream the bytes into
    * the digest collapsing `\s` runs as they pass — no normalized
    * intermediate string, no regex engine ([[composedFingerprint]]
    * retained as the differential reference). */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.NormalizedFingerprint(col(textCol))
        .as("fingerprint"))

  /** The lower + regexp_replace + hex-md5 chain [[fingerprint]]'s
    * kernel replaced — retained ONLY as the differential reference. */
  private[operators] def composedFingerprint(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      Dedup.md5Hash60(
        regexp_replace(lower(col(textCol)), "\\s+", " "))
        .as("fingerprint"))

  /** Repetition / boilerplate signals — the standard heuristics for
    * spotting templated or machine-generated text: the distinct-token
    * ratio (low → heavy word reuse) and the count of the most repeated
    * word trigram (high → boilerplate blocks). One explode + one
    * per-(doc, trigram) aggregate + one per-doc aggregate — two
    * shuffles on doc-sized keys, nothing pairwise, nothing global.
    * Ratios are exact-integer divisions done once in double, so the
    * values are cross-engine deterministic.
    */
  def repetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // SHUFFLE-FREE: all three signals are per-document, computed by
    // the one-pass [[graft.functions.RepetitionSignals]] kernel — the
    // composed form (retained as [[composedRepetition]] for the
    // differential spec) ran three exchanges and a join, the widest
    // carrying one row per corpus TRIGRAM. Null-text docs filtered to
    // match its explode-drop exactly.
    val sig = graft.functions.RepetitionSignals(col(textCol))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        sig.getField("n_tokens").as("n_tokens"),
        (sig.getField("n_distinct").cast("double") /
          sig.getField("n_tokens").cast("double")).as("distinct_ratio"),
        sig.getField("max_trigram_count").as("max_trigram_count"))
  }

  /** The explode + 3-exchange formulation [[repetition]]'s kernel
    * replaced — retained ONLY as the differential-spec reference. */
  private[operators] def composedRepetition(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // ONE trigram construction for the whole library: Corpus.wordNgrams
    // (same tokenization the decontamination oracle is pinned to)
    val triStats = Corpus
      .wordNgrams(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("text")), 3, "doc_id", "text")
      .groupBy("doc_id", "ngram")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("max_trigram_count"))
    val tokStats = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count_distinct(col("tok")).as("n_distinct"))
    tokStats.join(triStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_ratio"),
        coalesce(col("max_trigram_count"), lit(0L))
          .as("max_trigram_count"))
  }

  /** Per-document top-k terms by TF-IDF — the classic "what is this
    * document about" signal a curation pipeline uses for topic mixing
    * and near-duplicate triage.
    *
    * Determinism across engines (the oracle gate) dictates the scoring
    * form: `score = (tf * N) / df` computed as ONE exact integer
    * product cast to double and ONE IEEE division — both engines round
    * each identically, where a `ln`-based idf would hang the result on
    * libm ulp differences. The ranking this induces is the same as
    * classic tf·idf without smoothing (monotone in tf/df); ties break
    * on the term string ascending, so the top-k set is unique.
    *
    * Shuffle shape at 100 TB (audited via `tools/Explain`):
    *  1. explode(tokens) → partial-count → exchange on (doc, term) —
    *     map-side combined;
    *  2. term-level document frequency — a SECOND corpus pass (the
    *     optimizer prunes the tf count from this branch, so the
    *     exchange is not reusable), partial-DISTINCT combined map-side,
    *     then a vocabulary-sized exchange on term; the df table joins
    *     back as a BROADCAST (plan-pinned at sf0.01; AQE picks it
    *     whenever the vocabulary fits). Two passes is DELIBERATE: the
    *     one-pass alternative — `count().over(Window.partitionBy
    *     (term))` — shuffles the entire (doc, term) table on term,
    *     sending every ("the", doc) row to one reducer: stopword skew
    *     by construction. Double-scanning and broadcasting the
    *     vocabulary is the skew-safe trade at any corpus size (cache
    *     the input upstream if the scan itself is the bottleneck);
    *  3. per-doc top-k — rank window on doc, planned as
    *     `WindowGroupLimit` (partial before the exchange, final after)
    *     so each task keeps k rows per doc before the shuffle.
    * The integer product `tf * n_docs` stays exact under 2^53
    * (tf ≤ doc length, so safe for any real corpus + shard count).
    * `n_docs` is one `count()` action returning a single long to the
    * driver — the same bounded-collect class as the adaptive-IVF
    * geometry derivation, not a data collect.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // null/empty-text docs contribute no terms, so they must not count
    // toward N either — otherwise every score silently scales by the
    // junk-row count. Filtered HERE (not left to the caller) so the
    // operator's N always matches the corpus its terms came from.
    // NOTE: computing N is an EAGER count() action at construction
    // time (one long to the driver) — the one non-lazy step in this
    // operator's API.
    val d = docs.filter(col(textCol).isNotNull)
    // (doc, term, tf) as a NARROW projection: the one-pass TermCounts
    // kernel folds each doc's frequencies locally, so the explode
    // yields per-doc-unique term rows with no groupBy(doc, term)
    // exchange (r17; previously the widest shuffle here — one row per
    // corpus TOKEN). df counts those rows per term exactly as it
    // counted the groupBy output; the top-k window below is bounded
    // to k rows/doc pre-exchange by WindowGroupLimit.
    val tf = d
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TermCounts(col(textCol)))
          .as(Seq("term", "tf")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = d.select(col(idCol)).distinct().count()
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("score",
        (col("tf") * lit(n)).cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rnk"))
  }

  /** BM25-style top-k document relevance for a fixed query-term list —
    * the retrieval scorer a curation pipeline uses to mine topical
    * subsets ("find the k docs most about X") without an external
    * index.
    *
    * Cross-engine exactness dictates a RATIONAL variant of BM25
    * (k1 = 6/5, b = 3/4 — the classic dials as exact rationals, and a
    * ratio idf instead of the `ln` form, which would hang scores on
    * libm ulp differences):
    *
    *   idf(t)    = (2·D − 2·df + 1) / (2·df + 1)
    *   tfpart(t) = 22·tf·T / (10·T·tf + 3·T + 9·dl·D)
    *   score     = Σ_t idf(t) · tfpart(t)      (fixed term order)
    *
    * where the tfpart fraction is tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with avgdl = T/D cleared of nested divisions: numerator and
    * denominator are each ONE exact int64 product/sum, so the score is
    * a fixed-order chain of correctly-rounded IEEE divides/multiplies/
    * adds — bit-identical in any engine. Both idf and tfpart are
    * monotone the same way as the `ln` forms, so rankings track
    * textbook BM25. Overflow bound: `10·T·tf` needs T·tf < 9.2×10^17 —
    * safe to ~10^13 corpus tokens × 10^4 per-doc tf.
    *
    * D and T count docs/tokens among docs with ≥1 token (empty docs
    * can't match anyway). Docs with no query term are excluded (their
    * score is exactly 0).
    *
    * Shape at 100 TB: the per-doc (dl, tf...) frame is a NARROW
    * PROJECTION — one pass of the [[graft.functions.TermHits]] kernel
    * per document (r17; the explode → groupBy(doc) exchange it
    * replaced is retained as [[composedBm25TopK]] for the differential
    * spec) — then ONE 1-row global stats aggregate broadcast back,
    * top-k planned as `TakeOrderedAndProject` (per-partition k, never
    * a global sort). Nothing in the plan carries per-token rows. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 25,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms && k > 0)
    val sig = graft.functions.TermHits(col(textCol), queryTerms)
    // dl > 0 reproduces the composed form exactly: a doc with no
    // non-empty token produced no explode row, hence no perDoc row
    val perDoc = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id") +: sig.getField("dl").as("dl") +:
        queryTerms.indices.map(i =>
          sig.getField(s"tf_$i").as(s"tf_$i")): _*)
      .filter(col("dl") > 0L)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("tt") +: queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))): _*)
    val score = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i"); val df = col(s"df_$i")
      val idf =
        (lit(2L) * col("n_docs") - lit(2L) * df + lit(1L)).cast("double") /
          (lit(2L) * df + lit(1L)).cast("double")
      val tfp = (lit(22L) * tf * col("tt")).cast("double") /
        (lit(10L) * col("tt") * tf + lit(3L) * col("tt") +
          lit(9L) * col("dl") * col("n_docs")).cast("double")
      idf * tfp
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .filter(queryTerms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("dl"), col("score"))
  }

  /** The explode + groupBy per-doc stage [[bm25TopK]]'s kernel
    * replaced — retained ONLY as the differential-spec reference. */
  private[operators] def composedBm25TopK(docs: DataFrame,
      queryTerms: Seq[String], k: Int = 25,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms && k > 0)
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    val perDoc = toks.groupBy("doc_id").agg(
      count(lit(1)).as("dl"),
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$i")
      }: _*)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("tt") +: queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))): _*)
    val score = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i"); val df = col(s"df_$i")
      val idf =
        (lit(2L) * col("n_docs") - lit(2L) * df + lit(1L)).cast("double") /
          (lit(2L) * df + lit(1L)).cast("double")
      val tfp = (lit(22L) * tf * col("tt")).cast("double") /
        (lit(10L) * col("tt") * tf + lit(3L) * col("tt") +
          lit(9L) * col("dl") * col("n_docs")).cast("double")
      idf * tfp
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .filter(queryTerms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("dl"), col("score"))
  }

  /** MULTI-QUERY BM25 — [[bm25TopK]] generalized to a `(query_id,
    * term)` QUERY TABLE: one pass over the token stream scores every
    * query at once (the retrieval-evaluation / batched-search shape),
    * instead of one corpus scan per query.
    *
    * Determinism engineering (the difference from the single-query
    * row): per-(query, doc) scores here SUM OVER ROWS, and a float sum
    * over an unordered aggregate is partition-order-dependent — so
    * each per-term score is QUANTIZED first: idf and the tf part are
    * each one correctly-rounded IEEE division of exact int64 counts
    * (both < 2^53 — exactness documented below), scaled by 10^6 and
    * floored to int64, and the per-term products then SUM EXACTLY in
    * any order. `score_q` is that fixed-point integer (units 10^-12 of
    * the rational score); ranking ties break to the smaller doc_id.
    * Exactness bound: per-term numerators stay < 2^53 while
    * `22 · tf · total_tokens` does — past ~4·10^14 total corpus tokens
    * shard the stats (the meanPool-class documented bound).
    *
    * Shape at 100 TB: one explode; ONE corpus exchange (the per-doc
    * length aggregate); the query table BROADCASTS onto the token
    * stream so only matching (term, query) rows survive into the
    * small keyed aggregates; per-query top-k is a rank window over
    * per-query candidates (WindowGroupLimit pushes the k cut
    * map-side). Nothing corpus-sized joins shuffled. */
  def bm25TopKMulti(docs: DataFrame, queries: DataFrame, k: Int = 25,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0)
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    // dl from the one-pass TermHits kernel (empty term list → just dl):
    // the exchange feeding the perDoc join then carries ONE row per doc
    // instead of the full token stream the explode → groupBy paid (the
    // matched-token path below was already broadcast-pruned); dl > 0
    // reproduces the explode's empty-doc exclusion
    val perDoc = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        graft.functions.TermHits(col(textCol), Seq.empty)
          .getField("dl").as("dl"))
      .filter(col("dl") > 0L)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("tt"))
    val q = queries.select(col("query_id"), col("term")).distinct()
    val qtf = toks.join(broadcast(q), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // one row per (query, term, matching doc) ⇒ count(*) IS the df
    val dfs = qtf.groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("df"))
    def fx6(x: Column): Column = floor(x * lit(1000000.0d) + lit(0.5d))
    val idfQ = fx6(
      (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L))
        .cast("double") /
        (lit(2L) * col("df") + lit(1L)).cast("double"))
    val tfpQ = fx6(
      (lit(22L) * col("tf") * col("tt")).cast("double") /
        (lit(10L) * col("tt") * col("tf") + lit(3L) * col("tt") +
          lit(9L) * col("dl") * col("n_docs")).cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
    qtf.join(perDoc, Seq("doc_id"))
      .join(broadcast(dfs), Seq("query_id", "term"))
      .crossJoin(broadcast(stats))
      .withColumn("term_q", (idfQ * tfpQ).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(first(col("dl")).as("dl"), sum(col("term_q")).as("score_q"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("dl"),
        col("score_q"), col("rnk"))
  }

  /** Union of the per-language lexicons, sorted — the default stopword
    * list for [[qualityGate]]'s "contains real function words" rule. */
  val DefaultStopwords: Seq[String] =
    DefaultLexicons.values.flatten.toSeq.distinct.sorted

  /** Gopher-style rule-based quality gate — the standard pre-training
    * document filter (Rae et al. 2021 §A1.1 shape): token-count bounds,
    * mean-token-length bounds, symbol-to-token ratio, distinct-token
    * ratio (repetition), and a minimum stopword occurrence count. Emits
    * every signal plus the 0/1 verdict so downstream policy (drop vs
    * quarantine vs reweight) stays a filter over this frame, not a
    * rescan.
    *
    * Shape at 100 TB: ONE narrow shuffle-free projection — all five
    * rules compute per row from `split` + array builtins
    * (`array_distinct`, `filter`, `regexp_replace`), codegen'd, no
    * explode, no groupBy, no UDF. Chains directly onto the scan like
    * [[piiScan]].
    *
    * Determinism: every ratio is one IEEE division of two exact int64
    * counts, so the oracle reproduces values bit-for-bit. The stopword
    * rule counts OCCURRENCES (not distinct hits) — `filter` + `size`,
    * identical in both engines, where distinct-intersection builtins
    * differ on dedup order across engines.
    */
  /** The five quality signals of [[qualityGate]] as column expressions
    * over a text column — ONE definition shared by the gate and the
    * fused prep pipeline ([[Corpus.prepPipelineV2]]), so the two can
    * never drift. Zero-token docs: ratios pinned to 0.0 explicitly —
    * engine-default divide-by-zero diverges (Spark non-ANSI → NULL,
    * DuckDB → inf/NaN per ieee_floating_point_ops), and a pinned value
    * keeps the telemetry columns oracle-exact. */
  private[operators] final case class QualitySignals(
      nTokens: Column, meanTokenLen: Column, symbolRatio: Column,
      distinctRatio: Column, stopwordHits: Column)

  private[operators] def qualitySignals(text: Column,
      stopwords: Seq[String] = DefaultStopwords): QualitySignals = {
    // ONE single-pass kernel evaluation per row: the five signals are
    // fields of the same struct expression, so codegen subexpression
    // elimination collapses every reference below to one tokenization
    // (the composed form re-tokenized ~10x — see the kernel scaladoc)
    val sig = graft.functions.QualitySignalsExpr(text, stopwords)
    val nTok = sig.getField("n_tokens")
    def ratio(num: Column): Column =
      when(nTok === 0L, lit(0.0))
        .otherwise(num.cast("double") / nTok.cast("double"))
    QualitySignals(nTok, ratio(sig.getField("n_chars")),
      ratio(sig.getField("n_sym")), ratio(sig.getField("n_distinct")),
      sig.getField("n_stop"))
  }

  /** The composed-builtin formulation [[qualitySignals]]'s kernel
    * replaced — retained ONLY as the differential-spec reference
    * (OperatorsSpec pins kernel ≡ composed on the fixture corpus plus
    * adversarial unicode/whitespace edges). */
  private[operators] def composedQualitySignals(text: Column,
      stopwords: Seq[String] = DefaultStopwords): QualitySignals = {
    val toks = filter(split(text, " "), t => t =!= "")
    val nTok = size(toks).cast("long")
    // total non-whitespace chars: exact however many spaces separate
    val nChars = length(regexp_replace(text, "\\s+", "")).cast("long")
    val nSym = (length(text) -
      length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    def ratio(num: Column): Column =
      when(nTok === 0L, lit(0.0))
        .otherwise(num.cast("double") / nTok.cast("double"))
    QualitySignals(nTok, ratio(nChars), ratio(nSym), ratio(nDistinct),
      nStop)
  }

  /** The [[qualityGate]] verdict as one reusable BOOLEAN column — same
    * five rules, same pinned zero-token semantics. NULL text yields
    * NULL (filters drop it, matching the gate's text-not-null
    * precondition). */
  def qualityPasses(text: Column,
      minTokens: Long = 10L, maxTokens: Long = 100000L,
      minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0,
      maxSymbolRatio: Double = 0.25, minDistinctRatio: Double = 0.3,
      minStopwordHits: Long = 1L,
      stopwords: Seq[String] = DefaultStopwords): Column = {
    val s = qualitySignals(text, stopwords)
    s.nTokens >= minTokens && s.nTokens <= maxTokens &&
      s.meanTokenLen >= minMeanTokLen &&
      s.meanTokenLen <= maxMeanTokLen &&
      s.symbolRatio <= maxSymbolRatio &&
      s.distinctRatio >= minDistinctRatio &&
      s.stopwordHits >= minStopwordHits
  }

  /** Gate `docs` by [[qualityPasses]]' five rules, dropping null-text
    * rows (the gate's text-not-null precondition). Plan-equivalent to
    * `filter(text.isNotNull && qualityPasses(text))` — an r21
    * measurement note for anyone tempted to "hoist the kernel into a
    * projection": the optimizer pushes the filter back through any
    * signal-struct projection and re-inlines the kernel references, so
    * the executed plan (and, measured at sf0.1, the runtime — codegen
    * subexpression elimination collapses the references) is identical
    * either way. One shared definition so call sites cannot drift. */
  def gateByQuality(docs: DataFrame, textCol: String = "text",
      stopwords: Seq[String] = DefaultStopwords): DataFrame =
    docs.filter(col(textCol).isNotNull &&
      qualityPasses(col(textCol), stopwords = stopwords))

  def qualityGate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Long = 10L, maxTokens: Long = 100000L,
      minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0,
      maxSymbolRatio: Double = 0.25, minDistinctRatio: Double = 0.3,
      minStopwordHits: Long = 1L,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val s = qualitySignals(col(textCol), stopwords)
    docs.select(col(idCol).as("doc_id"),
        s.nTokens.as("n_tokens"),
        s.meanTokenLen.as("mean_token_len"),
        s.symbolRatio.as("symbol_ratio"),
        s.distinctRatio.as("distinct_ratio"),
        s.stopwordHits.as("stopword_hits"))
      .withColumn("passes",
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("mean_token_len") >= minMeanTokLen &&
          col("mean_token_len") <= maxMeanTokLen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("distinct_ratio") >= minDistinctRatio &&
          col("stopword_hits") >= minStopwordHits).cast("long"))
  }

  /** PII patterns shared by detection and redaction. Deliberately
    * restricted to constructs Java regex (Spark) and RE2 (DuckDB,
    * Go/Rust scanners) interpret identically — character classes,
    * bounded repetition, `\b` — no backreferences, no lookaround: the
    * counts must be engine-independent for the oracle gate AND so a
    * redaction decision replays identically wherever the pipeline
    * reruns. Extend the map per deployment. */
  val DefaultPiiPatterns: Seq[(String, String, String)] = Seq(
    // (name, regex, replacement) — applied IN ORDER for redaction, so
    // overlapping classes (digits inside an email local part) resolve
    // deterministically: email first consumes its whole match
    ("emails", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("phones", "\\b[0-9]{3}-[0-9]{4}\\b", "<PHONE>"))

  /** PII detection + redaction signals: per-doc match counts for each
    * pattern class and the post-redaction length — the step a
    * training-data pipeline runs between quality filtering and
    * packing (raw PII must not reach the tokenizer).
    *
    * Shape at 100 TB: one narrow projection per document, no shuffle,
    * no UDF — `regexp_count`/`regexp_replace` are codegen'd Catalyst
    * expressions, so the scan streams through whole-stage codegen and
    * the regex cost is the only cost. Counts rather than boolean flags
    * so downstream policy (drop vs redact vs quarantine by density)
    * stays a filter, not a rescan. */
  /** The redacted text as one reusable column expression — the ordered
    * `regexp_replace` fold shared by [[piiScan]], [[piiRedact]], and
    * the fused prep pipeline ([[Corpus.prepPipelineV2]]): one
    * definition of "redacted". */
  def redactedText(text: Column,
      patterns: Seq[(String, String, String)] = DefaultPiiPatterns): Column =
    patterns.foldLeft(text) {
      case (c, (_, re, repl)) => regexp_replace(c, re, repl)
    }

  def piiScan(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      patterns: Seq[(String, String, String)] = DefaultPiiPatterns): DataFrame = {
    val redacted = redactedText(col(textCol), patterns)
    docs.select(col(idCol).as("doc_id") +:
      patterns.map { case (name, re, _) =>
        regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$name")
      } :+ length(redacted).cast("long").as("n_chars_redacted"): _*)
  }

  /** PII redaction proper: the redacted text itself — the one column a
    * training pipeline actually feeds to the tokenizer ([[piiScan]]
    * reports the telemetry; this emits the payload). Same ordered
    * `regexp_replace` fold, so overlap resolution is identical:
    * patterns apply IN ORDER and an earlier pattern consumes its whole
    * match (digits inside an email local part redact as `<EMAIL>`,
    * never a second time as `<PHONE>`).
    *
    * Shape at 100 TB: one narrow codegen'd projection, no shuffle —
    * chains directly onto the quality-filter scan. */
  def piiRedact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      patterns: Seq[(String, String, String)] = DefaultPiiPatterns): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      redactedText(col(textCol), patterns).as("text_redacted"))
}
