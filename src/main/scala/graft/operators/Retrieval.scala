package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HYBRID retrieval — BM25 lexical candidates fused with embedding-ANN
  * candidates by reciprocal-rank fusion (RRF, Cormack et al. SIGIR '09:
  * `score(d) = Σ_systems 1/(k0 + rank_s(d))`), the standard composition
  * a retrieval-based curation pipeline runs when neither lexical nor
  * semantic evidence alone is trustworthy. The reference (smoltable)
  * has no retrieval surface; this extends the LLM-pipeline family
  * ([[TextAnalysis.bm25TopKMulti]] × [[Clustering]]'s persisted IVF).
  *
  * Everything is INTEGER-exact so the result is hash-stable across
  * engines: both input rankings are integer ranks from already-exact
  * pipelines (BM25's fixed-point quantized scores; the kmeans-IVF's
  * fixed-point squared-L2), and the RRF term is computed as
  * `1000000 div (k0 + rank)` — pure int64 floor division, no float
  * anywhere, identical in any SQL engine.
  *
  * Query anchoring: the fixture queries are TERM LISTS (no query
  * embedding exists), so the semantic system retrieves neighbors of the
  * ANCHOR — the query's top-1 BM25 document — from the PERSISTED
  * kmeans-IVF layout ("more like the best lexical hit"). The anchor
  * probe partition-prunes ([[Clustering.ivfTopKKmeansFromLayout]]:
  * static `cid IN (...)` PartitionFilters off the committed manifest),
  * so the semantic side reads only the probed lists, never the corpus.
  *
  * Plan shape at 100 TB: BM25 is the one-pass kernel pipeline with a
  * broadcast term table; the anchor set is query-count-sized (collected
  * once off the checkpointed BM25 result — the count-gated probe-batch
  * pattern); the ANN side scans only probed `cid=` partitions; fusion
  * is a union of two query-count×k-row frames + one tiny window per
  * query. NO global sort: every ranking is a per-query window.
  */
object Retrieval {

  /** One RRF contribution: `1000000 div (k0 + rank)` — exact int64
    * floor division (DuckDB `//`), monotone in rank. `div` resolves to
    * Catalyst's IntegralDivide through the function registry, so the
    * arithmetic is integer end to end (no IEEE quotient anywhere). */
  def rrfTerm(rnk: Column, k0: Long = DefaultRrfK0): Column =
    call_function("div", lit(1000000L), lit(k0) + rnk)

  /** The conventional RRF dampener (k0 = 60, from the original paper);
    * scaled by 10^6 into int64 so rank reciprocals stay exact. */
  val DefaultRrfK0: Long = 60L

  /** Fuse two integer rankings `(query_id, doc_id, rnk)` by RRF:
    * per-(query, doc) sum of [[rrfTerm]]s over the systems that
    * returned it, re-ranked per query by `(score DESC, doc_id)`. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int,
      k0: Long = DefaultRrfK0): DataFrame = {
    require(k > 0 && k0 >= 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    a.select(col("query_id"), col("doc_id"), col("rnk"))
      .unionAll(b.select(col("query_id"), col("doc_id"), col("rnk")))
      .select(col("query_id"), col("doc_id"),
        rrfTerm(col("rnk"), k0).as("c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rnk"))
  }

  /** Hybrid top-k with EXPLICIT query vectors — the RAG shape, where
    * the caller has an embedding for each query (an encoder ran on the
    * query text): the semantic system is the persisted-IVF top-k of
    * the query's OWN vector, no anchor derivation. `queryVectors` is
    * `(query_id, embedding)` — `query_id` must match the term table's
    * and be disjoint from corpus `vec_id`s or self-matches are the
    * caller's intent. Fusion and exactness identical to
    * [[hybridTopK]]. */
  def hybridTopKWithVectors(docs: DataFrame, queries: DataFrame,
      queryVectors: DataFrame, layoutDir: String, k: Int = 10,
      nprobe: Int = 2, k0: Long = DefaultRrfK0): DataFrame = {
    require(k > 0 && nprobe > 0)
    val lex = TextAnalysis.bm25TopKMulti(docs, queries, k)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    val sem = Clustering.ivfTopKKmeansFromLayout(layoutDir,
        queryVectors.select(col("query_id").as("vec_id"),
          col("embedding")), nprobe, k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk"))
    rrfFuse(lex, sem, k, k0)
  }

  /** Hybrid top-k: BM25 candidates ([[TextAnalysis.bm25TopKMulti]] over
    * `queries` = `(query_id, term)` rows) RRF-fused with the persisted
    * kmeans-IVF neighbors of each query's top-1 BM25 anchor.
    * `embeddings` supplies the anchor vectors (`vec_id` aligned with
    * `doc_id`); `layoutDir` is a committed
    * [[Clustering.writeKmeansIvfLayout]] directory. Queries with no
    * BM25 hit at all return no rows (no anchor, no evidence). */
  def hybridTopK(docs: DataFrame, queries: DataFrame,
      embeddings: DataFrame, layoutDir: String, k: Int = 10,
      nprobe: Int = 2, k0: Long = DefaultRrfK0): DataFrame = {
    val (lex, sem) = hybridRankings(docs, queries, embeddings,
      layoutDir, k, nprobe)
    rrfFuse(lex, sem, k, k0)
  }

  /** The two rankings [[hybridTopK]] fuses, as separate frames
    * (`query_id`, `doc_id`, `rnk` each) — split out (round 19) so the
    * SQL door can run the RRF fusion as SQL TEXT over them while the
    * candidate systems stay the audited kernel pipelines. */
  def hybridRankings(docs: DataFrame, queries: DataFrame,
      embeddings: DataFrame, layoutDir: String, k: Int = 10,
      nprobe: Int = 2): (DataFrame, DataFrame) = {
    require(k > 0 && nprobe > 0)
    // materialized: reused as the anchor source (driver-collected,
    // query-count-sized) and as the lexical fusion input — one
    // execution, deterministic both uses
    val lex = TextAnalysis.bm25TopKMulti(docs, queries, k)
      .select(col("query_id"), col("doc_id"), col("rnk"))
      .localCheckpoint(true)
    val anchorOf = lex.filter(col("rnk") === 1)
      .select(col("query_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    if (anchorOf.isEmpty)
      return (lex, lex.sparkSession.createDataFrame(
        lex.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rnk",
            org.apache.spark.sql.types.LongType)))))
    val anchorIds = anchorOf.map(_._2).distinct
    // the anchor vectors probe the persisted layout; the isin predicate
    // pushes to the embeddings scan (anchor set is query-count-sized)
    val aq = embeddings.filter(col("vec_id").isin(anchorIds: _*))
      .select(col("vec_id"), col("embedding"))
    val ann = Clustering.ivfTopKKmeansFromLayout(layoutDir, aq,
      nprobe, k)
    // anchor neighbors mapped back to the queries they anchor (a tiny
    // broadcast local relation: query-count rows)
    val spark = docs.sparkSession
    import spark.implicits._
    val aMap = broadcast(anchorOf.toDF("query_id", "anchor_id"))
    // rename dodges the query_id name clash between the two rankings
    val annR = ann.select(col("query_id").as("anchor_id_r"),
      col("neighbor_id").as("doc_id"), col("rnk"))
    val semRank = aMap.join(annR, col("anchor_id") === col("anchor_id_r"))
      .select(col("query_id"), col("doc_id"), col("rnk"))
    (lex, semRank)
  }
}
