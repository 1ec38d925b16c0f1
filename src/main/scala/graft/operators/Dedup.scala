package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora.
  *
  * All hash functions are md5-derived (no JVM-specific hashing) so results
  * are reproducible across engines and languages — which is also what makes
  * them oracle-verifiable. Scale notes: every operator here is a
  * shuffle-on-key pipeline (group by doc / band / hash); nothing collects to
  * the driver, and candidate generation is band-bucketed so the quadratic
  * pair space is never materialized globally.
  */
object Dedup {

  /** 60-bit positive hash from md5 (portable across engines). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact dedup by content hash: one surviving doc id per distinct text,
    * plus the duplicate count. `groupBy(hash)` — a single shuffle on the
    * hash, no pairwise work.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Character shingles of length `n` (positions exploded). `dedup = false`
    * keeps duplicate (doc, shingle) pairs — harmless under idempotent
    * aggregates like `min`, and skips a full shuffle of the exploded rows.
    */
  def shingles(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text", dedup: Boolean = true): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .select(col("doc_id"),
        explode(sequence(lit(1),
          greatest(length(col("text")) - (n - 1), lit(1)))).as("i"),
        col("text"))
      .select(col("doc_id"), expr(s"substring(text, i, $n)").as("sh"))
    if (dedup) exploded.distinct() else exploded
  }

  /** MinHash signatures: `k` hash functions derived from ONE md5 per
    * shingle via XOR seeding (the standard k-permutations-from-one-hash
    * trick), min-aggregated per document. Output: doc_id, m1..mk.
    */
  def minhashSignatures(shingleDf: DataFrame, seeds: Seq[Long]): DataFrame = {
    val base = shingleDf.withColumn("h0", md5Hash60(col("sh")))
    base.groupBy("doc_id").agg(
      seeds.zipWithIndex.map { case (seed, i) =>
        min(expr(s"h0 ^ ${seed}L")).as(s"m${i + 1}")
      }.head,
      seeds.zipWithIndex.tail.map { case (seed, i) =>
        min(expr(s"h0 ^ ${seed}L")).as(s"m${i + 1}")
      }: _*)
  }

  val DefaultSeeds: Seq[Long] =
    Seq(0L, 0x5deece66dL, 0x9e3779b97f4aL, 0x2545f4914f6cdd1dL)

  /** LSH banding: signature columns grouped into bands of `rowsPerBand`;
    * docs sharing any band become candidate pairs (id1 < id2). The join is
    * on the band key — a shuffle join over small buckets, never an all-pairs
    * product.
    */
  def lshCandidates(signatures: DataFrame, rowsPerBand: Int): DataFrame = {
    val sigCols = signatures.columns.filter(_.startsWith("m"))
    // one explode over an array of band keys — a union of per-band selects
    // would re-execute the whole signature pipeline once per band
    val bandExprs = sigCols.grouped(rowsPerBand).zipWithIndex.map {
      case (cols, bi) =>
        concat_ws("_", lit(bi.toString) +: cols.map(col): _*)
    }.toSeq
    // persist: the self-join would otherwise execute the whole
    // shingle->hash->minhash pipeline TWICE (no exchange reuse across a
    // broadcast side; localCheckpoint measurably fails to dedup across
    // that boundary — 3.2s vs 0.8s at sf0.1). Deliberate tradeoff: the
    // cache entry outlives this call (nobody can unpersist a frame the
    // result still depends on), but bands are 2 small rows per doc,
    // MEMORY_AND_DISK evicts LRU under pressure, and callers running many
    // pipelines can spark.catalog.clearCache() between them; at cluster
    // scale write bands to a temp table instead.
    val bands = signatures.select(col("doc_id"),
        explode(array(bandExprs: _*)).as("band"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** Convenience: shingle → minhash → LSH candidate pairs. Shingles are NOT
    * deduplicated first — `min` is idempotent, so the result is identical
    * and the exploded shingle stream reaches the per-doc aggregation with
    * map-side partial mins instead of paying a distinct shuffle first.
    */
  def minhashCandidates(docs: DataFrame, shingleLen: Int = 8,
      seeds: Seq[Long] = DefaultSeeds, rowsPerBand: Int = 2): DataFrame =
    lshCandidates(
      minhashSignatures(shingles(docs, shingleLen, dedup = false), seeds),
      rowsPerBand)

  /** SimHash over distinct word tokens: per-bit majority vote of
    * md5-derived token hashes. `nBits` ≤ 60. Near-dup detection then
    * compares fingerprints by hamming distance ([[hammingDistance]]).
    */
  def simhash(docs: DataFrame, nBits: Int = 60, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .distinct()
      .select(col("doc_id"), md5Hash60(col("tok")).as("th"))
    toks
      .select(col("doc_id"), col("th"),
        explode(sequence(lit(0), lit(nBits - 1))).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(when(expr("shiftright(th, bit) & 1") === 1, 1).otherwise(-1))
        .as("sgn"))
      .groupBy("doc_id")
      .agg(sum(when(col("sgn") > 0,
          expr("cast(shiftleft(cast(1 as bigint), bit) as bigint)"))
        .otherwise(0L)).cast("long").as("simhash"))
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Token-set Jaccard for candidate pairs `(id1, id2)`: integer
    * intersection/union counts (exact, no floating point). Used to verify
    * LSH candidates; the pair list bounds the work.
    */
  def jaccardCounts(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dt = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .distinct()
    val x = dt.select(col("doc_id").as("id1"), col("tok"))
    val y = dt.select(col("doc_id").as("id2"), col("tok"))
    val inter = pairs.join(x, "id1").join(y, Seq("id2", "tok"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("intersection"))
    val sizes = dt.groupBy("doc_id").agg(count(lit(1)).as("n"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("n", "n1"), "id1")
      .join(sizes.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("n", "n2"), "id2")
      .join(inter, Seq("id1", "id2"), "left")
      .select(col("id1"), col("id2"),
        coalesce(col("intersection"), lit(0L)).as("intersection"),
        (col("n1") + col("n2") - coalesce(col("intersection"), lit(0L)))
          .as("union_size"))
  }
}
