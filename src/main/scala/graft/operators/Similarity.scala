package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force top-k is the exact baseline (O(|Q|·|C|) — fine when the
  * query set is small or as ground truth); the bucketed variant is the
  * scale path: candidates partition into hash buckets, queries probe only
  * their own bucket, so the join fans out per-bucket instead of globally.
  * All arithmetic stays inside Catalyst (`zip_with`/`aggregate` fold —
  * no UDF), keeping whole-stage codegen intact.
  */
object Similarity {

  /** Cosine similarity as an ordered double fold (deterministic
    * accumulation order — reproducible across runs and engines). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Exact cosine top-k: every query row against every candidate row.
    * Output: query_id, neighbor_id, rnk (1-based by similarity desc,
    * neighbor id tiebreak).
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    val scored = q.join(c, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qe"), col("ce")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Seeded random-hyperplane LSH bucket id over `planes` hyperplanes.
    *
    * Plane weights are deterministic Rademacher (±1) entries derived from
    * `md5(seed_plane_dim)` — the classic sign-random-projection family for
    * cosine similarity, but reproducible in ANSI SQL (so the DuckDB oracle
    * computes identical buckets) and free of RNG state. The projection is
    * an INTEGER dot product over fixed-point components
    * (`round(x * 1e6) * ±1`), making the sign decision order-independent
    * and bit-exact across engines — a float fold could flip a
    * near-zero projection between engines.
    */
  /** Rademacher weights of one plane, computed driver-side (the md5 chain
    * is constant per (seed, plane, dim) — embedding it as a literal array
    * keeps the per-row work to one integer fold per plane). Must stay
    * byte-identical to the SQL form
    * `md5(concat(seed, '_', p, '_', d))` used by the oracle. */
  private def planeSignsLocal(seed: String, p: Int, dim: Int): Seq[Long] =
    (1 to dim).map { d =>
      if (graft.model.PortableHash.md5Long60(s"${seed}_${p}_$d") % 2 == 0) 1L
      else -1L
    }

  def signBucket(emb: Column, planes: Int, dim: Int,
      seed: String): Column =
    (0 until planes).map { p =>
      val signs = typedLit(planeSignsLocal(seed, p, dim))
      val dot = aggregate(
        zip_with(emb, signs, (x, s) =>
          round(x.cast("double") * 1000000).cast("long") * s),
        lit(0L), (acc, v) => acc + v)
      when(dot > 0, lit(1L << (planes - 1 - p))).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k with multi-probe: each query searches its own
    * bucket plus every bucket at Hamming distance 1 (`planes + 1` probes),
    * the standard recall-booster that avoids enlarging buckets. Candidates
    * shuffle ONCE on their single bucket id (at scale: write candidates
    * pre-partitioned by bucket and the probe side touches only matching
    * partitions); queries fan out `planes + 1`-fold — never all-pairs.
    */
  def bucketedTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      planes: Int = 4, dim: Int = 64, seed: String = "graft"): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      signBucket(col("embedding"), planes, dim, seed).as("qbucket"))
    val probes = q.withColumn("bucket", explode(array(
      col("qbucket") +: (0 until planes).map(b =>
        col("qbucket").bitwiseXOR(lit(1L << b))): _*)))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"),
      signBucket(col("embedding"), planes, dim, seed).as("bucket"))
    val scored = probes.join(c, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qe"), col("ce")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Cosine near-duplicate flags for explicit pairs (id1, id2). */
  def nearDupPairs(embeddings: DataFrame, pairs: DataFrame,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id1"),
      col("embedding").as("e1"))
    val b = embeddings.select(col("vec_id").as("id2"),
      col("embedding").as("e2"))
    pairs.join(a, "id1").join(b, "id2")
      .select(col("id1"), col("id2"),
        (cosine(col("e1"), col("e2")) > threshold).as("near_dup"))
  }
}
