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

  /** Sign-bit bucket id over the first `planes` dimensions — a random-
    * hyperplane LSH with axis-aligned planes (deterministic; swap in a
    * seeded projection matrix for production). */
  def signBucket(emb: Column, planes: Int = 3): Column =
    (0 until planes).map { p =>
      when(element_at(emb, p + 1) > 0, 1 << (planes - 1 - p)).otherwise(0)
    }.reduce(_ + _).cast("long")

  /** Approximate top-k: queries probe only their own hash bucket. Recall
    * trades against bucket count; at scale candidates are written
    * pre-partitioned by bucket so a probe touches one partition.
    */
  def bucketedTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      planes: Int = 3): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      signBucket(col("embedding"), planes).as("bucket"))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"),
      signBucket(col("embedding"), planes).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
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
