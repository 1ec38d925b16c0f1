package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Dedup.connectedComponents]] — cluster formation from pairwise
  * near-dup evidence. The chain cases matter: label propagation would
  * need diameter rounds; large-star/small-star must converge fast and
  * still root every node at the component minimum.
  */
class ConnectedComponentsSpec extends SparkSuite {

  // driverEdgeLimit = 0 forces the DISTRIBUTED star loop — the path with
  // convergence risk; the driver union-find path is covered by the
  // strategy differential and the default-path minhash test below.
  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("id1", "id2")
    Dedup.connectedComponents(df, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two separate clusters root at their minima") {
    val m = comps(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("transitive closure joins indirect pairs (A~B, B~C => one cluster)") {
    // A~C never a candidate pair; cluster must still be {1,2,3}.
    val m = comps(Seq((2L, 3L), (1L, 2L)))
    assert(m.values.toSet == Set(1L))
    assert(m.keySet == Set(1L, 2L, 3L))
  }

  test("long chain converges (diameter >> round count)") {
    val n = 64L
    val chain = (1L until n).map(i => (i, i + 1))
    val m = comps(chain)
    assert(m.size == n)
    assert(m.values.toSet == Set(1L))
  }

  test("orientation, duplicates and self-pairs are normalized away") {
    val m = comps(Seq((5L, 4L), (4L, 5L), (4L, 4L), (5L, 5L), (6L, 5L)))
    assert(m == Map(4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("empty pair set yields empty output") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.connectedComponents(empty).count() == 0L)
  }

  test("star with high-id hub roots at the minimum leaf") {
    // hub 100 connected to 1..5: component min is 1, not the hub.
    val m = comps((1L to 5L).map(i => (100L, i)))
    assert(m.values.toSet == Set(1L))
    assert(m.keySet == Set(1L, 2L, 3L, 4L, 5L, 100L))
  }

  test("driver union-find and distributed star loop are identical " +
      "(strategy differential)") {
    import spark.implicits._
    // chain + star + separate pair + noise orientations
    val pairs = ((1L until 40L).map(i => (i + 1, i)) ++
      (50L to 60L).map(i => (100L, i)) ++ Seq((200L, 201L)))
      .toDF("id1", "id2")
    def resultOf(limit: Long) =
      Dedup.connectedComponents(pairs, driverEdgeLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val driver = resultOf(Long.MaxValue) // forces union-find
    val distributed = resultOf(0L)       // forces the star loop
    assert(driver == distributed)
    assert(driver.nonEmpty)
  }

  test("driver union-find matches a reference BFS on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    for (_ <- 1 to 12) {
      val n = 2 + rnd.nextInt(40)
      val edges = Seq.fill(1 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // reference: BFS transitive closure, component = min reachable id
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      def bfsMin(start: Long): Long = {
        var seen = Set(start); var frontier = Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          seen ++= frontier
        }
        seen.min
      }
      val selfOnly = edges.filter(e => e._1 == e._2).map(_._1)
        .filterNot(e => edges.exists(x => x._1 != x._2 && (x._1 == e || x._2 == e)))
      val expected = (edges.flatMap(e => Seq(e._1, e._2)).distinct
        .filterNot(selfOnly.contains))
        .map(v => v -> bfsMin(v)).toMap
      val got = Dedup.connectedComponents(edges.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"graph with ${edges.size} edges over $n ids")
    }
  }

  test("clusters found over real minhash candidate pairs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionAll(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val pairs = Dedup.minhashCandidates(planted)
    val cc = Dedup.connectedComponents(pairs).cache()
    try {
      // every planted duplicate ends in the same cluster as its source
      val planted2 = cc.as("a")
        .join(cc.as("b"),
          org.apache.spark.sql.functions.col("a.doc_id") + 1000000 ===
            org.apache.spark.sql.functions.col("b.doc_id"))
        .filter(org.apache.spark.sql.functions.col("a.component") =!=
          org.apache.spark.sql.functions.col("b.component"))
      assert(planted2.count() == 0L)
      // components are ids of members (root is the min member)
      val bad = cc.groupBy("component").agg(min("doc_id").as("mn"))
        .filter(col("component") =!= col("mn"))
      assert(bad.count() == 0L)
    } finally cc.unpersist()
  }
}
