package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("rrfFuse: hand-computed integer RRF scores, both-system docs " +
      "outrank single-system ones at equal ranks, doc_id tie-break") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 20L, 1L), (1L, 40L, 2L), (1L, 10L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val got = Retrieval.rrfFuse(a, b, k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // 1000000 div (60 + r): r1=16393, r2=16129, r3=15873
    // doc 10: 16393 + 15873 = 32266; doc 20: 16129 + 16393 = 32522
    // doc 30: 15873; doc 40: 16129
    assert(got == Seq(
      (20L, 32522L, 1L), (10L, 32266L, 2L),
      (40L, 16129L, 3L), (30L, 15873L, 4L)), s"got $got")
  }

  test("hybridTopK with no lexical hits returns an empty, correctly " +
      "typed frame (no anchor, no evidence — never a crash)") {
    withTempDir { tmp =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val layout = s"$tmp/kivf"
      Clustering.writeKmeansIvfLayout(emb, layout)
      val queries = Seq((1L, "zzzzunmatchableterm"))
        .toDF("query_id", "term")
      val out = Retrieval.hybridTopK(docs, queries, emb, layout, k = 5)
      assert(out.columns.toSeq ==
        Seq("query_id", "doc_id", "score", "rnk"))
      assert(out.count() == 0L)
    }
  }

  test("hybridTopK: every fused doc has lexical or semantic evidence, " +
      "ranks are per-query dense from 1, the ANN side partition-prunes " +
      "off the persisted layout, and no global sort appears") {
    withTempDir { tmp =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val queries = Seq((1L, "spark"), (1L, "customer"), (2L, "vector"))
        .toDF("query_id", "term")
      val layout = s"$tmp/kivf"
      Clustering.writeKmeansIvfLayout(emb, layout)
      val hybrid = Retrieval.hybridTopK(docs, queries, emb, layout, k = 5)
      val rows = hybrid.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.nonEmpty)
      // membership: every fused doc appears in the lexical top-5 or in
      // the anchor's semantic top-5
      val lex = TextAnalysis.bm25TopKMulti(docs, queries, k = 5)
        .select(col("query_id"), col("doc_id"), col("rnk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val anchors = lex.filter(_._3 == 1L).map(t => (t._1, t._2)).toMap
      val ann = Clustering.ivfTopKKmeansFromLayout(layout,
          emb.filter(col("vec_id").isin(anchors.values.toSeq: _*)),
          nprobe = 2, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val evidence = lex.map(t => (t._1, t._2)).toSet ++
        ann.flatMap { case (aid, n, _) =>
          anchors.collect { case (q, a) if a == aid => (q, n) }
        }.toSet
      rows.foreach { case (q, d, _, _) =>
        assert(evidence.contains((q, d)),
          s"fused ($q, $d) has no lexical or semantic evidence")
      }
      // hand-check one fused score: RRF terms from the two observed
      // rank positions
      val lexRnk = lex.map(t => ((t._1, t._2), t._3)).toMap
      val annRnk = ann.flatMap { case (aid, n, r) =>
        anchors.collect { case (q, a) if a == aid => ((q, n), r) }
      }.toMap
      rows.foreach { case (q, d, score, _) =>
        val want = lexRnk.get((q, d)).map(r => 1000000L / (60L + r))
          .getOrElse(0L) +
          annRnk.get((q, d)).map(r => 1000000L / (60L + r)).getOrElse(0L)
        assert(score == want, s"($q, $d): score $score != $want")
      }
      // ranks dense from 1 per query
      rows.groupBy(_._1).foreach { case (q, rs) =>
        assert(rs.map(_._4).sorted.toSeq == (1L to rs.size).toSeq,
          s"query $q ranks not dense: ${rs.map(_._4).toSeq}")
      }
      // plan: the semantic candidate scan partition-prunes (static cid
      // IN off the committed manifest); fusion never plans a GLOBAL
      // sort — all ranking is per-query windows
      val plan = hybrid.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan)
        .isDefined, s"ANN side must partition-prune:\n$plan")
      assert(!plan.contains("TakeOrderedAndProject"),
        s"no global top-k sort expected:\n$plan")
    }
  }
}
