package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.catalyst.expressions.Literal

/** ScalaCheck properties for the KMV sketch's DISTRIBUTED correctness:
  * whatever partitioning and merge order Spark chooses, the final
  * estimate must be the single-pass answer — that invariance is what
  * makes the aggregate safe to run with map-side partials on any
  * cluster layout (and what the DuckDB oracle implicitly relies on).
  * Pure-JVM: buffers and merges are driven directly, no SparkSession.
  */
object KmvPropertiesSpec extends Properties("kmv") {

  private val agg = KmvDistinct(Literal(0L), k = 16)

  private def bufferOf(vs: Seq[Long]) = {
    val b = agg.createAggregationBuffer()
    vs.foreach { v =>
      b.add(v)
      if (b.size > 16) b.pollLast()
    }
    b
  }

  private val genValues: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 1L << 60))

  private val genSplit: Gen[(List[Long], Int)] = for {
    vs <- genValues
    n <- Gen.choose(1, 8)
  } yield (vs, n)

  property("merge is partition-invariant: any split + merge order " +
      "equals the single-pass sketch") = Prop.forAll(genSplit) {
    case (vs, parts) =>
      val single = agg.eval(bufferOf(vs))
      val partials = vs.grouped(math.max(1, vs.length / parts + 1))
        .map(bufferOf).toList
      val mergedLtr = partials match {
        case Nil => agg.createAggregationBuffer()
        case h :: t => t.foldLeft(h)(agg.merge)
      }
      val mergedRtl = partials.reverse match {
        case Nil => agg.createAggregationBuffer()
        case h :: t => t.foldLeft(h)(agg.merge)
      }
      agg.eval(mergedLtr) == single && agg.eval(mergedRtl) == single
  }

  property("serialize/deserialize round-trips the buffer") =
    Prop.forAll(genValues) { vs =>
      val b = bufferOf(vs)
      val back = agg.deserialize(agg.serialize(b))
      back == b && agg.eval(back) == agg.eval(b)
    }

  property("exact below k: fewer than k distinct values evaluates to " +
      "the distinct count") = Prop.forAll(
    Gen.listOf(Gen.choose(0L, 14L))) { vs =>
      agg.eval(bufferOf(vs)) == vs.distinct.size.toDouble
    }

  property("merging an empty partial is the identity") =
    Prop.forAll(genValues) { vs =>
      val b = bufferOf(vs)
      val before = agg.eval(b)
      agg.eval(agg.merge(b, agg.createAggregationBuffer())) == before
    }
}
