package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Bounded K-minimum-values (KMV) distinct-count sketch.
  *
  * Input: a column of DETERMINISTIC uniform hashes in `[0, hashSpace)`
  * (the repo convention: `Corpus.sampleHash` / `graft_sample_hash`, the
  * 60-bit md5 coin). The aggregate keeps only the `k` smallest distinct
  * hash values per group — O(k) state per partial, merged by
  * union+truncate (order-independent, so results are deterministic under
  * any partitioning) — and estimates the distinct count from the k-th
  * smallest value: `(k-1) * hashSpace / kth`. With fewer than `k`
  * distinct hashes the sketch IS the distinct set and the estimate is
  * exact.
  *
  * Why this over Spark's `approx_count_distinct` (HLL++): same bounded
  * state and one-pass map-side-partial shape, but the estimate is a pure
  * deterministic function of md5 — reproducible across engines, so the
  * DuckDB oracle recomputes it bit-for-bit (`ext_approx_distinct`),
  * and reproducible across runs/cluster layouts, which a training-data
  * pipeline needs when a sample threshold or dedup budget is derived
  * from the estimate.
  *
  * 100 TB shape: the exact alternative (`COUNT(DISTINCT x)`) shuffles
  * every distinct (group, value) pair; this shuffles ≤ k longs per
  * (group, map partition). The estimate's relative error is
  * ~1/√(k−2) ≈ 13% at k=64; callers pick k for their error budget —
  * state stays k longs regardless of cardinality.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    hashSpace: Long = KmvDistinct.DefaultHashSpace,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv: k must be >= 2, got $k")

  // Registered in the SQL function registry for arbitrary user input, so
  // the type contract must fail at ANALYSIS, not as an executor-side
  // ClassCastException: the child must be a LongType hash. The estimator
  // additionally assumes values are uniform in [0, hashSpace) — the
  // 60-bit md5 coin domain; values outside it (e.g. negatives, raw ids)
  // would yield meaningless or even negative estimates, so update()
  // rejects them loudly instead of sketching garbage.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash column in [0, 2^60) " +
        s"(use graft_sample_hash), got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0L || h >= hashSpace) throw new IllegalArgumentException(
        s"$prettyName: input $h outside the uniform-hash domain [0, $hashSpace) — " +
          "feed it graft_sample_hash(x), not raw values")
      buffer.add(h)
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buffer.addAll(other)
    while (buffer.size > k) buffer.pollLast()
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buffer.size
    if (n < k) n.toDouble
    // kth smallest distinct hash = the max of the kept set; (k-1)*2^60
    // has <= 6 significant bits so the product is an EXACT double, and
    // int64→double uses IEEE round-to-nearest in every engine — the
    // whole estimate is one deterministic IEEE division, which is what
    // lets the DuckDB oracle reproduce it bit-for-bit
    else (k - 1).toDouble * hashSpace.toDouble / buffer.last().toDouble
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_distinct"
}

object KmvDistinct {
  /** 2^60 — the hash space of the repo's md5-prefix coin
    * (`Corpus.sampleHash`: 15 hex digits). */
  val DefaultHashSpace: Long = 1152921504606846976L
}
