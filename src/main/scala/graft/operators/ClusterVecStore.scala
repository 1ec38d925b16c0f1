package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** The LANDED per-cluster embedding store for INCREMENTAL semantic
  * dedup ([[Clustering.incrementalSemanticWithStore]]) — the
  * [[BandStore]] pattern generalized from membership STRINGS to keyed
  * VECTOR payloads: semantic dedup cannot answer "is this batch doc a
  * near-dup of the landed corpus?" from key equality alone (equal
  * `(c1, c2)` residual buckets only make a candidate); it needs the
  * landed vectors in the touched buckets to compute the fixed-point
  * distances. So the store lands `(ck, vec_id, fx)` rows — cluster key,
  * id, quantized embedding — hash-bucketed into fixed `bp=` dirs,
  * ck-sorted within every file, appended as atomic `batch=<tag>`
  * sub-dirs:
  *
  * {{{ dir/batch=<tag>/bp=<0..nBuckets-1>/part-*.parquet  (ck, vec_id, fx) }}}
  *
  * The same three pruning tiers as [[BandStore.prunedLookup]] apply to
  * the batch's cluster-key set (bounded by the batch's distinct
  * `(c1, c2)` pairs): `bp` partition filters + a pushed `In(ck)`
  * parquet predicate for small key sets, a broadcast left-semi join
  * past the pushdown stack cap, a shuffled join for corpus-class
  * batches — the landed side never enters an exchange in tiers 1-2, so
  * per-batch lookup cost tracks the TOUCHED BUCKETS, not the landed
  * corpus. Appends, idempotent-replay tags, crash-safe compaction
  * (replacement committed before old dirs are deleted), FIFO batch
  * retention, and the scheduled [[maintenanceTask]] all follow the
  * BandStore contract verbatim — see that class for the rationale on
  * each.
  *
  * Like the band store, this extends the reference's dedup surface (it
  * has none) with the continuous-curation state layout the brief's
  * LLM-pipeline pillar needs at 100 TB.
  */
final class ClusterVecStore private (
    private val spark: SparkSession,
    val dir: String,
    val nBuckets: Int,
    val pushdownKeyLimit: Int,
    val broadcastKeyLimit: Int) {

  /** Bucket of a cluster key — pure function, shared by writers and the
    * lookup pruner. */
  def bucketOf(ck: Column): Column =
    pmod(xxhash64(ck), lit(nBuckets.toLong))

  private def storePath: Path = Paths.get(dir)

  def nonEmpty: Boolean = {
    val p = storePath
    if (!Files.isDirectory(p)) return false
    val s = Files.list(p)
    try s.iterator().asScala.exists(
      _.getFileName.toString.startsWith("batch="))
    finally s.close()
  }

  /** True when `batch=<tag>` is already landed — the replay check. */
  def hasBatch(tag: String): Boolean =
    Files.exists(storePath.resolve(s"batch=$tag"))

  private val dataSchema = StructType(Seq(
    StructField("ck", StringType),
    StructField("vec_id", LongType),
    StructField("fx", ArrayType(LongType))))

  /** The full landed table (audit / compaction surface): `(ck, vec_id,
    * fx)` plus the `batch`/`bp` partition cols. Explicit schema — an
    * empty append must not wedge inference. In-process maintenance is
    * serialized against the materialized lookup ([[landedAmong]] reads,
    * [[compact]]/[[expireBatches]] write — [[StoreState]], round 19);
    * per-read `ignoreMissingFiles` is only best-effort tolerance for
    * OUT-of-process deletes, outside the single-writer contract. */
  def read(): DataFrame = readOn(lookupSession)

  private def readOn(s: SparkSession,
      excludeBatch: Option[String] = None): DataFrame =
    s.read
      .option("basePath", dir)
      .option("ignoreMissingFiles", "true")
      .schema(StructType(dataSchema.fields ++ Seq(
        StructField("batch", StringType),
        StructField("bp", LongType))))
      .parquet(listBatchDirs(excludeBatch).map(_.toString): _*)

  /** Conf-scoped clone for tier-1 lookups (see
    * [[BandStore.lookupSession]] — same raise, same
    * [[BandStore.SafeInPushdownCap]] cap, never the shared session). */
  private lazy val lookupSession: SparkSession = {
    val (c, isolated) =
      org.apache.spark.sql.graft.SessionClone.cloneOrSelf(spark)
    if (isolated) {
      val key = "spark.sql.parquet.pushdown.inFilterThreshold"
      val cur = c.conf.getOption(key).map(_.toInt).getOrElse(10)
      val want = math.min(pushdownKeyLimit, BandStore.SafeInPushdownCap)
      if (cur < want) c.conf.set(key, want.toString)
      // driver-side listing up to the store's own path-count class
      // (r21; see BandStore.lookupSession — default-only +
      // property-overridable since r22, r21 ADVICE)
      BandStore.raiseListingThreshold(c)
    }
    c
  }

  private def listBatchDirs(
      excludeBatch: Option[String] = None): Seq[Path] = {
    val p = storePath
    if (!Files.isDirectory(p)) return Seq.empty
    val s = Files.list(p)
    try s.iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("batch="))
      .filterNot(d => excludeBatch.exists(t =>
        d.getFileName.toString == s"batch=$t"))
    finally s.close()
  }

  /** Committed batch tags, oldest first by COMMIT ORDER (the
    * `_commitlog` sequence — mtime-independent; unlogged dirs order
    * last by (mtime, name). [[BandStore.batchTags]]'s contract). */
  def batchTags(): Seq[String] = {
    val seqs = StoreState.loggedSeq(dir)
    listBatchDirs().map(p => StoreState.orderKey(seqs, p))
      .sortBy(identity).map(_._3)
  }

  /** The landed `(ck, vec_id, fx)` rows in the buckets `batchKeys`
    * touches — LAZY, so plan tests can assert the pruning shape. Tiers
    * as [[BandStore.prunedLookup]], keyed on `ck`. */
  def prunedLookup(batchKeys: DataFrame): DataFrame =
    prunedLookup(batchKeys, None)

  /** [[prunedLookup]] with `excludeBatch` — the replay-correctness
    * primitive for composed streaming pipelines
    * ([[BandStore.prunedLookup]]'s round-19 contract verbatim). */
  def prunedLookup(batchKeys: DataFrame,
      excludeBatch: Option[String]): DataFrame = {
    if (listBatchDirs(excludeBatch).isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dataSchema)
    val k = batchKeys.select(col("ck")).distinct()
      .withColumn("bp", bucketOf(col("ck")))
    // ONE action decides the tier AND fetches tier-1's values (r21 —
    // see BandStore.prunedLookup)
    val probe = k.limit(pushdownKeyLimit + 1).collect()
    if (probe.length <= pushdownKeyLimit) {
      val rows = probe
      val bps = rows.map(_.getLong(1)).distinct.toSeq
      val cks = rows.map(_.getString(0)).toSeq
      readOn(lookupSession, excludeBatch)
        .filter(col("bp").isin(bps: _*))
        .filter(col("ck").isInCollection(cks))
        .select(col("ck"), col("vec_id"), col("fx"))
    } else if (k.count() <= broadcastKeyLimit) {
      val bps = k.select(col("bp")).distinct()
        .collect().map(_.getLong(0)).toSeq // bounded by nBuckets
      readOn(lookupSession, excludeBatch)
        .filter(col("bp").isin(bps: _*))
        .join(broadcast(k.select(col("ck"))), Seq("ck"), "left_semi")
        .select(col("ck"), col("vec_id"), col("fx"))
    } else {
      readOn(lookupSession, excludeBatch)
        .join(k.select("ck"), Seq("ck"), "left_semi")
        .select(col("ck"), col("vec_id"), col("fx"))
    }
  }

  /** [[prunedLookup]] MATERIALIZED (eager localCheckpoint): callers
    * append the batch's own members right after the lookup, and a lazy
    * lookup re-run after the append would see them as landed and drop
    * every batch doc. Bounded by the touched buckets' landed rows.
    * Holds the store's READ lock across plan + scan
    * ([[BandStore.knownAmong]]'s contract — maintenance cannot retire
    * the planned dirs mid-scan). */
  def landedAmong(batchKeys: DataFrame,
      excludeBatch: Option[String] = None): DataFrame =
    StoreState.withRead(dir) {
      prunedLookup(batchKeys, excludeBatch).localCheckpoint(true)
    }

  /** Land `members` (`ck`, `vec_id`, `fx`; deduplicated on (ck,
    * vec_id), bucketed, ck-sorted) as the atomic `batch=<tag>` dir.
    * Returns false — writing NOTHING — when the tag is already landed
    * (idempotent replay). The landing contract is ALL-SEEN (survivors
    * and dropped alike): semantic distance is not transitive, so a
    * survivors-only store re-admits chained near-duplicates — the
    * [[Dedup.incrementalMinhash]] argument verbatim.
    *
    * Holds the store's READ lock (round 20): concurrent appends remain
    * allowed (distinct tags never conflict; same-tag replays resolve by
    * exists-check + ATOMIC_MOVE), but an append can no longer
    * interleave with [[replaceAll]]'s list-rewrite-delete span — the
    * window where a landing dir was deleted while its rows were absent
    * from the replacement set (silent membership loss). */
  def append(members: DataFrame, tag: String): Boolean =
    StoreState.withRead(dir) {
      require(tag.nonEmpty && !tag.contains('/') && !tag.contains('='),
        s"bad batch tag: $tag")
      val target = storePath.resolve(s"batch=$tag")
      if (Files.exists(target)) false
      else {
        Files.createDirectories(storePath)
        val tmp = Files.createTempDirectory(storePath, s".tmp_$tag-")
        val stage = tmp.resolve("stage")
        // write parallelism = bucket count + bp-led local sort (r21):
        // see BandStore.append — pins the shuffle against AQE's
        // 1-task coalescing and satisfies the dynamic-partition
        // writer's ordering without an inserted non-stable sort
        members.select(col("ck"), col("vec_id"), col("fx"))
          .dropDuplicates("ck", "vec_id")
          .withColumn("bp", bucketOf(col("ck")))
          .repartition(nBuckets, col("bp"))
          .sortWithinPartitions("bp", "ck")
          .write.mode("overwrite").partitionBy("bp").parquet(stage.toString)
        try {
          Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
          StoreState.logCommit(dir, tag)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally ClusterVecStore.deleteRecursively(tmp)
      }
    }

  /** Crash-safe compaction: fold all batch dirs into ONE ck-sorted file
    * per bucket — replacement committed BEFORE old dirs are deleted
    * ([[BandStore.compact]]'s contract). Returns dirs folded (0 = no-op). */
  def compact(): Int = StoreState.withWrite(dir) {
    val old = listBatchDirs()
    if (old.size <= 1) 0
    else {
      val prev = old.map(_.getFileName.toString)
        .collect { case ClusterVecStore.CompactedTag(n) => n.toLong }
      val tag = s"compacted-${if (prev.isEmpty) 0L else prev.max + 1L}"
      // Tag-collision guard (round 19, mirroring [[BandStore.compact]]):
      // two racing compactions derive the same `compacted-<n>` — fail
      // the loser up front instead of dying mid-move with an unhandled
      // FileAlreadyExistsException after the rewrite work is spent.
      // (In-process races are already excluded by the write lock; this
      // guards the out-of-contract cross-process case.)
      require(!Files.exists(storePath.resolve(s"batch=$tag")),
        s"compaction tag already landed: $tag")
      val all = read().select(col("ck"), col("vec_id"), col("fx"))
        .dropDuplicates("ck", "vec_id")
        .withColumn("bp", bucketOf(col("ck")))
        .repartition(nBuckets, col("bp"))
        .sortWithinPartitions("bp", "ck")
      val tmp = Files.createTempDirectory(storePath, s".tmp_$tag-")
      val stage = tmp.resolve("stage")
      try {
        all.write.mode("overwrite").partitionBy("bp").parquet(stage.toString)
        Files.move(stage, storePath.resolve(s"batch=$tag"),
          StandardCopyOption.ATOMIC_MOVE)
        StoreState.logCommit(dir, tag)
      } finally ClusterVecStore.deleteRecursively(tmp)
      old.foreach(ClusterVecStore.deleteRecursively)
      StoreState.pruneLog(dir, liveTags())
      old.size
    }
  }

  /** Replace the ENTIRE landed member set with `members` in one
    * crash-safe rewrite (round 19) — the [[compact]] discipline with a
    * caller-provided frame: stage, commit `batch=rekeyed-<n>`, only
    * then delete the old dirs. The one legitimate caller is a
    * BUCKET-KEY migration ([[Clustering.rekeyStore]] after an
    * [[IvfVersions]] retrain): `ck` is a function of the layout's
    * centroids, so a centroid cutover strands every landed member
    * under keys the post-cutover lookups will never probe — membership
    * silently lost, near-dups re-admitted. Holds the store's write
    * lock; a crash after the commit leaves tolerated duplicates, never
    * a hole. Returns the number of dirs folded away.
    *
    * CAUTION: a `members` frame PLANNED before this call pins its file
    * list at plan time — an append landing between that plan and this
    * write lock would have its dir deleted while its rows are absent
    * from the replacement (silent membership loss). Derive the frame
    * from the landed state UNDER the lock via [[replaceAllWith]]; this
    * raw overload is for caller-owned frames that do not read the
    * store. */
  def replaceAll(members: DataFrame): Int =
    StoreState.withWrite(dir) { replaceAllLocked(members) }

  /** [[replaceAll]] where the replacement is a FUNCTION OF THE LANDED
    * STATE (the re-key case, [[Clustering.rekeyStore]]): `rekey`
    * receives the store's full landed frame read UNDER the write lock,
    * so the file list it plans is exactly the dir set the commit then
    * deletes — no append can land between the two (appends hold the
    * read lock). */
  def replaceAllWith(rekey: DataFrame => DataFrame): Int =
    StoreState.withWrite(dir) { replaceAllLocked(rekey(read())) }

  private def replaceAllLocked(members: DataFrame): Int = {
    val old = listBatchDirs()
    val prev = old.map(_.getFileName.toString)
      .collect { case ClusterVecStore.RekeyedTag(n) => n.toLong }
    val tag = s"rekeyed-${if (prev.isEmpty) 0L else prev.max + 1L}"
    require(!Files.exists(storePath.resolve(s"batch=$tag")),
      s"rekey tag already landed: $tag")
    val all = members.select(col("ck"), col("vec_id"), col("fx"))
      .dropDuplicates("ck", "vec_id")
      .withColumn("bp", bucketOf(col("ck")))
      .repartition(nBuckets, col("bp"))
      .sortWithinPartitions("bp", "ck")
    Files.createDirectories(storePath)
    val tmp = Files.createTempDirectory(storePath, s".tmp_$tag-")
    val stage = tmp.resolve("stage")
    try {
      all.write.mode("overwrite").partitionBy("bp").parquet(stage.toString)
      Files.move(stage, storePath.resolve(s"batch=$tag"),
        StandardCopyOption.ATOMIC_MOVE)
      StoreState.logCommit(dir, tag)
    } finally ClusterVecStore.deleteRecursively(tmp)
    old.foreach(ClusterVecStore.deleteRecursively)
    StoreState.pruneLog(dir, liveTags())
    old.size
  }

  /** FIFO retention — drop the oldest batch dirs past the horizon
    * ([[BandStore.expireBatches]]'s contract, including the round-19
    * `batch=init` protection: the bootstrap seed holds the entire
    * landed corpus as one dir and must not fall to a dir-counted
    * horizon; the first compaction folds it into merged state which
    * then ages normally). Returns expired tags. */
  def expireBatches(retainNewest: Int,
      protectInit: Boolean = true): Seq[String] =
    StoreState.withWrite(dir) {
      require(retainNewest >= 0, s"retainNewest: $retainNewest")
      val tags = batchTags()
      val candidates =
        if (protectInit) tags.filterNot(_ == "init") else tags
      val drop = candidates.dropRight(retainNewest)
      drop.foreach(t => ClusterVecStore.deleteRecursively(
        storePath.resolve(s"batch=$t")))
      StoreState.pruneLog(dir, liveTags())
      drop
    }

  /** Tags of the batch dirs currently on disk (unordered). */
  private def liveTags(): Set[String] =
    listBatchDirs()
      .map(_.getFileName.toString.stripPrefix("batch=")).toSet

  /** Schedulable maintenance pass (expire, then compact-if-fragmented)
    * for [[graft.core.Workers.registerMaintenance]]. */
  def maintenanceTask(compactAtBatches: Int = 16,
      retainBatches: Option[Int] = None): () => Unit = {
    require(compactAtBatches >= 2, s"compactAtBatches: $compactAtBatches")
    () => {
      retainBatches.foreach(n => expireBatches(n))
      if (listBatchDirs().size > compactAtBatches) compact()
      ()
    }
  }
}

object ClusterVecStore {

  private val CompactedTag = "batch=compacted-([0-9]+)".r
  private val RekeyedTag = "batch=rekeyed-([0-9]+)".r

  /** Open (or lazily create at first append) the store at `dir`. */
  def open(spark: SparkSession, dir: String, nBuckets: Int = 64,
      pushdownKeyLimit: Int = 1024,
      broadcastKeyLimit: Int = 1000000): ClusterVecStore = {
    require(nBuckets > 0 && pushdownKeyLimit > 0 &&
      broadcastKeyLimit >= pushdownKeyLimit)
    new ClusterVecStore(spark, dir, nBuckets, pushdownKeyLimit,
      broadcastKeyLimit)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
