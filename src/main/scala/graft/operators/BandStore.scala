package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The LANDED LSH-band membership store for incremental near-dup dedup
  * ([[Dedup.incrementalMinhash]] and its streaming twin) — the dedup
  * state as a PRUNABLE on-disk table instead of a parquet pile that
  * every batch re-scans and re-distincts.
  *
  * Why it exists (the r16 scale gap): the incremental near-dup filter
  * needs one membership question per batch — "which of THIS BATCH's
  * bands has the corpus already landed?" — and answering it by reading
  * the full landed signature table, re-deriving bands, and
  * re-`distinct`-ing them is O(corpus-ever-seen) work per micro-batch
  * (a full shuffle of the landed table, every batch, forever). At
  * 100 B docs that is a TB-class scan per micro-batch and the pipeline
  * falls behind. The membership question's ANSWER is batch-sized; only
  * the layout made it corpus-sized.
  *
  * Layout: one row per DISTINCT landed band, hash-partitioned into
  * `nBuckets` fixed `bp=` directories and SORTED by `band` within
  * every file, appended as atomic `batch=<tag>` sub-dirs:
  *
  * {{{ dir/batch=<tag>/bp=<0..nBuckets-1>/part-*.parquet  (band) }}}
  *
  * Three pruning levers stack on that layout, so per-batch lookup cost
  * tracks the BATCH, not the landed corpus:
  *
  *  1. `bp` is a PARTITION column and the batch's bucket set is
  *     collected (bounded by `nBuckets`) into literal partition
  *     filters — directory-level pruning, visible as
  *     `PartitionFilters: [bp IN (...)]` in the scan;
  *  2. small probes (≤ [[pushdownBandLimit]] bands) push their band
  *     strings as an `In(band, ...)` parquet filter; because every
  *     file is band-sorted, row-group min/max stats are narrow and
  *     parquet-mr drops most row groups without reading them —
  *     dictionary pages prune the rest (larger batches join instead —
  *     the tier table on [[prunedLookup]]);
  *  3. nothing on the landed side ever enters an exchange: the lookup
  *     plan is scan → filter → (tiny) distinct, or scan → broadcast
  *     semi-join — the only shuffle input is the post-filter result,
  *     at most the batch's own band count. (Mega-batches past
  *     [[broadcastBandLimit]] fall back to a shuffled join — at that
  *     size the batch IS corpus-class work and a sort-merge join is
  *     the right plan.)
  *
  * Appends are batch-tagged atomic directory moves: write to a hidden
  * temp dir, `ATOMIC_MOVE` into `batch=<tag>`, and a retry of an
  * already-landed tag is detected by the target's existence and
  * SKIPPED — which is what makes the streaming twin's `foreachBatch`
  * state maintenance idempotent under at-least-once replay.
  *
  * Single-writer contract (same as the reference's single active
  * writer per table, `smoltable/src/table/writer/mod.rs`): one
  * pipeline maintains a store; concurrent appends of the SAME tag are
  * resolved by the atomic move (one wins), concurrent different-tag
  * appends compose because rows are add-only and membership tolerates
  * duplicate bands.
  *
  * Compaction: many small per-batch appends accumulate one file per
  * touched bucket per batch; [[compact]] rewrites the store as ONE
  * sorted file per bucket (a maintenance pass — same cadence class as
  * the engine's segment compaction), restoring tight row-group stats.
  */
final class BandStore private (
    private val spark: SparkSession,
    val dir: String,
    val nBuckets: Int,
    val pushdownBandLimit: Int,
    val broadcastBandLimit: Int) {

  import BandStore._

  /** The bucket of a band — pure function of the band string, shared by
    * writers and the lookup pruner. */
  def bucketOf(band: Column): Column =
    pmod(xxhash64(band), lit(nBuckets.toLong))

  private def storePath: Path = Paths.get(dir)

  /** True when at least one committed batch directory exists. */
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

  /** The full landed band table — audit / compaction surface, not the
    * per-batch path (`band`, plus the `batch`/`bp` partition cols).
    * Schema is explicit, not inferred: a legitimately-empty append
    * leaves a data-less `batch=` dir that would wedge inference. */
  def read(): DataFrame = readOn(lookupSession)

  /** [[read]] against an explicit session — the tier-1 lookup reads on
    * a session CLONE carrying the raised In-pushdown threshold, so the
    * shared session's conf is never mutated (round 18; the r17 version
    * raised `spark.sql.parquet.pushdown.inFilterThreshold` session-wide
    * as a hidden side effect of a membership read).
    *
    * Concurrency (round 19): an IN-process maintenance pass is
    * serialized against the materialized lookup entry points by the
    * store's read/write lock ([[StoreState]] — [[knownAmong]] holds
    * the read lock across plan+scan, [[compact]]/[[expireBatches]]
    * hold the write lock), so a lookup can never lose deleted dirs'
    * bands mid-scan. `ignoreMissingFiles` (per-read option, not
    * session conf) is only best-effort tolerance for OUT-of-process
    * deletes, which the single-writer contract puts out of scope —
    * it suppresses the read error, it does not preserve the missed
    * membership, which is why the lock exists. */
  private def readOn(s: SparkSession,
      excludeBatch: Option[String] = None): DataFrame =
    s.read
      .option("basePath", dir)
      .option("ignoreMissingFiles", "true")
      .schema(StructType(Seq(
        StructField("band", StringType),
        StructField("batch", StringType),
        StructField("bp", org.apache.spark.sql.types.LongType))))
      .parquet(listBatchDirs(excludeBatch).map(_.toString): _*)

  /** Session clone for tier-1 lookups: identical state, but with the
    * parquet In-pushdown threshold raised to the SAFE cap — capped at
    * [[BandStore.SafeInPushdownCap]] regardless of the caller's
    * `pushdownBandLimit` (the threshold governs a recursively-evaluated
    * parquet OR-chain; ~1k is a measured stack-safety bound, ~100k
    * overflows task stacks), and never lowered below the parent's
    * setting. Confined to frames built from it: the cloned conf travels
    * with the relation, so the raise applies exactly to store lookups
    * and to nothing else on the shared session. */
  private lazy val lookupSession: SparkSession = {
    val (c, isolated) =
      org.apache.spark.sql.graft.SessionClone.cloneOrSelf(spark)
    if (isolated) {
      val key = "spark.sql.parquet.pushdown.inFilterThreshold"
      val cur = c.conf.getOption(key).map(_.toInt).getOrElse(10)
      val want = math.min(pushdownBandLimit, BandStore.SafeInPushdownCap)
      if (cur < want) c.conf.set(key, want.toString)
      // driver-side listing up to the store's own path-count class
      // (r21): a store read passes batches × nBuckets directories, and
      // the default 32-path threshold turned EVERY read into a ~100 ms
      // distributed listing job of tiny local dirs; the store's live
      // dir count is maintenance-bounded, so driver listing is right
      // until the count is genuinely object-store-large. Default-only
      // + property-overridable since r22 (r21 ADVICE).
      BandStore.raiseListingThreshold(c)
    } // non-classic session: no clone available — skip the raise
    // (lookups stay correct; the pushed In degrades to a range filter)
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

  /** Committed batch directory names (the `<tag>` part), oldest first
    * by COMMIT ORDER: the `_commitlog` sequence ([[StoreState]],
    * round 19 — mtime-independent, so a backup restore or `cp -r`
    * cannot scramble what "oldest" means to retention), with unlogged
    * dirs (crash between move and log write, or a pre-log store)
    * ordered after every logged one by (mtime, name). */
  def batchTags(): Seq[String] = {
    val seqs = StoreState.loggedSeq(dir)
    listBatchDirs().map(p => StoreState.orderKey(seqs, p))
      .sortBy(identity).map(_._3)
  }

  /** The PRUNED membership lookup as a LAZY frame — exposed separately
    * from [[knownAmong]] so plan tests can assert the pruning shape.
    * Three tiers by the batch's distinct band count (one bounded count
    * decides — the driverUnionFind / kmeans-kernel pattern: count
    * BEFORE any collect):
    *
    *  1. ≤ [[pushdownBandLimit]]: `bp` partition filters + a pushed
    *     `In(band, ...)` parquet predicate — row-group min/max +
    *     dictionary pruning on the band-sorted files. The limit is a
    *     STACK bound, not a memory bound: Spark expands a pushed `In`
    *     into a recursively-evaluated parquet OR-chain, and ~100 k
    *     values overflows the task stack (measured) — ~1 k is deep
    *     enough to matter and shallow enough to be safe;
    *  2. ≤ [[broadcastBandLimit]]: `bp` partition filters + a
    *     BROADCAST left-semi join (build side = the batch's bands) —
    *     no row-group skip, but the landed side still streams through
    *     zero exchanges and reads one column of the touched buckets;
    *  3. above: a shuffled semi-join — a batch that big IS
    *     corpus-class work and the sort-merge plan is the honest one.
    */
  def prunedLookup(batchBands: DataFrame): DataFrame =
    prunedLookup(batchBands, None)

  /** [[prunedLookup]] with `excludeBatch` (round 19): the named
    * `batch=<tag>` dir is dropped from the scan's directory list, so
    * the lookup sees the store AS IF that batch were not landed. This
    * is the replay-correctness primitive for COMPOSED streaming
    * pipelines: when stage N's store append committed but stage N+1's
    * didn't, a replay must recompute every stage against the
    * PRE-BATCH state — excluding the batch's own tag restores exactly
    * that state. (After maintenance folds the tag away the exclusion
    * is a no-op — by then every downstream commit of the batch exists,
    * so the recompute's outputs are all skipped by existence gates.) */
  def prunedLookup(batchBands: DataFrame,
      excludeBatch: Option[String]): DataFrame = {
    if (listBatchDirs(excludeBatch).isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("band", StringType))))
    val b = batchBands.select(col("band")).distinct()
      .withColumn("bp", bucketOf(col("band")))
    // ONE action decides the tier AND fetches tier-1's values (r21;
    // was a count + a separate collect — two jobs per lookup on the
    // hot path): collect up to limit+1 rows; fewer than that means the
    // exact tier-1 row set is already in hand, more means tier 2/3,
    // where only the bucket set is needed (bounded by nBuckets)
    val probe = b.limit(pushdownBandLimit + 1).collect()
    if (probe.length <= pushdownBandLimit) {
      val rows = probe
      val bps = rows.map(_.getLong(1)).distinct.toSeq
      val bands = rows.map(_.getString(0)).toSeq
      // read on the session CLONE whose In-pushdown threshold is raised
      // (and capped — see lookupSession) so the band IN (...) predicate
      // reaches parquet-mr as a real In filter instead of degrading to
      // a min/max range that random hashes render useless; the shared
      // session's conf is untouched
      readOn(lookupSession, excludeBatch)
        .filter(col("bp").isin(bps: _*))
        .filter(col("band").isInCollection(bands))
        .select(col("band")).distinct()
    } else if (b.count() <= broadcastBandLimit) {
      val bps = b.select(col("bp")).distinct()
        .collect().map(_.getLong(0)).toSeq // bounded by nBuckets
      readOn(lookupSession, excludeBatch)
        .filter(col("bp").isin(bps: _*))
        .join(broadcast(b.select(col("band"))), Seq("band"), "left_semi")
        .select(col("band")).distinct()
    } else {
      readOn(lookupSession, excludeBatch)
        .join(b.select("band"), Seq("band"), "left_semi")
        .select(col("band")).distinct()
    }
  }

  /** Distinct `batchBands` bands already landed, MATERIALIZED (eager
    * `localCheckpoint`): callers append to the store right after the
    * lookup, and a lazy lookup re-run after the append would see the
    * batch's own bands as landed and drop every batch doc. The result
    * is at most batch-sized.
    *
    * Holds the store's READ lock across plan + scan ([[StoreState]]):
    * a concurrent maintenance pass cannot delete the planned batch
    * dirs mid-scan, so landed membership is never silently missed.
    * ([[prunedLookup]] stays lazy and unlocked — it is the plan-shape
    * audit surface; this is the concurrency-safe lookup.) */
  def knownAmong(batchBands: DataFrame,
      excludeBatch: Option[String] = None): DataFrame =
    StoreState.withRead(dir) {
      prunedLookup(batchBands, excludeBatch).localCheckpoint(true)
    }

  /** Land `bands` (deduplicated, bucketed, band-sorted) as the atomic
    * batch directory `batch=<tag>`. Returns false — and writes NOTHING
    * — when the tag is already landed (the idempotent-replay path).
    * Callers pass bands NOT already known (anti-join against
    * [[knownAmong]]'s result) to keep the store distinct; duplicates
    * are tolerated by lookups either way.
    *
    * Holds the store's READ lock (round 20, matching
    * [[ClusterVecStore.append]]): concurrent appends stay allowed, but
    * an append can never interleave with a whole-store rewrite's
    * list-commit-delete span. */
  def append(bands: DataFrame, tag: String): Boolean =
    StoreState.withRead(dir) {
      require(tag.nonEmpty && !tag.contains('/') && !tag.contains('='),
        s"bad batch tag: $tag")
      val target = storePath.resolve(s"batch=$tag")
      if (Files.exists(target)) false
      else {
        Files.createDirectories(storePath)
        val tmp = Files.createTempDirectory(storePath, s".tmp_$tag-")
        val stage = tmp.resolve("stage")
        // write parallelism = bucket count (r21): an explicit partition
        // count pins the shuffle against AQE coalescing, which at small
        // batch sizes folded the write into ONE task that opened all
        // nBuckets parquet writers sequentially (~1 s per append of
        // pure writer overhead); the local sort leads with bp so the
        // dynamic-partition writer's required ordering is already
        // satisfied — no inserted (non-stable) sort that could scramble
        // the documented within-file band order
        // dedup AFTER the bucket shuffle (r22, §2.4): bp = f(band), so
        // bp-partitioned data co-locates every copy of a band and the
        // (bp, band) dedup needs no exchange of its own — the old
        // distinct-then-repartition shape paid a second full exchange
        // (by band, then by bp) for the same unique set, and always
        // shuffles at least as many bytes (dups + uniques vs dups)
        bands.select(col("band"))
          .withColumn("bp", bucketOf(col("band")))
          .repartition(nBuckets, col("bp"))
          .dropDuplicates("bp", "band")
          .sortWithinPartitions("bp", "band")
          .write.mode("overwrite").partitionBy("bp").parquet(stage.toString)
        try {
          Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
          StoreState.logCommit(dir, tag)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally deleteRecursively(tmp)
      }
    }

  /** Rewrite the store as ONE band-sorted file per bucket under a fresh
    * `batch=<tag>` (old batch dirs removed) — the maintenance pass that
    * keeps row-group stats tight after many small appends.
    *
    * Crash-safe order (round 18; the r17 version deleted the old dirs
    * FIRST, so a crash in the window left an empty store — silently
    * re-admitting every future duplicate): the compacted replacement is
    * staged and ATOMIC_MOVE-committed BEFORE any old dir is deleted.
    * A crash after the commit leaves duplicate bands, which lookups
    * tolerate by contract and the next compaction folds away; a crash
    * before it leaves the store exactly as it was. The tag is fresh per
    * compaction ([[nextCompactTag]] — `compacted-<n>`, n above every
    * landed index) so the commit can never collide with a previous
    * compaction's surviving dir.
    *
    * Returns the number of batch dirs folded away (0 = nothing to do:
    * empty store, or already a single batch dir). */
  def compact(): Int = StoreState.withWrite(dir) { compact(nextCompactTag()) }

  private[operators] def compact(tag: String): Int =
    StoreState.withWrite(dir) {
      val old = listBatchDirs()
      if (old.size <= 1) 0
      else {
        require(!Files.exists(storePath.resolve(s"batch=$tag")),
          s"compaction tag already landed: $tag")
        // same one-exchange dedup shape as append (bp = f(band))
        val all = read().select(col("band"))
          .withColumn("bp", bucketOf(col("band")))
          .repartition(nBuckets, col("bp"))
          .dropDuplicates("bp", "band")
          .sortWithinPartitions("bp", "band")
        val tmp = Files.createTempDirectory(storePath, s".tmp_$tag-")
        val stage = tmp.resolve("stage")
        try {
          all.write.mode("overwrite").partitionBy("bp")
            .parquet(stage.toString)
          Files.move(stage, storePath.resolve(s"batch=$tag"),
            StandardCopyOption.ATOMIC_MOVE)
          StoreState.logCommit(dir, tag)
        } finally deleteRecursively(tmp)
        old.foreach(deleteRecursively)
        StoreState.pruneLog(dir, liveTags())
        old.size
      }
    }

  /** Fresh, collision-free compaction tag: `compacted-<n>` with `n`
    * one above the largest index among landed compaction dirs. */
  private def nextCompactTag(): String = {
    val prev = listBatchDirs().map(_.getFileName.toString)
      .collect { case CompactedTag(n) => n.toLong }
    s"compacted-${if (prev.isEmpty) 0L else prev.max + 1L}"
  }

  /** RETENTION: drop the oldest committed batch dirs until at most
    * `retainNewest` remain — the dedup-state analog of the reference's
    * FIFO metrics eviction (`server/src/metrics.rs:14-21`): membership
    * older than the horizon expires, and a re-occurrence of an expired
    * document is re-admitted BY DESIGN (bounded state beats unbounded
    * perfect memory at 100 TB). Age = directory commit time, oldest
    * first ([[batchTags]] order). Returns the expired tags.
    *
    * Horizon is counted in BATCH DIRS, and a compacted dir counts as
    * one — so a maintenance sweep expires BEFORE it compacts
    * ([[maintenanceTask]] order): the horizon then applies to the
    * individual recent appends, not to an age-flattened merge.
    *
    * `batch=init` is PROTECTED by default (round 19): the bootstrap
    * seed ([[BandStore.fromSignatures]]) holds the ENTIRE landed
    * corpus as one dir, so a dir-counted horizon smaller than the dir
    * count would silently drop all pre-stream membership. The
    * protection window closes itself: the first compaction folds
    * `init` into merged `compacted-<n>` state, which then ages as one
    * unit per the paragraph above. Pass `protectInit = false` to
    * expire a bootstrap seed deliberately. */
  def expireBatches(retainNewest: Int,
      protectInit: Boolean = true): Seq[String] =
    StoreState.withWrite(dir) {
      require(retainNewest >= 0, s"retainNewest: $retainNewest")
      val tags = batchTags()
      val candidates =
        if (protectInit) tags.filterNot(_ == "init") else tags
      val drop = candidates.dropRight(retainNewest)
      drop.foreach(t => deleteRecursively(storePath.resolve(s"batch=$t")))
      StoreState.pruneLog(dir, liveTags())
      drop
    }

  /** Tags of the batch dirs currently on disk (unordered). */
  private def liveTags(): Set[String] =
    listBatchDirs()
      .map(_.getFileName.toString.stripPrefix("batch=")).toSet

  /** The store's maintenance pass as a schedulable task — registered
    * with the engine's background workers
    * ([[graft.core.Workers.registerMaintenance]]), the same cadence
    * class as segment GC (the reference's worker loop,
    * `server/src/worker/mod.rs:11-44`). Per sweep: expire past the
    * retention horizon first (if configured), then compact when the
    * store has fragmented past `compactAtBatches` dirs — so steady
    * small appends cost one merge per threshold crossing, not one per
    * sweep, and lookups keep tight row-group stats forever. */
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

object BandStore {

  /** Hard cap on the parquet In-pushdown threshold a lookup may raise
    * to, independent of the caller's `pushdownBandLimit`: Spark expands
    * a pushed `In` into a recursively-evaluated parquet OR-chain, and
    * ~100 k values overflows the task stack (measured) — ~1 k is deep
    * enough to matter and shallow enough to be safe. A store opened
    * with a larger `pushdownBandLimit` still pushes the `In` predicate,
    * but past this cap parquet-mr degrades it to a (useless) min/max
    * range rather than a stack hazard. */
  val SafeInPushdownCap: Int = 1024

  /** Path-count threshold below which store reads list directories on
    * the DRIVER instead of launching a distributed listing job (the
    * session clone raises `parallelPartitionDiscovery.threshold` to
    * this). A store read passes live-batches × nBuckets directory
    * paths — maintenance-bounded, typically well under this — and the
    * default threshold (32) turned every read into a ~100 ms listing
    * JOB over tiny directories. Past this count (a store left
    * unmaintained, or object-store-large bucket counts) the
    * distributed listing still kicks in. */
  val ListingThreshold: Int = 4096

  /** Raise the lookup-session clone's driver-listing threshold — ONLY
    * when the session still carries Spark's default (32): a deployment
    * that deliberately lowered (or otherwise pinned) the threshold, e.g.
    * to bound driver-side listing on a slow object store, keeps its
    * setting (r21 ADVICE — the r21 version raised unconditionally).
    * Overridable via `-Dgraft.store.listing.threshold=<n>` (the
    * `graft.store.lease.ms` pattern). */
  private[operators] def raiseListingThreshold(
      c: org.apache.spark.sql.SparkSession): Unit = {
    val lkey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val sparkDefault = 32
    val lcur = c.conf.getOption(lkey).map(_.toInt).getOrElse(sparkDefault)
    val want = Integer.getInteger("graft.store.listing.threshold",
      ListingThreshold).intValue
    if (lcur == sparkDefault && want > lcur) c.conf.set(lkey, want.toString)
  }

  private val CompactedTag = "batch=compacted-([0-9]+)".r

  /** Open (or lazily create at first append) the store at `dir`. */
  def open(spark: SparkSession, dir: String, nBuckets: Int = 64,
      pushdownBandLimit: Int = 1024,
      broadcastBandLimit: Int = 1000000): BandStore = {
    require(nBuckets > 0 && pushdownBandLimit > 0 &&
      broadcastBandLimit >= pushdownBandLimit)
    new BandStore(spark, dir, nBuckets, pushdownBandLimit,
      broadcastBandLimit)
  }

  /** Bootstrap a store from an existing signature table (the batch
    * backfill → streaming handoff): lands the distinct band set as one
    * `batch=init` append. No-op if `init` is already landed. */
  def fromSignatures(spark: SparkSession, dir: String, sigs: DataFrame,
      rowsPerBand: Int = 2, nBuckets: Int = 64): BandStore = {
    val store = open(spark, dir, nBuckets)
    store.append(Dedup.bandRows(sigs, rowsPerBand).select("band"), "init")
    store
  }

  private def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
