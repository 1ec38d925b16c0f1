package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantReadWriteLock

import scala.jdk.CollectionConverters._

/** Shared per-directory coordination for the landed dedup-state stores
  * ([[BandStore]], [[ClusterVecStore]]) — two small mechanisms, both
  * round-19 hardening of the r18 lifecycle work:
  *
  * '''1. A read/write lock per store directory.''' A membership lookup
  * plans its parquet file list from the batch dirs present at
  * read-planning time; a maintenance pass (compaction folding dirs
  * away, retention expiring them) that deletes those dirs while the
  * lookup's scan is in flight makes the scan silently MISS landed
  * membership — and a missed member is a re-admitted duplicate (for
  * the band store) or a silently weakened semantic-dedup pass (for the
  * vector store). `ignoreMissingFiles` does NOT close that window: it
  * suppresses the error, it cannot resurrect the bands the deleted
  * dirs held, and the replacement dir committed by compaction is never
  * in the already-planned list. So the materialized lookup entry
  * points hold the READ lock for the span of list-plan-scan, and every
  * maintenance mutation holds the WRITE lock — lookups see the store
  * before a sweep or after it, never half. Lock scope is the JVM,
  * matching the stores' single-writer contract (one pipeline maintains
  * a store — the reference's single active writer per table,
  * `smoltable/src/table/writer/mod.rs`); `ignoreMissingFiles` remains
  * as best-effort tolerance for OUT-of-process administrative deletes,
  * which are outside the contract.
  *
  * '''2. A commit log per store directory''' (`_commitlog`: one
  * `<seq> <tag>` line per committed batch, append-only, rewritten on
  * maintenance). FIFO retention must drop OLDEST-BY-COMMIT, and the
  * r18 stores derived age from directory mtimes — which lie after a
  * backup restore, an rsync/cp -r relocation, or filesystem timestamp
  * drift, silently turning "expire the oldest membership" into
  * "expire arbitrary membership". The log pins the commit order
  * explicitly: a monotonic sequence is assigned under the log mutex
  * when the batch dir's ATOMIC_MOVE lands. Dirs missing from the log
  * (a crash between move and log write, or a pre-r19 store) order
  * AFTER all logged dirs by (mtime, name) — i.e. they are treated as
  * newest, which errs on the side of retaining membership.
  */
private[graft] object StoreState {

  private val locks = new ConcurrentHashMap[String, ReentrantReadWriteLock]()
  private val logMutexes = new ConcurrentHashMap[String, Object]()

  /** Cached view of a `_commitlog`: the tag set, the max sequence, and
    * the file (size, mtime, fileKey) the cache was built against.
    * [[logCommit]] appends O(1) through this instead of re-reading the
    * whole log per commit (O(n²) across the appends between maintenance
    * sweeps — the r19 fix-it); the stat check invalidates it against
    * any out-of-band edit (a restore, a manual edit, a second process)
    * at one stat per commit — size alone missed a same-byte-count
    * rewrite (r20 ADVICE), and (size, mtime) still missed one landing
    * within a single mtime tick (r21 ADVICE), so the validity tuple now
    * also carries the filesystem fileKey (inode identity), which every
    * atomic-replace rewrite changes regardless of timestamp
    * granularity. All access under the dir's log mutex. */
  private final class LogCache(
      val tags: scala.collection.mutable.Set[String],
      var maxSeq: Long,
      var fileSize: Long,
      var fileMtime: Long,
      var fileKey: String)
  private val logCaches = new ConcurrentHashMap[String, LogCache]()

  private def canonical(dir: String): String =
    Paths.get(dir).toAbsolutePath.normalize.toString

  private def lockFor(dir: String): ReentrantReadWriteLock =
    locks.computeIfAbsent(canonical(dir), _ => new ReentrantReadWriteLock())

  private def logMutex(dir: String): Object =
    logMutexes.computeIfAbsent(canonical(dir), _ => new Object)

  /** Run `f` holding the store's READ lock: materialized lookups — many
    * may run concurrently, none while maintenance holds the write
    * lock. */
  def withRead[A](dir: String)(f: => A): A = {
    val l = lockFor(dir).readLock(); l.lock()
    try f finally l.unlock()
  }

  /** Run `f` holding the store's WRITE lock: maintenance mutations
    * (compaction, retention) — excludes lookups and other maintenance.
    * Reentrant, so a locked public entry point may call another.
    *
    * Also verifies the CROSS-PROCESS owner lease (round 20): the RW
    * lock is JVM-scoped, so a second pipeline process maintaining the
    * same store dir raced silently — `ignoreMissingFiles` hid both the
    * error and the membership loss. Every write-locked mutation now
    * touches an `_owner` file carrying this JVM's token; a mutation
    * finding a DIFFERENT live token fails fast with a clean error
    * (the manifest writer-lock pattern,
    * [[Similarity]]`.withManifestWriterLock`), and a crashed owner's
    * stale lease (older than the grace window) is reclaimed so the
    * store never wedges. Best-effort single-writer enforcement, not a
    * distributed lock: cross-process LOOKUPS remain unguarded
    * (read-only, tolerated by `ignoreMissingFiles`) — the contract is
    * one maintaining process per store, now fail-fast instead of
    * trust-based. */
  def withWrite[A](dir: String)(f: => A): A = {
    val l = lockFor(dir).writeLock(); l.lock()
    try { acquireOwnerLease(dir); f } finally l.unlock()
  }

  // ---- cross-process owner lease ----

  private[graft] val OwnerFileName = "_owner"

  /** One token per JVM: every store handle in this process shares it,
    * so same-process concurrency stays governed by the RW lock alone. */
  private[graft] val jvmToken: String =
    java.util.UUID.randomUUID().toString

  /** Lease liveness window. A crashed owner's lease older than this is
    * reclaimed; a LIVE foreign lease (younger) fails the mutation.
    * Owner mtime refreshes on every write-locked mutation, so any
    * maintenance cadence under the window keeps the lease alive. */
  private def leaseMs: Long =
    sys.props.get("graft.store.lease.ms").map(_.toLong)
      .getOrElse(15L * 60L * 1000L)

  private def ownerPath(dir: String): Path =
    Paths.get(dir).resolve(OwnerFileName)

  private def acquireOwnerLease(dir: String): Unit = {
    val p = ownerPath(dir)
    val now = System.currentTimeMillis()
    val holder =
      if (!Files.exists(p)) None
      else try {
        val tok = new String(Files.readAllBytes(p),
          StandardCharsets.UTF_8).trim
        val age = now - Files.getLastModifiedTime(p).toMillis
        Some((tok, age))
      } catch { // holder freed/rewrote it mid-read: treat as absent,
        case _: java.io.IOException => None // the write below re-checks
      }
    holder match {
      case Some((tok, age)) if tok == jvmToken =>
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(now))
      case Some((tok, age)) if age <= leaseMs =>
        throw new IllegalStateException(
          s"store owner lease held by another process: $p (token " +
            s"$tok, age $age ms <= lease $leaseMs ms); the store " +
            "contract is one maintaining process per directory")
      case _ => // absent or stale: (re)claim with our token
        Files.createDirectories(Paths.get(dir))
        val tmp = Files.createTempFile(Paths.get(dir), "._owner", ".tmp")
        Files.write(tmp, s"$jvmToken\n".getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        // last-writer-wins detection (r20 ADVICE): two processes can
        // both observe the stale lease and both claim; re-reading after
        // the move makes the loser fail fast instead of proceeding into
        // a two-maintainer race.
        // BEST-EFFORT, not airtight (r21 ADVICE): with the interleaving
        // A-move, A-read(sees A), B-move, B-read(sees B), BOTH claimants
        // pass their own read-back — the check only catches the loser
        // whose read lands after the winner's move. Closing it fully
        // needs an OS-level lock held for the process lifetime
        // (FileChannel.tryLock), which trades the current
        // crash-recovers-by-lease-expiry behavior for lock-liveness
        // semantics; the stores' single-maintainer deployment contract
        // makes the narrowed window an accepted residual risk, and both
        // claimants surviving degrades to the pre-r20 documented state
        // (duplicate maintenance work, never data loss — every commit
        // is an ATOMIC_MOVE into a fresh tag).
        val won = try {
          new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
            .trim == jvmToken
        } catch { case _: java.io.IOException => false }
        if (!won) throw new IllegalStateException(
          s"store owner lease lost to a concurrent claimant: $p; the " +
            "store contract is one maintaining process per directory")
    }
  }

  // ---- commit log ----

  private def logPath(dir: String): Path =
    Paths.get(dir).resolve("_commitlog")

  private def readLog(dir: String): Seq[(Long, String)] = {
    val p = logPath(dir)
    if (!Files.exists(p)) return Seq.empty
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq.flatMap {
      line =>
        line.split(" ", 2) match {
          case Array(s, t) if t.nonEmpty => s.toLongOption.map((_, t))
          case _ => None
        }
    }
  }

  private def logStat(dir: String): (Long, Long, String) = {
    val p = logPath(dir)
    if (Files.exists(p)) {
      // fileKey may be null on filesystems without stable file identity
      // — degrade to the (size, mtime) check there
      val fk = try Option(Files.readAttributes(p,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey)
          .map(_.toString).getOrElse("")
        catch { case _: java.io.IOException => "" }
      (Files.size(p), Files.getLastModifiedTime(p).toMillis, fk)
    } else (-1L, -1L, "")
  }

  /** The dir's log cache, rebuilt from disk when absent or when the
    * file (size, mtime, fileKey) no longer matches (out-of-band edit).
    * Caller holds the log mutex. */
  private def cacheFor(dir: String): LogCache = {
    val key = canonical(dir)
    val cached = logCaches.get(key)
    val (size, mtime, fk) = logStat(dir)
    if (cached != null && cached.fileSize == size &&
        cached.fileMtime == mtime && cached.fileKey == fk) cached
    else {
      val entries = readLog(dir)
      val fresh = new LogCache(
        scala.collection.mutable.Set(entries.map(_._2): _*),
        (0L +: entries.map(_._1)).max, size, mtime, fk)
      logCaches.put(key, fresh)
      fresh
    }
  }

  /** Record `tag` as the next commit in the store's log — idempotent
    * (an already-logged tag is not re-appended). Call right AFTER the
    * batch dir's ATOMIC_MOVE; a crash between the two leaves an
    * unlogged dir, which [[orderKey]] treats as newest. O(1) per
    * commit through the size-validated [[LogCache]]. */
  def logCommit(dir: String, tag: String): Unit =
    logMutex(dir).synchronized {
      val cache = cacheFor(dir)
      if (!cache.tags(tag)) {
        val next = cache.maxSeq + 1L
        Files.createDirectories(Paths.get(dir))
        val line = s"$next $tag\n".getBytes(StandardCharsets.UTF_8)
        Files.write(logPath(dir), line,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        cache.tags += tag
        cache.maxSeq = next
        val (size, mtime, fk) = logStat(dir)
        cache.fileSize = size
        cache.fileMtime = mtime
        cache.fileKey = fk
      }
      ()
    }

  /** The logged commit sequence per tag. */
  def loggedSeq(dir: String): Map[String, Long] =
    logMutex(dir).synchronized {
      readLog(dir).map { case (s, t) => (t, s) }.toMap
    }

  /** Drop log entries for batch dirs that no longer exist (compaction /
    * retention hygiene — keeps the log proportional to the LIVE dirs,
    * not to every batch ever landed). Atomic rewrite (temp + move). */
  def pruneLog(dir: String, liveTags: Set[String]): Unit =
    logMutex(dir).synchronized {
      val entries = readLog(dir)
      val kept = entries.filter(e => liveTags(e._2))
      if (kept.size != entries.size) {
        val tmp = Files.createTempFile(Paths.get(dir), "._commitlog", ".tmp")
        Files.write(tmp,
          kept.map { case (s, t) => s"$s $t\n" }.mkString
            .getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, logPath(dir), StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        logCaches.remove(canonical(dir))
      }
      ()
    }

  /** Oldest-first ordering key for a committed batch dir: logged
    * commit sequence when present, else (after every logged dir) by
    * commit mtime with the tag as deterministic tie-break. */
  def orderKey(seqs: Map[String, Long], p: Path)
      : (Long, Long, String) = {
    val tag = p.getFileName.toString.stripPrefix("batch=")
    seqs.get(tag) match {
      case Some(s) => (s, 0L, tag)
      case None =>
        (Long.MaxValue, Files.getLastModifiedTime(p).toMillis, tag)
    }
  }
}
