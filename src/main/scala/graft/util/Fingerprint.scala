package graft.util

/** size + mtime fingerprint of a file-or-directory tree — the
  * cache-staleness key for every /tmp derived artifact AND for
  * in-memory per-JVM caches over driver-owned sources: a regenerated
  * source gets a different fingerprint, hence a different cache key,
  * hence a rebuild/re-probe instead of silently serving stale state.
  *
  * Folded over every regular file in relative-path order so nested
  * rewrites (e.g. a partitioned source's leaf files) are visible; a
  * missing source fails fast instead of silently fingerprinting as
  * empty.
  */
object Fingerprint {
  def of(path: String): Long = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    require(java.nio.file.Files.exists(root),
      s"fingerprint source does not exist: $path")
    val st = java.nio.file.Files.walk(root)
    val parts =
      try st.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .toSeq.sortBy(p => root.relativize(p).toString)
      finally st.close()
    parts.foldLeft(0L) { (acc, p) =>
      val f = p.toFile
      31 * (31 * acc + f.length) + f.lastModified
    }
  }
}
