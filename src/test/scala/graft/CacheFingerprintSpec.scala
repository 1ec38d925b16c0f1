package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The /tmp caches behind the `eng_*` queries must be keyed on a SOURCE
  * fingerprint: if the driver regenerates testdata, a stale cache would
  * silently serve old cells to every engine-backed oracle row. These tests
  * pin the staleness contract without touching Spark.
  */
class CacheFingerprintSpec extends AnyFunSuite {

  private def tempSource(name: String): (String, File) = {
    val dir = Files.createTempDirectory("graft_fp").toString
    val f = new File(dir, name)
    Files.write(f.toPath, "v1-bytes".getBytes("UTF-8"))
    (dir, f)
  }

  test("engine orders cache path changes when the source parquet changes") {
    val (dir, f) = tempSource("orders.parquet")
    val p1 = SparkEntry.engineCachePath(dir, buckets = 0)
    // same source → same path (the cache must actually hit)
    assert(SparkEntry.engineCachePath(dir, buckets = 0) == p1)
    // touched mtime → different path → rebuild
    assert(f.setLastModified(f.lastModified() + 5000))
    val p2 = SparkEntry.engineCachePath(dir, buckets = 0)
    assert(p2 != p1, "touched source must move the cache path")
    // grown file → different path
    Files.write(f.toPath, "v2-bytes-longer".getBytes("UTF-8"))
    assert(SparkEntry.engineCachePath(dir, buckets = 0) != p2)
    // bucketed variant never collides with the plain one
    assert(SparkEntry.engineCachePath(dir, buckets = 16) !=
      SparkEntry.engineCachePath(dir, buckets = 0))
  }

  test("ann layout path fingerprints the source and the LSH geometry") {
    val (dir, f) = tempSource("embeddings.parquet")
    val p1 = SparkEntry.annLayoutPath(dir)
    assert(SparkEntry.annLayoutPath(dir) == p1)
    // the geometry and format version ride in the key, so a parameter or
    // layout-shape change orphans old caches instead of probing them
    import graft.operators.Similarity._
    assert(p1.contains(s"t${DefaultTables}p${DefaultPlanes}d$DefaultDim"))
    assert(p1.contains("graft_ann_v"))
    assert(f.setLastModified(f.lastModified() + 5000))
    assert(SparkEntry.annLayoutPath(dir) != p1,
      "touched source must move the layout path")
  }

  test("ivf layout path fingerprints the source and the IVF geometry") {
    val (dir, f) = tempSource("embeddings.parquet")
    val p1 = SparkEntry.ivfLayoutPath(dir)
    assert(SparkEntry.ivfLayoutPath(dir) == p1)
    import graft.operators.Similarity._
    assert(p1.contains(s"s${DefaultIvfStride}d$DefaultDim"))
    assert(p1.contains("graft_ivf_v"))
    assert(f.setLastModified(f.lastModified() + 5000))
    assert(SparkEntry.ivfLayoutPath(dir) != p1,
      "touched source must move the layout path")
  }
}
