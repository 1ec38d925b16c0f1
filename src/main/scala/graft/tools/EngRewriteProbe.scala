package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the engine rewrite path's pieces in isolation — scan, scan+LWW,
  * and the full compact — on a throwaway clone of the cached orders
  * table with one shadowing upsert (the eng_compact fixture). r21
  * optimization-round diagnostics. */
object EngRewriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.model._
    import graft.core.{ColumnWriteItem, RowWriteItem}
    def mkClone(): graft.core.Smoltable = {
      // the eng_compact construction minus the timing
      graft.SparkEntry.queries("eng_scan_prefix")(spark, sfDir).count()
      val base = graft.SparkEntry.engineCachePath(sfDir, 0)
      val t = graft.core.Smoltable.openClone(spark, base, "orders")
      t.write(Seq(
        RowWriteItem("0000000001", Seq(
          ColumnWriteItem(ColumnKey.of("o:status"), Some(0L),
            CellValue.S("X")))),
        RowWriteItem("0000000042", Seq(
          ColumnWriteItem(ColumnKey.of("m:total"), Some(0L),
            CellValue.F64(123.45))))))
      t
    }
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val t = mkClone()
      time("clone+write (above, untimed)") {}
      time("allCells noop (incl LWW window)") {
        t.allCells.write.format("noop").mode("overwrite").save()
      }
      time("allCells count only") { t.allCells.count() }
      time("compact()") { t.compact() }
      time("post-compact read noop") {
        t.allCells.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
