package graft.tools

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: build a plain session (no special confs),
  * call SparkEntry.entry, require rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows=$n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
