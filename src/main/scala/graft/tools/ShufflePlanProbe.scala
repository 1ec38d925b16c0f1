package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r22): counts Exchange nodes in the two store-commit write
  * shapes — the distinct-then-repartition form the stores used through
  * r21, and the repartition-then-local-dedup form that replaces it
  * (bp = f(band), so bp-clustering co-locates every copy of a band and
  * the (bp, band) dedup needs no exchange of its own). Evidence for the
  * OPTIMIZATION_r22.md claim; not part of any bench path.
  */
object ShufflePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bands = spark.range(1000)
      .select(concat(lit("b"), col("id") % 300).as("band"))
    def bucketOf(c: org.apache.spark.sql.Column) = pmod(xxhash64(c), lit(64))
    val old =
      bands.select(col("band")).distinct()
        .withColumn("bp", bucketOf(col("band")))
        .repartition(64, col("bp"))
        .sortWithinPartitions("bp", "band")
    val fused =
      bands.select(col("band"))
        .withColumn("bp", bucketOf(col("band")))
        .repartition(64, col("bp"))
        .dropDuplicates("bp", "band")
        .sortWithinPartitions("bp", "band")
    for ((name, df) <- Seq("old" -> old, "fused" -> fused)) {
      val plan = df.queryExecution.executedPlan.toString
      val n = "Exchange".r.findAllIn(plan).size
      println(s"$name: exchanges=$n")
      println(plan.linesIterator.map("  " + _).mkString("\n"))
    }
    spark.stop()
  }
}
