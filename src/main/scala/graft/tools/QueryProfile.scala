package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB time budget of one contract query: runs the named query under
  * a listener that records every job's (description, duration), then
  * prints the table sorted by cost — the "which action inside this
  * composed operator eats the seconds" view the Spark UI gives, without
  * a UI (guide §1.5/§7.1). Used for the optimization rounds' measure
  * phase; prints nothing a bench consumes.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.QueryProfile ext_stream_curate [runs]"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <query> [runs]")
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        // stage callsites identify the operator when no description is set
        val sites = j.stageInfos.map(_.name.takeWhile(_ != '+').trim)
          .distinct.mkString(" | ")
        starts.put(j.jobId, (j.time, s"$desc [$sites]"))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          rows.add((j.jobId, desc, j.time - t0))
        }
      }
      override def onStageCompleted(
          st: SparkListenerStageCompleted): Unit = {
        val i = st.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        if (wall >= 150) println(
          f"    stage ${i.stageId}%4d ${wall}%6d ms " +
          f"tasks=${i.numTasks}%3d run=${i.taskMetrics.executorRunTime}%5d " +
          f"ser=${i.taskMetrics.resultSerializationTime}%4d " +
          s"${i.name.take(90)}")
      }
    })

    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up run, then measured runs with per-job capture
    val warm = run()
    println(f"[$name] warm-up: $warm%.3f s")
    (1 to runs).foreach { i =>
      rows.clear()
      val t = run()
      Thread.sleep(300) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(_._1)
      val total = all.map(_._3).sum
      println(f"[$name] run $i: $t%.3f s wall, ${all.size} jobs, " +
        f"${total / 1000.0}%.3f s summed job time")
      all.foreach { case (id, desc, ms) =>
        println(f"  job $id%4d  $ms%6d ms  ${desc.take(100)}")
      }
    }
    spark.stop()
  }
}
