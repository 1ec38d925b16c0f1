package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.{HttpApiServer, JsonApi}
import graft.core.Catalog

/** Standalone server entrypoint, mirroring the reference's
  * (`server/src/main.rs:36-60`, env names `server/src/env.rs:9-24`):
  * `SMOLTABLE_DATA` is the catalog root (default `.smoltable_data`),
  * `SMOLTABLE_HTTP_PORT`/`SMOLTABLE_PORT`/`HTTP_PORT`/`PORT` pick the
  * listen port (default 9876). Also starts the background maintenance
  * workers (`server/src/worker/mod.rs`).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val dataDir = sys.env.getOrElse("SMOLTABLE_DATA", ".smoltable_data")
    val port = Seq("SMOLTABLE_HTTP_PORT", "SMOLTABLE_PORT", "HTTP_PORT", "PORT")
      .flatMap(sys.env.get).headOption.map(_.toInt).getOrElse(9876)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val catalog = new Catalog(dataDir)
    new graft.core.Workers(spark, catalog).start()
    // server mode records per-call lat#* self-metrics, like the reference
    val srv = new HttpApiServer(
      new JsonApi(catalog, spark, recordLatencies = true), port)
    val bound = srv.start()
    println(s"smoltable-spark server listening on 0.0.0.0:$bound (data: $dataDir)")
    Thread.currentThread().join()
  }
}
