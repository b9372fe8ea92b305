package graft.service

import org.apache.spark.sql.SparkSession

/** Runnable analytics server: serves the full HTTP facade (dashboard
  * query/drill-down/filter-values/schema, anomalies, insights,
  * visualizations, unified + staged pipelines) over the parquet tables in
  * a data directory — the reference's `uvicorn src.api.main:app` moment.
  *
  *   sbt "runMain graft.service.HttpMain /root/testdata/sf0.01 8080"
  *
  * Table names resolve to `<dir>/<name>.parquet`.
  */
object HttpMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(8080)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-http")
      .config("spark.sql.shuffle.partitions", "32")
      // dashboard = many users: FAIR scheduling time-slices concurrent
      // requests' jobs (each HttpFacade thread tags its own pool) instead
      // of FIFO-queueing light queries behind heavy ones
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val http = new HttpFacade(Facade.Tables(graft.core.Tables.table(spark, dir, _)))
    val bound = http.start(port)
    System.err.println(s"[graft-http] serving $dir on http://127.0.0.1:$bound")
    Thread.currentThread().join() // serve until killed
  }
}
