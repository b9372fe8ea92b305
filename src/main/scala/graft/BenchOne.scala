package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: time a named subset of gates at sf0.1 under the exact Bench
  * session config — for iterating on one operator without the full suite. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-bench-one")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q_agg_metrics")(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
    for (q <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"[bench1] $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
