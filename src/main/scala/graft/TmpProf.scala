package graft

import org.apache.spark.sql.SparkSession

// scratch profiling main — deleted after use
object TmpProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val names = args.toSeq
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val nr = df.count()
      System.err.println(f"[prof] $n first: ${(System.nanoTime()-t0)/1e9}%.2f s ($nr rows)")
      val t1 = System.nanoTime()
      val df2 = SparkEntry.queries(n)(spark, dir)
      df2.count()
      System.err.println(f"[prof] $n second: ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
