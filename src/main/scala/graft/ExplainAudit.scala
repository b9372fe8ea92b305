package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val targets = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_filter_eq", "q_agg_dashboard", "q_join_broadcast",
        "q_join_large", "q_dedup_exact", "q_dashboard_provider"))
    targets.foreach { name =>
      println(s"\n########## $name ##########")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
