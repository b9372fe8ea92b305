package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 attribution probes (guide §1: measure first, isolate with the
  * noop sink). Each sub-probe times one suspect sub-stage so OPTIMIZATION_r14
  * can attribute a gate's cost to a specific operator decision instead of
  * guessing. Run: `sbt "runMain graft.ProbeR14 <dir> <probe> [reps]"`. */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val probe = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, dir, probe, reps) finally spark.stop()
  }

  private def time[A](spark: SparkSession, label: String, reps: Int)(f: => A): Unit = {
    var best = Double.MaxValue
    (1 to reps).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      best = math.min(best, sec)
      println(f"[probe] $label rep$i: $sec%.3f s")
    }
    println(f"[probe] $label BEST: $best%.3f s")
  }

  private def run(spark: SparkSession, dir: String, probe: String, reps: Int): Unit = {
    def t(s: SparkSession, d: String, name: String) =
      graft.core.Tables.table(s, d, name)
    probe match {
      case "corr" =>
        // the q_corr_matrix moment pass, three spellings of the 14 sums
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val base = t(spark, dir, "lineitem").select(cols.map(col): _*)
        val complete = graft.core.Rebalance.computeDense(base)
          .filter(cols.map(col(_).isNotNull).reduce(_ && _))
        val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (i, j)
        def aggsWith(dsum: (Column, String) => Column) =
          cols.zipWithIndex.map { case (c, i) => dsum(col(c), s"_s$i") } ++
          cols.zipWithIndex.map { case (c, i) => dsum(col(c) * col(c), s"_q$i") } ++
          pairs.map { case (i, j) => dsum(col(cols(i)) * col(cols(j)), s"_p${i}_$j") } :+
          count(lit(1)).cast(DoubleType).as("_n")
        val dec128 = aggsWith((c, n) =>
          graft.functions.Dec128.sumExact(c).cast(DoubleType).as(n))
        val castDec = aggsWith((c, n) =>
          sum(c.cast(DecimalType(38, 10))).cast(DoubleType).as(n))
        val dbl = aggsWith((c, n) => sum(c).as(n))
        // decisive codegen check: fallback=false throws if janino fails
        spark.conf.set("spark.sql.codegen.fallback", "false")
        time(spark, "corr/dec128-nofallback", reps) {
          complete.agg(dec128.head, dec128.tail: _*).head()
        }
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        time(spark, "corr/dec128-nowscg", reps) {
          complete.agg(dec128.head, dec128.tail: _*).head()
        }
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        time(spark, "corr/scan-only", reps) {
          complete.agg(count(lit(1))).head()
        }
        time(spark, "corr/double", reps) {
          complete.agg(dbl.head, dbl.tail: _*).head()
        }
        time(spark, "corr/dec128", reps) {
          complete.agg(dec128.head, dec128.tail: _*).head()
        }
        time(spark, "corr/castdec", reps) {
          complete.agg(castDec.head, castDec.tail: _*).head()
        }
      case other => sys.error(s"unknown probe: $other")
    }
  }
}
