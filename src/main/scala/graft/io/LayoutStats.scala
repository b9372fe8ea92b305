package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Zone-map (per-file min/max) clustering-quality report — the layout
  * metric that says whether a table's files can actually PRUNE on a
  * column. A point/range predicate skips a file iff the file's [min, max]
  * interval misses it, so the figure of merit is the interval OVERLAP
  * DEPTH: depth(v) = number of files whose interval covers value v. A
  * range-clustered (sorted / Z-ordered) table has depth ~1 — every probe
  * touches one file; a hash- or arrival-ordered table has depth ~n_files
  * — zone maps prune nothing and every probe is a full-table scan. This
  * is the "clustering depth" a lakehouse OPTIMIZE job reports, computed
  * from the same stats the scan planner uses.
  *
  * Depth is evaluated with an exact interval sweep, no pairwise file
  * join: depth at a file-min event v = (#mins ≤ v) − (#maxs < v), and
  * max depth over all v is attained at some min event. The two
  * cumulative counts come from [[graft.operators.Audit.cumulativeCounts]]
  * — the shard-partitioned global cumsum (no single-partition window, no
  * BNLJ), so the report itself holds at a 100k-file table. The per-file
  * min/max here come from one column-pruned scan to stay independently
  * checkable; a production variant would read parquet footers only.
  */
object LayoutStats {

  /** Batched multi-layout, multi-axis report: one (layout, axis) row each
    * with the same n_files / max_depth / avg_depth_e4 arithmetic as
    * [[zoneMapReport]], computed in ONE lazy plan — one column-pruned
    * scan per layout covering ALL axes at once, then a single
    * (layout, axis)-keyed exact cumulative sweep. The per-key sweep is a
    * window PARTITIONED by report key ordered by boundary value:
    * depth(v) = (#mins ≤ v) − (#maxs < v) exactly as the single-report
    * form, but with no driver-eager shard placement — a report key's
    * boundary rows (2·n_files) sort within one partition, fine at a
    * 100k-file table. The measurement harness win: a 2-layout × 2-axis
    * comparison costs one Spark job instead of four eager
    * cumulative-count constructions. */
  def zoneMapReportMulti(spark: SparkSession,
      layouts: Seq[(String, String)], axes: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(layouts.nonEmpty && axes.nonEmpty, "need layouts and axes")
    val stats = layouts.map { case (tag, path) =>
      spark.read.parquet(path)
        .select((input_file_name().as("_f") +:
          axes.map(a => col(a).cast(DoubleType).as(s"_v_$a"))): _*)
        .groupBy(col("_f"))
        .agg(min(col(s"_v_${axes.head}")).as(s"_mn_${axes.head}"),
          (axes.tail.map(a => min(col(s"_v_$a")).as(s"_mn_$a")) ++
            axes.map(a => max(col(s"_v_$a")).as(s"_mx_$a"))): _*)
        .select(lit(tag).as("layout"), explode(array(axes.map(a =>
          struct(lit(a).as("axis"), col(s"_mn_$a").as("_mn"),
            col(s"_mx_$a").as("_mx"))): _*)).as("_z"))
        .select(col("layout"), col("_z.axis").as("axis"),
          col("_z._mn").as("_mn"), col("_z._mx").as("_mx"))
    }.reduce(_ unionByName _).filter(col("_mn").isNotNull)
    val pts = stats
      .select(col("layout"), col("axis"), col("_mn").as("_v"),
        lit(1L).as("_c1"), lit(0L).as("_c2"))
      .unionByName(stats.select(col("layout"), col("axis"),
        col("_mx").as("_v"), lit(0L).as("_c1"), lit(1L).as("_c2")))
      .groupBy(col("layout"), col("axis"), col("_v"))
      .agg(sum(col("_c1")).as("_c1"), sum(col("_c2")).as("_c2"))
    val w = Window.partitionBy(col("layout"), col("axis"))
      .orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("_a1", sum(col("_c1")).over(w))
      .withColumn("_a2", sum(col("_c2")).over(w))
      .filter(col("_c1") > 0)
      .select(col("layout"), col("axis"), col("_c1"),
        (col("_a1") - (col("_a2") - col("_c2"))).as("_d"))
      .groupBy(col("layout"), col("axis"))
      .agg(sum(col("_c1")).cast(LongType).as("n_files"),
        max(col("_d")).cast(LongType).as("max_depth"),
        expr("(sum(_c1 * _d) * 10000) div sum(_c1)").cast(LongType)
          .as("avg_depth_e4"))
  }

  /** One row: n_files, max_depth, avg_depth_e4 (file-weighted mean depth
    * at each file's min event, e4-scaled BIGINT ratio). Files with only
    * NULLs in `valueCol` carry no zone and are excluded. */
  def zoneMapReport(spark: SparkSession, path: String,
      valueCol: String): DataFrame = {
    val df = spark.read.parquet(path)
    val files = df
      .select(input_file_name().as("_f"),
        col(valueCol).cast(DoubleType).as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy(col("_f"))
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))
    val (cum, _, _) = graft.operators.Audit.cumulativeCounts(
      files.select(col("_mn").as("_b")), files.select(col("_mx").as("_b")),
      "_b", shards = 8)
    // depth at a min event value v: mins ≤ v minus maxs strictly < v
    val depths = cum.filter(col("_c1") > 0)
      .select(col("_c1"),
        (col("_a1") - (col("_a2") - col("_c2"))).as("_d"))
    depths.agg(
      sum(col("_c1")).cast(LongType).as("n_files"),
      max(col("_d")).cast(LongType).as("max_depth"),
      expr("(sum(_c1 * _d) * 10000) div sum(_c1)").cast(LongType)
        .as("avg_depth_e4"))
  }
}
