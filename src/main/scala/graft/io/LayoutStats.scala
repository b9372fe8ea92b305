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
