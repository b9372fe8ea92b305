package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches — the 100 TB cardinality/quantile recipe. Exact
  * distinct counts need a full shuffle of every distinct value; sketches cut
  * that to a few KB per group and, critically, MERGE: build per-partition
  * (per-day, per-source) sketches once, then answer any rollup by sketch
  * union without rescanning the data. All built on Spark's native
  * DataSketches HLL / approx_percentile expressions (codegen'd, partial-
  * aggregable), no UDFs.
  *
  * Estimates are engine-specific (rows-only gate in Verify); SketchSpec
  * asserts accuracy vs exact answers and the union/merge algebra.
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol` — a binary column, storable (e.g. as
    * a parquet "sketch table") and mergeable later. lgK 12 ≈ 1.6% error. */
  def distinctSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll up stored sketches to a coarser grouping: union the binaries and
    * estimate — no rescan of the base data. */
  def mergeDistinct(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("distinct_est"))

  /** One-shot approximate distinct (HLL++): same scan cost as count, no
    * distinct shuffle. */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Approximate quantiles at scan cost (one pass, mergeable digest).
    * `accuracy` trades memory for error: err <= 1/accuracy. */
  def approxQuantiles(c: Column, probs: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(c, array(probs.map(lit): _*), lit(accuracy))
}
