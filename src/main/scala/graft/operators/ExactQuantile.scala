package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** EXACT order statistics without a global sort — the 100 TB answer to
  * "what is the true median". A full sort of 100 TB is a cluster-wide
  * range shuffle; Spark's exact `percentile` aggregate materializes a
  * value→count map per group (OOM at high value cardinality); sketches
  * (approx_percentile, KLL) are approximate by design. Iterative histogram
  * narrowing gets the EXACT k-th smallest in O(log_bins(range)) full scans
  * with O(bins) driver state per round: histogram the candidate range,
  * walk the (bounded, collected) bin counts to find the bin holding rank
  * k, restrict to that bin, repeat until the survivor set fits a direct
  * top-k. Two or three scans at any scale — each a pushed-down range
  * filter + one codegen'd aggregate, no shuffle wider than `bins` rows.
  *
  * Selection-by-rank is tie-stable (the VALUE at rank k is unique even
  * when row order among duplicates isn't), so results are exact and
  * engine-portable. Bucketing uses the same expression for assignment and
  * for the narrowing filter, so float boundary rounding can't misroute a
  * row between rounds. Progress is guaranteed: with >= 2 distinct values
  * in [lo,hi], lo routes to bucket 0 and hi to bucket bins-1, so every
  * round strictly shrinks either the range or the survivor count.
  */
object ExactQuantile {

  private def bucketOf(lo: Double, hi: Double, bins: Int) =
    least(
      floor((col("_v") - lit(lo)) / lit(hi - lo) * lit(bins.toDouble))
        .cast(LongType),
      lit(bins - 1L))

  /** (n, lo, hi) of the survivor frame — one aggregate, one driver row. */
  private def stats(cur: DataFrame): (Long, Double, Double) = {
    val s = cur.agg(count(lit(1)).as("n"), min(col("_v")).as("lo"),
      max(col("_v")).as("hi")).head()
    if (s.getLong(0) == 0L) (0L, 0.0, 0.0)
    else (s.getLong(0), s.getDouble(1), s.getDouble(2))
  }

  /** <= bins rows on the driver: (bucket, count), bucket-ascending. */
  private def histogram(cur: DataFrame, lo: Double, hi: Double,
      bins: Int): Array[(Long, Long)] =
    cur.groupBy(bucketOf(lo, hi, bins).as("_b")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

  /** Bucket holding rank `k` plus the count strictly below it. */
  private def locate(hist: Array[(Long, Long)],
      k: Long): (Long, Long) = {
    var below = 0L
    var i = 0
    while (i < hist.length) {
      val (b, cnt) = hist(i)
      if (below + cnt >= k) return (b, below)
      below += cnt
      i += 1
    }
    throw new IllegalArgumentException(
      s"rank $k exceeds survivor count $below")
  }

  /** Direct selection on a small survivor frame: two bounded top-k sorts
    * (take the `rank` smallest, then the largest of those). */
  private def direct(cur: DataFrame, rank: Long): Double =
    cur.orderBy(col("_v").asc).limit(rank.toInt)
      .orderBy(col("_v").desc).limit(1).head().getDouble(0)

  private def kthRec(cur0: DataFrame, rank0: Long, bins: Int,
      directCutoff: Long): Double = {
    var cur = cur0
    var rank = rank0
    while (true) {
      val (n, lo, hi) = stats(cur)
      require(rank <= n, s"rank $rank exceeds remaining count $n")
      if (lo == hi) return lo
      if (n <= directCutoff) return direct(cur, rank)
      val (chosen, below) = locate(histogram(cur, lo, hi, bins), rank)
      rank -= below
      cur = cur.filter(bucketOf(lo, hi, bins) === lit(chosen))
    }
    0.0 // unreachable
  }

  /** Non-null, non-NaN values as `_v`: NaN poisons the bucket arithmetic
    * ((NaN−lo)/width floors to NaN, whose ANSI long cast throws) and has
    * no defined rank — excluded like null, stated in the contract. */
  private def cleanVals(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull && !isnan(v)).select(v.as("_v"))
  }

  /** The exact k-th smallest (1-based) value of `valueCol`; nulls and NaNs
    * are excluded. */
  def kthSmallest(df: DataFrame, valueCol: String, k: Long,
      bins: Int = 256, directCutoff: Long = 20000L): Double = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    kthRec(cleanVals(df, valueCol), k, bins, directCutoff)
  }

  /** Equi-depth bucketing WITHOUT a sort: cut points are the exact values
    * at ranks ceil(i·n/b) (integer-exact arithmetic — no float rank), found
    * by the shared-pass multi-rank selection; rows get
    * bin = count(cuts strictly below value), a driver-built when-chain over
    * <= b−1 literals (codegen'd, no join). Ties sharing a cut value share a
    * bin, duplicate cut values skip a bin — both deterministic, so the
    * assignment replays exactly in any engine from the same rank spec. The
    * feature-engineering "quantile bucketizer" at 100 TB: O(log) scans for
    * the cuts + one projection pass, vs Spark ML's QuantileDiscretizer
    * (approximate) or a full sort. */
  def equiDepthBucketize(spark: SparkSession, df: DataFrame,
      valueCol: String, b: Int, binCol: String = "bin",
      bins: Int = 256, directCutoff: Long = 20000L): DataFrame = {
    require(b >= 2, s"b must be >= 2, got $b")
    val vc = col(valueCol).cast("double")
    val vals = df.filter(vc.isNotNull && !isnan(vc))
    val n = vals.count()
    require(n >= 1, "input has no non-null, non-NaN values")
    val ranks = (1 until b).map(i => (i.toLong * n + b - 1) / b)
      .filter(_ >= 1).distinct
    // dedupe cut VALUES (distinct ranks can land on equal values in
    // duplicate-heavy data) — double-counting a repeated cut would skip
    // bins differently from the count-distinct-cuts-below spec
    val cuts = kthSmallestMulti(spark, vals, valueCol, ranks, bins,
      directCutoff).collect().map(_.getDouble(1)).distinct.sorted
    val bin = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(valueCol) > lit(c), 1).otherwise(0)
    }
    vals.withColumn(binCol, bin.cast(LongType))
  }

  /** Exact values at several ranks with the expensive first rounds SHARED:
    * one stats pass + one full-data histogram serve every rank; ranks that
    * land in the same bucket keep sharing the narrowed frame. Returns
    * (k, value) rows. This is the scale shape — p25/p50/p75/p99 of 100 TB
    * cost one extra filtered scan each beyond the shared first pass, not a
    * private narrowing cascade per rank. */
  def kthSmallestMulti(spark: SparkSession, df: DataFrame, valueCol: String,
      ks: Seq[Long], bins: Int = 256,
      directCutoff: Long = 20000L): DataFrame = {
    import spark.implicits._
    require(ks.nonEmpty, "ks must be non-empty")
    require(ks.forall(_ >= 1), s"all ranks must be >= 1, got $ks")
    val vals = cleanVals(df, valueCol)
    val sorted = ks.distinct.sorted
    val (n, lo, hi) = stats(vals)
    require(sorted.last <= n, s"rank ${sorted.last} exceeds count $n")
    val results: Seq[(Long, Double)] =
      if (lo == hi) sorted.map(_ -> lo)
      else if (n <= directCutoff) sorted.map(k => k -> direct(vals, k))
      else {
        val hist = histogram(vals, lo, hi, bins)
        sorted.map(k => (k, locate(hist, k)))
          .groupBy { case (_, (bucket, _)) => bucket }
          .toSeq
          .flatMap { case (bucket, group) =>
            val narrowed = vals.filter(bucketOf(lo, hi, bins) === lit(bucket))
            group.map { case (k, (_, below)) =>
              k -> kthRec(narrowed, k - below, bins, directCutoff)
            }
          }
      }
    results.sortBy(_._1).toDF("k", "value")
  }
}
