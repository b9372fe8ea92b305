package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series smoothing in exact integer arithmetic. A weighted
  * moving average over a FIXED trailing window is a dot product with the
  * lag vector — expressible as one partitioned window pass, no recursion,
  * no floats: emit the integer numerator `Σ wᵢ·v_{t−i}` and the weight
  * mass actually present `Σ wᵢ·[v_{t−i} exists]`, and let the consumer
  * divide (or compare cross-series) however it wants. Exact, replayable,
  * and series-start-honest — early buckets carry their smaller true mass
  * instead of a silently-rescaled average.
  */
object TimeSeries {

  /** Per-group OLS trend (slope per second + mean level): the "is this
    * metric drifting up" report, one grouped aggregate of exact moments.
    * x is recentered to seconds-from-group-min FIRST (keeps x² sums in
    * long range and conditions the arithmetic), y-moments accumulate as
    * DECIMAL(38,10) ([[graft.operators.Correlation]] pattern), and the
    * slope assembles in double from the exact sums — engine-replayable
    * after rounding. Degenerate groups (single point / zero x-variance)
    * yield null slope. */
  def groupTrend(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val rows = df.filter(col(valueCol).isNotNull)
    val mins = rows.groupBy(col(groupCol))
      .agg(min(unix_timestamp(col(tsCol))).as("_t0"))
    val m = rows.join(broadcast(mins), Seq(groupCol))
      .select(col(groupCol),
        (unix_timestamp(col(tsCol)) - col("_t0")).as("_x"),
        col(valueCol).as("_y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast(DoubleType).as("_n"),
        sum(col("_x")).cast(DoubleType).as("_sx"),
        // per-row x² fits a long; the SUM may not — decimal accumulation
        sum((col("_x") * col("_x")).cast(DecimalType(38, 0)))
          .cast(DoubleType).as("_sxx"),
        sum(col("_y").cast(DecimalType(38, 10))).cast(DoubleType).as("_sy"),
        sum((col("_x") * col("_y")).cast(DecimalType(38, 10)))
          .cast(DoubleType).as("_sxy"))
    val den = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val slope = (col("_n") * col("_sxy") - col("_sx") * col("_sy")) / den
    m.select(col(groupCol), col("_n").cast("long").as("n"),
      when(den === 0, lit(null).cast(DoubleType))
        .otherwise(graft.core.Semantics.safeRound(slope, scale))
        .as("slope_per_sec"),
      graft.core.Semantics.safeRound(col("_sy") / col("_n"), 4).as("mean"))
      .orderBy(col(groupCol))
  }

  /** First-order Markov transition matrix over per-key ordered state
    * sequences — the behavioral-flow report (which event follows which,
    * per user, aggregated corpus-wide). One per-key lag window + one
    * (from, to) aggregate; probabilities are exact counts over exact
    * row-total counts, rounded. `order` must totally order each key's
    * rows (add an id tie-break). */
  def transitions(df: DataFrame, keyCol: String, order: Seq[Column],
      stateCol: String, scale: Int = 4): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val pairs = df
      .withColumn("_from", lag(col(stateCol), 1).over(w))
      .filter(col("_from").isNotNull)
      .groupBy(col("_from").as("from_state"),
        col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("_tot"))
    pairs.join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        graft.core.Semantics.safeRound(
          col("n").cast(org.apache.spark.sql.types.DoubleType) /
            col("_tot").cast(org.apache.spark.sql.types.DoubleType), scale)
          .as("p"))
      .orderBy(col("from_state"), col("to_state"))
  }

  /** @param weights newest-first (weights(0) multiplies the current row). */
  def weightedMovingSum(df: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, weights: Seq[Long]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0),
      "need positive newest-first weights")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol).asc)
    val lags: Seq[(Column, Long)] = weights.zipWithIndex.map {
      case (wt, i) => (lag(col(valueCol), i).over(w), wt)
    }
    val num = lags.map { case (l, wt) => coalesce(l, lit(0L)) * lit(wt) }
      .reduce(_ + _)
    val den = lags.map { case (l, wt) =>
      when(l.isNotNull, lit(wt)).otherwise(lit(0L)) }
      .reduce(_ + _)
    df.select(col(keyCol), col(bucketCol), col(valueCol),
      num.as("wsum"), den.as("wmass"))
  }

  /** EWMA with α = 1/2 over the last `depth` observations, in PURE integer
    * arithmetic: `ewma_scaled = Σ_j x_{t-j} · 2^(depth-1-j)` — the
    * exponential weights are exact powers of two, so the smoothed series
    * is a BIGINT (divide by `wmass` for the normalized value). The
    * truncation error vs the infinite recursion is ≤ 2^-depth of the
    * signal. Same per-key lag-window shape as [[weightedMovingSum]]. */
  def ewmaDyadic(df: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, depth: Int = 16): DataFrame = {
    require(depth >= 1 && depth <= 62, s"depth out of range: $depth")
    weightedMovingSum(df, keyCol, bucketCol, valueCol,
      (0 until depth).map(j => 1L << (depth - 1 - j)))
  }

  /** Linear interpolation of NULL values in each key's ordered series:
    * interior gaps fill with prev + (next − prev)·(i − iₚ)/(iₙ − iₚ) over
    * ROW positions; boundary NULLs (no neighbor on one side) stay NULL.
    * Two bounded-frame windows (running last-non-null each direction) —
    * no self-join, one shuffle on the key. The arithmetic is a fixed
    * left-to-right expression over identical operands, so results are
    * engine-portable at a fixed rounding. */
  def interpolateLinear(df: DataFrame, keyCol: String, order: Seq[Column],
      valueCol: String, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val base = df.withColumn("_rn", row_number().over(wOrd))
    // BOTH neighbor scans are running `UNBOUNDED PRECEDING TO CURRENT ROW`
    // frames — the only frame shape Spark evaluates incrementally (O(n)
    // per key). The "next" side runs over the REVERSED sort instead of an
    // UNBOUNDED FOLLOWING frame: Spark re-aggregates a following frame
    // from scratch at every row (O(n²) — measured 116 s vs 0.6 s at
    // sf0.1), and sliding `... TO 1 PRECEDING` frames degrade the same
    // way. Including the current row is semantics-neutral: only NULL rows
    // read the neighbor columns, and they contribute nothing to
    // last/max/min over the frame.
    val v = col(valueCol).cast(DoubleType)
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("_rn").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNextRev = Window.partitionBy(col(keyCol)).orderBy(col("_rn").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = base
      .withColumn("_pv", last(when(v.isNotNull, v), ignoreNulls = true)
        .over(wPrev))
      .withColumn("_pr", max(when(v.isNotNull, col("_rn"))).over(wPrev))
      .withColumn("_nv", last(when(v.isNotNull, v), ignoreNulls = true)
        .over(wNextRev))
      .withColumn("_nr", min(when(v.isNotNull, col("_rn"))).over(wNextRev))
    val interp = col("_pv") +
      (col("_nv") - col("_pv")) * (col("_rn") - col("_pr")).cast(DoubleType) /
        (col("_nr") - col("_pr")).cast(DoubleType)
    marked.withColumn("_filled",
        when(v.isNotNull, v)
          .when(col("_pv").isNotNull && col("_nv").isNotNull,
            graft.core.Semantics.safeRound(interp, scale)))
      .drop("_pv", "_pr", "_nv", "_nr")
  }

  /** Rolling median of each key's integer series over the trailing
    * `windowRows` buckets, scaled ×2 so the even-count midpoint average
    * stays a BIGINT (exact in any engine). collect+sort over a ≤
    * `windowRows`-element window — bounded state per row, partitioned per
    * key. */
  def rollingMedianX2(df: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, windowRows: Int = 5): DataFrame = {
    require(windowRows >= 1, "windowRows must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol).asc)
      .rowsBetween(-(windowRows - 1), 0)
    val arr = sort_array(collect_list(col(valueCol)).over(w))
    val k = size(arr)
    val medX2 = when(k % 2 === 1,
        element_at(arr, ((k + 1) / 2).cast("int")) * 2)
      .otherwise(element_at(arr, (k / 2).cast("int")) +
        element_at(arr, (k / 2 + 1).cast("int")))
    df.select(col(keyCol), col(bucketCol), col(valueCol),
      medX2.cast(org.apache.spark.sql.types.LongType).as("med_x2"))
  }

  /** Lag-k autocorrelation of each key's bucket-ordered integer series,
    * for k = 1..maxLag, with the Pearson-style estimator cleared of every
    * division: numerator·n² and denominator·n² are closed-form BIGINT
    * sums (n²Σxy − nS(Σx_head+Σx_tail) + (n−k)S² over n²Σx² − nS²), so
    * the only float op is the final ratio of two identical exact longs —
    * engine-portable at any aggregation order. One lag window per k over
    * the (tiny) per-key bucket series. */
  def autocorr(df: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, maxLag: Int = 3, scale: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    require(maxLag >= 1, "maxLag must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol).asc)
    val base = df.select(col(keyCol), col(bucketCol),
      col(valueCol).cast(LongType).as("_x"))
    val stats = base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_s"),
        sum((col("_x") * col("_x")).cast(DecimalType(38, 0))).as("_sxx"))
    val lagged = (1 to maxLag).map { k =>
      base.select(col(keyCol), col("_x"),
        lag(col("_x"), k).over(w).as("_xl"))
        .filter(col("_xl").isNotNull)
        .groupBy(col(keyCol))
        .agg(sum((col("_x") * col("_xl")).cast(DecimalType(38, 0)))
            .as("_sxy"),
          sum(col("_x")).as("_sh"), sum(col("_xl")).as("_st"))
        .withColumn("lag", lit(k))
    }.reduce(_ unionByName _)
    // n²-scaled numerator/denominator stay in DecimalType(38,0) all the
    // way to the final ratio: plain Long arithmetic would wrap SILENTLY
    // on long/high-magnitude series while an independent engine's BIGINT
    // raises — a cross-engine divergence class, not just an accuracy bug.
    // 38 digits bounds |Σx²|·n² at 10^38 — far past any real series
    val dN = col("_n").cast(DecimalType(38, 0))
    val dS = col("_s").cast(DecimalType(38, 0))
    val den = dN * dN * col("_sxx") - dN * dS * dS
    lagged.join(broadcast(stats), Seq(keyCol))
      .select(col(keyCol), col("lag"), col("_n").as("n"),
        // constant series have zero variance: no defined correlation
        when(den === 0, lit(null).cast(DoubleType))
          .otherwise(graft.core.Semantics.safeRound(
            (dN * dN * col("_sxy") -
              dN * dS * (col("_sh") + col("_st")).cast(DecimalType(38, 0)) +
              (col("_n") - col("lag")).cast(DecimalType(38, 0)) * dS * dS)
              .cast(DoubleType) / den.cast(DoubleType),
            scale)).as("r"))
      .orderBy(col(keyCol), col("lag"))
  }
}
