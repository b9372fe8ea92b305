package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Cross-engine-REPLAYABLE HyperLogLog (Flajolet et al. 2007): a distinct-
  * count sketch whose entire state is derived from md5 hex arithmetic, so
  * any SQL engine with md5 + regexp can rebuild the registers bit-for-bit
  * and hash-verify them — unlike binary HLL blobs (DataSketches,
  * approx_count_distinct) whose internals are engine-private and only
  * accuracy-testable. The price is md5 instead of a faster hash; the win is
  * that the sketch TABLE (group cols, bucket, register) is an auditable,
  * portable artifact: build it once per day/source at 100 TB scale
  * (one scan, ≤2^p rows of state per group), store it as parquet, and any
  * engine — Spark, DuckDB, Trino — can verify, merge, and estimate from it.
  *
  * Spec (fixed, shared with the DuckDB oracle twin):
  *  - h       = md5(cast(value as string)) — 32 hex chars
  *  - bucket  = first p/4 hex chars of h (kept AS TEXT: no int conversion
  *              needed cross-engine), so m = 2^p buckets; p % 4 == 0
  *  - w       = next 16 hex chars (64 tail bits)
  *  - rho     = 4·(leading '0' hex chars of w) + lz(first non-zero char)
  *              + 1, capped at 64 (lz: '1'→3, '2'-'3'→2, '4'-'7'→1,
  *              else→0); the cap keeps the harmonic term exponent bounded
  *  - register[bucket] = max(rho); merge = bucket-wise max
  *  - estimate: S = Σ_buckets 2^(−rho) with empty buckets contributing
  *    2^0; kept integer-exact as S2 = Σ 2^(64−rho) + empties·2^64
  *    (DECIMAL(38,0) — each term ≤ 2^63, ≤ 2^p terms), so
  *    E = α_m·m²·2^64 / S2; linear counting E = m·ln(m/V) when
  *    E ≤ 2.5m and V = empty buckets > 0.
  *
  * All expressions are built-in column functions (codegen'd, partial-agg
  * friendly); the only shuffle is the groupBy on (group, bucket).
  */
object ReplayableHll {

  /** rho for the 16-hex-char tail `w` (see spec above). */
  private def rho(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nz = length(regexp_extract(w, "^(0*)", 1))
    val first = w.substr(nz + lit(1), lit(1)) // '' when the tail is all-zero
    val lz = when(first === "1", 3)
      .when(first.isin("2", "3"), 2)
      .when(first.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    least(nz * lit(4) + lz + lit(1), lit(64)).cast(LongType)
  }

  /** Per-group HLL registers of `valueCol`: one row per (group, non-empty
    * bucket) with columns `bucket` (hex text, zero-padded to p/4 chars) and
    * `r` (max rho, 1..64). Null values are skipped (COUNT DISTINCT
    * semantics). The result is the sketch — tiny, mergeable, and exactly
    * reproducible by any md5-capable engine. */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 12): DataFrame = {
    require(p >= 4 && p % 4 == 0 && p <= 24,
      s"p must be a multiple of 4 in [4,24], got $p")
    val h = md5(col(valueCol).cast("string"))
    val bucket = substring(h, 1, p / 4)
    val w = substring(h, p / 4 + 1, 16)
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols.map(col) :+ bucket.as("bucket")): _*)
      .agg(max(rho(w)).as("r"))
  }

  /** Merge stored register tables to a coarser grouping: bucket-wise max.
    * registers(A ∪ B) == merge(registers(A), registers(B)) exactly. */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("r")).as("r"))

  /** Sliding-window register merge: for every period PRESENT in `regs`,
    * the bucket-wise-max merge of that period and the `window − 1` before
    * it — "distincts over the last N days" maintained from per-period
    * sketch STATE, no re-scan of the raw data. `periodCol` must be a DATE
    * column. Each register row contributes to the `window` target periods
    * it can serve — explode(sequence(...)) turns the range predicate into
    * a pure equi-join/aggregate (the rolling-distinct shape applied to
    * sketches): one shuffle over |regs|·window rows, never an inequality
    * join, and the merged output is still the portable, hash-verifiable
    * register table keyed by target period. */
  def slidingMerge(regs: DataFrame, periodCol: String,
      groupCols: Seq[String], window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val days = regs.select(col(periodCol)).distinct()
    regs.select((explode(sequence(col(periodCol),
        date_add(col(periodCol), window - 1))).as(periodCol) +:
        (groupCols.map(col) ++ Seq(col("bucket"), col("r")))): _*)
      .join(broadcast(days), Seq(periodCol), "left_semi")
      .groupBy((col(periodCol) +: groupCols.map(col)) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Cardinality estimate per group from a register table. Emits the
    * integer-exact harmonic accumulator `s2` (DECIMAL(38,0)) and empty-
    * bucket count `zeros` alongside the double `est` — s2/zeros hash-match
    * cross-engine even where the final float division can't.
    *
    * The input is bucket-wise max-merged to the target grouping first, so
    * callers may pass register tables at a FINER grouping or unioned
    * un-merged tables (h1.unionByName(h2)) — multiple rows per
    * (group, bucket) previously inflated `zeros`/`s2` silently. */
  def estimate(regs: DataFrame, groupCols: Seq[String],
      p: Int = 12): DataFrame = {
    require(p >= 4 && p % 4 == 0 && p <= 24,
      s"p must be a multiple of 4 in [4,24], got $p")
    val m = 1L << p
    val alpha = if (p == 4) 0.673 else 0.7213 / (1.0 + 1.079 / m)
    val two64 = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))
    val d38 = DecimalType(38, 0)
    // 2^(64−r) integer-exact: shiftleft covers r in 2..64 (max 2^62 fits a
    // signed long); r=1 needs 2^63 which overflows long, and the
    // double-pow detour is NOT safe — Spark's double→decimal cast goes
    // through Double.toString (17 sig digits), so 2^63 lands as
    // ...776000 instead of ...775808
    val two63 = lit(new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(63))).cast(d38)
    val term = when(col("r") === 1L, two63)
      .otherwise(expr("shiftleft(cast(1 as bigint), cast(64 - r as int))")
        .cast(d38))
    merge(regs, groupCols).groupBy(groupCols.map(col): _*)
      .agg(sum(term).as("_s_used"),
        count(lit(1)).as("_nonempty"))
      .select(
        (groupCols.map(col) ++ Seq(
          (lit(m) - col("_nonempty")).cast(LongType).as("zeros"),
          (col("_s_used") +
            (lit(m) - col("_nonempty")).cast(d38) * lit(two64).cast(d38))
            .cast(d38).as("s2"))): _*)
      .withColumn("_e_raw",
        lit(alpha) * lit(m.toDouble * m.toDouble) *
          lit(two64).cast(DoubleType) / col("s2").cast(DoubleType))
      .withColumn("est",
        when(col("_e_raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) *
            log(lit(m.toDouble) / col("zeros").cast(DoubleType)))
          .otherwise(col("_e_raw")))
      .drop("_e_raw")
  }
}
