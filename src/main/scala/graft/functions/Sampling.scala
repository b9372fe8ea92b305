package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling for training-data curation. `df.sample(seed)` is
  * reproducible only for a fixed partitioning — repartition the input (or
  * rescale the cluster) and the sample changes, which poisons train/test
  * hygiene. Hash-threshold sampling depends only on ROW IDENTITY: a row is
  * in the 10% sample iff a hash of its id falls under the threshold —
  * stable across partitionings, engines, runs, and data growth (a row keeps
  * its assignment when the corpus around it changes, so incremental
  * pipelines don't leak test rows into training).
  *
  * The hash is the first 8 hex chars of md5(id) — bit-identical in any
  * engine, so sampled outputs are oracle-checkable (unlike every RNG-based
  * sample). One projection + filter: no shuffle, scan-speed at 100 TB.
  */
object Sampling {
  val Buckets = 10000 // threshold resolution: 0.01%

  /** Uniform bucket in [0, Buckets) from row identity. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % Buckets

  /** Keep ≈`fraction` of rows, decided per-row by identity hash. */
  def deterministicSample(df: DataFrame, idCol: String,
      fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < (fraction * Buckets).toLong)

  /** Disjoint, exhaustive train/test labels from the same hash. */
  def trainTestSplit(df: DataFrame, idCol: String,
      testFraction: Double): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol)) < (testFraction * Buckets).toLong, "test")
        .otherwise("train"))

  /** Deterministic k-fold assignment: fold = md5(seed ++ id) mod k — the
    * cross-validation splitter. Same identity-hash contract as the
    * sampler: engine-, partitioning-, and rerun-stable, and a row's fold
    * never changes as the corpus grows (no global row numbering). */
  def kFold(df: DataFrame, idCol: String, k: Int,
      seed: String = "fold"): DataFrame = {
    require(k >= 2, s"need at least 2 folds: $k")
    df.withColumn("fold",
      conv(substring(md5(concat(lit(s"$seed#"),
        col(idCol).cast(StringType))), 1, 8), 16, 10)
        .cast(LongType) % k)
  }

  /** Per-stratum fractions (e.g. downsample the dominant language, keep all
    * of a rare one): threshold looked up from a literal map — still one
    * scan, no shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }

  /** Corpus mixing: downsample each source to a per-source TOKEN budget —
    * the pretraining data-mix pass ("cap source X at N tokens, keep rare
    * source Y whole"). keep_frac(source) = min(1, budget / available), with
    * membership decided by the same identity hash as every sampler here, so
    * the kept set is engine/partitioning/run stable and oracle-checkable.
    *
    * Fully relational: one aggregate for per-source token totals (tiny —
    * one row per source), broadcast-joined back, one filter scan. No
    * driver-side collect, so it holds at any source cardinality. Adds
    * `n_tokens` and `_keep_frac` to the surviving rows. */
  def mixCorpus(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targetTokens: Map[String, Double],
      defaultTarget: Double = 0.0): DataFrame = {
    val tok = df.withColumn("n_tokens",
      TextFunctions.tokenCount(col(textCol)).cast(LongType))
    val target = targetTokens.foldLeft(lit(defaultTarget)) {
      case (acc, (src, t)) => when(col(sourceCol) === src, lit(t)).otherwise(acc)
    }
    val frac = tok.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).cast(DoubleType).as("_avail"))
      .select(col(sourceCol),
        least(lit(1.0), target / col("_avail")).as("_keep_frac"))
    tok.join(broadcast(frac), Seq(sourceCol))
      .filter(hashBucket(col(idCol)) < floor(col("_keep_frac") * Buckets))
  }

  /** Deterministic training-order shuffle: global order by md5(seed ++ id)
    * — the pretraining "shuffle the corpus" pass, reproducible across
    * engines/partitionings/runs (an RNG shuffle is none of those). A new
    * `seed` gives an independent order (fresh epoch). The sort is a real
    * range-partitioned global sort — Spark's TeraSort shape, no single
    * partition anywhere; at 100 TB this is exactly the shuffle the job
    * would otherwise pay writing shuffled shards.
    *
    * The key null-propagates (`concat`, not `concat_ws`), matching SQL
    * `||` semantics, and null keys sort LAST in both engines — so a
    * nullable `idCol` stays cross-engine stable except among the null-id
    * rows themselves, which share a null key and have no tiebreaker;
    * use a non-null id for full determinism. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      seed: Long = 0L): DataFrame =
    df.orderBy(
      md5(concat(lit(s"$seed#"), col(idCol).cast(StringType))).asc_nulls_last,
      col(idCol).asc_nulls_last)

  /** Temperature-weighted corpus mixing: sampling weight per source is
    * `n_i^alpha / Σ n_j^alpha` (the multilingual/multi-domain "temperature"
    * rule — alpha=1 keeps natural proportions, alpha→0 flattens toward
    * uniform, upsampling-free variant: a source's target never exceeds its
    * supply). Targets are token counts against a global `totalBudget`;
    * membership is the same identity hash as `mixCorpus`, so the kept set
    * is engine/partitioning stable and oracle-checkable.
    *
    * Same shape as `mixCorpus` at scale: one tiny per-source aggregate,
    * weights computed on that one-row-per-source frame (a scalar window
    * over it, not the corpus), broadcast back, one filter scan. */
  def mixCorpusTemperature(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, alpha: Double, totalBudget: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    val tok = df.withColumn("n_tokens",
      TextFunctions.tokenCount(col(textCol)).cast(LongType))
    val weighted = tok.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).cast(DoubleType).as("_avail"))
      .withColumn("_w", pow(col("_avail"), lit(alpha)))
    // normalizer via a 1-row aggregate cross-joined back (both frames are
    // |sources|-sized — no window, no shuffle concern)
    val frac = weighted
      .crossJoin(broadcast(weighted.agg(sum(col("_w")).as("_wsum"))))
      .withColumn("_keep_frac",
        least(lit(1.0),
          lit(totalBudget) * col("_w") / col("_wsum") / col("_avail")))
      .select(col(sourceCol), col("_keep_frac"))
    tok.join(broadcast(frac), Seq(sourceCol))
      .filter(hashBucket(col(idCol)) < floor(col("_keep_frac") * Buckets))
  }

  /** Systematic probability-proportional-to-size sampling: draw ≈`n` rows
    * with inclusion probability ∝ an INTEGER `weightCol` (token counts,
    * byte sizes) — the exact-arithmetic alternative to A-Res reservoir
    * keys (`u^(1/w)` needs per-row transcendentals whose last-ulp
    * differences make a cross-engine top-n cut irreproducible; boundary
    * crossings on integer cumulative sums are bit-exact everywhere).
    *
    * Rows are laid on a line in md5(seed, id) order, each owning a
    * segment of its weight; a row is selected iff its segment crosses a
    * multiple of total/n — so P(select) = n·w/W exactly (rows heavier
    * than the stride are always selected, the standard PPS caveat).
    *
    * Scale shape: the prefix sum is PARTITIONED — the first hex char of
    * the order key buckets rows 16 ways in key-prefix order, the running
    * sum windows within buckets, and 16-row bucket offsets broadcast
    * back. No global window, no driver loop; two tiny aggregates + one
    * windowed scan. */
  def ppsSample(df: DataFrame, idCol: String, weightCol: String,
      n: Long, seed: Long = 0L): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(s"pps$seed#"), col(idCol).cast(StringType)))
    val keyed = df
      .withColumn("_pps_key", key)
      .withColumn("_pps_b", substring(col("_pps_key"), 1, 1))
      .withColumn("_pps_w", col(weightCol).cast(LongType))
    val wLocal = Window.partitionBy(col("_pps_b"))
      .orderBy(col("_pps_key"), col(idCol))
    val local = keyed.withColumn("_pps_cum", sum(col("_pps_w")).over(wLocal))
    // 16-row offsets: total weight of every bucket strictly before this
    // one in key order (buckets are key prefixes, so bucket order IS key
    // order); the same tiny frame yields the grand total
    val totals = keyed.groupBy(col("_pps_b"))
      .agg(sum(col("_pps_w")).as("_pps_bw"))
    // triangle join instead of an unpartitioned window — the frame is 16
    // rows (hex first-char buckets), but the suite-wide plan-hygiene gate
    // (rightly) bans global windows without an explicit justification;
    // limit(16) is an identity on it that makes the bound statically
    // provable for the BNLJ rule
    val offsets = totals.select(col("_pps_b"), col("_pps_bw"))
      .join(totals.select(col("_pps_b").as("_pb2"), col("_pps_bw").as("_pw2"))
          .limit(16),
        col("_pb2") < col("_pps_b"), "left")
      .groupBy(col("_pps_b"))
      .agg(coalesce(sum(col("_pw2")), lit(0L)).as("_pps_off"))
    val grand = totals.agg(sum(col("_pps_bw")).as("_pps_total"))
    local
      .join(broadcast(offsets), Seq("_pps_b"))
      .crossJoin(broadcast(grand))
      .withColumn("_pps_gcum", col("_pps_off") + col("_pps_cum"))
      // segment (gcum - w, gcum] crosses a stride boundary iff the two
      // endpoint quotients of (pos · n) div total differ — pure integer
      // arithmetic (caveat: pos·n must fit a long; at W·n beyond 2^63
      // switch the multiply to decimal)
      .filter(expr(s"((_pps_gcum - _pps_w) * $n) div _pps_total " +
        s"< (_pps_gcum * $n) div _pps_total"))
      .drop("_pps_key", "_pps_b", "_pps_w", "_pps_cum", "_pps_off",
        "_pps_gcum", "_pps_total")
  }
}
