package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.core.Semantics

/** Dataset forensics: distribution audits that flag fabricated, corrupted,
  * or privacy-risky slices before they poison a training run. All exact
  * integer counts + per-row double formulas — no order-dependent float
  * aggregation anywhere, so every report replays bit-for-bit in any
  * engine.
  */
object Audit {

  /** Benford's-law first-digit audit for a positive numeric column:
    * organically-grown magnitudes (prices, populations, file sizes) follow
    * P(d) = log10(1 + 1/d); fabricated or truncated data usually doesn't.
    * The first digit comes from the INTEGER part's string form — never
    * floating log10, whose power-of-ten boundaries differ across engines.
    * Emits per-digit observed count/share, expected share, and the
    * chi-square term (o−e)²/e — nine rows, one aggregate pass. Rows with
    * value < 1 or null are excluded (no leading significant digit). */
  def benford(df: DataFrame, valueCol: String,
      scale: Int = 4): DataFrame = {
    val v = col(valueCol)
    val digits = df.filter(v.isNotNull && v >= 1)
      .select(substring(floor(v).cast(LongType).cast(StringType), 1, 1)
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("_total"))
    val pExp = log(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType)) /
      log(lit(10.0))
    val eCnt = pExp * col("_total").cast(DoubleType)
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        Semantics.safeRound(
          col("n").cast(DoubleType) / col("_total").cast(DoubleType), scale)
          .as("observed"),
        Semantics.safeRound(pExp, scale).as("expected"),
        Semantics.safeRound(
          pow(col("n").cast(DoubleType) - eCnt, 2) / eCnt, scale)
          .as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** Chi-square independence cells for two categoricals: per (a, b) cell
    * the observed count, expected count `rowₐ·col_b / n`, and the
    * chi-square term — the "is source correlated with language?" audit.
    * Cells with observed 0 don't appear (their terms are a driver-side
    * add-up of expected mass if needed). Three tiny aggregates + two
    * broadcast joins; nothing wider than category cardinalities. */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String,
      scale: Int = 4): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("n"))
    val rowT = df.groupBy(col(aCol)).agg(count(lit(1)).as("_ra"))
    val colT = df.groupBy(col(bCol)).agg(count(lit(1)).as("_cb"))
    val total = df.agg(count(lit(1)).as("_t"))
    val e = (col("_ra") * col("_cb")).cast(DoubleType) /
      col("_t").cast(DoubleType)
    cells
      .join(broadcast(rowT), Seq(aCol))
      .join(broadcast(colT), Seq(bCol))
      .crossJoin(broadcast(total))
      .select(col(aCol), col(bCol), col("n"),
        Semantics.safeRound(e, scale).as("expected"),
        Semantics.safeRound(
          pow(col("n").cast(DoubleType) - e, 2) / e, scale).as("chi2_term"))
      .orderBy(col(aCol), col(bCol))
  }

  /** k-anonymity risk report: quasi-identifier combinations shared by
    * fewer than `k` rows — the groups whose members a release would
    * re-identify. One aggregate on the quasi-id tuple. */
  def kAnonymityRisk(df: DataFrame, quasiIds: Seq[String],
      k: Long): DataFrame = {
    require(quasiIds.nonEmpty && k >= 2, "need quasi-ids and k >= 2")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy(quasiIds.map(col(_).asc) :+ col("n").asc: _*)
  }
}
