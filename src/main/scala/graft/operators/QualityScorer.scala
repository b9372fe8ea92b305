package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Semantics.isMissing

/** QualityScorer (`/root/reference/src/transformers/validators/
  * quality_scorer.py`, 313 LoC) as pure Column expressions — no UDFs, so the
  * whole score stays inside whole-stage codegen and costs one projection.
  *
  * score = wC·completeness + wV·validity + wS·consistency (weights sum to 1,
  * `quality_scorer.py:61-70`), each component ∈ [0,1]:
  *  - completeness: share of non-missing fields (`:168-189`)
  *  - validity: strings > 10k chars → 0, > 1k → 0.5; *email* fields must
  *    contain '@' and '.'; |numeric| > 1e15 → 0 (`:191-248`)
  *  - consistency: *age* ∈ (0,150); *salary* / *price* / *amount* > 0; *_id/id
  *    fields non-negative; *email* must be string (`:250-313`)
  */
final case class QualityScorer(
    fields: Seq[String] = Nil,
    wCompleteness: Double = 0.4,
    wValidity: Double = 0.3,
    wConsistency: Double = 0.3,
    minScore: Double = 0.5,
    markAnomalies: Boolean = true,
    filterLow: Boolean = false) extends TransformStage {
  require(math.abs(wCompleteness + wValidity + wConsistency - 1.0) < 0.01,
    "weights must sum to 1")
  def name = "quality_scorer"

  private def isNumericType(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }
  private def isStringType(dt: DataType): Boolean = dt == StringType

  def apply(df: DataFrame): DataFrame = {
    val cols = if (fields.nonEmpty) fields
               else df.columns.toSeq.filterNot(_.startsWith("_meta_"))
    val n = cols.size.toDouble

    val completeness =
      cols.map(c => when(isMissing(col(c)), 0.0).otherwise(1.0))
        .reduce(_ + _) / lit(n)

    // validity: average of per-field validity, missing fields count as valid
    // (reference only scores present values, quality_scorer.py:198-205)
    val validityParts = cols.map { c =>
      val dt = df.schema(c).dataType
      val v = col(c)
      val base: Column =
        if (isStringType(dt)) {
          val len = length(v)
          val lenScore = when(len > 10000, 0.0).when(len > 1000, 0.5).otherwise(1.0)
          if (c.toLowerCase.contains("email"))
            when(v.contains("@") && v.contains("."), lenScore).otherwise(0.0)
          else lenScore
        } else if (isNumericType(dt)) {
          when(abs(v.cast(DoubleType)) > 1e15, 0.0).otherwise(1.0)
        } else lit(1.0)
      when(isMissing(v), 1.0).otherwise(base)
    }
    val validity = validityParts.reduce(_ + _) / lit(n)

    // consistency: name-based rules (quality_scorer.py:250-313)
    val consistencyParts = cols.map { c =>
      val dt = df.schema(c).dataType
      val v = col(c)
      val lc = c.toLowerCase
      val base: Column =
        if (isNumericType(dt)) {
          val d = v.cast(DoubleType)
          if (lc.contains("age")) when(d > 0 && d < 150, 1.0).otherwise(0.0)
          else if (lc.contains("salary") || lc.contains("price") || lc.contains("amount"))
            when(d > 0, 1.0).otherwise(0.0)
          else if (lc == "id" || lc.endsWith("_id") || lc.endsWith("key"))
            when(d >= 0, 1.0).otherwise(0.5)
          else lit(1.0)
        } else if (lc.contains("email") && !isStringType(dt)) lit(0.0)
        else lit(1.0)
      when(isMissing(v), 1.0).otherwise(base)
    }
    val consistency = consistencyParts.reduce(_ + _) / lit(n)

    val score = round(
      lit(wCompleteness) * completeness +
      lit(wValidity) * validity +
      lit(wConsistency) * consistency, 4) // round 4: metadata_to_columns.py:99-115

    val scored = df
      .withColumn("_meta_completeness", round(completeness, 4))
      .withColumn("_meta_validity", round(validity, 4))
      .withColumn("_meta_consistency", round(consistency, 4))
      .withColumn("_meta_quality_score", score)

    val marked =
      if (markAnomalies)
        scored.withColumn("_meta_is_anomaly",
            col("_meta_quality_score") < minScore)
          .withColumn("_meta_anomaly_reasons",
            when(col("_meta_quality_score") < minScore,
              concat(lit("low_quality_score:"), col("_meta_quality_score"))))
      else scored

    if (filterLow) marked.filter(col("_meta_quality_score") >= minScore)
    else marked
  }
}

object QualityScorer {
  /** Calibrate a score cutoff for a TOKEN/ROW budget: the exact
    * `(1 − targetKeepRate)` percentile of `scoreCol`, so keeping rows with
    * `score >= cutoff` retains ≈ the target share of the corpus. The
    * curation workflow is "keep the best 30%", not "keep score ≥ 0.5" —
    * this turns the budget into the threshold. One exact-percentile
    * aggregate job; ties at the cutoff keep slightly more than the target
    * (never less). */
  def calibrateCutoff(df: DataFrame, scoreCol: String,
      targetKeepRate: Double): Double = {
    require(targetKeepRate > 0 && targetKeepRate <= 1,
      s"targetKeepRate must be in (0,1]: $targetKeepRate")
    df.agg(expr(s"percentile(`$scoreCol`, ${1.0 - targetKeepRate})"))
      .head().getDouble(0)
  }
}
