package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.{TextFunctions => TF}

/** Model-based quality filtering: train a DISTRIBUTED logistic regression
  * (Spark MLlib) on weak labels derived from the heuristic quality
  * composite, then score the corpus with the learned linear boundary. This
  * is the standard bootstrap for corpus quality classifiers (heuristic
  * rules label a seed set; a cheap linear model generalizes them), and the
  * training is genuinely distributed — LBFGS over partition-aggregated
  * gradients — so it runs at corpus scale where a driver-side fit cannot.
  *
  * Scoring deliberately does NOT call `model.transform`: the decision is
  * re-expressed as an explicit left-associated column chain
  * `w1·f1 + w2·f2 + … + intercept ≥ 0`, which (a) keeps the scoring scan
  * inside whole-stage codegen with no vector boxing, and (b) makes the
  * decision independently replayable from the materialized coefficients —
  * the same arithmetic in any engine reproduces the flags bit-for-bit.
  */
object QualityModel {

  /** The feature columns: the oracle-replayable heuristic signals. */
  val featureNames: Seq[String] =
    Seq("punct_ratio", "stopword_ratio", "mean_word_len", "n_tokens_d")

  /** The learned linear decision boundary. */
  final case class Boundary(coefficients: Seq[Double], intercept: Double)

  /** The featurized frame: (id, features..., quality). PUBLIC so a caller
    * scoring the corpus it also trains on can persist THIS frame once and
    * feed both [[trainFeaturized]] and [[scoreFeaturized]] — the feature
    * kernel (three regex normalizations + a stopword filter per document)
    * is the gate's dominant per-row cost, and without sharing it runs once
    * for the training aggregate, once for MLlib's instance materialization
    * and once for scoring. */
  def featurize(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    TF.qualitySignalsTable(df, textCol)
      .withColumn("n_tokens_d", TF.tokenCount(col(textCol)).cast(DoubleType))
      .select(col(idCol), col("punct_ratio"), col("stopword_ratio"),
        col("mean_word_len"), col("n_tokens_d"), col("quality"))

  /** Fit the classifier on weak labels (`quality >= labelThreshold`).
    * The TRAINING frame must contain both classes — a clean corpus labels
    * all-positive and logistic regression then diverges to an infinite
    * intercept (the intercept is not regularized), so callers mix in known
    * negatives (degraded/garbage docs) when the corpus itself is clean.
    * Deterministic given fixed data and session config (LBFGS over a fixed
    * partitioning). */
  def train(df: DataFrame, idCol: String, textCol: String,
      labelThreshold: Double = 0.75, maxIter: Int = 25,
      regParam: Double = 0.01, tol: Double = 1e-6): Boundary =
    trainFeaturized(featurize(df, idCol, textCol), labelThreshold, maxIter,
      regParam, tol)

  /** [[train]] over an ALREADY-featurized frame (see [[featurize]]) — the
    * spelling for callers sharing one persisted feature pass between
    * training and scoring. */
  def trainFeaturized(features: DataFrame, labelThreshold: Double = 0.75,
      maxIter: Int = 25, regParam: Double = 0.01,
      tol: Double = 1e-6): Boundary = {
    val labeled = features.withColumn("label",
      when(col("quality") >= labelThreshold, 1.0).otherwise(0.0))
    val classes = labeled.agg(
      sum(col("label")).as("pos"), count(lit(1)).as("n")).head()
    val (pos, n) = (classes.getDouble(0), classes.getLong(1))
    require(pos > 0 && pos < n,
      s"weak labels are single-class ($pos of $n positive) — mix degraded " +
        "negatives into the training frame")
    // the training frame keeps its natural partitioning: MLlib persists
    // the instances RDD before iterating, so featurize runs once, and
    // measured end-to-end any repartition/coalesce here costs more (an
    // extra shuffle + plan compile) than the per-iteration task-scheduling
    // it saves — at billion-row scale the natural partitioning is the
    // right parallelism anyway
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("features")
      .transform(labeled)
    // every LBFGS iteration is a full treeAggregate job over the corpus:
    // iteration count × convergence tolerance are THE cost knobs, exposed
    // so callers whose downstream only needs the decision SIGN (not a
    // converged probability) can stop early
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setTol(tol)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(assembled)
    val w = model.coefficients.toArray.toSeq
    require((w :+ model.intercept).forall(x => !x.isNaN && !x.isInfinite),
      s"non-finite boundary: $w + ${model.intercept}")
    Boundary(w, model.intercept)
  }

  /** Score a corpus with a learned boundary: margin = w·f + b as an
    * explicit left-assoc chain, ml_keep = margin ≥ 0. */
  def score(df: DataFrame, idCol: String, textCol: String,
      boundary: Boundary): DataFrame =
    scoreFeaturized(featurize(df, idCol, textCol), boundary)

  /** [[score]] over an ALREADY-featurized frame (see [[featurize]]). */
  def scoreFeaturized(features: DataFrame, boundary: Boundary): DataFrame = {
    val margin: Column = featureNames.zip(boundary.coefficients)
      .map { case (f, wi) => lit(wi) * col(f) }
      .reduceLeft(_ + _) + lit(boundary.intercept)
    features
      .withColumn("margin", margin)
      .withColumn("ml_keep", col("margin") >= 0.0)
  }
}
