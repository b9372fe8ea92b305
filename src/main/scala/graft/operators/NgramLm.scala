package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed bigram language-model quality scoring — the CCNet-style
  * curation signal: train a word-bigram LM with add-one smoothing on a
  * reference slice (e.g. the `lang = 'en'` documents), score every document
  * by its average negative log-likelihood under that model. Documents that
  * look like the reference slice score LOW; gibberish, other languages and
  * boilerplate score HIGH — the classic "perplexity bucket" filter for
  * pretraining corpora (reference repo has quality scoring only as rule
  * ratios, `quality_scorer.py`; this is the model-based upgrade a 100 TB
  * pipeline actually runs).
  *
  * Scale shape: the model is VOCABULARY-sized, never corpus-sized — one
  * aggregate over the training slice per order (unigram, bigram), keyed by
  * `xxhash64` of the gram so model joins shuffle 8-byte keys. Scoring is
  * one bigram explode over the target corpus + two vocabulary equi-joins +
  * one per-doc aggregate — linear, no windows, no self-joins. Per-term
  * `ln` values sum through DECIMAL(38,18) (the BM25 pattern) so the
  * rounded score is partial-agg-order-proof and engine-portable.
  *
  * Smoothing: P(b|a) = (c(a b) + 1) / (c(a) + V), with V = distinct
  * unigram count of the training slice; an unseen prefix degrades to
  * 1/(0 + V). `avg_nll` = -Σ ln P / n_bigrams, NULL for docs with fewer
  * than two tokens.
  */
object NgramLm {

  /** Tokenization shared with the BM25/shingle family: lower, trim,
    * whitespace split. */
  private def words(c: Column): Column = split(trim(lower(c)), "\\s+")

  private def bigramsOf(ws: Column): Column = zip_with(
    slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
    slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
    (a, b) => concat(a, lit(" "), b))

  /** Vocabulary-sized model: (gram-hash, count) per order plus the unigram
    * vocabulary size. Both frames are lazily re-derivable; callers doing
    * repeated scoring should persist them. */
  final case class Model(bigrams: DataFrame, unigrams: DataFrame,
      vocabSize: Long)

  def train(df: DataFrame, textCol: String): Model = {
    // word split + bigram build per doc at the scan -- compute-dense
    val ws = graft.core.Rebalance.computeDense(df)
      .select(words(col(textCol)).as("_ws"))
    val uni = ws.select(explode(col("_ws")).as("_w"))
      .groupBy(xxhash64(col("_w")).as("_h"))
      .agg(count(lit(1)).as("_cnt"))
    val bi = ws.select(explode(bigramsOf(col("_ws"))).as("_bg"))
      .groupBy(xxhash64(col("_bg")).as("_h"))
      .agg(count(lit(1)).as("_cnt"))
    Model(bi, uni, uni.count())
  }

  /** Score every document: `n_bigrams`, `n_oov` (bigrams unseen by the
    * model), and `avg_nll` rounded to 4 decimals (NULL when the doc has no
    * bigram). Output columns are added to (idCol-projected) rows. */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val v = model.vocabSize.toDouble
    val inst = graft.core.Rebalance.computeDense(df)
      .select(col(idCol),
        explode_outer(bigramsOf(words(col(textCol)))).as("_bg"))
      .withColumn("_bh", xxhash64(col("_bg")))
      .withColumn("_ph",
        xxhash64(element_at(split(col("_bg"), " ", 2), 1)))
    val joined = inst
      .join(model.bigrams.select(col("_h").as("_bh"), col("_cnt").as("_cbg")),
        Seq("_bh"), "left")
      .join(model.unigrams.select(col("_h").as("_ph"), col("_cnt").as("_cug")),
        Seq("_ph"), "left")
      .withColumn("_term", log(
        (coalesce(col("_cbg"), lit(0L)).cast(DoubleType) + lit(1.0)) /
          (coalesce(col("_cug"), lit(0L)).cast(DoubleType) + lit(v))))
    joined.groupBy(col(idCol))
      .agg(
        count(col("_bg")).as("n_bigrams"),
        sum(when(col("_bg").isNotNull && col("_cbg").isNull, 1L)
          .otherwise(0L)).as("n_oov"),
        when(count(col("_bg")) > 0,
          round((-graft.functions.Dec128.sumExact(col("_term"), 18))
            .cast(DoubleType) / count(col("_bg")), 4))
          .as("avg_nll"))
  }
}
