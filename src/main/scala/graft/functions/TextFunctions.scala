package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All pure
  * Column expressions — whole-stage-codegen'd, partition-local (zero
  * shuffle), so they stream over 100 TB of documents at scan speed.
  */
object TextFunctions {

  /** Whitespace token count. Deliberately simple arithmetic (no regex-split
    * array materialization): count of separator runs + 1 on trimmed text. */
  def tokenCount(text: Column): Column = {
    val t = trim(regexp_replace(text, "\\s+", " "))
    when(length(t) === 0, 0)
      .otherwise(length(t) - length(replace(t, lit(" "), lit(""))) + 1)
  }

  /** BPE-ish subword estimate: word count + extra tokens for long words
    * (≈ 1 token per 4 chars beyond the first 4) — the standard cheap
    * heuristic for budget accounting when no tokenizer is available. */
  def tokenEstimate(text: Column): Column = {
    val words = split(trim(lower(text)), "\\s+")
    aggregate(words, lit(0L),
      (acc, w) => acc + lit(1L) + greatest(lit(0L),
        ((length(w) - 1) / 4).cast(LongType)))
  }

  /** Quality-scoring signals (length / punctuation / stopword ratios) and a
    * composite score ∈ [0,1]. Thresholds follow common public pipeline
    * heuristics (Gopher-style rules): docs too short/long, too much
    * punctuation, or too few stopwords score low. */
  def punctRatio(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, 0.0).otherwise(
      length(regexp_replace(t, "[^\\p{Punct}]", "")).cast(DoubleType) /
        length(t).cast(DoubleType))
  }

  val englishStopwords = Seq("the", "and", "of", "to", "a", "in", "is", "it",
    "that", "for", "on", "with", "as", "or", "at", "by")

  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val words = split(trim(lower(text)), "\\s+")
    val n = size(words)
    val stops = size(filter(words, w => w.isin(stopwords: _*)))
    when(n === 0, 0.0).otherwise(stops.cast(DoubleType) / n.cast(DoubleType))
  }

  def meanWordLength(text: Column): Column = {
    // arithmetic form — total word chars = chars minus separators; avoids a
    // split-array materialization entirely
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    val n = tokenCount(text)
    when(n === 0, 0.0).otherwise(
      length(replace(norm, lit(" "), lit(""))).cast(DoubleType) /
        n.cast(DoubleType))
  }

  /** Composite text quality score: each rule contributes equally. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val rules = Seq(
      when(nTok.between(10, 100000), 1.0).otherwise(0.0),       // length band
      when(punctRatio(text) <= 0.2, 1.0).otherwise(0.0),        // punct sanity
      when(meanWordLength(text).between(2.0, 12.0), 1.0).otherwise(0.0),
      when(stopwordRatio(text) >= 0.05, 1.0).otherwise(0.5))    // NL-ness
    round(rules.reduce(_ + _) / lit(rules.size.toDouble), 4)
  }

  /** Table-scale quality signals: every normalization (trim, lowercase,
    * whitespace collapse, punct strip) is computed ONCE in a staged
    * projection and shared by all four signals. The per-column functions
    * above re-derive their own normalizations, so composing them in one
    * select re-runs each regex pass 3-4× per row — Catalyst keeps the staged
    * aliases here because they are non-cheap and multiply-referenced
    * (CollapseProject won't re-inline them). Values are bit-identical to the
    * per-column forms (asserted in OperatorSpec).
    *
    * Adds: punct_ratio, stopword_ratio, mean_word_len, quality (all as
    * [[punctRatio]]/[[stopwordRatio]]/[[meanWordLength]]/[[qualityScore]]).
    */
  def qualitySignalsTable(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val staged = df
      .withColumn("_qs_t", trim(text))
      .withColumn("_qs_norm", trim(regexp_replace(text, "\\s+", " ")))
      .withColumn("_qs_norml", trim(regexp_replace(lower(text), "\\s+", " ")))
    val derived = staged
      // token count over the non-lowered normalized text (= tokenCount)
      .withColumn("_qs_ntok", when(length(col("_qs_norm")) === 0, 0)
        .otherwise(length(col("_qs_norm"))
          - length(replace(col("_qs_norm"), lit(" "), lit(""))) + 1))
      .withColumn("_qs_words", split(col("_qs_norml"), " "))
      .withColumn("_qs_chars_ns",
        length(replace(col("_qs_norml"), lit(" "), lit(""))))
    val punct = when(length(col("_qs_t")) === 0, 0.0).otherwise(
      length(regexp_replace(col("_qs_t"), "[^\\p{Punct}]", "")).cast(DoubleType) /
        length(col("_qs_t")).cast(DoubleType))
    val nWords = size(col("_qs_words"))
    val stopR = when(nWords === 0, 0.0).otherwise(
      size(filter(col("_qs_words"), w => w.isin(englishStopwords: _*)))
        .cast(DoubleType) / nWords.cast(DoubleType))
    val meanWl = when(col("_qs_ntok") === 0, 0.0).otherwise(
      col("_qs_chars_ns").cast(DoubleType) / col("_qs_ntok").cast(DoubleType))
    val signals = derived
      .withColumn("punct_ratio", punct)
      .withColumn("stopword_ratio", stopR)
      .withColumn("mean_word_len", meanWl)
    val rules = Seq(
      when(col("_qs_ntok").between(10, 100000), 1.0).otherwise(0.0),
      when(col("punct_ratio") <= 0.2, 1.0).otherwise(0.0),
      when(col("mean_word_len").between(2.0, 12.0), 1.0).otherwise(0.0),
      when(col("stopword_ratio") >= 0.05, 1.0).otherwise(0.5))
    signals
      .withColumn("quality", round(rules.reduce(_ + _) / lit(4.0), 4))
      .drop("_qs_t", "_qs_norm", "_qs_norml", "_qs_ntok", "_qs_words",
        "_qs_chars_ns")
  }

  /** Language ID via stopword-hit scoring: tiny per-language marker lists,
    * language = argmax hit count (ties break by fixed language order).
    * An n-gram-free heuristic that stays pure-expression; a real model would
    * slot in as a broadcast n-gram table with the same argmax shape. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit"),
    "es" -> Seq("el", "la", "los", "es", "con", "para"),
    "fr" -> Seq("le", "la", "les", "est", "avec", "pour"),
    "zh" -> Seq("的", "是", "和", "了", "在", "我"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val words = split(trim(lower(text)), "\\s+")
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(words, w => w.isin(markers: _*)))
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    argmaxLang(scores)
  }

  /** argmax with first-wins tiebreak: fold keeps current best strictly. */
  private[graft] def argmaxLang(scores: Seq[(String, Column)]): Column = {
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("s"), struct(sc.as("s"), lit(lang).as("l")))
          .otherwise(acc)
    }
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("unknown"))
  }

  /** Table-scale language ID: explode words once, one aggregate computes
    * every language's marker hits (the per-row expression form re-splits the
    * text per language — fine for a handful of rows, quadratic waste on a
    * corpus). Returns df with all original columns + `lang_guess`. */
  def langIdTable(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val ex = df.select(col(idCol),
      explode_outer(split(trim(lower(col(textCol))), "\\s+")).as("_w"))
    val hitCols = langMarkers.map { case (lang, markers) =>
      sum(when(col("_w").isin(markers: _*), 1L).otherwise(0L)).as(s"_hits_$lang")
    }
    val agged = ex.groupBy(col(idCol)).agg(hitCols.head, hitCols.tail: _*)
    val guess = argmaxLang(langMarkers.map { case (l, _) => l -> col(s"_hits_$l") })
    val labelled = agged.select(col(idCol), guess.as("lang_guess"))
    df.join(labelled, Seq(idCol), "left")
  }

  /** Rolling hash fingerprint of the whole document: xxhash64 chained over
    * the normalized word stream (order-sensitive, unlike a bag-of-words
    * hash). Chaining through the hash avoids ANSI-mode overflow that a raw
    * polynomial accumulator would hit. */
  def fingerprint(text: Column): Column = {
    val norm = regexp_replace(trim(lower(text)), "\\s+", " ")
    aggregate(split(norm, " "), lit(0L), (acc, w) => xxhash64(acc, w))
  }

  /** Word n-gram shingles (shared with dedup operators). */
  def shingles(text: Column, k: Int = 3): Column =
    graft.operators.MinHashDedup.shingles(text, k)
}
