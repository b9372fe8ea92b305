package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Entity resolution by bounded edit distance — record linkage for the
  * name/title/URL columns a curation pipeline reconciles across sources.
  * The reference's dedup family only has exact and set-similarity keys;
  * this adds the typo-tolerant join with the classic q-gram completeness
  * guarantee instead of an O(N·M) cross product.
  *
  * Blocking: `d` edits destroy at most `d·q` of a string's `n−q+1`
  * positional q-grams, so two strings within distance `d` share at least
  * one q-gram CONTENT whenever `n − q + 1 > d·q` — candidates come from a
  * distinct-q-gram equi-join (shuffle keyed on the gram), then exact
  * `levenshtein` verifies each candidate once. Shorter strings fall back
  * to their whole text as the single gram, preserving completeness for
  * equal-prefix shorties at the cost of a fatter block.
  */
object FuzzyMatch {

  /** All distinct q-grams of column `name` (the whole string when shorter
    * than q). */
  private def qgrams(name: String, q: Int): Column =
    array_distinct(expr(
      s"transform(sequence(1, greatest(length($name) - ${q - 1}, 1)), " +
        s"i -> substring($name, i, $q))"))

  /** Pairs (leftId, rightId, dist) with `levenshtein ≤ maxDist`, complete
    * for strings with more than `maxDist·q` surviving q-grams. Column
    * names must be distinct across the two inputs.
    *
    * Candidates come through PREFIX FILTERING (Chaudhuri et al.), not the
    * naive every-shared-gram join: strings within distance `d` share at
    * least `max(|A|,|B|) − d·q` distinct grams, so under a GLOBAL gram
    * order (document frequency asc, gram asc) their `d·q + 1`-length
    * prefixes must intersect. Blocking only on prefix grams keeps blocks
    * rare-gram-sized — serial-number corpora where one gram ("000")
    * appears in EVERY string would otherwise degenerate to the full cross
    * product (observed: 25 s → sub-second on the supplier gate).
    *
    * DISTINCT-STRING PRE-PASS: candidate generation and levenshtein
    * verification run over the DISTINCT strings of each side; id pairs are
    * re-expanded through the copy groups afterwards. A duplicate-heavy
    * corpus (the normal case for a web crawl — and exactly what a 10×
    * row-copied scale probe synthesizes) would otherwise pay the exact
    * verification once per COPY-pair: m copies of s₁ × n copies of s₂ is
    * m·n levenshtein calls for one distinct comparison. The pre-pass makes
    * verification proportional to distinct pairs and leaves only the
    * output-sized expansion join to scale with multiplicity. Prefix
    * completeness is order-agnostic (any global gram order works), so
    * computing gram frequencies over distinct strings instead of rows
    * changes block sizes, never the result. */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftCol: String, rightId: String, rightCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 2, s"need maxDist >= 0, q >= 2: $maxDist, $q")
    val prefixLen = maxDist * q + 1
    val ld = left.select(col(leftCol).as("_ls")).distinct()
    val rd = right.select(col(rightCol).as("_rs")).distinct()
    val lg = ld.select(col("_ls"), explode(qgrams("_ls", q)).as("_g"))
    val rg = rd.select(col("_rs"), explode(qgrams("_rs", q)).as("_g"))
    // one global gram order shared by both sides: df over the union
    val df = lg.select(col("_g")).unionByName(rg.select(col("_g")))
      .groupBy(col("_g")).agg(count(lit(1)).as("_df"))
    def prefix(grams: DataFrame, strC: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(strC)).orderBy(col("_df"), col("_g"))
      grams.join(df, Seq("_g"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= prefixLen)
        .select(col(strC), col("_g"))
    }
    val strPairs = prefix(lg, "_ls").join(prefix(rg, "_rs"), Seq("_g"))
      .select(col("_ls"), col("_rs"))
      .distinct() // candidates: one row per DISTINCT string pair
      .withColumn("dist",
        levenshtein(col("_ls"), col("_rs")).cast(IntegerType))
      .filter(col("dist") <= maxDist)
    // re-expand verified string pairs through the copy groups; distinct
    // (id, string) projections reproduce the pre-pass-free output exactly
    strPairs
      .join(left.select(col(leftId), col(leftCol).as("_ls")).distinct(),
        Seq("_ls"))
      .join(right.select(col(rightId), col(rightCol).as("_rs")).distinct(),
        Seq("_rs"))
      .select(col(leftId), col(rightId), col("dist"))
  }

  /** Blocked sorted-neighborhood join — the other classic ER blocking
    * strategy: sort records within a cheap block (first char here), then
    * compare each record only with its `window` successors in sort order.
    * Complements [[editDistanceJoin]]: q-gram blocking recalls pairs that
    * SHARE substrings anywhere; sorted-neighborhood recalls pairs whose
    * sort keys collate near each other (common-prefix families) at a hard
    * O(n·window) candidate bound per block. Candidates come from a
    * rank+k equi-join (k = 1..window) — positional, never a cross product
    * — and verify by exact edit distance. Windows/ranks are per-block, so
    * every window is partitioned. */
  def sortedNeighborhoodJoin(df: DataFrame, idCol: String, strCol: String,
      window: Int, maxDist: Int): DataFrame = {
    require(window >= 1 && maxDist >= 0,
      s"need window >= 1, maxDist >= 0: $window, $maxDist")
    val ranked = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
      .withColumn("_blk", substring(col("_s"), 1, 1))
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_blk")).orderBy(col("_s").asc, col("_id").asc)))
    val pairs = ranked
      .withColumn("_k",
        explode(array((1 to window).map(lit(_)): _*)))
      .select(col("_blk"), (col("_r") + col("_k")).as("_r2"),
        col("_id").as("id_a"), col("_s").as("_sa"))
      .join(ranked.select(col("_blk"), col("_r").as("_r2"),
        col("_id").as("id_b"), col("_s").as("_sb")),
        Seq("_blk", "_r2"))
    pairs
      .withColumn("dist",
        levenshtein(col("_sa"), col("_sb")).cast(IntegerType))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
