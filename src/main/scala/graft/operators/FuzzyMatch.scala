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
    * names must be distinct across the two inputs. */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftCol: String, rightId: String, rightCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 2, s"need maxDist >= 0, q >= 2: $maxDist, $q")
    val lg = left.select(col(leftId), col(leftCol),
      explode(qgrams(leftCol, q)).as("_g"))
    val rg = right.select(col(rightId), col(rightCol),
      explode(qgrams(rightCol, q)).as("_g"))
    lg.join(rg, Seq("_g"))
      .select(col(leftId), col(leftCol), col(rightId), col(rightCol))
      .distinct() // candidates: one row per pair, not per shared gram
      .withColumn("dist",
        levenshtein(col(leftCol), col(rightCol)).cast(IntegerType))
      .filter(col("dist") <= maxDist)
      .select(col(leftId), col(rightId), col("dist"))
  }
}
