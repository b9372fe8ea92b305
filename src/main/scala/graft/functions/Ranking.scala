package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Semantics

/** Rank-space combinators for hybrid retrieval: fuse keyword (BM25),
  * embedding (cosine), and heuristic (quality) rankings WITHOUT comparing
  * their incommensurable scores — only ranks cross the fusion. */
object Ranking {

  /** Deterministic rank over the top `topK` rows by `order` (which must be
    * a TOTAL order — tie-break on the id). The limit runs as
    * TakeOrderedAndProject (per-partition heaps, no full sort) and the
    * row_number windows over the ≤ topK survivors — bounded by
    * construction, never a corpus-wide window. */
  def boundedRank(df: DataFrame, order: Seq[Column], topK: Int): DataFrame =
    // the global window is BOUNDED by construction: limit(topK) runs first
    // (TakeOrderedAndProject), so at most topK rows ever reach it
    df.orderBy(order: _*).limit(topK)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))

  /** Reciprocal-rank fusion: `Σ 1/(k + rankᵢ)` over the input rankings
    * (each a frame carrying `idCol` and `rank`). An id missing from a
    * list contributes nothing for it — the standard convention. The sum
    * is over a FIXED handful of lists in declaration order, so no
    * aggregation-order nondeterminism exists; k=60 is the universal
    * default from the original paper's grid. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int = 60,
      scale: Int = 6): DataFrame = {
    require(rankings.size >= 2, "need at least two rankings to fuse")
    val terms = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol),
        (lit(1.0) / (lit(k) + col("rank")).cast(DoubleType)).as(s"_t$i"))
    }
    val joined = terms.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = terms.indices.map(i => coalesce(col(s"_t$i"), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol), Semantics.safeRound(score, scale).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
  }
}
