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

  /** Retrieval-quality metrics of an approximate ranking against exact
    * ground truth, per query: recall@k, MRR and binary-relevance nDCG —
    * the report that says whether an ANN index (IVF / PQ / LSH) is still
    * good enough to serve. All BIGINT: the only transcendental, the nDCG
    * log₂ discount, is quantized ONCE per rank position
    * (`floor(log₂(r+1)·1e6 + ½)` — log₂ of small integers sits nowhere
    * near a half-boundary, so engines agree) and every sum/ratio after
    * that is integer arithmetic (`1e12 div discount_e6`, summed exactly).
    *
    * `approx` and `truth`: (qidCol, docCol, rankCol) with rank 1..k per
    * qid. Metrics per qid: n_hits, recall_e4 (hits / |truth|), mrr_e6
    * (1e6 div first-hit rank, 0 if none), ndcg_e4
    * (Σ_hits 1e12 div d(rank) over Σ_{i≤|truth|} 1e12 div d(i)). The
    * joins are qid+doc equi-joins; per-qid state is ≤ k rows. */
  def rankingMetrics(approx: DataFrame, truth: DataFrame, qidCol: String,
      docCol: String, rankCol: String): DataFrame = {
    val contribE12 = (r: Column) =>
      floor(lit(1000000000000L) /
        floor(log2(r.cast(DoubleType) + 1.0) * 1e6 + lit(0.5)))
    val a = approx.select(col(qidCol), col(docCol), col(rankCol).as("_ra"))
    val t = truth.select(col(qidCol), col(docCol), col(rankCol).as("_rt"))
    // ONE full-outer join + ONE aggregate: hit stats, first-hit rank, DCG
    // and the ideal-DCG normalizer all come out of the same grouped pass
    // — no second join, one shuffle per input
    val both = col("_ra").isNotNull && col("_rt").isNotNull
    a.join(t, Seq(qidCol, docCol), "full_outer")
      .groupBy(col(qidCol))
      .agg(
        sum(when(col("_ra").isNotNull, 1L).otherwise(0L)).as("n_results"),
        sum(when(both, 1L).otherwise(0L)).as("n_hits"),
        min(when(both, col("_ra"))).as("_first"),
        sum(when(both, contribE12(col("_ra"))).otherwise(0L))
          .cast(org.apache.spark.sql.types.LongType).as("_dcg"),
        sum(when(col("_rt").isNotNull, 1L).otherwise(0L)).as("_ntruth"),
        sum(when(col("_rt").isNotNull, contribE12(col("_rt")))
          .otherwise(0L))
          .cast(org.apache.spark.sql.types.LongType).as("_idcg"))
      .select(col(qidCol), col("n_results"), col("n_hits"),
        // A qid can appear only on the approx side of the full-outer join
        // (_ntruth = 0); divide raises under ANSI mode, so emit 0 metrics.
        when(col("_ntruth") > 0, expr("(n_hits * 10000) div _ntruth"))
          .otherwise(lit(0L))
          .cast(org.apache.spark.sql.types.LongType).as("recall_e4"),
        coalesce(expr("1000000 div _first"), lit(0L))
          .cast(org.apache.spark.sql.types.LongType).as("mrr_e6"),
        when(col("_idcg") > 0, expr("(_dcg * 10000) div _idcg"))
          .otherwise(lit(0L))
          .cast(org.apache.spark.sql.types.LongType).as("ndcg_e4"))
  }
}
