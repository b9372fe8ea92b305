package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Semantics

/** Association-rule mining over (basket, item) pairs — which items
  * co-occur beyond chance (event types per user, domains per session,
  * tags per document). Baskets reduce to DISTINCT (basket, item) rows
  * before anything joins, so cost is bounded by basket-item incidence,
  * not raw row count; the pair self-join is per-basket and ordered
  * (a < b) so each pair counts once. Counts are exact integers;
  * support / confidence / lift are one double formula each over those
  * integers, rounded via safeRound — fully oracle-replayable. */
object MarketBasket {

  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 1L, scale: Int = 4): DataFrame = {
    // NOT persisted here: `items` feeds four consumers, but for cheap
    // inputs ReuseExchange dedupes the distinct's exchange well enough
    // that a persist is pure tax (measured on q_assoc_rules at sf1:
    // 1.15 → 2.55 s WITH an items persist; reverted). Callers whose
    // upstream frame is expensive to recompute (q_session_baskets' gate
    // feeds a session_window aggregate) persist THAT frame instead.
    val items = df.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val itemCnt = items.groupBy(col("_i")).agg(count(lit(1)).as("_ci"))
    val nBaskets = items.select(col("_b")).distinct()
      .agg(count(lit(1)).as("_nb"))
    val pairs = items.join(
      items.select(col("_b"), col("_i").as("_j")), Seq("_b"))
      .filter(col("_i") < col("_j"))
      .groupBy(col("_i"), col("_j")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    pairs
      .join(broadcast(itemCnt.select(col("_i"), col("_ci").as("_ca"))),
        Seq("_i"))
      .join(broadcast(itemCnt.select(col("_i").as("_j"),
        col("_ci").as("_cb"))), Seq("_j"))
      .crossJoin(broadcast(nBaskets))
      .select(col("_i").as("item_a"), col("_j").as("item_b"), col("n_pair"),
        Semantics.safeRound(col("n_pair").cast(DoubleType) /
          col("_nb").cast(DoubleType), scale).as("support"),
        Semantics.safeRound(col("n_pair").cast(DoubleType) /
          col("_ca").cast(DoubleType), scale).as("confidence"),
        Semantics.safeRound(
          (col("n_pair") * col("_nb")).cast(DoubleType) /
            (col("_ca") * col("_cb")).cast(DoubleType), scale).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }
}
