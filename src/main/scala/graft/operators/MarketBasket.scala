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
    // pair generation is map-side (guide §2.3/§3, the q_word_pmi zip_with
    // move): one collect_set per basket, then every a<b pair explodes from
    // the sorted in-row array — replaces the items⋈items self-join that
    // shuffled the full incidence table TWICE (both join sides hash by _b)
    // and materialized the per-basket fanout through a join. Semantics are
    // identical: items is already distinct per (basket, item), sort_array
    // uses the same type ordering as the old `_i < _j` filter, and null
    // items produced no pairs before (null < x is null) exactly as
    // collect_set's null-dropping produces none now.
    val pairsOfBasket = flatten(transform(col("_arr"), (x, i) =>
      transform(slice(col("_arr"), i + lit(2), size(col("_arr"))),
        y => struct(x.as("a"), y.as("b")))))
    val pairs = items.groupBy(col("_b"))
      .agg(sort_array(collect_set(col("_i"))).as("_arr"))
      .select(explode(pairsOfBasket).as("_p"))
      .select(col("_p.a").as("_i"), col("_p.b").as("_j"))
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
