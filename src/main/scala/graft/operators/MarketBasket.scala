package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Semantics

/** Association-rule mining over (basket, item) pairs — which items
  * co-occur beyond chance (event types per user, domains per session,
  * tags per document). Baskets reduce to DISTINCT (basket, item) rows
  * before anything joins, so cost is bounded by basket-item incidence,
  * not raw row count; pairs are generated MAP-SIDE from each basket's
  * sorted item set (a < b over the in-row array), so nothing pairwise
  * ever joins or shuffles beyond the per-pair counts. Counts are exact
  * integers; support / confidence / lift are one double formula each over
  * those integers, rounded via safeRound — fully oracle-replayable. */
object MarketBasket {

  /** all a<b pairs of the sorted set array `arr`, as structs — the
    * q_word_pmi zip_with move: each element pairs with its strict suffix,
    * entirely inside the row. */
  private def pairsOfSet(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + lit(2), size(arr)),
        y => struct(x.as("a"), y.as("b")))))

  /** shared tail: per-pair counts → support/confidence/lift report. */
  private def finish(pairs: DataFrame, itemCnt: DataFrame,
      nBaskets: DataFrame, scale: Int): DataFrame =
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

  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 1L, scale: Int = 4): DataFrame = {
    // NOT persisted here: `items` feeds three consumers, but for cheap
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
    // pair generation is map-side (guide §2.3/§3): one collect_set per
    // basket, then every a<b pair explodes from the sorted in-row array —
    // replaces the items⋈items self-join that shuffled the full incidence
    // table TWICE (both join sides hash by _b) and materialized the
    // per-basket fanout through a join. Semantics are identical: items is
    // already distinct per (basket, item), sort_array uses the same type
    // ordering as the old `_i < _j` filter, and null items produced no
    // pairs before (null < x is null) exactly as collect_set's
    // null-dropping produces none now.
    val pairs = items.groupBy(col("_b"))
      .agg(sort_array(collect_set(col("_i"))).as("_arr"))
      .select(explode(pairsOfSet(col("_arr"))).as("_p"))
      .select(col("_p.a").as("_i"), col("_p.b").as("_j"))
      .groupBy(col("_i"), col("_j")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    finish(pairs, itemCnt, nBaskets, scale)
  }

  /** Set-form entry: one row per basket, `itemsCol` holding that basket's
    * item set as an array (null-free; duplicates tolerated — a defensive
    * array_distinct runs map-side). Same report as [[pairRules]] on the
    * exploded rows, minus the shuffles the row form must spend
    * re-discovering the grouping this caller already has: no
    * (basket, item) distinct, no re-grouping collect_set — pairs explode
    * straight from the in-row array, item counts from one explode, and
    * the basket total is a row count (empty sets are skipped, exactly as
    * the row form never saw a row for them). q_session_baskets' gate
    * builds per-session sets natively (session_window + collect_set), so
    * feeding them here whole removes two full shuffles of the exploded
    * incidence AND shrinks the persisted frame to one row per session. */
  def pairRulesFromSets(baskets: DataFrame, itemsCol: String,
      minPairCount: Long = 1L, scale: Int = 4): DataFrame = {
    val sets = baskets
      .select(sort_array(array_distinct(col(itemsCol))).as("_arr"))
      .filter(size(col("_arr")) > 0)
    val itemCnt = sets.select(explode(col("_arr")).as("_i"))
      .groupBy(col("_i")).agg(count(lit(1)).as("_ci"))
    val nBaskets = sets.agg(count(lit(1)).as("_nb"))
    val pairs = sets.select(explode(pairsOfSet(col("_arr"))).as("_p"))
      .select(col("_p.a").as("_i"), col("_p.b").as("_j"))
      .groupBy(col("_i"), col("_j")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    finish(pairs, itemCnt, nBaskets, scale)
  }
}
