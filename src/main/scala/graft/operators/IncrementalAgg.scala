package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental keyed aggregation: a persisted (key, n, total) state table
  * folded forward one ingest batch at a time — the nightly-rollup shape
  * that NEVER rescans history. Each update aggregates only the new batch
  * (decimal-exact totals, so merge order can't drift the result) and
  * re-aggregates state ∪ partial on the key — cost tracks batch size plus
  * state cardinality, not corpus size. Count/sum are commutative monoids,
  * so any batch slicing converges to the full-rescan answer (the law the
  * gate proves: two-step fold == one global aggregate). Pair with
  * mergeable sketches ([[graft.functions.Sketches]]) for distinct/quantile
  * state. */
object IncrementalAgg {

  def update(state: Option[DataFrame], batch: DataFrame,
      keyCols: Seq[String], valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast(DecimalType(38, 10))).as("total"))
    state match {
      case None => partial
      case Some(st) =>
        st.select((keyCols.map(col) :+ col("n") :+ col("total")): _*)
          .unionByName(partial)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
    }
  }
}
