package graft.entry

import org.apache.spark.sql.DataFrame

/** Verify-only materialization of oracle auxiliaries.
  *
  * Several gates persist engine-specific intermediates (iForest scores,
  * minhash cluster labels, BPE pair counts, substring windows, …) so the
  * DuckDB oracle can replay decision logic from the exact values the engine
  * saw. That plumbing is part of CORRECTNESS verification, not of the
  * operator: `Verify.main` switches it on; `Bench` leaves it off so
  * `BENCH_r*.json` times the operator alone.
  */
object Aux {
  @volatile var enabled: Boolean = false

  /** Write `df` under the oracle-aux directory iff verification is running.
    * `single` collapses to one file for the tiny frames the oracle reads
    * whole; leave it false for exploded window/symbol tables.
    */
  def write(df: DataFrame, path: String, single: Boolean = true): Unit =
    if (enabled) {
      val d = if (single) df.coalesce(1) else df
      d.write.mode("overwrite").parquet(path)
    }
}
