package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Incremental view maintenance for an append-only inner equi-join view
  * V = A ⋈ B: fold in new ingest batches ΔA, ΔB by computing only the
  * view DELTA
  *
  *   ΔV = ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
  *
  * — the standard delta-rule, never recomputing A⋈B. At 100 TB this is
  * the difference between a nightly full-join rebuild (shuffle the whole
  * corpus) and touching each base side once per batch: with the (small)
  * delta frames broadcast, the two mixed terms are map-side joins — one
  * scan of each base, ZERO shuffle of base data — and the Δ⋈Δ term is
  * delta-sized. Append-only means no retractions: rows are never updated
  * or deleted, so ΔV ∪ V_old ≡ (A∪ΔA)⋈(B∪ΔB) exactly (the law the gate
  * and spec prove). For update/delete streams use the CDC materializer
  * ([[graft.streaming.Streams.cdcLatestState]]) upstream to reduce to
  * latest-state appends first.
  */
object IncrementalJoin {

  /** The view delta ΔV for V = baseL ⋈ baseR on `keys` (inner equi-join;
    * non-key columns of the two sides must be disjoint). When
    * `broadcastDeltas` (default), the delta side of each mixed term gets
    * a broadcast hint — right for the common "batch ≪ base" shape; turn
    * off when a backfill batch rivals the base. */
  def appendDelta(baseL: DataFrame, deltaL: DataFrame,
      baseR: DataFrame, deltaR: DataFrame, keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    val (dl, dr) =
      if (broadcastDeltas) (broadcast(deltaL), broadcast(deltaR))
      else (deltaL, deltaR)
    dl.join(baseR, keys)
      .unionByName(baseL.join(dr, keys))
      .unionByName(deltaL.join(dr, keys))
  }
}
