package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history — the versioned-row answer to
  * "what did this record look like when the training run read it". The
  * CDC family ([[SnapshotDiff]], merge-apply) keeps only the LATEST row
  * per key; SCD2 keeps every version with a validity interval, enabling
  * point-in-time reproduction of any past pipeline input.
  *
  * Physical shape: one window keyed on the entity (lead() for the next
  * change's timestamp) — a single shuffle on the key, no self-join; the
  * point-in-time view is a pure filter over the history. The caller's
  * (tsCol, tiebreak...) must give a total order per key or version
  * boundaries are partitioning-dependent.
  */
object Scd2 {

  /** One row per observed (key, change): `valid_from` = the change's
    * timestamp, `valid_to` = the NEXT change's (null while current),
    * `is_current` flag. `tiebreak` columns extend the per-key order to a
    * total one when timestamps can collide. */
  def fromChangeLog(changes: DataFrame, keyCol: String, tsCol: String,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = col(tsCol) +: tiebreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** The dimension as it stood at `ts`: the unique version per key with
    * `valid_from <= ts < valid_to` (current rows have no upper bound).
    * Keys first observed after `ts` are absent — exactly the rows a
    * pipeline run at `ts` would have read. */
  def snapshotAt(history: DataFrame, ts: Column): DataFrame =
    history.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))

  /** Point-in-time enrichment: each probe row picks the version valid at
    * ITS OWN timestamp — the per-row generalization of [[snapshotAt]] and
    * the classic "join facts to the dimension as it was" problem. Rides
    * [[AsofJoin.backward]] on `valid_from` (union + one keyed window pass
    * — never the interval join that explodes to |versions| rows per probe
    * before pruning), then nulls out versions whose validity CLOSED before
    * the probe (possible when history has retention gaps; with contiguous
    * validity the guard is a no-op). History payload columns must not
    * collide with probe columns — select/rename first. */
  def pointInTime(history: DataFrame, probes: DataFrame, keyCol: String,
      probeTsCol: String): DataFrame = {
    val payload = history.columns.toSeq
      .filterNot(c => c == keyCol || c == "valid_from" || c == "valid_to")
    val joined = AsofJoin.backward(probes, history, Seq(keyCol),
      probeTsCol, "valid_from")
    val expired =
      col("valid_to").isNotNull && col("valid_to") <= col(probeTsCol)
    payload.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(expired, lit(null)).otherwise(col(c)))
    }
  }
}
