package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for iterative operators (component label
  * propagation, BPE merge rounds). Every round MUST checkpoint — the
  * previous round's plan otherwise nests inside the next round's join and
  * plan size grows until the optimizer dies — but WHERE the truncated state
  * lives is a deployment decision:
  *
  *  - [[Local]]: `localCheckpoint()` — executor block storage. No
  *    configuration, fast, the right choice on local[N] and for tests. The
  *    blocks die with their executor, so on a real multi-executor cluster a
  *    lost executor aborts the whole iteration (Spark cannot recompute a
  *    localCheckpoint's lineage).
  *  - [[Reliable]]: `checkpoint()` — files under
  *    `sparkContext.setCheckpointDir` (HDFS/S3A on a cluster). Survives
  *    executor loss; the job recomputes from the checkpoint files instead
  *    of aborting. REQUIRED for a long dedup/BPE iteration on a 100 TB
  *    cluster run, where some executor loss is expected. Callers must set
  *    the checkpoint dir first or Spark throws on the first round.
  */
object Checkpoints {
  sealed trait Mode
  /** Executor-cached truncation (`localCheckpoint`) — single-node default. */
  case object Local extends Mode
  /** Filesystem truncation (`checkpoint`) — cluster-fault-tolerant; needs
    * `spark.sparkContext.setCheckpointDir(...)`. */
  case object Reliable extends Mode

  /** Truncate `df`'s lineage under `mode` (eager in both modes).
    *
    * The checkpointed frame is re-wrapped through
    * [[org.apache.spark.sql.GraftRddBridge.resetPlanMetadata]]: Spark's
    * checkpoint copies the origin plan's ESTIMATED size statistics onto
    * the replacement scan, and size-only join estimation multiplies child
    * sizes — so in an iterative operator the inherited estimate is a
    * product of products, a BigInt whose bit-length grows geometrically
    * with rounds until the driver spends minutes multiplying it
    * (observed live; see the bridge's scaladoc). Resetting to the scan
    * default keeps every round's stats O(1). */
  def cut(df: DataFrame, mode: Mode): DataFrame = {
    val ck = mode match {
      case Local    => df.localCheckpoint()
      case Reliable => df.checkpoint()
    }
    org.apache.spark.sql.GraftRddBridge.resetPlanMetadata(ck)
  }
}
