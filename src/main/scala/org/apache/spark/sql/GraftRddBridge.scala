package org.apache.spark.sql

/** Bridge into `private[sql]` internalCreateDataFrame: rebuild a DataFrame
  * from an already-materialized Dataset's internal RDD with FRESH plan
  * metadata.
  *
  * Why: `Dataset.localCheckpoint()`/`checkpoint()` copy the origin plan's
  * ESTIMATED statistics onto the replacement `LogicalRDD`
  * (`LogicalRDD.rewriteStatsAndConstraints`). Size-only join estimation
  * multiplies child sizes, so in an iterative operator each round's
  * inherited `sizeInBytes` is a product of the previous round's — the
  * BigInt's bit-length grows geometrically with rounds, and by round ~10
  * the driver spends minutes inside `BigInteger.multiplyToomCook3`
  * computing statistics nobody needs (observed live on the
  * pointer-doubling component loop: 20+ min of driver CPU at sf0.1).
  * Re-wrapping the checkpointed RDD through `internalCreateDataFrame`
  * resets the stats to the scan default, which both kills the blow-up and
  * is the honest estimate for iterative state. The RDD is already
  * materialized, so this adds a lazy row-projection wrapper, not a
  * recompute. */
object GraftRddBridge {
  def resetPlanMetadata(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema)
  }
}
