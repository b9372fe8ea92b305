package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.Checkpoints

/** Dense, contiguous 0..N−1 row numbering in a caller-supplied TOTAL order
  * — the training-data sharding primitive ("give every document a stable
  * global id", "assign examples to shard files round-robin"). The naive
  * spelling, `row_number() OVER (ORDER BY ...)`, funnels ALL rows through
  * ONE task (an unpartitioned window) — the canonical 100 TB scale-killer,
  * and one this repo's PlanHygieneSpec mechanically forbids.
  * `monotonically_increasing_id` is distributed but leaves partition-sized
  * gaps and follows no order. The scale shape is a two-level number:
  *
  *   1. range-repartition by the order columns (one range shuffle — the
  *      same cost a sort would pay, and the ONLY wide operation here);
  *   2. per-partition local row_number — a window PARTITIONED by the
  *      physical partition id, so every task numbers only its own slice;
  *   3. add each partition's starting offset — a <=numShards-row count
  *      aggregate, cumulated on the driver (bounded: one row per shard)
  *      and broadcast-joined back.
  *
  * The ranged layout is lineage-CUT (checkpointed) before use: Spark's
  * RangePartitioner seeds its boundary sampling with the RDD id, so two
  * separate actions over the same repartitionByRange plan can compute
  * DIFFERENT boundaries — the offset pass and the numbering pass must read
  * one pinned layout or the offsets silently mismatch the ranks (caught by
  * this operator's shard-count-independence spec). The cut is also why the
  * result is safe to consume any number of times afterwards.
  *
  * The order columns must form a total order (include a unique tiebreaker
  * such as the row's id): the final index is then independent of shard
  * boundaries, file splits, and cluster size — re-running at 10 or 1000
  * executors yields byte-identical numbering.
  */
object GlobalIndex {

  /** `df` plus `indexCol` = 0..N−1 following `orderCols` (must be a total
    * order). `numShards` <= 0 uses spark.sql.shuffle.partitions. Use
    * `Checkpoints.Reliable` on a real cluster (see [[Checkpoints]]). */
  def denseIndex(df: DataFrame, orderCols: Seq[Column],
      indexCol: String = "global_index", numShards: Int = 0,
      ckpt: Checkpoints.Mode = Checkpoints.Local): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val shards =
      if (numShards > 0) numShards
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = Checkpoints.cut(
      df.repartitionByRange(shards, orderCols: _*)
        .withColumn("_shard", spark_partition_id().cast(LongType)),
      ckpt)
    val counts = ranged.groupBy(col("_shard"))
      .agg(count(lit(1)).as("_n"))
      .collect() // bounded: one row per shard
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (shard, n) =>
      val o = (shard, acc); acc += n; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_shard", "_offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_shard")).orderBy(orderCols: _*)
    ranged
      .withColumn("_rn", row_number().over(w).cast(LongType))
      .join(broadcast(offsetDf), Seq("_shard"))
      .withColumn(indexCol, col("_offset") + col("_rn") - lit(1L))
      .drop("_shard", "_rn", "_offset")
  }

  /** Global running total of `valueCol` in a total order — the distributed
    * prefix sum. Same two-level shape as [[denseIndex]]: per-shard window
    * cumsum + each shard's starting offset (the sum of all earlier shards'
    * totals, cumulated from a <=numShards-row aggregate on the driver).
    * `sumCol` is the INCLUSIVE running total as DECIMAL(38,0) (exact for
    * integer-valued inputs at any scale — 100 TB of token counts overflows
    * a long-summed double's 53-bit mantissa long before it overflows
    * decimal38). The order columns must form a total order. */
  def prefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: String,
      sumCol: String = "running_total", numShards: Int = 0,
      ckpt: Checkpoints.Mode = Checkpoints.Local): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val shards =
      if (numShards > 0) numShards
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val ranged = Checkpoints.cut(
      df.repartitionByRange(shards, orderCols: _*)
        .withColumn("_shard", spark_partition_id().cast(LongType)),
      ckpt)
    val totals = ranged.groupBy(col("_shard"))
      // coalesce: an all-null-value shard must contribute 0, not a null
      // that poisons the driver-side accumulation
      .agg(coalesce(sum(col(valueCol).cast(d38)), lit(0).cast(d38)).as("_t"))
      .collect() // bounded: one row per shard
      .map(r => r.getLong(0) -> r.getDecimal(1)).sortBy(_._1)
    var acc = java.math.BigDecimal.ZERO
    val offsets = totals.map { case (shard, t) =>
      val o = (shard, acc); acc = acc.add(t); o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.map { case (s0, b) => (s0, b.toString) }
      .toDF("_shard", "_offset")
      .select(col("_shard"), col("_offset").cast(d38).as("_offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_shard")).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranged
      .withColumn("_cum", sum(col(valueCol).cast(d38)).over(w))
      .join(broadcast(offsetDf), Seq("_shard"))
      .withColumn(sumCol, (col("_offset") + col("_cum")).cast(d38))
      .drop("_shard", "_cum", "_offset")
  }

  /** Sequence packing — assign documents to fixed-token-budget training
    * packs by contiguous fill in a total order: pack_id =
    * (running_total − len) / budget (integer division of the EXCLUSIVE
    * prefix sum), i.e. each pack takes documents until its budget line is
    * crossed, then the next pack starts. One range shuffle (the prefix
    * sum) — no sequential driver loop, no per-pack state: the classic
    * "pack the corpus into 8k-token sequences" pre-tokenization step, at
    * any scale. Documents longer than `budget` get a pack of their own
    * (possibly sharing its start — contiguous fill never splits a doc;
    * splitting belongs to the tokenizer). Also emits `pos_in_pack` =
    * exclusive prefix within the pack's fill line (the offset where this
    * doc's tokens land). */
  def packSequences(df: DataFrame, orderCols: Seq[Column], lenCol: String,
      budget: Long, packCol: String = "pack_id", numShards: Int = 0,
      ckpt: Checkpoints.Mode = Checkpoints.Local): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // the exclusive prefix fits a long for any feasible corpus (9e18
    // tokens); `div` keeps the division integer-exact (a double `/` would
    // round past 2^53)
    prefixSum(df, orderCols, lenCol, "_rt", numShards, ckpt)
      .withColumn("_excl",
        (col("_rt") - col(lenCol).cast(LongType)).cast(LongType))
      .withColumn(packCol, expr(s"_excl div ${budget}L"))
      .withColumn("pos_in_pack", col("_excl") - col(packCol) * lit(budget))
      .drop("_rt", "_excl")
  }
}
