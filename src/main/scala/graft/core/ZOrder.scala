package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) clustering — the multi-column data-layout tool
  * behind min/max data skipping: rows close on the curve are close in BOTH
  * key dimensions, so range-partitioning + sorting by the curve value gives
  * every parquet file a tight bounding box in each column and scans with
  * predicates on EITHER column prune most files. A single-column sort gets
  * skipping on that column only; Z-order buys it on all curve columns at
  * once. The curve value is pure bit arithmetic — engine-portable and
  * oracle-replayable, unlike hash-based clustering.
  */
object ZOrder {

  /** 2-D Morton value: interleave the low `bits` bits of two non-negative
    * integer columns (x gets the even bit positions, y the odd ones).
    * `bits ≤ 31` keeps the result inside a signed 64-bit long. Callers
    * quantize real-valued keys to non-negative ints first (floor offsets /
    * fixed-point), which also pins the semantic the oracle replays. */
  def zValue2(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val xl = x.cast(LongType); val yl = y.cast(LongType)
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(xl, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(yl, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** N-dimensional Morton value: bit i of column j lands at position
    * `i·n + j`. `bits·n ≤ 63` keeps the value in a signed long — at 3
    * columns that's 21 bits (2M distinct quantized values) per dimension,
    * plenty for file-level skipping. Same portable bit arithmetic as
    * [[zValue2]]. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "need at least two columns")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*cols must fit a signed long: $bits*${cols.size}")
    val n = cols.size
    val parts = for {
      (c, j) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(c.cast(LongType), b).bitwiseAND(lit(1L)),
      b * n + j)
    parts.reduce((a, c) => a.bitwiseOR(c))
  }

  /** [[clusterBy2]] generalized: range-partition + sort on the N-dim curve. */
  def clusterByN(df: DataFrame, colNames: Seq[String], numPartitions: Int,
      bits: Int): DataFrame = {
    val z = Names.fresh("_zorder", df.columns)
    df.withColumn(z, zValueN(colNames.map(col), bits))
      .repartitionByRange(numPartitions, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** Re-layout `df` for two-dimensional data skipping: range-partition on
    * the curve value (one shuffle — the same cost a plain sort pays), sort
    * within partitions, drop the helper column. Write the result with any
    * sink; each output file then covers a tight (xCol, yCol) rectangle. */
  def clusterBy2(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 21): DataFrame = {
    val z = Names.fresh("_zorder", df.columns)
    df.withColumn(z, zValue2(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }
}
