package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: long-lived ingest directories accumulate
  * thousands of tiny parquet files (per-batch appends, over-partitioned
  * writes), and every downstream scan then pays a task + footer read per
  * file. Rewrite the directory into ~`targetBytesPerFile` files: the file
  * count comes from `listStatus` sizes — METADATA only, so the data is
  * scanned exactly once — then one `repartition` (round-robin — keeps
  * files uniform), one write to a sibling temp dir, and an atomic-enough
  * swap (rename old → trash name, temp → dir, delete old). The swap is
  * directory-level, so a concurrent reader sees the old files or the new
  * ones, never a mix. */
object Compact {

  /** Returns (bytes, filesBefore, filesAfter). */
  def rewrite(spark: SparkSession, dir: String,
      targetBytesPerFile: Long): (Long, Int, Int) = {
    require(targetBytesPerFile > 0, "targetBytesPerFile must be positive")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquet(p: Path) = fs.listStatus(p)
      .filter(s => s.getPath.getName.endsWith(".parquet"))
    val beforeList = parquet(new Path(dir))
    val bytes = beforeList.map(_.getLen).sum
    val nFiles = math.max(1L, (bytes + targetBytesPerFile - 1)
      / targetBytesPerFile).toInt
    val tmp = new Path(dir + "._compact_tmp")
    val old = new Path(dir + "._compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(new Path(dir), old), s"swap failed: $dir -> $old")
    require(fs.rename(tmp, new Path(dir)), s"swap failed: $tmp -> $dir")
    fs.delete(old, true)
    (bytes, beforeList.length, parquet(new Path(dir)).length)
  }
}
