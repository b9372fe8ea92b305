package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: long-lived ingest directories accumulate
  * thousands of tiny parquet files (per-batch appends, over-partitioned
  * writes), and every downstream scan then pays a task + footer read per
  * file. Rewrite the directory into ~`targetRowsPerFile` files: one read,
  * one `repartition` (round-robin — keeps files uniform), one write to a
  * sibling temp dir, then an atomic-enough swap (rename old → trash name,
  * temp → dir, delete old). The swap is directory-level, so a concurrent
  * reader sees the old files or the new ones, never a mix. */
object Compact {

  /** Returns (rows, filesBefore, filesAfter). */
  def rewrite(spark: SparkSession, dir: String,
      targetRowsPerFile: Long): (Long, Int, Int) = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: Path): Int =
      fs.listStatus(p).count(s => s.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(new Path(dir))
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1)
      / targetRowsPerFile).toInt
    val tmp = new Path(dir + "._compact_tmp")
    val old = new Path(dir + "._compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(new Path(dir), old), s"swap failed: $dir -> $old")
    require(fs.rename(tmp, new Path(dir)), s"swap failed: $tmp -> $dir")
    fs.delete(old, true)
    (rows, before, parquetFiles(new Path(dir)))
  }
}
