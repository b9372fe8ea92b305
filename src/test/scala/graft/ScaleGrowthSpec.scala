package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.Tag

object SlowTest extends Tag("graft.SlowTest")

/** Scale-growth canary for the dedup/BPE family: wall-time must grow
  * ~linearly in corpus size, catching accidental quadratic candidate
  * growth (an unbanded LSH join, an unbounded window self-join, a
  * per-round corpus rescan) BEFORE any real scale-up.
  *
  * Method: the sf0.01 documents fixture (1×) vs a deterministic 10×
  * blow-up where copy k rotates the letters a-j by k, so copies share
  * essentially no shingles and the per-copy duplicate structure is
  * preserved exactly — corpus size grows 10×, near-dup group sizes do
  * not. Each operator is timed warm (one JIT/codegen pass first); the
  * ratio bound of 25× allows generous constant-factor noise on a shared
  * box while a quadratic op would show ~100×.
  *
  * Slow suite: `GRAFT_SLOW=1 sbt "testOnly graft.ScaleGrowthSpec"` —
  * skipped (canceled) in the default run. Recorded ratios from the
  * round-3 run on local[4] are noted inline per operator.
  */
class ScaleGrowthSpec extends SparkSuite {

  private def blowUp(docs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { k =>
      val rot = "abcdefghij".drop(k) + "abcdefghij".take(k)
      docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        (if (k == 0) col("text")
         else translate(col("text"), "abcdefghij", rot)).as("text"))
    }.reduce(_ unionByName _)

  private def timeSec(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  test("dedup/BPE wall-time grows ~linearly under a 10x corpus blow-up",
      SlowTest) {
    assume(sys.env.contains("GRAFT_SLOW"),
      "slow suite — run with GRAFT_SLOW=1")
    val base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    // materialize both corpora to parquet so each timed run pays an
    // identical flat scan, not a lineage replay
    val dir = java.nio.file.Files.createTempDirectory("graft_growth")
    val p1 = s"$dir/x1"; val p10 = s"$dir/x10"
    blowUp(base, 1).write.mode("overwrite").parquet(p1)
    blowUp(base, 10).write.mode("overwrite").parquet(p10)
    val d1 = spark.read.parquet(p1)
    val d10 = spark.read.parquet(p10)

    // measured r3 (local[4], sf0.01 base): minhash_clusters 1.4x,
    // fuzzy_dedup 1.4x, substr_flags 3.0x, bpe_train 1.1x — fixed
    // per-job overhead dominates at this scale, so sub-linear ratios
    // are expected; the bound only needs to separate linear from
    // quadratic (~100x)
    val ops: Seq[(String, DataFrame => Unit)] = Seq(
      ("minhash_clusters", d => {
        graft.operators.MinHashDedup
          .clustersMaterialized(d, "doc_id", "text").count(); () }),
      ("fuzzy_dedup", d => {
        graft.operators.MinHashDedup
          .fuzzyDedup(d, "doc_id", "text", threshold = 0.8).count(); () }),
      ("substr_flags", d => {
        graft.operators.SubstrDedup
          .flags(d, "doc_id", "text", k = 12).count(); () }),
      ("bpe_train", d => {
        graft.functions.Bpe.train(d, "text", numMerges = 6); () }))

    try {
      val bad = ops.flatMap { case (name, op) =>
        op(d1) // warm JIT + codegen outside timing
        spark.catalog.clearCache()
        val t1 = timeSec(op(d1))
        spark.catalog.clearCache()
        val t10 = timeSec(op(d10))
        spark.catalog.clearCache()
        val ratio = t10 / math.max(t1, 1e-3)
        info(f"[scale-growth] $name%-18s t1=$t1%6.2fs  t10=$t10%6.2fs  " +
          f"ratio=$ratio%5.1fx")
        if (ratio > 25.0) Some(f"$name: $ratio%.1fx (>25x — superlinear)")
        else None
      }
      assert(bad.isEmpty, bad.mkString("; "))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
