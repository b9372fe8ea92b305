package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the classic
  * word-type formulation (Sennrich et al. 2016): words collapse to
  * (type, frequency) pairs once, and every merge round counts adjacent
  * symbol pairs over the TYPE table weighted by frequency. State per round
  * is vocabulary-sized, not corpus-sized — the property that makes BPE
  * training tractable at 100 TB (the corpus is scanned exactly once, for
  * the type table; all M merge rounds run over the tiny type frame).
  *
  * Determinism: the merge choice orders by (count desc, left asc,
  * right asc) — a total order, so the merge table is engine- and
  * partitioning-independent, and the per-round pair-count aux lets an
  * independent engine re-derive every argmax (the correctness gate).
  *
  * Greedy left-to-right application within a word (`aaa` + merge (a,a) →
  * `[aa, a]`), matching the reference implementations.
  */
object Bpe {

  final case class Merge(round: Int, left: String, right: String, freq: Long)

  /** The (word, freq, symbols) type table: one corpus scan, then
    * vocabulary-sized forever. Words are lowercased `\s+` tokens; symbols
    * start as single characters. */
  def typeTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(regexp_replace(lower(col(textCol)),
        "\\s+", " ")), " ")).as("_word"))
      .filter(length(col("_word")) > 0)
      .groupBy(col("_word")).agg(count(lit(1)).as("_freq"))
      .withColumn("_syms", split(col("_word"), ""))

  /** Adjacent-pair counts over a symbolized type table, frequency-weighted.
    * Returns (_a, _b, _cnt). */
  def pairCounts(types: DataFrame): DataFrame =
    types
      .select(col("_freq"), explode(zip_with(
        slice(col("_syms"), lit(1), greatest(size(col("_syms")) - 1, lit(0))),
        slice(col("_syms"), lit(2), greatest(size(col("_syms")) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))).as("_p"))
      .groupBy(col("_p.a").as("_a"), col("_p.b").as("_b"))
      .agg(sum(col("_freq")).as("_cnt"))

  /** One greedy left-to-right merge pass over a symbol array. */
  private[functions] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      array().cast(ArrayType(StringType)),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train `numMerges` merges. Each round: one pair-count aggregate over
    * the type table + a 1-row argmax collect + a merge projection applied
    * only to types containing the pair. `auxDir`, when set, materializes
    * every round's full pair-count table (the oracle re-derives each
    * argmax from it). The type table is checkpointed per round so the
    * iterative plan stays constant-size; `ckpt` picks where that state
    * lives — [[graft.core.Checkpoints.Reliable]] for a cluster run (see
    * Checkpoints' scaladoc). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      auxDir: Option[String] = None,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local)
      : Seq[Merge] = {
    import graft.core.Checkpoints
    var types = Checkpoints.cut(typeTable(df, textCol), ckpt)
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val pc = pairCounts(types)
      auxDir.foreach { d =>
        pc.withColumn("_round", lit(r)).write.mode(
          if (r == 0) "overwrite" else "append").parquet(d)
      }
      val top = pc.orderBy(col("_cnt").desc, col("_a").asc, col("_b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(r, a, b, n)
        val prev = types
        types = Checkpoints.cut(types.withColumn("_syms",
          when(array_contains(col("_syms"), a) &&
            array_contains(col("_syms"), b),
            applyMerge(col("_syms"), a, b)).otherwise(col("_syms"))), ckpt)
        // release the superseded round's checkpoint blocks — realistic
        // merge counts are thousands of rounds, and without this every
        // round pins another copy of the type table in executor storage
        // (no-op under Reliable: checkpoint files are cleaned by Spark's
        // reference tracker, not by unpersist)
        prev.unpersist()
        r += 1
      }
    }
    merges.result()
  }

  /** Encode a text column with a trained merge list: one character split +
    * the codegen'd [[BpeApply]] kernel running all M merge passes in one
    * call, inside one projection (no shuffle — the encoder is a pure scan
    * at any corpus size). */
  def encode(text: Column, merges: Seq[Merge]): Column =
    BpeApply.bpe_apply(
      split(trim(regexp_replace(lower(text), "\\s+", " ")), ""),
      merges.map(m => (m.left, m.right)))

  /** The M-chained-`aggregate` Column spelling `encode` replaced — O(M·n²)
    * interpreted folds; kept as the bit-equality regression twin. */
  private[graft] def encodeTreeForm(text: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(split(trim(regexp_replace(lower(text), "\\s+", " ")), "")
        .as("syms")) {
      (syms, m) => applyMerge(syms, m.left, m.right)
    }

  /** Persist a merge list as one JSON artifact (the tokenizer file a
    * training job ships with its corpus); `load` restores it for encode.
    * Any Hadoop-visible path works (file://, s3a://, hdfs://). */
  def save(merges: Seq[Merge], spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val json = graft.service.MiniJson.render(merges.map(m => Map(
      "round" -> m.round.toLong, "left" -> m.left, "right" -> m.right,
      "freq" -> m.freq)).toList)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes =
      try in.readAllBytes()
      finally in.close()
    graft.service.MiniJson
      .parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[List[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
      .map(m => Merge(m("round").asInstanceOf[Long].toInt,
        m("left").asInstanceOf[String], m("right").asInstanceOf[String],
        m("freq").asInstanceOf[Long]))
  }

  /** The learned subword vocabulary: every merge product plus the single
    * characters seen in training, plus the `" "` separator symbol —
    * `encode` works on whitespace-normalized text whose spaces survive as
    * standalone symbols (they never merge: no trained pair contains one),
    * so a vocab-index consumer needs the space token present. */
  def vocab(types: DataFrame, merges: Seq[Merge]): Seq[String] = {
    val chars = types.select(explode(col("_syms")).as("c"))
      .distinct().collect().map(_.getString(0))
    (chars ++ merges.map(m => m.left + m.right) :+ " ").distinct.sorted.toSeq
  }
}
