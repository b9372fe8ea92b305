package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * k-gram shingles with an evaluation/benchmark set — the standard overlap
  * check run before pretraining (beyond-reference training-data op; shares
  * [[MinHashDedup.shingles]] with the dedup family).
  *
  * Scale shape: the eval set is benchmark-sized (≪ corpus), so its distinct
  * shingle set is built once and BROADCAST; the corpus side is one scan —
  * explode per-doc distinct shingles, broadcast hash join, per-doc count.
  * No corpus-sized shuffle anywhere except the per-doc count aggregation,
  * which is keyed on the corpus id (pre-aggregated map-side). At 100 TB the
  * cost is the corpus scan, which is the floor for any overlap check.
  */
object Decontaminate {

  /** Adds `n_overlap` (distinct shingles shared with the eval set) and
    * `contaminated` (n_overlap ≥ minOverlap) to every corpus row. */
  def flagContaminated(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, k: Int = 3, minOverlap: Long = 1L): DataFrame = {
    val evSh = evalDocs
      .select(explode(MinHashDedup.shingles(col(textCol), k)).as("_sh"))
      .distinct()
    val cSh = corpus.select(col(idCol),
      explode(MinHashDedup.shingles(col(textCol), k)).as("_sh"))
    val hits = cSh.join(broadcast(evSh), Seq("_sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    corpus.join(hits, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }
}
