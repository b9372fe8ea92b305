package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Classical sparse featurizers for model-based curation (quality filters,
  * dedup classifiers, topic screens) at corpus scale. Both are one-pass,
  * shuffle-minimal, and deterministic across engines/partitionings — the
  * hashing trick keys on md5 (not a JVM-specific hash), and the label
  * dictionary is ranked by an explicit total order.
  */
object Featurize {

  /** Hashing-trick bag-of-words: (id, bucket, weight) triples with
    * bucket = md5(word) mod `numBuckets`. No vocabulary pass, no dictionary
    * to ship — the fixed-width feature space a streaming-updated model
    * wants. One explode + one (id, bucket) aggregate; raw text never
    * crosses the shuffle, only (id, bucket, partial-count). */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = 1024): DataFrame = {
    val words = df.select(col(idCol),
      explode(split(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")),
        " ")).as("_w"))
    words
      .withColumn("bucket",
        conv(substring(md5(col("_w")), 1, 8), 16, 10).cast(LongType)
          % numBuckets)
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("w"))
  }

  /** Deterministic dense label dictionary: categories ranked by
    * (frequency desc, value asc) take contiguous ids from 0 — the common
    * "encode categoricals for a GBDT/linear model" step. The dictionary is
    * category-cardinality-sized: a tiny aggregate + a window over the tiny
    * frame, broadcast-joined back onto the corpus (never a corpus-wide
    * window). Unseen-at-apply categories map to null. */
  def labelIndex(df: DataFrame, labelCol: String,
      outCol: String): DataFrame = {
    val dict = df.groupBy(col(labelCol))
      .agg(count(lit(1)).as("_freq"))
      .withColumn(outCol,
        row_number().over(
          Window.orderBy(col("_freq").desc, col(labelCol).asc)) - 1)
      .select(col(labelCol), col(outCol))
    df.join(broadcast(dict), Seq(labelCol), "left")
  }
}
