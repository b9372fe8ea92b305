package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution END-TO-END: blocked fuzzy matching → connected
  * components → one GOLDEN RECORD per cluster by survivorship merge —
  * the "dedupe my customer table" capstone
  * (dedup-by-key and fuzzy-pair detection exist separately; this is the
  * piece that produces the merged record a downstream system loads).
  *
  * Survivorship rule (deterministic, engine-portable): per cluster and
  * field, the MOST FREQUENT non-null value wins; frequency ties break to
  * the lexicographically smallest value. Cluster identity is the minimum
  * member id (stable under re-runs and partitioning).
  *
  * Scale shape: candidate pairs come from [[FuzzyMatch.editDistanceJoin]]
  * (prefix-filtered q-gram blocking — never a cross product), clusters
  * from [[Components.labels]] (large/small-star, O(log n) rounds), and the
  * survivorship vote melts the K attribute columns into (cluster, field,
  * value) rows — ONE count aggregate and one per-(cluster, field) top-1
  * window regardless of K, instead of K separate mode jobs. */
object EntityResolution {

  /** Long-form golden records: (cluster_id, n_members, field,
    * golden_value), one row per cluster × attribute. `attrs` values are
    * compared AS STRINGS (cast explicitly before calling if a column's
    * string form is engine-ambiguous — e.g. cast doubles to DECIMAL).
    *
    * Duplicate ids are legal and mean "multiple observations of one
    * record": membership (`n_members`) counts DISTINCT ids, while the
    * survivorship vote counts every observation ROW once. Labels are
    * computed over distinct ids — labeling the raw id column would hand
    * a duplicated id one label row per copy, and the melt join would then
    * multiply that id's votes by its copy count (caught by the sf1 sweep,
    * where the gate fixture's id offsets collide with real keys). */
  def goldenRecords(df: DataFrame, idCol: String, matchCol: String,
      attrs: Seq[String], maxDist: Int = 1,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local)
      : DataFrame = {
    require(attrs.nonEmpty, "need at least one attribute to merge")
    require(attrs.distinct == attrs,
      s"duplicate attributes would collapse in the melt map: $attrs")
    val pairs = FuzzyMatch.editDistanceJoin(
      df.select(col(idCol), col(matchCol)),
      df.select(col(idCol).as("_id2"), col(matchCol).as("_s2")),
      idCol, matchCol, "_id2", "_s2", maxDist)
      .filter(col(idCol) < col("_id2"))
    val labels = Components.labels(df.select(col(idCol)).distinct(), idCol,
      pairs, idCol, "_id2", ckpt = ckpt)
      .withColumnRenamed("cluster", "cluster_id")
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    val melted = df.join(labels, idCol)
      .select(col("cluster_id"),
        explode(map(attrs.flatMap(a =>
          Seq(lit(a), col(a).cast("string"))): _*))
          .as(Seq("field", "value")))
      .filter(col("value").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"), col("field"))
      .orderBy(col("_n").desc, col("value").asc)
    melted.groupBy(col("cluster_id"), col("field"), col("value"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .join(sizes, Seq("cluster_id"))
      .select(col("cluster_id"), col("n_members"), col("field"),
        col("value").as("golden_value"))
  }
}
