package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-round label propagation over a similarity pair graph: each
  * UNLABELED record takes the majority label among its labeled neighbors
  * (ties to the lexicographically smallest label) — the cheap
  * semi-supervised step that turns a partial labeling (humans labeled 80%,
  * a new crawl arrived unlabeled) into a full one using any pair source
  * ([[graft.operators.NgramJaccard.pairsWithinBlocks]], LSH candidates, an edge
  * table). Pairs symmetrize with a union, votes are one (doc, label)
  * aggregate, the winner a WindowGroupLimit cut — all keyed shuffles,
  * nothing pairwise beyond the input graph. Records with no labeled
  * neighbor stay absent (re-run on the output to spread further). */
object LabelSpread {

  def vote(df: DataFrame, idCol: String, labelCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // symmetrize with ONE map-side explode, not a self-union: the union
    // spelling references `pairs` twice, and when pairs is an expensive
    // pipeline (the shingle candidate join behind q_label_spread) its
    // post-shuffle tail re-executes once per branch — ReuseExchange dedupes
    // only the exchanges underneath. Identical output multiset: each pair
    // row emits exactly its (a,b) and (b,a) orientations either way.
    val sym = pairs.select(explode(array(
        struct(col(aCol).as("_u"), col(bCol).as("_v")),
        struct(col(bCol).as("_u"), col(aCol).as("_v")))).as("_e"))
      .select(col("_e._u").as("_u"), col("_e._v").as("_v"))
    val unlabeled = df.filter(col(labelCol).isNull)
      .select(col(idCol).as("_u"))
    val labeled = df.filter(col(labelCol).isNotNull)
      .select(col(idCol).as("_v"), col(labelCol).as("_nl"))
    val votes = sym.join(unlabeled, Seq("_u")).join(labeled, Seq("_v"))
      .groupBy(col("_u"), col("_nl")).agg(count(lit(1)).as("n_votes"))
    graft.core.TopK.perKey(votes, Seq("_u"), 1,
      Seq(col("n_votes").desc, col("_nl").asc))
      .select(col("_u").as(idCol), col("_nl").as("label"), col("n_votes"))
  }
}
