package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance over an explicit directed edge list —
  * "link distance from a trusted seed set", the classic crawl-corpus
  * quality signal (pages few hops from curated seeds are likelier to be
  * worth keeping; harvested spam sits far from every seed).
  *
  * Physical shape per round: one equi-join of the CURRENT FRONTIER
  * against the edge list (shuffle keyed on the uniformly-hashed vertex
  * id) + one anti-join against the settled-distance table. Only newly
  * reached vertices expand, so total work across all rounds is one pass
  * over each reachable edge — O(|E|) like any BFS, never frontier × E.
  * Per-round state (settled distances) is one row per reached vertex and
  * is lineage-cut every round (see Components.labels' scaladoc for why
  * iterated self-joins MUST truncate lineage). Rounds = min(eccentricity
  * of the seed set, maxHops); web-ish graphs are shallow (~6-20 hops),
  * so the job count is small and independent of corpus size.
  */
object Bfs {

  /** Hop distance from `seeds` (a one-column frame of seed vertex ids,
    * column name `idCol`) along DIRECTED `edges`. Returns one row per
    * `vertices` row: (idCol, dist) with dist = fewest hops from any
    * seed, NULL if unreachable within `maxHops`. Ids must be non-null;
    * seed ids outside `vertices` still propagate but don't appear in the
    * output. */
  def distances(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxHops: Int = 20,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local)
      : DataFrame = {
    import graft.core.Checkpoints
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .where(col("_u") =!= col("_v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var settled = Checkpoints.cut(
        seeds.select(col(idCol).as("_id")).distinct()
          .select(col("_id"), lit(0L).as("_d")), ckpt)
      var frontier = settled
      var h = 0L
      var done = frontier.isEmpty
      while (!done && h < maxHops) {
        h += 1
        val next = Checkpoints.cut(
          e.join(frontier, e("_u") === frontier("_id"))
            .select(col("_v").as("_id")).distinct()
            .join(settled, Seq("_id"), "left_anti")
            .select(col("_id"), lit(h).as("_d")), ckpt)
        done = next.isEmpty
        if (!done) settled = Checkpoints.cut(settled.unionByName(next), ckpt)
        frontier = next
      }
      vertices.select(col(idCol).as("_id"))
        .join(settled, Seq("_id"), "left")
        .select(col("_id").as(idCol), col("_d").as("dist"))
    } finally { e.unpersist(); () }
  }
}
