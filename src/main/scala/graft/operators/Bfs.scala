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
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local,
      driverCutoff: Long = 2000000L)
      : DataFrame = {
    import graft.core.Checkpoints
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .where(col("_u") =!= col("_v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // SMALL-GRAPH FAST PATH (shared bounded-collect contract: see
      // [[SmallGraph]]): the per-hop fixed cost (join + distinct +
      // anti-join + lineage cut + isEmpty collect) dominates when the
      // link graph is small next to the corpus. When the DISTRIBUTED
      // counts say edges AND distinct seeds fit the driver, collect both
      // through the harness and run the queue BFS; reached (id, hop) rows
      // ride back as a settled frame -- identical values (integer hop
      // counts, id values of the shared edge/seed type) to the
      // distributed loop, with the final one-row-per-vertex left join
      // staying distributed (`vertices` is never collected). Id-type
      // gating lives in SmallGraph.collect: edge src, edge dst, and seed
      // columns must share one integral-or-string type (BinaryType
      // reference-equality and mixed-numeric coercion hazards fall
      // through to the distributed loop, whose SQL joins compare by
      // value). Collect is bounded BY CONSTRUCTION: counts checked
      // first, distributed path otherwise.
      val seedsD = seeds.select(col(idCol).as("_id")).distinct()
      if (e.count() <= driverCutoff && seedsD.count() <= driverCutoff) {
        SmallGraph.collect(e, Some(seedsD)) match {
          case Some(m) =>
            val n = m.n
            val (off, adj) = SmallGraph.csr(m.us, m.vs, n)
            val dist = new Array[Long](n)
            java.util.Arrays.fill(dist, -1L)
            val queue = new SmallGraph.IntQueue(m.extraIdx.length)
            var i = 0
            while (i < m.extraIdx.length) {
              val s0 = m.extraIdx(i)
              if (dist(s0) < 0) { dist(s0) = 0L; queue.add(s0) }
              i += 1
            }
            while (!queue.isEmpty) {
              val u = queue.poll()
              if (dist(u) < maxHops) {
                var j = off(u)
                while (j < off(u + 1)) {
                  val v = adj(j)
                  if (dist(v) < 0) { dist(v) = dist(u) + 1L; queue.add(v) }
                  j += 1
                }
              }
            }
            val out = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.spark.sql.Row]
            i = 0
            while (i < n) {
              if (dist(i) >= 0) {
                out += org.apache.spark.sql.Row(m.idValue(i), dist(i))
                ()
              }
              i += 1
            }
            val schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("_id",
                e.schema.head.dataType),
              org.apache.spark.sql.types.StructField("_d",
                org.apache.spark.sql.types.LongType)))
            val settledDf = SmallGraph.rideBack(vertices.sparkSession,
              out.toSeq, schema)
            return vertices.select(col(idCol).as("_id"))
              .join(settledDf, Seq("_id"), "left")
              .select(col("_id").as(idCol), col("_d").as("dist"))
          case None => () // unsafe id types: distributed loop below
        }
      }
      var settled = Checkpoints.cut(
        seedsD.select(col("_id"), lit(0L).as("_d")), ckpt)
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
