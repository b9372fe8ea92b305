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
      // SMALL-GRAPH FAST PATH (bounded-collect contract of
      // Components.labels): the per-hop fixed cost (join + distinct +
      // anti-join + lineage cut + isEmpty collect) dominates when the
      // link graph is small next to the corpus. When the DISTRIBUTED
      // counts say edges AND distinct seeds fit the driver, collect both
      // and run the queue BFS; reached (id, hop) rows ride back as a
      // settled frame — identical values (integer hop counts, edge-side
      // id values) to the distributed loop, with the final one-row-per-
      // vertex left join staying distributed (`vertices` is never
      // collected). Collect is bounded BY CONSTRUCTION: counts checked
      // first, distributed path otherwise.
      val seedsD = seeds.select(col(idCol).as("_id")).distinct()
      if (e.count() <= driverCutoff) {
        val nSeeds = seedsD.count()
        if (nSeeds <= driverCutoff) {
          val eRows = e.collect()
          val sRows = seedsD.collect()
          val idx = new java.util.HashMap[Any, Integer](
            eRows.length * 2 + sRows.length)
          def id(x: Any): Int = {
            val cur = idx.get(x)
            if (cur eq null) { val n = idx.size(); idx.put(x, n); n }
            else cur.intValue()
          }
          val us = new Array[Int](eRows.length)
          val vs = new Array[Int](eRows.length)
          var i = 0
          while (i < eRows.length) {
            us(i) = id(eRows(i).get(0)); vs(i) = id(eRows(i).get(1)); i += 1
          }
          val n0 = idx.size() // seeds beyond this index have no out-edges
          val deg = new Array[Int](n0)
          i = 0; while (i < eRows.length) { deg(us(i)) += 1; i += 1 }
          val off = new Array[Int](n0 + 1)
          i = 0; while (i < n0) { off(i + 1) = off(i) + deg(i); i += 1 }
          val adj = new Array[Int](eRows.length)
          val fill = java.util.Arrays.copyOf(off, n0)
          i = 0
          while (i < eRows.length) {
            adj(fill(us(i))) = vs(i); fill(us(i)) += 1; i += 1
          }
          val n = idx.size() + sRows.length // upper bound before seed ids
          val dist = new Array[Long](n)
          java.util.Arrays.fill(dist, -1L)
          val queue = new java.util.ArrayDeque[Integer]()
          i = 0
          while (i < sRows.length) {
            val s = id(sRows(i).get(0))
            if (dist(s) < 0) { dist(s) = 0L; queue.add(s) }
            i += 1
          }
          while (!queue.isEmpty) {
            val u = queue.poll().intValue()
            if (dist(u) < maxHops && u < n0) {
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
          idx.forEach { (key, at) =>
            val d = dist(at.intValue())
            if (d >= 0) { out += org.apache.spark.sql.Row(key, d); () }
          }
          val spark = vertices.sparkSession
          val idType = e.schema.head.dataType
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("_id", idType),
            org.apache.spark.sql.types.StructField("_d",
              org.apache.spark.sql.types.LongType)))
          val settledDf = spark.createDataFrame(
            spark.sparkContext.parallelize(out.toSeq,
              math.max(1, out.length / 500000)), schema)
          return vertices.select(col(idCol).as("_id"))
            .join(settledDf, Seq("_id"), "left")
            .select(col("_id").as(idCol), col("_d").as("dist"))
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
