package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition by iterative peeling: repeatedly drop vertices
  * with (undirected) degree < k until none remain; the survivors are the
  * maximal subgraph where everyone keeps ≥ k neighbors INSIDE the
  * subgraph. The standard "dense interaction cluster" extractor — spam
  * rings, citation cores, co-occurrence communities — and a cheap
  * robustness upgrade over raw degree filtering (which a star spammer
  * passes, but a k-core membership test does not).
  *
  * Physical shape per round: two semi-joins restrict the (persisted)
  * symmetrized edge list to live endpoints, one count aggregate computes
  * live degrees, one filter peels — all equi-joins on the uniformly
  * hashed vertex id, no candidate blow-up anywhere. Live state is one id
  * per surviving vertex and is lineage-cut per round (see
  * Components.labels for why iterated self-joins must truncate lineage).
  * Round count is the peeling depth of the graph (the degeneracy
  * ordering's layer count), typically ≤ ~10 on power-law graphs and
  * independent of corpus size; each round's cost shrinks as vertices
  * peel away.
  */
object KCore {

  /** Vertices of the k-core of the UNDIRECTED graph induced by `edges`
    * (input direction irrelevant; self-loops and duplicate edges are
    * dropped, parallel edges count once). Returns a one-column frame
    * (idCol) of surviving vertex ids. Fails loudly if peeling hasn't
    * converged within `maxRounds`. */
  def core(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 30,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local,
      driverCutoff: Long = 2000000L)
      : DataFrame = {
    import graft.core.Checkpoints
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val sym = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .unionByName(edges.select(col(dstCol).as("_u"), col(srcCol).as("_v")))
      .where(col("_u") =!= col("_v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // SMALL-GRAPH FAST PATH (same bounded-collect contract as
      // Components.labels): a similarity/interaction edge list is
      // output-bound and often tiny next to the corpus, yet peeling pays
      // per-round fixed job cost (2 semi-joins + an aggregate + a lineage
      // cut + a count collect) regardless of graph size. When the
      // DISTRIBUTED count says the symmetrized list fits the driver,
      // restrict it to `vertices` endpoints (one distributed semi-join
      // pass — `vertices` itself is never collected), collect once, and
      // peel with an in-memory queue. Simultaneous-round vs sequential
      // peeling yields the SAME k-core (standard invariance), so the
      // result is row-identical to the distributed loop. Collect is
      // bounded BY CONSTRUCTION: count checked first, distributed path
      // otherwise.
      val nSym = sym.count()
      if (nSym <= 2L * driverCutoff) {
        val vset = vertices.select(col(idCol).as("_id")).distinct()
        val rows = sym
          .join(vset, col("_u") === vset("_id"), "left_semi")
          .join(vset, col("_v") === vset("_id"), "left_semi")
          .collect()
        val idx = new java.util.HashMap[Any, Integer](rows.length)
        def id(x: Any): Int = {
          val cur = idx.get(x)
          if (cur eq null) { val n = idx.size(); idx.put(x, n); n }
          else cur.intValue()
        }
        val us = new Array[Int](rows.length)
        val vs = new Array[Int](rows.length)
        var i = 0
        while (i < rows.length) {
          us(i) = id(rows(i).get(0)); vs(i) = id(rows(i).get(1)); i += 1
        }
        val n = idx.size()
        // CSR adjacency over the directed (already symmetrized) pairs
        val deg = new Array[Int](n)
        i = 0; while (i < rows.length) { deg(us(i)) += 1; i += 1 }
        val off = new Array[Int](n + 1)
        i = 0; while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
        val adj = new Array[Int](rows.length)
        val fill = java.util.Arrays.copyOf(off, n)
        i = 0
        while (i < rows.length) {
          adj(fill(us(i))) = vs(i); fill(us(i)) += 1; i += 1
        }
        // queue-based peeling: degrees only decrease, each vertex enters
        // the queue once — O(|E|) total
        val live = new Array[Boolean](n)
        java.util.Arrays.fill(live, true)
        val queue = new java.util.ArrayDeque[Integer]()
        i = 0; while (i < n) { if (deg(i) < k) queue.add(i); i += 1 }
        while (!queue.isEmpty) {
          val u = queue.poll().intValue()
          if (live(u)) {
            live(u) = false
            var j = off(u)
            while (j < off(u + 1)) {
              val v = adj(j)
              if (live(v)) { deg(v) -= 1; if (deg(v) < k) queue.add(v) }
              j += 1
            }
          }
        }
        val out = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.Row]
        idx.forEach { (key, at) =>
          if (live(at.intValue())) { out += org.apache.spark.sql.Row(key); () }
        }
        val spark = vertices.sparkSession
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            sym.schema.head.dataType)))
        return spark.createDataFrame(
          spark.sparkContext.parallelize(out.toSeq,
            math.max(1, out.length / 500000)), schema)
      }
      var alive = Checkpoints.cut(
        vertices.select(col(idCol).as("_id")).distinct(), ckpt)
      var nAlive = alive.count()
      // alive only shrinks, so edges with both endpoints alive at round i
      // are a subset of round i-1's live edges — probe the SHRINKING live
      // edge set each round, not the full list: per-round cost is
      // O(|E_live|), and on a hub-and-spoke corpus graph most edges peel
      // away in the first rounds
      var liveEdges = Checkpoints.cut(sym, ckpt)
      var converged = false
      var i = 0
      while (!converged && i < maxRounds) {
        liveEdges = Checkpoints.cut(
          liveEdges
            .join(alive, liveEdges("_u") === alive("_id"), "left_semi")
            .join(alive, liveEdges("_v") === alive("_id"), "left_semi"),
          ckpt)
        val next = Checkpoints.cut(
          liveEdges.groupBy(col("_u")).agg(count(lit(1)).as("_deg"))
            .where(col("_deg") >= k)
            .select(col("_u").as("_id")), ckpt)
        val nNext = next.count()
        converged = nNext == nAlive
        alive = next
        nAlive = nNext
        i += 1
      }
      require(converged,
        s"$k-core peeling did not converge in $maxRounds rounds")
      alive.select(col("_id").as(idCol))
    } finally { sym.unpersist(); () }
  }
}
