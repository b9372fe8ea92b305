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
    // symmetrize with one map-side explode: the union spelling scanned the
    // edge source twice (once per orientation); identical output multiset
    val sym = edges.select(explode(array(
        struct(col(srcCol).as("_u"), col(dstCol).as("_v")),
        struct(col(dstCol).as("_u"), col(srcCol).as("_v")))).as("_e"))
      .select(col("_e._u").as("_u"), col("_e._v").as("_v"))
      .where(col("_u") =!= col("_v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // SMALL-GRAPH FAST PATH (shared bounded-collect contract: see
      // [[SmallGraph]]): a similarity/interaction edge list is
      // output-bound and often tiny next to the corpus, yet peeling pays
      // per-round fixed job cost (2 semi-joins + an aggregate + a lineage
      // cut + a count collect) regardless of graph size. When the
      // DISTRIBUTED count says the symmetrized list fits the driver,
      // restrict it to `vertices` endpoints (one distributed semi-join
      // pass -- `vertices` itself is never collected), collect once, and
      // peel in WAVES (all currently-sub-k vertices drop together, new
      // sub-k vertices wait for the next wave) -- exactly the
      // simultaneous-round semantics of the distributed loop, so the same
      // k-core comes back AND the wave count replays the loop's round
      // count: the distributed path needs waves + 1 rounds (the final
      // no-change round detects convergence), and the same maxRounds
      // contract is enforced here for path parity. Id-type gating and the
      // primitive remap live in SmallGraph.collect (BinaryType /
      // mixed-type ids fall through to the distributed loop).
      val nSym = sym.count()
      if (nSym <= 2L * driverCutoff) {
        val vset = vertices.select(col(idCol).as("_id")).distinct()
        val restricted = sym
          .join(vset, col("_u") === vset("_id"), "left_semi")
          .join(vset, col("_v") === vset("_id"), "left_semi")
        SmallGraph.collect(restricted, None) match {
          case Some(m) =>
            val n = m.n
            val (off, adj) = SmallGraph.csr(m.us, m.vs, n)
            val deg = new Array[Int](n)
            var i = 0
            while (i < n) { deg(i) = off(i + 1) - off(i); i += 1 }
            val live = new Array[Boolean](n)
            java.util.Arrays.fill(live, true)
            var wave = new SmallGraph.IntQueue(n)
            i = 0
            while (i < n) { if (deg(i) < k) wave.add(i); i += 1 }
            var waves = 0
            while (!wave.isEmpty) {
              waves += 1
              val next = new SmallGraph.IntQueue(16)
              while (!wave.isEmpty) {
                val u = wave.poll()
                if (live(u)) {
                  live(u) = false
                  var j = off(u)
                  while (j < off(u + 1)) {
                    val v = adj(j)
                    if (live(v)) {
                      deg(v) -= 1
                      // first crossing below k only -- one enqueue per
                      // vertex, next wave (simultaneous semantics)
                      if (deg(v) == k - 1) next.add(v)
                    }
                    j += 1
                  }
                }
              }
              wave = next
            }
            // contract parity with the distributed loop's maxRounds: that
            // loop needs (wave count) + 1 rounds -- and its first round
            // also drops vertices touching NO surviving edge (absent from
            // the collected graph entirely), so their existence alone
            // forces one peeling round. One count on the already-built
            // vset frame decides it.
            val distWaves =
              if (vset.count() > m.n) math.max(waves, 1) else waves
            require(distWaves + 1 <= maxRounds,
              s"$k-core peeling did not converge in $maxRounds rounds")
            val out = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.spark.sql.Row]
            i = 0
            while (i < n) {
              if (live(i)) { out += org.apache.spark.sql.Row(m.idValue(i)); () }
              i += 1
            }
            val schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(idCol,
                sym.schema.head.dataType)))
            return SmallGraph.rideBack(vertices.sparkSession,
              out.toSeq, schema)
          case None => () // unsafe id types: distributed loop below
        }
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
