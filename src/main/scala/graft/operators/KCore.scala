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
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local)
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
