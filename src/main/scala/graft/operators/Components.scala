package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over an explicit undirected edge list, computed
  * with the alternating LARGE-STAR / SMALL-STAR algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014). The labeled
  * output is what semantic dedup ("SemDeDup": keep one doc per embedding
  * near-dup component) and pair-verified fuzzy dedup consume to pick a
  * canonical survivor per duplicate group.
  *
  * Reference behavior: the framework's fuzzy dedup collapses each group of
  * mutually-similar records to one survivor (deduplicator.py's
  * similarity-group pass); this is the same group structure computed from an
  * arbitrary pair list instead of that O(N²) in-memory greedy walk.
  *
  * Why star-contraction and not min-label propagation: propagation moves a
  * component's min id ~one hop per round — O(diameter) rounds, which on the
  * stringy components of a sparse similarity graph measured 83 rounds where
  * this algorithm needs 8 (and a min-label + pointer-jumping hybrid
  * measured exactly as badly; the jump only contracts label trees that
  * propagation keeps shallow anyway). Large-star hangs every
  * larger-than-root neighbor directly under its neighborhood's min;
  * small-star re-hangs the smaller ones; alternating the two provably
  * converges in O(log² n) rounds (O(log n) in practice) to a forest of
  * stars rooted at each component's min id — on ANY graph shape.
  *
  * Physical shape per round: two grouped mins + two equi-joins + distinct,
  * all keyed on uniformly-hashed vertex ids, state bounded by the current
  * edge list (never materializes neighborhoods). Each round's edge list is
  * lineage-cut ([[graft.core.Checkpoints]]); the fixpoint check is a
  * 1-row (count, hash-sum) signature compared to the previous round —
  * edges are transformed idempotently at the fixpoint, so signature
  * equality is the stopping rule. Works at any scale where the EDGE list
  * is linear-ish in the corpus (LSH/blocked candidates — never all pairs).
  */
object Components {

  /** Label every vertex with the MIN id reachable through `edges`
    * (undirected; direction of the input pairs is irrelevant). Vertices
    * absent from `edges` keep their own id. Eager: materializes the
    * fixpoint and returns an (idCol, cluster) table backed by
    * executor-cached state (released when the frame is GC'd). `idCol`
    * values must be non-null and orderable (min() picks the canonical
    * label).
    *
    * Each round's edge table is checkpointed: iterative self-joins
    * OTHERWISE nest the previous round's plan inside the next round's join
    * (attribute-id collisions between frames derived from each other
    * mis-bind the join condition, and plan size grows per round until the
    * optimizer itself OOMs — observed live, not hypothetical). `ckpt`
    * picks where truncated state lives —
    * [[graft.core.Checkpoints.Reliable]] for a real cluster run. */
  def labels(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local,
      driverCutoff: Long = 2000000L)
      : DataFrame = {
    import graft.core.Checkpoints
    require(maxIters >= 1, "maxIters must be >= 1")
    def signature(e: DataFrame): (Long, Any) = {
      // decimal accumulation: a plain long sum of 64-bit hashes overflows
      // (ANSI mode raises)
      val r = e.agg(count(lit(1)), sum(xxhash64(col("_s"), col("_t"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      (r.getLong(0), r.get(1))
    }
    // normalize: oriented larger → smaller, no self-loops, deduped
    var cur = Checkpoints.cut(
      edges.select(col(srcCol).as("_x"), col(dstCol).as("_y"))
        .where(col("_x") =!= col("_y"))
        .select(greatest(col("_x"), col("_y")).as("_s"),
          least(col("_x"), col("_y")).as("_t"))
        .distinct(), ckpt)
    var sig = signature(cur)
    // SMALL-GRAPH FAST PATH: a verified-pair edge list is output-bound, so
    // in practice it is often tiny relative to the corpus (thousands of
    // dup pairs from millions of docs). Star contraction still pays ~8
    // rounds of fixed job overhead (2 aggregates + 2 joins + a lineage cut
    // + a signature collect per round) no matter how small the graph is --
    // measured as the larger half of fuzzy-dedup gate latency. When the
    // DISTRIBUTED count (already in the signature) says the normalized
    // edge list fits the driver (<= driverCutoff edges), collect once via
    // the shared [[SmallGraph]] harness and run union-find with min-root
    // union + path compression -- the label semantics (min reachable id)
    // are identical, the result rides back as a broadcast-sized parent
    // frame, and the collect is bounded BY CONSTRUCTION (count checked
    // first, distributed path otherwise). requireOrdered: the dense remap
    // must sort ids so the min-INDEX root IS the min-ID label -- integral
    // types only (long order == SQL min() order; string ids would need
    // UTF8-binary order, which JVM String ordering does not match), and
    // SmallGraph falls through to the general path for anything else.
    if (sig._1 <= driverCutoff) {
      SmallGraph.collect(cur.select(col("_s"), col("_t")), None,
          requireOrdered = true) match {
        case Some(m) =>
          val parent = Array.tabulate(m.n)(identity)
          def find(x0: Int): Int = {
            var x = x0
            while (parent(x) != x) x = parent(x)
            var y = x0 // path compression
            while (parent(y) != x) { val n = parent(y); parent(y) = x; y = n }
            x
          }
          var i = 0
          while (i < m.us.length) {
            val a = find(m.us(i))
            val b = find(m.vs(i))
            if (a < b) parent(b) = a else if (b < a) parent(a) = b
            i += 1
          }
          // non-root vertices -> their component's min id (roots fall
          // through the left join's coalesce, exactly like the distributed
          // parent)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[org.apache.spark.sql.Row]
          i = 0
          while (i < m.n) {
            val r = find(i)
            if (r != i) {
              out += org.apache.spark.sql.Row(m.idValue(i), m.idValue(r))
              ()
            }
            i += 1
          }
          val idType = cur.schema.head.dataType
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("_s", idType),
            org.apache.spark.sql.types.StructField("_m", idType)))
          val parentDf = SmallGraph.rideBack(vertices.sparkSession,
            out.toSeq, schema)
          return vertices.select(col(idCol))
            .join(broadcast(parentDf), col(idCol) === col("_s"), "left")
            .select(col(idCol), coalesce(col("_m"), col(idCol)).as("cluster"))
        case None => () // non-integral ids: general distributed loop
      }
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // LARGE-STAR: for each vertex u, hang every neighbor v > u under
      // m(u) = min(N(u) ∪ {u})
      val sym = cur.select(col("_s").as("_u"), col("_t").as("_v"))
        .unionByName(cur.select(col("_t").as("_u"), col("_s").as("_v")))
      val lmin = sym.groupBy(col("_u")).agg(min(col("_v")).as("_nm"))
      // no intermediate distinct: |large| ≤ |sym| = 2|E| (linear), smin's
      // min() absorbs duplicates, and `next` dedups — saves a shuffle
      val large = sym.join(lmin, Seq("_u"))
        .where(col("_v") > col("_u"))
        .select(col("_v").as("_h"), least(col("_u"), col("_nm")).as("_l"))
        .where(col("_h") =!= col("_l"))
      // SMALL-STAR: orient h → l (large already emits h > l), then hang
      // each vertex's smaller neighbors — and the vertex itself — under
      // the smallest of them
      val smin = large.groupBy(col("_h")).agg(min(col("_l")).as("_m"))
      val next = Checkpoints.cut(
        large.join(smin, Seq("_h"))
          .select(col("_l").as("_s"), col("_m").as("_t"))
          .where(col("_s") =!= col("_t"))
          .unionByName(smin.select(col("_h").as("_s"), col("_m").as("_t")))
          .distinct(), ckpt)
      val nextSig = signature(next)
      converged = nextSig == sig
      cur = next
      sig = nextSig
      i += 1
    }
    require(converged,
      s"star contraction did not converge in $maxIters rounds — " +
        "raise maxIters (O(log^2 n) rounds suffice for any graph)")
    // fixpoint is a star forest: every edge points at its component's min
    val parent = cur.groupBy(col("_s")).agg(min(col("_t")).as("_m"))
    vertices.select(col(idCol))
      .join(parent, col(idCol) === col("_s"), "left")
      .select(col(idCol), coalesce(col("_m"), col(idCol)).as("cluster"))
  }

  /** SemDeDup-style survivor marking: every vertex labeled with its
    * component's canonical (min) id plus `keep` = "this IS the canonical
    * one". Downstream keeps `keep` rows and drops the rest. */
  def keepCanonical(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local,
      driverCutoff: Long = 2000000L)
      : DataFrame =
    labels(vertices, idCol, edges, srcCol, dstCol, maxIters, ckpt,
      driverCutoff)
      .withColumn("keep", col("cluster") === col(idCol))
}
