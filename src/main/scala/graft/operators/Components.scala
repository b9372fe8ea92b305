package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an explicit undirected edge list by iterated
  * min-label propagation, run to a driver-checked FIXPOINT. The labeled
  * output is what semantic dedup ("SemDeDup": keep one doc per embedding
  * near-dup component) and pair-verified fuzzy dedup consume to pick a
  * canonical survivor per duplicate group.
  *
  * Reference behavior: the framework's fuzzy dedup collapses each group of
  * mutually-similar records to one survivor (deduplicator.py's
  * similarity-group pass); this is the same group structure computed from an
  * arbitrary pair list instead of that O(N²) in-memory greedy walk.
  *
  * Physical shape per round: one shuffle keyed on the edge endpoint plus one
  * small label join — both on uniformly-hashed ids. The symmetrized edge
  * list persists once; per-round state is exactly one (id, label) row per
  * vertex, far smaller than the corpus. Rounds needed = eccentricity of each
  * component's min vertex (≤ diameter); near-dup components are clique-ish
  * and shallow, so this converges in 2-3 rounds and the fixpoint check adds
  * one cheap count per round. Works at any scale where the EDGE list is
  * linear-ish in the corpus (LSH/blocked candidates — never all pairs).
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
    * Each round's label table is checkpointed: iterative self-joins
    * OTHERWISE nest the previous round's plan inside the next round's join
    * (attribute-id collisions between `sym` and a labels frame DERIVED from
    * `sym` mis-bind the join condition, and plan size grows per round until
    * the optimizer itself OOMs — observed live, not hypothetical).
    * Truncating lineage keeps every round's plan the same constant shape:
    * one shuffle keyed on the edge endpoint + one label join. `ckpt` picks
    * where truncated state lives — [[graft.core.Checkpoints.Reliable]] for
    * a real cluster run (see Checkpoints' scaladoc). */
  def labels(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local)
      : DataFrame = {
    import graft.core.Checkpoints
    require(maxIters >= 1, "maxIters must be >= 1")
    val sym = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .unionByName(edges.select(col(dstCol).as("_u"), col(srcCol).as("_v")))
      .where(col("_u") =!= col("_v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = Checkpoints.cut(
        vertices.select(col(idCol).as("_id"), col(idCol).as("_lbl")), ckpt)
      var converged = false
      var i = 0
      while (!converged && i < maxIters) {
        // min label over each vertex's neighbors, then fold into own label
        val nbrMin = sym.join(labels, sym("_u") === labels("_id"))
          .groupBy(col("_v")).agg(min(col("_lbl")).as("_nbr"))
        val next = Checkpoints.cut(
          labels.join(nbrMin, labels("_id") === nbrMin("_v"), "left")
            .select(col("_id"), col("_lbl"),
              least(col("_lbl"), coalesce(col("_nbr"), col("_lbl"))).as("_new")),
          ckpt)
        val changed = next.where(col("_new") < col("_lbl")).count()
        labels = next.select(col("_id"), col("_new").as("_lbl"))
        converged = changed == 0L
        i += 1
      }
      require(converged,
        s"component labels did not converge in $maxIters rounds — " +
          "a duplicate chain is longer than maxIters; raise it")
      labels.select(col("_id").as(idCol), col("_lbl").as("cluster"))
    } finally { sym.unpersist(); () }
  }

  /** SemDeDup-style survivor marking: every vertex labeled with its
    * component's canonical (min) id plus `keep` = "this IS the canonical
    * one". Downstream keeps `keep` rows and drops the rest. */
  def keepCanonical(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local)
      : DataFrame =
    labels(vertices, idCol, edges, srcCol, dstCol, maxIters, ckpt)
      .withColumn("keep", col("cluster") === col(idCol))
}
