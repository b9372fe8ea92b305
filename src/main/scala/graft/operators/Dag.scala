package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** DAG scheduling primitives over a dependency edge list (src must run
  * before dst): Kahn-style topological LEVELING — level r = everything
  * runnable in wave r once its predecessors finished — plus honest cycle
  * reporting: vertices on (or downstream of) a dependency cycle can never
  * be scheduled and come back flagged instead of silently dropped or
  * looping forever. The batch face of the staged-pipeline orchestrator:
  * levels ARE the parallel execution waves.
  *
  * Scale shape: same peel loop as [[KCore]] — each round removes the
  * zero-in-degree frontier with one semi-join + one anti-join over the
  * SHRINKING live edge set, lineage cut per round
  * ([[graft.core.Checkpoints]]). Round count = DAG depth (the longest
  * dependency chain), not vertex count — the quantity that is small for
  * any real pipeline/derivation graph.
  */
object Dag {

  /** Returns (idCol, level, in_cycle): level = 0-based wave index;
    * unschedulable vertices (on or downstream of a cycle) get level = -1
    * and in_cycle = true. Fails loudly if the DAG is deeper than
    * `maxRounds`. Self-loops count as cycles; duplicate edges collapse. */
  def topoLevels(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 60,
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local)
      : DataFrame = {
    import graft.core.Checkpoints
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = vertices.sparkSession
    val dep = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var remaining = Checkpoints.cut(
        vertices.select(col(idCol).as("_id")).distinct(), ckpt)
      var nRemaining = remaining.count()
      var liveEdges = Checkpoints.cut(dep, ckpt)
      var levels: List[DataFrame] = Nil
      var r = 0
      var stuck = false
      while (nRemaining > 0 && !stuck) {
        require(r < maxRounds,
          s"DAG deeper than $maxRounds levels — raise maxRounds")
        // edges whose source already ran are satisfied; keep live ones
        liveEdges = Checkpoints.cut(
          liveEdges.join(remaining, liveEdges("_u") === remaining("_id"),
            "left_semi"), ckpt)
        val frontier = Checkpoints.cut(
          remaining.join(liveEdges, remaining("_id") === liveEdges("_v"),
            "left_anti"), ckpt)
        val nFrontier = frontier.count()
        if (nFrontier == 0) stuck = true // only cycles (and their wake) left
        else {
          levels = frontier.select(col("_id"), lit(r.toLong).as("level")) ::
            levels
          remaining = Checkpoints.cut(
            remaining.join(frontier, Seq("_id"), "left_anti"), ckpt)
          nRemaining -= nFrontier
          r += 1
        }
      }
      val leveled =
        if (levels.isEmpty)
          // build the empty frame from the vertices schema: a hardcoded
          // bigint _id would type-clash (ANSI cast error) against string
          // vertex ids when the graph is fully cyclic
          vertices.select(col(idCol).as("_id")).limit(0)
            .withColumn("level", lit(0L))
        else levels.reduce(_ unionByName _)
      vertices.select(col(idCol).as("_id")).distinct()
        .join(leveled, Seq("_id"), "left")
        .select(col("_id").as(idCol),
          coalesce(col("level"), lit(-1L)).as("level"),
          col("level").isNull.as("in_cycle"))
    } finally { dep.unpersist(); () }
  }
}
