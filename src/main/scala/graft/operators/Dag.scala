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
      ckpt: graft.core.Checkpoints.Mode = graft.core.Checkpoints.Local,
      driverCutoff: Long = 2000000L)
      : DataFrame = {
    import graft.core.Checkpoints
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = vertices.sparkSession
    val dep = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // SMALL-GRAPH FAST PATH (shared bounded-collect contract: see
      // [[SmallGraph]]): dependency graphs are depth-deep but usually
      // edge-small, and each distributed wave costs a semi-join + an
      // anti-join + two counts regardless of size. When the DISTRIBUTED
      // count says the edge list fits the driver, restrict it to edges
      // whose SOURCE is a real vertex (the wave loop drops those via its
      // remaining-semi-join; one distributed pass -- `vertices` is never
      // collected), collect through the harness (primitive remap, no
      // boxed-HashMap heap blow-up at the cutoff; BinaryType/mixed-type
      // ids fall through to the distributed loop), and run Kahn's
      // algorithm: wave(v) = 1 + max(wave(pred)), unscheduled endpoints =
      // on/downstream of a cycle. Endpoints ride back as a (id, level)
      // frame; vertices that never touch an edge match nothing and take
      // level 0 / in_cycle false via the final distributed join --
      // EXACTLY the wave the distributed loop schedules them in (no
      // incoming edges => frontier at round 0). Levels are exact
      // integers, so results are row-identical. Collect is bounded BY
      // CONSTRUCTION.
      if (dep.count() <= driverCutoff) {
        val vset = vertices.select(col(idCol).as("_id")).distinct()
        val restricted = dep
          .join(vset, col("_u") === vset("_id"), "left_semi")
        SmallGraph.collect(restricted, None) match {
          case Some(m) =>
            val n = m.n
            val (off, adj) = SmallGraph.csr(m.us, m.vs, n)
            val inDeg = new Array[Int](n)
            var i = 0
            while (i < m.vs.length) { inDeg(m.vs(i)) += 1; i += 1 }
            val level = new Array[Long](n)
            java.util.Arrays.fill(level, -1L)
            val queue = new SmallGraph.IntQueue(n)
            i = 0
            while (i < n) {
              if (inDeg(i) == 0) { level(i) = 0L; queue.add(i) }
              i += 1
            }
            var maxLevel = 0L
            while (!queue.isEmpty) {
              val u = queue.poll()
              var j = off(u)
              while (j < off(u + 1)) {
                val v = adj(j)
                if (level(v) < level(u) + 1) level(v) = level(u) + 1
                inDeg(v) -= 1
                if (inDeg(v) == 0) {
                  queue.add(v)
                  if (level(v) > maxLevel) maxLevel = level(v)
                }
                j += 1
              }
            }
            // vertices still carrying in-degree sit on (or downstream of)
            // a cycle -- same -1/in_cycle contract as the stuck
            // distributed loop
            i = 0
            while (i < n) { if (inDeg(i) > 0) level(i) = -1L; i += 1 }
            require(maxLevel < maxRounds,
              s"DAG deeper than $maxRounds levels -- raise maxRounds")
            val out = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.spark.sql.Row]
            i = 0
            while (i < n) {
              out += org.apache.spark.sql.Row(m.idValue(i), level(i))
              i += 1
            }
            val schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("_id",
                dep.schema.head.dataType),
              org.apache.spark.sql.types.StructField("level",
                org.apache.spark.sql.types.LongType)))
            val leveledDf = SmallGraph.rideBack(spark, out.toSeq, schema)
            return vertices.select(col(idCol).as("_id")).distinct()
              .join(leveledDf, Seq("_id"), "left")
              .select(col("_id").as(idCol),
                coalesce(col("level"), lit(0L)).as("level"),
                (coalesce(col("level"), lit(0L)) === lit(-1L)).as("in_cycle"))
          case None => () // unsafe id types: distributed loop below
        }
      }
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
