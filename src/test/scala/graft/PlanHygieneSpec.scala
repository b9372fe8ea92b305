package graft

import org.apache.spark.sql.execution.joins.{
  BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Suite-wide plan-hygiene gate over EVERY gated query.
  *
  * Four silent scale-killers get loud here:
  *   - `CartesianProductExec` anywhere in a gated query's plan (a
  *     broadcast nested loop over a 1-row stats frame is fine; a true
  *     cartesian shuffle join is never fine);
  *   - a `BroadcastNestedLoopJoinExec` whose build side is not provably
  *     bounded (logical `maxRows` ≤ 128) — a BNLJ over a 1-row stats
  *     frame or an explicit small limit is O(n); over anything
  *     data-sized it is O(n·m) and a 100 TB killer;
  *   - an unpartitioned `WindowExec` — "Moving all data to a single
  *     partition" — except where the window provably runs over a
  *     pre-aggregated slice-sized frame (explicit allowlist below);
  *   - a codegen compile failure: every query EXECUTES end-to-end with
  *     `spark.sql.codegen.fallback=false`, so a Janino `CompileException`
  *     that production Spark would swallow (one WARN, interpreted fallback,
  *     whole-stage codegen lost — the round-2 BpeApply bug) fails the suite.
  *
  * The WARN capture (not just plan inspection) matters because several
  * gates run eager sub-jobs while the query body is CONSTRUCTED
  * (localCheckpoint rounds in component propagation / BPE, bounded
  * driver-sample fits): their plans never appear under the returned frame's
  * `executedPlan`, but their warnings do hit the log.
  */
class PlanHygieneSpec extends SparkSuite {

  /** Queries allowed a BroadcastNestedLoopJoin whose build side is NOT
    * provably bounded by `maxRows` (see the mechanical bound check in the
    * sweep). Every entry needs a justification. Empty = every BNLJ in the
    * suite broadcasts a provably tiny frame. */
  private val allowedBnlj: Map[String, String] = Map.empty

  /** Static row bound of a physical subtree: a groupless (final)
    * aggregate is 1 row, an explicit limit is its limit, a local relation
    * is its size; pass-through nodes inherit their child's bound;
    * row-expanding nodes (Generate) over a 1-row frame count as one
    * schema-sized expansion (pair frames from a 1-row stats row).
    * `None` = cannot prove a bound. */
  private def boundOf(
      p: org.apache.spark.sql.execution.SparkPlan): Option[Long] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    p match {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => Some(1L)
      // ReusedExchangeExec is a LEAF — the original exchange it mirrors is
      // a constructor field, not a child, so walk into it explicitly
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        boundOf(r.child)
      case l: GlobalLimitExec => Some(l.limit.toLong)
      case c: CollectLimitExec => Some(c.limit.toLong)
      case l: LocalTableScanExec => Some(l.rows.size.toLong)
      case r: RangeExec => Some(r.numElements.toLong)
      case g: GenerateExec =>
        // explode over a PROVABLY-1-row frame expands to at most the
        // generator's static arity — treat as one bounded expansion
        boundOf(g.child).filter(_ == 1L).map(_ => 64L)
      case u: UnionExec =>
        val bs = u.children.map(boundOf)
        if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        for (a <- boundOf(j.left); b <- boundOf(j.right)) yield a * b
      case p if p.children.length == 1 => boundOf(p.children.head)
      case _ => None
    }
  }

  /** A BNLJ is tolerable only when its broadcast side is provably tiny —
    * a groupless aggregate (1 row) or an explicit small limit. Anything
    * unbounded (or unknown) counts as a violation. */
  private def unboundedBnlj(
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    plan.collect { case j: BroadcastNestedLoopJoinExec =>
      val buildPlan = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }
      (j, boundOf(buildPlan))
    }.collect {
      // ≤1024 broadcast rows keeps the per-probe-row loop cache-resident;
      // the suite's real builds are 1-row stats frames, ≤16-bucket /
      // ≤10-bin prefix frames, and one 300-vector brute-force slice
      case (j, bound) if bound.forall(_ > 1024L) =>
        s"BroadcastNestedLoopJoin with build-side bound=" +
          s"${bound.map(_.toString).getOrElse("unbounded")} " +
          s"(condition=${j.condition})"
    }

  /** Queries whose global window is over an already-aggregated frame whose
    * row count is bounded by slice/group cardinality, not corpus size.
    * Every entry needs a justification. */
  private val allowedGlobalWindow: Map[String, String] = Map(
    // corpusCard: token-share total over the per-slice aggregate — one
    // row per (lang, source) slice; the global window trades a second
    // corpus scan (crossJoin-with-agg form) for a slice-count partition
    "q_corpus_card" -> "global sum over per-slice aggregate (bounded rows)",
    // labelIndex: rank over the category dictionary — one row per distinct
    // category, bounded by label cardinality, never corpus size
    "q_label_index" -> "rank over category dictionary (bounded rows)",
    // boundedRank: row_number over the ≤ topK survivors of a preceding
    // TakeOrdered limit — bounded by construction, not corpus size
    "q_rrf" -> "rank over TakeOrdered top-K frame (bounded rows)",
    // cumulative-users curve: running sum over the PER-DAY aggregate —
    // one row per calendar day, bounded by date span, never corpus size
    "q_distinct_growth" -> "cumsum over per-day aggregate (bounded rows)",
    // rank assignment over the two ≤10-row TakeOrdered frames feeding the
    // retrieval-metrics aggregate — bounded by construction, as q_rrf
    "q_rank_eval" -> "rank over TakeOrdered top-K frames (bounded rows)"
  )

  private final class WarnBuffer
      extends org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-hygiene-capture", null,
        org.apache.logging.log4j.core.layout.PatternLayout
          .createDefaultLayout(),
        false, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
    val hits = new scala.collection.mutable.ArrayBuffer[String]()
    override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
      val m = e.getMessage.getFormattedMessage
      if (m.contains("No Partition Defined") ||
          m.contains("CompileException") ||
          m.contains("Whole-stage codegen disabled") ||
          m.contains("falling back to interpreter"))
        hits.synchronized { hits += m; () }
    }
  }

  test("every gated query: no cartesian product, no unpartitioned window, codegen compiles") {
    // force Spark (and its log4j2 default config) to initialize BEFORE
    // touching the log4j context — getContext on a pristine JVM installs
    // the default-deny config and Spark then skips its own, leaving the
    // root logger at ERROR where WARN events never reach any appender
    spark.sparkContext
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    val oldLevel = root.getLevel
    val buf = new WarnBuffer
    buf.start()
    root.addAppender(buf, org.apache.logging.log4j.Level.WARN, null)
    // WARN events must pass the LOGGER-level filter to reach appenders
    root.setLevel(org.apache.logging.log4j.Level.WARN)
    ctx.updateLoggers()

    // canary: prove the capture is wired — an unpartitioned window on a
    // plain frame MUST produce the warning, or this whole gate is vacuous
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.range(100).toDF("id")
        .withColumn("s", sum(col("id")).over(
          Window.partitionBy(Seq.empty[org.apache.spark.sql.Column]: _*)))
        .write.format("noop").mode("overwrite").save()
      assert(buf.hits.synchronized {
        buf.hits.exists(_.contains("No Partition Defined")) },
        "warning capture is not wired — the hygiene gate would be vacuous")
    }

    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val problems = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          buf.hits.synchronized { buf.hits.clear() }
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.executedPlan
          val cartesian = plan.collect { case c: CartesianProductExec => c }
          val globalWin =
            plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
          // full execution: with fallback=false a codegen compile failure
          // anywhere in the query (including eager sub-jobs above) throws
          df.write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          val warned = buf.hits.synchronized { buf.hits.toList }
          val winWarn = warned.filter(_.contains("No Partition Defined"))
          val cgWarn = warned.filterNot(_.contains("No Partition Defined"))
          (if (cartesian.nonEmpty)
            Seq(s"$name: CartesianProductExec in plan") else Nil) ++
          (if (!allowedBnlj.contains(name))
            unboundedBnlj(plan).map(v => s"$name: $v") else Nil) ++
          (if ((globalWin.nonEmpty || winWarn.nonEmpty) &&
              !allowedGlobalWindow.contains(name))
            Seq(s"$name: unpartitioned WindowExec (plan=${globalWin.size}, " +
              s"warns=${winWarn.size})") else Nil) ++
          cgWarn.map(w => s"$name: codegen warning: $w")
      }
      assert(problems.isEmpty,
        s"plan hygiene violations:\n${problems.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.codegen.fallback", "true")
      root.removeAppender("graft-hygiene-capture")
      root.setLevel(oldLevel)
      ctx.updateLoggers()
      buf.stop()
    }
  }
}
