package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Suite-wide plan-hygiene gate over EVERY gated query.
  *
  * Three silent scale-killers get loud here:
  *   - `CartesianProductExec` anywhere in a gated query's plan (a
  *     broadcast nested loop over a 1-row stats frame is fine; a true
  *     cartesian shuffle join is never fine);
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
    "q_rrf" -> "rank over TakeOrdered top-K frame (bounded rows)"
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
