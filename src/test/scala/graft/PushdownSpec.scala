package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Scan-efficiency hygiene: column pruning and predicate pushdown must
  * actually reach the parquet scans. At 100 TB a scan that reads all of
  * `documents` for a 2-column projection, or filters AFTER the scan, is
  * the whole job's cost — and both regressions are silent (the query
  * stays correct, only the I/O multiplies). These checks pin the
  * representative shapes mechanically so a refactor that breaks pruning
  * fails `sbt test` instead of a bench round.
  *
  * (The sibling suite-wide gate is PlanHygieneSpec; this one asserts
  * per-scan properties that need per-query knowledge of which columns are
  * REQUIRED, so it spot-checks representative gates rather than sweeping.)
  */
class PushdownSpec extends SparkSuite {

  /** Physical scans of `df`'s plan, with AQE off so the scan nodes are
    * directly visible rather than wrapped in AdaptiveSparkPlanExec. */
  private def scansOf(mk: => DataFrame): Seq[FileSourceScanExec] = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
    finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  private def readCols(f: FileSourceScanExec): Set[String] =
    f.requiredSchema.fieldNames.toSet

  test("q_next_event: the events scan prunes to the four referenced " +
      "columns — value/props never leave the parquet reader") {
    val df = SparkEntry.queries("q_next_event")(spark, sfDir)
    val scans = scansOf(df)
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(readCols(s).subsetOf(
        Set("event_id", "ts", "user_id", "event_type")),
        s"unpruned events scan: ${readCols(s)}")
    }
  }

  test("q_cdc_agg: every state-building scan reads only the key/value/id " +
      "columns, and the id predicate pushes into the scan") {
    val df = SparkEntry.queries("q_cdc_agg")(spark, sfDir)
    val scans = scansOf(df)
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(readCols(s).subsetOf(Set("event_id", "event_type", "value")),
        s"unpruned events scan: ${readCols(s)}")
      // the %-predicates are not parquet-pushable, but they MUST at least
      // be present as data filters at the scan (filter-before-shuffle)
      assert(s.dataFilters.nonEmpty, "no filter at the scan")
    }
  }

  test("filter gates: an equality predicate reaches the parquet reader " +
      "as a pushed filter") {
    val df = graft.core.Tables.table(spark, sfDir, "orders")
      .filter(graft.query.Filter.compile(
        Seq(graft.query.Filter.Eq("o_orderpriority", "1-URGENT"))))
      .select(col("o_orderkey"))
    val scans = scansOf(df)
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(s => s.contains("EqualTo") || s.contains("IsNotNull"))),
      "no pushed filters on the orders scan")
  }

  test("projection narrowness: a 2-column query over documents never " +
      "reads the text column") {
    val df = graft.core.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    scansOf(df).foreach { s =>
      assert(!readCols(s).contains("text"), s"text read: ${readCols(s)}")
    }
  }
}
