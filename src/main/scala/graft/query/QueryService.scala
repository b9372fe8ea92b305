package graft.query

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The interactive query layer — Spark-native rebuild of the reference's
  * DuckDB service (`/root/reference/src/database/duckdb_service.py`).
  *
  * All four operators compile to single declarative plans: filter → (agg) →
  * sort → limit, which Catalyst turns into pushed-filter parquet scans with
  * partial aggregation. No driver-side row loops anywhere; everything remains
  * an executor-side plan until the caller materializes.
  */
object QueryService {

  /** Result envelope with `query_time_ms`, mirroring the reference's
    * per-query timing (`duckdb_service.py:417-431`). Wall clock around the
    * materializing action — the number a dashboard actually experiences. */
  final case class TimedResult(rows: Seq[Row], queryTimeMs: Long)

  def timed(df: DataFrame): TimedResult = {
    val t0 = System.nanoTime()
    val rows = df.collect().toSeq
    TimedResult(rows, (System.nanoTime() - t0) / 1000000L)
  }

  /** Filtered aggregation (`duckdb_service.py:327-434`).
    * No-agg fallback = `SELECT * ... LIMIT 1000` like the reference. */
  def query(df: DataFrame, filters: Seq[Filter], spec: AggregationSpec): DataFrame = {
    val filtered = df.filter(Filter.compile(filters))
    if (spec.metrics.isEmpty) filtered.limit(spec.limit.getOrElse(1000))
    else {
      val aggCols = spec.metrics.map(_.toColumn)
      val grouped =
        if (spec.groupBy.isEmpty) filtered.agg(aggCols.head, aggCols.tail: _*)
        else filtered.groupBy(spec.groupBy.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
      // default order: first metric DESC (duckdb_service.py:384-393)
      val (alias, asc) = spec.orderBy.getOrElse((spec.metrics.head.alias, false))
      val ordered = grouped.orderBy(
        (if (asc) col(alias).asc else col(alias).desc) +:
          spec.groupBy.map(col(_).asc): _*) // deterministic tiebreak
      spec.limit.fold(ordered)(ordered.limit)
    }
  }

  /** Drill-down: raw records for dimension=value + filters, projection,
    * LIMIT/OFFSET pagination (`duckdb_service.py:436-505`). Requires a sort
    * key for deterministic pages — Spark has native offset (3.4+). */
  def drillDown(df: DataFrame, filters: Seq[Filter], columns: Seq[String],
      sortKey: String, limit: Int = 100, offset: Int = 0): DataFrame = {
    val base = df.filter(Filter.compile(filters))
    val projected = if (columns.isEmpty) base else base.select(columns.map(col): _*)
    projected.orderBy(col(sortKey)).offset(offset).limit(limit)
  }

  /** Distinct filter-values with optional ILIKE search
    * (`duckdb_service.py:507-562`). */
  def filterValues(df: DataFrame, column: String, search: Option[String] = None,
      limit: Int = 100): DataFrame = {
    val c = col(column)
    val base = df.select(c).where(c.isNotNull)
    val searched = search.fold(base)(s =>
      base.where(lower(c.cast(StringType)).contains(s.toLowerCase)))
    searched.distinct().orderBy(c).limit(limit)
  }

  /** Per-column profile (`duckdb_service.py:115-253`): numeric min/max/mean/
    * distinct count; returned as one row per column. A single aggregate pass
    * over the table — one job regardless of column count. */
  def profileNumeric(df: DataFrame, columns: Seq[String]): DataFrame = {
    import graft.core.Semantics.{exactAvg => eavg}
    val aggs = columns.flatMap { c =>
      Seq(min(col(c)).cast(DoubleType).as(s"${c}__min"),
          max(col(c)).cast(DoubleType).as(s"${c}__max"),
          eavg(col(c)).as(s"${c}__mean"),
          countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to (column, min, max, mean, n_distinct) — pure plan, no collect
    val spark = df.sparkSession
    val stacked = columns.map { c =>
      wide.select(lit(c).as("column_name"),
        col(s"${c}__min").as("min_value"), col(s"${c}__max").as("max_value"),
        col(s"${c}__mean").as("mean_value"),
        col(s"${c}__distinct").as("n_distinct"))
    }
    stacked.reduce(_ unionByName _)
  }
}
