package graft.entry

/** Shared SQL fragments for the DuckDB oracle, mirroring
  * `graft.core.Semantics` exactly.
  *
  * Determinism contract (SURVEY §7.4.3): every floating aggregate is an
  * exact decimal accumulation (order-independent in both engines) cast to
  * double and rounded to a fixed scale, so Spark's partial-aggregation order
  * and DuckDB's scan order cannot produce different hashes. Dates and
  * timestamps are projected as strings/epoch integers to dodge dtype
  * normalization differences between parquet readers.
  */
object Sql {
  /** ROUND(CAST(SUM(DECIMAL) AS DOUBLE), 4) — matches Semantics.exactSum. */
  def esum(c: String): String =
    s"ROUND(CAST(SUM(CAST($c AS DECIMAL(38,10))) AS DOUBLE), 4)"

  /** FLOOR-based half-up rounding in pure double arithmetic — matches
    * Semantics.safeRound (ROUND(double) differs across engines at
    * half-boundaries; FLOOR of identical doubles never does). */
  def sround(e: String, scale: Int = 4): String =
    s"FLOOR(($e) * 1e$scale + 0.5) / 1e$scale"

  /** exact decimal sum / non-null count — matches Semantics.exactAvg. */
  def eavg(c: String): String =
    sround(s"CAST(SUM(CAST($c AS DECIMAL(38,10))) AS DOUBLE) / COUNT($c)")
}
