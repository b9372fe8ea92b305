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

  /** DuckDB spelling of TextFunctions.tokenCount over column `c`
    * (whitespace-run count + 1 on collapsed text) — ONE definition so
    * every gate that replays the token kernel agrees. */
  def tokenCountSql(c: String = "text"): String =
    s"""CASE WHEN length(trim(regexp_replace($c, '\\s+', ' ', 'g'))) = 0 THEN 0
       |     ELSE length(trim(regexp_replace($c, '\\s+', ' ', 'g')))
       |        - length(replace(trim(regexp_replace($c, '\\s+', ' ', 'g')), ' ', ''))
       |        + 1 END""".stripMargin.replace("\n", " ")

  /** Scale-factor tag for oracle aux-file paths: aux parquet written by the
    * gates is keyed by the DATA DIRECTORY so a later run at another scale
    * factor (the bench at sf0.1 after a verify at sf0.01) can never
    * overwrite the files the pending oracle compare will read. Oracle SQL
    * uses the `{SF}` placeholder; `Verify` substitutes the actual tag when
    * dumping `oracle_sql.json`. */
  def sfTag(dir: String): String =
    java.nio.file.Paths.get(dir).getFileName.toString

  val SfPlaceholder = "{SF}"
}
