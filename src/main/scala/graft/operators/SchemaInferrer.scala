package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Semantics.isMissing

/** ML-schema inference (`/root/reference/src/transformers/analyzers/
  * schema_inferrer.py`): per-field type histograms, null counts, numeric
  * min/max, low-cardinality enum candidates (≤10 distinct), and regex
  * pattern detection over 9 classes with confidence = dominant-type share;
  * a pattern is accepted only above confidence 0.8
  * (`schema_inferrer.py:27-37,229-233,255-334`).
  *
  * Implemented as ONE aggregate pass over the table: every statistic is a
  * conditional aggregate, so field count only widens the projection — the
  * scan happens once. Output: one row per profiled field.
  */
object SchemaInferrer {
  /** The reference's 9 pattern classes (`schema_inferrer.py:27-37`), same
    * regexes. Order matters: first match above threshold wins. */
  val patterns: Seq[(String, String)] = Seq(
    "email"        -> "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$",
    "url"          -> "^https?://[^\\s]+$",
    "ipv4"         -> "^(\\d{1,3}\\.){3}\\d{1,3}$",
    "phone_us"     -> "^\\+?1?[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}$",
    "date_iso"     -> "^\\d{4}-\\d{2}-\\d{2}$",
    "datetime_iso" -> "^\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}",
    "uuid"         -> "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "credit_card"  -> "^\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}$",
    "ssn"          -> "^\\d{3}-\\d{2}-\\d{4}$")

  val numericRe = "^\\s*[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?\\s*$"
  val intRe = "^\\s*[+-]?\\d+\\s*$"
  val boolRe = "(?i)^(true|false)$"

  /** Profile `fields` of `df` in one aggregate job: per field — total rows,
    * null count, type-share counts (int/float/bool/date/datetime/string),
    * inferred type + confidence (dominant share, mixed int+float → FLOAT,
    * `schema_inferrer.py:288-291`), numeric min/max, distinct count, best
    * matching pattern with its match rate. */
  def profile(df: DataFrame, fields: Seq[String],
      confidenceThreshold: Double = 0.8,
      enumMaxDistinct: Int = 10): DataFrame = {
    val aggs: Seq[Column] = fields.flatMap { f =>
      val s = col(f).cast(StringType)
      val present = !isMissing(col(f))
      def rate(cond: Column) = sum(when(present && cond, 1L).otherwise(0L))
      Seq(
        count(lit(1)).as(s"${f}__total"),
        sum(when(isMissing(col(f)), 1L).otherwise(0L)).as(s"${f}__nulls"),
        rate(s.rlike(intRe)).as(s"${f}__int"),
        rate(s.rlike(numericRe) && !s.rlike(intRe)).as(s"${f}__float"),
        rate(s.rlike(boolRe)).as(s"${f}__bool"),
        rate(s.rlike(patterns.toMap.apply("date_iso"))).as(s"${f}__date"),
        rate(s.rlike(patterns.toMap.apply("datetime_iso"))).as(s"${f}__datetime"),
        min(graft.core.Semantics.asNumeric(col(f))).as(s"${f}__min"),
        max(graft.core.Semantics.asNumeric(col(f))).as(s"${f}__max")) ++
      patterns.map { case (pname, re) =>
        rate(s.rlike(re)).as(s"${f}__pat_$pname")
      }
    }
    // ONE stats job + ONE stacked distinct job, then the per-field
    // projections run over a LOCAL 1-row relation. Two traps, both
    // measured on this operator:
    //  - unioning per-field selects of a live aggregate frame re-plans —
    //    and re-RUNS — the aggregate per union branch (column pruning per
    //    branch made each copy one-field-sized, hiding the N× cost);
    //  - putting N countDistincts INSIDE the stats aggregate rides
    //    Catalyst's Expand — every row fans N+1 ways (the q_profile_table
    //    lesson; a first single-aggregate rewrite here measured 5.2 →
    //    14.5 s at sf1 from exactly that). Distinct counts instead take
    //    the stacked (field, value) two-phase pass: map-side collapse,
    //    shuffle carries the distinct mass only, no Expand.
    // The profiled columns are projected first and the scan rebalanced
    // (regex matching per row is compute-dense; Rebalance doc), persisted
    // because the two jobs are separate actions.
    val spark = df.sparkSession
    val src = graft.core.Rebalance.computeDense(
      df.select(fields.distinct.map(col): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (row, aggedSchema, ndByField) = try {
      val agged = src.agg(aggs.head, aggs.tail: _*)
      // distinct s (stringified, non-missing) per field — exactly the
      // former countDistinct(when(present, s)) value: when() yields null
      // for missing rows and the pair pass drops null values
      val pairs = fields.distinct.map { f =>
        val s = col(f).cast(StringType)
        struct(lit(f).as("field"),
          when(!isMissing(col(f)), s).as("v"))
      }
      val nd = src.select(explode(array(pairs: _*)).as("p"))
        .select(col("p.field").as("field"), col("p.v").as("v"))
        .where(col("v").isNotNull)
        .groupBy(col("field"), col("v")).agg(count(lit(1)).as("_n"))
        .groupBy(col("field")).agg(count(lit(1)).as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (agged.head(), agged.schema, nd)
    } finally { src.unpersist(); () }
    // the 1-row stats result as a LOCAL relation (+ the distinct counts as
    // literal columns under the names the projections below expect) — the
    // per-field union branches now cost nothing to re-reference
    val wide = fields.distinct.foldLeft(
      spark.createDataFrame(
        java.util.Collections.singletonList(row), aggedSchema)) {
      (acc, f) =>
        acc.withColumn(s"${f}__distinct", lit(ndByField.getOrElse(f, 0L)))
    }

    val rows = fields.map { f =>
      val present = (col(s"${f}__total") - col(s"${f}__nulls")).cast(DoubleType)
      def share(t: String): Column =
        when(present > 0, col(s"${f}__$t").cast(DoubleType) / present).otherwise(0.0)
      val intS = share("int"); val floatS = share("float"); val boolS = share("bool")
      val dateS = share("date"); val dtS = share("datetime")
      val numS = intS + floatS
      // dominant type; mixed int+float promotes to FLOAT
      val inferred =
        when(present === 0, lit("STRING"))
          .when(boolS >= lit(confidenceThreshold), "BOOLEAN")
          .when(intS >= lit(confidenceThreshold), "INTEGER")
          .when(numS >= lit(confidenceThreshold) && floatS > 0, "FLOAT")
          .when(dateS >= lit(confidenceThreshold), "DATE")
          .when(dtS >= lit(confidenceThreshold), "DATETIME")
          .otherwise("STRING")
      // unrounded dominant share — callers choose their own presentation
      // rounding (cross-engine ROUND(double) is not deterministic; see
      // Semantics.safeRound)
      val confidence =
        greatest(boolS, intS, numS, dateS, dtS,
          lit(1.0) - greatest(boolS, numS, dateS, dtS))
      // first pattern whose match rate exceeds threshold
      val patternName = patterns.foldRight(lit(null).cast(StringType): Column) {
        case ((pname, _), acc) =>
          when(present > 0 &&
            col(s"${f}__pat_$pname").cast(DoubleType) / present >= confidenceThreshold,
            lit(pname)).otherwise(acc)
      }
      wide.select(
        lit(f).as("field"),
        col(s"${f}__total").as("total_count"),
        col(s"${f}__nulls").as("null_count"),
        inferred.as("inferred_type"),
        confidence.as("confidence"),
        col(s"${f}__min").as("min_value"),
        col(s"${f}__max").as("max_value"),
        col(s"${f}__distinct").as("distinct_count"),
        (col(s"${f}__distinct") <= enumMaxDistinct).as("is_enum_candidate"),
        patternName.as("detected_pattern"))
    }
    rows.reduce(_ unionByName _)
  }
}
