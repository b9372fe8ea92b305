package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised training-example generation from event logs: turn each
  * user's ordered event stream into (context, target) rows for
  * next-event-prediction — the sequence-model sibling of the text
  * pipeline's packed blocks.
  *
  * Everything is ONE key-partitioned window pass: the context is a
  * bounded trailing frame (`contextLen PRECEDING .. 1 PRECEDING`), so
  * state per row is O(contextLen) and the whole operator is a single
  * shuffle on the user key — no self-join, no per-user collect. Ordering
  * within a user is (ts, idCol) so timestamp ties cannot make output
  * nondeterministic across partitionings or engines.
  */
object TrainingExamples {

  /** Per event: the previous `contextLen` event types of the same user as
    * a '|'-joined string (shorter at stream starts), its length, and the
    * event's own type as the prediction target. Rows with an empty
    * context (each user's first event) are dropped — no signal. */
  def nextEventPairs(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, contextLen: Int): DataFrame = {
    require(contextLen >= 1, "contextLen must be >= 1")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-contextLen, -1)
    events.select(col(idCol), col(userCol), col(tsCol), col(typeCol))
      .withColumn("_ctx", collect_list(col(typeCol)).over(w))
      .filter(size(col("_ctx")) > 0)
      .select(col(idCol), col(userCol),
        array_join(col("_ctx"), "|").as("context"),
        size(col("_ctx")).cast("long").as("context_len"),
        col(typeCol).as("target"))
  }

  /** Temporal train/test split with an EMBARGO gap — the backtest split
    * that random hash splits silently break: events in
    * `[cutTs − gapHours, cutTs)` belong to neither side, so a model whose
    * features look back ≤ gap hours can never see test-adjacent data at
    * train time. Tags each row train / embargo / test (one codegen'd
    * comparison, no shuffle). */
  def temporalSplit(df: DataFrame, tsCol: String, cutTs: String,
      gapHours: Int): DataFrame = {
    require(gapHours >= 0, "gapHours must be >= 0")
    val cut = lit(cutTs).cast(org.apache.spark.sql.types.TimestampType)
    val gapStart = cut - expr(s"INTERVAL $gapHours HOURS")
    df.withColumn("split",
      when(col(tsCol) < gapStart, "train")
        .when(col(tsCol) < cut, "embargo")
        .otherwise(lit("test")))
  }

  /** Top event paths: the k most frequent length-`depth` event-type
    * sequences over per-user ordered streams — the flow/Sankey analytics
    * behind "what do users do next". One key-partitioned window pass
    * builds each row's trailing path (depth−1 lags), then a count
    * aggregate and a bounded top-k under the (count desc, path asc)
    * total order. Rows without a full-depth history are skipped (honest
    * starts, no padded pseudo-paths). */
  def eventPaths(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, depth: Int = 3,
      topK: Int = 20): DataFrame = {
    require(depth >= 2, "depth must be >= 2")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val lags = (depth - 1 to 1 by -1)
      .map(k => lag(col(typeCol), k).over(w)) :+ col(typeCol)
    events
      .select(concat_ws(">", lags: _*).as("_path"),
        // EVERY lag must be non-null, not just the oldest: concat_ws
        // silently skips nulls, so a null type mid-window would emit a
        // shortened 'a>c' path — and diverge from SQL `||`, which
        // null-propagates. Null-typed events yield no path at all.
        lags.map(_.isNotNull).reduce(_ && _).as("_full"))
      .filter(col("_full")) // all lags present = full depth, no nulls
      .groupBy(col("_path").as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topK)
  }

  /** Rolling-origin backtest folds — the expanding-window evaluation
    * scheme for anything time-dependent: fold i trains on everything
    * before `start + i·step − gap` and tests on the `horizon` hours from
    * `start + i·step`. All boundaries must be whole hours, so the per-
    * HOUR aggregate (≤ a few thousand rows for any span) carries exact
    * counts and the fold explosion happens on THAT frame — fold count
    * never amplifies the corpus. Returns one row per fold: the cut and
    * exact train/test row counts. */
  def rollingOriginFolds(df: DataFrame, tsCol: String, startCut: String,
      stepHours: Int, horizonHours: Int, gapHours: Int,
      nFolds: Int): DataFrame = {
    require(nFolds >= 1 && stepHours > 0 && horizonHours > 0 &&
      gapHours >= 0, "need nFolds>=1, step>0, horizon>0, gap>=0")
    val hourly = df
      .groupBy(date_trunc("hour", col(tsCol)).as("_h"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_cut0",
        lit(startCut).cast(org.apache.spark.sql.types.TimestampType))
    hourly
      .withColumn("fold", explode(sequence(lit(0), lit(nFolds - 1))))
      .withColumn("_cut",
        expr(s"timestampadd(HOUR, fold * $stepHours, _cut0)"))
      .groupBy(col("fold"),
        date_format(col("_cut"), "yyyy-MM-dd HH:mm:ss").as("cut"))
      .agg(
        sum(when(col("_h") <
          expr(s"timestampadd(HOUR, -$gapHours, _cut)"), col("_n"))
          .otherwise(0L)).as("n_train"),
        sum(when(col("_h") >= col("_cut") &&
          col("_h") < expr(s"timestampadd(HOUR, $horizonHours, _cut)"),
          col("_n")).otherwise(0L)).as("n_test"))
      .orderBy(col("fold"))
  }

  /** The split's leakage audit: per-side row/user counts plus the number
    * of users appearing on BOTH sides of the cut — entity overlap is the
    * leak a temporal split does NOT remove (user-level memorization), so
    * the report states it instead of letting it pass silently. One
    * grouped pass over (user, flags). */
  def temporalSplitReport(df: DataFrame, tsCol: String, userCol: String,
      cutTs: String, gapHours: Int): DataFrame = {
    val tagged = temporalSplit(df, tsCol, cutTs, gapHours)
    val perUser = tagged.groupBy(col(userCol))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L))
          .as("_tr"),
        sum(when(col("split") === "embargo", 1L).otherwise(0L))
          .as("_em"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("_te"))
    perUser.agg(
      sum(col("_tr")).cast("long").as("n_train"),
      sum(col("_em")).cast("long").as("n_embargo"),
      sum(col("_te")).cast("long").as("n_test"),
      sum(when(col("_tr") > 0, 1L).otherwise(0L)).as("n_train_users"),
      sum(when(col("_te") > 0, 1L).otherwise(0L)).as("n_test_users"),
      sum(when(col("_tr") > 0 && col("_te") > 0, 1L).otherwise(0L))
        .as("n_leaky_users"))
  }
}
