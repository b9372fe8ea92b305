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
}
