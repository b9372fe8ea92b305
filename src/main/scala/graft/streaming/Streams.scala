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

  final case class OpenSession(start: Long, last: Long, nEvents: Long, total: Double)
  final case class SessionWindowOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total: Double)

  /** Event-time gap sessionization via flatMapGroupsWithState: sessions close
    * when `gapMs` passes with no event (in event time). Closed-by-gap sessions
    * are emitted as soon as the closing event arrives; the trailing open
    * session per key is held in state and flushed by the event-time timeout
    * once the watermark passes `last + gap` — the state held per key is one
    * small tuple regardless of stream length, the canonical bounded-state
    * shape (RocksDB state store on a real cluster).
    *
    * Batch twin: `session_window(ts, gap)` — q_sessions gates those semantics
    * against the DuckDB lag/cumsum construction; StreamingSessionSpec asserts
    * this operator agrees with the batch twin on the closed sessions. */
  def sessionizeEventTime(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000,
      watermark: String = "2 hours")(
      implicit spark: SparkSession): Dataset[SessionWindowOut] = {
    import spark.implicits._
    def out(userId: Long, s: OpenSession) = SessionWindowOut(userId,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last + gapMs),
      s.nEvents, s.total)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionWindowOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evts: Iterator[Event], state: GroupState[OpenSession]) =>
          if (evts.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(out(userId, s))
          } else {
            // micro-batches are unordered within the batch: sort, then fold
            val sorted = evts.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Vector.newBuilder[SessionWindowOut]
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case Some(s) if t - s.last < gapMs =>
                  Some(OpenSession(s.start, math.max(s.last, t),
                    s.nEvents + 1, s.total + e.value))
                case Some(s) =>
                  closed += out(userId, s)
                  Some(OpenSession(t, t, 1L, e.value))
                case None => Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup — the streaming face of the engine's flagship
    * operator (operators/Dedup.ExactDedup is the batch face). State is
    * BOUNDED: `dropDuplicatesWithinWatermark` evicts seen-keys once the
    * watermark passes them, so 100 TB/day of events needs state for one
    * watermark window, not for history. Dedup key defaults to the same
    * md5-of-sorted-fields content hash the batch operator uses. */
  final case class Change(id: Long, ts: java.sql.Timestamp, op: String,
      value: Double)
  final case class LatestState(tsMs: Long, op: String, value: Double)
  final case class CurrentRow(id: Long, value: Double, alive: Boolean,
      ts_ms: Long)

  /** Streaming CDC materialization: an upsert/delete change stream folded
    * into per-key CURRENT state — the live twin of the batch
    * `SnapshotDiff.applyChanges` (q_cdc_apply). State per key is one small
    * (ts, op, value) tuple regardless of stream length; each incoming
    * micro-batch emits the key's new current row (update-mode sink keeps
    * the latest). Later timestamps win; equal timestamps resolve by
    * liveness (delete < insert/update ⇒ an upsert beats a delete), then
    * by value — a TOTAL order, so replays, reorderings, and any batch
    * slicing converge to the same state. The order is deliberately
    * expressed over (ts, alive, value) — the fields the emitted
    * `CurrentRow` carries — so a downstream consumer of the update stream
    * can reconstruct the converged state with a plain
    * max_by(struct(ts_ms, alive, value)) even when a key's rows span many
    * micro-batches. */
  def cdcLatestState(changes: Dataset[Change])(
      implicit spark: SparkSession): Dataset[CurrentRow] = {
    import spark.implicits._
    changes.groupByKey(_.id)
      .mapGroupsWithState[LatestState, CurrentRow](
        GroupStateTimeout.NoTimeout) {
        (id: Long, it: Iterator[Change], state: GroupState[LatestState]) =>
          val candidates = state.getOption.iterator ++
            it.map(c => LatestState(c.ts.getTime, c.op, c.value))
          val winner =
            candidates.maxBy(l => (l.tsMs, l.op != "delete", l.value))
          state.update(winner)
          CurrentRow(id, winner.value, winner.op != "delete", winner.tsMs)
      }
  }

  def dedupStream(events: DataFrame, eventTimeCol: String, watermark: String,
      matchFields: Seq[String] = Nil): DataFrame = {
    val keyed = events.withColumn("_dedup_key",
      graft.operators.ExactDedup.matchKey(events,
        if (matchFields.nonEmpty) matchFields
        else events.columns.toSeq.filterNot(_ == eventTimeCol)))
    keyed.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("_dedup_key")
      .drop("_dedup_key")
  }

  /** Streaming NEAR-duplicate dedup: the MinHash signature kernel is a pure
    * projection, so it runs unchanged on a stream; near-identical texts
    * (shingle jaccard ≈ 1) collide on the signature and
    * `dropDuplicatesWithinWatermark` keeps one per signature within the
    * watermark horizon — bounded state, the streaming face of
    * `MinHashDedup`. Looser matching = dedup on a signature PREFIX: pass
    * `keyHashes` < `numHashes` (fewer hashes agreeing ⇒ lower jaccard
    * needed to collide). */
  def nearDupStream(docs: DataFrame, eventTimeCol: String, watermark: String,
      textCol: String, k: Int = 3, numHashes: Int = 64,
      keyHashes: Int = 64): DataFrame = {
    require(keyHashes >= 1 && keyHashes <= numHashes,
      s"keyHashes must be in [1, numHashes]: $keyHashes / $numHashes")
    val sig = graft.functions.MinHashSig.minhash_sig(col(textCol), k, numHashes)
    val key = (if (keyHashes == numHashes) sig else slice(sig, 1, keyHashes))
      .cast(org.apache.spark.sql.types.StringType)
    docs.withColumn("_neardup_sig", key)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("_neardup_sig")
      .drop("_neardup_sig")
  }

  /** Stream-stream interval join: each left event matched to right events
    * with the same keys whose event time falls within
    * `[leftTs - before, leftTs + after]` — the canonical streaming
    * enrichment (impressions ⋈ clicks within N minutes), and the streaming
    * twin of `operators/RangeJoin`. BOTH sides carry watermarks and the
    * condition bounds the time range in BOTH directions — exactly what
    * Structured Streaming requires to evict buffered rows, so per-key state
    * stays one watermark window deep regardless of stream length. Right
    * columns are suffixed `_r` so self-joins on one schema stay referable. */
  /** Streaming corpus-quality monitor — the streaming face of
    * `CorpusStats.corpusCard`: per (window × source) document counts, token
    * totals, and mean quality score over an incoming document stream. All
    * signal computation is per-row projection (the batch kernels), so the
    * only state is the watermark-bounded windowed aggregate — the live
    * ingest dashboard for a training-data pipeline ("is source X suddenly
    * sending short/garbage docs?"). */
  def qualityMonitor(docs: DataFrame, eventTimeCol: String,
      textCol: String, sourceCol: String, window_ : String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    docs
      .withColumn("_n_tokens", TF.tokenCount(col(textCol)).cast("long"))
      .withColumn("_quality", TF.qualityScore(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), window_).as("w"), col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_n_tokens")).as("n_tokens"),
        avg(col("_quality")).as("mean_quality"))
      .select(col("w.start").as("window_start"), col(sourceCol),
        col("n_docs"), col("n_tokens"), col("mean_quality"))
  }

  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, watermark: String,
      before: String = "10 minutes",
      after: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, c + "_r")
    }
    val r = r0.withWatermark(rightTs + "_r", watermark)
    val cond = keys.map(k => l(k) === r(k + "_r")).reduce(_ && _) &&
      r(rightTs + "_r") >= l(leftTs) - expr(s"INTERVAL $before") &&
      r(rightTs + "_r") <= l(leftTs) + expr(s"INTERVAL $after")
    l.join(r, cond, "inner")
  }

  /** LEFT OUTER stream-stream interval join: same time-bounded condition,
    * but a left row with no partner inside its interval still EMITS (right
    * columns null) — once the watermark proves no future partner can
    * arrive (wm past the row's upper bound), which is when its state
    * evicts. This is the watermark contract doing double duty: the same
    * bound that caps state size also makes "no match" a provable fact
    * rather than a timeout guess. Left rows younger than bound+delay stay
    * pending at stream end — never emitted as unmatched, by design. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String, watermark: String,
      before: String = "10 minutes",
      after: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, c + "_r")
    }
    val r = r0.withWatermark(rightTs + "_r", watermark)
    val cond = keys.map(k => l(k) === r(k + "_r")).reduce(_ && _) &&
      r(rightTs + "_r") >= l(leftTs) - expr(s"INTERVAL $before") &&
      r(rightTs + "_r") <= l(leftTs) + expr(s"INTERVAL $after")
    l.join(r, cond, "left_outer")
  }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily lowered,
    * restoring the previous value afterwards. A streaming query snapshots
    * this conf at `.start()` as its STATE-STORE instance count, and each
    * instance pays per-batch bookkeeping regardless of data volume — for
    * a bounded staged replay (the batch twins) that fixed cost dominates:
    * measured 6.8 s → 2.7 s on the interval-join twin going 32 → 8. On a
    * real cluster, size state partitions to the stream's key cardinality
    * and executor count instead — this helper is for small bounded runs,
    * not a production default. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try body finally prev.foreach(spark.conf.set(key, _))
  }

  /** Run `body` (stream starts inside it) with the RocksDB state store
    * provider. The default HDFS-backed provider keeps every key's state
    * ON-HEAP per executor — at 100-TB key cardinalities (billions of
    * dedup keys, session windows, join rows inside the watermark) that is
    * an OOM, not a tuning problem. RocksDB spills state to local SSD with
    * an off-heap block cache, bounding executor heap by the write buffer,
    * not the key count; changelog checkpointing keeps commits incremental.
    * The provider is fixed at query START (it lives in the checkpoint), so
    * this wraps query construction, not the session. */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider"),
      // changelog checkpointing: commit uploads only the delta since the
      // last snapshot instead of full SST sets — the production setting
      // for high-cardinality state at short trigger intervals
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
    val prevs = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally {
      prevs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  /** Batch-driven smoke runner: stream a parquet directory through a
    * streaming query into a memory sink and return the materialized result.
    * `Trigger.AvailableNow`-style: processAllAvailable then stop. The
    * query runs with `statePartitions` state-store instances (see
    * [[withStatePartitions]]) — right-sized for a staged bounded replay. */
  def runToMemory(spark: SparkSession, srcDir: String, name: String,
      transform: DataFrame => DataFrame,
      mode: OutputMode = OutputMode.Complete(),
      statePartitions: Int = 8): DataFrame = {
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    withStatePartitions(spark, statePartitions) {
      val q = transform(stream).writeStream
        .outputMode(mode)
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }

  /** Streaming face of [[graft.operators.IncrementalAgg.updateCdc]]: a
    * CDC feed (`opCol` ∈ {insert, delete}) folded into a persisted
    * (keys, n, total) aggregate state, one `foreachBatch` at a time. The
    * state lives as parquet under `statePath` (any Hadoop URI) in
    * ping-pong version dirs (`v0`/`v1`): each batch reads the live
    * version, folds, writes the OTHER version, then commits a pointer
    * file carrying (live version, last applied batch id).
    *
    * Exactly-once contract: the pointer's batch id makes the fold
    * IDEMPOTENT under Spark's at-least-once foreachBatch delivery — a
    * replayed batch (crash after pointer commit, before the stream
    * checkpoint recorded the offset) is recognized by id and skipped.
    * This requires a DURABLE `checkpointDir`: restarting with a fresh
    * checkpoint resets batch ids to 0 and would re-feed already-applied
    * source data, so pass the same checkpoint dir across restarts (the
    * spec-only default of None is for single-run tests). A crash BEFORE
    * the pointer commit leaves the live pointer untouched and the batch
    * replays cleanly. Single-writer: one query per statePath.
    *
    * Readers: a DataFrame from [[readAggState]] remains valid across ONE
    * subsequent commit (its files are the non-live version the next
    * commit overwrites only on the commit after that) — re-read per
    * refresh rather than holding plans across many commits.
    *
    * State I/O per batch is group-cardinality-sized — the corpus itself
    * is never rescanned, which is the whole point at 100 TB. */
  def cdcAggregateStream(changes: DataFrame, opCol: String,
      keyCols: Seq[String], valueCol: String, statePath: String,
      statePartitions: Int = 8, checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = changes.sparkSession
    val writer = changes.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (live, lastApplied) = pointer(spark, statePath)
        if (batchId <= lastApplied) () // replayed batch — already folded
        else withStatePartitions(spark, statePartitions) {
          // pre-first-commit: an empty state with the schema the batch
          // itself induces (no hand-written schema to drift)
          val st =
            if (live >= 0)
              spark.read.parquet(s"$statePath/v$live")
            else graft.operators.IncrementalAgg.update(
              None, batch.limit(0), keyCols, valueCol)
          val next = graft.operators.IncrementalAgg.updateCdc(
            st,
            batch.filter(col(opCol) === "insert"),
            batch.filter(col(opCol) === "delete"),
            keyCols, valueCol)
          val target = if (live == 0) 1 else 0
          next.write.mode("overwrite").parquet(s"$statePath/v$target")
          commitPointer(spark, statePath, target, batchId)
        }
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** The live CDC aggregate state. Fails loudly before the first batch
    * commit — consumers polling early should treat that as "no state yet",
    * not as an empty aggregate. */
  def readAggState(spark: SparkSession, statePath: String): DataFrame = {
    val (v, _) = pointer(spark, statePath)
    require(v >= 0, s"no committed CDC aggregate state under $statePath yet")
    spark.read.parquet(s"$statePath/v$v")
  }

  /** (live version, last applied batch id) from the pointer file;
    * (-1, -1) before the first commit. Hadoop FS, so statePath may be
    * hdfs://, s3a://, file:// or a bare local path alike. */
  private def pointer(spark: SparkSession, statePath: String): (Int, Long) = {
    val p = new org.apache.hadoop.fs.Path(s"$statePath/LIVE")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) (-1, -1L)
    else {
      val in = fs.open(p)
      try {
        val parts = new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")
        (parts(0).toInt, if (parts.length > 1) parts(1).toLong else -1L)
      } finally in.close()
    }
  }

  private def commitPointer(spark: SparkSession, statePath: String,
      version: Int, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$statePath/LIVE")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"$version $batchId"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
