package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.pipeline.Pipeline

class PipelineAndStreamingSpec extends SparkSuite {
  import spark.implicits._

  test("pipeline chains stages lazily and loads to parquet sink") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val result = Pipeline.fromParquet(s"$sfDir/customer.parquet")
      .transform(QualityScorer(fields = Seq("c_custkey", "c_name", "c_acctbal")))
      .transform(ColumnRemover(prefix = Some("_meta_"),
        keep = Set("_meta_quality_score")))
      .load(df => graft.io.Sinks.parquet(df, s"$out/gold"))
      .run(spark)
    assert(result.rowsLoaded == 150L)
    // observe() metrics: per-stage processed counts without extra actions
    assert(result.stageRowCounts.values.forall(_ == 150L))
    val readBack = spark.read.parquet(s"$out/gold")
    assert(readBack.columns.contains("_meta_quality_score"))
    // the reference's stats view: success, row counts, phase durations
    val stats = result.stats
    assert(stats("success") == true && stats("records_loaded") == 150L)
    assert(stats.contains("transformer_quality_scorer") ||
      result.stageNames.forall(n => stats.contains(s"transformer_$n")))
    assert(stats("duration_ms").asInstanceOf[Long] >= 0L)
  }

  test("runSafe captures failures as success=false + error, never throws") {
    val r = Pipeline
      .extract(s => s.read.parquet("/nonexistent/path/xyz.parquet"))
      .transform(NullRemover("drop"))
      .runSafe(spark)
    assert(!r.success && r.error.nonEmpty && r.rowsLoaded == 0L)
    assert(r.stats("success") == false && r.stats.contains("error"))
  }

  test("checkpointed pipeline resumes from stage boundary") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val p = Pipeline.fromParquet(s"$sfDir/nation.parquet")
      .transform(NullRemover("drop"))
      .checkpointed(dir)
    val r1 = p.run(spark)
    val r2 = p.resumeFrom(spark, dir, fromStage = 0)
    assert(r1.rowsLoaded == r2.rowsLoaded)
  }

  test("streaming windowed counts over events match batch aggregation") {
    // file stream source wants a directory — stage the single parquet file
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val eventsPath = stageDir.toString
    // stream path (ts shape varies by dataset generation — shared normalizer)
    val got = graft.streaming.Streams.runToMemory(spark, eventsPath, "win_test",
      df => graft.streaming.Streams.windowedCounts(
        graft.core.Tables.withEventTime(df), "1 hour"))
    val batch = graft.core.Tables.table(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.agg(sum("n")).head().getLong(0) == 1000L)
    assert(got.count() == batch.count())
  }

  test("stateful sessionize counts per-user events") {
    import graft.streaming.Streams._
    implicit val s = spark
    val events = graft.core.Tables.table(spark, sfDir, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value")).as[Event]
    val sessions = sessionize(events).collect()
    assert(sessions.map(_.nEvents).sum == 1000L)
  }

  test("profileTable suggests roles and lists small categorical values") {
    val prof = graft.query.QueryService.profileTable(
      graft.core.Tables.table(spark, sfDir, "events"),
      Seq("event_id", "event_type", "value", "ts"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(prof("event_id").getAs[String]("suggested_role") == "id")
    assert(prof("value").getAs[String]("suggested_role") == "metric")
    assert(prof("ts").getAs[String]("suggested_role") == "datetime")
    assert(prof("event_type").getAs[String]("suggested_role") == "dimension")
    val vals = prof("event_type").getAs[String]("sample_values")
    assert(vals.split('|').sorted.toSeq == vals.split('|').toSeq)
    assert(prof("event_type").getAs[Boolean]("high_cardinality") == false)
  }

  test("profileTable is single-pass: stats jobs independent of column width") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val events = graft.core.Tables.table(spark, sfDir, "events")
    def jobsFor(cols: Seq[String]): (Int, String) = {
      spark.sparkContext.addSparkListener(listener)
      try {
        jobs.set(0)
        val out = graft.query.QueryService.profileTable(events, cols)
        Thread.sleep(800) // listener bus is async; let job-start events drain
        (jobs.get(), out.queryExecution.executedPlan.toString)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // the stats pass is ONE wide aggregate and ALL bounded categorical
    // value lists fold into ONE second aggregate: widening the column
    // list must not add jobs (the old shape ran ~2 jobs per column)
    val (jNarrow, _) = jobsFor(Seq("event_id", "event_type"))
    val (jWide, planWide) = jobsFor(
      Seq("event_id", "event_type", "value", "ts", "props"))
    assert(jWide == jNarrow,
      s"stats jobs grew with column count: $jNarrow -> $jWide")
    // a profile with no small-categorical column skips the sample job
    val (jNum, _) = jobsFor(Seq("event_id", "value"))
    assert(jNum <= jNarrow,
      s"numeric-only profile ran MORE jobs: $jNum > $jNarrow")
    // the returned report is pure literals — no deferred per-column
    // rescans hide in the result plan
    val scans = "Scan parquet|FileScan".r.findAllIn(planWide).length
    assert(scans == 0, s"expected a scan-free report plan, got $scans\n$planWide")
  }

  test("intermediate store: keyed save/load with meta sidecar, list, cleanup") {
    import graft.io.IntermediateStore
    val base = java.nio.file.Files.createTempDirectory("graft_store").toString
    val store = new IntermediateStore(spark, base)
    val region = graft.core.Tables.table(spark, sfDir, "region")
    val n = store.save("p1_stage0", region, stage = "extract",
      transformers = Seq("null_remover", "quality_scorer"))
    assert(n == 5 && store.exists("p1_stage0"))
    val (back, meta) = store.load("p1_stage0")
    assert(back.count() == 5)
    assert(meta.get.rows == 5 && meta.get.stage == "extract")
    assert(meta.get.transformers == Seq("null_remover", "quality_scorer"))
    assert(meta.get.columns == region.columns.toSeq)
    store.save("p1_stage1", region.limit(2))
    store.save("p2_stage0", region.limit(1))
    assert(store.listKeys() == Seq("p1_stage0", "p1_stage1", "p2_stage0"))
    assert(store.listKeys(Some("p1")) == Seq("p1_stage0", "p1_stage1"))
    store.cleanup("p1")
    assert(store.listKeys() == Seq("p2_stage0"))
    assert(!store.exists("p1_stage0"))
    store.delete("p2_stage0")
    assert(store.listKeys().isEmpty)
  }

  test("incremental state: second scan with same files yields no new rows") {
    import graft.io.IncrementalState
    val (df1, st1) = IncrementalState.scanNew(spark, s"$sfDir/region.parquet",
      "parquet", IncrementalState.empty)
    assert(df1.count() == 5)
    val (df2, _) = IncrementalState.scanNew(spark, s"$sfDir/region.parquet",
      "parquet", st1)
    assert(df2.count() == 0)
  }

  test("incremental state catches a rewrite within the same mtime tick") {
    import graft.io.IncrementalState
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val f = java.nio.file.Paths.get(s"$dir/data.csv")
    java.nio.file.Files.writeString(f, "1\n")
    val (d1, st1) = IncrementalState.scanNew(spark, dir, "csv",
      IncrementalState.empty)
    assert(d1.count() == 1)
    // rewrite with MORE rows, then force the mtime back to the watermark —
    // the old strict-> comparison would have missed this
    java.nio.file.Files.writeString(f, "1\n2\n")
    f.toFile.setLastModified(st1.lastModified)
    val (d2, _) = IncrementalState.scanNew(spark, dir, "csv", st1)
    assert(d2.count() == 2)
  }

  test("json array source roundtrip with nested path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val path = s"$dir/data.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """{"data": {"records": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]}}""")
    val df = graft.io.Sources.jsonArray(spark, path, Some("data.records"))
    assert(df.count() == 2 && df.columns.sorted.toSeq == Seq("a", "b"))
    // sink sidecar: named off the stem like the reference
    // (out.json -> out.schema.json), round-trips through DataType.fromJson
    val out = s"$dir/out.json"
    graft.io.Sinks.jsonArray(df, out, schemaSidecar = true)
    val sidecar = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/out.schema.json"))
    assert(org.apache.spark.sql.types.DataType.fromJson(sidecar) == df.schema)
  }

  test("json array sink: executor-streamed file matches driver-built bytes") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsink").toString
    val df = spark.range(5).select(col("id"),
      when(col("id") % 2 === 0, concat(lit("v"), col("id"))).as("s"))
    for (pretty <- Seq(false, true)) {
      val out = s"$dir/arr_$pretty.json"
      graft.io.Sinks.jsonArray(df, out, pretty = pretty)
      val got = java.nio.file.Files.readString(java.nio.file.Paths.get(out))
      // the old driver-collect construction, explicit nulls
      val rows = df.select(to_json(struct(col("id"), col("s")),
        Map("ignoreNullFields" -> "false"))).collect().map(_.getString(0))
      val want = if (pretty) rows.mkString("[\n  ", ",\n  ", "\n]")
                 else rows.mkString("[", ",", "]")
      assert(got == want)
      assert(got.contains("null")) // explicit null fields like json.dump
    }
    // empty input still produces a valid array file
    val empty = s"$dir/empty.json"
    graft.io.Sinks.jsonArray(df.filter(col("id") < 0), empty)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(empty)) == "[]")
    // a stale .inprogress from a failed run is never adopted by a later
    // empty-input write
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$empty.inprogress"), "[STALE GARBAGE")
    graft.io.Sinks.jsonArray(df.filter(col("id") < 0), empty)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(empty)) == "[]")
  }

  test("mini json: parse/render round-trips nested values and escapes") {
    import graft.service.MiniJson
    val src = """{"a": [1, -2.5, true, null, "x\ny A\""],
                 "b": {"nested": {"k": 10000000000}}, "empty": [], "eo": {}}"""
    val v = MiniJson.parse(src).asInstanceOf[Map[String, Any]]
    val a = v("a").asInstanceOf[List[Any]]
    assert(a == List(1L, -2.5, true, null, "x\ny A\""))
    assert(v("b").asInstanceOf[Map[String, Any]]("nested")
      .asInstanceOf[Map[String, Any]]("k") == 10000000000L)
    assert(v("empty") == Nil && v("eo") == Map.empty)
    // render → parse is identity on the parsed model
    assert(MiniJson.parse(MiniJson.render(v)) == v)
    // malformed inputs throw, never hang or mis-parse
    intercept[Exception](MiniJson.parse("""{"a": }"""))
    intercept[Exception](MiniJson.parse("""[1,2"""))
    intercept[Exception](MiniJson.parse("""{"a":1} trailing"""))
  }

  test("query service profile + filter-values on real table") {
    val li = graft.core.Tables.table(spark, sfDir, "lineitem")
    val prof = graft.query.QueryService.profileNumeric(li, Seq("l_quantity"))
    val row = prof.head()
    assert(row.getAs[Double]("min_value") >= 0.0)
    val fv = graft.query.QueryService.filterValues(li, "l_returnflag")
    assert(fv.count() <= 3)
  }

  test("RocksDB state store: watermarked dedup parity with the default " +
      "provider, and the provider really engages") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.streaming.OutputMode
    val stageDir = java.nio.file.Files.createTempDirectory("graft_rocks")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val schema = spark.read.parquet(stageDir.toString).schema
    def run(name: String, rocks: Boolean): (Set[Long], Seq[String]) = {
      def start() = {
        val stream = spark.readStream.schema(schema)
          .parquet(stageDir.toString)
        val out = graft.streaming.Streams.dedupStream(
          graft.core.Tables.withEventTime(stream)
            .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type")),
          "ts", "10 minutes", Seq("user_id", "event_type"))
        val q = out.writeStream.outputMode(OutputMode.Append())
          .format("memory").queryName(name).start()
        try q.processAllAvailable() finally q.stop()
        q
      }
      val q = graft.streaming.Streams.withStatePartitions(spark, 4) {
        if (rocks) graft.streaming.Streams.withRocksDbStateStore(spark)(start())
        else start()
      }
      val metricKeys = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .flatMap(_.customMetrics.keySet.asScala)
      (spark.table(name).select("event_id").collect()
        .map(_.getLong(0)).toSet, metricKeys)
    }
    val (rockIds, rockMetrics) = run("rocks_dedup", rocks = true)
    val (defIds, _) = run("plain_dedup", rocks = false)
    assert(rockIds == defIds)
    assert(rockIds.nonEmpty)
    // the provider swap must be real, not a silently-ignored conf: RocksDB
    // surfaces its own custom state metrics in query progress
    assert(rockMetrics.exists(_.toLowerCase.contains("rocksdb")))
    // and the conf did not leak past the wrapper
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").exists(
      _.contains("RocksDB")))
  }
}
