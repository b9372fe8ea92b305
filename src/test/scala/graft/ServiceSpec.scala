package graft

import org.apache.spark.sql.functions._
import graft.service.{AutoTuner, Config, Paths}
import graft.operators.IsolationForest

class ServiceSpec extends SparkSuite {

  test("facade dispatches every analytics endpoint to the engine") {
    import graft.service.Facade
    import graft.query.{AggregationSpec, Filter, Metric}
    implicit val tables: Facade.Tables =
      Facade.Tables(name => graft.core.Tables.table(spark, sfDir, name))

    val q = Facade.handle(Facade.Query("lineitem",
      Seq(Filter.Gt("l_quantity", 10.0)),
      AggregationSpec(Seq("l_returnflag"),
        Seq(Metric("sum", "l_extendedprice", "total")))))
    assert(q.columns.toSeq == Seq("l_returnflag", "total") && q.count() > 0)

    val dd = Facade.handle(Facade.DrillDown("customer",
      Seq(Filter.Eq("c_mktsegment", "BUILDING")),
      Seq("c_custkey", "c_name"), sortKey = "c_custkey", limit = 5, offset = 2))
    assert(dd.count() == 5)

    val fv = Facade.handle(Facade.FilterValues("lineitem", "l_returnflag"))
    assert(fv.count() <= 3)

    val prof = Facade.handle(Facade.Profile("events", Seq("value", "event_type")))
    assert(prof.count() == 2)

    // orders: amount keywords hit o_totalprice, date keywords o_orderdate
    val dash = Facade.handle(Facade.Dashboard("summary", "orders"))
    assert(dash.columns.contains("total_amount") && dash.count() == 1)
    val byDate = Facade.handle(Facade.Dashboard("by_date", "orders"))
    assert(byDate.columns.contains("service_date") && byDate.count() > 0)

    val anom = Facade.handle(Facade.Anomalies("events", "statistical",
      Seq("value"), threshold = 2.0))
    assert(anom.columns.contains("_meta_is_anomaly"))

    val timed = Facade.handleTimed(Facade.FilterValues("region", "r_name"))
    assert(timed.rows.size == 5 && timed.queryTimeMs >= 0)
  }
  import spark.implicits._

  test("isolation forest scores planted outliers above inliers (property)") {
    val data = ((1 to 200).map(i => (i.toLong, 10.0 + (i % 7))) ++
      Seq((201L, 5000.0), (202L, -4000.0))).toDF("id", "v")
    val out = IsolationForest.detect(data, Seq("v"), "id",
      contamination = 0.01, numTrees = 50)
    val flagged = out.filter(col("_meta_is_anomaly"))
      .select("id").as[Long].collect().toSet
    assert(flagged.contains(201L) || flagged.contains(202L))
    // determinism: same seed → same scores
    val s1 = IsolationForest.detect(data, Seq("v"), "id", numTrees = 20)
      .select("id", "_iforest_score").as[(Long, Double)].collect().toMap
    val s2 = IsolationForest.detect(data, Seq("v"), "id", numTrees = 20)
      .select("id", "_iforest_score").as[(Long, Double)].collect().toMap
    assert(s1 == s2)
  }

  test("custom aggregators register and partial-aggregate correctly") {
    graft.functions.CustomAggregators.registerBuiltins(spark)
    Seq(2.0, 8.0).toDF("v").createOrReplaceTempView("ca_test")
    val r = spark.sql(
      "SELECT geometric_mean(v) AS g, value_range(v) AS r FROM ca_test").head()
    assert(math.abs(r.getDouble(0) - 4.0) < 1e-9) // sqrt(2*8)
    assert(r.getDouble(1) == 6.0)
  }

  test("auto tuner recommends argmax batch size with confidence") {
    val tuner = new AutoTuner()
    Seq(100 -> 4355.0, 500 -> 12132.0, 1000 -> 13495.0, 2500 -> 12740.0)
      .foreach { case (b, tput) =>
        tuner.record(tuner.Run(b, records = (tput * 10).toLong,
          seconds = 10.0, mbProcessed = 100.0))
      }
    val rec = tuner.recommend().get
    assert(rec.batchSize == 1000)
    assert(rec.confidence > 0 && rec.confidence <= 1.0)
    assert(tuner.sparkOptions(rec)("jdbc.fetchsize") == "1000")
  }

  test("config factory builds a runnable pipeline") {
    val out = java.nio.file.Files.createTempDirectory("graft_cfg").toString
    val cfg = Config.PipelineConfig(
      source = Config.ParquetSource(s"$sfDir/customer.parquet"),
      transformers = Seq(
        Config.QualityScorerConf(fields = Seq("c_custkey", "c_name")),
        Config.ColumnRemoverConf(prefix = Some("_meta_"),
          keep = Set("_meta_quality_score"))),
      destinations = Seq(Config.ParquetDest(s"$out/gold"),
        Config.JsonlDest(s"$out/rag")))
    val result = Config.build(cfg).run(spark)
    assert(result.rowsLoaded == 150L)
    assert(spark.read.parquet(s"$out/gold").count() == 150L)
    assert(spark.read.json(s"$out/rag").count() == 150L)
  }

  test("slugify + medallion paths match reference semantics") {
    assert(Paths.slugify("My Data_Set 2024!") == "my-data-set-2024")
    assert(Paths.goldBi("Acme Corp", "Q1 Sales") == "acme-corp/gold/bi/q1-sales/q1-sales.parquet")
    assert(Paths.quarantine("acme", "claims") == "acme/quarantine/claims_anomalies.csv")
  }

  test("visualization: analysis classifies columns, selection ranks charts") {
    import graft.viz.Visualization
    val ev = graft.core.Tables.table(spark, sfDir, "events")
    val profiles = Visualization.analyze(ev)
    val byName = profiles.map(p => p.name -> p).toMap
    assert(byName("value").kind == "numeric")
    assert(byName("event_type").kind == "categorical")
    assert(byName("ts").kind == "datetime")
    assert(byName("event_id").isId)
    val charts = Visualization.selectCharts(profiles)
    assert(charts.nonEmpty && charts.size <= 10)
    assert(charts.head.priority >= charts.last.priority)
    // bar chart renders through the §2.9 top-k shape
    val bar = charts.find(_.chartType == "bar")
    bar.foreach { b =>
      assert(Visualization.dataFor(ev, b).count() <= 15)
    }
    val pie = charts.find(_.chartType == "pie").get
    val rows = Visualization.dataFor(ev, pie).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toSeq
    val json = Visualization.echartsConfig(pie, rows)
    assert(json.contains("\"type\":\"pie\""))
  }

  test("type system round-trips through StructType metadata and builds DDL") {
    import graft.core.Types
    import graft.core.Types._
    val spec = SchemaSpec(Seq(
      FieldSpec("id", FInteger, nullable = false),
      FieldSpec("email", FString, pattern = Some("^[^@]+@[^@]+$"),
        inferred = true, confidence = 0.93),
      FieldSpec("amount", FFloat, minValue = Some(0.0), maxValue = Some(1e6)),
      FieldSpec("tags", FArray), FieldSpec("meta", FJson),
      FieldSpec("born", FDate), FieldSpec("seen", FTimestamp),
      FieldSpec("active", FBoolean)), primaryKey = Some("id"))
    val st = Types.toStructType(spec)
    assert(st("email").metadata.getString("pattern") == "^[^@]+@[^@]+$")
    val back = Types.fromStructType(st)
    assert(back.primaryKey.contains("id"))
    assert(back.fields.map(_.fieldType) == spec.fields.map(_.fieldType))
    assert(back.fields.find(_.name == "email").get.confidence == 0.93)
    // per-sink DDL parity (sqlite_loader.py:114-127 / postgres_loader.py:182-194)
    val sqlite = Types.createTableDdl("t", spec, "sqlite")
    assert(sqlite.contains("id INTEGER NOT NULL PRIMARY KEY"))
    assert(sqlite.contains("active INTEGER") && sqlite.contains("born TEXT"))
    val pg = Types.createTableDdl("t", spec, "postgres")
    assert(pg.contains("amount DOUBLE PRECISION") && pg.contains("meta JSONB")
      && pg.contains("tags TEXT[]") && pg.contains("active BOOLEAN"))
    // spark mapping both ways
    assert(Types.toSpark(FInteger) == org.apache.spark.sql.types.LongType)
    assert(Types.fromSpark(org.apache.spark.sql.types.DecimalType(10, 2)) == FFloat)
  }

  test("insight profile text summarizes columns") {
    val txt = graft.viz.InsightProfile.profileText(
      graft.core.Tables.table(spark, sfDir, "nation"))
    assert(txt.contains("n_nationkey") && txt.contains("25 rows"))
  }
}
