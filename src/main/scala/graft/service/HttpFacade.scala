package graft.service

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.DataFrame
import graft.query.{AggregationSpec, Filter, Metric}

/** Loopback JSON-over-HTTP server for the analytics facade — the consumption
  * mode the reference ships as FastAPI routes (`/root/reference/src/api/
  * main.py:905-1385`). Auth/org/source CRUD (`main.py:1388-2728`) is scoped
  * out per SURVEY §2.12; the table name stands in for the reference's
  * org/source indirection. JDK `com.sun.net.httpserver` — no dependencies.
  *
  * Routes (POST bodies match the reference's documented examples):
  *   POST /api/analytics/dashboard/query        (main.py:955-1033)
  *   POST /api/analytics/dashboard/drill-down   (main.py:1044-1120)
  *   GET  /api/analytics/dashboard/filter-values?table=&column=&search=&limit=
  *   GET  /api/analytics/dashboard/schema?table=&columns=a,b,c
  *   GET  /api/analytics/dashboard?kind=&table=
  *
  * Responses: `{"data": [...], "row_count": n, "query_time_ms": t}` — the
  * reference's envelope (`duckdb_service.py:417-431`). Rows are serialized
  * plan-side (`to_json`, explicit nulls) and streamed; the server holds at
  * most the already-limited result of the endpoint's query.
  */
final class HttpFacade(tables: Facade.Tables, maxRows: Int = 100000) {
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/api/analytics/dashboard/query", postCtx(handleQuery))
    server.createContext("/api/analytics/dashboard/drill-down", postCtx(handleDrillDown))
    server.createContext("/api/analytics/dashboard/filter-values", getCtx(handleFilterValues))
    server.createContext("/api/analytics/dashboard/schema", getCtx(handleSchema))
    server.createContext("/api/analytics/dashboard", getCtx(handleDashboard))
    server.createContext("/api/analytics/anomalies", postCtx(handleAnomalies))
    server.createContext("/api/analytics/generate-insights", postJsonCtx(handleInsights))
    server.createContext("/api/analytics/visualizations/generate", postJsonCtx(handleVizGenerate))
    server.createContext("/api/pipeline/unified", postJsonCtx(handlePipeline))
    server.createContext("/api/pipeline/staged", safe(handleStaged))
    server.createContext("/api/pipeline", safe(handleStatus)) // /{id}/status
    server.createContext("/api/pipelines",
      safe(ex => send(ex, 200, listPipelines())))
    server.createContext("/health",
      safe(ex => send(ex, 200, """{"status":"healthy"}""")))
    // a small pool: requests block on Spark actions, and Spark's scheduler
    // (FIFO/fair) arbitrates the actual cluster work
    pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    server.setExecutor(pool)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) { pool.shutdown(); () }
  }

  // ---- request parsing (reference body shapes) ----------------------------

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }
  private def asList(v: Any): List[Any] = v match {
    case l: List[_] => l
    case _ => Nil
  }
  private def asStr(v: Any): String = String.valueOf(v)
  private def asInt(v: Any, default: Int): Int = v match {
    case l: Long => l.toInt
    case d: Double => d.toInt
    case _ => default
  }
  // MiniJson parses whole-number literals as Long — a Double-only match
  // would silently drop e.g. "threshold": 3
  private def asDouble(v: Any, default: Double): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case _ => default
  }

  /** `{"column": c, "operator": op, "value": v}` with the reference's twelve
    * operator names (`duckdb_service.py:271-324`). */
  private[service] def parseFilter(m: Map[String, Any]): Filter = {
    val c = asStr(m("column"))
    val v = m.getOrElse("value", null)
    asStr(m("operator")) match {
      case "eq" => Filter.Eq(c, v)
      case "neq" => Filter.Neq(c, v)
      case "in" => Filter.In(c, asList(v))
      case "not_in" => Filter.NotIn(c, asList(v))
      case "between" =>
        val l = asList(v); Filter.Between(c, l.head, l(1))
      case "gt" => Filter.Gt(c, v)
      case "gte" => Filter.Gte(c, v)
      case "lt" => Filter.Lt(c, v)
      case "lte" => Filter.Lte(c, v)
      case "contains" => Filter.Contains(c, asStr(v))
      case "is_null" => Filter.IsNull(c)
      case "is_not_null" => Filter.IsNotNull(c)
      case other => throw new IllegalArgumentException(s"unknown operator $other")
    }
  }

  /** `{"group_by": [...], "metrics": [{"column","agg","alias"}], "order_by",
    * "order_desc", "limit"}` (main.py:971-978). */
  private[service] def parseAgg(m: Map[String, Any]): AggregationSpec = {
    val metrics = asList(m.getOrElse("metrics", Nil)).map { mm =>
      val mv = asMap(mm)
      val c = asStr(mv("column"))
      Metric(asStr(mv.getOrElse("agg", "sum")), c,
        asStr(mv.getOrElse("alias", c)))
    }
    val orderBy = m.get("order_by").map(ob =>
      (asStr(ob), !m.get("order_desc").forall(_ == true)))
    AggregationSpec(
      groupBy = asList(m.getOrElse("group_by", Nil)).map(asStr),
      metrics = metrics,
      orderBy = orderBy,
      limit = m.get("limit").map(asInt(_, 1000)))
  }

  // ---- handlers -----------------------------------------------------------

  private def handleQuery(body: Map[String, Any]): DataFrame =
    Facade.handle(Facade.Query(
      table = asStr(body("table")),
      filters = asList(body.getOrElse("filters", Nil)).map(f => parseFilter(asMap(f))),
      agg = parseAgg(asMap(body.getOrElse("aggregation", Map.empty)))))(tables)

  private def handleDrillDown(body: Map[String, Any]): DataFrame = {
    // dimension + dimension_value sugar (main.py:1095-1099) folds into an eq
    val dimFilter = body.get("dimension").map(d =>
      Filter.Eq(asStr(d), body.getOrElse("dimension_value", null)))
    Facade.handle(Facade.DrillDown(
      table = asStr(body("table")),
      filters = dimFilter.toSeq ++
        asList(body.getOrElse("filters", Nil)).map(f => parseFilter(asMap(f))),
      columns = asList(body.getOrElse("columns", Nil)).map(asStr),
      sortKey = body.get("sort_key").map(asStr).getOrElse(
        asList(body.getOrElse("columns", Nil)).map(asStr).headOption
          .getOrElse(tables.resolve(asStr(body("table"))).columns.head)),
      limit = asInt(body.getOrElse("limit", 100L), 100),
      offset = asInt(body.getOrElse("offset", 0L), 0)))(tables)
  }

  private def handleAnomalies(body: Map[String, Any]): DataFrame =
    Facade.handle(Facade.Anomalies(
      table = asStr(body("table")),
      method = asStr(body.getOrElse("method", "statistical")),
      fields = asList(body.getOrElse("fields", Nil)).map(asStr),
      threshold = body.get("threshold").map {
        case d: Double => d; case l: Long => l.toDouble; case _ => 3.0
      }.getOrElse(3.0)))(tables)

  private def handleFilterValues(q: Map[String, String]): DataFrame =
    Facade.handle(Facade.FilterValues(
      table = q("table"), column = q("column"),
      search = q.get("search").filter(_.nonEmpty),
      limit = q.get("limit").map(_.toInt).getOrElse(100)))(tables)

  private def handleSchema(q: Map[String, String]): DataFrame = {
    val t = q("table")
    val cols = q.get("columns").filter(_.nonEmpty).map(_.split(",").toSeq)
      .getOrElse(tables.resolve(t).columns.toSeq)
    Facade.handle(Facade.Profile(t, cols))(tables)
  }

  private def handleDashboard(q: Map[String, String]): DataFrame =
    Facade.handle(Facade.Dashboard(
      kind = q.getOrElse("kind", "summary"), table = q("table")))(tables)

  /** `POST /api/analytics/generate-insights` (main.py:789-860): the
    * engine-side profile text the reference feeds its LLM call (the call
    * itself is out of scope — no egress). */
  private def handleInsights(body: Map[String, Any]): String = {
    val df = tables.resolve(asStr(body("table")))
    val text = graft.viz.InsightProfile.profileText(df,
      asInt(body.getOrElse("sample_rows", 1000L), 1000))
    MiniJson.render(Map("insights" -> text, "status" -> "generated"))
  }

  /** `POST /api/analytics/visualizations/generate` (main.py:1238-1297):
    * analyze the table, pick charts, aggregate each chart's data and return
    * ready-to-render ECharts configs. */
  private def handleVizGenerate(body: Map[String, Any]): String = {
    import graft.viz.{Echarts, Visualization}
    val df = tables.resolve(asStr(body("table")))
    val max = asInt(body.getOrElse("max_charts", 5L), 5)
    val charts = Visualization.selectCharts(Visualization.analyze(df), max)
    val rendered = charts.map { cfg =>
      val data = Visualization.dataFor(df, cfg)
      val rows = Echarts.rowsOf(data, limit = 100)
      val (xf, yf) = (data.columns.head,
        data.columns.lift(1).getOrElse(data.columns.head))
      val chart = Echarts.generate(cfg.chartType, rows, xf, yf,
        title = Some(s"${cfg.chartType}: ${cfg.x}"))
      s"""{"chart_type":"${MiniJson.escape(cfg.chartType)}",""" +
        s""""x":"${MiniJson.escape(cfg.x)}"""" +
        cfg.y.map(y => s""","y":"${MiniJson.escape(y)}"""").getOrElse("") +
        s""","priority":${cfg.priority},"echarts":${chart.render}}"""
    }
    s"""{"visualizations":${rendered.mkString("[", ",", "]")},"count":${rendered.length}}"""
  }

  /** `POST /api/pipeline/unified` (main.py:102-180): full
    * extract→transform→load from one JSON config — the reference's primary
    * execution endpoint. Org/RAG auto-pathing is scoped out (SURVEY §2.12);
    * sources/destinations are taken as given. */
  private def handlePipeline(body: Map[String, Any]): String = {
    val cfg = parsePipelineConfig(body)
    val result = Config.build(cfg)
      .run(org.apache.spark.sql.SparkSession.active)
    val stages = result.stageRowCounts.map { case (k, v) =>
      s""""${MiniJson.escape(k)}":$v""" }.mkString("{", ",", "}")
    s"""{"pipeline_id":"${java.util.UUID.randomUUID()}","mode":"unified",""" +
      s""""status":"completed","rows_loaded":${result.rowsLoaded},""" +
      s""""stage_counts":$stages}"""
  }

  /** Reference request shapes (`models.py:28-120`) → `Config` ADTs. */
  private[service] def parsePipelineConfig(body: Map[String, Any]): Config.PipelineConfig = {
    val src = asMap(body("source"))
    val source = asStr(src("type")) match {
      case "csv" => Config.CsvSource(asStr(src("path")))
      case "json" => Config.JsonSource(asStr(src("path")))
      case "parquet" => Config.ParquetSource(asStr(src("path")))
      case "database" | "postgresql" => Config.JdbcSource(
        asStr(src("connection_string")), asStr(src("table_name")))
      case other => throw new IllegalArgumentException(s"unknown source $other")
    }
    val transformers = asList(body.getOrElse("transformers", Nil)).map { t =>
      val tm = asMap(t)
      val c = asMap(tm.getOrElse("config", Map.empty))
      asStr(tm("type")) match {
        case "null_remover" => Config.NullRemoverConf(
          asStr(c.getOrElse("strategy", "drop")),
          asList(c.getOrElse("fields", Nil)).map(asStr),
          asStr(c.getOrElse("fill_value", "")))
        case "dedup" => Config.DeduplicatorConf(
          asList(c.getOrElse("match_fields", Nil)).map(asStr),
          asStr(c.getOrElse("merge_strategy", "keep_first")))
        case "quality_scorer" => Config.QualityScorerConf(
          asList(c.getOrElse("fields", Nil)).map(asStr),
          asDouble(c.getOrElse("min_score", 0.5), 0.5),
          c.get("filter_low").contains(true))
        case "anomaly_detector" => Config.AnomalyDetectorConf(
          asStr(c.getOrElse("method", "statistical")),
          asList(c.getOrElse("fields", Nil)).map(asStr),
          asDouble(c.getOrElse("threshold", 3.0), 3.0))
        case "schema_inferrer" => Config.SchemaInferrerConf(
          asList(c.getOrElse("fields", Nil)).map(asStr))
        case "aggregator" => Config.AggregatorConf(
          asList(c.getOrElse("group_by", Nil)).map(asStr),
          asList(c.getOrElse("aggregations", Nil)).map { a =>
            val am = asMap(a)
            (asStr(am("column")), asStr(am.getOrElse("agg", "sum")),
              asStr(am.getOrElse("alias", asStr(am("column")))))
          })
        case "column_remover" => Config.ColumnRemoverConf(
          asList(c.getOrElse("columns", Nil)).map(asStr).toSet)
        case "metadata_to_columns" => Config.MetadataToColumnsConf()
        case other => throw new IllegalArgumentException(s"unknown transformer $other")
      }
    }
    val dests = asList(body.getOrElse("destinations",
      body.get("destination").map(List(_)).getOrElse(Nil))).map { d =>
      val dm = asMap(d)
      asStr(dm("type")) match {
        case "csv" => Config.CsvDest(asStr(dm("path")))
        // "json" = single JSON-array file, the reference default
        // (pipeline_service.py:643-646, json_loader.py:23); line-delimited
        // output stays reachable via the explicit "jsonl" type
        case "json" => Config.JsonArrayDest(asStr(dm("path")))
        case "jsonl" => Config.JsonlDest(asStr(dm("path")))
        case "parquet" => Config.ParquetDest(asStr(dm("path")))
        case "sqlite" | "postgres" => Config.JdbcDest(
          asStr(dm("connection_string")),
          asStr(dm.getOrElse("table_name", "etl_data")))
        case other => throw new IllegalArgumentException(s"unknown destination $other")
      }
    }
    Config.PipelineConfig(source, transformers, dests)
  }

  // ---- staged mode (main.py:183-330) --------------------------------------

  /** One staged pipeline's lifecycle; stage outputs checkpoint through
    * [[graft.io.IntermediateStore]] so each HTTP call is independent (the
    * reference's staged mode persists between calls the same way). */
  private final class StagedState(val name: String,
      val cfg: Config.PipelineConfig, val storeDir: String) {
    val createdAt: Long = System.currentTimeMillis()
    @volatile var updatedAt: Long = createdAt
    @volatile var extractStatus = "pending"
    @volatile var transformStatus = "pending"
    @volatile var loadStatus = "pending"
    @volatile var extractRecords: Option[Long] = None
    @volatile var transformRecords: Option[Long] = None
    def overall: String =
      if (Seq(extractStatus, transformStatus, loadStatus).contains("failed")) "failed"
      else if (loadStatus == "completed") "completed"
      else if (extractStatus == "pending") "initialized"
      else "in_progress"
  }

  private val stagedPipelines =
    new java.util.concurrent.ConcurrentHashMap[String, StagedState]()

  private def handleStaged(ex: HttpExchange): Unit = {
    val rest = ex.getRequestURI.getPath.stripPrefix("/api/pipeline/staged")
      .stripPrefix("/")
    if (rest == "init") {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val parsed = asMap(MiniJson.parse(body))
      val id = java.util.UUID.randomUUID().toString
      val st = new StagedState(asStr(parsed.getOrElse("name", "pipeline")),
        parsePipelineConfig(parsed), s"/tmp/graft_staged/$id")
      stagedPipelines.put(id, st)
      send(ex, 200, s"""{"pipeline_id":"$id","mode":"staged",""" +
        s""""status":"initialized","message":"staged pipeline created"}""")
    } else rest.split("/") match {
      case Array(id, stage) if stagedPipelines.containsKey(id) =>
        send(ex, 200, runStage(id, stagedPipelines.get(id), stage))
      case _ => send(ex, 404, """{"detail":"pipeline not found"}""")
    }
  }

  private def runStage(id: String, st: StagedState, stage: String): String = {
    val spark = org.apache.spark.sql.SparkSession.active
    val store = new graft.io.IntermediateStore(spark, st.storeDir)
    val t0 = System.nanoTime()
    def done(records: Option[Long]): String = {
      st.updatedAt = System.currentTimeMillis()
      val secs = (System.nanoTime() - t0) / 1e9
      s"""{"pipeline_id":"$id","stage":"$stage","status":"completed"""" +
        records.fold("")(n => s""","records":$n""") +
        f""","duration_seconds":$secs%.3f,"message":"$stage completed"}"""
    }
    try stage match {
      case "extract" =>
        val df = Config.sourceFn(st.cfg.source)(spark)
        val n = store.save("extracted", df, "extract")
        st.extractStatus = "completed"; st.extractRecords = Some(n)
        done(Some(n))
      case "transform" =>
        require(st.extractStatus == "completed", "extract has not run")
        val (df, _) = store.load("extracted")
        val stages = st.cfg.transformers.map(Config.stageFor)
        val out = stages.foldLeft(df)((d, s) => s(d))
        val n = store.save("transformed", out, "transform",
          stages.map(_.name))
        st.transformStatus = "completed"; st.transformRecords = Some(n)
        done(Some(n))
      case "load" =>
        require(st.transformStatus == "completed" ||
          (st.cfg.transformers.isEmpty && st.extractStatus == "completed"),
          "transform has not run")
        val key = if (st.cfg.transformers.isEmpty) "extracted" else "transformed"
        val (df, _) = store.load(key)
        val cached = df.cache()
        try st.cfg.destinations.map(Config.sinkFn).foreach(_(cached))
        finally { cached.unpersist(); () }
        st.loadStatus = "completed"
        done(st.transformRecords.orElse(st.extractRecords))
      case other =>
        throw new IllegalArgumentException(s"unknown stage $other")
    } catch {
      case e: Throwable =>
        stage match {
          case "extract" => st.extractStatus = "failed"
          case "transform" => st.transformStatus = "failed"
          case _ => st.loadStatus = "failed"
        }
        st.updatedAt = System.currentTimeMillis()
        throw e
    }
  }

  private def statusJson(id: String, st: StagedState): String =
    s"""{"pipeline_id":"$id","name":"${MiniJson.escape(st.name)}",""" +
      s""""mode":"staged","overall_status":"${st.overall}",""" +
      s""""extract_status":"${st.extractStatus}",""" +
      s""""transform_status":"${st.transformStatus}",""" +
      s""""load_status":"${st.loadStatus}"""" +
      st.extractRecords.fold("")(n => s""","extract_records":$n""") +
      st.transformRecords.fold("")(n => s""","transform_records":$n""") +
      s""","created_at":${st.createdAt},"updated_at":${st.updatedAt}}"""

  private def handleStatus(ex: HttpExchange): Unit = {
    val rest = ex.getRequestURI.getPath.stripPrefix("/api/pipeline")
      .stripPrefix("/")
    rest.split("/") match {
      case Array(id, "status") if stagedPipelines.containsKey(id) =>
        send(ex, 200, statusJson(id, stagedPipelines.get(id)))
      case Array(id, "data", "preview") if stagedPipelines.containsKey(id) =>
        // GET .../data/preview?stage=transformed&limit=100 (main.py:369)
        val q = queryParams(ex)
        val st = stagedPipelines.get(id)
        val store = new graft.io.IntermediateStore(
          org.apache.spark.sql.SparkSession.active, st.storeDir)
        val key = q.getOrElse("stage", "transformed")
        if (!store.exists(key))
          send(ex, 404, s"""{"detail":"No data found for stage '$key'"}""")
        else {
          val (df, _) = store.load(key)
          respond(ex, df.limit(q.get("limit").map(_.toInt).getOrElse(100)))
        }
      case _ => send(ex, 404, """{"detail":"pipeline not found"}""")
    }
  }

  private def listPipelines(): String = {
    import scala.jdk.CollectionConverters._
    stagedPipelines.asScala.toSeq.sortBy(_._2.createdAt)
      .map { case (id, st) => statusJson(id, st) }
      .mkString("[", ",", "]")
  }

  // ---- plumbing -----------------------------------------------------------

  /** POST handler returning a pre-rendered JSON body (non-envelope routes). */
  private def postJsonCtx(post: Map[String, Any] => String): com.sun.net.httpserver.HttpHandler =
    safe { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val parsed = if (body.trim.isEmpty) Map.empty[String, Any]
                   else asMap(MiniJson.parse(body))
      send(ex, 200, post(parsed))
    }

  private def postCtx(post: Map[String, Any] => DataFrame): com.sun.net.httpserver.HttpHandler =
    safe { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val parsed = if (body.trim.isEmpty) Map.empty[String, Any]
                   else asMap(MiniJson.parse(body))
      respond(ex, post(parsed))
    }

  private def getCtx(get: Map[String, String] => DataFrame): com.sun.net.httpserver.HttpHandler =
    safe(ex => respond(ex, get(queryParams(ex))))

  private def safe(f: HttpExchange => Unit): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) => {
      // Multi-user fairness: each server thread submits its Spark jobs
      // into its own scheduler pool, so under spark.scheduler.mode=FAIR
      // (set by HttpMain) one user's heavy aggregation time-slices
      // against everyone else's dashboard clicks instead of queueing them
      // behind it (FIFO would run them strictly in arrival order). Pools
      // are created on demand; thread-pool size bounds the pool count.
      // Local properties are per-thread and threads are reused — always
      // reset in finally.
      val sc = org.apache.spark.sql.SparkSession.getDefaultSession
        .map(_.sparkContext)
      sc.foreach(_.setLocalProperty("spark.scheduler.pool",
        s"graft-req-${Thread.currentThread().getId}"))
      try f(ex)
      catch {
        case e: Throwable =>
          val msg = MiniJson.render(Map("detail" -> String.valueOf(e.getMessage)))
          send(ex, 500, msg)
      } finally sc.foreach(_.setLocalProperty("spark.scheduler.pool", null))
    }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).fold(Map.empty[String, String]) { q =>
      q.split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, UTF_8) ->
          java.net.URLDecoder.decode(v, UTF_8)
      }.toMap
    }

  /** The reference's response envelope; rows serialized plan-side. The
    * server never materializes more than `maxRows` (+1 to detect overflow) —
    * an endpoint whose query exceeds the cap returns the first `maxRows`
    * with `"truncated": true` instead of buffering an unbounded frame. */
  private def respond(ex: HttpExchange, df: DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val t0 = System.nanoTime()
    val rows = df
      .select(to_json(struct(df.columns.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .limit(maxRows + 1)
      .collect().map(_.getString(0))
    val truncated = rows.length > maxRows
    val out = if (truncated) rows.take(maxRows) else rows
    val ms = (System.nanoTime() - t0) / 1000000L
    val json = "{\"data\":" + out.mkString("[", ",", "]") +
      ",\"row_count\":" + out.length +
      (if (truncated) ",\"truncated\":true" else "") +
      ",\"query_time_ms\":" + ms + "}"
    send(ex, 200, json)
  }

  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
