package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev helper (r13 optimization round): time SUB-STAGES of the expensive
  * gates in isolation under the exact Bench session config, so the numbers
  * point at the operator piece that owns the wall-clock (guide §1: measure
  * first, empirical loop). Each probe runs the stage to a noop sink with a
  * job description label. Not part of any gate; safe to run ad hoc:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.ProbeR13 <probe...>"
  */
object ProbeR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-r13")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm exactly like Bench
    SparkEntry.queries.get("q_agg_metrics")
      .foreach(q => q(spark, sfDir).write.format("noop").mode("overwrite").save())

    def t(name: String)(mk: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache()
    }
    def tEager(name: String)(run: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      run
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache()
    }

    def tbl(name: String): DataFrame = graft.core.Tables.table(spark, sfDir, name)

    val probes: Map[String, () => Unit] = Map(
      "baskets" -> (() => {
        val events = tbl("events")
        def sessionized = graft.core.Rebalance.computeDense(events)
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(collect_set(col("event_type")).as("_items"))
          .select(concat(col("user_id"), lit("#"),
            date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss")).as("basket"),
            explode(col("_items")).as("item"))
        t("baskets: sessionize+explode only")(sessionized)
        t("baskets: sessionize warm 2nd run")(sessionized)
        t("baskets: items distinct only")(sessionized.distinct())
        t("baskets: full gate") {
          SparkEntry.queries("q_session_baskets")(spark, sfDir)
        }
        t("baskets: full gate warm 2nd run") {
          SparkEntry.queries("q_session_baskets")(spark, sfDir)
        }
      }),
      "rrf" -> (() => {
        import graft.functions.{TextFunctions => TF, Ranking}
        val docs = tbl("documents")
        t("rrf: qualityScore scan only") {
          docs.select(col("doc_id"), TF.qualityScore(col("text")).as("q"),
            col("n_chars"))
        }
        t("rrf: one boundedRank") {
          val scored = docs.select(col("doc_id"),
            TF.qualityScore(col("text")).as("q"), col("n_chars"))
          Ranking.boundedRank(scored, Seq(col("q").desc, col("doc_id").asc), 100)
        }
        t("rrf: full gate") {
          SparkEntry.queries("q_rrf")(spark, sfDir)
        }
      }),
      "pmi" -> (() => {
        val docs = tbl("documents")
        val words = docs.select(col("doc_id").as("_id"),
          posexplode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")),
            " ")).as(Seq("pos", "w")))
        t("pmi: words explode only")(words)
        t("pmi: unigram counts") {
          words.groupBy(col("w")).agg(count(lit(1)).as("cw"))
        }
        t("pmi: pair join+count") {
          words.select(col("_id"), col("pos"), col("w").as("wa"))
            .withColumn("_k", explode(array((1 to 2).map(lit(_)): _*)))
            .select(col("_id"), (col("pos") + col("_k")).as("_pos2"), col("wa"))
            .join(words.select(col("_id"), col("pos").as("_pos2"),
              col("w").as("wb")), Seq("_id", "_pos2"))
            .groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("cab"))
            .orderBy(col("cab").desc, col("wa").asc, col("wb").asc)
            .limit(100)
        }
        t("pmi: full gate") {
          SparkEntry.queries("q_word_pmi")(spark, sfDir)
        }
      }),
      "parts" -> (() => {
        for (tn <- Seq("lineitem", "events", "documents", "orders")) {
          val df = tbl(tn)
          val proj = df.select(df.columns.take(4).map(col): _*)
          val before = proj.rdd.getNumPartitions
          val after = graft.core.Rebalance.computeDense(proj)
            .rdd.getNumPartitions
          val stats = proj.queryExecution.optimizedPlan.stats.sizeInBytes
          println(s"[probe] parts $tn: before=$before after=$after " +
            s"statsBytes=$stats")
        }
      }),
      "corr" -> (() => {
        import org.apache.spark.sql.types.{DecimalType, DoubleType}
        val li = tbl("lineitem")
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val complete = li.filter(cols.map(col(_).isNotNull).reduce(_ && _))
        def dsum(c: org.apache.spark.sql.Column, n: String) =
          sum(c.cast(DecimalType(38, 10))).cast(DoubleType).as(n)
        val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (i, j)
        val aggsDec =
          cols.zipWithIndex.map { case (c, i) => dsum(col(c), s"_s$i") } ++
          cols.zipWithIndex.map { case (c, i) => dsum(col(c) * col(c), s"_q$i") } ++
          pairs.map { case (i, j) => dsum(col(cols(i)) * col(cols(j)), s"_p${i}_$j") } :+
          count(lit(1)).cast(DoubleType).as("_n")
        tEager("corr: decimal agg head()") {
          complete.agg(aggsDec.head, aggsDec.tail: _*).head()
        }
        def lsum(c: org.apache.spark.sql.Column, n: String) =
          sum(c).as(n)
        val aggsDbl =
          cols.zipWithIndex.map { case (c, i) => lsum(col(c), s"_s$i") } ++
          cols.zipWithIndex.map { case (c, i) => lsum(col(c) * col(c), s"_q$i") } ++
          pairs.map { case (i, j) => lsum(col(cols(i)) * col(cols(j)), s"_p${i}_$j") } :+
          count(lit(1)).as("_n")
        tEager("corr: plain double agg head()") {
          complete.agg(aggsDbl.head, aggsDbl.tail: _*).head()
        }
        t("corr: full gate") {
          SparkEntry.queries("q_corr_matrix")(spark, sfDir)
        }
      }),
      "profile" -> (() => {
        val li = tbl("lineitem")
        val cols = li.columns.toSeq
        tEager("profile: distinctCounts only") {
          graft.query.QueryService.distinctCounts(li, cols).collect()
        }
        t("profile: full gate") {
          SparkEntry.queries("q_profile_table")(spark, sfDir)
        }
      }),
      "fuzzy" -> (() => {
        val docs = tbl("documents").select(col("doc_id"), col("text"))
        val variants = docs.select((col("doc_id") + 100000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
        val all = docs.unionByName(variants)
        t("fuzzy: shingles build only") {
          graft.core.Rebalance.computeDense(all).select(col("doc_id"),
            graft.operators.MinHashDedup.shingles(col("text"), 3).as("_sh"))
        }
        t("fuzzy: verified pairs") {
          val sh = graft.core.Rebalance.computeDense(all).select(col("doc_id"),
            graft.operators.MinHashDedup.shingles(col("text"), 3).as("_sh"))
          graft.operators.SetSimJoin.jaccardSelfJoin(sh, "doc_id", "_sh", 0.8)
        }
        t("fuzzy: full gate") {
          SparkEntry.queries("q_doc_fuzzy_keep")(spark, sfDir)
        }
        t("incr neardup: full gate") {
          SparkEntry.queries("q_doc_incremental_neardup")(spark, sfDir)
        }
      }),
      "schema" -> (() => {
        import org.apache.spark.sql.types.StringType
        val df = tbl("events").select(
          col("event_id").cast(StringType).as("id_str"),
          col("event_type"),
          col("value").cast(StringType).as("value_str"),
          date_format(col("ts"), "yyyy-MM-dd").as("day_str"))
        val fields = Seq("id_str", "event_type", "value_str", "day_str")
        tEager("schema: profile (current impl)") {
          graft.operators.SchemaInferrer.profile(df, fields).collect()
        }
        tEager("schema: profile 2nd run") {
          graft.operators.SchemaInferrer.profile(df, fields).collect()
        }
        t("schema: full gate") {
          SparkEntry.queries("q_schema_infer")(spark, sfDir)
        }
      }),
      "stage" -> (() => {
        // would a StageOnce-shared shingle build pay for q_doc_fuzzy_keep /
        // q_doc_incremental_neardup? Cost of staging = write + read-back of
        // the per-doc sorted shingle arrays vs the ~1.2 s kernel recompute
        val docs = tbl("documents").select(col("doc_id"), col("text"))
        val sh = graft.core.Rebalance.computeDense(docs).select(col("doc_id"),
          array_sort(graft.operators.MinHashDedup.shingles(col("text"), 3))
            .as("_sh"))
        tEager("stage: write shingle parquet") {
          sh.write.mode("overwrite").parquet("/tmp/graft_probe_stage_sh")
        }
        t("stage: read staged shingles back") {
          spark.read.parquet("/tmp/graft_probe_stage_sh")
        }
        t("stage: recompute kernel instead")(sh)
      }),
      "substr" -> (() => {
        val docs = tbl("documents")
        t("substr: windows only") {
          graft.operators.SubstrDedup.windows(docs, "doc_id", "text", 12)
        }
        t("substr: full removeSpans") {
          graft.operators.SubstrDedup.removeSpans(docs, "doc_id", "text", 12)
        }
      })
    )
    val run = if (args.isEmpty) probes.keys.toSeq.sorted else args.toSeq
    run.foreach(p => probes(p)())
    spark.stop()
  }
}
