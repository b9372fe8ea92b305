package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-input hardening: every operator family must survive empty
  * and single-row frames without throwing — the shapes a real pipeline
  * hits on a fresh partition, an over-tight filter, or a cold start. */
class EmptyInputSpec extends SparkSuite {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  private def oneDoc: DataFrame =
    Seq((1L, "hello world hello", "a")).toDF("doc_id", "text", "source")
  private def emptySeries: DataFrame =
    Seq.empty[(String, Long, Long)].toDF("k", "b", "n")

  test("dedup family: empty and single-row inputs") {
    assert(graft.operators.ExactDedup(emptyDocs).count() == 0L)
    assert(graft.operators.ExactDedup(oneDoc).count() == 1L)
    assert(graft.operators.MinHashDedup
      .clusters(oneDoc, "doc_id", "text", k = 3, numHashes = 16, bands = 4)
      .count() <= 1L)
  }

  test("time-series family: empty and single-row series") {
    assert(graft.operators.TimeSeries
      .autocorr(emptySeries, "k", "b", "n").count() == 0L)
    val one = Seq(("k", 1L, 5L)).toDF("k", "b", "n")
    // a 1-row series has no lag pairs at all
    assert(graft.operators.TimeSeries.autocorr(one, "k", "b", "n")
      .count() == 0L)
    assert(graft.operators.TimeSeries
      .ewmaDyadic(one, "k", "b", "n", depth = 4).count() == 1L)
    assert(graft.operators.TimeSeries
      .rollingMedianX2(one, "k", "b", "n").head().getLong(3) == 10L)
    assert(graft.operators.TimeSeries
      .interpolateLinear(emptySeries.withColumn("v", lit(1.0)),
        "k", Seq(col("b").asc), "v").count() == 0L)
  }

  test("audit family: empty inputs yield empty or zeroed reports") {
    val e = emptyDocs.select(col("source").as("a"), col("text").as("b"))
    val k = graft.operators.Audit.cohenKappa(e, "a", "b").head()
    assert(k.getAs[Long]("n") == 0L) // kappa itself undefined: null cell
    assert(k.isNullAt(k.fieldIndex("kappa_e6")))
    val ri = graft.operators.Audit.refIntegrity(Seq(
      ("x", emptyDocs.select(col("doc_id")), "doc_id",
        oneDoc.select(col("doc_id")), "doc_id"))).head()
    assert(ri.getAs[Long]("n_child_rows") == 0L &&
      ri.getAs[Long]("n_orphan_rows") == 0L)
  }

  test("normalizers: empty and degenerate groups") {
    val e = Seq.empty[(String, Option[Double])].toDF("g", "v")
    assert(graft.operators.GroupNormalizer.zscore(e, "g", "v").count() == 0L)
    assert(graft.operators.GroupNormalizer.robustScale(e, "g", "v")
      .count() == 0L)
    // all-equal group: sigma = IQR = 0 -> 0.0, not NaN
    val const = Seq(("g", Some(2.0)), ("g", Some(2.0))).toDF("g", "v")
    assert(graft.operators.GroupNormalizer.robustScale(const, "g", "v")
      .select("r").collect().forall(_.getDouble(0) == 0.0))
  }

  test("graph family: empty edge lists") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.PageRank.degreeStats(e, "src", "dst")
      .count() == 0L)
    assert(graft.operators.PageRank.triangleCount(e, "src", "dst")
      .head().getLong(0) == 0L)
  }

  test("corpus stats: single-doc corpus") {
    val card = graft.operators.CorpusStats
      .corpusCard(oneDoc, "text", Seq("source"))
    assert(card.count() == 1L)
    val terms = graft.operators.CorpusStats
      .sliceEntropyTermsE15(oneDoc, "source", "doc_id")
    // single category: p = 1, ln(1) = 0 -> zero entropy term
    assert(terms.head().getAs[Long]("tm_e15") == 0L)
  }

  test("graph family (r5): empty edges / empty seeds / empty deltas " +
      "degrade cleanly") {
    val verts = Seq(1L, 2L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    // BFS with no edges: seeds at 0, the rest unreachable
    val d = graft.operators.Bfs.distances(verts, "id", noEdges,
      "src", "dst", Seq(1L).toDF("id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(d == Map(1L -> 0L, 2L -> -1L))
    // BFS with no seeds: everything unreachable
    assert(graft.operators.Bfs.distances(verts, "id", noEdges, "src",
      "dst", Seq.empty[Long].toDF("id")).where(col("dist").isNotNull)
      .count() == 0L)
    // k-core of an edgeless graph is empty for any k >= 1
    assert(graft.operators.KCore.core(verts, "id", noEdges,
      "src", "dst", k = 1).count() == 0L)
    // IVM with empty deltas: the view delta is empty
    val a = Seq((1L, "x")).toDF("k", "va")
    val b = Seq((1L, "y")).toDF("k", "vb")
    val ea = Seq.empty[(Long, String)].toDF("k", "va")
    val eb = Seq.empty[(Long, String)].toDF("k", "vb")
    assert(graft.operators.IncrementalJoin
      .appendDelta(a, ea, b, eb, Seq("k")).count() == 0L)
    // trustRank: seeds that miss the graph entirely must fail loudly,
    // not silently emit a zero vector
    intercept[IllegalArgumentException] {
      graft.operators.PageRank.trustRank(
        Seq((1L, 2L)).toDF("src", "dst"), "src", "dst",
        Seq(99L).toDF("id"), "id")
    }
  }

  test("incremental-state family (r5b): empty CDC batches are identity; " +
      "empty event streams yield no training pairs") {
    val st = graft.operators.IncrementalAgg.update(None,
      Seq(("k", 1.0), ("k", 2.0)).toDF("k", "v"), Seq("k"), "v")
    val e = Seq.empty[(String, Double)].toDF("k", "v")
    val after = graft.operators.IncrementalAgg.updateCdc(
      st, e, e, Seq("k"), "v")
    assert(rowsOf(after.orderBy("k")) == rowsOf(st.orderBy("k")))
    // a CDC feed against an EMPTY state is just the insert aggregate
    val empty = st.filter(lit(false))
    val fresh = graft.operators.IncrementalAgg.updateCdc(empty,
      Seq(("k", 3.0)).toDF("k", "v"), e, Seq("k"), "v").collect()
    assert(fresh.length == 1 && fresh.head.getLong(1) == 1L)
    // no events → no pairs; single event per user → no pairs
    val noEv = Seq.empty[(Long, Long, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(graft.operators.TrainingExamples.nextEventPairs(
      noEv, "user_id", "ts", "event_id", "event_type", 3).count() == 0L)
    val oneEv = Seq((1L, 1L, 1L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(graft.operators.TrainingExamples.nextEventPairs(
      oneEv, "user_id", "ts", "event_id", "event_type", 3).count() == 0L)
  }

  test("round-5 third wave: empty / single-row / degenerate inputs") {
    // components: no edges → every vertex its own cluster; empty both
    val verts = Seq(1L, 2L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("s", "d")
    val lbl = graft.operators.Components
      .labels(verts, "id", noEdges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl == Map(1L -> 1L, 2L -> 2L))
    assert(graft.operators.Components.labels(verts.filter(lit(false)),
      "id", noEdges, "s", "d").count() == 0L)
    // seasonal decomposition / change point / anomalies on tiny series
    val ts1 = Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"),
      5.0)).toDF("k", "ts", "v")
    val dec = graft.operators.TimeSeries
      .seasonalDecompose(ts1, "k", "ts", "v").head()
    assert(dec.isNullAt(dec.fieldIndex("trend_e6"))) // no full frame
    assert(graft.operators.TimeSeries.changePoint(ts1, "k", "ts", "v")
      .count() == 0L) // one bucket: no admissible split
    assert(graft.operators.TimeSeries
      .seasonalAnomalies(ts1, "k", "ts", "v").count() == 0L ||
      !graft.operators.TimeSeries.seasonalAnomalies(ts1, "k", "ts", "v")
        .head().getAs[Boolean]("is_anomaly"))
    // quantile map: empty reference group → no mapped rows (inner join)
    val qm = graft.operators.GroupNormalizer.quantileMap(
      Seq(("a", 1L, 1.0)).toDF("g", "id", "v"), "g", "v", "id",
      refGroup = "missing")
    assert(qm.count() == 0L)
    // KMV: one empty sketch — estimates stay defined (exhaustive mode)
    val skA = graft.functions.Sketches.kmvBottomK(
      Seq(("a", 1L), ("a", 2L)).toDF("seg", "m"), "seg", "m", k = 8)
    val skB = skA.filter(lit(false))
    val cmp = graft.functions.Sketches.kmvCompare(skA, skB, k = 8).head()
    assert(cmp.getAs[Long]("joint") == 0L &&
      cmp.getAs[Long]("union_est") == 2L, s"got $cmp")
    // ranking metrics: approx with zero hits → all-zero metrics
    val truth = Seq((1L, "A", 1)).toDF("qid", "doc", "rank")
    val approx = Seq((1L, "Z", 1)).toDF("qid", "doc", "rank")
    val rm = graft.functions.Ranking
      .rankingMetrics(approx, truth, "qid", "doc", "rank").head()
    assert(rm.getAs[Long]("n_hits") == 0L &&
      rm.getAs[Long]("recall_e4") == 0L &&
      rm.getAs[Long]("mrr_e6") == 0L && rm.getAs[Long]("ndcg_e4") == 0L)
    // t-closeness: single group == global distribution → TVD 0
    val tc = graft.operators.Audit.tClosenessRisk(
      Seq(("g", "x"), ("g", "y")).toDF("q", "s"), Seq("q"), "s").head()
    assert(tc.getAs[Long]("tvd_e6") == 0L)
    // target encode: all-null targets → null encodings, rows kept
    val te = graft.functions.Featurize.targetEncode(
      Seq(("a", null.asInstanceOf[java.lang.Double]))
        .toDF("cat", "y"), "cat", "y")
    assert(te.count() == 1L && te.head().isNullAt(2))
    // novelty: empty corpus
    assert(graft.operators.CorpusStats.ngramNovelty(
      emptyDocs, "doc_id", "text").count() == 0L)
  }
}
