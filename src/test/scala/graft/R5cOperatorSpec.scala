package graft

import org.apache.spark.sql.functions._
import graft.functions.{Sketches, TextFunctions}
import graft.operators.{Components, GroupNormalizer, TimeSeries}

/** Known-answer properties for the round-5 third wave: standalone
  * connected components (large-star/small-star contraction), additive
  * seasonal decomposition, single change-point detection, quantile
  * mapping, KMV sketch algebra and the encoding-anomaly census. The
  * oracle gates prove cross-engine agreement; these pin the MATH on tiny
  * inputs — including the long-chain graph shape whose O(diameter)
  * convergence star contraction exists to kill. */
class R5cOperatorSpec extends SparkSuite {
  import spark.implicits._

  test("components: 400-vertex chain converges well under 30 rounds") {
    // a path graph is the worst case for plain min-label propagation
    // (eccentricity 399); star contraction must close it in O(log n)
    val n = 400
    val verts = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("src", "dst")
    val lbl = Components.labels(verts, "id", edges, "src", "dst",
      maxIters = 30)
    val distinct = lbl.select(col("cluster")).distinct().collect()
    assert(distinct.length == 1 && distinct.head.getLong(0) == 0L,
      "one component labeled by the min vertex")
  }

  test("components: star contraction labels a multi-component graph") {
    val verts = (0L to 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 8L))
      .toDF("src", "dst") // self-loop ignored; 0,4,7,8,9 isolated
    val got = Components.labels(verts, "id", edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 9L)
    assert(got == want, s"got $got")
  }

  test("seasonalDecompose: pure seasonal signal is fully explained") {
    // value depends only on hour-of-day (a+0/1 alternation by hour over
    // 6 days); with halfWidth=12 the 25-bucket MA straddles a bit over a
    // day, but on a 2-periodic signal every full frame averages 13 highs
    // + 12 lows or vice versa
    val rows = for (d <- 1 to 6; h <- 0 to 23) yield
      ("k", java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:30:00"),
        if (h % 2 == 0) 10.0 else 20.0)
    val out = TimeSeries.seasonalDecompose(
      rows.toDF("k", "ts", "v"), "k", "ts", "v", halfWidth = 12)
    val full = out.filter(col("resid_e6").isNotNull)
    assert(full.count() > 0, "interior buckets must have a full frame")
    // residual = y - trend - seasonal; on a perfectly periodic signal the
    // decomposition reconstructs y up to the ±1-bucket MA asymmetry
    // (odd-width frame on an even-period signal) — residual ≤ 0.4 units
    val maxAbs = full.agg(max(abs(col("resid_e6")))).head().getLong(0)
    assert(maxAbs <= 400000L, s"residual too large: $maxAbs micro-units")
    // edges are honest: first/last 12 buckets carry NULL trend
    assert(out.filter(col("trend_e6").isNull).count() == 24L)
  }

  test("changePoint finds an engineered level shift") {
    // 30 buckets at ~5.0 then 30 at ~50.0 with tiny jitter
    val rows = (1 to 60).map { i =>
      val base = if (i <= 30) 5.0 else 50.0
      ("k", java.sql.Timestamp.valueOf(f"2024-01-01 ${0}%02d:00:00")
        .toLocalDateTime.plusHours(i.toLong),
        base + (i % 3) * 0.01)
    }.map { case (k, t, v) => (k, java.sql.Timestamp.valueOf(t), v) }
    val out = TimeSeries.changePoint(rows.toDF("k", "ts", "v"),
      "k", "ts", "v").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_left") == 30L && r.getAs[Long]("n_right") == 30L,
      s"split at the engineered boundary: $r")
    assert(math.abs(r.getAs[Double]("mean_left") - 5.01) < 0.02)
    assert(math.abs(r.getAs[Double]("mean_right") - 50.01) < 0.02)
  }

  test("changePoint tie-break picks the earliest split") {
    // two identical candidate splits: 1,1,2,2 — t=2 and (by symmetry of
    // the score) no later candidate beats it; constant-pair layout makes
    // t=2 the unique argmax, then 1,1,1,3 makes t=3 unique. The guarded
    // case: ALL-equal series — every score 0, earliest t wins.
    val rows = (1 to 6).map(i =>
      ("k", java.sql.Timestamp.valueOf(f"2024-01-01 0$i:00:00"), 7.0))
    val out = TimeSeries.changePoint(rows.toDF("k", "ts", "v"),
      "k", "ts", "v").collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_left") == 1L,
      s"constant series: earliest split by tie-break, got ${out.toSeq}")
  }

  test("quantileMap: integer rank mapping onto the reference group") {
    val rows = Seq(("a", 1L, 3.0), ("a", 2L, 1.0), ("a", 3L, 7.0),
        ("a", 4L, 5.0)) ++
      (1 to 8).map(i => ("r", 100L + i, i * 10.0))
    val out = GroupNormalizer.quantileMap(
      rows.toDF("g", "id", "v"), "g", "v", "id", refGroup = "r")
    // m=4, mref=8: rank k maps to ref rank ⌈8k/4⌉ = 2k → 20,40,60,80
    val a = out.filter(col("g") === "a").collect()
      .map(r => r.getAs[Double]("v") -> r.getAs[Double]("mapped")).toMap
    assert(a == Map(1.0 -> 20.0, 3.0 -> 40.0, 5.0 -> 60.0, 7.0 -> 80.0),
      s"got $a")
    // the reference group maps to itself (k → ⌈8k/8⌉ = k)
    val selfMapped = out.filter(col("g") === "r")
      .filter(col("v") =!= col("mapped")).count()
    assert(selfMapped == 0L)
  }

  test("kmv: exhaustive sketches give exact algebra, partial estimate") {
    // exhaustive: |A∪B| = 75 < k → pool IS the union, all numbers exact
    val small = ((0 to 49).map(i => ("a", i.toLong)) ++
      (25 to 74).map(i => ("b", i.toLong))).toDF("seg", "m")
    val sk = Sketches.kmvBottomK(small, "seg", "m", k = 128)
    val ex = Sketches.kmvCompare(sk.filter(col("seg") === "a"),
      sk.filter(col("seg") === "b"), k = 128).head()
    assert(ex.getAs[Long]("pool_size") == 75L &&
      ex.getAs[Long]("joint") == 25L &&
      ex.getAs[Long]("union_est") == 75L &&
      ex.getAs[Long]("inter_est") == 25L, s"exact mode: $ex")
    // estimating: 1500-union, k=256 — Jaccard 1/3, union within ~4σ
    val big = ((0 to 999).map(i => ("a", i.toLong)) ++
      (500 to 1499).map(i => ("b", i.toLong))).toDF("seg", "m")
    val skb = Sketches.kmvBottomK(big, "seg", "m", k = 256)
    val est = Sketches.kmvCompare(skb.filter(col("seg") === "a"),
      skb.filter(col("seg") === "b"), k = 256).head()
    val jacc = est.getAs[Long]("jaccard_e4") / 10000.0
    assert(math.abs(jacc - 1.0 / 3) < 0.12, s"jaccard: $est")
    assert(math.abs(est.getAs[Long]("union_est") - 1500L) < 380,
      s"union: $est")
  }

  test("ngramNovelty: first containing doc owns the shingle") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"),
      (4L, "hi")).toDF("doc_id", "text")
    val got = graft.operators.CorpusStats
      .ngramNovelty(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 2L, 10000L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((2L, 0L, 0L)), s"dup doc2: ${got(2L)}")
    assert(got(3L) == ((2L, 2L, 10000L)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((0L, 0L, -1L)), s"short doc: ${got(4L)}")
  }

  test("seasonalAnomalies flags an injected spike, not the daily shape") {
    val rows = for (d <- 1 to 6; h <- 0 to 23) yield {
      val base = if (h % 2 == 0) 10.0 else 20.0
      val v = if (d == 3 && h == 12) base + 500.0 else base
      ("k", java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:30:00"), v)
    }
    val out = graft.operators.TimeSeries.seasonalAnomalies(
      rows.toDF("k", "ts", "v"), "k", "ts", "v", halfWidth = 12)
    val flagged = out.filter(col("is_anomaly"))
      .select(date_format(col("bucket"), "yyyy-MM-dd HH").as("b"))
      .collect().map(_.getString(0)).toSet
    assert(flagged.contains("2024-01-03 12"), s"spike missed: $flagged")
    // the periodic shape itself must not page: only the spike's MA
    // neighborhood may co-flag
    assert(flagged.size <= 6, s"too many flags: $flagged")
  }

  test("zoneMapReport: clustered files depth 1, overlapping files depth n") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zm").toString
    val vals = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    vals.repartitionByRange(4, col("v"))
      .write.mode("overwrite").parquet(s"$tmp/clustered")
    vals.repartition(4, col("id"))
      .write.mode("overwrite").parquet(s"$tmp/scattered")
    val c = graft.io.LayoutStats.zoneMapReport(spark, s"$tmp/clustered", "v")
      .head()
    val sct = graft.io.LayoutStats.zoneMapReport(spark, s"$tmp/scattered", "v")
      .head()
    assert(c.getAs[Long]("n_files") == 4L &&
      c.getAs[Long]("max_depth") == 1L, s"clustered: $c")
    assert(sct.getAs[Long]("n_files") == 4L &&
      sct.getAs[Long]("max_depth") == 4L, s"scattered: $sct")
  }

  test("rankingMetrics: hand-computed recall/MRR/nDCG") {
    val truth = Seq((1L, "A", 1), (1L, "B", 2), (1L, "C", 3))
      .toDF("qid", "doc", "rank")
    val approx = Seq((1L, "B", 1), (1L, "X", 2), (1L, "A", 3))
      .toDF("qid", "doc", "rank")
    val r = graft.functions.Ranking
      .rankingMetrics(approx, truth, "qid", "doc", "rank").head()
    assert(r.getAs[Long]("n_hits") == 2L)
    assert(r.getAs[Long]("recall_e4") == 6666L, s"recall: $r")
    assert(r.getAs[Long]("mrr_e6") == 1000000L, s"mrr: $r")
    // dcg = 1e12//1e6 + 1e12//2e6 = 1_500_000;
    // idcg = 1e6 + 1e12//1584963 + 5e5 = 2_130_929 → ndcg_e4 = 7039
    assert(r.getAs[Long]("ndcg_e4") == 7039L, s"ndcg: $r")
  }

  test("targetEncode: leave-one-out with smoothing, singleton = prior") {
    val df = Seq((1L, "A", 1.0), (2L, "A", 3.0), (3L, "B", 5.0))
      .toDF("id", "cat", "y")
    // μ = 3; m=1: enc(A,1)=(4−1+3)/2=3, enc(A,3)=(4−3+3)/2=2, enc(B,5)=μ=3
    val got = graft.functions.Featurize
      .targetEncode(df, "cat", "y", m = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("enc"))
      .toMap
    assert(got == Map(1L -> 3.0, 2L -> 2.0, 3L -> 3.0), s"got $got")
  }

  test("temporalSplitReport: counts per side + entity leakage") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-10 00:00:00")), // u1 train
      (1L, ts("2024-01-26 00:00:00")), // u1 test → leaky
      (2L, ts("2024-01-11 00:00:00")), // u2 train only
      (3L, ts("2024-01-27 00:00:00")), // u3 test only
      (2L, ts("2024-01-24 12:00:00"))  // u2 embargo row
    ).toDF("user_id", "ts")
    val r = graft.operators.TrainingExamples.temporalSplitReport(
      ev, "ts", "user_id", "2024-01-25 00:00:00", gapHours = 24).head()
    assert(r.getAs[Long]("n_train") == 2L &&
      r.getAs[Long]("n_embargo") == 1L && r.getAs[Long]("n_test") == 2L,
      s"counts: $r")
    assert(r.getAs[Long]("n_leaky_users") == 1L, s"leak: $r")
  }

  test("tClosenessRisk: hand-computed total-variation distance") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "b"), ("g2", "b"), ("g2", "b")).toDF("q", "s")
    // global a:2 b:4 over 6; both groups sit at TVD = 1/3 → 333333 e6
    val got = graft.operators.Audit.tClosenessRisk(df, Seq("q"), "s")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("tvd_e6")).toMap
    assert(got == Map("g1" -> 333333L, "g2" -> 333333L), s"got $got")
  }

  test("rollingOriginFolds: expanding train, fixed horizon, embargoed") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(ts("2024-01-01 05:00:00"), // train for both folds
      ts("2024-01-02 12:00:00"), // embargoed f0 (gap 24 h); train f1
      ts("2024-01-03 06:00:00"), // test f0 ([01-03, 01-05)); train f1
                                 // (f1 gap starts 01-04)
      ts("2024-01-05 01:00:00")  // outside f0 horizon; test f1
    ).map(t => Tuple1(t)).toDF("ts")
    val got = graft.operators.TrainingExamples.rollingOriginFolds(
      ev, "ts", "2024-01-03 00:00:00", stepHours = 48, horizonHours = 48,
      gapHours = 24, nFolds = 2)
      .collect().map(r => r.getAs[Int]("fold") ->
        ((r.getAs[Long]("n_train"), r.getAs[Long]("n_test")))).toMap
    assert(got == Map(0 -> ((1L, 1L)), 1 -> ((3L, 1L))), s"got $got")
  }

  test("eventPaths: trailing trigram counts with total-order cut") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 01:00:00"), 10L, "a"),
      (2L, ts("2024-01-01 02:00:00"), 10L, "b"),
      (3L, ts("2024-01-01 03:00:00"), 10L, "c"),
      (4L, ts("2024-01-01 04:00:00"), 10L, "b"),
      (5L, ts("2024-01-01 05:00:00"), 10L, "c"),
      (6L, ts("2024-01-01 01:00:00"), 20L, "a"),
      (7L, ts("2024-01-01 02:00:00"), 20L, "b"),
      (8L, ts("2024-01-01 03:00:00"), 20L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.operators.TrainingExamples.eventPaths(
      ev, "user_id", "ts", "event_id", "event_type", depth = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // user 10: a>b>c, b>c>b, c>b>c; user 20: a>b>c
    assert(got == Map("a>b>c" -> 2L, "b>c>b" -> 1L, "c>b>c" -> 1L),
      s"got $got")
  }

  test("contentChunks: boundaries survive a prefix shift") {
    val base = (1 to 120).map(i => s"w${i % 37}x$i").mkString(" ")
    val docs = Seq((1L, base),
      (2L, "totally fresh preamble tokens " + base)).toDF("doc_id", "text")
    val rep = graft.operators.SubstrDedup
      .chunkDupReport(docs, "doc_id", "text", k = 8, modulus = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks")))).toMap
    // content-defined cuts re-align after the seam: at most the chunks
    // touching the injected preamble can differ
    val (n1, d1) = rep(1L); val (n2, d2) = rep(2L)
    assert(d1 >= n1 - 2 && d1 > 0, s"doc1 $rep")
    assert(d2 >= n2 - 2 && d2 > 0, s"doc2 $rep")
  }

  test("ksByGroup: engineered shift drifts, identical halves do not") {
    val stable = (1 to 100).flatMap(i =>
      Seq(("s", false, i.toDouble), ("s", true, i.toDouble)))
    val shifted = (1 to 100).map(i => ("d", false, i.toDouble)) ++
      (1 to 100).map(i => ("d", true, 100.0 + i))
    val got = graft.operators.Audit.ksByGroup(
      (stable ++ shifted).toDF("g", "late", "v"), "g", "late", "v",
      thresholdE6 = 500000L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("ks_e6"), r.getAs[Boolean]("drifted")))).toMap
    assert(got("s") == ((0L, false)), s"stable: $got")
    assert(got("d") == ((1000000L, true)), s"shifted: $got")
  }

  test("encodingAnomalies counts each artifact class") {
    val rows = Seq(
      (1L, "clean ascii text"),
      (2L, "bad caf\u00C3\u00A9 twice caf\u00C3\u00A9"),
      (3L, "lost\uFFFD and\uFFFD and\uFFFD"),
      (4L, "c1 control:\u0085here"),
      (5L, "dash \u00E2\u0080\u0094 artifact")).toDF("id", "t")
    val out = rows.select(col("id"),
        TextFunctions.encodingAnomalies(col("t")).as("e"))
      .select(col("id"), col("e.n_replacement"), col("e.n_c1"),
        col("e.n_suspect"), col("e.suspect_encoding"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((0L, 0L, 0L, false)), s"clean: ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 2L, true)), s"latin1: ${out(2L)}")
    assert(out(3L) == ((3L, 0L, 0L, true)), s"fffd: ${out(3L)}")
    assert(out(4L) == ((0L, 1L, 0L, true)), s"c1: ${out(4L)}")
    // â (U+00E2) counts as suspect; U+0080/U+0094 are C1 controls
    assert(out(5L) == ((0L, 2L, 1L, true)), s"dash: ${out(5L)}")
  }
}
