package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: the driver-local BPE merge loop at a realistic
  * merge count, and its aux/merge parity with the distributed twin.
  */
class R5OperatorSpec extends SparkSuite {

  test("Bpe.train: 1000 merges on sf0.01 completes in under 60 s " +
      "(driver-local incremental loop, one corpus scan)") {
    val docs = graft.core.Tables.table(spark, "/root/testdata/sf0.01",
      "documents").select(col("text"))
    val t0 = System.nanoTime()
    val merges = graft.functions.Bpe.train(docs, "text", numMerges = 1000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.nonEmpty)
    // monotone non-increasing merge frequency is not guaranteed by BPE in
    // general, but the round index must be dense and ordered
    assert(merges.map(_.round) == merges.indices)
    assert(secs < 60.0, f"1000-merge train took $secs%.1f s")
  }

  test("cohenKappa: degenerate single-constant-label input yields NULL " +
      "kappa (0/0 chance-agreement), never NaN→0") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "a"), ("a", "a")).toDF("x", "y")
    val r = graft.operators.Audit.cohenKappa(df, "x", "y").collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 3L)       // n
    assert(r.head.getLong(1) == 3L)       // n_agree
    assert(r.head.isNullAt(2), "kappa must be NULL on zero denominator")
    // non-degenerate twin still produces a value
    val ok = Seq(("a", "a"), ("b", "b"), ("a", "b")).toDF("x", "y")
    val r2 = graft.operators.Audit.cohenKappa(ok, "x", "y").collect()
    assert(!r2.head.isNullAt(2))
  }

  test("autocorr: high-magnitude series stays exact (decimal path) where " +
      "plain Long n²-scaling would wrap") {
    import spark.implicits._
    // |x| ~ 2^31 over 64 points: n²·Σx² ≈ 4096 · 64 · 2^62 ≈ 2^80 —
    // far past Long but comfortably inside DecimalType(38,0)
    val big = (0 until 64).map(i =>
      ("k", i, (if (i % 2 == 0) 1L else -1L) * 2147480000L))
      .toDF("key", "bucket", "v")
    val r = graft.operators.TimeSeries.autocorr(big, "key", "bucket", "v",
      maxLag = 1).collect()
    assert(r.length == 1)
    // alternating ±c series: lag-1 autocorrelation ≈ −1 (finite-n
    // estimator bias keeps it slightly above); a Long wraparound would
    // land far away or NULL
    val v = r.head.getDouble(3)
    assert(v <= -0.9 && v >= -1.0, s"expected ≈-1, got $v")
  }

  test("Bpe.train: driver-local aux pair-count dump is row-identical to " +
      "the distributed per-round dump") {
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
      .limit(60).select(col("text"))
    val d1 = java.nio.file.Files.createTempDirectory("bpe_aux_local")
    val d2 = java.nio.file.Files.createTempDirectory("bpe_aux_dist")
    try {
      val m1 = graft.functions.Bpe.train(docs, "text", numMerges = 3,
        auxDir = Some(d1.toString))
      val m2 = graft.functions.Bpe.trainDistributed(docs, "text",
        numMerges = 3, auxDir = Some(d2.toString))
      assert(m1 == m2)
      def slurp(d: String): Set[(String, String, Long, Int)] =
        spark.read.parquet(d)
          .select(col("_a"), col("_b"), col("_cnt"), col("_round"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getInt(3))).toSet
      assert(slurp(d1.toString) == slurp(d2.toString))
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d1.toFile); rm(d2.toFile)
    }
  }

  test("Bfs.distances: multi-source hop distance on a line+branch graph, " +
      "unreachable stays NULL, maxHops truncates") {
    import spark.implicits._
    // 0→1→2→3→4, 10→2 (second source shortcut), 5 isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 2L))
      .toDF("src", "dst")
    val verts = Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L).toDF("id")
    val seeds = Seq(0L, 10L).toDF("id")
    def run(maxHops: Int): Map[Long, Option[Long]] =
      graft.operators.Bfs.distances(verts, "id", edges, "src", "dst",
        seeds, maxHops = maxHops)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val full = run(20)
    assert(full == Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(1L),
      3L -> Some(2L), 4L -> Some(3L), 5L -> None, 10L -> Some(0L)))
    // truncation: with maxHops=1 node 3 (2 hops) and 4 are unreached
    val cut = run(1)
    assert(cut(3L).isEmpty && cut(4L).isEmpty && cut(2L) == Some(1L))
  }

  test("KCore.core: triangle with a tail — 2-core keeps exactly the " +
      "triangle; isolated and k-too-high cases degenerate cleanly") {
    import spark.implicits._
    // triangle 1-2-3, tail 3→4→5, isolated 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    def ids(k: Int): Set[Long] =
      graft.operators.KCore.core(verts, "id", edges, "src", "dst", k)
        .collect().map(_.getLong(0)).toSet
    assert(ids(2) == Set(1L, 2L, 3L))
    assert(ids(1) == Set(1L, 2L, 3L, 4L, 5L))  // isolated 9 peels
    assert(ids(3) == Set.empty)                 // whole graph peels
  }

  test("jsonlQuarantine: broken lines preserved verbatim, clean file " +
      "quarantines nothing") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_quar")
    val f = dir.resolve("feed.jsonl")
    java.nio.file.Files.writeString(f,
      """{"id":1,"v":"a"}
        |{"id":2,"v":"b"
        |not json at all
        |{"id":4,"v":"d"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    try {
      val parsed = graft.io.Sources.jsonlQuarantine(spark, f.toString, schema)
      val bad = parsed.where(col("_quarantine").isNotNull)
        .select(col("_quarantine")).collect().map(_.getString(0)).toSet
      assert(bad == Set("{\"id\":2,\"v\":\"b\"", "not json at all"))
      assert(parsed.where(col("_quarantine").isNull).count() == 2L)
      parsed.unpersist()
      // clean file: nothing lands in quarantine
      java.nio.file.Files.writeString(f, "{\"id\":9,\"v\":\"z\"}\n")
      val clean = graft.io.Sources.jsonlQuarantine(spark, f.toString, schema)
      assert(clean.where(col("_quarantine").isNotNull).count() == 0L)
      assert(clean.head().getLong(0) == 9L)
      clean.unpersist()
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
      ()
    }
  }

  test("csvQuarantine: wrong-arity and untypeable rows preserved, clean " +
      "rows parsed") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_quar_csv")
    val f = dir.resolve("feed.csv")
    java.nio.file.Files.writeString(f,
      "id,v\n1,a\nnot_a_number,b\n3,c\n")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    try {
      val parsed = graft.io.Sources.csvQuarantine(spark, f.toString, schema)
      val bad = parsed.where(col("_quarantine").isNotNull)
        .select(col("_quarantine")).collect().map(_.getString(0)).toSet
      assert(bad == Set("not_a_number,b"))
      assert(parsed.where(col("_quarantine").isNull).count() == 2L)
      parsed.unpersist()
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
      ()
    }
  }

  test("krippendorffAlpha: hand-computed values — perfect=1e6, the " +
      "(aa),(ab) textbook case=0, single-constant-label=NULL") {
    import spark.implicits._
    def alpha(rows: Seq[(String, String)]): Option[Long] = {
      val r = graft.operators.Audit
        .krippendorffAlpha(rows.toDF("x", "y"), "x", "y").head()
      if (r.isNullAt(2)) None else Some(r.getLong(2))
    }
    assert(alpha(Seq(("a", "a"), ("b", "b"))) == Some(1000000L))
    // pooled counts a:3 b:1 → den=16−10=6, num=6−3·2·1=0 → α=0
    assert(alpha(Seq(("a", "a"), ("a", "b"))) == Some(0L))
    assert(alpha(Seq(("a", "a"), ("a", "a"))) == None)
    // systematic disagreement goes negative (floor toward −∞ like kappa)
    assert(alpha(Seq(("a", "b"), ("b", "a"))).exists(_ < 0L))
  }

  test("PageRank.trustRank: a spam clique disconnected from the seeds " +
      "gets ZERO rank (uniform-teleport PageRank would fund it)") {
    import spark.implicits._
    // trusted component: 1→2→3→1; spam clique: 7↔8 (mutually reinforcing)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 7L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val tr = graft.operators.PageRank.trustRank(edges, "src", "dst",
      seeds, "id", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tr(7L) == 0L && tr(8L) == 0L, s"spam clique funded: $tr")
    assert(tr(1L) > 0L && tr(2L) > 0L && tr(3L) > 0L)
    // uniform teleport DOES fund the clique — the property is specific
    val pr = graft.operators.PageRank.run(edges, "src", "dst",
      iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(7L) > 0L && pr(8L) > 0L)
  }

  test("IncrementalJoin.appendDelta: base-view ∪ delta equals the full " +
      "recomputed join (append-only IVM law), on the fixture split") {
    val o = graft.core.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = graft.core.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"))
    val (ob, od) = (o.filter(col("o_orderkey") % 10 < 8),
      o.filter(col("o_orderkey") % 10 >= 8))
    val (lb, ld) = (l.filter(col("o_orderkey") % 7 < 5),
      l.filter(col("o_orderkey") % 7 >= 5))
    val delta = graft.operators.IncrementalJoin.appendDelta(
      ob, od, lb, ld, Seq("o_orderkey"))
    val maintained = ob.join(lb, Seq("o_orderkey")).unionByName(delta)
    val full = o.join(l, Seq("o_orderkey"))
    assert(maintained.count() == full.count())
    assert(maintained.exceptAll(full).isEmpty &&
      full.exceptAll(maintained).isEmpty)
    // all three delta terms are genuinely exercised by the split
    assert(od.join(lb, Seq("o_orderkey")).limit(1).count() == 1)
    assert(ob.join(ld, Seq("o_orderkey")).limit(1).count() == 1)
    assert(od.join(ld, Seq("o_orderkey")).limit(1).count() == 1)
  }
}
