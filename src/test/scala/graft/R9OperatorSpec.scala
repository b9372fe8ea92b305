package graft

import org.apache.spark.sql.functions._
import graft.operators.{ExactQuantile, SetSimJoin}

/** Round-9 hardening: quantilePerGroup's heavy-rows projection (narrowing
  * rounds scan heavy-group rows only, not the full input), SetSimJoin's
  * 64-bit pruning arithmetic, and the degenerate-threshold clamp. */
class R9OperatorSpec extends SparkSuite {
  import spark.implicits._

  test("heavyProjection keeps exactly the heavy-group rows (null-safe)") {
    val df = (
      (1 to 10).map(i => (java.lang.Long.valueOf(1L), i.toDouble)) ++
      (1 to 3).map(i => (java.lang.Long.valueOf(2L), i.toDouble)) ++
      (1 to 5).map(i => (null: java.lang.Long, i.toDouble))
    ).toDF("g", "_v")
    val hk = Seq[java.lang.Long](1L, null).toDF("g")
    val got = ExactQuantile.heavyProjection(df, hk, Seq("g"))
    assert(got.count() == 15L, "heavy rows only: group 1 (10) + null (5)")
    val gs = got.select("g").distinct().collect()
      .map(r => if (r.isNullAt(0)) -999L else r.getLong(0)).toSet
    assert(gs == Set(1L, -999L), "light group 2 must be excluded")
  }

  test("quantilePerGroup multi-round narrowing over the persisted heavy " +
      "projection stays exact, and the cache is released") {
    // 2000-row heavy group (bins=4, cutoff=20 forces ~4 narrowing rounds
    // over the persisted projection) mixed with light groups
    val heavy = (1 to 2000).map(i => (0L, i.toDouble))
    val light = (1 to 50).flatMap(g => (1 to 5).map(i =>
      (g.toLong, (g * 10 + i).toDouble)))
    val df = (heavy ++ light).toDF("g", "v").repartition(8)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val got = ExactQuantile.quantilePerGroup(df, Seq("g"), "v", 1, 2,
        bins = 4, directCutoff = 20L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == 1000.0) // ceil(2000/2) = 1000th of 1..2000
    assert(got(7L) == 73.0)   // 71..75 -> rank ceil(5/2)=3
    assert(got.size == 51)
    // the heavy projection was unpersisted on exit — no cache leak into
    // the rest of the suite
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore)
  }

  test("SetSimJoin pruning arithmetic is 64-bit: a ~215k-token pair " +
      "survives (int n*10000 would wrap and drop it)") {
    // n = 214,900 sits in the window where IntegerType n*10000 wraps
    // negative while n*9990 stays positive, so pre-fix the LENGTH filter
    // compared negative >= positive and silently dropped the true pair
    val n = 214900
    val mk = (tag: String) =>
      array_sort(concat(transform(sequence(lit(0), lit(n - 2)),
        x => concat(lit("t"), lpad(x.cast("string"), 7, "0"))),
        array(lit(tag))))
    val df = Seq(1L, 2L).toDF("id")
      .withColumn("s", when(col("id") === 1L, mk("aa")).otherwise(mk("zz")))
    // J = (n-1)/(n+1) ~ 0.99999 >= 0.999
    val pairs = SetSimJoin.jaccardSelfJoin(df, "id", "s", 0.999).collect()
    assert(pairs.length == 1, "the near-identical giant pair must survive")
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getLong(2) >= 9990L)
  }

  test("hll slidingMerge GROUPED: per-group trailing merge equals batch " +
      "registers over each group's window slice") {
    import graft.functions.ReplayableHll
    val rows = (1 to 600).map { i =>
      (java.sql.Date.valueOf(f"2024-01-${i % 5 + 1}%02d"),
        if (i % 2 == 0) "a" else "b", s"user-$i")
    }
    val df = rows.toDF("day", "g", "v")
    val daily = ReplayableHll.registers(df, Seq("day", "g"), "v", p = 8)
    val rolled = ReplayableHll
      .slidingMerge(daily, "day", Seq("g"), window = 3)
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getString(2)) -> r.getLong(3)).toMap
    val expected = (for (d <- 1 to 5; g <- Seq("a", "b")) yield {
      val target = java.sql.Date.valueOf(f"2024-01-$d%02d")
      val slice = rows.filter { case (dt, gg, _) =>
        val diff = target.toLocalDate.toEpochDay - dt.toLocalDate.toEpochDay
        gg == g && diff >= 0 && diff < 3
      }
      if (slice.isEmpty) Seq.empty
      else ReplayableHll.registers(slice.toDF("day", "g", "v"), Nil, "v",
          p = 8)
        .collect().map(r =>
          (target.toString, g, r.getString(0)) -> r.getLong(1)).toSeq
    }).flatten.toMap
    assert(rolled == expected)
  }

  test("components small-graph fast path equals the iterative path on a " +
      "messy graph, and non-integral ids take the iterative path") {
    import graft.operators.Components
    // chains, a clique, self-loops, duplicate + reversed edges, isolates
    val edges = ((0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq ++
      Seq((100L, 103L), (103L, 101L), (101L, 100L), (102L, 100L),
        (7L, 7L), (1L, 0L), (200L, 300L), (300L, 200L))).toDF("a", "b")
    val verts = ((0L until 40L) ++ Seq(100L, 101L, 102L, 103L, 200L, 300L,
      999L)).toDF("id")
    def run(cutoff: Long) = Components
      .labels(verts, "id", edges, "a", "b", driverCutoff = cutoff)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run(2000000L)
    val iter = run(0L)
    assert(fast == iter)
    assert(fast(39L) == 0L && fast(103L) == 100L && fast(300L) == 200L &&
      fast(999L) == 999L)
    // string ids: the dense-remap ordering argument only holds for
    // integral types, so the fast path must decline (same answer either
    // way, proving the type gate routes correctly)
    val sEdges = Seq(("b", "a"), ("c", "b")).toDF("x", "y")
    val sVerts = Seq("a", "b", "c", "z").toDF("id")
    val sGot = Components.labels(sVerts, "id", sEdges, "x", "y")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sGot == Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "z"))
  }

  test("jaccardSelfJoin clamps sub-1e-4 thresholds instead of throwing") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("b", "c")),
      (3L, Seq("x"))).toDF("id", "s")
    // threshold 5e-5 floors to tE4=0 — clamped to the smallest
    // representable bound (any overlapping pair qualifies)
    val got = SetSimJoin.jaccardSelfJoin(df, "id", "s", 0.00005)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("kcore small-graph fast path equals the peeling path: clique + " +
      "tail + isolate + endpoint outside vertices") {
    import graft.operators.KCore
    // 4-clique (3-core) with a pendant chain (peels), a triangle (2-core,
    // dies at k=3), an isolate, and an edge whose endpoint 999 is NOT in
    // vertices (must not resurrect 999 or keep 1 alive through it)
    val edges = (for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b))
      .++(Seq((3L, 4L), (4L, 5L), (10L, 11L), (11L, 12L), (12L, 10L),
        (1L, 999L)))
      .toDF("a", "b")
    val verts = ((0L to 5L) ++ Seq(10L, 11L, 12L, 50L)).toDF("id")
    def run(cutoff: Long) = KCore
      .core(verts, "id", edges, "a", "b", k = 3, driverCutoff = cutoff)
      .collect().map(_.getLong(0)).toSet
    val fast = run(2000000L)
    val iter = run(0L)
    assert(fast == iter)
    assert(fast == Set(0L, 1L, 2L, 3L))
  }

  test("bfs small-graph fast path equals the frontier path: fork, " +
      "unreachable, maxHops cut, seed outside vertices") {
    import graft.operators.Bfs
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 5L),
      (5L, 3L), (7L, 8L), (100L, 6L)).toDF("s", "d")
    val verts = (0L to 8L).toDF("id")
    val seeds = Seq(0L, 100L).toDF("id") // 100 propagates, not emitted
    def run(cutoff: Long, hops: Int) = Bfs
      .distances(verts, "id", edges, "s", "d", seeds, maxHops = hops,
        driverCutoff = cutoff)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    for (hops <- Seq(20, 2, 0)) {
      val fast = run(2000000L, hops)
      val iter = run(0L, hops)
      assert(fast == iter, s"maxHops=$hops")
    }
    val full = run(2000000L, 20)
    assert(full == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L,
      5L -> 1L, 6L -> 1L, 7L -> -1L, 8L -> -1L))
    // distance-maxHops vertices settle but don't expand further
    val cut = run(2000000L, 2)
    assert(cut(3L) == 2L && cut(4L) == -1L)
  }

  test("dag small-graph fast path equals the wave path: diamond, cycle " +
      "wake, isolate, edge from a non-vertex source") {
    import graft.operators.Dag
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      // cycle 10<->11 and its wake 12
      (10L, 11L), (11L, 10L), (11L, 12L),
      // source 999 is NOT in vertices: must not delay 6
      (999L, 6L)).toDF("u", "v")
    val verts = ((0L to 6L) ++ Seq(10L, 11L, 12L, 77L)).toDF("id")
    def run(cutoff: Long) = Dag
      .topoLevels(verts, "id", edges, "u", "v", driverCutoff = cutoff)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    val fast = run(2000000L)
    val iter = run(0L)
    assert(fast == iter)
    assert(fast(3L) == ((2L, false)) && fast(4L) == ((3L, false)))
    assert(fast(10L) == ((-1L, true)) && fast(12L) == ((-1L, true)))
    assert(fast(6L) == ((0L, false)) && fast(77L) == ((0L, false)))
    // depth guard parity: a 5-deep chain must throw on BOTH paths at
    // maxRounds = 3
    val chain = (0L until 5L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("u", "v")
    val cv = (0L until 5L).toDF("id")
    for (cutoff <- Seq(2000000L, 0L)) {
      intercept[Exception] {
        Dag.topoLevels(cv, "id", chain, "u", "v", maxRounds = 3,
          driverCutoff = cutoff).collect()
      }
    }
  }
}

/** Gate/spec drift guard (ADVICE r8 #8): every gate a test indexes into by
  * column name or row key is pinned here as a NAMED assertion, so trimming
  * a gate without updating its consumer fails loudly instead of as a
  * NoSuchElementException deep inside the full run (the r8
  * q_layout_compare desync, commit 8ba4ac9). Add a line whenever a new
  * spec consumes a gate's output. Schema-only — building the frame is
  * lazy, so this costs plans, not jobs. */
class GateContractSpec extends SparkSuite {

  // gate -> columns its consuming spec(s) reference by name. Sweep
  // method (r9 verdict #3): `grep -rn 'queries("q_' src/test` plus the
  // SparkEntry.queries(variable) loops — EVERY gate a spec resolves by
  // name belongs here, including rows>0-only consumers (an empty column
  // list still pins existence: renaming/removing the gate fails this
  // named assertion instead of the consumer's own suite mid-run).
  // (q_next_event / q_cdc_agg are consumed plan-shape-only by
  // PushdownSpec; q_layout_compare's (layout, axis) ROW KEYS are asserted
  // in R6OperatorSpec itself via an explicit keySet equality.)
  private val consumed = Map(
    "q_next_event" -> Seq.empty[String],
    "q_cdc_agg" -> Seq.empty[String],
    "q_agg_dashboard" -> Seq("o_orderpriority", "n_orders"), // ServiceSpec
    "q_layout_compare" ->
      Seq("layout", "axis", "n_files", "max_depth"), // R6OperatorSpec
    // ClusterShapeSpec's executability sweep resolves these by name
    // (count-only — no column indexing)
    "q_pack_docs" -> Seq.empty[String],
    "q_doc_fuzzy_keep" -> Seq.empty[String],
    "q_ks_drift" -> Seq.empty[String],
    "q_embed_ivfadc" -> Seq.empty[String],
    "q_bpe_encode" -> Seq.empty[String],
    "q_join_size_est" -> Seq.empty[String],
    "q_hilbert" -> Seq.empty[String],
    "q_bloom_join" -> Seq.empty[String],
    "q_dag_levels" -> Seq.empty[String],
    "q_golden_records" -> Seq.empty[String],
    "q_image_codec_roundtrip" -> Seq.empty[String],
    "q_jdbc_roundtrip" -> Seq.empty[String],
    "q_global_index" -> Seq.empty[String],
    "q_seq_pack" -> Seq.empty[String],
    "q_exact_kth" -> Seq.empty[String],
    "q_hll_stream_twin" -> Seq.empty[String]
  )

  test("every spec-consumed gate exists and exposes the columns its " +
      "consumer indexes") {
    consumed.foreach { case (name, cols) =>
      assert(SparkEntry.queries.contains(name),
        s"gate $name was removed but a spec still consumes it")
      val have = SparkEntry.queries(name)(spark, sfDir).columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty,
        s"gate $name no longer emits ${missing.mkString(", ")} " +
          s"(a spec indexes these; it has $have)")
    }
  }
}
