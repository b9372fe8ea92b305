package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators._

/** ScalaCheck properties (SURVEY §5.2 item 3) over generated frames.
  * Raw ScalaCheck generators driven with fixed seeds (the scalatestplus
  * bridge is not in the offline dependency cache). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic samples: gen evaluated under seeds 0..n-1. */
  private def forAllSeeded[T](gen: Gen[T], n: Int = 8)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(body)
    }

  private val rowGen = Gen.listOfN(40, for {
    key <- Gen.choose(0, 8)
    v <- Gen.oneOf(Gen.choose(-100.0, 100.0).map(_.toString),
      Gen.const(""), Gen.const(null: String), Gen.alphaStr.map(_.take(5)))
  } yield (key, v))

  test("asof backward equals naive latest-prior lookup (property)") {
    // random (key, ts) frames with duplicate ts values and missing keys;
    // right side deduped per (key, ts) so the match is well-defined
    val asofGen = for {
      left <- Gen.listOfN(30, for {
        k <- Gen.choose(0, 4); ts <- Gen.choose(0L, 40L)
      } yield (k, ts))
      right <- Gen.listOfN(20, for {
        k <- Gen.choose(0, 5); ts <- Gen.choose(0L, 40L)
        v <- Gen.choose(0, 999)
      } yield (k, ts, v))
    } yield (left, right)
    forAllSeeded(asofGen, n = 6) { case (l, r) =>
      val left = l.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("lid", "k", "lts")
      val rightRaw = r.toDF("k", "rts", "rv")
      val right = rightRaw.groupBy("k", "rts").agg(min("rv").as("rv"))
      for (strict <- Seq(false, true)) {
        val got = graft.operators.AsofJoin
          .backward(left, right, Seq("k"), "lts", "rts", strict)
          .select("lid", "rts", "rv").collect()
          .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
        // naive: per left row, argmax-ts right row at/before lts
        val rRows = right.collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2)))
        val exp = left.collect().map { x =>
          val (lid, k, lts) = (x.getLong(0), x.getInt(1), x.getLong(2))
          val cands = rRows.filter(rr => rr._1 == k &&
            (if (strict) rr._2 < lts else rr._2 <= lts))
          if (cands.isEmpty) (lid, None, None)
          else {
            val best = cands.maxBy(_._2)
            (lid, Some(best._2), Some(best._3))
          }
        }.toSet
        assert(got == exp, s"strict=$strict")
      }
    }
  }

  test("dedup is idempotent and keeps one row per key (property)") {
    forAllSeeded(rowGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex
          .map { case ((k, v), i) => (i.toLong, k, v) }
          .toDF("_row_id", "k", "v")
        val once = ExactDedup(df, Seq("k"), "keep_first")
        val twice = ExactDedup(once, Seq("k"), "keep_first")
        assert(once.count() == twice.count())
        assert(once.count() == df.select("k").distinct().count())
      }
    }
  }

  test("quality score stays within [0,1] for arbitrary values (property)") {
    forAllSeeded(rowGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex
          .map { case ((k, v), i) => (i.toLong, v, k.toDouble) }
          .toDF("record_id", "email", "amount")
        val scores = QualityScorer(fields = Seq("record_id", "email", "amount"))(df)
          .select("_meta_quality_score").as[Double].collect()
        assert(scores.forall(s => s >= 0.0 && s <= 1.0))
      }
    }
  }

  test("aggregation conserves counts across any grouping (property)") {
    forAllSeeded(rowGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex
          .map { case ((k, v), i) => (i.toLong, k, v) }
          .toDF("_row_id", "k", "v")
        val out = Aggregator.aggregate(df, Seq("k"),
          Seq(Aggregator.AggSpec("n", "v", "count")))
        assert(out.agg(sum("n")).head().getLong(0) == rows.size.toLong)
      }
    }
  }

  test("chunking reconstructs the document for any size/overlap (property)") {
    import graft.functions.{TextFunctions => TF}
    val gen = for {
      nWords <- Gen.choose(1, 120)
      chunk <- Gen.choose(2, 20)
      overlap <- Gen.choose(0, chunk - 1)
    } yield (nWords, chunk, overlap)
    forAllSeeded(gen, n = 12) { case (nWords, chunk, overlap) =>
      val words = (1 to nWords).map("w" + _)
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = TF.chunkDocuments(df, "text", chunk, overlap)
        .orderBy("chunk_id").select("chunk_text")
        .as[String].collect().map(_.split(" ").toSeq)
      // stitched back together (dropping each successor's overlap) = doc,
      // exactly: window starts advance by step, so chunk i's tail begins
      // precisely where chunk i-1 ended
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(overlap))
      assert(rebuilt == words,
        s"nWords=$nWords chunk=$chunk overlap=$overlap")
      // every chunk except possibly the last is exactly `chunk` words
      chunks.dropRight(1).foreach(c => assert(c.length == chunk))
    }
  }

  test("combined anomaly set is a subset of each method's set (property)") {
    val df = graft.core.Tables.table(spark, sfDir, "events")
    val z = AnomalyDetector.zscore(df, Seq("value"), 2.0)
      .filter(col("_meta_is_anomaly")).select("event_id").as[Long].collect().toSet
    val i = AnomalyDetector.iqr(df, Seq("value"), 1.5)
      .filter(col("_meta_is_anomaly")).select("event_id").as[Long].collect().toSet
    // two-method fallback: ≥2 degenerates to AND
    val c = AnomalyDetector.combined(df, Seq("value"), 2.0, 1.5)
      .filter(col("_meta_is_anomaly")).select("event_id").as[Long].collect().toSet
    assert(c.subsetOf(z) && c.subsetOf(i) && c == (z intersect i))
    // three-method vote: contains every pairwise agreement, bounded by the
    // union, and z∩i is always flagged regardless of the iForest vote
    val out3 = AnomalyDetector.combined(df, Seq("value"), 2.0, 1.5,
      iforestOrderCol = Some("event_id"))
    val f = out3.filter(col("_meta_iforest_flag"))
      .select("event_id").as[Long].collect().toSet
    val c3 = out3.filter(col("_meta_is_anomaly"))
      .select("event_id").as[Long].collect().toSet
    assert((z intersect i).subsetOf(c3) && c3.subsetOf(z ++ i ++ f))
    assert(c3 == (z ++ i ++ f).filter(id =>
      Seq(z(id), i(id), f(id)).count(identity) >= 2))
  }

  test("filter compilation equals manual predicate (property)") {
    import graft.query.Filter
    val df = graft.core.Tables.table(spark, sfDir, "orders")
    forAllSeeded(Gen.zip(Gen.choose(0.0, 400000.0), Gen.oneOf("O", "F", "P")), 5) { case (p, st) =>
      val viaCompile = df.filter(Filter.compile(Seq(
        Filter.Gt("o_totalprice", p), Filter.Eq("o_orderstatus", st)))).count()
      val manual = df.filter(col("o_totalprice") > p &&
        col("o_orderstatus") === st).count()
      assert(viaCompile == manual)
    }
  }

  private val docGen: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    Gen.listOfN(12, Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" "))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("removeSpans conserves tokens and never touches span-free docs (property)") {
    import graft.operators.SubstrDedup
    import graft.functions.{TextFunctions => TF}
    forAllSeeded(docGen, n = 5) { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = SubstrDedup.removeSpans(df, "doc_id", "text", k = 8)
      // kept + removed = original token count, for every doc
      val bad = out.join(df, "doc_id")
        .withColumn("_n", TF.tokenCount(col("text")).cast("long"))
        .filter(col("n_tokens_kept") + col("n_tokens_removed") =!= col("_n"))
        .count()
      assert(bad == 0)
      // docs with no shared window come back byte-identical (modulo
      // whitespace normalization, which these inputs don't need)
      val flagged = SubstrDedup.flags(df, "doc_id", "text", k = 8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val untouched = out.join(df, "doc_id")
        .filter(!col("doc_id").isin(flagged.toSeq: _*))
        .filter(col("clean_text") =!= col("text")).count()
      assert(untouched == 0)
    }
  }

  test("passageDedup is idempotent: a second pass removes nothing (property)") {
    import graft.functions.{TextFunctions => TF}
    forAllSeeded(docGen, n = 5) { docs =>
      val first = TF.passageDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", passageWords = 8)
      val again = TF.passageDedup(
        first.select(col("doc_id"), col("clean_text").as("text")),
        "doc_id", "text", passageWords = 8)
      // passages surviving round 1 are unique across docs — round 2 must
      // find nothing new (boilerplate removal converges in one pass)
      assert(again.filter(col("n_removed") > 0).count() == 0)
    }
  }

  test("windowHashes yields max(n-k+1, 0) hashes, shift-invariant (property)") {
    import graft.functions.{TextFunctions => TF}
    forAllSeeded(docGen, n = 3) { docs =>
      val df = docs.toDF("doc_id", "text")
        .withColumn("w", split(col("text"), " "))
      val bad = df.select(size(col("w")).as("n"),
          size(TF.windowHashes(col("w"), 8)).as("m"))
        .filter(col("m") =!= greatest(col("n") - 7, lit(0))).count()
      assert(bad == 0)
      // prepending a word shifts windows but preserves the suffix hashes
      val shifted = df.select(col("doc_id"),
          TF.windowHashes(concat(array(lit("pre")), col("w")), 8).as("h2"),
          TF.windowHashes(col("w"), 8).as("h1"))
        .filter(size(col("h1")) > 0)
        .filter(!array_contains(col("h2"), element_at(col("h1"), 1)))
      assert(shifted.count() == 0)
    }
  }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, for {
      u <- Gen.choose(0L, 11L)
      v <- Gen.choose(0L, 11L)
    } yield (u, v))

  test("BFS distances satisfy the edge-relaxation invariant on random " +
      "graphs: no edge (u,v) with dist(v) > dist(u)+1, seeds at 0, " +
      "reached non-seeds have a predecessor one hop closer (property)") {
    forAllSeeded(edgeGen, n = 6) { es =>
      val edges = es.toDF("src", "dst")
      val verts = (0L to 11L).toDF("id")
      val seeds = Seq(0L, 7L).toDF("id")
      val d = Bfs.distances(verts, "id", edges, "src", "dst", seeds)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(d(0L) == Some(0L) && d(7L) == Some(0L))
      val dirEdges = es.filter { case (u, v) => u != v }.distinct
      for ((u, v) <- dirEdges; du <- d.getOrElse(u, None))
        assert(d.getOrElse(v, None).exists(_ <= du + 1),
          s"edge ($u,$v) violates relaxation: dist=$d")
      for ((v, dOpt) <- d; dv <- dOpt if dv > 0) {
        val hasPred = dirEdges.exists { case (u, w) =>
          w == v && d.getOrElse(u, None).contains(dv - 1) }
        assert(hasPred, s"node $v at $dv has no predecessor at ${dv - 1}")
      }
    }
  }

  test("k-core nesting: core(k+1) is a subset of core(k) on random " +
      "graphs, and every survivor keeps >= k live neighbors (property)") {
    forAllSeeded(edgeGen, n = 6) { es =>
      val edges = es.toDF("src", "dst")
      val verts = (0L to 11L).toDF("id")
      def core(k: Int): Set[Long] =
        KCore.core(verts, "id", edges, "src", "dst", k)
          .collect().map(_.getLong(0)).toSet
      val (c1, c2, c3) = (core(1), core(2), core(3))
      assert(c3.subsetOf(c2) && c2.subsetOf(c1))
      // survivors of core(2) each keep >= 2 distinct live neighbors
      val sym = es.filter { case (u, v) => u != v }
        .flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
      for (v <- c2) {
        val live = sym.collect { case (`v`, w) if c2(w) => w }.toSet
        assert(live.size >= 2, s"$v kept only $live in the 2-core")
      }
    }
  }

  test("IVM delta law holds for any split modulus (property over splits)") {
    val o = graft.core.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"))
    val l = graft.core.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"))
    for (m <- Seq(2, 3, 5)) {
      val (ob, od) = (o.filter(col("o_orderkey") % m =!= 0),
        o.filter(col("o_orderkey") % m === 0))
      val (lb, ld) = (l.filter(col("o_orderkey") % (m + 1) =!= 0),
        l.filter(col("o_orderkey") % (m + 1) === 0))
      val maintained = ob.join(lb, Seq("o_orderkey"))
        .unionByName(IncrementalJoin.appendDelta(ob, od, lb, ld,
          Seq("o_orderkey")))
      val full = o.join(l, Seq("o_orderkey"))
      assert(maintained.exceptAll(full).isEmpty &&
        full.exceptAll(maintained).isEmpty, s"modulus $m")
    }
  }

  test("incremental aggregate fold is slicing-invariant, and CDC " +
      "retraction inverts any random insert batch (property)") {
    val e = graft.core.Tables.table(spark, sfDir, "events")
      .select(col("event_type"), col("value"), col("event_id"))
    val keys = Seq("event_type")
    val direct = IncrementalAgg.update(None, e, keys, "value")
    // any modulus-slicing of the batch stream folds to the same state
    for (m <- Seq(2, 4, 7)) {
      val folded = (1 until m).foldLeft(
        IncrementalAgg.update(None,
          e.filter(col("event_id") % m === 0), keys, "value")) { (st, i) =>
        IncrementalAgg.update(Some(st),
          e.filter(col("event_id") % m === i), keys, "value")
      }
      assert(rowsOf(folded.orderBy("event_type")) ==
        rowsOf(direct.orderBy("event_type")), s"modulus $m")
    }
    // retraction property: for random predicates p, applying batch p as
    // inserts then deletes is the identity on the state
    forAllSeeded(Gen.choose(2, 30), n = 6) { m =>
      val batch = e.filter(col("event_id") % m === 1)
      val there = IncrementalAgg.updateCdc(direct, batch,
        e.limit(0), keys, "value")
      val back = IncrementalAgg.updateCdc(there, e.limit(0),
        batch, keys, "value")
      assert(rowsOf(back.orderBy("event_type")) ==
        rowsOf(direct.orderBy("event_type")), s"modulus $m")
    }
  }

  test("SnapshotDiff status counts are exhaustive and flip symmetrically " +
      "when old/new swap (property over random splits)") {
    val d = graft.core.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    forAllSeeded(Gen.zip(Gen.choose(3, 12), Gen.choose(3, 12)), n = 5) {
      case (a, b) =>
        val v1 = d.filter(col("doc_id") % a =!= 0)
        val v2 = d.filter(col("doc_id") % b =!= 0)
        val fwd = SnapshotDiff.diff(v1, v2, "doc_id", "text")
          .groupBy("status").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val rev = SnapshotDiff.diff(v2, v1, "doc_id", "text")
          .groupBy("status").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // swap duality: added ↔ removed, changed/unchanged fixed
        assert(fwd.getOrElse("added", 0L) == rev.getOrElse("removed", 0L))
        assert(fwd.getOrElse("removed", 0L) == rev.getOrElse("added", 0L))
        assert(fwd.getOrElse("unchanged", 0L) == rev.getOrElse("unchanged", 0L))
        assert(fwd.getOrElse("changed", 0L) == rev.getOrElse("changed", 0L))
        // exhaustive: statuses cover the id universe exactly
        val universe = v1.select("doc_id").union(v2.select("doc_id"))
          .distinct().count()
        assert(fwd.values.sum == universe)
    }
  }

  test("Hilbert xy2d is a bijection with unit steps at every bits " +
      "(property, driver-side kernel)") {
    (1 to 6).foreach { bits =>
      val n = 1 << bits
      val cells = for (x <- 0L until n; y <- 0L until n)
        yield graft.core.Hilbert.xy2d(bits, x, y) -> (x, y)
      val byD = cells.sortBy(_._1)
      assert(byD.map(_._1) == (0L until n.toLong * n))
      byD.sliding(2).foreach {
        case Seq((_, (x1, y1)), (_, (x2, y2))) =>
          assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
        case _ =>
      }
    }
  }

  test("resampleLinear laws: identity at equal rates, exact length " +
      "arithmetic, endpoints preserved, constants stay constant (property)") {
    val gen = for {
      n <- Gen.choose(2, 400)
      src <- Gen.choose(1000, 48000)
      dst <- Gen.choose(1000, 48000)
      samples <- Gen.listOfN(n, Gen.choose(-30000, 30000).map(_.toShort))
    } yield (samples.toArray, src, dst)
    forAllSeeded(gen, n = 20) { case (a, src, dst) =>
      val same = graft.multimodal.Codecs.resampleLinear(a, src, src)
      assert(same.toSeq == a.toSeq)
      val out = graft.multimodal.Codecs.resampleLinear(a, src, dst)
      assert(out.length ==
        ((a.length - 1).toLong * dst / src).toInt + 1)
      assert(out.head == a.head) // position 0 maps exactly
      val const = Array.fill(a.length)(1234.toShort)
      assert(graft.multimodal.Codecs.resampleLinear(const, src, dst)
        .forall(_ == 1234.toShort))
    }
  }

  test("Dag levels: every edge goes strictly uphill; levels bounded by " +
      "vertex count (property)") {
    val gen = Gen.listOfN(30, for {
      u <- Gen.choose(0L, 14L); v <- Gen.choose(0L, 14L)
    } yield (u, v))
    forAllSeeded(gen, n = 8) { raw =>
      val edges = raw.toDF("src", "dst")
      val verts = (0L to 14L).toDF("id")
      val got = graft.operators.Dag
        .topoLevels(verts, "id", edges, "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      raw.foreach { case (u, v) =>
        // for scheduled endpoints, dependencies strictly precede; an
        // unscheduled (-1) endpoint poisons its downstream only
        if (got(u) >= 0 && got(v) >= 0)
          assert(got(u) < got(v), s"edge $u->$v levels ${got(u)},${got(v)}")
        if (got(u) == -1L) assert(got(v) == -1L || u == v)
      }
      assert(got.values.forall(l => l >= -1 && l < 15))
    }
  }
}
