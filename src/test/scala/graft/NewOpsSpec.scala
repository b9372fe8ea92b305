package graft

import org.apache.spark.sql.functions._

/** Hand-computed cases and law checks for the round-3 operator additions
  * (each also carries an oracle gate; these pin the semantics on tiny
  * inputs where the expected numbers are derivable by hand). */
class NewOpsSpec extends SparkSuite {
  import spark.implicits._

  test("tfidfTable: single-term doc frequencies give the hand value") {
    // 2 docs: "a a b" and "a c" -> df(a)=2, df(b)=1, df(c)=1, N=2
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = graft.functions.TextFunctions
      .tfidfTable(docs, "doc_id", "text", vocabK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // idf(a) = ln(3/3)+1 = 1; tf(a, doc1) = 2 -> 2.0
    assert(out((1L, "a")) == 2.0)
    // idf(b) = ln(3/2)+1; tf = 1
    val idfB = math.floor((math.log(3.0 / 2.0) + 1.0) * 1e4 + 0.5) / 1e4
    assert(out((1L, "b")) == idfB)
    assert(out((2L, "a")) == 1.0)
  }

  test("hashFeatures: buckets in range, weights are term counts") {
    val docs = Seq((1L, "x x y")).toDF("doc_id", "text")
    val rows = graft.functions.Featurize
      .hashFeatures(docs, "doc_id", "text", numBuckets = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length == 2)
    assert(rows.forall { case (b, _) => b >= 0 && b < 8 })
    assert(rows.map(_._2).sorted.toSeq == Seq(1L, 2L))
  }

  test("labelIndex: frequency rank with value tie-break, left-join keeps all") {
    val df = Seq("b", "b", "a", "a", "c").toDF("src")
      .withColumn("id", monotonically_increasing_id())
    val out = graft.functions.Featurize.labelIndex(df, "src", "idx")
      .select("src", "idx").distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // freq: a=2, b=2, c=1 -> ties broken by value: a=0, b=1, c=2
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("extractEntities: multiple kinds, occurrence order, no cross-kind bleed") {
    val df = Seq((1L, "mail a@b.co and c@d.eu, ssn 123-45-6789"))
      .toDF("id", "t")
    val out = graft.functions.TextFunctions.extractEntities(df, "id", "t",
      Seq("email" -> "[a-z]+@[a-z.]+\\.[a-z]{2,}",
        "ssn" -> "\\d{3}-\\d{2}-\\d{4}"))
      .collect().map(r => (r.getString(1), r.getInt(2), r.getString(3)))
    assert(out.toSet == Set(("email", 1, "a@b.co"), ("email", 2, "c@d.eu"),
      ("ssn", 1, "123-45-6789")))
  }

  test("cooccurrencePmi: adjacent pair counted, window-2 pair counted, PMI sign sane") {
    val docs = Seq((1L, "hot dog bun"), (2L, "hot dog stand")).toDF("id", "t")
    val out = graft.functions.TextFunctions
      .cooccurrencePmi(docs, "id", "t", window = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("hot", "dog"))._1 == 2L) // adjacent in both docs
    assert(out(("hot", "bun"))._1 == 1L) // distance 2 in doc 1
    // "hot dog" co-occurs every time either appears -> positive PMI
    assert(out(("hot", "dog"))._2 > 0.0)
  }

  test("MarketBasket: hand-computed support/confidence/lift") {
    // baskets: {1:{a,b}, 2:{a,b}, 3:{a}} -> pair (a,b): n=2,
    // support=2/3, confidence(a->b)=2/3, lift=2*3/(3*2)=1
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (1, "a"))
      .toDF("basket", "item")
    val r = graft.operators.MarketBasket.pairRules(df, "basket", "item")
      .head()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 2L)
    assert(r.getDouble(3) == math.floor(2.0 / 3.0 * 1e4 + 0.5) / 1e4)
    assert(r.getDouble(4) == math.floor(2.0 / 3.0 * 1e4 + 0.5) / 1e4)
    assert(r.getDouble(5) == 1.0)
  }

  test("rrfFuse: shared id outranks single-list ids; missing list contributes 0") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((1L, 2), (3L, 1)).toDF("id", "rank")
    val out = graft.functions.Ranking.rrfFuse(Seq(a, b), "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp1 = math.floor((1.0 / 61 + 1.0 / 62) * 1e6 + 0.5) / 1e6
    assert(out(1L) == exp1)
    assert(out(1L) > out(3L) && out(1L) > out(2L))
    assert(out(3L) == math.floor(1.0 / 61 * 1e6 + 0.5) / 1e6)
  }

  test("multiPhraseSearch: multi-word hit, single-word path, and no false positive") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "quick brownie fox"))
      .toDF("doc_id", "text")
    val phrases = Seq((10L, "quick brown"), (11L, "fox"), (12L, "brown fox x"))
      .toDF("pid", "phrase")
    val out = graft.functions.TextFunctions
      .multiPhraseSearch(docs, "doc_id", "text", phrases, "pid", "phrase")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "quick brown" only doc 1 (doc 2 has "brownie"); "fox" both;
    // "brown fox x" nowhere
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("kFold: folds in range, deterministic, and id-stable under corpus growth") {
    val small = (1 to 100).map(_.toLong).toDF("id")
    val big = (1 to 200).map(_.toLong).toDF("id")
    def folds(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Sampling.kFold(df, "id", 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fs = folds(small); val fb = folds(big)
    assert(fs.values.forall(f => f >= 0 && f < 5))
    // growth never reassigns an existing row's fold
    assert(fs.forall { case (id, f) => fb(id) == f })
  }

  test("psiDrift: identical samples give ~zero PSI terms") {
    val v = (1 to 1000).map(i => (i.toLong, (i % 97).toDouble))
      .toDF("id", "value")
    val terms = graft.operators.Audit.psiDrift(v, v, "value", bins = 10)
      .collect().map(_.getDouble(3))
    assert(terms.forall(t => math.abs(t) < 1e-9), terms.toSeq.toString)
  }

  test("infoGain: perfect predictor recovers H(label), useless predictor gives ~0") {
    val df = (1 to 400).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      (i.toLong, lang, lang.toUpperCase, if (i % 4 < 2) "x" else "y")
    }.toDF("id", "lang", "perfect", "useless")
    val g1 = graft.operators.Audit.infoGain(df, "perfect", "lang").head()
    assert(g1.getDouble(4) == g1.getDouble(2), "IG(perfect) == H(label)")
    val g2 = graft.operators.Audit.infoGain(df, "useless", "lang").head()
    assert(math.abs(g2.getDouble(4)) < 1e-9)
  }

  test("groupTrend: exact slope on a synthetic line") {
    // y = 2x + 5 at one-second steps -> slope 2.0 exactly
    val rows = (0 until 50).map(i =>
      ("g", new java.sql.Timestamp(1700000000000L + i * 1000L),
        2.0 * i + 5.0))
    val df = rows.toDF("g", "ts", "value")
    val r = graft.operators.TimeSeries.groupTrend(df, "g", "ts", "value")
      .head()
    assert(r.getLong(1) == 50L)
    assert(r.getDouble(2) == 2.0)
  }

  test("keyCandidates: unique vs non-unique detection") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val out = graft.operators.Audit.keyCandidates(df,
      Seq(Seq("id"), Seq("grp")))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(out("id") && !out("grp"))
  }

  test("nearest asof: picks the closer side, ties go backward") {
    val left = Seq((1L, 10L), (2L, 100L)).toDF("k", "ts")
      .select(col("k"), col("ts").cast("double").as("ts"))
    val right = Seq((1L, 8L, "b8"), (1L, 11L, "f11"),
      (2L, 90L, "b90"), (2L, 110L, "f110")).toDF("k", "rts", "tag")
      .select(col("k"), col("rts").cast("double").as("rts"), col("tag"))
    val out = graft.operators.AsofJoin.nearest(left, right, Seq("k"),
      "ts", "rts")
      .collect().map(r => r.getLong(0) -> ((r.getString(3), r.getString(4))))
      .toMap
    assert(out(1L) == (("f11", "f")))  // 11 is 1 away vs 8 is 2 away
    assert(out(2L) == (("b90", "b")))  // both 10 away -> backward wins
  }
}
