package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TextFunctions => TF}
import graft.operators.{MinHashDedup, NgramJaccard, SimHash}

class TextAndSimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("tokenCount handles empty, single, multi-space") {
    val df = Seq("", "one", "two  words", "  padded three words  ").toDF("text")
    val got = df.select(TF.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(got == Seq(0, 1, 2, 3))
  }

  test("langId picks dominant marker language") {
    val df = Seq(
      "the cat and the dog is here",
      "der hund und die katze ist da",
      "el perro es con la casa para",
      "xyzzy qwerty").toDF("text")
    val got = df.select(TF.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "unknown"))
  }

  test("shingles produce k-grams; identical docs have jaccard 1") {
    val df = Seq("a b c d e").toDF("text")
    val sh = df.select(MinHashDedup.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d", "c d e"))
    val two = Seq((1L, "a b c d e", "k"), (2L, "a b c d e", "k")).toDF("id", "text", "blk")
    val pairs = NgramJaccard.pairsWithinBlocks(two, "id", "text", col("blk"), 3, 0.5)
    assert(pairs.select("jaccard").as[Double].head() == 1.0)
  }

  test("minhash clusters exact duplicates together") {
    val docs = Seq(
      (1L, "spark makes big data simple and fast for everyone today"),
      (2L, "spark makes big data simple and fast for everyone today"),
      (3L, "an entirely different document about cats and dogs playing")
    ).toDF("doc_id", "text")
    val clusters = MinHashDedup.clusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == clusters(2L))
    assert(clusters(3L) != clusters(1L))
  }

  test("simhash: identical texts hash equal, hamming 0") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again")
    ).toDF("id", "text")
    val hs = df.select(SimHash.simhash(MinHashDedup.shingles(col("text"), 3)).as("h"))
      .as[Long].collect()
    assert(hs(0) == hs(1))
    val d = Seq((hs(0), hs(1))).toDF("a", "b")
      .select(SimHash.hamming(col("a"), col("b"))).as[Int].head()
    assert(d == 0)
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    ).toDF("a", "b")
    val got = df.select(round(Similarity.cosine(col("a"), col("b")), 6))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("topK returns the query vector itself first") {
    val emb = graft.core.Tables.table(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0)
    val top = Similarity.topK(emb, "embedding", "vec_id", q, 5).collect()
    assert(top.head.getLong(0) == 3L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    // descending similarity
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("annJoin finds self-match in its bucket") {
    val emb = graft.core.Tables.table(spark, sfDir, "embeddings")
    val out = Similarity.annJoin(emb, emb.filter(col("vec_id") === 7),
      "embedding", "vec_id", dim = 64, nPlanes = 4, k = 5).collect()
    assert(out.exists(r => r.getLong(0) == 7L && r.getLong(1) == 7L))
  }

  test("pii redaction masks all classes and leaves clean text alone") {
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => TF}
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.com thanks"),
      (2L, "ssn 987-65-4321 card 4111-1111-1111-1111 tel 555.123.4567"),
      (3L, "no pii here, just 12345 and v1.2.3")).toDF("id", "t")
    val got = df.select(col("id"), TF.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail me at [EMAIL] thanks")
    assert(got(2L) == "ssn [SSN] card [CREDIT_CARD] tel [PHONE_US]")
    assert(got(3L) == "no pii here, just 12345 and v1.2.3")
  }

  test("packing: window totals bounded by budget+maxdoc, ids contiguous") {
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => TF}
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
    val budget = 500L
    val packed = TF.packDocuments(docs, "doc_id", "text", budget)
    val perWindow = packed.groupBy("window_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
    val maxDoc = packed.agg(max("n_tokens")).head().getLong(0)
    // cumsum-block bound: a window's first doc may straddle the boundary
    assert(perWindow.filter(col("tok") > budget + maxDoc).isEmpty)
    // window ids are the contiguous block sequence 0..W-1
    val ids = perWindow.select("window_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq)
    // deterministic across repartition
    val p2 = TF.packDocuments(docs.repartition(7), "doc_id", "text", budget)
    assert(packed.select("doc_id", "window_id").exceptAll(
      p2.select("doc_id", "window_id")).isEmpty)
  }

  test("multimodal: feature extraction is deterministic and metadata ops never decode") {
    val corpus = graft.multimodal.Multimodal.syntheticCorpus(spark, 30)
    val f1 = graft.multimodal.Multimodal.extractFeatures(corpus).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = graft.multimodal.Multimodal.extractFeatures(corpus).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2 && f1.size == 30)
    val frames = graft.multimodal.Multimodal.frameSamplePlan(corpus, 500L)
    assert(frames.count() > 0)
  }

  test("multimodal: resize fits images into bounds, passes others through") {
    import org.apache.spark.sql.functions._
    val corpus = graft.multimodal.Multimodal.syntheticCorpus(spark, 30)
    val resized = graft.multimodal.Multimodal.resizeImages(corpus, 128, 128)
    assert(resized.schema == corpus.schema)
    val img = resized.filter(col("kind") === "image")
    assert(img.filter(col("width") > 128 || col("height") > 128).isEmpty)
    // aspect ratio preserved within integer-floor tolerance
    val pair = corpus.filter(col("kind") === "image")
      .select(col("media_id"), col("width").as("w0"), col("height").as("h0"))
      .join(img.select(col("media_id"), col("width"), col("height")), "media_id")
      .collect()
    pair.foreach { r =>
      val (w0, h0, w, h) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      if (w0 <= 128 && h0 <= 128) assert(w == w0 && h == h0) // never upscale
      else assert(math.abs(w.toDouble / h - w0.toDouble / h0) < 0.1)
    }
    // non-image rows byte-identical
    val a = corpus.filter(col("kind") =!= "image").orderBy("media_id")
      .select("content").collect().map(_.getAs[Array[Byte]](0).toSeq)
    val b = resized.filter(col("kind") =!= "image").orderBy("media_id")
      .select("content").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
