package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TokenCount, TextFunctions => TF}

class FastExprAndIvfSpec extends SparkSuite {
  import spark.implicits._

  test("fast_token_count matches the regex-based tokenCount on documents") {
    TokenCount.register(spark)
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
    val mismatches = docs.select(
      TF.tokenCount(col("text")).as("slow"),
      TokenCount.fast_token_count(col("text")).as("fast"))
      .filter(col("slow") =!= col("fast")).count()
    assert(mismatches == 0)
    // SQL path + edge cases
    Seq("", "  ", "one", " a  b\tc\nd ").toDF("t").createOrReplaceTempView("ftc")
    val got = spark.sql("SELECT fast_token_count(t) FROM ftc")
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0, 1, 4))
  }

  test("fast_token_count participates in whole-stage codegen") {
    TokenCount.register(spark)
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
    val plan = docs.select(TokenCount.fast_token_count(col("text")))
      .queryExecution.executedPlan
    // the '*(n)' prefix in toString marks WholeStageCodegen spans
    assert(plan.toString.contains("*(1) Project [fast_token_count"))
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
  }

  test("IVF index: self-query returns itself; probes bound the scan") {
    val emb = graft.core.Tables.table(spark, sfDir, "embeddings")
    val index = Similarity.ivfIndex(emb, "embedding", "vec_id", nLists = 8)
    assert(index.centroids.length == 8)
    // every vector got a list
    assert(index.assigned.filter(col("_list").isNull).count() == 0)
    val qvec = emb.filter(col("vec_id") === 11).select("embedding")
      .head().getSeq[Float](0)
    val hits = Similarity.ivfSearch(index, "embedding", "vec_id", qvec,
      k = 5, nProbe = 3).collect()
    assert(hits.head.getLong(0) == 11L) // own list is always probed
    assert(math.abs(hits.head.getDouble(1) - 1.0) < 1e-9)
    // determinism: same seed → same assignment
    val again = Similarity.ivfIndex(emb, "embedding", "vec_id", nLists = 8)
    val a1 = index.assigned.select("vec_id", "_list").as[(Long, Int)].collect().toMap
    val a2 = again.assigned.select("vec_id", "_list").as[(Long, Int)].collect().toMap
    assert(a1 == a2)
  }

  test("IVF recall against brute force is reasonable on clustered data") {
    val emb = graft.core.Tables.table(spark, sfDir, "embeddings")
    val qvec = emb.filter(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0)
    val exact = Similarity.topK(emb, "embedding", "vec_id", qvec, 10)
      .select("vec_id").as[Long].collect().toSet
    val index = Similarity.ivfIndex(emb, "embedding", "vec_id", nLists = 8)
    val approx = Similarity.ivfSearch(index, "embedding", "vec_id", qvec,
      k = 10, nProbe = 4).select("vec_id").as[Long].collect().toSet
    // embeddings are label-clustered; probing half the lists should recover
    // most of the true top-10
    assert((exact intersect approx).size >= 5)
  }
}
