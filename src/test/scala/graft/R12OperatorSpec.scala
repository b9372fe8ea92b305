package graft

import org.apache.spark.sql.functions._
import graft.core.Rebalance

/** Round-12 pins: compute-dense rebalancing, the complex-typed
  * distinct-count guard, and null-element safety in the integral set-sim
  * path. */
class R12OperatorSpec extends SparkSuite {
  import spark.implicits._

  test("computeDense repartitions under-split frames and leaves wide ones") {
    val target = spark.sparkContext.defaultParallelism
    val thin = spark.range(1000).toDF("id").coalesce(1)
    // expected count from the helper's own predicate: tiny test fixtures
    // always pass the size guard, so any under-target frame rebalances
    val expected = if (1 < target) target else 1
    assert(Rebalance.computeDense(thin).rdd.getNumPartitions == expected)
    // a frame already at >= target/2 partitions passes through untouched
    // (same plan object — no exchange inserted)
    val wide = spark.range(1000).toDF("id").repartition(target)
    assert(Rebalance.computeDense(wide) eq wide)
    // streaming frames pass through (no batch RDD to probe)
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft_r12_stream").toString
    spark.range(10).toDF("id").write.mode("overwrite").parquet(streamDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(streamDir).schema).parquet(streamDir)
    assert(Rebalance.computeDense(stream) eq stream)
  }

  test("computeDense preserves values and aggregates exactly") {
    val df = spark.range(10000).toDF("id")
      .withColumn("v", (col("id") % 97).cast("double")).coalesce(1)
    val a = df.agg(sum("v"), count(lit(1))).head()
    val b = Rebalance.computeDense(df).agg(sum("v"), count(lit(1))).head()
    assert(a == b)
    assert(Rebalance.computeDense(df).exceptAll(df).isEmpty)
  }

  test("distinctCounts is exact for complex-typed columns") {
    // the stacked string-cast path is NOT injective for arrays:
    // ["a, b"] and ["a", "b"] both render "[a, b]" — the complex path
    // must countDistinct instead (2, not 1)
    val df = Seq(
      (1, Seq("a, b"), "x"),
      (2, Seq("a", "b"), "x"),
      (3, Seq("a", "b"), "y"),
      (4, null.asInstanceOf[Seq[String]], "y")).toDF("id", "arr", "s")
    val got = graft.query.QueryService
      .distinctCounts(df, Seq("id", "arr", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("id" -> 4L, "arr" -> 2L, "s" -> 2L))
    // profileTable end-to-end with a complex column present
    val prof = graft.query.QueryService
      .profileTable(df, Seq("arr", "s"))
      .select("column_name", "n_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof == Map("arr" -> 2L, "s" -> 2L))
  }

  test("integral set-sim join strips null elements before the merge walk") {
    // null is not a token: a set containing nulls must behave as the set
    // without them, and the codegen'd SortedIntersectCount must never see
    // a null slot (it would read garbage). {1,2,3,null} vs {1,2,3} are the
    // SAME set -> J = 1 pair.
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L, null)),
      (2L, Seq[java.lang.Long](1L, 2L, 3L)),
      (3L, Seq[java.lang.Long](7L, 8L, 9L, 10L))).toDF("id", "st")
    val pairs = graft.operators.SetSimJoin
      .jaccardSelfJoin(df, "id", "st", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
