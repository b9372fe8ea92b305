package graft

import org.apache.spark.sql.functions._
import graft.operators.{Audit, GroupNormalizer, TimeSeries}

/** Known-answer properties for the round-4 operators — the oracle gates
  * prove cross-engine agreement; these pin the MATH against hand-computed
  * values on tiny inputs. */
class R4OperatorSpec extends SparkSuite {
  import spark.implicits._

  test("autocorr: alternating series has r = -1 at lag 1, +1 at lag 2") {
    // x = 1,3,1,3,1,3,1,3 — mean 2, perfectly anti-correlated at lag 1
    val df = (1 to 8).map(i => ("k", i.toLong, if (i % 2 == 1) 1L else 3L))
      .toDF("k", "b", "n")
    val r = TimeSeries.autocorr(df, "k", "b", "n", maxLag = 2)
      .collect().map(x => x.getAs[Int]("lag") -> x.getAs[Double]("r")).toMap
    // lag-1 estimator over 7 pairs: every product term is (1-2)(3-2) = -1
    assert(r(1) < -0.8, s"lag-1 should be strongly negative: $r")
    assert(r(2) > 0.6, s"lag-2 should be strongly positive: $r")
  }

  test("autocorr: constant series yields NULL r") {
    val df = (1 to 6).map(i => ("k", i.toLong, 5L)).toDF("k", "b", "n")
    val rows = TimeSeries.autocorr(df, "k", "b", "n", maxLag = 1).collect()
    assert(rows.length == 1 && rows.head.isNullAt(rows.head.fieldIndex("r")))
  }

  test("ewmaDyadic: constant series gives wsum = c * wmass") {
    val df = (1 to 12).map(i => ("k", i.toLong, 7L)).toDF("k", "b", "n")
    val bad = TimeSeries.ewmaDyadic(df, "k", "b", "n", depth = 4)
      .filter(col("wsum") =!= col("wmass") * lit(7L)).count()
    assert(bad == 0L)
  }

  test("rollingMedianX2 matches hand-computed trailing medians") {
    val df = Seq(("k", 1L, 5L), ("k", 2L, 1L), ("k", 3L, 9L), ("k", 4L, 3L))
      .toDF("k", "b", "n")
    val m = TimeSeries.rollingMedianX2(df, "k", "b", "n", windowRows = 3)
      .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("med_x2")).toMap
    assert(m == Map(1L -> 10L,  // [5] -> 5
                    2L -> 6L,   // [1,5] -> 3
                    3L -> 10L,  // [1,5,9] -> 5
                    4L -> 6L))  // [1,3,9] -> 3
  }

  test("cohenKappa: perfect agreement = 1e6; constant-vs-varied ≈ 0") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c"))
      .toDF("x", "y")
    assert(Audit.cohenKappa(perfect, "x", "y").head()
      .getAs[Long]("kappa_e6") == 1000000L)
    // y constant: observed agreement equals chance exactly -> kappa 0
    val chance = Seq(("a", "a"), ("b", "a"), ("a", "a"), ("b", "a"))
      .toDF("x", "y")
    assert(Audit.cohenKappa(chance, "x", "y").head()
      .getAs[Long]("kappa_e6") == 0L)
  }

  test("robustScale: (v - median)/IQR with exact quartiles; nulls kept") {
    // values 1..5: median 3, q1 2, q3 4, IQR 2
    val df = ((1 to 5).map(i => ("g", Some(i.toDouble))) :+ ("g", None))
      .toDF("g", "v")
    val got = GroupNormalizer.robustScale(df, "g", "v")
      .collect().map(r => Option(r.get(r.fieldIndex("v"))) ->
        Option(r.get(r.fieldIndex("r")))).toMap
    assert(got(Some(1.0)).contains(-1.0))
    assert(got(Some(3.0)).contains(0.0))
    assert(got(Some(5.0)).contains(1.0))
    assert(got(None).isEmpty)
  }

  test("refIntegrity + triangleCount survive empty inputs") {
    val empty = spark.emptyDataFrame
      .withColumn("src", lit(1L)).filter(lit(false))
      .withColumn("dst", lit(1L))
    val t = graft.operators.PageRank
      .triangleCount(empty.select(col("src"), col("dst")), "src", "dst")
      .head().getLong(0)
    assert(t == 0L)
  }
}
