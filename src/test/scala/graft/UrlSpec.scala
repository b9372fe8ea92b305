package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions

class UrlSpec extends SparkSuite {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.normalizeUrl(col("u")))
      .as[String].collect().toSeq

  test("normalizeUrl: case, ports, fragments, tracking params, slashes") {
    val out = norm(
      "HTTP://WWW.Example.COM:80/A/b/?utm_source=x&id=1&gclid=z#frag",
      "https://user:pw@Host.org:443/path/",
      "https://host.org:8443/path",      // non-default port kept
      "https://a.b/?utm_campaign=only",  // query becomes empty -> no "?"
      "http://x.y",                      // empty path -> "/"
      "not-a-url")                       // non-absolute passthrough
    assert(out == Seq(
      "http://www.example.com/A/b?id=1",
      "https://host.org/path",
      "https://host.org:8443/path",
      "https://a.b/",
      "http://x.y/",
      "not-a-url"))
  }

  test("registeredDomain: multi-part suffixes, plain hosts, short hosts") {
    val out = Seq("www.foo.co.uk", "a.b.foo.example.com", "example.com",
        "localhost")
      .toDF("h").select(UrlFunctions.registeredDomain(col("h")))
      .as[String].collect().toSeq
    assert(out == Seq("foo.co.uk", "example.com", "example.com", "localhost"))
  }

  test("domainCapSample: cap respected, salt- and partitioning-invariant") {
    val docs = (0L until 200L).map { i =>
      (i, s"https://www.site${i % 5}.com/p/$i", s"text $i")
    }.toDF("doc_id", "url", "text")
    val kept = UrlFunctions.domainCapSample(docs, "doc_id", "url", cap = 7)
    val perDomain = kept.groupBy("domain").count().as[(String, Long)]
      .collect().toMap
    assert(perDomain.size == 5 && perDomain.values.forall(_ == 7L))
    // identical survivors regardless of salt count or input partitioning
    val ids = kept.select("doc_id").as[Long].collect().toSet
    val ids1 = UrlFunctions.domainCapSample(docs, "doc_id", "url", 7, salts = 1)
      .select("doc_id").as[Long].collect().toSet
    val idsRep = UrlFunctions.domainCapSample(docs.repartition(13),
        "doc_id", "url", 7).select("doc_id").as[Long].collect().toSet
    assert(ids == ids1 && ids == idsRep)
  }

  test("dedupLines keeps first occurrences in order") {
    import graft.functions.{TextFunctions => TF}
    val out = Seq("a b c\nx y\na b c\nz\nx y")
      .toDF("t").select(TF.dedupLines(col("t"))).as[String].head()
    assert(out == "a b c\nx y\nz")
  }

  test("filterLines drops short, shouty, and boilerplate lines") {
    import graft.functions.{TextFunctions => TF}
    val text = Seq(
      "this line has plenty of words",  // kept
      "ok go",                          // < 3 words
      "BREAKING NEWS ALERT",            // all caps
      "Click Here",                     // boilerplate (case-insensitive)
      "Mixed Case line stays put",      // kept (upper ratio low)
      "").mkString("\n")                // empty
    val out = TF.lineFilterTable(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long)].head()
    assert(out._2 ==
      "this line has plenty of words\nMixed Case line stays put")
    assert(out._3 == 2L && out._4 == 4L)
  }

  test("domainCapSample plan: every window is domain-partitioned, no single-partition exchange") {
    val docs = (0L until 100L).map(i => (i, s"https://s${i % 3}.com/$i"))
      .toDF("doc_id", "url")
    val q = UrlFunctions.domainCapSample(docs, "doc_id", "url", 5)
    val plan = q.queryExecution.executedPlan.toString
    val winLines = plan.split("\n").filter(_.contains("Window ["))
    assert(winLines.nonEmpty && winLines.forall(_.contains("domain")),
      plan.take(800))
    assert(!plan.contains("SinglePartition"), plan.take(800))
  }

  test("TopK.perKey plans a WindowGroupLimit (pre-shuffle k-heaps)") {
    val df = (1 to 300).map(i => (i.toLong, s"g${i % 3}", i * 1.5))
      .toDF("id", "g", "v")
    val q = graft.core.TopK.perKey(df, Seq("g"), 4,
      Seq(col("v").desc_nulls_last, col("id").asc))
    assert(q.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
    assert(q.count() == 12)
    // exact agreement with a full-sort reference
    val naive = df.as[(Long, String, Double)].collect().toSeq
      .groupBy(_._2).values
      .flatMap(g => g.sortBy(t => (-t._3, t._1)).take(4).map(_._1)).toSet
    assert(q.select("id").as[Long].collect().toSet == naive)
  }

  test("line ops plan: per-row kernels, no aggregation shuffle") {
    import graft.functions.{TextFunctions => TF}
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "text")
    // lineFilterTable is a per-row kernel behind ONE compute-dense
    // round-robin rebalance (r12, Rebalance doc) — never a hash shuffle
    val lfPlan = TF.lineFilterTable(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!lfPlan.contains("Exchange hashpartitioning"), lfPlan.take(500))
    assert(lfPlan.split("Exchange").length - 1 <= 1, lfPlan.take(500))
    // the Column form stays a pure projection: zero exchanges
    val dlPlan = docs.select(TF.dedupLines(col("text")))
      .queryExecution.executedPlan.toString
    assert(!dlPlan.contains("Exchange"), dlPlan.take(500))
  }

  test("domainStats: token shares sum to ~10000 and counts are exact") {
    val docs = Seq(
      (1L, "https://a.com/x", "one two three"),
      (2L, "https://b.com/y", "four five"),
      (3L, "https://sub.a.com/z", "six"))
      .toDF("doc_id", "url", "text")
    val stats = UrlFunctions.domainStats(docs, "url", "text")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.map(s => (s._1, s._2, s._3)).toSeq ==
      Seq(("a.com", 2L, 4L), ("b.com", 1L, 2L)))
    assert(math.abs(stats.map(_._4).sum - 10000L) <= 1)
  }
}
