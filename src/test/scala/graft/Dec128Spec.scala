package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.Dec128

/** Bit-parity pins for the int128 exact-decimal-sum kernel: every assertion
  * compares [[Dec128]] against the built-in `sum(cast(x as decimal(38,10)))`
  * spelling it replaces — the cast result per VALUE, the sum per GROUP
  * (partial/merge exercised via repartition), and the overflow contracts in
  * BOTH eval modes (ANSI throws, non-ANSI nulls; NaN/Inf → null in both).
  * Doubles cover subnormals, ±1e300, shortest-repr half-boundaries at the
  * 10th fractional digit, raw-bits randoms, and seeded random values across
  * 9 magnitude bands. */
class Dec128Spec extends SparkSuite {
  import spark.implicits._

  private val dec = DecimalType(38, 10)

  /** run a block with ANSI off, restoring the session default after. */
  private def withAnsiOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try body finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  // values that cast(… as decimal(38,10)) can represent — parity-testable
  // under the session-default ANSI mode without throwing
  private def representableDoubles: Seq[Double] = {
    val edge = Seq(
      0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.0 / 3.0,
      // subnormals and tiny
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
      1e-310, -1e-310, 2.2250738585072014e-308, 4.9e-324, 1e-11, 4.9999e-11,
      // half-up boundaries at the 10th fractional digit
      5e-11, -5e-11, 1.5e-10, -1.5e-10, 2.5e-10, 0.05, 0.12345678905,
      0.99999999995, 1.00000000005, -0.00000000015,
      // typical data magnitudes
      123.456, 145983.16, 25.0, 0.04, 0.9999999999999999, 9999999.999,
      1e7, 1.0000001e7, 6.25e-2, 3.141592653589793, -2.718281828459045,
      // precision-38 boundary from below: 27–28 integer digits still fit
      9.99e27, -9.99e27, 1.2345678901234567e27, 9.999999999999999e27)
    val r = new scala.util.Random(20260819L)
    val bands = Seq(1e-12, 1e-6, 1.0, 1e3, 1e6, 1e10, 1e15, 1e20, 1e26)
    val random = bands.flatMap { b =>
      (1 to 400).map(_ => (r.nextDouble() - 0.5) * 2.0 * b)
    }
    edge ++ random
  }

  // adds values the cast REJECTS (overflow / non-finite) — null-parity
  // under ANSI-off, throw-parity spot-checked separately
  private def overflowingDoubles: Seq[Double] = {
    val r = new scala.util.Random(77L)
    Seq(1e28, -1e28, 2e28, 1e30, -1e30, 1e300, -1e300,
      java.lang.Double.MAX_VALUE, -java.lang.Double.MAX_VALUE,
      java.lang.Double.NaN, java.lang.Double.POSITIVE_INFINITY,
      java.lang.Double.NEGATIVE_INFINITY) ++
      (1 to 800).map(_ => java.lang.Double.longBitsToDouble(r.nextLong()))
  }

  test("per-value parity (ANSI off): kernel == cast over the full adversarial set") {
    withAnsiOff {
      val vals = representableDoubles ++ overflowingDoubles
      val expected = vals.toDF("v").select(col("v").cast(dec)).collect()
        .map(r => if (r.isNullAt(0)) null else r.getDecimal(0))
      vals.zip(expected).foreach { case (d, exp) =>
        val conv = Dec128.fromDouble(d, 10, ansi = false)
        val got =
          if (conv == null) null
          else {
            val dd = Dec128.toDecimal(conv.getLong(0), conv.getLong(1), 10,
              ansi = false)
            if (dd == null) null else dd.toJavaBigDecimal
          }
        assert((got == null) == (exp == null),
          s"null-ness mismatch for $d (bits ${java.lang.Double.doubleToRawLongBits(d)}): kernel=$got cast=$exp")
        if (exp != null)
          assert(got.equals(exp),
            s"value mismatch for $d (bits ${java.lang.Double.doubleToRawLongBits(d)}): kernel=$got cast=$exp")
      }
    }
  }

  test("grouped-sum parity (session-default ANSI) incl. nulls and NaN/Inf, multi-partition merge") {
    val r = new scala.util.Random(42L)
    val vals: Seq[java.lang.Double] =
      representableDoubles.filter(d => math.abs(d) < 1e27)
        .map(java.lang.Double.valueOf) ++
      Seq(java.lang.Double.NaN, java.lang.Double.POSITIVE_INFINITY,
        java.lang.Double.NEGATIVE_INFINITY).map(java.lang.Double.valueOf) ++
      (1 to 200).map(_ => null.asInstanceOf[java.lang.Double])
    val shuffled = r.shuffle(vals)
    val df = shuffled.zipWithIndex
      .map { case (v, i) => (i.toLong % 23, Option(v).map(_.doubleValue)) }
      .toDF("k", "v").repartition(7)
    val a = df.groupBy("k").agg(sum(col("v").cast(dec)).as("s"))
    val b = df.groupBy("k").agg(Dec128.sumExact(col("v")).as("s"))
    val am = a.collect().map(r0 =>
      r0.getLong(0) -> (if (r0.isNullAt(1)) null else r0.getDecimal(1))).toMap
    val bm = b.collect().map(r0 =>
      r0.getLong(0) -> (if (r0.isNullAt(1)) null else r0.getDecimal(1))).toMap
    assert(am.keySet == bm.keySet)
    am.foreach { case (k, exp) =>
      val got = bm(k)
      assert((got == null) == (exp == null), s"group $k null-ness: $got vs $exp")
      if (exp != null) assert(got.equals(exp), s"group $k: $got vs $exp")
    }
    // and the double-cast the call sites consume is bit-identical
    val ad = a.select(col("k"), col("s").cast(DoubleType)).collect()
      .map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    val bd = b.select(col("k"), col("s").cast(DoubleType)).collect()
      .map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    ad.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(bd(k)), s"double bits differ for $k")
    }
  }

  test("long/int parity: cast is v*10^10 exactly, including Long extremes") {
    val rl = new scala.util.Random(7L)
    val longs: Seq[Long] = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue,
      Long.MaxValue - 1, Long.MinValue + 1, 999999999999L, -999999999999L) ++
      (1 to 500).map(_ => rl.nextLong())
    val df = longs.zipWithIndex.map { case (v, i) => (i.toLong % 11, v) }
      .toDF("k", "v").repartition(5)
    val a = df.groupBy("k").agg(sum(col("v").cast(dec)).as("s")).collect()
      .map(r0 => r0.getLong(0) -> r0.getDecimal(1)).toMap
    val b = df.groupBy("k").agg(Dec128.sumExact(col("v")).as("s")).collect()
      .map(r0 => r0.getLong(0) -> r0.getDecimal(1)).toMap
    a.foreach { case (k, exp) => assert(b(k).equals(exp), s"group $k") }
    val ints = Seq(Int.MaxValue, Int.MinValue, 0, 7, -13, 1000000)
    val dfi = ints.toDF("v")
    val ai = dfi.agg(sum(col("v").cast(dec))).collect()(0).getDecimal(0)
    val bi = dfi.agg(Dec128.sumExact(col("v"))).collect()(0).getDecimal(0)
    assert(bi.equals(ai))
  }

  test("float parity: cast widens to double first") {
    val rf = new scala.util.Random(9L)
    val floats = Seq(0.1f, -0.1f, 1.5e-10f, Float.MinPositiveValue, 123.456f,
      1e20f, -1e20f, 0.0f, -0.0f) ++
      (1 to 300).map(_ => rf.nextFloat() * 1e6f)
    val df = floats.toDF("v")
    val a = df.agg(sum(col("v").cast(dec))).collect()(0).getDecimal(0)
    val b = df.agg(Dec128.sumExact(col("v"))).collect()(0).getDecimal(0)
    assert(b.equals(a), s"$b vs $a")
  }

  test("null contracts: all-null, empty, NaN-only, transient over-38-digit sums") {
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    assert(allNull.agg(Dec128.sumExact(col("v"))).collect()(0).isNullAt(0))
    assert(allNull.agg(sum(col("v").cast(dec))).collect()(0).isNullAt(0))
    val empty = Seq.empty[Double].toDF("v")
    assert(empty.agg(Dec128.sumExact(col("v"))).collect()(0).isNullAt(0))
    val nanOnly = Seq(Double.NaN, Double.PositiveInfinity).toDF("v")
    // the cast nulls non-finite values in BOTH eval modes -> sum over no
    // non-null inputs -> null
    assert(nanOnly.agg(Dec128.sumExact(col("v"))).collect()(0).isNullAt(0))
    assert(nanOnly.agg(sum(col("v").cast(dec))).collect()(0).isNullAt(0))
    // a sum that exceeds 38 digits transiently but returns into range stays
    // exact (mod-2^128 accumulation == Spark's unbounded BigDecimal buffer)
    val transient = Seq(9.9e27, 9.9e27, -9.9e27, 1.0).toDF("v").repartition(1)
    val ta = transient.agg(sum(col("v").cast(dec))).collect()(0).getDecimal(0)
    val tb = transient.agg(Dec128.sumExact(col("v"))).collect()(0).getDecimal(0)
    assert(tb.equals(ta))
  }

  test("overflow contracts match the cast in both eval modes") {
    // ANSI (session default): per-value overflow throws for both spellings
    def throws(body: => Unit): Boolean =
      try { body; false } catch { case _: Throwable => true }
    val big = Seq(1e28, 2.0).toDF("v")
    assert(throws(big.agg(sum(col("v").cast(dec))).collect()))
    assert(throws(big.agg(Dec128.sumExact(col("v"))).collect()))
    // ... and final-sum overflow throws for both
    val over = Seq(6.3e27, 6.3e27).toDF("v")
    assert(throws(over.agg(sum(col("v").cast(dec))).collect()))
    assert(throws(over.agg(Dec128.sumExact(col("v"))).collect()))
    withAnsiOff {
      // non-ANSI: per-value overflow skips the value, like the cast …
      val ma = big.agg(sum(col("v").cast(dec))).collect()(0).getDecimal(0)
      val mb = big.agg(Dec128.sumExact(col("v"))).collect()(0).getDecimal(0)
      assert(mb.equals(ma))
      // … and final-sum overflow nulls for both (CheckOverflowInSum)
      assert(over.agg(sum(col("v").cast(dec))).collect()(0).isNullAt(0))
      assert(over.agg(Dec128.sumExact(col("v"))).collect()(0).isNullAt(0))
    }
  }

  test("scale variants: decimal(38,0) and decimal(38,18) parity on doubles and longs") {
    // scale 0 exercises HALF_UP at the integer boundary (x.5 away from 0)
    val ds = Seq(2.5, -2.5, 3.5, 0.5, -0.5, 0.49999999999, 123.456, -0.0,
      1e15, -1e15, 2.0 / 3.0, 1e-300) ++
      (1 to 500).map(i => (new scala.util.Random(11L).nextDouble() - 0.5) * 1e6)
    for (sc <- Seq(0, 18)) {
      val dfd = ds.toDF("v")
      val capped = if (sc == 18) dfd.filter(abs(col("v")) < 1e19) else dfd
      val a = capped.agg(sum(col("v").cast(DecimalType(38, sc)))).collect()(0)
        .getDecimal(0)
      val b = capped.agg(Dec128.sumExact(col("v"), sc)).collect()(0)
        .getDecimal(0)
      assert(b.equals(a), s"scale $sc doubles: $b vs $a")
    }
    val rl = new scala.util.Random(13L)
    val ls = Seq(Long.MaxValue, Long.MinValue, 0L, 5L, -7L) ++
      (1 to 300).map(_ => rl.nextLong())
    for (sc <- Seq(0, 18)) {
      // at scale 18 a few extreme longs legitimately overflow the sum —
      // cap so both spellings stay in range (the overflow-throw parity is
      // its own assertion below)
      val dfl = ls.filter(v => sc == 0 || math.abs(v.toDouble) < 1e17)
        .toDF("v")
      val a = dfl.agg(sum(col("v").cast(DecimalType(38, sc)))).collect()(0)
        .getDecimal(0)
      val b = dfl.agg(Dec128.sumExact(col("v"), sc)).collect()(0).getDecimal(0)
      assert(b.equals(a), s"scale $sc longs: $b vs $a")
    }
    // decimal-sum overflow at scale 18 throws ARITHMETIC_OVERFLOW for both
    def throws(body: => Unit): Boolean =
      try { body; false } catch { case _: Throwable => true }
    val big = Seq(Long.MaxValue, Long.MaxValue, Long.MaxValue,
      Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue,
      Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue,
      Long.MaxValue).toDF("v")
    assert(throws(big.agg(sum(col("v").cast(DecimalType(38, 18)))).collect()))
    assert(throws(big.agg(Dec128.sumExact(col("v"), 18)).collect()))
  }

  test("window-function parity: running and sliding decimal sums") {
    val r = new scala.util.Random(17L)
    val df = (1 to 2000).map(i =>
        (i % 4, i, if (i % 13 == 0) None else Some(r.nextDouble() * 1e5 - 5e4)))
      .toDF("g", "i", "v")
    val running = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy("i").rowsBetween(Long.MinValue, 0)
    val sliding = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy("i").rowsBetween(-2, 0)
    for (w <- Seq(running, sliding)) {
      val a = df.withColumn("s",
          sum(col("v").cast(dec)).over(w).cast(DoubleType))
        .orderBy("g", "i").collect().map(r0 =>
          if (r0.isNullAt(3)) null else r0.getDouble(3): Any)
      val b = df.withColumn("s",
          Dec128.sumExact(col("v")).over(w).cast(DoubleType))
        .orderBy("g", "i").collect().map(r0 =>
          if (r0.isNullAt(3)) null else r0.getDouble(3): Any)
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"row $i: $x vs $y") }
    }
  }

  test("fast paths: integral doubles around the 1e7 guard, memo-cache hits and slot collisions") {
    // integral fast path boundary: integral values below/at/above 1e7, and
    // near-integral neighbors that must take the slow path
    val integralish = Seq(1.0, -1.0, 50.0, 9999999.0, -9999999.0, 1e7, -1e7,
      1.0000001e7, 12345678.0, 2.0e7, 4503599627370496.0, // 2^52, integral
      9999999.0000001, 49.999999999999996, 3.0000000000000004)
    // memo-cache: a low-cardinality non-integral column (the cache's target
    // shape) summed over many rows — hit path must reproduce the cast sums
    val lowCard = (1 to 20000).map(i =>
      (i % 7, Seq(0.04, 0.0575, 123.45, -9.99, 1.0 / 3.0)(i % 5)))
    // slot collisions: raw-bit randoms that share a direct-mapped slot with
    // one of the low-card values — key compare must force recompute
    def slot(d: Double): Long =
      (java.lang.Double.doubleToRawLongBits(d) * -7046029254386353131L) >>> 54
    val target = slot(0.0575)
    val r = new scala.util.Random(2026L)
    val colliders = Iterator.continually(r.nextDouble() * 1e4 + 0.1)
      .filter(d => slot(d) == target).take(3).toSeq
    assert(colliders.nonEmpty)
    val vals = integralish ++ colliders
    withAnsiOff {
      val expected = vals.toDF("v").select(col("v").cast(dec)).collect()
        .map(r0 => if (r0.isNullAt(0)) null else r0.getDecimal(0))
      vals.zip(expected).foreach { case (d, exp) =>
        // twice per value: second call reads the memo slot written by the first
        (1 to 2).foreach { pass =>
          val conv = Dec128.fromDouble(d, 10, ansi = false)
          val got = if (conv == null) null
            else Dec128.toDecimal(conv.getLong(0), conv.getLong(1), 10,
              ansi = false).toJavaBigDecimal
          assert((got == null) == (exp == null), s"pass $pass null-ness for $d")
          if (exp != null) assert(got.equals(exp), s"pass $pass for $d: $got vs $exp")
        }
      }
      // interleave colliding keys so the shared slot thrashes — parity holds
      val thrash = (1 to 50).flatMap(_ => Seq(0.0575) ++ colliders)
      val ta = thrash.toDF("v").agg(sum(col("v").cast(dec))).collect()(0)
        .getDecimal(0)
      val tb = thrash.toDF("v").agg(Dec128.sumExact(col("v"))).collect()(0)
        .getDecimal(0)
      assert(tb.equals(ta))
    }
    val df = lowCard.toDF("k", "v").repartition(6)
    val a = df.groupBy("k").agg(sum(col("v").cast(dec)).as("s")).collect()
      .map(r0 => r0.getInt(0) -> r0.getDecimal(1)).toMap
    val b = df.groupBy("k").agg(Dec128.sumExact(col("v")).as("s")).collect()
      .map(r0 => r0.getInt(0) -> r0.getDecimal(1)).toMap
    a.foreach { case (k, exp) => assert(b(k).equals(exp), s"group $k") }
  }

  test("plan: dec128_sum rides HashAggregate inside whole-stage codegen") {
    val df = (1 to 1000).map(i => (i % 5, i * 1.5)).toDF("k", "v")
      .groupBy("k").agg(Dec128.sumExact(col("v")).as("s"))
    df.write.format("noop").mode("overwrite").save()
    // under AQE the real operators live in the adaptive plan's executed
    // subtree — collect through it
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val aggs = plan.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h }
    assert(aggs.nonEmpty, "expected HashAggregateExec")
    aggs.foreach(h => assert(h.supportCodegen,
      s"HashAggregate with dec128_sum must support codegen: $h"))
    assert(plan.toString.contains("dec128_sum"))
  }
}
