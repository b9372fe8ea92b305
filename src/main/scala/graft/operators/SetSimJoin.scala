package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** EXACT Jaccard-threshold set-similarity join — the deterministic
  * complement to the LSH family: MinHash/SimHash trade recall for speed
  * and [[NgramJaccard]] trusts a caller-chosen block key;
  * this join PROVABLY finds every pair with J ≥ t and nothing about it is
  * probabilistic. Candidate generation is Chaudhuri-style prefix
  * filtering under one GLOBAL rare-first token order: if J(A,B) ≥ t then
  * |A∩B| ≥ t·|A∪B|, so A and B must share a token among the
  * ⌊(1−t)·|A|⌋+1 rarest of A (else the overlap can't reach the bound) —
  * candidates come from an equi-join on prefix tokens, never a cross
  * product, and the degenerate shared-token case is engineered away by
  * the rare-first order. Exact verification is one allocation-free sorted
  * merge count per candidate ([[graft.functions.SortedIntersectCount]]
  * over the numerically-sorted encoded arrays) in PURE INTEGER arithmetic
  * (e4-floored Jaccard vs the e4-scaled threshold — no float ever decides
  * a pair).
  *
  * The same construction (in SQL) is the validated scale-safe oracle twin
  * for the brute-force Jaccard oracles — here it is the ENGINE operator.
  * Cost at 100 TB: one explode + count (token frequencies), one prefix
  * window per set (key-partitioned), one equi-join on rare tokens with
  * length/positional pruning riding in the join condition, and
  * verification proportional to SURVIVING candidates (which is
  * output-bound for any corpus that isn't mostly duplicates).
  *
  * TOKEN ENCODING: string tokens are mapped to 64-bit ids
  * (xxhash64, Spark's fixed seed) BEFORE any shuffle — frequency count,
  * prefix join, candidate join, and verification all move 8-byte longs
  * instead of raw shingle strings (a word 3-shingle averages ~20 bytes +
  * UnsafeRow string overhead per copy, and the old spelling shipped full
  * string ARRAYS through the verification joins — measured as the widest
  * shuffles of the whole dedup family). All set arithmetic (sizes,
  * intersections, the pruning bounds) is preserved exactly whenever the
  * hash is injective on the REALIZED vocabulary; we do NOT rely on the
  * tempting quotient-monotonicity argument, which is false — a collision
  * can lower apparent Jaccard (merge two tokens inside one set) as well
  * as raise it. Collision risk is birthday-bounded at n²/2⁶⁵ for n
  * distinct tokens (< 10⁻⁵ below 10⁸ tokens) and the hash is
  * deterministic (fixed seed), so a collision is reproducible and caught
  * by any oracle sweep at the deployment's scale rather than flickering.
  * Corpora beyond ~10⁹ distinct shingles should pre-screen with one
  * vocabulary-sized aggregate (group distinct tokens by hash, assert
  * max multiplicity 1) before trusting the exactness claim. Sets whose
  * elements are ALREADY integral pass through unencoded. */
object SetSimJoin {

  /** Element type of `df`'s array column `setCol` (errors on non-array). */
  private def elemType(df: DataFrame, setCol: String): DataType =
    df.schema(setCol).dataType match {
      case ArrayType(et, _) => et
      case t => throw new IllegalArgumentException(
        s"$setCol must be an array column, got $t")
    }

  /** 64-bit-encode a string-element set column in place (order-preserving
    * pointwise xxhash64); non-string sets pass through untouched. */
  private def encoded(setC: Column, et: DataType): Column =
    if (et == StringType) transform(setC, t => xxhash64(t)) else setC

  /** Vocabulary pre-screen for the 64-bit token-encoding wager (object
    * doc): ONE vocabulary-sized aggregate proving the hash is injective
    * on the REALIZED vocabulary — the runnable form of the ≳10⁹-token
    * deployment recipe, instead of prose. Explodes `setCol`, reduces to
    * distinct tokens (two-phase distinct, so the map side collapses
    * duplicates before the only shuffle), groups them by hash and asserts
    * max multiplicity 1. Returns the distinct-token count; throws naming
    * a colliding hash (and two of its tokens) if the wager fails, so the
    * caller never silently trusts a broken encoding. `hashCol` is
    * injectable for tests — a genuine xxhash64 collision is not
    * constructible on demand — and production callers use the default,
    * the SAME pointwise hash [[encoded]] applies. Non-string element
    * types are never encoded, so they pass trivially (vocab size still
    * returned). Cost at 100 TB: corpus-sized explode that collapses
    * map-side, then vocabulary-sized work only. */
  def assertInjective(df: DataFrame, setCol: String,
      hashCol: Column => Column = xxhash64(_)): Long = {
    val toks = df.select(explode(col(setCol)).as("_t"))
      .where(col("_t").isNotNull).distinct()
    if (elemType(df, setCol) != StringType) return toks.count()
    val byHash = toks.groupBy(hashCol(col("_t")).as("_h"))
      .agg(count(lit(1)).as("_m"))
    val agg = byHash
      .agg(count(lit(1)).as("_vocabHashes"), max(col("_m")).as("_maxm"),
        sum(col("_m")).as("_vocab")).head()
    if (agg.isNullAt(1)) return 0L // empty vocabulary
    if (agg.getLong(1) > 1L) {
      val ex = toks.groupBy(hashCol(col("_t")).as("_h"))
        .agg(count(lit(1)).as("_m"),
          sort_array(collect_set(col("_t"))).as("_ts"))
        .filter(col("_m") > 1).limit(1).head()
      val samples = ex.getSeq[String](2).take(2).mkString("\" / \"")
      throw new IllegalStateException(
        s"token encoding is NOT injective on this vocabulary: hash " +
          s"${ex.get(0)} covers ${ex.getLong(1)} distinct tokens (e.g. " +
          s""""$samples") — do not trust the 64-bit set-sim encoding """ +
          "for this corpus")
    }
    agg.getLong(2)
  }

  /** PPJoin-style pruning predicates (Xiao et al. 2008), applied INSIDE
    * the prefix equi-join on the integer metadata (set size `_n`, prefix
    * position `_r`) riding with each prefix token. The bare prefix join
    * admits every pair sharing one rare token — measured at ~100× the
    * true pair count on a synthetic-vocabulary corpus — and verification
    * ships both full arrays per candidate, so candidate count IS the
    * family's cost. Both filters are provably safe for every pair with
    * J·10⁴ ≥ minE4:
    *  - LENGTH: J ≤ min(|A|,|B|)/max(|A|,|B|), so
    *    min·10⁴ ≥ minE4·max must hold.
    *  - POSITIONAL: the EARLIEST shared token in the global order is in
    *    both prefixes (prefixes are downward-closed in that order), at
    *    positions (i, j); every shared token sits at or after it, so
    *    |A∩B| ≤ 1 + min(|A|−i, |B|−j). J ≥ t also forces
    *    |A∩B| ≥ ⌈t·(|A|+|B|)/(1+t)⌉ = ⌈minE4·(na+nb)/(10⁴+minE4)⌉.
    *    A qualifying pair's earliest-shared row passes, so keeping pairs
    *    where ANY joined row passes loses nothing.
    * All arithmetic stays e4-integer (`div`, never float). */
  private def prunedJoinCond(minE4: Long): Column = {
    val aDen = 10000L + minE4
    col("a._g") === col("b._g") &&
      expr(s"least(a._n, b._n) * 10000 >= greatest(a._n, b._n) * $minE4") &&
      expr(s"1 + least(a._n - a._r, b._n - b._r) >= " +
        s"($minE4 * (a._n + b._n) + $aDen - 1) div $aDen")
  }

  /** Provably complete candidate pairs for a Jaccard-threshold join —
    * prefix filtering plus the safe length/positional pruning,
    * verification left to the caller. Every (left, right) pair whose true
    * Jaccard satisfies J·10⁴ ≥ `minE4` appears in the output (among
    * extras the caller's verifier rejects); nothing about it is
    * probabilistic, unlike LSH banding whose recall at the threshold is
    * (1−t^r)^b < 1. Both set columns must hold DISTINCT elements per row;
    * empty sets never pair.
    *
    * One GLOBAL rare-first token order is computed over BOTH sides'
    * tokens — completeness holds under any total order shared by the two
    * prefixes (Chaudhuri et al. 2006); rare-first merely keeps prefixes
    * selective. Callers whose verifier ROUNDS (round-half-up at e4
    * accepts true J down to t − 0.5e-4) must pass `minE4` one ulp below
    * the nominal bound, i.e. t·10⁴ − 1, or boundary pairs that round up
    * could be missed by a prefix sized for t exactly.
    *
    * `selfJoin = true` treats the two inputs as the same relation and
    * emits each unordered pair once (left id < right id). For the
    * self-join CASE prefer [[jaccardSelfJoin]]/[[selfJoinPairs]]: they
    * explode the relation ONCE (this form explodes both sides), carry the
    * distinct-set pre-pass, and verify inline.
    *
    * Cost at 100 TB: one explode + frequency count per side, one
    * key-partitioned prefix window each, one equi-join on rare prefix
    * tokens — never a cross product, never a banding table. */
  def jaccardCandidates(left: DataFrame, leftId: String, leftSet: String,
      right: DataFrame, rightId: String, rightSet: String,
      minE4: Long, selfJoin: Boolean = false): DataFrame = {
    require(minE4 >= 1 && minE4 <= 10000,
      s"minE4 must be in [1, 10000]: $minE4")
    require(leftId != rightId,
      "output columns are named after the id columns — alias one side")
    // both sides must hash under the SAME encoding, or the prefix join
    // would compare a hashed token against a raw one
    require(elemType(left, leftSet) == elemType(right, rightSet),
      s"set element types must match: ${elemType(left, leftSet)} vs " +
        s"${elemType(right, rightSet)}")
    // _n as BIGINT from birth: every pruning/prefix formula multiplies
    // it by up to 10⁴+minE4, and an IntegerType size wraps silently past
    // ~214k tokens under non-ANSI eval — flipping a completeness filter.
    // Tokens 64-bit-encode BEFORE the explode (see object doc) so every
    // downstream shuffle moves longs, never shingle strings.
    val le = left.select(col(leftId).as("_lid"),
        size(col(leftSet)).cast("long").as("_n"),
        explode(encoded(col(leftSet), elemType(left, leftSet))).as("_g"))
    val re = right.select(col(rightId).as("_rid"),
        size(col(rightSet)).cast("long").as("_n"),
        explode(encoded(col(rightSet), elemType(right, rightSet))).as("_g"))
    val gf = le.select(col("_g")).unionAll(re.select(col("_g")))
      .groupBy(col("_g")).agg(count(lit(1)).as("_f"))
    def prefix(e: DataFrame, id: String): DataFrame = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("_f").asc, col("_g").asc)
      e.join(gf, Seq("_g"))
        .withColumn("_r", row_number().over(w))
        // n − ⌈t·n⌉ + 1 in the same pure-integer spelling as
        // [[selfJoinPairs]] — float (1−t)·n would shave the prefix
        .filter(col("_r") <= expr(
          s"_n - (_n * $minE4 + 9999) div 10000 + 1"))
        .select(col(id), col("_g"), col("_r"), col("_n"))
    }
    prefix(le, "_lid").as("a")
      .join(prefix(re, "_rid").as("b"),
        if (selfJoin) prunedJoinCond(minE4) && col("a._lid") < col("b._rid")
        else prunedJoinCond(minE4))
      .select(col("a._lid").as(leftId), col("b._rid").as(rightId))
      .distinct()
  }

  /** Pairs (id_a < id_b, jaccard_e4) with floor(J·10⁴) ≥ floor(t·10⁴).
    * `setCol` must hold DISTINCT elements per row (array_distinct first
    * if unsure); empty sets never pair. See [[selfJoinPairs]] for the
    * execution shape (distinct-set pre-pass, single prefix window,
    * length/positional pruning). */
  def jaccardSelfJoin(df: DataFrame, idCol: String, setCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    // clamp: thresholds below 1e-4 floor to 0 — treat them as the
    // smallest representable bound (prefix = whole set) instead of
    // tripping selfJoinPairs' minE4 ≥ 1 contract
    val tE4 = math.max(1L, math.floor(threshold * 10000).toLong)
    selfJoinPairs(df, idCol, setCol, tE4,
      (_, _, _, jE4) => jE4 >= tE4)
  }

  /** Shared self-join engine: distinct-set pre-pass → ONE exploded
    * relation / ONE frequency aggregate / ONE prefix window → pruned
    * prefix equi-join → exact verification once per distinct-set pair →
    * re-expansion through copy groups. Returns (id_a, id_b, jaccard_e4)
    * with id_a < id_b and jaccard_e4 = floor(J·10⁴);
    * `keepPair(inter, na, nb, jaccardE4)` decides which verified pairs
    * survive from the EXACT intersection count and the two set sizes —
    * full arrays never reach the predicate (and the engine computes the
    * intersection COUNT with one allocation-free sorted merge walk,
    * [[graft.functions.SortedIntersectCount]], never materializing the
    * intersection array). Intra-copy-group pairs are emitted directly at
    * J = 1 without verification, so `keepPair` must accept
    * (inter = n, n, n, 10000). Under the 64-bit encoding these counts are
    * those of the TRUE sets per the injectivity contract (object doc).
    * `minE4` sizes the prefix: completeness holds for every pair with
    * J·10⁴ ≥ minE4, so callers whose `keepPair` rounds half-up at e4
    * must pass t·10⁴ − 1 (see [[jaccardCandidates]]).
    *
    * DISTINCT-SET PRE-PASS: rows with identical sets (md5 of the sorted
    * serialization — the same content key [[ExactDedup]] uses) collapse to
    * one representative BEFORE candidate generation; prefix filtering and
    * the exact array_intersect verification run once per distinct set
    * pair, and id pairs re-expand through the copy groups afterwards.
    * On a duplicate-heavy corpus this turns quadratic-in-multiplicity
    * VERIFICATION into distinct-pair verification plus an output-sized
    * expansion join. Token frequencies over distinct sets change only the
    * prefix ORDER (completeness holds under any global order), never the
    * result.
    *
    * No explicit materialization: every consumer (candidates, both
    * verification sides, member expansion) sits under ONE action, so
    * Spark's ReuseExchange computes each repeated exchange once — an
    * eager localCheckpoint of the shingle frame was measured SLOWER here
    * (it serializes full arrays and turns a pipelined plan into
    * sequential barriers). */
  private[graft] def selfJoinPairs(df: DataFrame, idCol: String,
      setCol: String, minE4: Long,
      keepPair: (Column, Column, Column, Column) => Column): DataFrame = {
    require(minE4 >= 1 && minE4 <= 10000,
      s"minE4 must be in [1, 10000]: $minE4")
    val et = elemType(df, setCol)
    // copy groups: group key = md5 over the sorted ORIGINAL elements
    // (NUL-joined; elements are tokens, never null), representative id =
    // min member id. The key is computed MAP-SIDE from the raw tokens --
    // two rows group together iff their true sets are identical, with no
    // dependence on the 64-bit encoding -- and the raw array is dropped
    // before the first shuffle: everything that moves from here on is the
    // encoded long array, re-sorted NUMERICALLY after encoding (the text
    // sort above orders by token string, not hash value) so verification's
    // merge walk ([[graft.functions.SortedIntersectCount]]) gets its
    // ascending-order contract; integral inputs skip the encode and the
    // first sort IS their numeric sort. Sizes and intersection counts are
    // those of the true sets under the injectivity contract (object doc).
    val keyArr =
      if (et == StringType) col("_set")
      else transform(col("_set"), e => e.cast("string"))
    // integral sets strip null ELEMENTS up front: they skip the encode, so
    // their raw array feeds [[graft.functions.SortedIntersectCount]]'s
    // null-free getLong walk directly — array_sort puts nulls last and the
    // kernel would read them as garbage longs. A null is not a token, so
    // dropping it is set semantics, and the group key below then agrees
    // with the verified sets. String sets are non-null by construction
    // (shingle/tokenizer outputs declare containsNull = false) — no HOF
    // pass spent on them.
    val inSet =
      if (et == StringType) col(setCol)
      else filter(col(setCol), e => e.isNotNull)
    val rows = df
      .select(col(idCol).as("_id"), array_sort(inSet).as("_set"))
      .withColumn("_key", md5(concat_ws("\u0000", keyArr)))
      .withColumn("_set",
        if (et == StringType) array_sort(encoded(col("_set"), et))
        else col("_set"))
    // _n as BIGINT (see [[jaccardCandidates]]): the pruning arithmetic
    // multiplies set sizes by up to 10⁴+minE4, past int range for long
    // documents
    val groups = rows.groupBy(col("_key"))
      .agg(min(col("_id")).as("_gid"), first(col("_set")).as("_set"),
        size(first(col("_set"))).cast("long").as("_n"))
    val members = rows.select(col("_key"), col("_id"))
      .join(groups.select(col("_key"), col("_gid"), col("_n")), Seq("_key"))
      .select(col("_gid"), col("_id"), col("_n"))
    // candidate generation over DISTINCT sets only: one explode, one
    // frequency aggregate, one prefix window
    val reps = groups.select(col("_gid").as("_id"), col("_set"), col("_n"))
    val e = reps.select(col("_id"), col("_n"), explode(col("_set")).as("_g"))
    val gf = e.groupBy(col("_g")).agg(count(lit(1)).as("_f"))
    val w = Window.partitionBy(col("_id"))
      .orderBy(col("_f").asc, col("_g").asc)
    val pf = e.join(gf, Seq("_g"))
      .withColumn("_r", row_number().over(w))
      // prefix length n − ⌈t·n⌉ + 1 in PURE INTEGER arithmetic (the
      // effective e4 threshold): float spellings of (1−t)·n dip below
      // the exact value (1.0 − 0.8 = 0.1999…96) and would shave the
      // prefix — a silent completeness hole at multiples of the scale
      .filter(col("_r") <= expr(
        s"_n - (_n * $minE4 + 9999) div 10000 + 1"))
      .select(col("_id"), col("_g"), col("_r"), col("_n"))
    val cand = pf.as("a")
      .join(pf.as("b"), prunedJoinCond(minE4) && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    val repPairs = cand
      .join(reps.select(col("_id").as("id_a"), col("_set").as("_sa"),
        col("_n").as("_na")), "id_a")
      .join(reps.select(col("_id").as("id_b"), col("_set").as("_sb"),
        col("_n").as("_nb")), "id_b")
      // allocation-free sorted merge count — array_intersect built a hash
      // set AND materialized the intersection array per candidate, just
      // to take its length (measured as the verify stage's cost at the
      // ~10×-output candidate volume a near-dup corpus emits)
      .withColumn("_inter", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("_sa"), col("_sb")))
      // any candidate shares ≥1 token, so the union is never 0
      .withColumn("jaccard_e4",
        floor(col("_inter") * lit(10000L) /
          (col("_na") + col("_nb") - col("_inter")))
          .cast("long"))
      .filter(keepPair(col("_inter"), col("_na"), col("_nb"),
        col("jaccard_e4")))
      .select(col("id_a").as("_ga"), col("id_b").as("_gb"),
        col("jaccard_e4"))
    // re-expand: cross the member ids of each qualifying group pair
    // (distinct groups → distinct ids, so least/greatest orients cleanly)
    val inter = repPairs
      .join(members.select(col("_gid").as("_ga"), col("_id").as("_xa")),
        Seq("_ga"))
      .join(members.select(col("_gid").as("_gb"), col("_id").as("_xb")),
        Seq("_gb"))
      .select(least(col("_xa"), col("_xb")).as("id_a"),
        greatest(col("_xa"), col("_xb")).as("id_b"), col("jaccard_e4"))
    // intra-group pairs: identical NON-EMPTY sets share everything — J = 1
    // exactly, 10000 ≥ minE4 for every legal threshold; empty sets have no
    // tokens to join on and never paired before the pre-pass either
    val me = members.filter(col("_n") > 0).select(col("_gid"), col("_id"))
    val intra = me.as("x")
      .join(me.as("y"),
        col("x._gid") === col("y._gid") && col("x._id") < col("y._id"))
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"),
        lit(10000L).as("jaccard_e4"))
    inter.unionByName(intra)
  }
}
