package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT Jaccard-threshold set-similarity self-join — the deterministic
  * complement to the LSH family: MinHash/SimHash trade recall for speed
  * and [[graft.functions.NgramJaccard]] trusts a caller-chosen block key;
  * this join PROVABLY finds every pair with J ≥ t and nothing about it is
  * probabilistic. Candidate generation is Chaudhuri-style prefix
  * filtering under one GLOBAL rare-first token order: if J(A,B) ≥ t then
  * |A∩B| ≥ t·|A∪B|, so A and B must share a token among the
  * ⌊(1−t)·|A|⌋+1 rarest of A (else the overlap can't reach the bound) —
  * candidates come from an equi-join on prefix tokens, never a cross
  * product, and the degenerate shared-token case is engineered away by
  * the rare-first order. Exact verification is one array_intersect per
  * candidate in PURE INTEGER arithmetic (e4-floored Jaccard vs the
  * e4-scaled threshold — no float ever decides a pair).
  *
  * The same construction (in SQL) is the validated scale-safe oracle twin
  * for the brute-force Jaccard oracles — here it is the ENGINE operator.
  * Cost at 100 TB: one explode + count (token frequencies), one prefix
  * window per set (key-partitioned), one equi-join on rare tokens, and
  * verification proportional to CANDIDATES (which is output-bound for
  * any corpus that isn't mostly duplicates). */
object SetSimJoin {

  /** Pairs (id_a < id_b, jaccard_e4) with floor(J·10⁴) ≥ floor(t·10⁴).
    * `setCol` must hold DISTINCT elements per row (array_distinct first
    * if unsure); empty sets never pair. */
  def jaccardSelfJoin(df: DataFrame, idCol: String, setCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    val tE4 = math.floor(threshold * 10000).toLong
    val e = df.select(col(idCol).as("_id"), explode(col(setCol)).as("_g"))
    val gf = e.groupBy(col("_g")).agg(count(lit(1)).as("_f"))
    val sz = df.select(col(idCol).as("_id"),
      size(col(setCol)).as("_n"))
    val w = Window.partitionBy(col("_id"))
      .orderBy(col("_f").asc, col("_g").asc)
    val pf = e.join(gf, Seq("_g"))
      .withColumn("_r", row_number().over(w))
      .join(sz, Seq("_id"))
      // prefix length n − ⌈t·n⌉ + 1 in PURE INTEGER arithmetic (the
      // effective e4-floored threshold): float spellings of (1−t)·n dip
      // below the exact value (1.0 − 0.8 = 0.1999…96) and would shave the
      // prefix — a silent completeness hole at multiples of the scale
      .filter(col("_r") <= expr(
        s"_n - (_n * $tE4 + 9999) div 10000 + 1"))
      .select(col("_id"), col("_g"))
    val cand = pf.as("a")
      .join(pf.as("b"),
        col("a._g") === col("b._g") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    cand
      .join(df.select(col(idCol).as("id_a"), col(setCol).as("_sa")), "id_a")
      .join(df.select(col(idCol).as("id_b"), col(setCol).as("_sb")), "id_b")
      .withColumn("_inter", size(array_intersect(col("_sa"), col("_sb"))))
      // any candidate shares ≥1 token, so the union is never 0
      .withColumn("jaccard_e4",
        floor(col("_inter") * lit(10000L) /
          (size(col("_sa")) + size(col("_sb")) - col("_inter")))
          .cast("long"))
      .filter(col("jaccard_e4") >= tE4)
      .select(col("id_a"), col("id_b"), col("jaccard_e4"))
  }
}
