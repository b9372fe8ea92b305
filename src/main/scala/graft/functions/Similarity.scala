package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Baseline: brute-force cosine top-k — a single projection + TakeOrdered,
  * no shuffle of the vectors themselves; scales linearly and parallelizes
  * perfectly (the classic "score 100 TB of embeddings against one query"
  * shape). Scale path: LSH bucketing via random hyperplane signs so
  * candidate generation touches only matching buckets.
  *
  * Dot products via `zip_with` + `aggregate` (codegen'd higher-order
  * functions), computed in double.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Oracle-exact cosine: products are IEEE-deterministic doubles; summing
    * them as decimals makes the reduction order irrelevant, so Spark and any
    * other engine agree bit-for-bit after rounding (SURVEY §7.4.3). */
  def cosineExact(a: Column, b: Column, scale: Int = 4): Column = {
    def dsum(products: Column): Column =
      aggregate(products, lit(BigDecimal(0)).cast(DecimalType(38, 18)),
        (acc, v) => acc + v.cast(DecimalType(38, 18))).cast(DoubleType)
    val d = dsum(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))
    val na = sqrt(dsum(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType))))
    val nb = sqrt(dsum(transform(b, x => x.cast(DoubleType) * x.cast(DoubleType))))
    round(when(na * nb === 0, 0.0).otherwise(d / (na * nb)), scale)
  }

  /** Brute-force top-k against one query vector: score projection + orderBy
    * + limit = TakeOrderedAndProject (per-partition heap, driver merge). */
  def topK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.select(col(idCol), cosine(col(vecCol), q).as("similarity"))
      .orderBy(col("similarity").desc, col(idCol).asc)
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `nPlanes` pseudo-random hyperplanes (deterministic seeded hash-based
    * planes — no RNG state needed, reproducible across runs/executors).
    * Vectors sharing a bucket are near in angle; search touches only the
    * query's bucket (+ optional multi-probe neighbors). */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int = 16): Column = {
    val bits = (0 until nPlanes).map { p =>
      // plane component j = centered unit hash of (p, j): deterministic
      val prod = (0 until dim).map { j =>
        val h = (scala.util.hashing.MurmurHash3.productHash((p, j)) /
                 Int.MaxValue.toDouble)
        element_at(vec, j + 1).cast(DoubleType) * lit(h)
      }.reduce(_ + _)
      when(prod >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN: pre-bucket the corpus once (cheap projection), then join
    * query buckets to corpus buckets — shuffle on bucket id only, never a
    * full cross product. */
  def annJoin(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dim: Int, nPlanes: Int = 8, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = corpus.withColumn("_bucket", lshBucket(col(vecCol), dim, nPlanes))
    val qb = queries.withColumn("_bucket", lshBucket(col(vecCol), dim, nPlanes))
      .select(col(idCol).as("query_id"), col(vecCol).as("_qvec"), col("_bucket"))
    val scored = qb.join(cb, Seq("_bucket"))
      .withColumn("similarity", cosine(col("_qvec"), col(vecCol)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col(idCol).asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("query_id"), col(idCol), col("similarity"))
  }
}
