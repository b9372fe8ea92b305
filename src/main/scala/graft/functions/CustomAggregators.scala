package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom-aggregation registration surface (SURVEY §2.10): the reference lets
  * callers register `name → List[Any]→Any` lambdas at runtime
  * (`aggregator.py:302-321`). The Spark-native equivalent is a typed
  * `Aggregator[IN,BUF,OUT]` registered through `udaf` — it gets partial
  * (map-side) aggregation for free, which a collect-then-apply lambda never
  * can. Two shipped examples double as the registration test fixtures.
  */
object CustomAggregators {
  /** Register any typed aggregator under a SQL-callable name. */
  def register[IN, BUF, OUT](spark: SparkSession, name: String,
      agg: Aggregator[IN, BUF, OUT])(implicit enc: Encoder[IN]): Unit =
    spark.udf.register(name, udaf(agg, enc))

  /** Geometric mean — a real partial-aggregatable custom metric. */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0) (b._1 + math.log(a), b._2 + 1L) else b
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Range (max − min) — the shape of the reference's example lambda. */
  object ValueRange extends Aggregator[Double, (Double, Double), Double] {
    def zero: (Double, Double) = (Double.MaxValue, Double.MinValue)
    def reduce(b: (Double, Double), a: Double): (Double, Double) =
      (math.min(b._1, a), math.max(b._2, a))
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (math.min(x._1, y._1), math.max(x._2, y._2))
    def finish(b: (Double, Double)): Double =
      if (b._1 == Double.MaxValue) Double.NaN else b._2 - b._1
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def registerBuiltins(spark: SparkSession): Unit = {
    implicit val doubleEnc: Encoder[Double] = Encoders.scalaDouble
    register(spark, "geometric_mean", GeometricMean)
    register(spark, "value_range", ValueRange)
  }
}
