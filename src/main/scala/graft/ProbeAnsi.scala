package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object ProbeAnsi {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    val dec = DecimalType(38,10)
    def tryOne(name: String, d: Double): Unit = {
      try {
        val r = Seq(d).toDF("v").select(col("v").cast(dec)).collect()(0)
        println(s"$name -> " + (if (r.isNullAt(0)) "NULL" else r.getDecimal(0)))
      } catch { case e: Throwable => println(s"$name -> THROW ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}") }
    }
    tryOne("NaN", Double.NaN)
    tryOne("+Inf", Double.PositiveInfinity)
    tryOne("1e28", 1e28)
    tryOne("9.99e27", 9.99e27)
    def trySum(name: String, vs: Seq[Double]): Unit = {
      try {
        val r = vs.toDF("v").agg(sum(col("v").cast(dec))).collect()(0)
        println(s"$name -> " + (if (r.isNullAt(0)) "NULL" else r.getDecimal(0)))
      } catch { case e: Throwable => println(s"$name -> THROW ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}") }
    }
    trySum("sum overflow 2x6.3e27", Seq(6.3e27, 6.3e27))
    trySum("sum transient 9.9e27,9.9e27,-9.9e27", Seq(9.9e27, 9.9e27, -9.9e27))
    spark.stop()
  }
}
