package graft.service

/** AutoTuner (SURVEY §2.11; `/root/reference/src/ml/auto_tuner.py`):
  * records per-run metrics, keeps a bounded history, and recommends the
  * argmax-score batch size from a fixed search space with a confidence
  * blended from sample size, consistency, and score margin.
  *
  * In the Spark engine most of what this tuned is superseded by AQE, so the
  * advisor targets the knobs AQE does NOT set: JDBC fetch/batch sizes and
  * arrow `maxRecordsPerBatch`. Pure driver-side Scala, no Spark dependency.
  */
final class AutoTuner(
    val searchSpace: Seq[Int] = Seq(100, 250, 500, 1000, 2500, 5000, 10000),
    maxHistory: Int = 100,
    target: String = "throughput") {

  final case class Run(batchSize: Int, records: Long, seconds: Double,
      mbProcessed: Double) {
    def throughput: Double = if (seconds > 0) records / seconds else 0.0
    def mbPerSec: Double = if (seconds > 0) mbProcessed / seconds else 0.0
  }
  final case class Recommendation(batchSize: Int, confidence: Double,
      expectedImprovement: Double)

  private var history: Vector[Run] = Vector.empty

  def record(run: Run): Unit = {
    history = (history :+ run).takeRight(maxHistory)
  }
  def runs: Seq[Run] = history

  private def scoreOf(r: Run): Double = target match {
    case "throughput" => r.throughput
    case "memory"     => -r.batchSize.toDouble           // smaller batches
    case "cost"       => r.mbPerSec
    case _            => r.throughput
  }

  /** argmax mean score per batch size; confidence = mean of (sample share,
    * consistency = 1−cv, margin over runner-up). */
  def recommend(): Option[Recommendation] = {
    val byBatch = history.groupBy(_.batchSize)
      .view.filterKeys(searchSpace.contains).toMap
    if (byBatch.isEmpty) None
    else {
      val stats = byBatch.map { case (b, rs) =>
        val scores = rs.map(scoreOf)
        val mean = scores.sum / scores.size
        val variance = scores.map(s => (s - mean) * (s - mean)).sum / scores.size
        val cv = if (mean != 0) math.sqrt(variance) / math.abs(mean) else 1.0
        (b, mean, math.max(0.0, 1.0 - cv), rs.size)
      }.toSeq.sortBy(-_._2)
      val (best, bestScore, consistency, n) = stats.head
      val runnerUp = stats.lift(1).map(_._2).getOrElse(0.0)
      val margin =
        if (bestScore > 0) math.min(1.0, (bestScore - runnerUp) / bestScore)
        else 0.0
      val sampleConf = math.min(1.0, n / 5.0)
      val confidence = (sampleConf + consistency + margin) / 3.0
      val current = history.last
      val improvement =
        if (scoreOf(current) > 0) bestScore / scoreOf(current) - 1.0 else 0.0
      Some(Recommendation(best, confidence, improvement))
    }
  }

  /** Spark-world knob mapping for a recommendation. */
  def sparkOptions(rec: Recommendation): Map[String, String] = Map(
    "spark.sql.execution.arrow.maxRecordsPerBatch" -> rec.batchSize.toString,
    "jdbc.fetchsize" -> rec.batchSize.toString,
    "jdbc.batchsize" -> rec.batchSize.toString)
}
