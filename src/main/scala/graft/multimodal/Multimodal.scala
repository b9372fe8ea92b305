package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side shape — schema, partitioning, batch
  * iteration — is real and tested; the actual codec calls are STUBBED with a
  * deterministic fake (no image/audio libraries in this environment). Each
  * stub is clearly marked; swapping in a real decoder changes only the
  * function body, not the pipeline shape.
  *
  * Scale notes: decode work is per-row CPU-bound — `mapPartitions` keeps it
  * executor-side and pipeline-parallel; binary payloads never shuffle unless
  * the caller repartitions; metadata-only operations (filtering by width,
  * sampling by timestamp) are column ops that never touch the bytes.
  */
object Multimodal {
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),    // image | audio | video
    StructField("content", BinaryType, nullable = true),  // opaque payload
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  final case class MediaFeature(media_id: Long, kind: String,
      feature: Array[Float], n_bytes: Long)

  /** STUB decoder: a real implementation would parse the container format.
    * The fake derives a deterministic pseudo-feature from the payload bytes
    * so downstream plumbing (schema, batching, joins) is fully exercised. */
  private def fakeDecodeFeature(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(j) = (h % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Feature extraction over the binary column: partition-local, zero
    * shuffle. Equivalent of a batched decode UDF. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, content) =>
        val bytes = Option(content).getOrElse(Array.emptyByteArray)
        MediaFeature(id, kind, fakeDecodeFeature(bytes, dim), bytes.length.toLong)
      })
  }

  /** Metadata-only ops: never deserialize the payload. */
  def filterByDims(media: DataFrame, minW: Int, minH: Int): DataFrame =
    media.filter(col("width") >= minW && col("height") >= minH)

  /** STUB resize: a real implementation decodes, scales, re-encodes the
    * payload. The fake rescales the metadata exactly (aspect-preserving
    * fit into maxW×maxH, never upscaling) and substitutes a deterministic
    * payload of plausible size, so partitioning/schema behavior under
    * byte-size change is exercised. Non-image rows pass through untouched.
    * Partition-local, zero shuffle, payload never crosses the wire. */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    val cols = media.columns
    val resizeUdf = udf { (content: Array[Byte], w: Int, h: Int) =>
      val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
      val nw = math.max(1, math.floor(w * scale).toInt)
      val nh = math.max(1, math.floor(h * scale).toInt)
      // fake re-encode: deterministic bytes, size ∝ scaled pixel count
      val n = math.max(8, nw * nh / 64)
      val out = new Array[Byte](n)
      var hseed = 1125899906842597L
      val src = Option(content).getOrElse(Array.emptyByteArray)
      var i = 0
      while (i < src.length) { hseed = 31 * hseed + src(i); i += 1 }
      var j = 0
      while (j < n) {
        hseed ^= hseed << 13; hseed ^= hseed >>> 7; hseed ^= hseed << 17
        out(j) = (hseed & 0x7f).toByte; j += 1
      }
      (out, nw, nh)
    }
    val isImg = col("kind") === "image" && col("width").isNotNull &&
      col("height").isNotNull
    val r = resizeUdf(col("content"), col("width"), col("height"))
    media
      .withColumn("_rz", when(isImg, r))
      .withColumn("content", when(isImg, col("_rz._1")).otherwise(col("content")))
      .withColumn("width", when(isImg, col("_rz._2")).otherwise(col("width")))
      .withColumn("height", when(isImg, col("_rz._3")).otherwise(col("height")))
      .select(cols.map(col): _*)
  }

  /** Frame sampling plan for video rows: explode target timestamps from
    * metadata (duration), leaving per-frame decode to the stub above. */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))

  /** Deterministic synthetic corpus for tests (no codecs available). */
  def syntheticCorpus(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      Row(i.toLong, kind, Array.fill[Byte](16 + i % 64)((i * 7 % 127).toByte),
        s"application/x-fake-$kind", 64 + i % 512, 64 + (i * 3) % 512,
        if (kind == "video") 1000L * (1 + i % 30) else null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4), mediaSchema)
  }
}
