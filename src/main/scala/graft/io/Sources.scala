package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source adapters (SURVEY §2.1) — thin, typed wrappers over Spark's native
  * readers. Schema inference mirrors the reference's sampling approach but
  * is delegated to Spark (which samples/infers natively); passing an explicit
  * schema skips the inference pass entirely — the right call at scale, where
  * an inference pre-scan of 100 TB is a real cost.
  */
object Sources {
  /** CSV scan (`csv_source.py:78-129`): header/delimiter/encoding options,
    * schema inference or explicit schema. */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
      delimiter: String = ",", encoding: String = "UTF-8",
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("encoding", encoding)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** JSON array scan (`json_source.py:167-223`): whole-array files; an
    * optional dot-path drills into a nested array before flattening. */
  def jsonArray(spark: SparkSession, path: String,
      jsonPath: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = spark.read.option("multiLine", "true").json(path)
    jsonPath match {
      case Some(p) =>
        val exploded = df.select(explode(col(p)).as("_rec"))
        exploded.select(col("_rec.*"))
      case None => df
    }
  }

  /** JSONL scan (`json_source.py:134-165`): one object per line, malformed
    * lines skipped (PERMISSIVE), like the reference's skip-with-warning. */
  def jsonl(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "PERMISSIVE")
    schema.fold(r)(r.schema).json(path)
  }

  /** Quarantine ingestion: parse JSONL in PERMISSIVE mode keeping the
    * raw text of every unparseable line in `_quarantine` (Spark's
    * corrupt-record column, renamed) — the ingest-side half of the
    * medallion quarantine convention ([[graft.service.Paths.quarantine]]):
    * clean rows flow on, broken lines are preserved verbatim for the
    * quarantine sink instead of being silently dropped (DROPMALFORMED)
    * or killing the job (FAILFAST). The schema MUST be supplied —
    * inference would re-scan and can widen types on dirty data. Per-row
    * classification is `_quarantine IS NOT NULL`; the scan stays a
    * single pass, and the returned frame is persisted because Spark
    * refuses plans that select ONLY the internal corrupt-record column
    * from a lazy scan. */
  def jsonlQuarantine(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val corrupt = "_quarantine"
    val full = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(full)
      .json(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** CSV sibling of [[jsonlQuarantine]]: rows whose field count or types
    * don't fit the supplied schema keep their raw line in `_quarantine`
    * instead of being dropped (DROPMALFORMED) or fatal (FAILFAST). Same
    * contract: explicit schema, single pass, persisted result. */
  def csvQuarantine(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame = {
    val corrupt = "_quarantine"
    val full = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(full)
      .csv(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** XML scan via Spark 4's native xml data source: one DataFrame row per
    * `rowTag` element. Supply the schema on round-trips — XML carries no
    * types, so inference would re-scan and widen everything it can't
    * prove. */
  def xml(spark: SparkSession, path: String, rowTag: String = "row",
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
    schema.fold(r)(r.schema).format("xml").load(path)
  }

  /** Raw media ingestion via Spark's binaryFile source: one row per file
    * — (path, modificationTime, length, content) — the entry point that
    * turns a directory of images/audio into the multimodal binary-column
    * model ([[graft.multimodal.Multimodal]]). `pathGlob` prunes at the
    * LISTING, so a 100 TB media lake only ever lists/reads the matching
    * files; payload bytes stay partition-local from the first touch. */
  def binaryFiles(spark: SparkSession, dir: String,
      pathGlob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    pathGlob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  /** Format auto-detect (`json_source.py:83-106`): sniff the first
    * non-whitespace byte — '[' means array file, else line-delimited. */
  def jsonAuto(spark: SparkSession, path: String): DataFrame = {
    val first = firstNonWs(path)
    if (first == Some('[')) jsonArray(spark, path) else jsonl(spark, path)
  }

  private def firstNonWs(path: String): Option[Char] = {
    val p = new java.io.File(path)
    val f = if (p.isDirectory)
      p.listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).sortBy(_.getName).headOption
    else Some(p)
    f.flatMap { file =>
      val src = scala.io.Source.fromFile(file)
      try src.iter.find(!_.isWhitespace) finally src.close()
    }
  }

  /** JDBC scan (`postgres_source.py:107-162`): full table or arbitrary SQL;
    * fetchsize = the reference's server-cursor batching. partitionColumn
    * options enable parallel reads — the scale path the reference lacks. */
  def jdbc(spark: SparkSession, url: String, dbtable: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .option("fetchsize", options.getOrElse("fetchsize", "1000"))
      .options(options).load()

  /** Parquet scan — the checkpoint/interchange format. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC scan — the other columnar interchange format
    * (`format_conversion.py` converts between columnar formats); Spark's
    * native vectorized ORC reader, same pushdown/pruning story as parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-evolution scan: union the schemas of every parquet footer under
    * `paths` (long-lived corpora add columns across ingest batches; a plain
    * read keys on one random footer and silently drops the others' columns).
    * Columns absent from a batch surface as null — the columnar reader
    * fills them without rewriting old files. Footer merging is a bounded
    * metadata job, not a data scan. */
  def parquetMergeSchema(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}

/** Incremental-state API (`src/adapters/base.py:66-91`): the reference tracks
  * a file hash + mtime; the default Spark equivalent is a per-file
  * (mtime, size) fingerprint — no bytes read. A file is fresh when unseen
  * OR its fingerprint changed (never a strict `>` watermark race). Caveat:
  * a SAME-SIZE rewrite within the same mtime granule is invisible to the
  * metadata fingerprint; for the reference's full content-hash semantics
  * pass `contentHash = true` (CRC32 over the bytes — one extra read per
  * listed file, exactly what the reference pays). */
object IncrementalState {
  final case class State(lastModified: Long,
      filesSeen: Map[String, (Long, Long)])
  val empty: State = State(0L, Map.empty)

  private def crc32(f: java.io.File): Long = {
    val crc = new java.util.zip.CRC32()
    val in = new java.io.FileInputStream(f)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { crc.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    crc.getValue
  }

  def scanNew(spark: SparkSession, path: String, fmt: String,
      state: State, contentHash: Boolean = false): (DataFrame, State) = {
    val dir = new java.io.File(path)
    val files = (if (dir.isDirectory) dir.listFiles().toSeq else Seq(dir))
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    def fp(f: java.io.File): (Long, Long) =
      if (contentHash) (crc32(f), f.length) else (f.lastModified, f.length)
    val fresh = files.filter(f => !state.filesSeen.get(f.getPath).contains(fp(f)))
    val newState = State(
      files.map(_.lastModified).maxOption.getOrElse(state.lastModified),
      files.map(f => f.getPath -> fp(f)).toMap)
    val df =
      if (fresh.isEmpty)
        spark.read.format(fmt).load(path).limit(0)
      else spark.read.format(fmt).load(fresh.map(_.getPath): _*)
    (df, newState)
  }
}
