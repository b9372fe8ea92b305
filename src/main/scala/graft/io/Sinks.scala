package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink adapters (SURVEY §2.2). Spark's commit protocol (`_temporary` +
  * atomic rename) supplies the transactional temp-file-then-move semantics
  * every reference sink hand-rolls. Parquet append is a true append (new
  * files), strictly better than the reference's read-concat-rewrite
  * (`parquet_loader.py:192-195`).
  */
object Sinks {
  /** CSV load (`csv_loader.py:150-258`): overwrite/append, compression,
    * schema-ordered columns. */
  def csv(df: DataFrame, path: String, header: Boolean = true,
      mode: String = "overwrite", compression: Option[String] = None,
      orderedColumns: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val ordered = if (orderedColumns.isEmpty) df
      else {
        // schema columns first, extras (e.g. _meta_*) preserved after
        val extras = df.columns.filterNot(orderedColumns.contains)
        df.select((orderedColumns ++ extras).map(col): _*)
      }
    val w = ordered.write.mode(mode).option("header", header.toString)
    compression.fold(w)(c => w.option("compression", c)).csv(path)
  }

  /** JSONL load (`json_loader.py:143-162`): native line-delimited write. */
  def jsonl(df: DataFrame, path: String, mode: String = "overwrite",
      compression: Option[String] = None): Unit = {
    val w = df.write.mode(mode)
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** JSON array load (`json_loader.py:181-248`): single array file. The
    * reference buffers all records in memory; a single array file is
    * inherently single-writer, so this is driver-side by construction —
    * use ONLY for small exports (the reference's own use case). */
  def jsonArray(df: DataFrame, path: String, pretty: Boolean = false,
      schemaSidecar: Boolean = false): Unit = {
    val rows = df.toJSON.collect()
    val body =
      if (pretty) rows.mkString("[\n  ", ",\n  ", "\n]")
      else rows.mkString("[", ",", "]")
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, body)
    // `.schema.json` export (json_loader.py:215-248): the serialized
    // StructType — round-trips via DataType.fromJson
    if (schemaSidecar)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path + ".schema.json"),
        df.schema.prettyJson)
  }

  /** Parquet load (`parquet_loader.py:144-250`): snappy default, directory
    * partitioning, true append. */
  def parquet(df: DataFrame, path: String, mode: String = "overwrite",
      partitionCols: Seq[String] = Nil, compression: String = "snappy"): Unit = {
    val w = df.write.mode(mode).option("compression", compression)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** JDBC load (`postgres_loader.py`/`sqlite_loader.py`): batched inserts via
    * the connector's batchsize; overwrite maps to drop_if_exists. */
  def jdbc(df: DataFrame, url: String, table: String,
      mode: String = "append", options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc").mode(mode)
      .option("url", url).option("dbtable", table)
      .option("batchsize", options.getOrElse("batchsize", "1000"))
      .options(options).save()

  /** Multi-destination load (`pipeline_core.py:82-134`): same frame to N
    * sinks; cache once so the upstream computes once, then N write actions. */
  def multi(df: DataFrame, writes: Seq[DataFrame => Unit]): Unit = {
    val cached = df.cache()
    try writes.foreach(w => w(cached))
    finally cached.unpersist()
  }
}
