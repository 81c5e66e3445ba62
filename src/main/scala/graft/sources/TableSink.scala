package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** At-rest table layout: partitioned parquet — the engine's sink format
  * (the reference's three SQL tables, `dags/jira/db_ops.py:22-27`, become
  * schema-enforced parquet directories; `jdbc` remains a format option for
  * live parity).
  *
  * Partition columns become directory keys, so equality/range predicates on
  * them prune whole directories at planning time (`PartitionFilters` in the
  * scan node — asserted in TableSinkSpec). At 100 TB this is the difference
  * between scanning a day and scanning a decade: worklogs partition by
  * `start_date`, events by `date(ts)`.
  */
object TableSink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-shard manifest entry: file name, codec (from the extension),
    * rows, uncompressed line bytes (payload + newline).
    */
  case class ShardEntry(file: String, codec: String, rows: Long,
      uncompressed_bytes: Long)

  /** Training-data export: size-bounded JSONL shards plus a `_MANIFEST`
    * completeness record — the handoff format an LLM training pipeline
    * consumes. `maxRecordsPerFile` bounds every shard (a trainer's reader
    * wants uniform units of work); the manifest (one tiny JSON file beside
    * the shards) records the totals plus one entry per shard — codec and
    * UNCOMPRESSED byte count included — so a consumer can verify it
    * received ALL shards, whole, before training starts: at 100 TB a
    * silent partial copy is the failure mode manifests exist for.
    *
    * `compression` = `gzip`/`zstd` writes compressed shards — real
    * training-data interchange ships compressed, and because gzip is
    * unsplittable at read time (FormatsSpec), the shard size chosen HERE
    * is the read parallelism forever; `maxRecordsPerFile` is that choice.
    *
    * The manifest is built from ONE read-back pass (per-shard line counts
    * and octet lengths, collected driver-side at shard granularity — tiny
    * metadata, not data), and an empty input short-circuits to an explicit
    * zero-row manifest instead of failing schema inference on zero files.
    * Returns (shards, totalRows).
    */
  def exportJsonl(df: DataFrame, path: String, maxRecordsPerFile: Int,
      compression: String = "none"): (Long, Long) = {
    val spark = df.sparkSession
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val writer = df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
    if (compression != "none") writer.option("compression", compression)
    writer.json(path)
    def writeManifest(m: DataFrame): Unit =
      m.repartition(1).write.mode(SaveMode.Overwrite).json(s"$path/_MANIFEST")
    if (df.head(1).isEmpty) {
      writeManifest(Seq((0L, 0L, 0L, compression, 0L, Seq.empty[ShardEntry]))
        .toDF("n_shards", "total_rows", "max_shard_rows", "codec",
          "uncompressed_bytes", "shards"))
      return (0L, 0L)
    }
    // one pass over the export (text read decompresses transparently):
    // rows + uncompressed octets per shard, one driver row per shard
    val perShard = spark.read.text(path)
      .groupBy(input_file_name().as("shard"))
      .agg(count(lit(1)).as("rows"),
        sum(octet_length(col("value")) + lit(1)).as("bytes"))
      .collect()
    def codecOf(f: String) =
      if (f.endsWith(".gz")) "gzip" else if (f.endsWith(".zst")) "zstd" else "none"
    val entries = perShard.map { r =>
      val file = r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)
      ShardEntry(file, codecOf(file), r.getLong(1), r.getLong(2))
    }.sortBy(_.file).toSeq
    val totalRows = entries.map(_.rows).sum
    writeManifest(Seq((entries.length.toLong, totalRows,
        entries.map(_.rows).max, compression,
        entries.map(_.uncompressed_bytes).sum, entries))
      .toDF("n_shards", "total_rows", "max_shard_rows", "codec",
        "uncompressed_bytes", "shards"))
    (entries.length.toLong, totalRows)
  }

  /** Live-DB parity option (reference sinks are Postgres/MySQL/MSSQL,
    * `dags/jira/db_ops.py:102-112`): batch JDBC write of an
    * [[graft.operators.Upsert]]-merged frame — set-based, one round trip
    * per partition vs the reference's one per record. Round-tripped
    * against embedded Derby in DerbyJdbcSinkSpec (write → keyed upsert →
    * read back, last-writer-wins), proving U1–U3 semantics on a real SQL
    * sink. NOTE: a read-modify-Overwrite on one table must snapshot the
    * read side first — the JDBC scan is lazy and Overwrite drops the
    * table before the plan runs.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** In-place keyed upsert into a live SQL table — speaks the reference's
    * three dialect statements (`ON CONFLICT` / `ON DUPLICATE KEY UPDATE` /
    * `MERGE`, `dags/jira/db_ops.py:29-100`) chosen from the JDBC URL, batched
    * per partition. The table is never dropped: the MATCHED/NOT MATCHED
    * branches update or insert row-keyed, exactly the reference's write
    * behavior. Prefer this over [[writeJdbc]]+Overwrite when the target is a
    * shared serving database. See [[JdbcUpsert]].
    */
  def upsertJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, uniqueColumn: String): Unit =
    JdbcUpsert.upsertInPlace(df, url, table, props, uniqueColumn)
}
