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

  /** Training-data export: size-bounded JSONL shards plus a `_MANIFEST`
    * completeness record — the handoff format an LLM training pipeline
    * consumes. `maxRecordsPerFile` bounds every shard (a trainer's reader
    * wants uniform units of work); the manifest (one tiny JSON file beside
    * the shards) records per-shard row counts and the total, so a consumer
    * can verify it received ALL shards before training starts — at 100 TB
    * a silent partial copy is the failure mode manifests exist for.
    * Returns (shards, totalRows).
    */
  def exportJsonl(df: DataFrame, path: String,
      maxRecordsPerFile: Int): (Long, Long) = {
    val spark = df.sparkSession
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .json(path)
    import org.apache.spark.sql.functions._
    val perShard = spark.read.json(path)
      .groupBy(input_file_name().as("shard"))
      .agg(count(lit(1)).as("rows"))
    val manifest = perShard.agg(
      count(lit(1)).as("n_shards"),
      sum("rows").as("total_rows"),
      max("rows").as("max_shard_rows"))
    manifest.repartition(1).write.mode(SaveMode.Overwrite)
      .json(s"$path/_MANIFEST")
    val m = manifest.head
    (m.getLong(0), m.getLong(1))
  }

  /** Live-DB parity option (reference sinks are Postgres/MySQL/MSSQL,
    * `dags/jira/db_ops.py:102-112`): batch JDBC write of an
    * [[graft.operators.Upsert]]-merged frame — set-based, one round trip
    * per partition vs the reference's one per record. NOT exercised in
    * this offline environment (no database); compiles against the stock
    * JDBC connector.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
