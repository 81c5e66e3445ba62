package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table maintenance on plain parquet — the two operational jobs a
  * long-lived 100 TB table needs that the reference's per-record sink
  * never confronts (`dags/jira/db_ops.py:29-43` rewrites rows in place):
  *
  *  - versioned snapshots: every write lands in `dir/v=N`; readers pin a
  *    version or take the latest — poor-man's time travel with atomic
  *    publish (a version directory appears only after its write commits,
  *    so concurrent readers never see a half-written table).
  *  - compaction: streaming/micro-batch sinks accumulate small files;
  *    compact rewrites a snapshot into ~`targetBytes` files (scan cost at
  *    100 TB is dominated by file count once files drop below the HDFS/S3
  *    block size).
  */
object Maintenance {

  private def versions(dir: String): Seq[Long] = {
    val d = new File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.drop(2).toLong).sorted
  }

  /** Write `df` as the next version; returns the version number. */
  def writeVersion(df: DataFrame, dir: String): Long = {
    val next = versions(dir).lastOption.getOrElse(0L) + 1L
    df.write.parquet(s"$dir/v=$next")
    next
  }

  /** Read a pinned version, or the latest when `version` is None. */
  def readVersion(spark: SparkSession, dir: String,
      version: Option[Long] = None): DataFrame = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"no versions under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    spark.read.parquet(s"$dir/v=$v")
  }

  def latestVersion(dir: String): Option[Long] = versions(dir).lastOption

  /** Compact the latest snapshot into ~targetBytes output files, published
    * as a NEW version (readers of old versions are undisturbed). Returns
    * (newVersion, nFilesBefore, nFilesAfter).
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Long, Int, Int) = {
    val v = versions(dir).last
    val src = new File(s"$dir/v=$v")
    val files = src.listFiles().filter(_.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.length).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(src.getPath)
    // coalesce (not repartition): pure file-merge, no shuffle
    val next = writeVersion(df.coalesce(nOut), dir)
    val after = new File(s"$dir/v=$next").listFiles()
      .count(_.getName.endsWith(".parquet"))
    (next, files.length, after)
  }

  /** Backfill a partitioned table IN PLACE: overwrite ONLY the partitions
    * `batch` actually contains rows for, leaving every other partition's
    * files untouched — `partitionOverwriteMode=dynamic`, the correction
    * primitive a date-partitioned 100 TB corpus lives on (re-run one bad
    * ingest day without rewriting, or even listing, the other ~3650
    * partition directories; STATIC mode — Spark's default — would drop
    * the entire table first). The conf is set on the WRITER (per-write
    * option), not the session, so concurrent jobs keep their own
    * semantics. Returns the distinct partition tuples overwritten.
    */
  def backfillPartitions(batch: DataFrame, path: String,
      partitionCols: Seq[String]): Array[org.apache.spark.sql.Row] = {
    require(partitionCols.nonEmpty, "backfill needs partition columns")
    import org.apache.spark.sql.functions.col
    batch.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    batch.select(partitionCols.map(col): _*).distinct().collect()
  }

  /** Schema-drift-tolerant read of a partitioned/appended table whose
    * batches were written under EVOLVING schemas (`mergeSchema` — parquet
    * footer union instead of the first-file schema pick): columns a batch
    * predates come back NULL for its rows, which is exactly the backfill
    * contract [[backfillPartitions]] repairs day-by-day. Off by default in
    * Spark because footer-merging lists every file's footer — at 100 TB
    * that is a real planning cost, so it is an explicit maintenance-read
    * surface here, not the default scan path.
    */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
