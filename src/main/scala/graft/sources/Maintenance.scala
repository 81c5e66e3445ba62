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
}
