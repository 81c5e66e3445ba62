package graft.etl

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum}

import graft.operators.Upsert

/** End-to-end ingest job — the engine's equivalent of the reference's
  * per-DAG `main()` (`dags/fetch_jira_issues.py:40-67`): scan all response
  * pages, flatten per the entity MAPPING, and keyed-upsert into the
  * at-rest table. One Spark job replaces the fetch-loop + per-record
  * INSERT; the upsert makes a daily re-run idempotent (U1 semantics).
  *
  * `spark-submit --class graft.etl.IngestJob app.jar <entity> <pagesGlob> <tableDir>`
  * — see deploy/airflow_graft_dag.py for the orchestration side.
  */
object IngestJob {

  private val keys = Map(
    "issues" -> "issue_id",          // fetch_jira_issues.py:72 UNIQUE
    "users" -> "account_id",         // fetch_jira_users.py:75 UNIQUE
    "worklogs" -> "tempo_worklog_id" // fetch_jira_tempo_worklogs.py:81 UNIQUE
  )

  /** Testable core: returns the merged table state after this batch. */
  def run(spark: SparkSession, entity: String, pagePaths: Seq[String],
      tableDir: String): DataFrame =
    runWithMetrics(spark, entity, pagePaths, tableDir)._1

  /** [[run]] plus single-pass ingest metrics via `observe`: row and
    * null-key counts ride the materializing action itself — no second
    * scan, which matters when the batch is a 100 TB read. (The reference
    * has no ingest metrics at all; per-record INSERT made them free to
    * hand-count, `dags/jira/db_ops.py:32-42`.)
    */
  def runWithMetrics(spark: SparkSession, entity: String,
      pagePaths: Seq[String], tableDir: String): (DataFrame, Map[String, Long]) = {
    val key = keys.getOrElse(entity,
      throw new IllegalArgumentException(s"unknown entity '$entity'"))
    val incoming = entity match {
      case "issues" => JiraEtl.readIssues(spark, pagePaths: _*)
      case "users" => JiraEtl.readUsers(spark, pagePaths: _*)
      case "worklogs" => JiraEtl.readWorklogs(spark, pagePaths: _*)
    }
    val merged =
      if (new java.io.File(tableDir).exists())
        Upsert(spark.read.parquet(tableDir), incoming, Seq(key))
      else incoming
    val obs = Observation(s"graft_ingest_$entity")
    val staged = merged
      .observe(obs, count(lit(1)).as("rows"),
        sum(col(key).isNull.cast("long")).as("null_keys"))
      .cache()
    staged.count() // materialize before overwriting the input directory
    val metrics = obs.get.map { case (k, v) =>
      k -> Option(v).fold(0L)(_.asInstanceOf[Number].longValue)
    }
    staged.write.mode(SaveMode.Overwrite).parquet(tableDir)
    staged.unpersist()
    (spark.read.parquet(tableDir), metrics)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: IngestJob <entity> <pagesGlob> <tableDir>")
    val Array(entity, pagesGlob, tableDir) = args
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val n = run(spark, entity, Seq(pagesGlob), tableDir).count()
    println(s"[ingest] $entity: table now has $n rows")
    spark.stop()
  }
}
