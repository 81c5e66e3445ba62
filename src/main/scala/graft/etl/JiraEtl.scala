package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Flatten.{Leaf, Obj}

/** Reference-parity ETL: the three Jira pipelines' mappings and response
  * schemas, re-expressed as schema'd JSON scans + one-select flattens.
  *
  * Pagination collapses (SURVEY.md S2–S4): the reference's offset/cursor
  * loops exist only because HTTP pages arrive one at a time; given the same
  * records as files, `spark.read.schema(s).json(paths)` reads every page in
  * one distributed scan, and incremental re-fetch is the file streaming
  * source with `Trigger.AvailableNow` (graft.streaming.EventStream).
  *
  * Mappings transcribed from:
  *  - issues:   `dags/jira/issues/issue_processor.py:16-81`
  *  - users:    `dags/jira/users/users_processor.py:13-22`
  *  - worklogs: `dags/jira/worklogs/worklog_processor.py:16-34`
  */
object JiraEtl {

  // ---- issues -----------------------------------------------------------
  private def person = Obj(
    "self" -> Leaf("url"), "accountId" -> Leaf("account_id"),
    "displayName" -> Leaf("displayname"), "active" -> Leaf("active"),
    "timeZone" -> Leaf("timezone"), "accountType" -> Leaf("accounttype"))

  val issueMapping: Obj = Obj(
    "id" -> Leaf("issue_id"),
    "self" -> Leaf("issue_url"),
    "key" -> Leaf("issue_key"),
    "fields" -> Obj(
      "resolution" -> Obj(
        "self" -> Leaf("url"), "id" -> Leaf("id"),
        "description" -> Leaf("description"), "name" -> Leaf("name")),
      "priority" -> Obj("name" -> Leaf("name")),
      "labels" -> Leaf("labels"),
      "assignee" -> person,
      "status" -> Obj(
        "self" -> Leaf("url"), "description" -> Leaf("description"),
        "name" -> Leaf("name"),
        "statusCategory" -> Obj(
          "self" -> Leaf("url"), "key" -> Leaf("key"), "name" -> Leaf("name"))),
      "creator" -> person,
      "reporter" -> person,
      "progress" -> Obj(
        "progress" -> Leaf("progress"), "total" -> Leaf("total"),
        "percent" -> Leaf("percent")),
      "timespent" -> Leaf("timespent"),
      "project" -> Obj(
        "self" -> Leaf("url"), "id" -> Leaf("id"), "key" -> Leaf("key"),
        "name" -> Leaf("name"), "projectTypeKey" -> Leaf("projecttypekey")),
      "summary" -> Leaf("summary")))

  private def personSchema = StructType(Seq(
    StructField("self", StringType), StructField("accountId", StringType),
    StructField("displayName", StringType), StructField("active", BooleanType),
    StructField("timeZone", StringType), StructField("accountType", StringType)))

  /** Schema of one issue object (page envelope handled in [[readIssues]]). */
  val issueSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("self", StringType),
    StructField("key", StringType),
    StructField("fields", StructType(Seq(
      StructField("resolution", StructType(Seq(
        StructField("self", StringType), StructField("id", StringType),
        StructField("description", StringType), StructField("name", StringType)))),
      StructField("priority", StructType(Seq(StructField("name", StringType)))),
      StructField("labels", ArrayType(StringType)),
      StructField("assignee", personSchema),
      StructField("status", StructType(Seq(
        StructField("self", StringType), StructField("description", StringType),
        StructField("name", StringType),
        StructField("statusCategory", StructType(Seq(
          StructField("self", StringType), StructField("key", StringType),
          StructField("name", StringType))))))),
      StructField("creator", personSchema),
      StructField("reporter", personSchema),
      StructField("progress", StructType(Seq(
        StructField("progress", LongType), StructField("total", LongType),
        StructField("percent", LongType)))),
      StructField("timespent", LongType),
      StructField("project", StructType(Seq(
        StructField("self", StringType), StructField("id", StringType),
        StructField("key", StringType), StructField("name", StringType),
        StructField("projectTypeKey", StringType)))),
      StructField("summary", StringType))))))

  /** Page envelope: `{startAt, maxResults, total, issues: [...]}`
    * (`issue_processor.py:141-164`).
    */
  val issuePageSchema: StructType = StructType(Seq(
    StructField("startAt", LongType), StructField("maxResults", LongType),
    StructField("total", LongType), StructField("issues", ArrayType(issueSchema))))

  /** Parsed pages (issuePageSchema rows) → flat issue rows: explode the
    * page array, then the P1–P3 flatten. Split out from [[readIssues]] so
    * any page source — JSON files, the DSv2 HTTP-page source, a synthetic
    * corpus — feeds the same mapping engine.
    */
  def issuesFromPages(pages: DataFrame): DataFrame =
    Flatten(
      pages.select(explode(col("issues")).as("issue")).select(col("issue.*")),
      issueMapping)

  /** All pages → flat issue rows (the reference's per-page map+persist loop
    * as one scan).
    */
  def readIssues(spark: SparkSession, paths: String*): DataFrame =
    issuesFromPages(spark.read.schema(issuePageSchema)
      .option("multiLine", "true").json(paths: _*))

  // ---- users ------------------------------------------------------------
  val userMapping: Obj = Obj(
    "self" -> Leaf("url"),
    "accountId" -> Leaf("account_id"),
    "accountType" -> Leaf("account_type"),
    "avatarUrls" -> Obj("48x48" -> Leaf("avatar_url")),
    "displayName" -> Leaf("display_name"),
    "active" -> Leaf("active"))

  val userSchema: StructType = StructType(Seq(
    StructField("self", StringType),
    StructField("accountId", StringType),
    StructField("accountType", StringType),
    StructField("avatarUrls", StructType(Seq(StructField("48x48", StringType)))),
    StructField("displayName", StringType),
    StructField("active", BooleanType)))

  /** Parsed user objects (userSchema rows) → flat user rows. */
  def usersFromRows(rows: DataFrame): DataFrame = Flatten(rows, userMapping)

  /** Bare JSON array response (`users_processor.py:82`). */
  def readUsers(spark: SparkSession, paths: String*): DataFrame =
    usersFromRows(
      spark.read.schema(userSchema).option("multiLine", "true").json(paths: _*))

  // ---- worklogs ---------------------------------------------------------
  val worklogMapping: Obj = Obj(
    "self" -> Leaf("url"),
    "tempoWorklogId" -> Leaf("tempo_worklog_id"),
    "issue" -> Obj("id" -> Leaf("id"), "self" -> Leaf("url")),
    "timeSpentSeconds" -> Leaf("time_spent_seconds"),
    "billableSeconds" -> Leaf("billable_seconds"),
    "startDate" -> Leaf("start_date"),
    "startTime" -> Leaf("start_time"),
    "description" -> Leaf("description"),
    "createdAt" -> Leaf("created_at"),
    "updatedAt" -> Leaf("updated_at"),
    "author" -> Obj("accountId" -> Leaf("id"), "self" -> Leaf("url")))

  val worklogSchema: StructType = StructType(Seq(
    StructField("self", StringType),
    StructField("tempoWorklogId", LongType),
    StructField("issue", StructType(Seq(
      StructField("id", LongType), StructField("self", StringType)))),
    StructField("timeSpentSeconds", LongType),
    StructField("billableSeconds", LongType),
    StructField("startDate", StringType),   // DATE in DDL; cast at sink
    StructField("startTime", StringType),   // SQL TIME has no Spark type → HH:mm:ss string
    StructField("description", StringType),
    StructField("createdAt", StringType),
    StructField("updatedAt", StringType),
    StructField("author", StructType(Seq(
      StructField("accountId", StringType), StructField("self", StringType))))))

  /** Cursor-paginated envelope `{results: [...], metadata: {next}}`
    * (`worklog_processor.py:95,106`).
    */
  val worklogPageSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(worklogSchema)),
    StructField("metadata", StructType(Seq(StructField("next", StringType))))))

  /** Parsed pages (worklogPageSchema rows) → flat worklog rows, with the
    * sink-side date/timestamp casts the reference's DDL implies
    * (`fetch_jira_tempo_worklogs.py:86-88`: start_date DATE, created_at /
    * updated_at TIMESTAMP).
    */
  def worklogsFromPages(pages: DataFrame): DataFrame =
    Flatten(
      pages.select(explode(col("results")).as("w")).select(col("w.*")),
      worklogMapping)
      .withColumn("start_date", to_date(col("start_date")))
      .withColumn("created_at", to_timestamp(col("created_at")))
      .withColumn("updated_at", to_timestamp(col("updated_at")))

  def readWorklogs(spark: SparkSession, paths: String*): DataFrame =
    worklogsFromPages(spark.read.schema(worklogPageSchema)
      .option("multiLine", "true").json(paths: _*))
}
