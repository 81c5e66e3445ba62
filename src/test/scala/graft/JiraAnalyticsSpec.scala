package graft

import org.apache.spark.sql.functions._

import graft.etl.JiraCorpus

/** FK integrity of the Jira star and reconciliation of the q134–q136
  * aggregates against the raw fact table. The analytics queries inner-join
  * across both FKs; these tests pin that the synthesized corpus keeps the
  * closures the reference's relational schema guarantees
  * (`fetch_jira_tempo_worklogs.py:82` issue FK, `:91` author FK), so the
  * joins are lossless and every aggregate must reconcile exactly.
  */
class JiraAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("FK closure: every worklog resolves its issue and its author") {
    val w = JiraCorpus.worklogs(spark, dir)
    val i = JiraCorpus.issues(spark, dir)
      .select(col("issue_id").cast("long").as("iid"))
    val u = JiraCorpus.users(spark, dir)
    assert(w.join(i, w("issue_id") === col("iid"), "left_anti").count() === 0L,
      "worklog -> issue FK must close (fetch_jira_tempo_worklogs.py:82)")
    assert(w.join(u, w("author_id") === u("account_id"), "left_anti")
      .count() === 0L,
      "worklog -> user FK must close (fetch_jira_tempo_worklogs.py:91)")
  }

  test("q134 reconciles with the raw fact table: lossless joins, exact totals") {
    val w = JiraCorpus.worklogs(spark, dir)
    val (rawSecs, rawRows) = w
      .agg(sum("billable_seconds"), count(lit(1)))
      .as[(Long, Long)].head()
    val q134 = SparkEntry.queries("q134_jira_billable_by_author_status")(spark, dir)
    val (aggSecs, aggRows) = q134
      .agg(sum("billable_seconds"), sum("n_worklogs"))
      .as[(Long, Long)].head()
    assert(aggRows === rawRows,
      "FK closure makes the inner joins lossless — every worklog counted once")
    assert(aggSecs === rawSecs, "billable seconds conserve through the star")
  }

  test("q135 partitions the issues: without-worklogs + with-worklogs = all") {
    val i = JiraCorpus.issues(spark, dir)
    val w = JiraCorpus.worklogs(spark, dir)
    val without = SparkEntry
      .queries("q135_jira_issues_without_worklogs")(spark, dir).count()
    val withW = i.select(col("issue_id").cast("long").as("iid"))
      .join(w.select("issue_id").distinct(),
        col("iid") === w("issue_id"), "left_semi").count()
    assert(without + withW === i.count())
  }

  test("q136 running totals end at each author's overall total") {
    val q136 = SparkEntry
      .queries("q136_jira_author_daily_running")(spark, dir)
    val last = q136.groupBy("author_id")
      .agg(max("running_billable").as("final_running"),
        sum("day_billable").as("total"))
    assert(last.filter(col("final_running") =!= col("total")).isEmpty,
      "cumulative window must end at the author's own sum")
  }
}
