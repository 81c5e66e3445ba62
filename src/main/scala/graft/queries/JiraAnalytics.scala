package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.JiraCorpus

/** Jira-native FK analytics — the queries a reference user actually runs
  * over the persisted star: worklogs ⋈ issues on
  * `worklogs.issue_id → issues.issue_id`
  * (`dags/fetch_jira_tempo_worklogs.py:82` ↔ `fetch_jira_issues.py:72`) and
  * worklogs ⋈ users on `worklogs.author_id → users.account_id`
  * (`fetch_jira_tempo_worklogs.py:91` ↔ `fetch_jira_users.py:75`), with the
  * issue-side person FKs (`fetch_jira_issues.py:82,94,100`) surfaced by the
  * anti-join query. Inputs come from [[graft.etl.JiraCorpus]] — the REAL
  * page-envelope → from_json → Flatten ingestion path over deterministic
  * API-shaped JSON — so the oracle recomputes every value from the base
  * tables while Spark runs the full pipeline.
  *
  * Scale posture: worklogs⋈issues is the fact-fact shuffle join on the FK
  * (both sides re-shuffle on issue_id — at 100 TB this is the unavoidable
  * co-location); users is a dimension → broadcast. Aggregations are
  * partial+final; the running-total window partitions by author (bounded
  * group count), never a global single-partition window.
  */
object JiraAnalytics {

  val defs: Seq[QueryDef] = Seq(

    // q134: billable hours per worklog author per issue status category —
    // the README's pitch query (worklog reporting over the FK star). Both
    // FKs live: worklogs⋈issues (shuffle, fact-fact) + worklogs⋈users
    // (broadcast dim). billable_seconds is integer-exact
    // (floor(qty)·36·(100−floor(100·disc+0.5))), so the whole
    // train-of-joins hash-matches the DuckDB oracle.
    QueryDef("q134_jira_billable_by_author_status",
      (s, d) => {
        val w = JiraCorpus.worklogs(s, d)
          .select(col("issue_id").as("w_issue_id"), col("author_id"),
            col("billable_seconds"))
        // reference DDL stores issue_id BIGINT (fetch_jira_issues.py:72);
        // the API ships it as a string — cast at the join boundary.
        val i = JiraCorpus.issues(s, d)
          .select(col("issue_id").cast("long").as("i_issue_id"),
            col("fields_status_statusCategory_key").as("status_category"))
        val u = JiraCorpus.users(s, d)
          .select(col("account_id"), col("display_name"))
        w.join(i, col("w_issue_id") === col("i_issue_id"))
          .join(broadcast(u), col("author_id") === col("account_id"))
          .groupBy(col("display_name"), col("status_category"))
          .agg(sum(col("billable_seconds")).as("billable_seconds"),
            count(lit(1)).as("n_worklogs"))
          .select(col("display_name").as("author_name"),
            col("status_category"), col("billable_seconds"),
            col("n_worklogs"))
          .orderBy("author_name", "status_category")
      },
      Some("""WITH w AS (
          SELECT l_orderkey AS issue_id,
                 'acct-' || ((l_orderkey*7 + l_linenumber) % 150) AS author_id,
                 CAST(floor(l_quantity) AS BIGINT) * 36 *
                   (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS billable_seconds
          FROM lineitem WHERE l_orderkey % 3 <> 0),
        i AS (
          SELECT o_orderkey AS issue_id,
                 CASE o_orderstatus WHEN 'O' THEN 'new'
                   WHEN 'P' THEN 'indeterminate' ELSE 'done' END AS status_category
          FROM orders),
        u AS (SELECT 'acct-' || c_custkey AS account_id, c_name AS display_name
              FROM customer)
        SELECT u.display_name AS author_name, i.status_category,
               CAST(sum(w.billable_seconds) AS BIGINT) AS billable_seconds,
               count(*) AS n_worklogs
        FROM w JOIN i ON w.issue_id = i.issue_id
               JOIN u ON w.author_id = u.account_id
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // q135: issues with no logged work — left-anti over the worklog FK
    // (a third of the corpus by construction). Surfaces the issue-side
    // person FK: unassigned issues (null propagated through the flatten's
    // null-parent rule) report '(unassigned)'.
    QueryDef("q135_jira_issues_without_worklogs",
      (s, d) => {
        val i = JiraCorpus.issues(s, d)
        val w = JiraCorpus.worklogs(s, d).select(col("issue_id"))
        i.join(w, i("issue_id").cast("long") === w("issue_id"), "left_anti")
          .select(col("issue_key"),
            col("fields_status_name").as("status_name"),
            coalesce(col("fields_assignee_account_id"),
              lit("(unassigned)")).as("assignee_account_id"))
          .orderBy("issue_key")
      },
      Some("""WITH wk AS (
          SELECT DISTINCT l_orderkey AS issue_id
          FROM lineitem WHERE l_orderkey % 3 <> 0)
        SELECT 'PROJ-' || o_orderkey AS issue_key,
               CASE o_orderstatus WHEN 'O' THEN 'To Do'
                 WHEN 'P' THEN 'In Progress' ELSE 'Done' END AS status_name,
               CASE WHEN o_custkey % 11 = 5 THEN '(unassigned)'
                 ELSE 'acct-' || o_custkey END AS assignee_account_id
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM wk WHERE wk.issue_id = o.o_orderkey)
        ORDER BY issue_key""")),

    // q136: per-author daily billable totals + running cumulative — the
    // timesheet report. One partial+final agg on (author, day), then a
    // per-author window (bounded partitions; no global sort until the
    // final presentation orderBy).
    QueryDef("q136_jira_author_daily_running",
      (s, d) => {
        val daily = JiraCorpus.worklogs(s, d)
          .groupBy(col("author_id"), col("start_date"))
          .agg(sum(col("billable_seconds")).as("day_billable"))
        val u = JiraCorpus.users(s, d)
          .select(col("account_id"), col("display_name"))
        val win = Window.partitionBy("author_id").orderBy("start_date")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(broadcast(u), col("author_id") === col("account_id"))
          .select(col("author_id"), col("display_name"), col("start_date"),
            col("day_billable"),
            sum(col("day_billable")).over(win).as("running_billable"))
          .orderBy("author_id", "start_date")
      },
      Some("""WITH w AS (
          SELECT 'acct-' || ((l_orderkey*7 + l_linenumber) % 150) AS author_id,
                 CAST(l_shipdate AS DATE) AS start_date,
                 CAST(floor(l_quantity) AS BIGINT) * 36 *
                   (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS billable_seconds
          FROM lineitem WHERE l_orderkey % 3 <> 0),
        d AS (
          SELECT author_id, start_date,
                 CAST(sum(billable_seconds) AS BIGINT) AS day_billable
          FROM w GROUP BY 1, 2),
        u AS (SELECT 'acct-' || c_custkey AS account_id, c_name AS display_name
              FROM customer)
        SELECT d.author_id, u.display_name, d.start_date, d.day_billable,
               CAST(sum(d.day_billable) OVER (
                 PARTITION BY d.author_id ORDER BY d.start_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS running_billable
        FROM d JOIN u ON d.author_id = u.account_id
        ORDER BY author_id, start_date"""))
  )
}
