package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic Jira-shaped corpus synthesized from the testdata star
  * schema, fed through the REAL ingestion path — raw API-shaped JSON page
  * strings → schema'd `from_json` → page-array explode → the P1–P3
  * [[Flatten]] mappings — so the FK analytics queries (q134–q136) exercise
  * the exact pipeline a reference user runs, while every value stays
  * recomputable by the DuckDB oracle straight from the base tables.
  *
  * Entity mapping (all arithmetic integer-exact, hence bit-portable):
  *  - `users`    ← `customer`: `account_id = 'acct-' || c_custkey`
  *    (`fetch_jira_users.py:75` account_id PK);
  *  - `issues`   ← `orders`: `issue_id = o_orderkey`, status name /
  *    statusCategory key derived from `o_orderstatus`
  *    (`fetch_jira_issues.py:72` issue_id PK; `:82,94,100` person FKs);
  *  - `worklogs` ← `lineitem` rows with `l_orderkey % 3 <> 0` (so a third
  *    of the issues have NO worklogs — the anti-join family stays
  *    non-trivial): `issue.id = l_orderkey` → `issues.issue_id`
  *    (`fetch_jira_tempo_worklogs.py:82`), `author.accountId =
  *    'acct-' || ((l_orderkey*7 + l_linenumber) % 150)` → `users`
  *    (`fetch_jira_tempo_worklogs.py:91`; 150 = customer count at the
  *    smallest SF, so authors exist at every scale factor).
  *
  * Page envelopes reproduce the reference's two pagination shapes: offset
  * (`{startAt, maxResults, total, issues}`, S2) for issues and cursor
  * (`{results, metadata:{next}}`, S3) for worklogs; users arrive as bare
  * objects (the JSON-array response body). Pages are keyed by
  * `key div pageSize` — a map-side expression, not a global row_number —
  * so page assembly is one bounded groupBy, no single-partition window.
  *
  * Scale posture: synthesis is a projection + one groupBy per entity; the
  * JSON round-trip (to_json → from_json) is map-side codegen. At 100 TB the
  * same plan shape holds — nothing collects, nothing cross-joins beyond the
  * broadcast single-row total used by the offset envelope.
  */
object JiraCorpus {

  private val pageSize = 50

  /** Jira person object with raw API field names (person leaf mapping in
    * [[JiraEtl.issueMapping]]). Null when `acct` is null (unassigned).
    */
  private def person(acct: Column): Column = when(acct.isNotNull, struct(
    concat(lit("https://jira.example/user/"), acct).as("self"),
    concat(lit("acct-"), acct).as("accountId"),
    format_string("Customer#%09d", acct).as("displayName"),
    (acct % 10 =!= 7).as("active"),
    lit("Etc/UTC").as("timeZone"),
    lit("atlassian").as("accountType")))

  private def statusName(st: Column): Column =
    when(st === "O", "To Do").when(st === "P", "In Progress").otherwise("Done")
  private def categoryKey(st: Column): Column =
    when(st === "O", "new").when(st === "P", "indeterminate").otherwise("done")
  private def categoryName(st: Column): Column =
    when(st === "O", "New").when(st === "P", "In Progress").otherwise("Complete")

  /** Offset-paginated issue pages as raw JSON strings (S2 envelope). */
  def issuePagesJson(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // unassigned slice: o_custkey % 11 == 5 → null assignee (the mapping's
    // null-parent propagation is live in the corpus, not just in specs)
    val assignee = person(when(col("o_custkey") % 11 =!= 5, col("o_custkey")))
    val issue = struct(
      col("o_orderkey").cast("string").as("id"),
      concat(lit("https://jira.example/rest/api/2/issue/"),
        col("o_orderkey")).as("self"),
      concat(lit("PROJ-"), col("o_orderkey")).as("key"),
      struct(
        when(col("o_orderstatus") === "F", struct(
          lit("https://jira.example/resolution/1").as("self"),
          lit("1").as("id"),
          lit("Work completed").as("description"),
          lit("Done").as("name"))).as("resolution"),
        struct(col("o_orderpriority").as("name")).as("priority"),
        split(col("o_orderpriority"), "-").as("labels"),
        assignee.as("assignee"),
        struct(
          concat(lit("https://jira.example/status/"),
            col("o_orderstatus")).as("self"),
          lit("Synthesized from o_orderstatus").as("description"),
          statusName(col("o_orderstatus")).as("name"),
          struct(
            concat(lit("https://jira.example/statuscategory/"),
              categoryKey(col("o_orderstatus"))).as("self"),
            categoryKey(col("o_orderstatus")).as("key"),
            categoryName(col("o_orderstatus")).as("name")).as("statusCategory")
        ).as("status"),
        person(col("o_custkey")).as("creator"),
        person(col("o_custkey")).as("reporter"),
        struct(
          floor(col("o_totalprice")).as("progress"),
          lit(100000L).as("total"),
          (floor(col("o_totalprice")) % 101).as("percent")).as("progress"),
        when(col("o_orderstatus") === "F",
          floor(col("o_totalprice"))).as("timespent"),
        struct(
          lit("https://jira.example/project/1").as("self"),
          lit("1").as("id"),
          lit("PROJ").as("key"),
          lit("Orders").as("name"),
          lit("software").as("projectTypeKey")).as("project"),
        concat(lit("Order "), col("o_orderkey"), lit(" ["),
          col("o_orderpriority"), lit("]")).as("summary")).as("fields"))
    val total = o.agg(count(lit(1)).as("total"))
    o.select(expr(s"o_orderkey div $pageSize").as("page"), issue.as("issue"))
      .groupBy(col("page"))
      .agg(collect_list(col("issue")).as("issues"))
      .crossJoin(broadcast(total))
      .select(to_json(struct(
        (col("page") * pageSize).as("startAt"),
        lit(pageSize.toLong).as("maxResults"),
        col("total"),
        col("issues"))).as("json"))
  }

  /** Cursor-paginated worklog pages as raw JSON strings (S3 envelope). */
  def worklogPagesJson(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_orderkey") % 3 =!= 0)
    val billable = floor(col("l_quantity")) * 36 *
      (lit(100) - floor(col("l_discount") * 100 + 0.5))
    val wl = struct(
      concat(lit("https://tempo.example/worklogs/"),
        col("l_orderkey") * 10 + col("l_linenumber")).as("self"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("tempoWorklogId"),
      struct(
        col("l_orderkey").as("id"),
        concat(lit("https://jira.example/rest/api/2/issue/"),
          col("l_orderkey")).as("self")).as("issue"),
      (floor(col("l_quantity")) * 3600).as("timeSpentSeconds"),
      billable.as("billableSeconds"),
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("startDate"),
      concat(lpad((col("l_orderkey") + col("l_linenumber")) % 24, 2, "0"),
        lit(":00:00")).as("startTime"),
      concat(lit("Worked on order "), col("l_orderkey")).as("description"),
      date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("createdAt"),
      date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("updatedAt"),
      struct(
        concat(lit("acct-"),
          (col("l_orderkey") * 7 + col("l_linenumber")) % 150).as("accountId"),
        concat(lit("https://jira.example/user/"),
          (col("l_orderkey") * 7 + col("l_linenumber")) % 150).as("self")
      ).as("author"))
    val lastPage = l.agg(max(expr(s"l_orderkey div $pageSize")).as("last_page"))
    l.select(expr(s"l_orderkey div $pageSize").as("page"), wl.as("w"))
      .groupBy(col("page"))
      .agg(collect_list(col("w")).as("results"))
      .crossJoin(broadcast(lastPage))
      .select(to_json(struct(
        col("results"),
        struct(when(col("page") < col("last_page"),
          concat(lit("cursor-"), col("page") + 1)).as("next")).as("metadata")
      )).as("json"))
  }

  /** Bare user objects as raw JSON strings (JSON-array response body). */
  def userRowsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(to_json(struct(
      concat(lit("https://jira.example/user/"), col("c_custkey")).as("self"),
      concat(lit("acct-"), col("c_custkey")).as("accountId"),
      lit("atlassian").as("accountType"),
      struct(concat(lit("https://avatar.example/"), col("c_custkey"),
        lit("/48")).as("48x48")).as("avatarUrls"),
      col("c_name").as("displayName"),
      (col("c_custkey") % 10 =!= 7).as("active"))).as("json"))

  // ---- flat tables through the real parse + flatten path ----------------

  /** Full ingestion path, re-synthesized on every call — the pipeline
    * proof (JiraEtlSpec, JiraCorpusSpec). Queries should read the
    * materialized form ([[issues]]) instead: a reference user ingests once
    * per day (`fetch_jira_issues.py:15` schedule) and queries all day, so
    * paying page assembly + the JSON round trip per QUERY would be
    * re-running ingestion at read time — the definition of a scale-killer
    * at 100 TB.
    */
  def issuesRaw(spark: SparkSession, dir: String): DataFrame =
    JiraEtl.issuesFromPages(
      issuePagesJson(spark, dir)
        .select(from_json(col("json"), JiraEtl.issuePageSchema).as("p"))
        .select(col("p.*")))

  def worklogsRaw(spark: SparkSession, dir: String): DataFrame =
    JiraEtl.worklogsFromPages(
      worklogPagesJson(spark, dir)
        .select(from_json(col("json"), JiraEtl.worklogPageSchema).as("p"))
        .select(col("p.*")))

  def usersRaw(spark: SparkSession, dir: String): DataFrame =
    JiraEtl.usersFromRows(
      userRowsJson(spark, dir)
        .select(from_json(col("json"), JiraEtl.userSchema).as("u"))
        .select(col("u.*")))

  // ---- ingest-once materialization ---------------------------------------

  // source dir -> temp parquet root holding the three flattened tables.
  // The corpus is deterministic in `dir`, so one synthesis per JVM serves
  // every query; parquet (not localCheckpoint) so the at-rest form is the
  // same partitioned columnar layout the engine's own sink produces, and
  // the read-back plan gets pushdown/pruning like any other table.
  // Memoized PER DIR via a lazy wrapper: computeIfAbsent inserts only the
  // cheap unevaluated Memo under the CHM bin lock, and the multi-second
  // Spark materialization runs under the Memo's OWN monitor — so two
  // different dirs materialize concurrently even when they hash to the
  // same bin (running the synthesis inside the mapping function would
  // serialize them, and long-blocking mapping functions are explicitly
  // discouraged for CHM).
  private final class Memo(spark: SparkSession, dir: String) {
    lazy val value: String = {
      val base = java.nio.file.Files
        .createTempDirectory("graft_jira_corpus")
      // session-scoped scratch, not a published table: delete on JVM
      // exit so repeated driver runs don't accumulate /tmp debris
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(base.toFile)
      }
      issuesRaw(spark, dir).write.parquet(s"$base/issues")
      worklogsRaw(spark, dir).write.parquet(s"$base/worklogs")
      usersRaw(spark, dir).write.parquet(s"$base/users")
      base.toString
    }
  }

  private val materialized =
    new java.util.concurrent.ConcurrentHashMap[String, Memo]

  private def tableRoot(spark: SparkSession, dir: String): String =
    materialized.computeIfAbsent(dir, new Memo(spark, _)).value

  /** Flattened issues table, materialized once per source dir. */
  def issues(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${tableRoot(spark, dir)}/issues")

  /** Flattened worklogs table, materialized once per source dir. */
  def worklogs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${tableRoot(spark, dir)}/worklogs")

  /** Flattened users table, materialized once per source dir. */
  def users(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${tableRoot(spark, dir)}/users")
}
