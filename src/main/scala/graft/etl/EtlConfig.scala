package graft.etl

/** Ingest configuration with preconditions — the reference's env-var config
  * + non-null asserts (C3: `os.environ.get(...)` defaults and
  * `assert x != None`, `dags/fetch_jira_issues.py:31-46`), as a plain
  * validated Scala object.
  */
final case class EtlConfig(
    jiraDomain: String,
    issuesTable: String = "jira_issues",
    usersTable: String = "jira_users",
    worklogsTable: String = "jira_tempo_worklogs",
    pageLimit: Int = 100) {
  require(jiraDomain.nonEmpty, "jira domain must be set (JIRA_DOMAIN)")
  require(pageLimit > 0, s"page limit must be positive, got $pageLimit")
  require(Seq(issuesTable, usersTable, worklogsTable).forall(_.nonEmpty),
    "table names must be non-empty")
}

object EtlConfig {
  /** Environment-driven construction with the reference's default table
    * names (`fetch_jira_issues.py:33-35` et al.).
    */
  def fromEnv(env: Map[String, String] = sys.env): EtlConfig =
    EtlConfig(
      jiraDomain = env.getOrElse("JIRA_DOMAIN", ""),
      issuesTable = env.getOrElse("JIRA_ISSUES_TABLE", "jira_issues"),
      usersTable = env.getOrElse("JIRA_USERS_TABLE", "jira_users"),
      worklogsTable = env.getOrElse("JIRA_WORKLOGS_TABLE", "jira_tempo_worklogs"),
      pageLimit = env.getOrElse("JIRA_PAGE_LIMIT", "100").toInt)
}
