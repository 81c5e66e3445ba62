package graft

import graft.etl.JiraCorpus

/** Ingest-once contract for the synthesized Jira corpus: the materialized
  * tables queries read must be exactly the raw ingestion path's output, and
  * repeated reads must reuse the same at-rest files instead of re-paying
  * synthesis (round 8's q134 spent 28 s re-ingesting per query call).
  */
class JiraCorpusSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("materialized tables equal the raw ingestion path's output") {
    for ((raw, mat) <- Seq(
        JiraCorpus.issuesRaw(spark, dir)   -> JiraCorpus.issues(spark, dir),
        JiraCorpus.worklogsRaw(spark, dir) -> JiraCorpus.worklogs(spark, dir),
        JiraCorpus.usersRaw(spark, dir)    -> JiraCorpus.users(spark, dir))) {
      assert(mat.schema === raw.schema)
      assert(mat.count() === raw.count())
      assert(mat.except(raw).isEmpty && raw.except(mat).isEmpty)
    }
  }

  test("repeated reads reuse the same materialized files") {
    val first = JiraCorpus.worklogs(spark, dir).inputFiles.toSet
    val second = JiraCorpus.worklogs(spark, dir).inputFiles.toSet
    assert(first.nonEmpty && first === second)
  }

  test("materialized read plan is a plain scan, no re-ingestion") {
    val plan = JiraCorpus.issues(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("from_json") && !plan.contains("collect_list"),
      "query-side plan re-runs ingestion")
  }
}
