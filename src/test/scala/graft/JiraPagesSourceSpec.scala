package graft

import org.apache.spark.sql.functions._

import graft.etl.{Flatten, JiraEtl}

/** DataSource V2 page source: parity with the schema'd JSON reader,
  * page-per-partition parallelism, column pruning pushed into the reader,
  * and composition with the P1–P3 flatten.
  */
class JiraPagesSourceSpec extends SparkSpec {

  private def readPages(entity: String, files: String*) =
    spark.read.format("graft-jira-pages")
      .option("entity", entity)
      .load(files.map(fixture): _*)

  test("issues: DSv2 rows match the spark.read.json path") {
    val v2 = readPages("issues", "issues_page_1.json", "issues_page_2.json")
    assert(v2.schema === JiraEtl.issueSchema)
    assert(v2.count() === 3)
    val flat = Flatten(v2, JiraEtl.issueMapping)
    val viaJson = JiraEtl.readIssues(spark,
      fixture("issues_page_1.json"), fixture("issues_page_2.json"))
    assert(flat.orderBy("issue_id").collect().toSeq ===
      viaJson.orderBy("issue_id").collect().toSeq)
  }

  test("one InputPartition per page file (the pagination loop, parallelized)") {
    val v2 = readPages("issues", "issues_page_1.json", "issues_page_2.json")
    assert(v2.rdd.getNumPartitions === 2)
  }

  test("column pruning reaches the reader (pruned ReadSchema in the scan)") {
    val v2 = readPages("issues", "issues_page_1.json").select("key")
    val scan = v2.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its (pruned) output list: only `key` may appear
    assert(scan.contains("BatchScan graft-jira-pages(issues)[key#"),
      s"expected scan output pruned to [key], plan was:\n$scan")
    assert(!scan.contains("fields#"),
      s"unrequested fields must not be read:\n$scan")
    assert(v2.collect().map(_.getString(0)).sorted.toSeq === Seq("PROJ-1", "PROJ-2"))
  }

  test("users (bare array) and worklogs (cursor envelope) read through the same source") {
    val users = readPages("users", "users_1.json")
    assert(users.count() === 2)
    assert(users.select("accountId").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("acc-1", "acc-2"))
    val wl = readPages("worklogs", "worklogs_page_1.json", "worklogs_page_2.json")
    assert(wl.count() === 3)
    assert(wl.select("tempoWorklogId").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L))
  }

  test("null/absent fields surface as SQL NULL (reference column-omission semantics)") {
    val v2 = readPages("issues", "issues_page_1.json")
    val r = v2.filter(col("id") === "10002")
      .select("fields.resolution", "fields.assignee", "fields.timespent").head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
