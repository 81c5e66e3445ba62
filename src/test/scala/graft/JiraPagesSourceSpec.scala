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

  test("transient page failures retry with backoff; committed pages are never re-read") {
    import graft.sources.jira.PageTransport
    PageTransport.resetForTest()
    try {
      val flaky = fixture("issues_page_2.json")
      // page 2 fails on its first two attempts, then recovers
      PageTransport.faultInjector = (path, attempt) =>
        if (path == flaky && attempt <= 2)
          throw new java.io.IOException(s"injected transient failure (attempt $attempt)")
      val v2 = spark.read.format("graft-jira-pages")
        .option("entity", "issues")
        .option("mode", "cursor")
        .option("retries", "3")
        .option("retryBackoffMs", "1")
        .load(fixture("issues_page_1.json"), flaky)
      assert(v2.count() === 3, "the scan must complete through the transient failure")
      assert(PageTransport.fetchAttempts.get(fixture("issues_page_1.json")) === 1,
        "the committed page must not be re-read on the later page's retries")
      assert(PageTransport.fetchAttempts.get(flaky) === 3,
        "the flaky page retries exactly until it recovers")
    } finally PageTransport.resetForTest()
  }

  test("retries exhaust into a terminal failure (no infinite retry loop)") {
    import graft.sources.jira.PageTransport
    PageTransport.resetForTest()
    try {
      PageTransport.faultInjector = (_, _) =>
        throw new java.io.IOException("injected permanent failure")
      val v2 = spark.read.format("graft-jira-pages")
        .option("entity", "issues")
        .option("retries", "2")
        .option("retryBackoffMs", "1")
        .load(fixture("issues_page_1.json"))
      val e = intercept[org.apache.spark.SparkException](v2.count())
      assert(e.getMessage.contains("failed after 2 attempts") ||
        Option(e.getCause).exists(_.getMessage.contains("failed after 2 attempts")))
      assert(PageTransport.fetchAttempts.get(fixture("issues_page_1.json")) >= 2)
    } finally PageTransport.resetForTest()
  }

  test("null/absent fields surface as SQL NULL (reference column-omission semantics)") {
    val v2 = readPages("issues", "issues_page_1.json")
    val r = v2.filter(col("id") === "10002")
      .select("fields.resolution", "fields.assignee", "fields.timespent").head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
