package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: measure end-to-end ingest throughput on reference-shaped
  * issue pages at volume — the single-node comparison BASELINE.md's sink
  * numbers imply (the reference commits one INSERT round trip per record,
  * `dags/jira/db_ops.py:32-42`, sequential Python). Generates N synthetic
  * issue records across JSON pages, then times IngestJob (read → flatten →
  * upsert → parquet) fresh and incremental.
  * Run: `sbt "runMain graft.IngestBench [nRecords]"`.
  */
object IngestBench {

  private def issueJson(i: Long): String = {
    val labels = s""""lbl${i % 7}", "lbl${i % 3}""""
    s"""{
       |"id": "$i", "self": "https://x.example.net/rest/api/3/issue/$i",
       |"key": "PROJ-$i",
       |"fields": {
       |  "resolution": {"self": "https://x/res/$i", "id": "${i % 5}", "description": "d", "name": "Done"},
       |  "priority": {"name": "P${i % 4}"},
       |  "labels": [$labels],
       |  "assignee": {"self": "https://x/u/a$i", "accountId": "acc-${i % 1000}", "displayName": "U${i % 1000}", "active": true, "timeZone": "UTC", "accountType": "atlassian"},
       |  "status": {"self": "https://x/s/$i", "description": "s", "name": "S${i % 3}",
       |    "statusCategory": {"self": "https://x/sc/$i", "id": ${i % 4}, "key": "k", "colorName": "c", "name": "N"}},
       |  "creator": {"self": "https://x/u/c$i", "accountId": "acc-${(i + 7) % 1000}", "displayName": "C", "active": true, "timeZone": "UTC", "accountType": "atlassian"},
       |  "reporter": {"self": "https://x/u/r$i", "accountId": "acc-${(i + 13) % 1000}", "displayName": "R", "active": true, "timeZone": "UTC", "accountType": "atlassian"},
       |  "issuetype": {"self": "https://x/t/$i", "id": "${i % 6}", "description": "t", "name": "T${i % 6}", "subtask": false, "hierarchyLevel": 0},
       |  "project": {"self": "https://x/p/$i", "id": "${i % 9}", "key": "PROJ", "name": "Project"},
       |  "created": "2024-01-0${1 + i % 9}T10:00:00.000+0000",
       |  "updated": "2024-01-0${1 + i % 9}T12:00:00.000+0000",
       |  "summary": "synthetic issue $i for ingest throughput measurement"
       |}}""".stripMargin.replace("\n", " ")
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val perPage = 10000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_ingestbench").toString
    val pages = (0L until n by perPage).map { start =>
      val recs = (start until math.min(start + perPage, n)).map(issueJson)
      val p = s"$root/page_$start.json"
      Files.writeString(Paths.get(p),
        recs.mkString(s"""{"startAt": $start, "maxResults": $perPage, "total": $n, "issues": [""", ",", "]}"))
      p
    }
    val table = s"$root/issues_table"
    val t0 = System.nanoTime()
    val out = graft.etl.IngestJob.run(spark, "issues", pages, table)
    val rows = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"== fresh ingest: $rows rows in $secs%.1f s = ${rows / secs}%.0f rec/s")
    // incremental re-run (idempotent upsert over the same pages)
    val t1 = System.nanoTime()
    val out2 = graft.etl.IngestJob.run(spark, "issues", pages, table)
    val rows2 = out2.count()
    val secs2 = (System.nanoTime() - t1) / 1e9
    println(f"== idempotent re-run: $rows2 rows in $secs2%.1f s = ${rows2 / secs2}%.0f rec/s")
    // live-SQL in-place upsert (the reference's actual sink behavior,
    // db_ops.py:29-100, spoken through JdbcUpsert's batched MERGE): load
    // the flattened table into embedded Derby once, then time a full
    // re-upsert — every row takes the MATCHED branch, the table is never
    // swapped. The reference pays one execute round trip per record from
    // sequential Python; this path ships executeBatch groups per
    // partition.
    val url = s"jdbc:derby:memory:ingestbench${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    val flat = spark.read.parquet(table).localCheckpoint(true)
    // table created the reference's way — hand-written unquoted DDL
    // (db_ops.py create_table), which is what the unquoted dialect
    // statements address
    val ddl = flat.schema.fields.map { f =>
      val t = f.dataType match {
        case org.apache.spark.sql.types.LongType    => "BIGINT"
        case org.apache.spark.sql.types.IntegerType => "INTEGER"
        case org.apache.spark.sql.types.DoubleType  => "DOUBLE"
        case org.apache.spark.sql.types.BooleanType => "BOOLEAN"
        case _: org.apache.spark.sql.types.TimestampType => "TIMESTAMP"
        case _ => "VARCHAR(2048)"
      }
      val notNull = if (f.name == "issue_id") " NOT NULL" else ""
      s"${f.name} $t$notNull"
    }.mkString(", ")
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      s"CREATE TABLE issues_sink ($ddl, PRIMARY KEY (issue_id))")
    finally conn.close()
    // ONE writer connection: embedded Derby's MERGE plan cache is not safe
    // under concurrent preparers (internal NPE); a server DB (Postgres/
    // MySQL) takes the per-partition parallel form. Single-connection
    // batched MERGE is still the apples-to-apples comparison against the
    // reference's sequential per-record execute.
    val one = flat.coalesce(1)
    val t2 = System.nanoTime()
    graft.sources.TableSink.upsertJdbc(one, url, "issues_sink", props, "issue_id")
    val secs3 = (System.nanoTime() - t2) / 1e9
    println(f"== in-place JDBC load, all NOT MATCHED (Derby MERGE, 1 conn): $rows rows in " +
      f"$secs3%.1f s = ${rows / secs3}%.0f rec/s")
    val t3 = System.nanoTime()
    graft.sources.TableSink.upsertJdbc(one, url, "issues_sink", props, "issue_id")
    val secs4 = (System.nanoTime() - t3) / 1e9
    val inDb = spark.read.jdbc(url, "issues_sink", props).count()
    println(f"== in-place JDBC re-upsert, all MATCHED (1 conn): $inDb rows in " +
      f"$secs4%.1f s = ${inDb / secs4}%.0f rec/s")
    spark.stop()
  }
}
