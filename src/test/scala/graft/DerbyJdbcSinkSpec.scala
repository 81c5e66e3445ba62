package graft

import java.util.Properties

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.operators.Upsert
import graft.sources.TableSink

/** Live-SQL-sink parity: the reference's real sink is a SQL database with
  * per-record `INSERT ... ON CONFLICT (key) DO UPDATE`
  * (`dags/jira/db_ops.py:29-43`). This spec proves the engine's set-based
  * equivalent — [[Upsert]] merge + one batch JDBC write — round-trips
  * through an actual SQL database (embedded Derby, in-sandbox), with the
  * same observable semantics: write, upsert the same key twice, read back
  * last-writer-wins; keys only in updates insert; keys only in base stay.
  */
class DerbyJdbcSinkSpec extends SparkSpec {

  private val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("JDBC sink round-trip with keyed upsert is last-writer-wins") {
    import spark.implicits._
    val day1 = Seq(
      (101L, "To Do", 5L),
      (102L, "In Progress", 7L),
      (103L, "Done", 2L)).toDF("issue_id", "status", "hours")
    TableSink.writeJdbc(day1, url, "issues_sink", props)

    // Snapshot the base OUT of the table before overwriting it: the JDBC
    // scan is lazy, and SaveMode.Overwrite drops the table before the
    // write executes the merged plan — without the cut, the merge would
    // read its own truncation (day-2 rows only). Same discipline as any
    // read-modify-overwrite on one storage location.
    val base = spark.read.jdbc(url, "issues_sink", props).localCheckpoint(true)
    assert(base.count() === 3)

    // day-2 fetch: 102 transitions (same key twice overall), 104 is new
    val day2 = Seq(
      (102L, "Done", 9L),
      (104L, "To Do", 1L)).toDF("issue_id", "status", "hours")
    val merged = Upsert(base, day2, Seq("issue_id"))
    TableSink.writeJdbc(merged, url, "issues_sink", props, SaveMode.Overwrite)

    val back = spark.read.jdbc(url, "issues_sink", props)
      .select(col("issue_id"), col("status").cast("string"), col("hours"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back.toSeq === Seq(
      (101L, "To Do", 5L),        // untouched base key kept
      (102L, "Done", 9L),         // updated key: last writer wins
      (103L, "Done", 2L),         // untouched base key kept
      (104L, "To Do", 1L)))       // new key inserted
  }

  test("streaming foreachBatch upserts micro-batches into the SQL sink") {
    // the reference's daily DAG shape end-to-end: incremental arrivals →
    // keyed merge → SQL database, as a stream. Each micro-batch snapshots
    // the table, Upsert-merges, and overwrites — converging to the same
    // keyed state a batch run would produce.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val seed = Seq((1L, "To Do")).toDF("issue_id", "status")
    TableSink.writeJdbc(seed, url, "stream_sink", props)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("issue_id", "status").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val base = spark.read.jdbc(url, "stream_sink", props)
          .localCheckpoint(true)
        TableSink.writeJdbc(Upsert(base, batch, Seq("issue_id")),
          url, "stream_sink", props)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    mem.addData((1L, "In Progress"), (2L, "To Do"))
    q.processAllAvailable()
    mem.addData((2L, "Done"), (3L, "To Do"))
    q.processAllAvailable()
    q.stop()
    val state = spark.read.jdbc(url, "stream_sink", props)
      .select(col("issue_id"), col("status").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(state === Map(1L -> "In Progress", 2L -> "Done", 3L -> "To Do"))
  }

  test("column omitted from updates surfaces as NULL, like the reference") {
    import spark.implicits._
    val base = Seq((1L, "a", 10L)).toDF("k", "s", "v")
    val updates = Seq((1L, "b")).toDF("k", "s") // no `v` column
    val merged = Upsert(base, updates, Seq("k"))
    TableSink.writeJdbc(merged, url, "omission_sink", props)
    val row = spark.read.jdbc(url, "omission_sink", props).head()
    assert(row.getAs[String]("s") === "b")
    assert(row.isNullAt(row.fieldIndex("v")))
  }
}
