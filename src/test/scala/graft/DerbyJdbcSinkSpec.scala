package graft

import java.util.Properties

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.operators.Upsert
import graft.sources.{JdbcUpsert, TableSink}

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

  // ------------------------------------------------------------------
  // dialect-specific in-place upsert SQL — the reference's actual sink
  // statements (db_ops.py:29-100), generated shape-for-shape
  // ------------------------------------------------------------------

  private val cols = Seq("issue_id", "status", "hours")

  test("Postgres dialect pins the reference's ON CONFLICT statement shape") {
    // db_ops.py:36-41, `?` in place of DB-API `%s`
    assert(JdbcUpsert.Postgres.statement("issues", cols, "issue_id") ===
      "INSERT INTO issues (issue_id, status, hours) VALUES (?, ?, ?) " +
        "ON CONFLICT (issue_id) DO UPDATE " +
        "SET status = EXCLUDED.status, hours = EXCLUDED.hours")
    assert(JdbcUpsert.Postgres.bindColumns(cols, "issue_id") === cols)
  }

  test("MySQL dialect pins the reference's ON DUPLICATE KEY UPDATE shape") {
    // db_ops.py:63-68
    assert(JdbcUpsert.MySql.statement("issues", cols, "issue_id") ===
      "INSERT INTO issues (issue_id, status, hours) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE " +
        "status = VALUES(status), hours = VALUES(hours)")
    assert(JdbcUpsert.MySql.bindColumns(cols, "issue_id") === cols)
  }

  test("MSSQL dialect pins the reference's MERGE shape, row bound twice") {
    // db_ops.py:90-98: USING (SELECT …) AS source carries one bound copy of
    // the row, the INSERT branch the second — bind order = columns ++ columns
    assert(JdbcUpsert.MsSql.statement("issues", cols, "issue_id") ===
      "MERGE INTO issues AS target " +
        "USING (SELECT ?, ?, ?) AS source (issue_id, status, hours) " +
        "ON target.issue_id = source.issue_id " +
        "WHEN MATCHED THEN UPDATE SET " +
        "target.status = source.status, target.hours = source.hours " +
        "WHEN NOT MATCHED THEN INSERT (issue_id, status, hours) " +
        "VALUES (?, ?, ?);")
    assert(JdbcUpsert.MsSql.bindColumns(cols, "issue_id") === cols ++ cols)
  }

  test("Derby dialect phrases the MERGE against SYSIBM.SYSDUMMY1") {
    assert(JdbcUpsert.Derby.statement("issues", cols, "issue_id") ===
      "MERGE INTO issues AS target USING SYSIBM.SYSDUMMY1 AS source " +
        "ON target.issue_id = ? " +
        "WHEN MATCHED THEN UPDATE SET status = ?, hours = ? " +
        "WHEN NOT MATCHED THEN INSERT (issue_id, status, hours) " +
        "VALUES (?, ?, ?)")
    assert(JdbcUpsert.Derby.bindColumns(cols, "issue_id") ===
      Seq("issue_id", "status", "hours", "issue_id", "status", "hours"))
  }

  test("factory dispatches on conn-id prefix like the reference") {
    // db_ops.py:102-112
    assert(JdbcUpsert.forConnId("postgres_default") === JdbcUpsert.Postgres)
    assert(JdbcUpsert.forConnId("mysql_jira") === JdbcUpsert.MySql)
    assert(JdbcUpsert.forConnId("mssql_prod") === JdbcUpsert.MsSql)
    assert(JdbcUpsert.forConnId("derby_test") === JdbcUpsert.Derby)
    assertThrows[IllegalArgumentException](JdbcUpsert.forConnId("oracle_x"))
    assert(JdbcUpsert.forUrl("jdbc:postgresql://h/db") === JdbcUpsert.Postgres)
    assert(JdbcUpsert.forUrl("jdbc:mysql://h/db") === JdbcUpsert.MySql)
    assert(JdbcUpsert.forUrl("jdbc:sqlserver://h") === JdbcUpsert.MsSql)
    assert(JdbcUpsert.forUrl(url) === JdbcUpsert.Derby)
    assertThrows[IllegalArgumentException](JdbcUpsert.forUrl("jdbc:oracle:x"))
  }

  test("MERGE executes in place on Derby: update with no table swap") {
    import spark.implicits._
    // the table is created HERE, with a primary key the Spark writer would
    // not produce — if any code path dropped/recreated it, the PK vanishes
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE issues_inplace (issue_id BIGINT NOT NULL PRIMARY KEY, " +
          "status VARCHAR(32), hours BIGINT)")
    } finally conn.close()

    def primaryKeyCols(): Seq[String] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.getMetaData.getPrimaryKeys(null, null, "ISSUES_INPLACE")
        val b = Seq.newBuilder[String]
        while (rs.next()) b += rs.getString("COLUMN_NAME")
        b.result()
      } finally c.close()
    }

    val day1 = Seq(
      (101L, "To Do", 5L),
      (102L, "In Progress", 7L),
      (103L, "Done", 2L)).toDF("issue_id", "status", "hours")
    JdbcUpsert.upsertInPlace(day1, url, "issues_inplace", props, "issue_id")

    val day2 = Seq(
      (102L, "Done", 9L),   // existing key: MATCHED branch updates in place
      (104L, "To Do", 1L)). // new key: NOT MATCHED branch inserts
      toDF("issue_id", "status", "hours")
    JdbcUpsert.upsertInPlace(day2, url, "issues_inplace", props, "issue_id")

    val back = spark.read.jdbc(url, "issues_inplace", props)
      .select(col("issue_id"), col("status").cast("string"), col("hours"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back.toSeq === Seq(
      (101L, "To Do", 5L),
      (102L, "Done", 9L),
      (103L, "Done", 2L),
      (104L, "To Do", 1L)))
    // no table swap: the hand-made PK survived both upserts
    assert(primaryKeyCols() === Seq("ISSUE_ID"))
  }

  test("in-place upsert: omitted column NULL on insert, kept on update") {
    import spark.implicits._
    // reference semantics (db_ops.py): the record's keys decide the column
    // list, so an omitted column is NULL for fresh inserts and UNTOUCHED for
    // matched updates — narrower than the set-based Upsert's whole-row
    // replacement, and pinned here as the dialect behavior
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE omission_inplace (k BIGINT NOT NULL PRIMARY KEY, " +
          "s VARCHAR(32), v BIGINT)")
    } finally conn.close()
    val base = Seq((1L, "a", 10L)).toDF("k", "s", "v")
    JdbcUpsert.upsertInPlace(base, url, "omission_inplace", props, "k")
    val updates = Seq((1L, "b"), (2L, "c")).toDF("k", "s") // no `v`
    JdbcUpsert.upsertInPlace(updates, url, "omission_inplace", props, "k")
    val back = spark.read.jdbc(url, "omission_inplace", props)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1)
    assert(back.toSeq === Seq(
      (1L, "b", Some(10L)), // matched: v untouched
      (2L, "c", None)))     // inserted: v NULL
  }

  test("key-only records degrade like the reference would need them to") {
    assert(JdbcUpsert.Postgres.statement("t", Seq("k"), "k") ===
      "INSERT INTO t (k) VALUES (?) ON CONFLICT (k) DO NOTHING")
    assert(JdbcUpsert.MySql.statement("t", Seq("k"), "k") ===
      "INSERT INTO t (k) VALUES (?) ON DUPLICATE KEY UPDATE k = k")
    assert(JdbcUpsert.Derby.statement("t", Seq("k"), "k") ===
      "MERGE INTO t AS target USING SYSIBM.SYSDUMMY1 AS source " +
        "ON target.k = ? " +
        "WHEN NOT MATCHED THEN INSERT (k) VALUES (?)")
  }
}
