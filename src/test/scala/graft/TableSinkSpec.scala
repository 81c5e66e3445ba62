package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.TableSink

/** At-rest layout: partitioned parquet round-trip and — the point —
  * partition pruning: a filter on the partition column must appear as a
  * PartitionFilter (planning-time directory pruning), not a data filter.
  */
class TableSinkSpec extends SparkSpec {

  test("partitioned write round-trips and prunes partitions at planning time") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/events_by_type"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    TableSink.writePartitioned(events, dir, Seq("event_type"))

    val back = TableSink.read(spark, dir)
    assert(back.count() === events.count())

    val q = back.filter(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"),
      s"expected partition pruning on event_type, plan was:\n$plan")
    // pruned scan reads only the one directory
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(q.count() === expected)
  }

  test("idempotent DDL: CREATE TABLE IF NOT EXISTS re-runs keep data (ref D1)") {
    // the reference runs create_table as an upstream task EVERY dag run
    // (dags/jira/db_ops.py:22-27) — re-execution must be a no-op
    val ddl = """CREATE TABLE IF NOT EXISTS graft_d1 (id BIGINT, v STRING)
                 USING parquet"""
    try {
      spark.sql(ddl)
      spark.sql("INSERT INTO graft_d1 VALUES (1, 'a'), (2, 'b')")
      spark.sql(ddl) // the daily re-run
      assert(spark.table("graft_d1").count() === 2, "re-create must not wipe")
    } finally spark.sql("DROP TABLE IF EXISTS graft_d1")
  }

  test("partition column round-trips values (directory encoding)") {
    val dir = Files.createTempDirectory("graft_sink2").toString + "/orders_by_status"
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    TableSink.writePartitioned(orders, dir, Seq("o_orderstatus"))
    val back = TableSink.read(spark, dir)
    val a = back.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
