package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Observability

/** In-flight quality counters: metrics ride the write action itself —
  * exact counts, no second scan of the data.
  */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("a"), 10L), (2L, None, -5L), (3L, Some("c"), 3L),
    (4L, None, 0L), (5L, Some("e"), 120L)
  ).map { case (id, t, v) => (id, t.orNull, v) }.toDF("id", "text", "v")

  test("counters ride a parquet write: rows, nulls, violations exact") {
    val (out, fetch) = Observability.withQualityCounters(rows,
      nullCols = Seq("text"),
      violations = Map(
        "negative_v" -> (col("v") < 0),
        "v_over_100" -> (col("v") > 100)))
    val dir = Files.createTempDirectory("graft_obs").toString + "/t"
    out.write.parquet(dir) // the ONLY action — metrics must come from it
    val m = fetch()
    assert(m === Map("rows" -> 5L, "null_text" -> 2L,
      "violation_negative_v" -> 1L, "violation_v_over_100" -> 1L))
    // and the instrumented frame wrote its rows untouched
    assert(spark.read.parquet(dir).count() === 5)
  }

  test("observe is a pass-through: plan rows and values unchanged") {
    val (out, _) = Observability.withQualityCounters(rows, Seq("text"))
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === (1L to 5L))
  }

  test("empty frame: counters are zero, not absent") {
    val (out, fetch) = Observability.withQualityCounters(rows.limit(0),
      nullCols = Seq("text"), violations = Map("neg" -> (col("v") < 0)))
    assert(out.count() === 0)
    val m = fetch()
    assert(m("rows") === 0L && m("null_text") === 0L &&
      m("violation_neg") === 0L)
  }

  test("q258 dq audit: every check fires on a constructed dirty corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dq").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, "cust1", 1, 0.0, "BUILDING"), (2L, "cust2", 1, 0.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$tmp/customer.parquet")
    // orders: dup pk (10 twice), orphan custkey (99), bad status (X)
    Seq((10L, 1L, "O", 5.0, t0, "1-URGENT"),
        (10L, 1L, "O", 5.0, t0, "1-URGENT"),
        (11L, 99L, "F", 5.0, t0, "2-HIGH"),
        (12L, 2L, "X", 5.0, t0, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$tmp/orders.parquet")
    // lineitem: one quantity out of range
    Seq((10L, 1L, 1L, 1, 51.0, 1.0, 0.0, 0.0, "N", "O", t0),
        (10L, 1L, 1L, 2, 5.0, 1.0, 0.0, 0.0, "N", "O", t0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$tmp/lineitem.parquet")
    // events: one orphan user (77), one non-positive value
    Seq((1L, 1704067200L * 1000000000L, 1L, "click", 1.0, "{}"),
        (2L, 1704067260L * 1000000000L, 77L, "click", 1.0, "{}"),
        (3L, 1704067320L * 1000000000L, 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    // documents: one n_chars lie, one empty text
    Seq((1L, "hello world", "en", "web", 11L),
        (2L, "hello", "en", "web", 99L),
        (3L, "", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q258_dq_audit")(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("orders", "pk_unique")) === ((4L, 1L)))
    assert(got(("orders", "fk_custkey_customer")) === ((4L, 1L)))
    assert(got(("orders", "status_domain")) === ((4L, 1L)))
    assert(got(("events", "fk_user_customer")) === ((3L, 1L)))
    assert(got(("events", "value_positive")) === ((3L, 1L)))
    assert(got(("lineitem", "quantity_range")) === ((2L, 1L)))
    assert(got(("documents", "n_chars_consistent")) === ((3L, 1L)))
    assert(got(("documents", "text_nonempty")) === ((3L, 1L)))
  }
}
