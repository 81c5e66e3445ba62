package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventStream

/** Guard against silent driver-side regeneration of ANY testdata table.
  *
  * The repo does not own /root/testdata — the driver regenerates it between
  * rounds, and physical types are DATA, not constants: `events.ts` has
  * already shipped as TIMESTAMP(NANOS) and as TIMESTAMP(MICROS)-NTZ across
  * regenerations. Round 8 proved the cost of assuming a layout: 18 queries
  * failed or silently collapsed timestamps 1000×. The events loader is now
  * schema-adaptive, but the other driver-owned tables were equally
  * regenerable and unguarded — this spec pins the LOADED schema and sane
  * value ranges for every table in TESTDATA.md, so the next drift trips a
  * named spec instead of the bench.
  *
  * A red test here means the driver changed the files: adapt the loader
  * (like `Tables.normalizeEventTs`) and re-pin deliberately.
  */
class TestdataSchemaGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assertSchema(df: DataFrame, expected: Seq[(String, DataType)]): Unit = {
    val actual = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(actual === expected,
      s"\nloaded schema drifted —\n  actual:   $actual\n  expected: $expected")
  }

  private def assertUniqueKey(df: DataFrame, key: String): Unit = {
    val r = df.agg(count(lit(1)).as("n"), count_distinct(col(key)).as("d"),
      count(col(key)).as("nn")).head()
    assert(r.getLong(0) > 0L, s"$key: table is empty")
    assert(r.getLong(0) === r.getLong(1), s"$key not unique")
    assert(r.getLong(0) === r.getLong(2), s"$key has NULLs")
  }

  // naive µs timestamps load as TIMESTAMP_NTZ under Spark's default
  // inferTimestampNTZ; with the session TZ pinned UTC everywhere this
  // matches DuckDB's naive read bit-for-bit
  private val eventTime = TimestampNTZType

  test("region: schema + key range") {
    val t = Tables.region(spark, dir)
    assertSchema(t, Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertUniqueKey(t, "r_regionkey")
    val r = t.agg(min("r_regionkey"), max("r_regionkey"), count(lit(1))).head()
    assert(r.getInt(0) === 0 && r.getInt(1) === 4 && r.getLong(2) === 5L)
  }

  test("nation: schema + FK closure into region") {
    val t = Tables.nation(spark, dir)
    assertSchema(t, Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertUniqueKey(t, "n_nationkey")
    assert(t.count() === 25L)
    val orphans = t.join(Tables.region(spark, dir),
      t("n_regionkey") === col("r_regionkey"), "left_anti").count()
    assert(orphans === 0L, "nation rows reference unknown regions")
  }

  test("customer: schema + key") {
    val t = Tables.customer(spark, dir)
    assertSchema(t, Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertUniqueKey(t, "c_custkey")
  }

  test("supplier: schema + key") {
    val t = Tables.supplier(spark, dir)
    assertSchema(t, Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertUniqueKey(t, "s_suppkey")
  }

  test("part: schema + key + positive size") {
    val t = Tables.part(spark, dir)
    assertSchema(t, Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assertUniqueKey(t, "p_partkey")
    assert(t.filter(col("p_size") <= 0).isEmpty)
  }

  test("orders: schema + key + sane order-date years") {
    val t = Tables.orders(spark, dir)
    assertSchema(t, Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> eventTime, "o_orderpriority" -> StringType))
    assertUniqueKey(t, "o_orderkey")
    val r = t.agg(min(year(col("o_orderdate"))), max(year(col("o_orderdate")))).head()
    assert(r.getInt(0) > 1990 && r.getInt(1) < 2100,
      s"o_orderdate years ${r.getInt(0)}..${r.getInt(1)} — timestamp misread")
  }

  test("lineitem: schema + positive quantity + sane ship-date years") {
    val t = Tables.lineitem(spark, dir)
    assertSchema(t, Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> eventTime))
    val r = t.agg(min("l_quantity"), min(year(col("l_shipdate"))),
      max(year(col("l_shipdate"))), count(lit(1))).head()
    assert(r.getLong(3) > 0L)
    assert(r.getDouble(0) > 0d, "non-positive l_quantity")
    assert(r.getInt(1) > 1990 && r.getInt(2) < 2100,
      "l_shipdate years out of range — timestamp misread")
  }

  test("documents: schema + key + n_chars consistent with text") {
    val t = Tables.documents(spark, dir)
    assertSchema(t, Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType))
    assertUniqueKey(t, "doc_id")
    // the quality/tokenize family computes on `text` but filters on
    // `n_chars` — they must agree or those gates silently shift
    assert(t.filter(col("n_chars") =!= length(col("text"))).isEmpty,
      "n_chars no longer equals length(text)")
    assert(t.filter(col("text").isNull).isEmpty)
  }

  test("embeddings: schema + key + constant positive dimension") {
    val t = Tables.embeddings(spark, dir)
    assertSchema(t, Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
    assertUniqueKey(t, "vec_id")
    // every ANN path (IVF bucketing, PQ subvector split) assumes one fixed
    // dimension; PQ additionally splits into m=8 subvectors
    val dims = t.select(size(col("embedding")).as("d")).distinct().collect()
    assert(dims.length === 1, s"embedding dimension not constant: ${dims.toSeq}")
    val d = dims.head.getInt(0)
    assert(d > 0 && d % 8 === 0, s"dimension $d not a positive multiple of 8")
  }

  // ------------------------------------------------------------------
  // events — the table that has actually drifted (twice); the original
  // EventsSchemaGuardSpec pins, plus the per-row ns-range probe
  // ------------------------------------------------------------------

  test("events: batch loader normalizes ts to TimestampType with sane values") {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType === TimestampType)
    assertSchema(e.drop("ts"), Seq("event_id" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
    val r = e.agg(
      min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1"),
      count(lit(1)).as("n")).head()
    assert(r.getAs[Long]("n") > 0L)
    assert(r.getAs[Int]("y0") > 1990, "min year ≤ 1990 — ts misconverted")
    assert(r.getAs[Int]("y1") < 2100, "max year ≥ 2100 — ts misconverted")
  }

  test("events: streaming loader agrees with batch on schema and content") {
    val s = EventStream.readEvents(spark, dir)
    assert(s.schema("ts").dataType === TimestampType)
    val streamed = EventStream.runToTable(spark,
      s.select(col("event_id"), col("ts")), "append")
    val batch = Tables.events(spark, dir).select(col("event_id"), col("ts"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("events: normalizeEventTs handles every shipped layout, rejects others") {
    import spark.implicits._
    // µs since epoch for 2020-01-02T03:04:05 UTC
    val us = 1577934245000000L
    val asLong = Seq((1L, us * 1000)).toDF("event_id", "ts") // ns layout
    val n = Tables.normalizeEventTs(asLong)
    assert(n.schema("ts").dataType === TimestampType)
    assert(n.select(unix_micros(col("ts"))).head().getLong(0) === us)
    val asNtz = Seq((1L, us)).toDF("event_id", "ts")
      .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
    val m = Tables.normalizeEventTs(asNtz)
    assert(m.schema("ts").dataType === TimestampType)
    assert(m.select(unix_micros(col("ts"))).head().getLong(0) === us)
    val bad = Seq((1L, "oops")).toDF("event_id", "ts")
    intercept[IllegalArgumentException](Tables.normalizeEventTs(bad))
  }

  test("events: a µs-magnitude long fails loudly instead of collapsing 1000×") {
    import spark.implicits._
    // plain-INT64-µs is the drift normalizeEventTs CANNOT distinguish from
    // ns by type alone — the value-range probe catches it per row
    val us = 1577934245000000L
    val asPlainMicros = Seq((1L, us)).toDF("event_id", "ts")
    val ex = intercept[Exception] {
      Tables.normalizeEventTs(asPlainMicros).select(col("ts")).head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("epoch-ns range")),
      s"expected the range-probe error, got: $ex")
  }
}
