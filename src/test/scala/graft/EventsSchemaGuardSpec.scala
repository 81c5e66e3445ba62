package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventStream

/** Guard against silent driver-side regeneration of the events testdata.
  *
  * The repo does not own /root/testdata — the driver regenerates it between
  * rounds, and it has already shipped `ts` under two different physical
  * layouts (TIMESTAMP(NANOS), then TIMESTAMP(MICROS) NTZ). Round 8 proved
  * the failure modes of assuming a layout: every batch events query threw,
  * and the streaming path read µs int64 raw and divided by 1000 again,
  * collapsing all timestamps 1000× into 1970 — plausible-looking but wrong
  * results. This spec pins the contract both loaders must keep against the
  * REAL files:
  *  (a) `ts` normalizes to session-TZ TimestampType,
  *  (b) the values land in a sane year (the 1000×-collapse lands in 1970),
  *  (c) batch and streaming agree row-for-row on the same file.
  */
class EventsSchemaGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("batch loader normalizes ts to TimestampType with sane values") {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType === TimestampType)
    val r = e.agg(
      min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1"),
      count(lit(1)).as("n")).head()
    assert(r.getAs[Long]("n") > 0L)
    assert(r.getAs[Int]("y0") > 1990, "min year ≤ 1990 — ts misconverted")
    assert(r.getAs[Int]("y1") < 2100, "max year ≥ 2100 — ts misconverted")
  }

  test("streaming loader agrees with batch on schema and content") {
    val s = EventStream.readEvents(spark, dir)
    assert(s.schema("ts").dataType === TimestampType)
    val streamed = EventStream.runToTable(spark,
      s.select(col("event_id"), col("ts")), "append")
    val batch = Tables.events(spark, dir).select(col("event_id"), col("ts"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("normalizeEventTs handles every shipped layout and rejects others") {
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
}
