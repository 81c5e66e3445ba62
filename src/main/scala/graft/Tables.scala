package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Scale posture: every loader is a plain parquet scan so Catalyst's
  * column pruning + predicate pushdown reach the reader (check
  * `PushedFilters`/`ReadSchema` in `.explain("formatted")`). On a real
  * cluster the same paths would be partitioned directories; nothing here
  * assumes a single file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet is driver-owned and has shipped `ts` under two physical
    * layouts across regenerations: TIMESTAMP(NANOS) (which Spark's reader
    * only surfaces as a long under the legacy conf) and TIMESTAMP(MICROS)
    * NTZ. Physical type is data, not a constant — read, then normalize on
    * the loaded schema ([[normalizeEventTs]]). The legacy conf is a no-op
    * on non-NANOS files.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Normalize `ts` to session-TZ TimestampType whatever layout the file
    * shipped, so batch and streaming ([[graft.streaming.EventStream]])
    * share ONE conversion and can never disagree:
    *  - already TimestampType: pass through;
    *  - TIMESTAMP_NTZ (µs testdata): cast — with the session TZ pinned to
    *    UTC (Verify/Bench/SparkSpec builders) this is a micros-identity,
    *    matching DuckDB's naive read of the same file;
    *  - LongType (old NANOS layout under nanosAsLong): floor ns→µs exactly
    *    as DuckDB narrows;
    *  - anything else: fail loudly rather than compute on a misread column.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        // A long here is trusted to be NANOS-as-long — but if the driver
        // ever ships plain INT64 µs (no logical type), dividing by 1000
        // would repeat the round-8 1000×-collapse silently. Epoch-ns for
        // any sane year is ~1e18 (µs is ~1e15, s is ~1e9): values outside
        // [1990, 2100) in ns fail per-row, loudly, in the codegen'd path.
        val loNs = 631152000000000000L  // 1990-01-01 in epoch-ns
        val hiNs = 4102444800000000000L // 2100-01-01 in epoch-ns
        df.withColumn("ts",
          when(col("ts").between(loNs, hiNs),
            timestamp_micros(expr("ts div 1000")))
          .otherwise(raise_error(concat(
            lit("events.ts long value outside plausible epoch-ns range "),
            lit("(is the file µs-as-plain-INT64? see TestdataSchemaGuardSpec): "),
            col("ts").cast("string"))).cast(TimestampType)))
      case other => throw new IllegalArgumentException(
        s"events.ts arrived as unsupported type $other; " +
          "expected TIMESTAMP, TIMESTAMP_NTZ, or NANOS-as-long")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
