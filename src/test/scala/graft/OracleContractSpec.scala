package graft

import org.apache.spark.sql.types._

/** Registry-wide enforcement of QueryDef's TYPE contract (the q157
  * lesson): the driver's hash gate is type-sensitive, so every
  * oracle-backed query's Spark output schema must stay inside the set of
  * types a DuckDB oracle can replay exactly — integer results BIGINT/INT
  * (never Byte/Short, which parquet round-trips as TINYINT/SMALLINT
  * against DuckDB's INTEGER-or-wider expressions), floats as DOUBLE
  * (DuckDB arithmetic never yields FLOAT), no nested types.
  *
  * What this CANNOT check in-sandbox is the DuckDB side (no duckdb JVM
  * binding); that half is tools/check.py's [FAIL-types] gate, which fails
  * on any oracle column whose type differs from the parquet dump (e.g.
  * a `sum()`-promoted HUGEINT missing its `CAST(x AS BIGINT)`). Together
  * they make the q157 class of bug impossible to reintroduce without a
  * red gate on one side or the other.
  */
class OracleContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Types a DuckDB oracle reproduces bit-exactly from ANSI SQL over the
    * same parquet tables. */
  private def replayable(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | DoubleType | BooleanType |
        DateType | TimestampType | TimestampNTZType => true
    // DecimalType is NOT replayable (r17 lesson, one level below the
    // q157 type class): the driver's hash discriminates on the
    // int128/decimal VALUE REPRESENTATION itself — q237/q244 went red
    // while multiset-equal to their oracles as the board's only
    // DECIMAL(38,0) outputs. Decimals may ACCUMULATE internally; the
    // output projection must land on BIGINT/DOUBLE.
    case _ => false
  }

  test("every oracle-backed query's output schema is oracle-replayable") {
    val defs = SparkEntry.allDefs.filter(_.oracle.isDefined)
    assert(defs.size >= 139, s"registry shrank? ${defs.size} oracle-backed")
    val bad = defs.flatMap { q =>
      val schema = q.fn(spark, dir).schema
      schema.fields.collect {
        case f if !replayable(f.dataType) =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"columns outside the oracle-replayable type set:\n${bad.mkString("\n")}")
  }
}
