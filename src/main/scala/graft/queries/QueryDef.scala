package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Queries without an oracle get the driver's weaker rows-only check
  * (approximate / hash-seeded ops).
  *
  * Determinism contract (SURVEY.md §5): every query ends in a total-order
  * `orderBy` with tie-break keys, float aggregates are rounded, and column
  * names/types match the oracle exactly (driver sorts columns by name before
  * hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
