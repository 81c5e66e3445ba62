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
  *
  * TYPE contract (the q157 lesson — two rounds of red from one promoted
  * column): the driver's hash is TYPE-sensitive, and DuckDB silently
  * promotes integer arithmetic — `sum()` over BIGINT yields HUGEINT
  * (INT128), and `//`, `*`, `+` propagate it through CTE chains — while
  * Spark writes BIGINT. So:
  *   - integer result columns are BIGINT on BOTH sides, always: the Spark
  *     plan emits LongType, and any oracle column that passed through a
  *     `sum()`-bearing derivation ends with an explicit
  *     `CAST(x AS BIGINT)` in the FINAL projection (see q157/q166);
  *   - output schemas stay inside the oracle-replayable set — no Float
  *     (DuckDB reads parquet FLOAT but oracle arithmetic yields DOUBLE),
  *     no Byte/Short (DuckDB types them TINYINT/SMALLINT, oracle integer
  *     expressions don't), no nested types on oracle-backed queries.
  * OracleContractSpec enforces the schema half on every registered query;
  * tools/check.py FAILS (not warns) on any residual type gap.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
