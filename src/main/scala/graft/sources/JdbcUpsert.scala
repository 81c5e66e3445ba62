package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** In-place keyed SQL upsert — the reference sink's actual write behavior,
  * spoken in each target database's native dialect.
  *
  * The reference upserts one record at a time over a DB-API cursor with three
  * dialect-specific statements chosen by connection-id prefix:
  *   - Postgres `INSERT … ON CONFLICT (key) DO UPDATE SET col = EXCLUDED.col`
  *     (reference `dags/jira/db_ops.py:29-43`),
  *   - MySQL `INSERT … ON DUPLICATE KEY UPDATE col = VALUES(col)`
  *     (`db_ops.py:56-70`),
  *   - MSSQL `MERGE INTO … USING (SELECT …) AS source`
  *     (`db_ops.py:83-100`),
  *   - factory dispatch on the conn-id prefix (`db_ops.py:102-112`).
  *
  * This module generates the same statement shapes (JDBC `?` placeholders in
  * place of DB-API `%s`) and executes them BATCHED PER PARTITION: each input
  * partition opens one connection, prepares the dialect statement once, and
  * ships rows via `addBatch`/`executeBatch` — one network round trip per
  * `batchSize` rows instead of the reference's one per record. At 100 TB the
  * JDBC sink is never the analytic path (that is partitioned parquet,
  * [[TableSink]]); this is the serving-database handoff, and per-partition
  * batching is what keeps a 1000-executor write from serializing on the
  * driver.
  *
  * A fourth dialect, [[JdbcUpsert.Derby]], phrases the same MERGE in
  * standard SQL against the one-row `SYSIBM.SYSDUMMY1` so the in-place
  * semantics are executable in-sandbox (DerbyJdbcSinkSpec: second upsert
  * updates rows with NO table swap — the table is never dropped).
  *
  * Execution ceiling, stated plainly: Derby is the ONLY database whose jars
  * ship with Spark's distribution (`derby*.jar` — it backs the embedded
  * Hive metastore), so Derby's MERGE is the one dialect this environment
  * can EXECUTE end-to-end; Postgres/MySQL/MSSQL have no server and no
  * driver jar here (no H2 either, which would have executed the MySQL
  * `ON DUPLICATE KEY` shape in MySQL-compatibility mode), so those three
  * are pinned at the statement level — exact text + bind order against
  * `db_ops.py:29-100` — and their execution path (partition → prepare →
  * addBatch/executeBatch) is the same code Derby exercises. Running the
  * suite on a machine with a real server + driver jar needs no code
  * change: `forUrl`/`forConnId` already dispatch to the right dialect.
  *
  * Concurrency note (same contract as the reference, which applies records
  * sequentially from one process): keys should be unique within `df` —
  * duplicate keys landing in different partitions apply in nondeterministic
  * order. Merge first ([[graft.operators.Upsert]]) when updates may repeat.
  *
  * Identifier case: statements are UNQUOTED, like the reference's —
  * db_ops.py interpolates bare names — so the target table must use the
  * database's default-case identifiers (the reference's hand-written
  * `create_table` DDL does). A table created by Spark's JDBC writer has
  * QUOTED lower-case columns and will not resolve; create serving tables
  * with explicit DDL (IngestBench shows the pattern).
  */
object JdbcUpsert {

  sealed trait Dialect {
    def name: String

    /** The parameterized upsert statement for `table` with `columns`, keyed
      * by `uniqueColumn`. Placeholder order is given by [[bindColumns]].
      */
    def statement(table: String, columns: Seq[String], uniqueColumn: String): String

    /** Column names in the order their `?` placeholders appear in
      * [[statement]] (dialects that mention the row twice repeat them).
      */
    def bindColumns(columns: Seq[String], uniqueColumn: String): Seq[String]

    protected def nonKey(columns: Seq[String], uniqueColumn: String): Seq[String] =
      columns.filterNot(_ == uniqueColumn)
    protected def marks(n: Int): String = Seq.fill(n)("?").mkString(", ")
  }

  /** `db_ops.py:29-43` — PostgresOperations.upsert_records. */
  case object Postgres extends Dialect {
    val name = "postgres"
    def statement(table: String, columns: Seq[String], uniqueColumn: String): String = {
      val sets = nonKey(columns, uniqueColumn).map(c => s"$c = EXCLUDED.$c")
      val action =
        if (sets.isEmpty) "DO NOTHING"
        else s"DO UPDATE SET ${sets.mkString(", ")}"
      s"INSERT INTO $table (${columns.mkString(", ")}) " +
        s"VALUES (${marks(columns.length)}) " +
        s"ON CONFLICT ($uniqueColumn) $action"
    }
    def bindColumns(columns: Seq[String], uniqueColumn: String): Seq[String] = columns
  }

  /** `db_ops.py:56-70` — MySqlOperations.upsert_records. */
  case object MySql extends Dialect {
    val name = "mysql"
    def statement(table: String, columns: Seq[String], uniqueColumn: String): String = {
      // a key-only record still needs a SET list to parse; `k = k` is the
      // standard MySQL no-op form
      val sets = nonKey(columns, uniqueColumn) match {
        case Seq() => Seq(s"$uniqueColumn = $uniqueColumn")
        case cs    => cs.map(c => s"$c = VALUES($c)")
      }
      s"INSERT INTO $table (${columns.mkString(", ")}) " +
        s"VALUES (${marks(columns.length)}) " +
        s"ON DUPLICATE KEY UPDATE ${sets.mkString(", ")}"
    }
    def bindColumns(columns: Seq[String], uniqueColumn: String): Seq[String] = columns
  }

  /** `db_ops.py:83-100` — MsSqlOperations.upsert_records: the row is bound
    * twice, once into the `USING (SELECT …)` source and once into the
    * `INSERT` branch, exactly as the reference does.
    */
  case object MsSql extends Dialect {
    val name = "mssql"
    def statement(table: String, columns: Seq[String], uniqueColumn: String): String = {
      val cols = columns.mkString(", ")
      val matched = nonKey(columns, uniqueColumn)
        .map(c => s"target.$c = source.$c")
      val whenMatched =
        if (matched.isEmpty) ""
        else s"WHEN MATCHED THEN UPDATE SET ${matched.mkString(", ")} "
      s"MERGE INTO $table AS target " +
        s"USING (SELECT ${marks(columns.length)}) AS source ($cols) " +
        s"ON target.$uniqueColumn = source.$uniqueColumn " +
        whenMatched +
        s"WHEN NOT MATCHED THEN INSERT ($cols) VALUES (${marks(columns.length)});"
    }
    def bindColumns(columns: Seq[String], uniqueColumn: String): Seq[String] =
      columns ++ columns
  }

  /** Standard-SQL MERGE phrased for Apache Derby (and DB2): Derby's `USING`
    * clause takes a table, not a subquery, so the one-row system table
    * `SYSIBM.SYSDUMMY1` carries the probe and the row binds as parameters —
    * key into `ON`, non-keys into `UPDATE SET`, full row into `INSERT`.
    * Same observable semantics as [[MsSql]]; executable in-sandbox.
    */
  case object Derby extends Dialect {
    val name = "derby"
    def statement(table: String, columns: Seq[String], uniqueColumn: String): String = {
      val sets = nonKey(columns, uniqueColumn).map(c => s"$c = ?")
      val whenMatched =
        if (sets.isEmpty) ""
        else s"WHEN MATCHED THEN UPDATE SET ${sets.mkString(", ")} "
      s"MERGE INTO $table AS target " +
        s"USING SYSIBM.SYSDUMMY1 AS source " +
        s"ON target.$uniqueColumn = ? " +
        whenMatched +
        s"WHEN NOT MATCHED THEN INSERT (${columns.mkString(", ")}) " +
        s"VALUES (${marks(columns.length)})"
    }
    def bindColumns(columns: Seq[String], uniqueColumn: String): Seq[String] =
      uniqueColumn +: nonKey(columns, uniqueColumn) ++: columns
  }

  /** Conn-id prefix dispatch, mirroring the reference factory
    * (`db_ops.py:102-112`): `postgres*` / `mysql*` / `mssql*` (+ `derby*`
    * for the in-sandbox executable form).
    */
  def forConnId(connId: String): Dialect =
    if (connId.startsWith("postgres")) Postgres
    else if (connId.startsWith("mysql")) MySql
    else if (connId.startsWith("mssql")) MsSql
    else if (connId.startsWith("derby")) Derby
    else throw new IllegalArgumentException(
      s"Unsupported connection ID: $connId, your connection must start with " +
        "one of these: postgres, mssql, mysql or derby.")

  /** JDBC-URL scheme dispatch for callers holding a URL, not a conn id. */
  def forUrl(url: String): Dialect =
    if (url.startsWith("jdbc:postgresql")) Postgres
    else if (url.startsWith("jdbc:mysql")) MySql
    else if (url.startsWith("jdbc:sqlserver")) MsSql
    else if (url.startsWith("jdbc:derby")) Derby
    else throw new IllegalArgumentException(s"Unsupported JDBC URL: $url")

  private def sqlTypeOf(dt: DataType): Int = dt match {
    case LongType            => java.sql.Types.BIGINT
    case IntegerType         => java.sql.Types.INTEGER
    case ShortType           => java.sql.Types.SMALLINT
    case ByteType            => java.sql.Types.TINYINT
    case DoubleType          => java.sql.Types.DOUBLE
    case FloatType           => java.sql.Types.FLOAT
    case BooleanType         => java.sql.Types.BOOLEAN
    case DateType            => java.sql.Types.DATE
    case _: TimestampType    => java.sql.Types.TIMESTAMP
    case _: DecimalType      => java.sql.Types.DECIMAL
    case BinaryType          => java.sql.Types.BINARY
    case _                   => java.sql.Types.VARCHAR
  }

  /** Execute the dialect's upsert for every row of `df`, in place: the
    * target table is never dropped or truncated. One connection + prepared
    * statement per partition; rows travel in `executeBatch` groups of
    * `batchSize`, committed per group — the reference's commit-per-page
    * rhythm, and what keeps per-transaction lock counts bounded when many
    * partitions write the same table concurrently (embedded Derby
    * escalates to table locks past a few thousand row locks; Postgres/
    * MySQL fare better but short transactions are still the right shape).
    */
  def upsertInPlace(df: DataFrame, url: String, table: String,
      props: Properties, uniqueColumn: String,
      dialect: Dialect = null, batchSize: Int = 500): Unit = {
    val d = if (dialect != null) dialect else forUrl(url)
    val schema = df.schema
    val columns = schema.fieldNames.toSeq
    require(columns.contains(uniqueColumn),
      s"unique column $uniqueColumn not in ${columns.mkString(", ")}")
    val sql = d.statement(table, columns, uniqueColumn)
    // placeholder i binds field bindIdx(i) of the row
    val bindIdx = d.bindColumns(columns, uniqueColumn)
      .map(schema.fieldIndex).toArray
    val sqlTypes = schema.fields.map(f => sqlTypeOf(f.dataType))
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            var pending = 0
            rows.foreach { row =>
              var i = 0
              while (i < bindIdx.length) {
                val f = bindIdx(i)
                if (row.isNullAt(f)) ps.setNull(i + 1, sqlTypes(f))
                else ps.setObject(i + 1, row.get(f))
                i += 1
              }
              ps.addBatch()
              pending += 1
              if (pending >= batchSize) {
                ps.executeBatch(); conn.commit(); pending = 0
              }
            }
            if (pending > 0) { ps.executeBatch(); conn.commit() }
          } catch {
            case e: Throwable =>
              // roll back the open group so close() cannot mask `e` with
              // "transaction still active"
              try conn.rollback() catch { case _: java.sql.SQLException => }
              throw e
          } finally ps.close()
        } finally conn.close()
      }
    }
  }
}
