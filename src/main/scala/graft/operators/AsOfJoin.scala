package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same partition key.
  *
  * Spark-first formulation: instead of a per-row range probe (O(n·m) theta
  * join), union both sides tagged, sort within key by (ts, side-priority),
  * and carry the last non-null right value forward with
  * `last(_, ignoreNulls).over(unboundedPreceding..current)`. One shuffle on
  * the key, one sort — the same cost profile as a sort-merge join, so it
  * scales linearly with data volume and never materialises the cross
  * product. Right rows at exactly the left timestamp are included (ties
  * sort right-before-left).
  *
  * 100 TB posture: partition key must be the shuffle key; skewed keys can
  * be salted upstream. No state beyond the running window column.
  */
object AsOfJoin {
  /** @param df        union-ready frame containing both sides
    * @param isRight   predicate marking right-side rows
    * @param valueCol  column to carry forward from right rows
    * @param partition partition (equi) keys
    * @param ts        event-time column
    * @param tieBreak  deterministic final ordering column (e.g. unique id)
    */
  def lastValueAsOf(
      df: DataFrame,
      isRight: Column,
      valueCol: Column,
      partition: Seq[Column],
      ts: Column,
      tieBreak: Column): DataFrame = {
    val w = Window
      .partitionBy(partition: _*)
      // right side first at equal ts so "<=" semantics hold
      .orderBy(ts, when(isRight, lit(0)).otherwise(lit(1)), tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_graft_asof",
      last(when(isRight, valueCol), ignoreNulls = true).over(w))
  }
}
