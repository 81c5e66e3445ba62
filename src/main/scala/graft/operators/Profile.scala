package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-scan dataset profile card — the per-snapshot statistics block a
  * data pipeline publishes with every corpus release (and diffs between
  * releases to catch silent drift): row count, per-dimension distinct and
  * null counts, per-measure min/max/sum/nulls. The whole card is ONE
  * full-scan hash-less aggregation — every statistic rides the same pass,
  * map-side partials combine per statistic, and the result is a single
  * row the `stack` unpivots driver-side-free into tidy (metric, value)
  * form. Adding a column to the card never adds a scan.
  *
  * Determinism contract: dimensions get exact distinct/null counts;
  * measures must be INTEGRAL columns (sums of longs are exact and
  * engine-portable — a double-sum's accumulation order is not, which is
  * why this card refuses to publish float sums; use min/max-only for
  * float columns via a dims entry if needed). All values are reported as
  * doubles for a uniform card schema; every one is an exactly-representable
  * integer.
  */
object Profile {

  /** Profile `df`: `dims` are categorical columns (distinct + null
    * counts), `measures` integral numeric columns (min/max/sum + null
    * counts). Output: (metric, value) rows, ordered by metric — a fixed,
    * diffable card. On empty input the card still has every row: counts 0,
    * min/max/sum NULL.
    */
  def card(df: DataFrame, dims: Seq[String], measures: Seq[String]): DataFrame = {
    require(dims.nonEmpty || measures.nonEmpty, "need at least one column")
    val named: Seq[(String, org.apache.spark.sql.Column)] =
      Seq("n_rows" -> count(lit(1)).cast("double")) ++
        dims.flatMap(c => Seq(
          s"${c}_distinct" -> countDistinct(col(c)).cast("double"),
          s"${c}_nulls" ->
            sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double"))) ++
        measures.flatMap(c => Seq(
          s"${c}_min" -> min(col(c)).cast("double"),
          s"${c}_max" -> max(col(c)).cast("double"),
          s"${c}_sum" -> sum(col(c)).cast("double"),
          s"${c}_nulls" ->
            sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double")))
    val names = named.map(_._1)
    val aggs = named.map { case (n, c) => c.as(n) }
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.selectExpr(
      s"stack(${names.size}, " +
        names.map(n => s"'$n', `$n`").mkString(", ") + ") as (metric, value)")
      .orderBy("metric")
  }
}
