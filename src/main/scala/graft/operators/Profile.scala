package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Watermark-lateness profile: for each event, its lateness = (max
    * EVENT time among strictly earlier ARRIVALS) − its own event time,
    * banded into the table that answers "what watermark delay would
    * have dropped how many events" — the number a streaming deploy
    * must know before choosing `withWatermark`.
    *
    * The running max over arrival order is a TWO-PHASE distributed
    * prefix max, never a global single-partition window (the q101
    * packing stance): arrivals range-bucket by observed quantiles
    * (monotone, one eager approxQuantile job — bucket choice cannot
    * change the answer, only the parallelism), per-bucket maxima roll
    * into a buckets-sized prefix window, and the within-bucket running
    * max runs partition-parallel. The global first arrival has no
    * predecessor and counts as in-order.
    *
    * Output: (band, n_events, max_lateness_us), bands at 0 / 10 s /
    * 30 s / 60 s / 2 min / beyond.
    */
  def latenessBands(df: DataFrame, arrivalCol: String, tsUsCol: String,
      idCol: String, buckets: Int = 32): DataFrame = {
    val base = df.select(col(arrivalCol).cast("long").as("arr"),
      col(tsUsCol).cast("long").as("us"),
      col(idCol).cast("long").as("id"))
    val cuts =
      if (buckets > 1) base.stat.approxQuantile("arr",
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      else Array.empty[Double]
    val b = cuts.foldLeft(lit(0))((acc, c) =>
      acc + when(col("arr") > c, 1).otherwise(0))
    val bucketed = base.withColumn("b", b)
    // buckets-sized frame: the unpartitioned window is bounded by
    // construction (≤ `buckets` rows)
    val bmax = bucketed.groupBy("b").agg(max("us").as("bm"))
      .withColumn("pm", max("bm").over(Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select("b", "pm")
    val w = Window.partitionBy("b").orderBy("arr", "id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = bucketed.join(broadcast(bmax), "b")
      .withColumn("rm", greatest(
        coalesce(max("us").over(w), lit(Long.MinValue)),
        coalesce(col("pm"), lit(Long.MinValue))))
      .withColumn("lateness", when(col("rm") === Long.MinValue, 0L)
        .otherwise(greatest(lit(0L), col("rm") - col("us"))))
    late
      .withColumn("band",
        when(col("lateness") === 0L, "0_in_order")
          .when(col("lateness") <= 10000000L, "1_le_10s")
          .when(col("lateness") <= 30000000L, "2_le_30s")
          .when(col("lateness") <= 60000000L, "3_le_60s")
          .when(col("lateness") <= 120000000L, "4_le_2m")
          .otherwise("5_gt_2m"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_events"),
        max("lateness").as("max_lateness_us"))
      .orderBy("band")
  }
}
