package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — the Hampel / 3-MAD rule (median ±
  * k · median-absolute-deviation; Leys et al., J. Exp. Soc. Psych. 2013 is
  * the standard modern reference): the quality-gate statistic curation
  * pipelines want where mean ± k·σ fails, because both the mean and σ are
  * themselves dragged by the very outliers being hunted (a handful of
  * 100 MB crawl blobs inflate a source's σ until nothing is an outlier),
  * while median and MAD have a 50% breakdown point.
  *
  * Semantics are integer-exact end-to-end for integer `valueCol`: the
  * group median is the LOWER median (the element at 0-indexed rank
  * (n−1) div 2 under (value, id) order — no interpolation, so the result
  * is a corpus value, not a float), MAD is the lower median of
  * |v − med_g|, and the flag is the integer comparison
  * |v − med_g| > k · MAD_g. No float appears anywhere, so any engine
  * replays it bit-identically.
  *
  * MAD = 0 degenerate case (> 50% of a group shares one value) keeps the
  * strict `>`: every row off the majority value is flagged — the rule's
  * standard behavior, and the honest one for a corpus where half a source
  * is one boilerplate length.
  *
  * Scale posture (r21): a median needs only the VALUE at rank
  * (n−1) div 2, never per-row ranks — so each pass aggregates the corpus
  * to a (group, value) CLASS HISTOGRAM first (map-side partial combine:
  * the shuffle carries the distinct-value grid, not rows — the
  * q178/q211/q230 class-histogram stance) and extracts the median from
  * the weighted cumulative. The cumulative itself keeps the
  * [[Packing.groupedTwoPhaseRank]] skew discipline ON THE GRID: global
  * quantile buckets on the value, per-(group, bucket) weighted offsets,
  * within-(group, bucket) running sums — a group whose grid is huge (all
  * values distinct) still spreads across all buckets instead of
  * serializing in a per-group window partition. The median/MAD extracts
  * are one-row-per-group filters; the joins back are group-cardinality-
  * sized (AQE broadcasts them from real stats). Output: (id, group,
  * value, med, mad, outlier) — one row per input row.
  */
object Robust {

  /** Per-group LOWER median value off a weighted class histogram
    * (`grp`, `v`, `c`): the value whose weighted cumulative count (in v
    * order) first covers 0-indexed rank (gn−1) div 2. Tie order within a
    * value is irrelevant — every row of the value is the value. Windows
    * ride the grid, bucketed as documented above.
    */
  private def groupedLowerMedian(hist: DataFrame,
      buckets: Int): DataFrame =
    Packing.groupedWeightedCumsum(hist, buckets)
      .filter(col("cum") - col("c") <= expr("(gn - 1) div 2") &&
        expr("(gn - 1) div 2") < col("cum"))
      .select(col("grp"), col("v").as("med"))

  def madOutliers(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, k: Int = 3, buckets: Int = 32): DataFrame = {
    require(k > 0, "need a positive MAD multiplier")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
    if (base.head(1).isEmpty)
      return base.select(col("id"), col("grp"), col("v"),
        lit(0L).as("med"), lit(0L).as("mad"), lit(false).as("outlier"))
        .limit(0)
    val meds = groupedLowerMedian(
      base.groupBy("grp", "v").agg(count(lit(1)).as("c")), buckets)
    val dev = base.join(meds, "grp")
      .withColumn("dev", abs(col("v") - col("med")))
    val mads = groupedLowerMedian(
      dev.groupBy(col("grp"), col("dev").as("v"))
        .agg(count(lit(1)).as("c")), buckets)
      .withColumnRenamed("med", "mad")
    dev.join(mads, "grp")
      .select(col("id"), col("grp"), col("v"), col("med"), col("mad"),
        (col("dev") > col("mad") * k).as("outlier"))
  }

  /** Per-group TRIMMED sum — the third standard robust location next to
    * the median (q159's machinery) and the MAD gate: drop the lowest and
    * highest ⌊gn·trimNum/trimDen⌋ values ((value, id)-ordered, so ties
    * cut deterministically) and ship the integer (n_total, n_kept,
    * sum_kept) triple; the trimmed mean is one consumer division. Where
    * the mean is dragged by any single blob and the median ignores
    * everything but one row, the trimmed mean uses all central mass —
    * the usual reporting statistic for skewed length/latency columns.
    * Ranking is [[Packing.groupedTwoPhaseRank]] (no per-group corpus
    * window); the trim filter is rank arithmetic, map-side after it.
    *
    * Output: (`groupCol`, n_total, n_kept, sum_kept), one row per group
    * (a group small enough that 2k ≥ gn keeps nothing and still
    * reports, n_kept = 0 with a NULL sum — callers coalesce).
    *
    * `valueCol` must be INTEGRAL (the w1FromCounts contract): it is
    * cast to long, so a double score would silently truncate BEFORE
    * ranking and summing. Scale fractional inputs to integer ticks
    * upstream (cents, not dollars) — the family-wide
    * integer-numerator/denominator stance.
    */
  def trimmedSumPerGroup(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, trimNum: Long, trimDen: Long,
      buckets: Int = 32): DataFrame = {
    require(trimDen > 0 && trimNum >= 0 && 2 * trimNum < trimDen,
      "trim fraction num/den must leave a nonempty middle: 2*num < den")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
    Packing.groupedTwoPhaseRank(base, "grp", "v", buckets)
      // integer div, never Column./ (double) — exact at any group size
      .withColumn("k", expr(s"(gn * ${trimNum}L) div ${trimDen}L"))
      .groupBy("grp")
      .agg(max("gn").as("n_total"),
        sum(when(col("gpos") >= col("k") &&
          col("gpos") < col("gn") - col("k"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("gpos") >= col("k") &&
          col("gpos") < col("gn") - col("k"), col("v"))).as("sum_kept"))
      .select(col("grp").as(groupCol), col("n_total"), col("n_kept"),
        col("sum_kept"))
  }
}
