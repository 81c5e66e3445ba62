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
  * Scale posture: both ranking passes are [[Packing.groupedTwoPhaseRank]]
  * — global quantile buckets + per-(group, bucket) offsets — so a skewed
  * group (one source = half the corpus) spreads across all buckets
  * instead of serializing in a per-group window partition. The median/MAD
  * extracts are one-row-per-group filters; the joins back are
  * group-cardinality-sized (AQE broadcasts them from real stats). Output:
  * (id, group, value, med, mad, outlier) — one row per input row.
  */
object Robust {

  def madOutliers(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, k: Int = 3, buckets: Int = 32): DataFrame = {
    require(k > 0, "need a positive MAD multiplier")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
    if (base.head(1).isEmpty)
      return base.select(col("id"), col("grp"), col("v"),
        lit(0L).as("med"), lit(0L).as("mad"), lit(false).as("outlier"))
        .limit(0)
    val meds = Packing.groupedTwoPhaseRank(base, "grp", "v", buckets)
      .filter(col("gpos") === expr("(gn - 1) div 2"))
      .select(col("grp"), col("v").as("med"))
    val dev = base.join(meds, "grp")
      .withColumn("dev", abs(col("v") - col("med")))
    val mads = Packing.groupedTwoPhaseRank(
        dev.select(col("id"), col("grp"), col("dev")), "grp", "dev", buckets)
      .filter(col("gpos") === expr("(gn - 1) div 2"))
      .select(col("grp"), col("dev").as("mad"))
    dev.join(mads, "grp")
      .select(col("id"), col("grp"), col("v"), col("med"), col("mad"),
        (col("dev") > col("mad") * k).as("outlier"))
  }
}
