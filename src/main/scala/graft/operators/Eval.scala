package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eval-metric operators over label/score frames — the measurement
  * primitives behind the q178/q184 report queries, exposed as library
  * operators so any score column can be graded. Shared stance with
  * [[Drift]]: every statistic is integer numerator/denominator (the
  * consumer divides) and is computed on a histogram/vocabulary grid,
  * never via a corpus-sized global window.
  */
object Eval {

  /** Mann–Whitney AUC of boolean `posCol` against orderable `valueCol`,
    * histogram-formulated: AUC depends only on per-distinct-value class
    * counts, so 2U = Σ_v np_v·(2·nn_below(v) + nn_v) — each positive
    * beats all negatives strictly below and half-credits ties — and the
    * only window rides the distinct-value grid (the corpus contributes
    * one map-side-combined count shuffle). The textbook
    * `rank() OVER (ORDER BY value)` formulation puts the corpus in one
    * task; this never does.
    *
    * Output: ONE row (auc_num2, n_pos, n_neg); AUC =
    * auc_num2/(2·n_pos·n_neg). Empty input → nulls in the sums (callers
    * on possibly-empty frames coalesce). NULL values are EXCLUDED — an
    * unscored row has no rank position in either ECDF (and SQL engines
    * disagree on where NULL sorts, so keeping it would tie the result to
    * one engine's NULLS FIRST/LAST default). NULL labels count as
    * negative (coalesced to false — `!NULL` is NULL, so without the
    * coalesce a NULL-labeled row would vanish from BOTH classes).
    */
  def aucHistogram(df: DataFrame, posCol: String,
      valueCol: String): DataFrame = {
    val h = classHistogram(df, posCol, valueCol)
    // exclusive below-v negative count, bucketed over the score grid
    // (r22): the old Window.orderBy("v") put the whole distinct-score
    // grid in one task — a cliff for near-unique scores; the bucketed
    // cumulative is the same exact sum, partition-parallel
    Packing.gridCumsums(h, Seq("nn"), 32)
      .withColumn("nnb", col("cum_nn") - col("nn"))
      .agg(sum(col("np") * (lit(2L) * col("nnb") + col("nn")))
          .as("auc_num2"),
        sum("np").as("n_pos"), sum("nn").as("n_neg"))
  }

  // the shared per-distinct-value class-count table behind aucHistogram
  // and confusionByThreshold: one map-side-combined count shuffle, NULL
  // values excluded / NULL labels negative (the aucHistogram contract)
  private def classHistogram(df: DataFrame, posCol: String,
      valueCol: String): DataFrame =
    df.select(coalesce(col(posCol), lit(false)).as("pos"),
        col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))

  /** The full (threshold, TP, FP, FN, TN) operating-point table for the
    * rule "predict positive when `valueCol` ≥ t", one row per DISTINCT
    * observed value — the eval-harness read that turns [[aucHistogram]]'s
    * single ranking number into a threshold CHOICE (precision = tp/(tp+fp),
    * recall = tp/(tp+fn), and any Fβ are consumer divisions; every cell
    * is integer-exact). Same machinery as AUC: the corpus collapses to
    * the per-distinct-value class histogram first, the cumulative
    * windows ride that GRID (distinct scores, Heap's-law bounded for
    * discrete signals), never corpus rows — the textbook per-row
    * `rank()` sweep is exactly the corpus-sized window this family bans.
    * Thresholds at every distinct value are EXHAUSTIVE for this decision
    * family: between two observed values the confusion matrix cannot
    * change. NULL contract as [[aucHistogram]].
    *
    * Output: (threshold, tp, fp, fn, tn); tp + fn = n_pos and
    * fp + tn = n_neg on every row.
    */
  def confusionByThreshold(df: DataFrame, posCol: String,
      valueCol: String): DataFrame = {
    val h = classHistogram(df, posCol, valueCol)
    // exclusive cumulatives AND class totals in one bucketed pass over
    // the grid (r22): gridCumsums keeps the single-histogram-frame
    // property (no second corpus scan — its totals ride the same ≤32-row
    // offsets frame), and the old whole-grid single-task windows become
    // partition-parallel bucket sums
    Packing.gridCumsums(h, Seq("np", "nn"), 32)
      .select(col("v").as("threshold"),
        (col("tot_np") - (col("cum_np") - col("np"))).as("tp"),
        (col("tot_nn") - (col("cum_nn") - col("nn"))).as("fp"),
        (col("cum_np") - col("np")).as("fn"),
        (col("cum_nn") - col("nn")).as("tn"))
  }

  /** Per-GROUP Mann–Whitney AUC — [[aucHistogram]] stratified by
    * `groupCol`: one (group, auc_num2, n_pos, n_neg) row per group, AUC_g
    * = auc_num2/(2·n_pos·n_neg) at the consumer. The per-slice ranking
    * read a corpus-global AUC averages away (a score that ranks well
    * globally can rank WORSE than chance inside one source — Simpson's
    * reversal); together with [[confusionByThresholdPerGroup]] it
    * completes the grouped eval pair (ranking number + operating points).
    * Scale shape unchanged from the global form: the corpus collapses to
    * the per-(group, value) class histogram in one map-side-combined
    * count shuffle, and the cumulative window rides the per-group value
    * grid — PARTITIONED here, so no single-task grid pass at all. A
    * single-class group degenerates honestly: n_pos or n_neg = 0 and
    * auc_num2 = 0 (the consumer's division flags it, not a fake 0.5).
    * NULL contract as [[aucHistogram]].
    */
  def aucHistogramPerGroup(df: DataFrame, groupCol: String,
      posCol: String, valueCol: String): DataFrame = {
    val h = df.select(col(groupCol).as("g"),
        coalesce(col(posCol), lit(false)).as("pos"),
        col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
    val wv = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("nnb", coalesce(sum("nn").over(wv), lit(0L)))
      .groupBy(col("g").as(groupCol))
      .agg(sum(col("np") * (lit(2L) * col("nnb") + col("nn")))
          .as("auc_num2"),
        sum("np").as("n_pos"), sum("nn").as("n_neg"))
  }

  /** Per-GROUP operating-point table — [[confusionByThreshold]] with
    * every window partitioned by `groupCol`: the "is the quality filter
    * calibrated on code as well as prose" read, one exact integer
    * (group, threshold, TP, FP, FN, TN) row per distinct value OBSERVED
    * IN THAT GROUP (a group's confusion matrix can only change at its
    * own observed values, so each group's grid is exhaustive for it).
    * Scale shape unchanged: one (group, value) class-histogram count
    * shuffle, cumulative windows ride the per-group grid — partitioned
    * now, so not even the q209 bounded-single-partition stance is
    * needed. NULL contract as [[aucHistogram]].
    *
    * Output: (`group`, threshold, tp, fp, fn, tn); per group,
    * tp + fn = n_pos(g) and fp + tn = n_neg(g) on every row.
    */
  def confusionByThresholdPerGroup(df: DataFrame, groupCol: String,
      posCol: String, valueCol: String): DataFrame = {
    val h = df.select(col(groupCol).as("g"),
        coalesce(col(posCol), lit(false)).as("pos"),
        col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
    val wv = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wall = Window.partitionBy("g")
    h.withColumn("npb", coalesce(sum("np").over(wv), lit(0L)))
      .withColumn("nnb", coalesce(sum("nn").over(wv), lit(0L)))
      .withColumn("n_pos", sum("np").over(wall))
      .withColumn("n_neg", sum("nn").over(wall))
      .select(col("g").as(groupCol), col("v").as("threshold"),
        (col("n_pos") - col("npb")).as("tp"),
        (col("n_neg") - col("nnb")).as("fp"),
        col("npb").as("fn"), col("nnb").as("tn"))
  }

  /** Per-group SPEARMAN rank-correlation numerator between two orderable
    * columns — the monotone-association read ("does length predict
    * diversity?") that Pearson misses on nonlinear-but-monotone
    * relations and that outliers can't drag (ranks have a bounded
    * reach). Ships integer: n and d2_sum = Σ(rank_x − rank_y)², with
    * ρ = 1 − 6·d2_sum/(n(n²−1)) at the consumer. Ranks are 0-based
    * (`idCol`-tie-broken — deterministic and engine-replayable where the
    * textbook average-rank tie treatment is not integer; documented
    * deviation, equal to textbook Spearman whenever values are
    * distinct). Both ranking passes are [[Packing.groupedTwoPhaseRank]]
    * — no per-group corpus window, skewed groups spread over all
    * quantile buckets.
    *
    * Output: (`group`, n, d2_sum), one row per group.
    *
    * `xCol`/`yCol` must be INTEGRAL (the w1FromCounts contract): both
    * are cast to long, so a double score would silently truncate before
    * ranking — a rank over truncated values is NOT the rank over the
    * values. Scale fractional scores to integer ticks upstream; the
    * cast exists so the rank machinery and the shipped columns stay in
    * the family's integer-exact stance.
    */
  def spearmanPerGroup(df: DataFrame, idCol: String, groupCol: String,
      xCol: String, yCol: String, buckets: Int = 32): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val rx = Packing.groupedTwoPhaseRank(
        base.select(col("id"), col("grp"), col("x")), "grp", "x", buckets)
      .select(col("id"), col("grp"), col("gpos").as("r1"))
    val ry = Packing.groupedTwoPhaseRank(
        base.select(col("id"), col("grp"), col("y")), "grp", "y", buckets)
      .select(col("id"), col("grp"), col("gpos").as("r2"))
    // pair the axes on (grp, id) — id alone would cross-match groups
    // whenever ids are only unique WITHIN a group (r20 fix, found by
    // SpearmanAvgRankSpec; doc_id callers are unaffected)
    rx.join(ry, Seq("grp", "id"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum((col("r1") - col("r2")) * (col("r1") - col("r2")))
          .as("d2_sum"))
      .select(col("grp").as(groupCol), col("n"), col("d2_sum"))
  }

  /** Per-group Spearman ρ with the TEXTBOOK average-rank tie treatment,
    * exact as integers (the r19 directive — [[spearmanPerGroup]]'s
    * documented deviation removed): ranks ship 2×-SCALED so the .5s of
    * average ranks clear — `d2x4_sum` = Σ(2rₓ − 2r_y)² = 4·Σd² — plus
    * the per-axis tie terms T = Σ(c³ − c) over value tie-runs, so the
    * consumer computes the tie-corrected ρ exactly (Kendall, Rank
    * Correlation Methods 1948): with 12·Sx = n³ − n − tie_x and
    * 12·Sy = n³ − n − tie_y, ρ = (Sx + Sy − d2x4_sum/4) / (2·√(Sx·Sy))
    * — one sqrt at the consumer, every shipped column int64. Tie-free
    * axes reduce it to 1 − 6Σd²/(n(n²−1)) and to [[spearmanPerGroup]].
    *
    * Average ranks WITHOUT a per-group corpus window: both ranking
    * passes are [[Packing.groupedTwoPhaseRank]] (0-based (value, id)
    * sort position; skewed groups spread over all quantile buckets, and
    * equal values never split across buckets so each tie-run is a
    * contiguous gpos range); then per (group, value),
    * 2·(1-based average rank) = min(gpos) + max(gpos) + 2 — one
    * combinable value-grain aggregate joined back to the rows on
    * (group, value), never a window over the group.
    *
    * int64-exactness bound: d2x4_sum ≤ 4n³ per group ⇒ exact while
    * n ≲ 1.3×10⁶ per group. Bigger groups take the q286 stance: a
    * bounded eval slice per group (rank association is a sample
    * statistic; its precision saturates far below 10⁶).
    *
    * Output: (`group`, n, d2x4_sum, tie_x, tie_y).
    *
    * `xCol`/`yCol` must be INTEGRAL (the [[spearmanPerGroup]] contract):
    * both cast to long — scale fractional scores to ticks upstream.
    */
  def spearmanAvgRankPerGroup(df: DataFrame, idCol: String,
      groupCol: String, xCol: String, yCol: String,
      buckets: Int = 32): DataFrame = {
    // CUT: ten consumers reach this frame (per axis: the rank machinery's
    // quantile probe + bucketed pass, the tie-run aggregate, the join-
    // back; plus the pairing join) — without the cut each re-runs the
    // upstream plan from the scan (ScanAudit measured documents ×10 on
    // the q311 draft; the Concordance/q199 staging discipline)
    val base = Checkpoints.cut(df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y")))
    // per-row 2× average rank + per-group tie term, for one axis
    def axis(valCol: String, tieAlias: String): (DataFrame, DataFrame) = {
      val r2 = s"r2_$valCol"
      val ranked = Packing.groupedTwoPhaseRank(
        base.select(col("id"), col("grp"), col(valCol)), "grp", valCol, buckets)
      val runs = ranked.groupBy("grp", valCol)
        .agg((min("gpos") + max("gpos") + lit(2L)).as(r2),
          count(lit(1)).as("c"))
      val perRow = ranked.select("id", "grp", valCol)
        .join(runs.select(col("grp"), col(valCol), col(r2)),
          Seq("grp", valCol))
        .select(col("id"), col("grp"), col(r2))
      val ties = runs.groupBy("grp")
        .agg(sum(col("c") * col("c") * col("c") - col("c")).as(tieAlias))
      (perRow, ties)
    }
    val (rx, tx) = axis("x", "tie_x")
    val (ry, ty) = axis("y", "tie_y")
    // pair the two axes on (grp, id) — id alone would cross-match groups
    // whenever ids are only unique WITHIN a group
    val out = rx.join(ry.select("grp", "id", "r2_y"), Seq("grp", "id"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum((col("r2_x") - col("r2_y")) * (col("r2_x") - col("r2_y")))
          .as("d2x4_sum"))
      .join(tx, "grp").join(ty, "grp")
      .select(col("grp").as(groupCol), col("n"), col("d2x4_sum"),
        col("tie_x"), col("tie_y"))
    Checkpoints.sealAndRelease(out, base)
  }

  /** Per-group Gini concentration over a pre-counted (`group`, `item`,
    * `count`) table: with counts sorted ascending ((count, item) total
    * order), G = Σ(2r − n − 1)·c over n·Σc, shipped as the integer
    * (gini_num, gini_den) pair; 0 under a uniform distribution, → 1
    * under maximal concentration. The rank window partitions by group
    * and rides the items table — for token stats that is Heap's-law
    * vocabulary-sized, never the corpus.
    *
    * Output: (`group`, n_types, n_tokens, gini_num, gini_den).
    */
  def giniPerGroup(counts: DataFrame, groupCol: String, itemCol: String,
      countCol: String): DataFrame = {
    val base = counts.select(col(groupCol).as("g"), col(itemCol).as("t"),
      col(countCol).cast("long").as("c"))
    val w = Window.partitionBy("g").orderBy(col("c"), col("t"))
    base.withColumn("r", row_number().over(w).cast("long"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_types"), sum("c").as("n_tokens"),
        sum((lit(2L) * col("r") - lit(1L)) * col("c")).as("rsum"))
      .select(col("g").as(groupCol), col("n_types"), col("n_tokens"),
        (col("rsum") - col("n_types") * col("n_tokens")).as("gini_num"),
        (col("n_types") * col("n_tokens")).as("gini_den"))
  }
}
