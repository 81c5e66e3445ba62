package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Weighted corpus subsampling for training-data curation.
  *
  * [[prioritySample]] is Duffield–Lund–Thorup priority sampling (JACM 54(6),
  * 2007): each item draws a deterministic pseudo-uniform `u` from a salted
  * md5 of its id, gets priority `q = w / u`, and the sample is the top-k by
  * priority. The (k+1)-th priority τ yields the unbiased weight estimator
  * `ŵ = max(w, τ)` — Σŵ over the sample estimates Σw over the corpus with
  * variance optimal among k-sample estimators, which is what a
  * quality-weighted corpus subsample owes downstream mixture accounting
  * (the q104 temperature resampler solves the per-SOURCE budget problem;
  * this solves the per-DOCUMENT one).
  *
  * Scale posture: priorities are map-side column math; the top-k is a
  * TakeOrderedAndProject (per-partition heaps + a k-row driver merge), so
  * the corpus is never globally sorted and never shuffles. The only window
  * runs over the ≤ k+1 surviving rows.
  *
  * Oracle portability: the pseudo-uniform is `u/2³²` with integer `u`
  * (md5-derived, [1, 2³²]), so `q = w/(u/2³²)` is computed as the LONG
  * numerator `w·2³²` divided by `u` — ONE correctly-rounded IEEE division
  * of exactly-representable integers, bit-identical in any engine (the q31
  * lesson) — and the selected set, priorities, and estimators hash-match.
  */
object Sampling {

  /** Top-`k` priority sample of `df` by integer weight `weightCol`.
    * Output: (id, weight, priority, est_weight), the DLT estimator
    * `est_weight = max(weight, τ)` with τ = (k+1)-th priority (0 when the
    * corpus has ≤ k rows — then the sample is exhaustive and ŵ = w).
    * Ties (same priority) break by id: impossible for distinct (w, u)
    * pairs to collide in practice, but the determinism is free.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "prio"): DataFrame = {
    require(k > 0, "need positive sample size k")
    val base = df.select(col(idCol).as("id"),
        col(weightCol).cast("long").as("weight"))
      .withColumn("u",
        TextFns.hash32(concat(lit(salt + ":"), col("id"))) + lit(1L))
      .withColumn("priority",
        (col("weight") * lit(4294967296L)).cast("double") /
          col("u").cast("double"))
    // top k+1 — TakeOrderedAndProject; the +1 row exists only to expose τ
    val top = base.orderBy(col("priority").desc, col("id")).limit(k + 1)
    val rn = row_number().over(
      Window.orderBy(col("priority").desc, col("id")))
    top.withColumn("rn", rn)
      .withColumn("tau",
        max(when(col("rn") === k + 1, col("priority")))
          .over(Window.partitionBy(lit(1))))
      .filter(col("rn") <= k)
      .select(col("id"), col("weight"), col("priority"),
        greatest(col("weight").cast("double"),
          coalesce(col("tau"), lit(0.0))).as("est_weight"))
  }

  /** Per-GROUP top-`k` priority sample — [[prioritySample]] stratified by
    * `groupCol`: each stratum (source, language, domain) draws its own
    * independent DLT sample with its own threshold τ_g and unbiased
    * per-stratum estimators. This is the curation shape mixture pipelines
    * actually need — "k best-weighted docs per source" — where a single
    * global sample would let one heavy-tailed source crowd out the rest.
    *
    * Scale posture: priorities are map-side column math; the per-group
    * top-(k+1) is a rank window over (group × priority) that Spark prunes
    * with WindowGroupLimit (per-partition per-group heaps of k+1 rows
    * BEFORE the exchange — the q08/q114 pattern), so a giant stratum never
    * materializes beyond k+1 rows per map task. τ_g is read off the
    * (k+1)-th row inside the same window pass; no second shuffle.
    *
    * Output: (group, id, weight, priority, est_weight), ≤ k rows per
    * group; a group with ≤ k rows is sampled exhaustively (τ_g = 0,
    * ŵ = w — the DLT boundary case, same as the global sampler).
    */
  def prioritySamplePerGroup(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String, k: Int, salt: String = "prio"): DataFrame = {
    require(k > 0, "need positive per-group sample size k")
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(weightCol).cast("long").as("weight"))
      .withColumn("u",
        TextFns.hash32(concat(lit(salt + ":"), col("id"))) + lit(1L))
      .withColumn("priority",
        (col("weight") * lit(4294967296L)).cast("double") /
          col("u").cast("double"))
    val byGrp = Window.partitionBy("grp")
      .orderBy(col("priority").desc, col("id"))
    base.withColumn("rn", row_number().over(byGrp))
      .filter(col("rn") <= k + 1)
      .withColumn("tau",
        max(when(col("rn") === k + 1, col("priority")))
          .over(Window.partitionBy("grp")))
      .filter(col("rn") <= k)
      .select(col("grp"), col("id"), col("weight"), col("priority"),
        greatest(col("weight").cast("double"),
          coalesce(col("tau"), lit(0.0))).as("est_weight"))
  }

  /** Per-group percentile gate: keep each group's top half (upper `gpos`
    * ranks) of `scoreCol` — threshold-free quality filtering across
    * heterogeneous sources (the CCNet / RefinedWeb per-bucket discipline:
    * one absolute score threshold tuned on web text would gut code or
    * forum sources wholesale; ranking WITHIN each source keeps every
    * source's own best). `keepPermille` sets the kept fraction in
    * thousandths so the gate is pure integer arithmetic — exact and
    * engine-portable, no float percentile to round.
    *
    * Scale posture: the within-group rank is [[Packing.groupedTwoPhaseRank]]
    * — global score-quantile buckets + per-(group, bucket) offsets — so a
    * skewed group (one source = half the corpus) spreads over all buckets
    * instead of serializing in a per-group window partition. Output:
    * (id, group, score, gpos, gn, kept) where kept ⇔ the row's rank sits
    * in the group's top `keepPermille`/1000: (gn − gpos) · 1000 ≤
    * keepPermille · gn.
    */
  def topFractionPerGroup(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, keepPermille: Int, buckets: Int = 32): DataFrame = {
    require(keepPermille >= 0 && keepPermille <= 1000,
      "keepPermille is a fraction in thousandths")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(scoreCol).cast("long").as("score"))
    if (base.head(1).isEmpty)
      return base.select(col("id"), col("grp"), col("score"),
        lit(0L).as("gpos"), lit(0L).as("gn"), lit(false).as("kept")).limit(0)
    Packing.groupedTwoPhaseRank(base, "grp", "score", buckets)
      .withColumn("kept",
        (col("gn") - col("gpos")) * 1000 <= lit(keepPermille) * col("gn"))
      .select(col("id"), col("grp"), col("score"), col("gpos"), col("gn"),
        col("kept"))
  }

  /** Exact stratified k-fold assignment: within each group, rows are
    * ranked by a deterministic key hash (uniform draw, id tiebreak) and
    * dealt round-robin to folds — so every (group, fold) cell holds
    * ⌊gn/k⌋ or ⌈gn/k⌉ rows, the EXACT balance guarantee q75's
    * hash-bucket split only approximates (a 80/10/10 hash split drifts
    * ±√n per class; cross-validation folds must not). Deterministic:
    * the same doc keeps its fold across runs and engines.
    *
    * Scale: [[Packing.groupedTwoPhaseRank]] supplies the within-group
    * positions with no per-group corpus window; fold = gpos mod k is
    * map-side arithmetic after.
    */
  def stratifiedFolds(df: DataFrame, idCol: String, groupCol: String,
      k: Int, buckets: Int = 32): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"),
      graft.functions.TextFns.hash32(
        concat(lit("fold:"), col(idCol).cast("string"))).as("score"))
    Packing.groupedTwoPhaseRank(base, "grp", "score", buckets)
      .withColumn("fold", pmod(col("gpos"), lit(k.toLong)))
      .select(col("id"), col("grp"), col("fold"), col("gpos"), col("gn"))
  }

  /** Exact quantile TABLE per group — the q-decile report an
    * `approx_percentile` can't pin to a hash gate: for each d in
    * 1..q−1, the value of the smallest (value, id)-ordered row whose
    * 1-based rank r satisfies q·r ≥ d·n (the lower-quantile convention,
    * all integer). One row per (group, d).
    *
    * Scale shape: [[Packing.groupedTwoPhaseRank]] supplies gpos/gn with
    * no per-group corpus window (a skewed group spreads over all
    * buckets); then each row EXPLODES ONLY the quantile indices it is
    * the crossing position for — d ∈ (q·gpos/gn, q·(gpos+1)/gn], almost
    * always empty, exactly one row per (group, d) overall — so the
    * output is groups×(q−1) rows and the corpus never multiplies by q.
    *
    * Output: (grp, quantile, value), quantile in 1..q−1.
    */
  def exactQuantilesPerGroup(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, q: Int = 10, buckets: Int = 32): DataFrame = {
    require(q >= 2, "need at least the median split")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
    if (base.head(1).isEmpty)
      return base.select(col("grp"), lit(0).as("quantile"),
        col("v").as("value")).limit(0)
    val ranked = Packing.groupedTwoPhaseRank(
      base.select(col("id"), col("grp"), col("v").as("score")),
      "grp", "score", buckets)
    // integer div, not Column./ (double) — the q31/q157 lesson
    val dLo = expr(s"(${q}L * gpos) div gn + 1L")
    val dHi = expr(s"least(${q - 1}L, (${q}L * (gpos + 1L)) div gn)")
    ranked
      .withColumn("quantile",
        explode(when(dHi >= dLo, sequence(dLo, dHi))
          .otherwise(array().cast("array<long>"))))
      .select(col("grp"), col("quantile").cast("int").as("quantile"),
        col("score").as("value"))
  }

  /** Exact WEIGHTED median of `valueCol` per group — the curation
    * statistic an unweighted median gets wrong: a per-doc median
    * overweights short documents, while weighting by token count answers
    * "the median TOKEN lives in a document with value v". Definition
    * (deterministic, oracle-replayable): the value of the first row in
    * (value, id) order whose inclusive cumulative weight reaches half
    * the group total (2·cum ≥ total — integer, no division).
    *
    * Scale shape: no per-group window over the corpus. Global quantile
    * cuts on the value bucket rows monotonically; per-(group, bucket)
    * weight sums roll into per-group running offsets on a
    * groups×buckets-sized frame (the only unpartitioned work); and —
    * the prune — only each group's CROSSING bucket (2·off < total ≤
    * 2·(off + bucketWeight)) runs a per-row weight window, so the
    * corpus outside those boundary buckets never enters a window or the
    * final aggregate. Rows of a skewed group spread over all buckets
    * exactly as in [[Packing.groupedTwoPhaseRank]].
    *
    * Output: (grp, wmedian, total_w), one row per group.
    */
  def weightedMedianPerGroup(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, weightCol: String, buckets: Int = 32): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(valueCol).cast("long").as("v"),
      col(weightCol).cast("long").as("w"))
    if (base.head(1).isEmpty)
      return base.select(col("grp"), col("v").as("wmedian"),
        lit(0L).as("total_w")).limit(0)
    val bucketed = Packing.quantileBuckets(base, "v", buckets)
    val offsets = bucketed.groupBy("grp", "b").agg(sum("w").as("bw"))
      .withColumn("off", coalesce(sum(col("bw")).over(
        Window.partitionBy("grp").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("gtot", sum(col("bw")).over(Window.partitionBy("grp")))
      // the crossing bucket only: its start is before the half-weight
      // point and its end at or past it — every other bucket's rows can
      // neither be the median nor tighten the min, so they never join
      .filter(lit(2L) * col("off") < col("gtot") &&
        lit(2L) * (col("off") + col("bw")) >= col("gtot"))
      .select(col("grp"), col("b"), col("off"), col("gtot"))
    bucketed.join(broadcast(offsets), Seq("grp", "b"))
      .withColumn("cum",
        sum("w").over(Window.partitionBy("grp", "b").orderBy("v", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          col("off"))
      .filter(lit(2L) * col("cum") >= col("gtot"))
      .groupBy("grp")
      .agg(min("v").as("wmedian"), max("gtot").as("total_w"))
  }

  /** Greedy token-budget corpus selection — the knapsack curation
    * primitive: take documents in descending-`scoreCol` order (ties by
    * id) while the running `costCol` total stays within `budget`. The
    * greedy order is the standard curation policy ("best documents first
    * until the token budget is spent"), and with unit-density items it IS
    * the fractional-knapsack optimum truncated to whole documents.
    *
    * Scale posture — the naive plan is the anti-pattern: a global
    * `sum(cost) OVER (ORDER BY score DESC)` window puts the whole corpus
    * in ONE task. Here the prefix sum is two-phase like
    * [[Packing.twoPhaseRank]]: global quantile cuts on the (negated)
    * score bucket rows monotonically (equal keys never straddle), ONE
    * buckets-row window turns per-bucket cost sums into running offsets,
    * and the per-row running sum runs partition-parallel within buckets.
    * Buckets whose offset already exceeds the budget are pruned BEFORE
    * their window executes — past the boundary bucket, the corpus tail
    * does no window work at all.
    *
    * Output: (id, score, cost, cum) for the selected rows — `cum` is the
    * inclusive running total, ≤ `budget` by construction.
    *
    * Null contract: rows with a NULL score or NULL cost are EXCLUDED
    * before selection. Without the filter, a NULL score negates to NULL,
    * lands in bucket 0, and sorts FIRST (Spark ASC NULLS FIRST) — i.e. an
    * unscored document would silently be treated as the best one, the
    * opposite of every SQL `ORDER BY score DESC` (NULLS LAST) reading;
    * and a NULL cost would be skipped by `sum`, under-counting `cum`.
    */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: String,
      costCol: String, budget: Long, buckets: Int = 32): DataFrame = {
    require(budget >= 0, "a token budget is nonnegative")
    // STAGED: the operator drives three actions over `base` (the
    // emptiness probe, the quantile job, the selection itself), and
    // callers routinely pass COMPUTED score/cost expressions (q168
    // tokenizes every document) — unstaged, each action re-derives them,
    // and the null filter makes it worse by pushing past the caller's
    // projections to the scan, where the predicate re-evaluates the
    // expensive expressions once more per conjunct (Catalyst eliminates
    // common subexpressions within an operator, not across Filter and
    // Project). One cut = one derivation, total; measured on q168 at
    // sf0.1 (isolated JVMs): unstaged with the null filter 1.28–1.58 s,
    // staged 0.98–1.09 s — at the no-filter baseline (1.07–1.11 s).
    val base = Checkpoints.cut(df
      .select(col(idCol).cast("long").as("id"),
        col(scoreCol).as("score"), col(costCol).cast("long").as("cost"))
      .filter(col("score").isNotNull && col("cost").isNotNull)
      .withColumn("key", -col("score")))
    if (base.head(1).isEmpty)
      return Checkpoints.sealAndRelease(base.select("id", "score", "cost")
        .withColumn("cum", lit(0L)).limit(0), base)
    val bucketed = Packing.quantileBuckets(base, "key", buckets)
    val offsets = bucketed.groupBy("b").agg(sum("cost").as("bsum"))
      .withColumn("off", coalesce(sum(col("bsum")).over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("b", "off")
    val out = bucketed.join(broadcast(offsets), "b")
      // a bucket whose offset alone exceeds the budget cannot contribute
      // a selected row (costs are token counts, nonnegative by
      // construction — a negative cost would break this prune and the
      // greedy policy alike); prune before any window work happens
      .filter(col("off") <= budget)
      .withColumn("cum",
        sum("cost").over(Window.partitionBy("b").orderBy("key", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          col("off"))
      .filter(col("cum") <= budget)
      .select(col("id"), col("score"), col("cost"), col("cum"))
    Checkpoints.sealAndRelease(out, base)
  }

  /** Per-GROUP greedy token-budget selection — [[budgetSelect]] with an
    * independent budget per `groupCol` stratum: the MIXTURE-construction
    * shape ("the best 1B tokens from EACH source") where the global
    * greedy would let one high-scoring source spend every other source's
    * budget. Policy per group is identical to the global operator:
    * descending score, ties by id, take while the group's running cost
    * total stays within `budget`.
    *
    * Scale posture mirrors [[weightedMedianPerGroup]]: GLOBAL score
    * quantile cuts bucket rows monotonically (a skewed group spreads
    * over all buckets instead of serializing in one window partition);
    * per-(group, bucket) cost sums roll into per-group running offsets
    * on the groups×buckets frame; buckets whose group offset already
    * exceeds the budget are pruned BEFORE any per-row window — past
    * each group's boundary bucket the corpus tail does no window work.
    * Null contract as [[budgetSelect]] (NULL score/cost rows excluded).
    *
    * Output: (grp, id, score, cost, cum), cum ≤ budget within each grp.
    */
  def budgetSelectPerGroup(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, costCol: String, budget: Long,
      buckets: Int = 32): DataFrame = {
    require(budget >= 0, "a token budget is nonnegative")
    // staged for the same reason as budgetSelect: three actions over
    // computed score/cost expressions
    val base = Checkpoints.cut(df
      .select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        col(scoreCol).as("score"), col(costCol).cast("long").as("cost"))
      .filter(col("score").isNotNull && col("cost").isNotNull)
      .withColumn("key", -col("score")))
    if (base.head(1).isEmpty)
      return Checkpoints.sealAndRelease(
        base.select("grp", "id", "score", "cost")
          .withColumn("cum", lit(0L)).limit(0), base)
    val bucketed = Packing.quantileBuckets(base, "key", buckets)
    val offsets = bucketed.groupBy("grp", "b").agg(sum("cost").as("bsum"))
      .withColumn("off", coalesce(sum(col("bsum")).over(
        Window.partitionBy("grp").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // a (group, bucket) whose offset alone exceeds the group's budget
      // cannot contribute a selected row (nonnegative costs)
      .filter(col("off") <= budget)
      .select("grp", "b", "off")
    val out = bucketed.join(broadcast(offsets), Seq("grp", "b"))
      .withColumn("cum",
        sum("cost").over(Window.partitionBy("grp", "b").orderBy("key", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          col("off"))
      .filter(col("cum") <= budget)
      .select(col("grp"), col("id"), col("score"), col("cost"), col("cum"))
    Checkpoints.sealAndRelease(out, base)
  }
}
