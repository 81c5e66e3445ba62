package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring over ADDITIVE count state — the
  * measurement sibling of the dedup/index freshness lifecycle: the
  * at-rest state is a per-(group, value) count table (additive, so a
  * micro-batch merge is one sum — no rescan of history), and every
  * statistic is computed from that table on the VALUE GRID, never the
  * corpus. A 100 TB corpus contributes one count shuffle once; each
  * day's drift check then costs grid-sized work (distinct values ×
  * groups), which is what makes a per-micro-batch monitor affordable.
  */
object Drift {

  /** Per-group two-sample Kolmogorov–Smirnov statistic of each group's
    * distribution against the pooled distribution, from a (`group`,
    * `value`, `count`) table: ks_num = max_v |cs·n_all − cg·n_grp| with
    * the n_grp·n_all denominator left to the consumer (integer-exact,
    * no float). Both ECDFs step only at observed values, so the sup
    * over the distinct-value grid is the exact sup.
    *
    * Output: (`group`, ks_num, n_grp, n_all), one row per group.
    *
    * NULL values are EXCLUDED from the grid — a NULL observation has no
    * place in an ECDF, and SQL engines disagree on where NULL sorts
    * (Spark windows default ASC NULLS FIRST, DuckDB NULLS LAST), so a
    * NULL step would land at opposite ends of the two cumulative sums.
    */
  def ksFromCounts(counts: DataFrame, groupCol: String, valueCol: String,
      countCol: String): DataFrame = {
    // CUT: five consumers read the normalized count table (group
    // totals, pool total, value grid, the grid join, the pooled
    // cumulative) — without the cut EACH re-derives it from the
    // caller's corpus scan + count shuffle (Catalyst does not fuse
    // sibling consumers; the budgetSelect staging lesson). The cut
    // frame is grid-sized, so the materialization is cheap at any SF.
    val per = Checkpoints.cut(
      counts.select(col(groupCol).as("g"), col(valueCol).as("v"),
          col(countCol).cast("long").as("c"))
        .filter(col("v").isNotNull))
    val grps = per.groupBy("g").agg(sum("c").as("ns"))
    val na = per.agg(sum("c").as("ng"))
    val grid = grps.select("g").crossJoin(per.select("v").distinct())
    val scum = grid.join(per, Seq("g", "v"), "left")
      .withColumn("cs", sum(coalesce(col("c"), lit(0L))).over(
        Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // pooled cumulative over the distinct-value grid — bucketed (r22):
    // the old Window.orderBy("v") serialized the WHOLE grid in one task,
    // a cliff when distinct values ≈ corpus (the q246 measurement proved
    // such grids exist here); Packing.gridCumsums keeps the exact same
    // running sum but spreads it over quantile buckets of v
    val gcum = Packing.gridCumsums(
        per.groupBy("v").agg(sum("c").as("cv")), Seq("cv"), 32)
      .select(col("v"), col("cum_cv").as("cg"))
    Checkpoints.sealAndRelease(
      scum.join(gcum, "v").join(broadcast(grps), "g")
        .crossJoin(broadcast(na))
        .groupBy("g")
        .agg(max(abs(col("cs") * col("ng") - col("cg") * col("ns")))
            .as("ks_num"),
          max("ns").as("n_grp"), max("ng").as("n_all"))
        .select(col("g").as(groupCol), col("ks_num"), col("n_grp"),
          col("n_all")),
      per)
  }

  /** Per-group TOTAL-VARIATION distance of each group's distribution
    * from the pooled one, from the same additive count table as
    * [[ksFromCounts]] — the L1 companion to KS's sup metric (KS sees
    * the worst single threshold; TV sees the whole mass displacement,
    * catching many-small-shifts drift a sup metric underweights):
    * TV = ½ Σ_v |p_v − q_v| ships integer as tv_num = Σ_v |c_s·n_all −
    * c_g·n_grp| with the 2·n_grp·n_all denominator left to the
    * consumer. No cumulative window at all — TV is a pointwise sum, so
    * this is one grid-sized join + one hash agg, even cheaper than KS.
    *
    * Output: (`group`, tv_num, n_grp, n_all), one row per group.
    *
    * NULL values are EXCLUDED, same contract (and reason) as
    * [[ksFromCounts]].
    */
  def tvFromCounts(counts: DataFrame, groupCol: String, valueCol: String,
      countCol: String): DataFrame = {
    // CUT: four consumers of the normalized table — the ksFromCounts
    // staging rationale
    val per = Checkpoints.cut(
      counts.select(col(groupCol).as("g"), col(valueCol).as("v"),
          col(countCol).cast("long").as("c"))
        .filter(col("v").isNotNull))
    val grps = per.groupBy("g").agg(sum("c").as("ns"))
    val na = per.agg(sum("c").as("ng"))
    val gv = per.groupBy("v").agg(sum("c").as("cv"))
    val grid = grps.select("g").crossJoin(gv)
    Checkpoints.sealAndRelease(
      grid.join(per, Seq("g", "v"), "left")
        .join(broadcast(grps), "g").crossJoin(broadcast(na))
        .groupBy("g")
        .agg(sum(abs(coalesce(col("c"), lit(0L)) * col("ng") -
            col("cv") * col("ns"))).as("tv_num"),
          max("ns").as("n_grp"), max("ng").as("n_all"))
        .select(col("g").as(groupCol), col("tv_num"), col("n_grp"),
          col("n_all")),
      per)
  }

  /** Per-group WASSERSTEIN-1 (earth-mover) distance of each group's
    * distribution from the pooled one, from the same additive count
    * table as [[ksFromCounts]] — the magnitude-aware third leg of the
    * drift panel: KS reads the worst single threshold, TV the total
    * mass displaced, W1 the mass TIMES HOW FAR it moved (a length
    * distribution sliding 10× to the right and one sliding one step
    * have equal TV; W1 separates them). For integral values W1 =
    * Σ_v |F_g(v) − F_all(v)|·gap(v) is integer-exact: w1_num =
    * Σ_v |cs·n_all − cg·n_grp|·(next(v) − v) with the n_grp·n_all
    * denominator left to the consumer (the last grid value's gap is 0 —
    * both CDFs are 1 past it). Same grid-sized machinery as KS plus one
    * lead() on the distinct-value grid.
    *
    * `valueCol` must be integral (a distance needs a metric on values;
    * KS/TV need only an order). Overflow: |cs·ng − cg·ns| ≤ ns·ng, so
    * the summand bound is n_grp·n_all·range(v) < 9.2×10¹⁸ — tighter
    * than KS's by the value range; pre-bucket or DECIMAL(38,0) past it.
    * NULL values are excluded, the [[ksFromCounts]] contract.
    *
    * Output: (`group`, w1_num, n_grp, n_all), one row per group.
    */
  def w1FromCounts(counts: DataFrame, groupCol: String, valueCol: String,
      countCol: String): DataFrame = {
    // CUT: five consumers of the normalized table — the ksFromCounts
    // staging rationale
    val per = Checkpoints.cut(
      counts.select(col(groupCol).as("g"),
          col(valueCol).cast("long").as("v"),
          col(countCol).cast("long").as("c"))
        .filter(col("v").isNotNull))
    val grps = per.groupBy("g").agg(sum("c").as("ns"))
    val na = per.agg(sum("c").as("ng"))
    val grid = grps.select("g").crossJoin(per.select("v").distinct())
    val scum = grid.join(per, Seq("g", "v"), "left")
      .withColumn("cs", sum(coalesce(col("c"), lit(0L))).over(
        Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // pooled cumulative + inter-step gap, both on the distinct-value
    // grid — bucketed (r22, the ksFromCounts rationale): same running
    // sum and next-value gap, no single-task grid pass
    val gcum = Packing.gridCumsums(
        per.groupBy("v").agg(sum("c").as("cv")), Seq("cv"), 32,
        withGap = true)
      .select(col("v"), col("cum_cv").as("cg"), col("gap"))
    Checkpoints.sealAndRelease(
      scum.join(gcum, "v").join(broadcast(grps), "g")
        .crossJoin(broadcast(na))
        .groupBy("g")
        .agg(sum(abs(col("cs") * col("ng") - col("cg") * col("ns")) *
            col("gap")).as("w1_num"),
          max("ns").as("n_grp"), max("ng").as("n_all"))
        .select(col("g").as(groupCol), col("w1_num"), col("n_grp"),
          col("n_all")),
      per)
  }

  /** Exact per-group QUANTILE table from the additive count state — the
    * order-statistics read the persisted histogram supports that an
    * approximate sketch (t-digest, KLL) cannot: because the state is
    * exact per-value counts, any quantile of the underlying data is
    * recoverable exactly, at rest, without a corpus rescan. Same
    * definition as Sampling.exactQuantilesPerGroup (the q175 contract):
    * quantile d ∈ 1..q−1 is the value of the smallest 1-based rank r
    * with q·r ≥ d·n — equal because an id tie-break never changes the
    * VALUE at a rank (ties share values by construction here). Each
    * grid row explodes only the quantile indices its value-run is the
    * crossing position for — d ∈ ((q·(cum−c)) div n, (q·cum) div n] —
    * so output is groups×(q−1) rows and the grid never multiplies by q.
    * Grid-sized past nothing: the corpus never appears. NULL values
    * excluded, the family contract.
    *
    * Output: (`group`, quantile, value), quantile in 1..q−1.
    */
  def quantilesFromCounts(counts: DataFrame, groupCol: String,
      valueCol: String, countCol: String, q: Int = 10): DataFrame = {
    require(q >= 2, "need at least the median split")
    val per = counts.select(col(groupCol).as("g"), col(valueCol).as("v"),
        col(countCol).cast("long").as("c"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(sum("c").as("c"))
    val cum = per
      .withColumn("cum", sum("c").over(
        Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    // integer div, never Column./ — the q175 crossing-run arithmetic
    // restated on value runs (rank interval (cum−c, cum])
    val dLo = expr(s"(${q}L * (cum - c)) div n + 1L")
    val dHi = expr(s"least(${q - 1}L, (${q}L * cum) div n)")
    cum
      .withColumn("quantile", explode(when(dHi >= dLo, sequence(dLo, dHi))
        .otherwise(array().cast("array<long>"))))
      .select(col("g").as(groupCol),
        col("quantile").cast("int").as("quantile"), col("v").as("value"))
  }

  /** Coarsen the additive count state to fixed-width value bins:
    * (group, v, c) → (group, (v div width)·width, Σc) — the documented
    * mitigation when a panel's integer bound n_grp·n_all·range(v)
    * approaches 2⁶³ (the q177/q195 overflow notes say "pre-bucket"; this
    * is the tool). The representative value is the bin FLOOR, so the
    * result is itself a valid count state: every FromCounts statistic
    * runs on it unchanged, and rebinning COMMUTES with [[mergeCounts]]
    * (both are sums over disjoint key partitions — the property spec
    * pins rebin(counts(xs)) ≡ counts(⌊xs/w⌋·w)). Values must be
    * NONNEGATIVE (lengths, counts, sizes — this family's domain):
    * Spark's `div` truncates toward zero, which is floor only there;
    * a signed domain would disagree with engines that floor-divide.
    * Grid-sized in, smaller grid out.
    */
  def rebinCounts(counts: DataFrame, groupCol: String, valueCol: String,
      countCol: String, width: Long): DataFrame = {
    require(width >= 1, "need a positive bin width")
    counts.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"),
        col(countCol).cast("long").as("c"))
      .filter(col("v").isNotNull)
      .groupBy(col("g"), expr(s"(v div ${width}L) * ${width}L").as("v"))
      .agg(sum("c").as("c"))
      .select(col("g").as(groupCol), col("v").as(valueCol),
        col("c").as(countCol))
  }

  /** Per-group two-sample Kolmogorov–Smirnov statistic BETWEEN two count
    * tables — the "today vs yesterday" form of the monitor, where
    * [[ksFromCounts]] is the "source vs pooled corpus" form: for each
    * group present in either table, KS over the union value grid of that
    * group's two distributions, integer-exact as ks_num =
    * max_v |cA·nB − cB·nA| with the nA·nB denominator left to the
    * consumer. A group absent from one side gets that side's n = 0 (its
    * ECDF is undefined; ks_num degenerates to 0 — the consumer treats
    * n_a·n_b = 0 as "no basis for comparison", not "no drift").
    * Grid-sized like everything in this module: each group pays its own
    * distinct-value grid, never corpus rows. NULL values excluded, the
    * family contract.
    *
    * Output: (`group`, ks_num, n_a, n_b), one row per group in either
    * input.
    */
  def ksBetweenCounts(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, countCol: String): DataFrame =
    betweenCumulatives(a, b, groupCol, valueCol, countCol)
      .groupBy("g")
      .agg(max(abs(col("sa") * col("nb") - col("sb") * col("na")))
          .as("ks_num"),
        max("na").as("n_a"), max("nb").as("n_b"))
      .select(col("g").as(groupCol), col("ks_num"), col("n_a"), col("n_b"))

  /** Per-group two-sample KUIPER numerator between two count tables —
    * the ROTATION-INVARIANT companion to [[ksBetweenCounts]] (Kuiper,
    * 1960): V = D⁺ + D⁻, the sum of the largest positive and largest
    * negative ECDF gaps. KS sees only the single worst |gap|, so a shift
    * on a CYCLIC axis (hour-of-day, day-of-week) that pushes mass one
    * way early and the other way late can halve its KS score depending
    * on where the cut lands; V is invariant to where the cycle is cut —
    * the right statistic for diurnal/weekly drift. Same exact-integer
    * contract as the rest of the family: d_plus = max(sa·nb − sb·na),
    * d_minus = max(sb·na − sa·nb) over the union grid (each ≥ 0 — the
    * final grid point's gap is exactly 0), kuiper_num = d_plus + d_minus,
    * the n_a·n_b denominator at the consumer. Grid-sized.
    * Output: (`group`, kuiper_num, d_plus, d_minus, n_a, n_b).
    */
  def kuiperBetweenCounts(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, countCol: String): DataFrame =
    betweenCumulatives(a, b, groupCol, valueCol, countCol)
      .groupBy("g")
      .agg(max(col("sa") * col("nb") - col("sb") * col("na")).as("d_plus"),
        max(col("sb") * col("na") - col("sa") * col("nb")).as("d_minus"),
        max("na").as("n_a"), max("nb").as("n_b"))
      .select(col("g").as(groupCol),
        (col("d_plus") + col("d_minus")).as("kuiper_num"),
        col("d_plus"), col("d_minus"), col("n_a"), col("n_b"))

  /** Per-group TOTAL-VARIATION distance between two count tables — the
    * L1 leg of the between-states panel ([[tvFromCounts]] compared each
    * group to the pool): tv_num = Σ_v |cA·nB − cB·nA| with the 2·nA·nB
    * denominator at the consumer. Pointwise — no cumulative window.
    * Output: (`group`, tv_num, n_a, n_b).
    */
  def tvBetweenCounts(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, countCol: String): DataFrame = {
    val wg = Window.partitionBy("g")
    mergedGrid(a, b, groupCol, valueCol, countCol)
      .withColumn("na", sum("ca").over(wg))
      .withColumn("nb", sum("cb").over(wg))
      .groupBy("g")
      .agg(sum(abs(col("ca") * col("nb") - col("cb") * col("na")))
          .as("tv_num"),
        max("na").as("n_a"), max("nb").as("n_b"))
      .select(col("g").as(groupCol), col("tv_num"), col("n_a"), col("n_b"))
  }

  /** Per-group two-sample CRAMÉR–VON MISES numerator between two count
    * tables — the mean-squared companion to [[ksBetweenCounts]]'s sup
    * (Anderson, Ann. Math. Statist. 1962): KS sees only the single worst
    * ECDF gap, so a broad small shift that never spikes — the classic KS
    * blind spot — scores ~0 there but integrates to a real CvM signal.
    * cvm_num = Σ_v (sa·nb − sb·na)²·(ca + cb) over the union value grid
    * — the ω² functional ∫(F_a − F_b)² dF_pool scaled by
    * (n_a·n_b)²·(n_a + n_b), every factor exact; the consumer divides.
    * The sum is ACCUMULATED in DECIMAL(38,0) (exact, never wraps) and
    * SHIPPED as BIGINT — the q177/q195 int64-portability stance: the
    * worst-case bound is (n_a·n_b)²·(n_a + n_b) < 2⁶³ (both sides ≲ 5k),
    * but the statistic only approaches it under a total distribution
    * split; realistically cvm_num ≈ ω²·(n_a·n_b)²·(n_a+n_b)⁻¹ stays in
    * int64 far past that, and the decimal→long cast goes NULL (loudly,
    * non-ANSI) rather than silently wrapping when it ever doesn't.
    * ASYMMETRY CAVEAT (ADVICE r18): in that pathological regime the two
    * engines fail DIFFERENTLY — Spark's non-ANSI cast ships NULL while
    * DuckDB's CAST(HUGEINT AS BIGINT) raises — so an overflow surfaces
    * as a hash mismatch / oracle error at the gate, never as a silently
    * agreed-on wrapped value; the contract is "no wrap on either side",
    * not "identical failure mode". ScaleCheck 10× replicas can exceed
    * the ~5k-per-half bound above — expect the loud failure there. At
    * larger n, pre-bucket with [[rebinCounts]] and/or downscale one
    * side's counts before the call — the statistic is scale-covariant.
    * Grid-sized like the whole family. Output: (`group`, cvm_num BIGINT,
    * n_a, n_b).
    */
  def cvmBetweenCounts(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, countCol: String): DataFrame =
    betweenCumulatives(a, b, groupCol, valueCol, countCol)
      .withColumn("gapn",
        (col("sa") * col("nb") - col("sb") * col("na"))
          .cast("decimal(38,0)"))
      .groupBy("g")
      .agg(sum(col("gapn") * col("gapn") *
          (col("ca") + col("cb")).cast("decimal(38,0)")).as("cvm_num"),
        max("na").as("n_a"), max("nb").as("n_b"))
      .select(col("g").as(groupCol),
        col("cvm_num").cast("long").as("cvm_num"),
        col("n_a"), col("n_b"))

  /** Per-group WASSERSTEIN-1 distance between two count tables — the
    * magnitude-aware leg of the between-states panel, [[w1FromCounts]]'s
    * pooled form restated for two distributions: w1_num =
    * Σ_v |cumA·nB − cumB·nA|·gap(v) over each group's union value grid,
    * nA·nB denominator at the consumer. `valueCol` must be integral
    * (same contract and overflow bound as [[w1FromCounts]]).
    * Output: (`group`, w1_num, n_a, n_b).
    */
  def w1BetweenCounts(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, countCol: String): DataFrame =
    betweenCumulatives(a, b, groupCol, valueCol, countCol,
      castValueLong = true)
      .withColumn("gap", coalesce(
        lead("v", 1).over(Window.partitionBy("g").orderBy("v")) - col("v"),
        lit(0L)))
      .groupBy("g")
      .agg(sum(abs(col("sa") * col("nb") - col("sb") * col("na")) *
          col("gap")).as("w1_num"),
        max("na").as("n_a"), max("nb").as("n_b"))
      .select(col("g").as(groupCol), col("w1_num"), col("n_a"), col("n_b"))

  /** Per-(group, value) χ²-of-HOMOGENEITY cell decomposition between two
    * count tables — the classical two-sample test the between-states
    * panel ([[ksBetweenCounts]]/[[tvBetweenCounts]]/[[w1BetweenCounts]])
    * lacked: "are yesterday's and today's distributions draws from the
    * same population", shipped in the q181 integer stance as exact cell
    * rows (χ² = Σ_v dev_num²·(1/(n_a·col_tot) + 1/(n_b·col_tot))/n at
    * the consumer, n = n_a+n_b — the float division never enters the
    * engine). dev_num = cA·n − n_a·(cA+cB), which algebraically equals
    * cA·n_b − cB·n_a — the SAME integer the TV leg sums absolutely, so
    * the whole two-states panel shares one overflow bound (n_a·n_b <
    * 9.2×10¹⁸); side B's deviation is exactly −dev_num, hence one
    * column, and Σ_v dev_num = 0 per group (the property-spec law).
    * ZERO cells (a value seen on one side only) are materialized by the
    * union grid — absence is evidence (the q181 stance); a value absent
    * from BOTH sides has no evidence and no grid row. Grid-sized past
    * the two count shuffles; NULL values excluded, the family contract.
    *
    * Output: (`group`, `value`, c_a, c_b, n_a, n_b, dev_num), one row
    * per (group, union-grid value).
    */
  def chi2BetweenCounts(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, countCol: String): DataFrame = {
    val wg = Window.partitionBy("g")
    mergedGrid(a, b, groupCol, valueCol, countCol)
      .withColumn("na", sum("ca").over(wg))
      .withColumn("nb", sum("cb").over(wg))
      .select(col("g").as(groupCol), col("v").as(valueCol),
        col("ca").as("c_a"), col("cb").as("c_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        (col("ca") * col("nb") - col("cb") * col("na")).as("dev_num"))
  }

  /** Per-group count pairs over QUANTILE BUCKETS of the pooled
    * distribution — the population-stability (PSI) read, shipped
    * integer and f-divergence-agnostic (the q179 log-free stance: PSI's
    * ln() is library-dependent; the (c_grp, c_pool, n_grp, n_pool)
    * bucket table lets the consumer apply PSI, χ², TV or any other
    * f-divergence with one pass of arithmetic). Buckets are VALUE-BASED
    * and integer-exact: bucket(v) = ⌊(#pooled values < v)·B / n_pool⌋ —
    * monotone in v, all occurrences of a value share one bucket (ties
    * never split, so heavy ties may leave some of the B indices empty:
    * the table reports the OCCUPIED bucket grid), and every engine
    * replays the truncating division bit-for-bit where a float quantile
    * would be implementation-defined. ZERO cells per (group, occupied
    * bucket) are materialized — a group missing from a mass region is
    * the strongest drift evidence.
    *
    * Scale shape: the corpus pays one per-value count shuffle and one
    * per-(group, value) count shuffle; the cumulative window rides the
    * distinct-value grid (the q178 stance), everything after is
    * bucket-grid sized. NULL values excluded, the family contract.
    *
    * Output: (`group`, bucket, c_grp, c_pool, n_grp, n_pool), one row
    * per group × occupied pooled bucket.
    */
  def psiBuckets(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int): DataFrame =
    psiBucketsFromCounts(
      df.select(col(groupCol), col(valueCol))
        .filter(col(valueCol).isNotNull)
        .groupBy(groupCol, valueCol).agg(count(lit(1)).as("__c")),
      groupCol, valueCol, "__c", buckets)

  /** [[psiBuckets]] from an ADDITIVE (`group`, `value`, `count`) table —
    * the persisted-state form of the monitor, same contract as the
    * FromCounts drift trio: a restarted monitor reads the state
    * ([[readCounts]]) and pays grid-sized work per PSI check, never a
    * corpus rescan. Identical output to [[psiBuckets]] on the raw
    * observations the counts summarize (StatPropertySpec pins it).
    */
  def psiBucketsFromCounts(counts: DataFrame, groupCol: String,
      valueCol: String, countCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    // CUT: the per-(group, value) count table feeds four consumers
    // (pooled histogram, bucket assignment join, per-group totals, the
    // group-side counts) — the ksFromCounts staging rationale;
    // everything downstream is grid/bucket-sized
    val sv = Checkpoints.cut(
      counts.select(col(groupCol).as("g"), col(valueCol).as("v"),
          col(countCol).cast("long").as("c"))
        .filter(col("v").isNotNull)
        .groupBy("g", "v").agg(sum("c").as("c")))
    // pooled exclusive cumulative + pool total, bucketed over the grid
    // (r22, the ksFromCounts rationale — the old Window.orderBy("v") /
    // Window.partitionBy() pair serialized the whole grid in one task)
    val vb = Packing.gridCumsums(
        sv.groupBy("v").agg(sum("c").as("cv")), Seq("cv"), 32)
      .withColumn("cexcl", col("cum_cv") - col("cv"))
      .withColumnRenamed("tot_cv", "n_pool")
      // integer div, never Column./ (double) — exact at any count
      .withColumn("bkt", expr(s"(cexcl * ${buckets}L) div n_pool"))
    val pb = vb.groupBy("bkt")
      .agg(sum("cv").as("c_pool"), max("n_pool").as("n_pool"))
    val sb = sv.join(vb.select("v", "bkt"), "v")
      .groupBy("g", "bkt").agg(sum("c").as("c_grp"))
    val grps = sv.groupBy("g").agg(sum("c").as("n_grp"))
    Checkpoints.sealAndRelease(
      grps.crossJoin(pb)
        .join(sb, Seq("g", "bkt"), "left")
        .select(col("g").as(groupCol), col("bkt").as("bucket"),
          coalesce(col("c_grp"), lit(0L)).as("c_grp"), col("c_pool"),
          col("n_grp"), col("n_pool")),
      sv)
  }

  // shared between-states machinery: per-(group, value) counts from both
  // sides, full-outer merged onto each group's union value grid (NULL
  // values excluded — the family contract)
  private def mergedGrid(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, countCol: String,
      castValueLong: Boolean = false): DataFrame = {
    def side(df: DataFrame, cn: String) = df
      .select(col(groupCol).as("g"),
        (if (castValueLong) col(valueCol).cast("long")
         else col(valueCol)).as("v"),
        col(countCol).cast("long").as(cn))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(sum(cn).as(cn))
    side(a, "ca").join(side(b, "cb"), Seq("g", "v"), "full")
      .select(col("g"), col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
  }

  private def betweenCumulatives(a: DataFrame, b: DataFrame,
      groupCol: String, valueCol: String, countCol: String,
      castValueLong: Boolean = false): DataFrame = {
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy("g")
    mergedGrid(a, b, groupCol, valueCol, countCol, castValueLong)
      .withColumn("sa", sum("ca").over(w))
      .withColumn("sb", sum("cb").over(w))
      .withColumn("na", sum("ca").over(wg))
      .withColumn("nb", sum("cb").over(wg))
  }

  /** Merge a micro-batch of raw (`group`, `value`) observations into the
    * additive count state: one batch-sized count + a full-outer sum
    * merge on the state table. The state stays value-grid × groups
    * sized; history is never rescanned. NULL-valued observations are
    * dropped at the door (the [[ksFromCounts]] contract — and a NULL
    * join key never matches in the full-outer merge, so keeping them
    * would accumulate one duplicate NULL row per micro-batch).
    */
  def mergeCounts(state: DataFrame, batch: DataFrame, groupCol: String,
      valueCol: String, countCol: String): DataFrame = {
    val b = batch.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("bc"))
    state.select(col(groupCol).as("g"), col(valueCol).as("v"),
        col(countCol).cast("long").as("sc"))
      .join(b, Seq("g", "v"), "full")
      .select(col("g").as(groupCol), col("v").as(valueCol),
        (coalesce(col("sc"), lit(0L)) + coalesce(col("bc"), lit(0L)))
          .as(countCol))
  }

  // ------------------------------------------------------------------
  // At-rest form of the count state — the same `_graft_index`-style
  // contract every other freshness lifecycle carries (LSH/IVF/PQ
  // indexes, the component-label table): `path/_graft_index` records the
  // kind (`drift`) and the three column names the state was built with,
  // `path/counts` holds the (group, value, count) table as plain parquet
  // (grid-sized — groups × distinct values — so partitioning layout is
  // immaterial; a plain write is one tiny job). A restarted monitor
  // resumes from the persisted table instead of rescanning history, and
  // [[mergeIntoCounts]] gives the micro-batch append the staged-swap
  // crash-safety of the index compactor: a reader never sees a
  // half-written state, and a crashed merge leaves the live state
  // untouched.

  private def metaPath(path: String) = new Path(s"$path/_graft_index")

  /** Persist the additive count state at `path` (overwriting any prior
    * state there). NULL values are dropped at the door — the
    * [[ksFromCounts]] contract, enforced at rest so every future reader
    * agrees.
    */
  def writeCounts(counts: DataFrame, path: String, groupCol: String,
      valueCol: String, countCol: String): Unit = {
    val spark = counts.sparkSession
    counts.select(col(groupCol), col(valueCol), col(countCol).cast("long"))
      .filter(col(valueCol).isNotNull)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/counts")
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(("drift" +: Seq(groupCol, valueCol, countCol))
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a persisted count state back: the counts frame plus the
    * recorded (groupCol, valueCol, countCol) names — explicit metadata,
    * not schema inference, so a future internal column can never be
    * misread as one of the three. Fails with a domain message on a path
    * holding no drift state.
    *
    * Every read first completes any swap a crashed [[mergeIntoCounts]]
    * left half-done (see [[recoverSwap]]), so the "either the old or the
    * new state" guarantee holds from the READER's perspective too — a
    * monitor restarting right after the one instant where the live dir
    * is absent still comes up, on the new state.
    */
  def readCounts(spark: SparkSession, path: String)
      : (DataFrame, String, String, String) = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path)
    require(fs.exists(p),
      s"no drift count state at $path (missing ${p.getName}) — persist " +
        "one with Drift.writeCounts first")
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val lines = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n", -1).toSeq
    require(lines.head == "drift",
      s"state at $path is kind '${lines.head}', expected drift")
    lines.tail.filter(_.nonEmpty) match {
      case Seq(g, v, c) => (spark.read.parquet(s"$path/counts"), g, v, c)
      case other => throw new IllegalArgumentException(
        s"drift state at $path records ${other.size} column names, expected 3")
    }
  }

  /** Micro-batch append against the state AT REST: merge the raw
    * (`group`, `value`) observations in `batch` into the persisted table
    * via [[mergeCounts]] and swap the result live — staging write + two
    * renames, so a crash at any point leaves either the old or the new
    * state, never a torn one. In the one instant where neither dir is
    * live (between the two renames), the staged table is already
    * complete, and [[readCounts]] finishes the swap on the next read
    * ([[recoverSwap]]) — no manual intervention, no lost batch. Returns
    * the new state frame (a pure read of the published files). History
    * is never rescanned: the merge reads the grid-sized state and the
    * batch, nothing else.
    *
    * SINGLE-WRITER contract: exactly one monitor process merges a given
    * state path at a time (the natural shape — one streaming query owns
    * its state, as in DriftStateSpec's foreachBatch monitor). Two
    * concurrent merges on the SAME path would interleave the
    * delete/rename sequence and could drop one batch's counts; this
    * module deliberately adds no lock file — a crashed holder would
    * deadlock the monitor, the worse failure mode. Writers needing
    * multi-process ingest should serialize upstream (one merge queue),
    * exactly as they would for any compact-and-swap index artifact.
    *
    * External READERS are tolerated: a reader's [[readCounts]] racing
    * this writer between its two renames may itself publish the staged
    * table ([[recoverSwap]] cannot tell a crashed writer from a slow
    * one). That publish moves exactly the table this merge just wrote,
    * so the merge HAS landed — the publish step below treats
    * "staging gone and live present" as success rather than failing a
    * rename it lost by a beneficial race. (Failing there would be worse
    * than cosmetic: a streaming retry of the batch would double-merge
    * counts that are already live.)
    */
  def mergeIntoCounts(spark: SparkSession, path: String,
      batch: DataFrame): DataFrame = {
    val (state, g, v, c) = readCounts(spark, path)
    stagedSwap(spark, path)(staging =>
      mergeCounts(state, batch, g, v, c).write.parquet(staging))
  }

  /** The write-staging + two-rename publish shared by every at-rest
    * merge ([[mergeIntoCounts]], [[mergeIntoVecSums]]): a crash at any
    * point leaves either the old or the new state, never a torn one,
    * and a racing reader's [[recoverSwap]] publishing our staging is
    * treated as success (see the [[mergeIntoCounts]] reader contract).
    */
  private def stagedSwap(spark: SparkSession, path: String)(
      writeStaging: String => Unit): DataFrame = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(s"$path/counts")
    val staging = new Path(s"$path/counts_staging")
    fs.delete(staging, true) // a crashed previous merge leaves no debris
    writeStaging(staging.toString)
    val retired = new Path(s"$path/counts_retired")
    fs.delete(retired, true)
    require(fs.rename(live, retired), s"could not retire $live")
    // a racing reader's recoverSwap may have already published OUR
    // staging as live (see the scaladoc): that is success, not failure —
    // the staged table it moved is byte-for-byte the one this merge wrote
    if (!fs.rename(staging, live))
      require(!fs.exists(staging) && fs.exists(live),
        s"could not publish $staging")
    fs.delete(retired, true)
    spark.read.parquet(live.toString)
  }

  /** Finish a swap a crashed [[mergeIntoCounts]] left between its two
    * renames — the only window where no live `counts` dir exists. The
    * case analysis is exhaustive because the writer's order is fixed:
    * `counts` can only be absent AFTER `rename(live, retired)`
    * succeeded, and by then the staged table was already completely
    * written (the rename is gated on the staging write) — so when live
    * is missing and staging exists, publishing staging IS the new
    * state, not debris (debris — a torn staging write — only coexists
    * with a live dir, and stays untouched here). The retired dir is the
    * defensive last resort for a filesystem whose rename vanished
    * non-atomically; restoring it yields the OLD state, the documented
    * crash-before-publish outcome.
    */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val live = new Path(s"$path/counts")
    if (!fs.exists(live) && fs.exists(metaPath(path))) {
      val staging = new Path(s"$path/counts_staging")
      val retired = new Path(s"$path/counts_retired")
      if (fs.exists(staging)) {
        require(fs.rename(staging, live),
          s"crash recovery could not publish $staging")
        fs.delete(retired, true)
      } else if (fs.exists(retired)) {
        require(fs.rename(retired, live),
          s"crash recovery could not restore $retired")
      }
    }
  }

  // ------------------------------------------------------------------
  // Vector-sum state — the SEMANTIC leg's at-rest form (what the count
  // state is to length drift, this is to centroid drift): per
  // (group, dim) the exact micro-unit component sum and the vector
  // count. Components are fixed to integer micro-units
  // (round(x·10⁶) as long) AT INGEST, so the state is additive in
  // exact integer arithmetic — merge ORDER can never flicker a float
  // sum (the q44 rounding-grid stance applied at the state boundary);
  // any rounding back to decimals happens at READ, by the consumer.
  // Same `_graft_index` + staged-swap contract as the count state
  // (kind `vecsum`, four recorded column names), so the crash-recovery
  // and reader-race guarantees carry over verbatim.

  /** Per-(group, dim) micro-unit component sums of a vector column:
    * (`group`, dim — 1-based, s = Σ round(x·10⁶), n = vector count).
    * This is the ONE corpus-sized stage of the semantic lifecycle; every
    * downstream centroid/cosine read is (groups × dims)-sized. NULL
    * vectors are dropped at the door (no components to observe — the
    * [[ksFromCounts]] NULL contract transposed). Note n is per
    * (group, dim): equal across dims of a group when vectors are
    * fixed-width (the embeddings contract), which consumers may rely on.
    */
  def vecMicroSums(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(groupCol).as("g"),
        posexplode(col(vecCol)).as(Seq("d0", "x")))
      .groupBy(col("g"), (col("d0") + 1).cast("int").as("dim"))
      .agg(sum(round(col("x").cast("double") * lit(1e6)).cast("long"))
          .as("s"),
        count(lit(1)).as("n"))
      .select(col("g").as(groupCol), col("dim"), col("s"), col("n"))

  /** Merge two vector-sum tables additively: full-outer on (group, dim),
    * both the micro-sum and the count add — the [[mergeCounts]] shape on
    * the four-column state.
    */
  def mergeVecSums(state: DataFrame, batch: DataFrame, groupCol: String,
      dimCol: String, sumCol: String, nCol: String): DataFrame = {
    def side(df: DataFrame, sn: String, nn: String) =
      df.select(col(groupCol).as("g"), col(dimCol).cast("int").as("dim"),
        col(sumCol).cast("long").as(sn), col(nCol).cast("long").as(nn))
    side(state, "ss", "sn").join(side(batch, "bs", "bn"),
        Seq("g", "dim"), "full")
      .select(col("g").as(groupCol), col("dim").as(dimCol),
        (coalesce(col("ss"), lit(0L)) + coalesce(col("bs"), lit(0L)))
          .as(sumCol),
        (coalesce(col("sn"), lit(0L)) + coalesce(col("bn"), lit(0L)))
          .as(nCol))
  }

  /** Persist a vector-sum state at `path` (kind `vecsum`), overwriting
    * any prior state there. */
  def writeVecSums(sums: DataFrame, path: String, groupCol: String,
      dimCol: String, sumCol: String, nCol: String): Unit = {
    val spark = sums.sparkSession
    sums.select(col(groupCol), col(dimCol).cast("int"),
        col(sumCol).cast("long"), col(nCol).cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/counts")
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(("vecsum" +: Seq(groupCol, dimCol, sumCol, nCol))
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a persisted vector-sum state back: the sums frame plus the
    * recorded (groupCol, dimCol, sumCol, nCol) names. Completes any
    * half-done swap first — the [[readCounts]] reader guarantee.
    */
  def readVecSums(spark: SparkSession, path: String)
      : (DataFrame, String, String, String, String) = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path)
    require(fs.exists(p),
      s"no vector-sum state at $path (missing ${p.getName}) — persist " +
        "one with Drift.writeVecSums first")
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val lines = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n", -1).toSeq
    require(lines.head == "vecsum",
      s"state at $path is kind '${lines.head}', expected vecsum")
    lines.tail.filter(_.nonEmpty) match {
      case Seq(g, dim, sm, n) =>
        (spark.read.parquet(s"$path/counts"), g, dim, sm, n)
      case other => throw new IllegalArgumentException(
        s"vecsum state at $path records ${other.size} column names, " +
          "expected 4")
    }
  }

  /** Micro-batch append of raw (`group`, vector) observations against
    * the vector-sum state AT REST: [[vecMicroSums]] the batch, merge via
    * [[mergeVecSums]], publish via the staged swap. Same single-writer +
    * tolerated-reader contract as [[mergeIntoCounts]]; history is never
    * rescanned.
    */
  def mergeIntoVecSums(spark: SparkSession, path: String, batch: DataFrame,
      groupCol: String, vecCol: String): DataFrame = {
    val (state, g, dim, sm, n) = readVecSums(spark, path)
    val b = vecMicroSums(batch.select(col(groupCol).as(g),
      col(vecCol).as("vec")), g, "vec")
      .select(col(g), col("dim").as(dim), col("s").as(sm), col("n").as(n))
    stagedSwap(spark, path)(staging =>
      mergeVecSums(state, b, g, dim, sm, n).write.parquet(staging))
  }
}
