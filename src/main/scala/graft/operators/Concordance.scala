package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group Kendall τ-b concordance census in O(n log n) work per group
  * — the corpus-scale replacement for the all-pairs self-join (quadratic
  * in the group), whose output it matches row-for-row.
  *
  * The discordant count is an INVERSION count: sort each group by
  * (x asc, y asc); a pair is discordant exactly when it is an inversion
  * of the y-sequence in that order (pairs tied in x sort y-ascending so
  * they never invert; pairs tied in y are never a strict inversion —
  * both exactly Kendall's "neither concordant nor discordant" classes).
  * Inversions are counted by the classic merge-sort recurrence (Knight,
  * JASA 1966), restated data-parallel as ⌈log₂ n⌉ BINARY-DOUBLING merge
  * levels: at level k, positions pair into (left, right) half-blocks of
  * 2ᵏ, and the level's inversions are, per right-row, the number of
  * left-rows with strictly greater y — computable inside one window as
  * (left-total − running left-count) under (y, side, pos) order. Every
  * cross-pair merges at exactly one level, so Σ levels = total
  * inversions, exactly.
  *
  * The tie census (pairs tied in x / y / both) and the pair total come
  * from three value-grain aggregates (Σ c·(c−1)/2 — integer-exact), and
  * concordant = total − discordant − ties. All seven outputs are exact
  * int64 (n_pairs ≤ n²/2: exact past n = 4×10⁹ per group).
  *
  * Scale posture: the position is [[Packing.groupedTwoPhaseRank]] (global
  * quantile buckets + per-(group, bucket) offsets — a skewed group spreads
  * over all buckets instead of serializing one window partition). The
  * level expansion is ⌈log₂ max-group⌉ × n rows through ONE window shuffle
  * partitioned by (group, level, block) — blocks at level k have ≤ 2ᵏ⁺¹
  * rows, and the LARGEST partition (top level) is two half-groups, the
  * same bound as any per-group pass. Total work O(n log n), no self-join,
  * no per-group single task until the unavoidable final two-half merge.
  *
  * Contract: `xCol`/`yCol` cast to long; the composite sort key packs
  * (x, y) as x·2²² + y, exact while 0 ≤ y < 2²² and |x| < 2³⁰ — token
  * counts and char lengths sit orders of magnitude inside. The bounds
  * are ENFORCED at runtime (min/max piggybacked on the maxN driver
  * aggregate): out-of-range inputs fail loudly instead of silently
  * mis-ordering the sort key and returning a wrong census (ADVICE r19
  * — q306/q309 feed per-(type, day) counts, which a large enough corpus
  * could push past 2²²). Output:
  * (`gCol`, n_pairs, nc, ndis, ties_x, ties_y, ties_xy).
  */
object Concordance {

  def kendallCensus(df: DataFrame, gCol: String, idCol: String,
      xCol: String, yCol: String, buckets: Int = 32): DataFrame = {
    // CUT: five consumers read this frame (the rank path's quantile
    // probe + ranked pass, three tie-census aggregates, the group
    // count) — without the cut each one re-runs the upstream plan from
    // the scan (ScanAudit measured documents ×6 on the q297 draft; the
    // staging discipline every multi-consumer frame in this repo follows)
    val base = Checkpoints.cut(df.select(col(gCol).as("g"),
      col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y")))

    // ndis = inversions of y ordered by (x, y): rank, then merge-count.
    // Tie-break inside equal (x, y) is irrelevant to the count (such
    // pairs are tied-both, never inversions) — id only makes pos
    // deterministic.
    val keyed = base.withColumn("sk", col("x") * lit(1L << 22) + col("y"))
    val ranked = Packing.groupedTwoPhaseRank(keyed, "g", "sk", buckets)
    // ⌈log₂ max-group-size⌉ merge levels — one 1-row driver read, the
    // q271-class planning statistic, never corpus data. The same
    // aggregate carries min/max(x, y) so the packing contract above is
    // CHECKED, not assumed: y outside [0, 2²²) or |x| ≥ 2³⁰ would make
    // sk = x·2²² + y mis-order silently → wrong nc/ndis with no error.
    val st = ranked.agg(coalesce(max("gn"), lit(1L)),
      coalesce(min("x"), lit(0L)), coalesce(max("x"), lit(0L)),
      coalesce(min("y"), lit(0L)), coalesce(max("y"), lit(0L))).head()
    val (maxN, xLo, xHi, yLo, yHi) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3), st.getLong(4))
    require(yLo >= 0L && yHi < (1L << 22),
      s"kendallCensus packing contract violated: $yCol range [$yLo, $yHi] " +
        s"outside [0, ${1L << 22}) — the x*2^22+y sort key would mis-order; " +
        "rescale/bucket y (e.g. divide counts by a fixed grain) first")
    require(xLo > -(1L << 30) && xHi < (1L << 30),
      s"kendallCensus packing contract violated: $xCol range [$xLo, $xHi] " +
        s"outside (±${1L << 30}) — the x*2^22+y sort key would overflow")
    val levels = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxN - 1)))
    val lv = ranked.select(col("g"), col("gpos"), col("y"))
      .withColumn("k", explode(sequence(lit(0), lit(levels - 1))))
      .withColumn("p2", expr("cast(pow(2.0d, k) AS BIGINT)")) // 2^k exact
      .withColumn("blk", expr("gpos div (p2 * 2)"))
      .withColumn("side", expr("(gpos div p2) % 2"))
      .withColumn("is_l", when(col("side") === 0L, 1L).otherwise(0L))
    val wRun = Window.partitionBy("g", "k", "blk")
      .orderBy(col("y"), col("side"), col("gpos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.partitionBy("g", "k", "blk")
    // under (y, side, pos) order every left-row with y ≤ this right-row's
    // y precedes it (ties break left-first), so strictly-greater lefts =
    // block's left total − running left count
    val ndis = lv
      .withColumn("left_le", sum(col("is_l")).over(wRun))
      .withColumn("left_all", sum(col("is_l")).over(wBlk))
      .filter(col("side") === 1L)
      .groupBy("g")
      .agg(sum(col("left_all") - col("left_le")).as("ndis"))

    // tie census: Σ c·(c−1)/2 at the x / y / (x,y) value grains
    def tiePairs(cols: Seq[String], alias: String): DataFrame =
      base.groupBy(col("g") +: cols.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .groupBy("g").agg(sum(expr("(c * (c - 1)) div 2")).as(alias))

    val out = base.groupBy("g").agg(count(lit(1)).as("n"))
      .join(ndis, Seq("g"), "left")
      .join(tiePairs(Seq("x"), "tx_all"), Seq("g"))
      .join(tiePairs(Seq("y"), "ty_all"), Seq("g"))
      .join(tiePairs(Seq("x", "y"), "txy"), Seq("g"))
      .select(col("g").as(gCol),
        expr("(n * (n - 1)) div 2").as("n_pairs"),
        (expr("(n * (n - 1)) div 2") - coalesce(col("ndis"), lit(0L)) -
          (col("tx_all") - col("txy")) - (col("ty_all") - col("txy")) -
          col("txy")).as("nc"),
        coalesce(col("ndis"), lit(0L)).as("ndis"),
        (col("tx_all") - col("txy")).as("ties_x"),
        (col("ty_all") - col("txy")).as("ties_y"),
        col("txy").as("ties_xy"))
    Checkpoints.sealAndRelease(out, base)
  }
}
