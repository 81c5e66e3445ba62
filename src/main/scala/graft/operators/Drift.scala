package graft.operators

import org.apache.spark.sql.DataFrame
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
    */
  def ksFromCounts(counts: DataFrame, groupCol: String, valueCol: String,
      countCol: String): DataFrame = {
    val per = counts.select(col(groupCol).as("g"), col(valueCol).as("v"),
      col(countCol).cast("long").as("c"))
    val grps = per.groupBy("g").agg(sum("c").as("ns"))
    val na = per.agg(sum("c").as("ng"))
    val grid = grps.select("g").crossJoin(per.select("v").distinct())
    val scum = grid.join(per, Seq("g", "v"), "left")
      .withColumn("cs", sum(coalesce(col("c"), lit(0L))).over(
        Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val gcum = per.groupBy("v").agg(sum("c").as("cv"))
      .withColumn("cg", sum("cv").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("v", "cg")
    scum.join(gcum, "v").join(broadcast(grps), "g")
      .crossJoin(broadcast(na))
      .groupBy("g")
      .agg(max(abs(col("cs") * col("ng") - col("cg") * col("ns")))
          .as("ks_num"),
        max("ns").as("n_grp"), max("ng").as("n_all"))
      .select(col("g").as(groupCol), col("ks_num"), col("n_grp"),
        col("n_all"))
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
    */
  def tvFromCounts(counts: DataFrame, groupCol: String, valueCol: String,
      countCol: String): DataFrame = {
    val per = counts.select(col(groupCol).as("g"), col(valueCol).as("v"),
      col(countCol).cast("long").as("c"))
    val grps = per.groupBy("g").agg(sum("c").as("ns"))
    val na = per.agg(sum("c").as("ng"))
    val gv = per.groupBy("v").agg(sum("c").as("cv"))
    val grid = grps.select("g").crossJoin(gv)
    grid.join(per, Seq("g", "v"), "left")
      .join(broadcast(grps), "g").crossJoin(broadcast(na))
      .groupBy("g")
      .agg(sum(abs(coalesce(col("c"), lit(0L)) * col("ng") -
          col("cv") * col("ns"))).as("tv_num"),
        max("ns").as("n_grp"), max("ng").as("n_all"))
      .select(col("g").as(groupCol), col("tv_num"), col("n_grp"),
        col("n_all"))
  }

  /** Merge a micro-batch of raw (`group`, `value`) observations into the
    * additive count state: one batch-sized count + a full-outer sum
    * merge on the state table. The state stays value-grid × groups
    * sized; history is never rescanned.
    */
  def mergeCounts(state: DataFrame, batch: DataFrame, groupCol: String,
      valueCol: String, countCol: String): DataFrame = {
    val b = batch.groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("bc"))
    state.select(col(groupCol).as("g"), col(valueCol).as("v"),
        col(countCol).cast("long").as("sc"))
      .join(b, Seq("g", "v"), "full")
      .select(col("g").as(groupCol), col("v").as(valueCol),
        (coalesce(col("sc"), lit(0L)) + coalesce(col("bc"), lit(0L)))
          .as(countCol))
  }
}
