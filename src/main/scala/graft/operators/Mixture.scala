package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Training-mix rebalancing: temperature-based (α = 0.5) per-source
  * resampling of a document corpus to a global token budget — the
  * multilingual / multi-source mixture step (XLM-R §3.1, mT5 §3.2 style
  * α-sampling) an LLM data pipeline runs after cleaning and dedup, so one
  * giant source cannot drown the tail sources.
  *
  * Semantics: each source's token mass `m_s` gets weight `⌊√m_s⌋` (α = 0.5
  * as exponent, floored to keep every step integer-exact and therefore
  * oracle-able — no cross-engine float-sum ordering can move a budget
  * boundary); the global budget `B = (Σm_s · num) div den` splits
  * proportionally: `b_s = (w_s · B) div Σw_s`. Within a source, documents
  * are admitted in ascending id order while the running token sum stays
  * ≤ b_s — deterministic, reproducible sampling (re-running the pipeline
  * on the same corpus selects the same documents).
  *
  * Scale posture: the per-source running sum is the q101 two-phase prefix
  * sum, partitioned by (source, id-quantile-bucket) — a 100 TB source does
  * NOT become one window partition. Per-source masses and budgets are
  * source-cardinality-sized frames (broadcast); the only corpus-sized
  * shuffles are the mass aggregation and the bucketed cumsum exchange.
  */
object Mixture {

  /** Per-source admission decisions; see [[temperatureSampleSummary]] for
    * the driver-checked per-source rollup. Output: one row per ADMITTED
    * document `(id, grp, n_toks, cum_toks, budget_toks)`.
    */
  def temperatureSample(docs: DataFrame, idCol: String, groupCol: String,
      textCol: String, budgetNum: Long, budgetDen: Long,
      buckets: Int = 32): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && buckets > 0,
      "need positive budget fraction and buckets")
    // CUT: the tokenize is the expensive stage and FOUR consumers read
    // its 3-narrow-column result (emptiness probe, masses, the
    // quantile-bucket pass, the cumsum) — without the cut each re-runs
    // it (the budgetSelect staging lesson)
    val base = Checkpoints.cut(docs.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"),
      size(TextFns.tokens(col(textCol))).cast("long").as("n_toks")))
    if (base.head(1).isEmpty) {
      Checkpoints.release(base)
      return emptySample(docs)
    }

    // source-cardinality-sized frames: token masses → √-weights → budgets.
    // All arithmetic integer (long · long, integer div) so the oracle is
    // bit-exact; the one sqrt is correctly-rounded IEEE on a whole number.
    val masses = base.groupBy("grp").agg(sum("n_toks").as("m"))
      .withColumn("w", floor(sqrt(col("m"))).cast("long"))
    val totals = masses.agg(sum("m").as("tot"), sum("w").as("wsum"))
    val budgets = masses.crossJoin(broadcast(totals))
      .withColumn("budget_toks",
        expr(s"(w * ((tot * $budgetNum) div $budgetDen)) div wsum"))
      .select("grp", "m", "w", "budget_toks")

    // two-phase per-source prefix sum (the q101 pattern, keyed by source):
    // quantile buckets on id are monotone, so within-source id order is
    // preserved; the unpartitioned work is one window over (sources ×
    // buckets) rows, never over documents.
    val bucketed = assignBuckets(base, buckets)
    val offsets = bucketed.groupBy("grp", "b").agg(sum("n_toks").as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.partitionBy("grp").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("grp", "b", "off")
    Checkpoints.sealAndRelease(
      bucketed.join(broadcast(offsets), Seq("grp", "b"))
        .withColumn("cum_toks", sum(col("n_toks")).over(
          Window.partitionBy("grp", "b").orderBy("id")
            .rowsBetween(Window.unboundedPreceding, 0)) + col("off"))
        .join(broadcast(budgets), "grp")
        .filter(col("cum_toks") <= col("budget_toks"))
        .select("id", "grp", "n_toks", "cum_toks", "budget_toks"),
      base)
  }

  /** The driver-checked rollup: one row per source with its mass, weight,
    * budget, and what the admission pass kept.
    */
  def temperatureSampleSummary(docs: DataFrame, idCol: String,
      groupCol: String, textCol: String, budgetNum: Long, budgetDen: Long,
      buckets: Int = 32): DataFrame =
    temperatureSample(docs, idCol, groupCol, textCol, budgetNum, budgetDen,
      buckets)
      .groupBy("grp")
      .agg(count(lit(1)).as("docs_kept"), sum("n_toks").as("toks_kept"),
        max("budget_toks").as("budget_toks"))

  /** Epoch-replication mixture: turn explicit per-group target WEIGHTS and
    * a global token budget into a per-document integer REPEAT count — the
    * "how many epochs of each source" table every LLM pretraining run
    * publishes (GPT-3 Table 2.2, LLaMA Table 1: wikipedia 3.4 epochs,
    * common-crawl 0.44). [[temperatureSample]] only DOWN-samples toward
    * derived √-mass weights; this operator both up- and down-samples
    * toward stated weights, capped at `maxEpochs` full passes so a tiny
    * high-weight source cannot be memorization-looped.
    *
    * Semantics, integer-exact end to end: group g with token mass m_g and
    * weight w_g gets target t_g = (w_g · B) div Σw where
    * B = (Σm · budgetNum) div budgetDen. Full epochs = min(maxEpochs,
    * t_g div m_g); the remainder t_g − full·m_g is filled by admitting
    * documents in ascending id while the running token sum stays within
    * it (one extra repeat each). Groups without a stated weight get
    * weight 0 — their documents are emitted with repeats = 0, keeping the
    * output a total accounting of the corpus. repeats = 0 means dropped;
    * the materialization step downstream is `explode(sequence(1, repeats))`
    * on repeats > 0.
    *
    * Scale posture: masses/weights/targets are group-cardinality frames
    * (broadcast); the remainder admission reuses the [[temperatureSample]]
    * two-phase prefix sum — quantile-bucketed windows, so one giant group
    * never becomes one window partition. One corpus-sized shuffle total
    * (the mass agg shares the cumsum exchange's keying).
    */
  def epochMix(docs: DataFrame, idCol: String, groupCol: String,
      textCol: String, weights: Seq[(String, Long)], budgetNum: Long,
      budgetDen: Long, maxEpochs: Int, buckets: Int = 32): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && maxEpochs > 0 && buckets > 0,
      "need positive budget fraction, epoch cap and buckets")
    require(weights.nonEmpty && weights.forall(_._2 >= 0),
      "need non-negative weights")
    // CUT: same staging rationale as temperatureSample — one tokenize
    // pass for the probe, masses, bucketing and cumsum
    val base = Checkpoints.cut(docs.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"),
      size(TextFns.tokens(col(textCol))).cast("long").as("n_toks")))
    if (base.head(1).isEmpty) {
      Checkpoints.release(base)
      return emptyMix(docs)
    }

    import docs.sparkSession.implicits._
    val wFrame = weights.toDF("grp", "w")
    val masses = base.groupBy("grp").agg(sum("n_toks").as("m"))
      .join(broadcast(wFrame), Seq("grp"), "left")
      .withColumn("w", coalesce(col("w"), lit(0L)))
    // Σw over groups PRESENT in the corpus — absent weighted groups get no
    // share, so the budget is spent entirely on real data.
    val totals = masses.agg(sum("m").as("tot"), sum("w").as("wsum"))
    val targets = masses.crossJoin(broadcast(totals))
      .withColumn("target_toks", when(col("wsum") === 0L, lit(0L))
        .otherwise(expr(
          s"(w * ((tot * $budgetNum) div $budgetDen)) div wsum")))
      .withColumn("full_epochs",
        when(col("m") === 0L, lit(0L))
          .otherwise(least(expr("target_toks div m"), lit(maxEpochs.toLong))))
      .withColumn("rem_toks",
        when(col("m") === 0L, lit(0L))
          .when(col("full_epochs") < maxEpochs,
            col("target_toks") - col("full_epochs") * col("m"))
          .otherwise(lit(0L)))
      .select("grp", "m", "w", "target_toks", "full_epochs", "rem_toks")

    val bucketed = assignBuckets(base, buckets)
    val offsets = bucketed.groupBy("grp", "b").agg(sum("n_toks").as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.partitionBy("grp").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("grp", "b", "off")
    Checkpoints.sealAndRelease(
      bucketed.join(broadcast(offsets), Seq("grp", "b"))
        .withColumn("cum_toks", sum(col("n_toks")).over(
          Window.partitionBy("grp", "b").orderBy("id")
            .rowsBetween(Window.unboundedPreceding, 0)) + col("off"))
        .join(broadcast(targets), "grp")
        .withColumn("repeats", col("full_epochs") +
          when(col("cum_toks") <= col("rem_toks"), 1L).otherwise(0L))
        .select("id", "grp", "n_toks", "full_epochs", "repeats"),
      base)
  }

  private def emptyMix(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("n_toks", LongType), StructField("full_epochs", LongType),
      StructField("repeats", LongType)))
    docs.sparkSession.createDataFrame(
      docs.sparkSession.sparkContext.emptyRDD[Row], schema)
  }

  /** Monotone-in-id quantile bucket assignment — [[Packing.quantileBuckets]]
    * on the id column (one shared implementation for every quantile-bucketed
    * operator). Global (not per-source) cuts keep the pass one
    * approxQuantile job; within any source the assignment is still
    * monotone in id, which is all the two-phase cumsum needs.
    */
  private def assignBuckets(base: DataFrame, buckets: Int): DataFrame =
    Packing.quantileBuckets(base, "id", buckets)

  private def emptySample(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("n_toks", LongType), StructField("cum_toks", LongType),
      StructField("budget_toks", LongType)))
    docs.sparkSession.createDataFrame(
      docs.sparkSession.sparkContext.emptyRDD[Row], schema)
  }
}
