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
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"),
      size(TextFns.tokens(col(textCol))).cast("long").as("n_toks"))
    if (base.head(1).isEmpty) return emptySample(docs)

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
    bucketed.join(broadcast(offsets), Seq("grp", "b"))
      .withColumn("cum_toks", sum(col("n_toks")).over(
        Window.partitionBy("grp", "b").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, 0)) + col("off"))
      .join(broadcast(budgets), "grp")
      .filter(col("cum_toks") <= col("budget_toks"))
      .select("id", "grp", "n_toks", "cum_toks", "budget_toks")
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
