package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-level collocation mining: rank adjacent token pairs by pointwise
  * mutual information — the word2phrase / tokenizer-seeding step that
  * decides which bigrams ("new york", "machine learning") deserve a single
  * vocabulary slot before BPE or n-gram LM training runs. Complements the
  * per-document bigram operators (q106 rarity, q131 fluency): those score
  * DOCUMENTS against corpus statistics, this publishes the corpus-level
  * phrase table itself.
  *
  * PMI(a,b) = log p(ab) / (p(a)·p(b)) ranks pairs that co-occur far above
  * chance; the `log` is monotone, so ranking by the RATIO is ranking by
  * PMI — and the ratio stays portable where `ln` rounding is not. The
  * reported score is the ratio in fixed left-to-right IEEE order, floored
  * at 4 decimal digits:
  * `floor(((cab·Nu)/(ca·cb)) · (Nu/Nb) · 10000)` — every product of exact
  * longs stays below 2⁵³ (cab·Nu and ca·cb are ≤ vocab-mass² ≪ 2⁵³ for
  * any corpus whose counts fit the sketch regime), every division is a
  * single correctly-rounded IEEE op, so any engine replaying the same
  * expression order reproduces the score bit-for-bit.
  *
  * Scale posture: one token-keyed shuffle for unigram counts, one
  * (w1,w2)-keyed shuffle for bigram counts — both with map-side partial
  * combine, both vocab-sized after aggregation. The min-support filter
  * runs BEFORE the unigram-count joins, so the joined frame is the
  * surviving-phrase table, not the bigram long tail; the two count joins
  * are vocab-keyed (AQE broadcasts the unigram side when it fits). The
  * global top-k is TakeOrdered — per-partition heaps, k rows to the
  * driver, never a full sort.
  */
object Collocations {

  /** Top-`k` adjacent-pair collocations with corpus count ≥ `minCount`.
    * Output: (w1, w2, cab, ca, cb, pmi_scaled), ordered by pmi_scaled
    * desc then (w1, w2) — a total, re-run-stable order.
    */
  def pmiPhrases(docs: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, "need positive support and k")
    val toks = docs.select(TextFns.tokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val uniTot = uni.agg(sum("c").as("nu"))
    val bc = toks.filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
    val bigTot = bc.agg(sum("cab").as("nb"))
    val ratio = (col("cab").cast("double") * col("nu").cast("double")) /
      (col("ca").cast("double") * col("cb").cast("double"))
    val scale = col("nu").cast("double") / col("nb").cast("double")
    bc.filter(col("cab") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("ca")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("cb")), "w2")
      .crossJoin(broadcast(uniTot)).crossJoin(broadcast(bigTot))
      .withColumn("pmi_scaled",
        floor(ratio * scale * lit(10000.0)).cast("long"))
      .orderBy(col("pmi_scaled").desc, col("w1"), col("w2"))
      .limit(k)
      .select("w1", "w2", "cab", "ca", "cb", "pmi_scaled")
  }
}
