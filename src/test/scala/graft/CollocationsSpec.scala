package graft

import graft.operators.Collocations

/** PMI collocation invariants: hand-computed score on a minimal corpus
  * (fixed IEEE op order), min-support gating (the reason PMI alone is not
  * a phrase detector — hapax pairs score arbitrarily high), and total
  * ordering of the output.
  */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmi_scaled is the hand-computed fixed-order ratio, floored at 1e4") {
    // unigrams a:4 b:3 c:1 (Nu=8); bigrams (a,b)x2 (a,c) (b,a) (Nb=4).
    // minCount 2 keeps only (a,b): ((2*8)/(4*3)) * (8/4) * 10000
    // = 1.3333333333333333 * 2 * 10000 -> floor 26666
    val docs = Seq("a b", "a b", "a c", "b a").toDF("text")
    val out = Collocations.pmiPhrases(docs, "text", minCount = 2L, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", "b", 2L, 4L, 3L, 26666L)))
  }

  test("min-support keeps the repeated phrase, drops hapax pairs") {
    // "san francisco" adjacent in every doc; fillers are one-off pairs
    // whose PMI would be HIGHER (perfect rare collocations) — exactly
    // what minCount is for.
    val docs = (0 until 5)
      .map(i => s"san francisco w$i x$i").toDF("text")
    val strict = Collocations.pmiPhrases(docs, "text", minCount = 2L, k = 10)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(strict === Seq(("san", "francisco")))
    val loose = Collocations.pmiPhrases(docs, "text", minCount = 1L, k = 100)
    assert(loose.count() > 1, "hapax pairs appear without the support gate")
  }

  test("output order is total: pmi desc, then (w1, w2); case-folded tokens") {
    // two equally-scored pairs (symmetric construction) tie-break on w1
    val docs = Seq("P Q", "p q", "R S", "r s").toDF("text")
    val out = Collocations.pmiPhrases(docs, "text", minCount = 2L, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(t => (t._1, t._2)) === Seq(("p", "q"), ("r", "s")),
      "equal scores must order by (w1, w2); tokens are lowercased")
    assert(out.map(_._6).distinct.size === 1)
    // empty corpus -> empty table, no failure
    assert(Collocations.pmiPhrases(
      Seq.empty[String].toDF("text"), "text", 2L, 10).isEmpty)
  }
}
