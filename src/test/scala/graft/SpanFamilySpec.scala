package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The span-dedup family's precision ladder: q313's binary bracket
  * (longestSharedSpanLevel) vs q316's exact diagonal run-length
  * (exactLongestSharedSpan) — the exact operator against a brute-force
  * token-LCS on adversarial planted pairs, and the bracket law
  * (bracket = max{n ∈ levels : n ≤ exact}) on the real corpus.
  */
class SpanFamilySpec extends SparkSpec {
  import spark.implicits._

  // brute force: longest common contiguous token run, O(n·m) DP
  private def lcsTokens(a: Seq[String], b: Seq[String]): Long = {
    var best = 0
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best.toLong
  }

  private def toks(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("exact span matches brute-force token LCS on adversarial pairs") {
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta", // identical
      3L -> "zero alpha beta gamma nine eight seven six",    // 3-run
      4L -> "theta eta zeta epsilon delta gamma beta alpha", // reversed: runs of 1
      5L -> "unrelated words entirely different tokens here now", // span 0 vs 1
      6L -> "the a the a the a the b",                       // repeated stopwords
      7L -> "a the a the b the a the")                       // vs shifted copies
    val docs = texts.toDF("doc_id", "text")
    val cand = (for {
      (i, _) <- texts; (j, _) <- texts if i < j
    } yield (i, j)).toDF("id_a", "id_b")
    val got = Dedup.exactLongestSharedSpan(docs, "doc_id", "text", cand)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val byId = texts.toMap
    for (((a, b), len) <- got)
      assert(len === lcsTokens(toks(byId(a)), toks(byId(b))),
        s"pair ($a,$b)")
    assert(got((1L, 2L)) === 8L, "identical docs share their full length")
    assert(got((4L, 5L)) === 0L, "no common token at all")
    // duplicated candidate rows must not duplicate output rows
    val dup = cand.union(cand)
    assert(Dedup.exactLongestSharedSpan(docs, "doc_id", "text", dup)
      .count() === cand.count())
    assert(Dedup.longestSharedSpanLevel(docs, "doc_id", "text", dup)
      .count() === cand.count())
  }

  test("bracket law on the real corpus: q313 = max level <= q316") {
    val dir = "/root/testdata/sf0.001"
    val bracket = SparkEntry.queries("q313_longest_shared_span")(spark, dir)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val exact = SparkEntry.queries("q316_exact_longest_span")(spark, dir)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(bracket.keySet === exact.keySet, "same candidate pairs")
    val levels = Seq(8, 16, 32, 64)
    for ((pair, l) <- exact) {
      val want = levels.filter(_ <= l).lastOption.getOrElse(0)
      assert(bracket(pair) === want,
        s"$pair: exact=$l bracket=${bracket(pair)} want=$want")
    }
    // the corpus plants spans in several brackets — the law is not
    // vacuously tested on one level
    assert(exact.values.toSet.size >= 3)
  }
}
