package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Intervals

/** The bucket-decomposed interval-overlap join vs the naive non-equi
  * definition — the two-sided q219 proof obligation: the decomposition
  * must change NOTHING on arbitrary interval sets, across bucket widths,
  * including the edge cases a grid loves to break (touching endpoints,
  * nesting, bucket-boundary straddles, same-group exclusion).
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Long)],
      w: Long): Set[(String, Long, String, Long, Long)] =
    Intervals.overlapPairsAcrossGroups(
        rows.toDF("g", "id", "s", "e"), "g", "id", "s", "e", w)
      .as[(String, Long, String, Long, Long)].collect().toSet

  private def naive(rows: Seq[(String, Long, Long, Long)])
      : Set[(String, Long, String, Long, Long)] =
    (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._3 <= b._4 && b._3 <= a._4 &&
        a._3 <= a._4 && b._3 <= b._4
    } yield (a._1, a._2, b._1, b._2,
      math.min(a._4, b._4) - math.max(a._3, b._3))).toSet

  test("hand-picked edges: touching endpoints, nesting, straddles, same-group exclusion") {
    val rows = Seq(
      ("u1", 1L, 100L, 200L),
      ("u2", 2L, 200L, 300L),   // touches 1 exactly → overlap 0
      ("u2", 3L, 120L, 130L),   // nested inside 1
      ("u1", 4L, 125L, 135L),   // same group as 1 — never pairs with it
      ("u3", 5L, 290L, 410L),   // straddles a 100-wide bucket boundary
      ("u3", 6L, 500L, 600L))   // disjoint from everything
    val want = naive(rows)
    assert(run(rows, 100L) === want)
    assert(want.contains(("u1", 1L, "u2", 2L, 0L)), "touching counts, overlap 0")
    assert(want.contains(("u1", 1L, "u2", 3L, 10L)), "nested pair overlaps its own length")
    assert(!want.exists(p => p._1 == p._3), "no same-group pairs")
  }

  test("decomposition == naive non-equi join on arbitrary intervals, across bucket widths") {
    val gen: Gen[List[(String, Long, Long, Long)]] = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c", "d")
        s <- Gen.choose(0L, 400L)
        len <- Gen.choose(0L, 150L)
      } yield (g, 0L, s, s + len))
    } yield rows.zipWithIndex.map { case ((g, _, s, e), i) => (g, i.toLong, s, e) }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(gen) { rows =>
        val want = naive(rows)
        Seq(1L, 37L, 100L, 1000L).forall(w => run(rows, w) == want)
      })
    assert(res.passed, s"intervals property failed: ${res.status}")
  }

  test("inverted and null-bounded intervals are dropped at the door") {
    val rows = Seq(("a", 1L, 200L, 100L), ("b", 2L, 50L, 300L))
    assert(run(rows, 100L) === Set.empty)
  }
}
