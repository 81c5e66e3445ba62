package graft

import graft.operators.Concordance

/** The O(n log n) Kendall census (merge-count inversions + value-grain tie
  * aggregates) against a driver-side brute-force all-pairs reference on
  * adversarial tie shapes, and against q286's all-pairs query on the real
  * sf0.001 corpus.
  */
class KendallSpec extends SparkSpec {
  import spark.implicits._

  // brute force: classify every pair of a group
  private def ref(rows: Seq[(String, Long, Long, Long)])
      : Map[String, (Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (g, xs) =>
      var nc, nd, tx, ty, txy = 0L
      for (i <- xs.indices; j <- xs.indices if i < j) {
        val (a, b) = (xs(i), xs(j))
        val p = (a._3 - b._3) * (a._4 - b._4)
        if (a._3 == b._3 && a._4 == b._4) txy += 1
        else if (a._3 == b._3) tx += 1
        else if (a._4 == b._4) ty += 1
        else if (p > 0) nc += 1
        else nd += 1
      }
      val n = xs.size.toLong
      g -> (n * (n - 1) / 2, nc, nd, tx, ty, txy)
    }

  private def run(rows: Seq[(String, Long, Long, Long)], buckets: Int = 4)
      : Map[String, (Long, Long, Long, Long, Long, Long)] =
    Concordance.kendallCensus(rows.toDF("g", "id", "x", "y"),
        "g", "id", "x", "y", buckets)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap

  test("adversarial tie shapes match brute force") {
    val cases = Seq(
      // pure ascending (all concordant), pure descending (all discordant)
      (1 to 7).map(i => ("asc", i.toLong, i.toLong, i.toLong)),
      (1 to 7).map(i => ("dsc", i.toLong, i.toLong, 8L - i)),
      // all rows identical (every pair tied-both)
      (1 to 5).map(i => ("eq", i.toLong, 3L, 9L)),
      // x constant (every pair tied-x), y constant (tied-y)
      (1 to 6).map(i => ("cx", i.toLong, 5L, i.toLong % 3)),
      (1 to 6).map(i => ("cy", i.toLong, i.toLong % 4, 2L)),
      // mixed duplicates across both axes, non-power-of-two sizes
      Seq(("mx", 1L, 1L, 2L), ("mx", 2L, 1L, 2L), ("mx", 3L, 2L, 1L),
        ("mx", 4L, 2L, 3L), ("mx", 5L, 3L, 1L), ("mx", 6L, 3L, 3L),
        ("mx", 7L, 1L, 1L), ("mx", 8L, 2L, 2L), ("mx", 9L, 3L, 2L)),
      // singleton group (no pairs at all)
      Seq(("one", 1L, 7L, 7L)))
    val all = cases.flatten
    assert(run(all) === ref(all))
  }

  test("pseudo-random group sizes incl. non-powers-of-two match brute force") {
    // deterministic LCG so the case replays; sizes 1..40 exercise blocks
    // that end mid-level at every merge depth
    var seed = 12345L
    def next(): Long = { seed = (seed * 1103515245L + 12345L) & 0x7fffffffL; seed }
    val rows = (1 to 4).flatMap { gi =>
      val n = (next() % 40 + 1).toInt
      (1 to n).map(i => (s"g$gi", i.toLong, next() % 9, next() % 7))
    }
    assert(run(rows, buckets = 3) === ref(rows))
  }

  test("packing-contract violations fail loudly, not wrongly (ADVICE r19)") {
    // y at 2^22 would silently mis-order the x*2^22+y sort key — the
    // runtime bound check (piggybacked on the maxN aggregate) must throw
    val badY = Seq(("g", 1L, 1L, 1L << 22), ("g", 2L, 2L, 5L))
    val eY = intercept[IllegalArgumentException] { run(badY) }
    assert(eY.getMessage.contains("packing contract"))
    val negY = Seq(("g", 1L, 1L, -1L), ("g", 2L, 2L, 5L))
    assert(intercept[IllegalArgumentException] { run(negY) }
      .getMessage.contains("packing contract"))
    val badX = Seq(("g", 1L, 1L << 30, 1L), ("g", 2L, 2L, 5L))
    assert(intercept[IllegalArgumentException] { run(badX) }
      .getMessage.contains("packing contract"))
    // boundary values INSIDE the contract still work
    val ok = Seq(("g", 1L, (1L << 30) - 1, (1L << 22) - 1),
      ("g", 2L, -(1L << 30) + 1, 0L), ("g", 3L, 0L, 7L))
    assert(run(ok) === ref(ok))
  }

  test("q297 O(n log n) ≡ q286 all-pairs on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val fast = SparkEntry.queries("q297_kendall_tau_nlogn")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val slow = SparkEntry.queries("q286_kendall_tau")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fast === slow)
  }
}
