package graft

import graft.operators.Eval

/** The average-rank Spearman census (2×-scaled ranks + Σ(c³−c) tie
  * terms) against a driver-side brute-force reference on adversarial
  * tie shapes, plus the tie-free reduction to spearmanPerGroup's
  * id-tie-broken census (d2x4_sum = 4·d2_sum when no values repeat).
  */
class SpearmanAvgRankSpec extends SparkSpec {
  import spark.implicits._

  // brute force: textbook 2× average 1-based rank per value, then the
  // (n, 4Σd², Σ(c³−c)x, Σ(c³−c)y) census per group
  private def ref(rows: Seq[(String, Long, Long, Long)])
      : Map[String, (Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (g, xs) =>
      def rank2x(vals: Seq[Long]): Map[Long, Long] = {
        val sorted = vals.sorted
        vals.distinct.map { v =>
          val lo = sorted.indexWhere(_ == v) + 1L // first 1-based rank
          val c = sorted.count(_ == v).toLong
          v -> (2L * lo + c - 1L) // 2·avg of ranks lo..lo+c−1
        }.toMap
      }
      def tie(vals: Seq[Long]): Long = vals.groupBy(identity).values
        .map { run => val c = run.size.toLong; c * c * c - c }.sum
      val (rx, ry) = (rank2x(xs.map(_._3)), rank2x(xs.map(_._4)))
      val d2 = xs.map { r => val d = rx(r._3) - ry(r._4); d * d }.sum
      g -> (xs.size.toLong, d2, tie(xs.map(_._3)), tie(xs.map(_._4)))
    }

  private def run(rows: Seq[(String, Long, Long, Long)], buckets: Int = 4)
      : Map[String, (Long, Long, Long, Long)] =
    Eval.spearmanAvgRankPerGroup(rows.toDF("g", "id", "x", "y"),
        "id", "g", "x", "y", buckets)
      .as[(String, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("adversarial tie shapes match brute force") {
    val cases = Seq(
      // perfect agreement (d2 = 0), perfect reversal
      (1 to 7).map(i => ("asc", i.toLong, i.toLong, i.toLong)),
      (1 to 7).map(i => ("dsc", i.toLong, i.toLong, 8L - i)),
      // all rows identical: every rank is the same average
      (1 to 5).map(i => ("eq", i.toLong, 3L, 9L)),
      // x constant (one n-sized tie run), y constant
      (1 to 6).map(i => ("cx", i.toLong, 5L, i.toLong % 3)),
      (1 to 6).map(i => ("cy", i.toLong, i.toLong % 4, 2L)),
      // mixed duplicates on both axes, odd group size
      Seq(("mx", 1L, 1L, 2L), ("mx", 2L, 1L, 2L), ("mx", 3L, 2L, 1L),
        ("mx", 4L, 2L, 3L), ("mx", 5L, 3L, 1L), ("mx", 6L, 3L, 3L),
        ("mx", 7L, 1L, 1L), ("mx", 8L, 2L, 2L), ("mx", 9L, 3L, 2L)),
      // singleton group (avg rank 1, d2 = 0, no ties)
      Seq(("one", 1L, 7L, 7L)))
    val all = cases.flatten
    assert(run(all) === ref(all))
  }

  test("pseudo-random heavy-tie groups match brute force") {
    // deterministic LCG; values mod 5/3 force long tie runs that span
    // rank-bucket boundaries
    var seed = 54321L
    def next(): Long = { seed = (seed * 1103515245L + 12345L) & 0x7fffffffL; seed }
    val rows = (1 to 4).flatMap { gi =>
      val n = (next() % 35 + 1).toInt
      (1 to n).map(i => (s"g$gi", i.toLong, next() % 5, next() % 3))
    }
    assert(run(rows, buckets = 3) === ref(rows))
  }

  test("tie-free input reduces to 4× the id-tie-broken census") {
    // distinct values per axis per group (a permutation of 1..n)
    val rows = (1 to 3).flatMap { gi =>
      val n = 17
      val ys = new scala.util.Random(gi * 99L).shuffle((1 to n).toVector)
      (1 to n).map(i => (s"g$gi", i.toLong, i.toLong, ys(i - 1).toLong))
    }
    val avg = run(rows)
    val idb = Eval.spearmanPerGroup(rows.toDF("g", "id", "x", "y"),
        "id", "g", "x", "y", 4)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    for ((g, (n, d2x4, tx, ty)) <- avg) {
      assert(tx === 0L && ty === 0L, g)
      assert(d2x4 === 4L * idb(g), g)
      assert(n === 17L)
    }
  }

  test("perfect agreement and reversal hit the closed forms") {
    val n = 9L
    val asc = (1 to 9).map(i => ("a", i.toLong, i.toLong, i.toLong))
    val dsc = (1 to 9).map(i => ("d", i.toLong, i.toLong, 10L - i))
    val out = run(asc ++ dsc)
    assert(out("a") === ((n, 0L, 0L, 0L)))
    // reversal: Σd² = n(n²−1)/3 ⇒ d2x4 = 4n(n²−1)/3
    assert(out("d") === ((n, 4L * n * (n * n - 1) / 3, 0L, 0L)))
  }
}
