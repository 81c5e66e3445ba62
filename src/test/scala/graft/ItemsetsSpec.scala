package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Itemsets

/** Properties of the FP-Growth-style frequent-pair miner on arbitrary
  * basket tables: exact equivalence to the brute-force pair count at the
  * same support floor (the anti-monotone prune must change no surviving
  * count — FP-Growth's correctness theorem, checked at data), plus the
  * support-monotonicity laws every itemset miner owes.
  */
class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, trials: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // small basket-id and item alphabets force dense baskets and heavy
  // support ties — the regime where an off-by-one in the integer floor
  // predicate or a dropped duplicate shows up
  private val genBaskets: Gen[List[(Int, String)]] = for {
    n <- Gen.choose(1, 80)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 9), Gen.oneOf("u", "w", "x", "y", "z")))
  } yield rows

  private def brute(rows: List[(Int, String)], num: Long, den: Long)
      : Set[(String, String, Long, Long, Long, Long)] = {
    val baskets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val sup = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    baskets.values.toList
      .flatMap(b => for (a <- b; c <- b if a < c) yield (a, c))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .collect { case ((a, b), sab) if sab * den >= num * n =>
        (a, b, sab, sup(a), sup(b), n)
      }.toSet
  }

  test("frequentPairs == brute-force pair count at the same floor (prune changes nothing)") {
    check("fpEquiv", Prop.forAll(genBaskets,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(4L, 10L))) {
      case (rows, (num, den)) =>
        val got = Itemsets.frequentPairs(rows.toDF("bid", "it"),
            Seq("bid"), "it", num, den)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSet
        got == brute(rows, num, den)
    })
  }

  test("support monotonicity: s_ab <= min(s_a, s_b) <= n, and pairs are canonical") {
    check("fpMono", Prop.forAll(genBaskets) { rows =>
      val got = Itemsets.frequentPairs(rows.toDF("bid", "it"),
          Seq("bid"), "it", 0L, 1L)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      got.forall { case (a, b, sab, sa, sb, n) =>
        a < b && sab >= 1 && sab <= math.min(sa, sb) &&
          math.max(sa, sb) <= n
      }
    })
  }

  private def bruteTriples(rows: List[(Int, String)], num: Long, den: Long)
      : Set[(String, String, String, Long, Long)] = {
    val baskets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    baskets.values.toList
      .flatMap(bk => for (a <- bk; b <- bk if a < b; c <- bk if b < c)
        yield (a, b, c))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .collect { case ((a, b, c), s) if s * den >= num * n =>
        (a, b, c, s, n)
      }.toSet
  }

  test("frequentTriples == brute-force 3-way count at the same floor (Apriori candidates drop nothing)") {
    check("fp3Equiv", Prop.forAll(genBaskets,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(4L, 10L))) {
      case (rows, (num, den)) =>
        val got = Itemsets.frequentTriples(rows.toDF("bid", "it"),
            Seq("bid"), "it", num, den)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getLong(3), r.getLong(4))).toSet
        got == bruteTriples(rows, num, den)
    }, trials = 8)
  }

  test("triple support never exceeds any member pair's support") {
    check("fp3Mono", Prop.forAll(genBaskets) { rows =>
      val pairs = Itemsets.frequentPairs(rows.toDF("bid", "it"),
          Seq("bid"), "it", 0L, 1L)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val triples = Itemsets.frequentTriples(rows.toDF("bid", "it"),
          Seq("bid"), "it", 0L, 1L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3)))
      triples.forall { case (a, b, c, s) =>
        s <= pairs((a, b)) && s <= pairs((a, c)) && s <= pairs((b, c))
      }
    }, trials = 6)
  }

  test("duplicate item instances inside one basket count once") {
    val rows = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y"),
      (2, "y"))
    val got = Itemsets.frequentPairs(rows.toDF("bid", "it"),
        Seq("bid"), "it", 1L, 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSet === Set(("x", "y", 2L, 2L, 2L, 2L)))
  }
}
