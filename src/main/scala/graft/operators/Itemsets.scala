package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over basket/item tables — the scale path the
  * exhaustive pair count (q190) documents for itself: at a 5-type event
  * vocabulary every pair fits, but a real token/product vocabulary is
  * Zipf-tailed and the basket self-join pays for every item instance,
  * frequent or not. [[frequentPairs]] is the 2-itemset specialization of
  * FP-Growth's conditional-base construction (Han et al., SIGMOD 2000),
  * restated relationally the way PFP ("parallel FP-Growth", Li et al.,
  * RecSys 2008) shards it.
  */
object Itemsets {

  /** Frequent canonical pairs (`a` < `b`) at relative support ≥
    * `minSupNum`/`minSupDen` (an exact integer predicate — `s·den ≥
    * num·n` — never a float threshold), over raw (`basketCols`…,
    * `itemCol`) rows. Stages:
    *
    *   1. FREQUENT ITEMS: one basket-item distinct + count; items below
    *      the support floor are discarded before any pair exists — the
    *      anti-monotone prune that is FP-Growth's whole point: a pair
    *      cannot reach the floor unless both members do, so the Zipf
    *      tail (most of a real vocabulary) never enters the self-join.
    *      The surviving item set is bounded by construction — at
    *      fraction f, at most 1/f·(mean basket size) items can clear
    *      f·n baskets — so it broadcasts.
    *   2. CONDITIONAL BASES: each pruned basket pairs its items under
    *      the a < b canonical order — pair (a, b) is counted inside the
    *      conditional base of its smaller member, and the count shuffle
    *      hash-partitions those bases across executors (the PFP
    *      sharding). Self-join blowup is (frequent items per basket)²,
    *      not (items per basket)².
    *   3. PAIR FLOOR: candidates below the same support floor drop;
    *      survivors carry (s_ab, s_a, s_b, n_baskets) so confidence =
    *      s_ab/s_a and lift = s_ab·n/(s_a·s_b) are one consumer
    *      division each.
    *
    * Equivalence contract (the property SamplingSpec-style specs pin and
    * q190 oracles exactly): the item prune changes NO surviving pair's
    * count — s_a ≥ s_ab ≥ floor means both members of any frequent pair
    * are themselves frequent, so counting inside pruned baskets equals
    * counting inside raw baskets for every emitted row.
    *
    * Output: (a, b, s_ab, s_a, s_b, n_baskets), one row per frequent
    * pair, unordered (callers order).
    */
  def frequentPairs(items: DataFrame, basketCols: Seq[String],
      itemCol: String, minSupNum: Long, minSupDen: Long): DataFrame = {
    require(minSupNum >= 0 && minSupDen > 0,
      "relative support is a nonnegative fraction num/den with den > 0")
    val bk = basketCols.map(col)
    // STAGED (the budgetSelect contract): the operator reads `base` four
    // times (basket count, item supports, both self-join sides), and
    // callers routinely pass computed basket/item frames (q194's
    // sessionization window) — one cut = one derivation, total
    val base = Checkpoints.cut(
      items.select((bk :+ col(itemCol).as("it")): _*).distinct())
    val n = base.select(bk: _*).distinct().agg(count(lit(1)).as("n_baskets"))
    val sup = base.groupBy("it").agg(count(lit(1)).as("s"))
    val freq = sup.crossJoin(broadcast(n))
      .filter(col("s") * lit(minSupDen) >= lit(minSupNum) * col("n_baskets"))
    val pruned = base.join(broadcast(freq.select("it")), "it")
    val joinCond = basketCols
      .map(k => col(s"x.$k") === col(s"y.$k"))
      .reduce(_ && _) && col("x.it") < col("y.it")
    val out = pruned.as("x").join(pruned.as("y"), joinCond)
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("s_ab"))
      .join(broadcast(freq.select(col("it").as("a"), col("s").as("s_a"))), "a")
      .join(broadcast(freq.select(col("it").as("b"), col("s").as("s_b"))), "b")
      .crossJoin(broadcast(n))
      .filter(col("s_ab") * lit(minSupDen) >= lit(minSupNum) * col("n_baskets"))
      .select(col("a"), col("b"), col("s_ab"), col("s_a"), col("s_b"),
        col("n_baskets"))
    Checkpoints.sealAndRelease(out, base)
  }

  /** Frequent canonical triples (`a` < `b` < `c`) at relative support ≥
    * `minSupNum`/`minSupDen` — the depth-3 rung of the same
    * anti-monotone ladder as [[frequentPairs]], built Apriori-style so
    * no stage ever touches more than the previous rung justifies:
    *
    *   1. L1/L2: frequent items prune the baskets, then the pair count
    *      over pruned baskets yields the frequent-PAIR table L2 (both
    *      exactly as [[frequentPairs]], on one shared staged cut).
    *   2. C3 CANDIDATES: (a,b,c) is a candidate iff (a,b), (a,c) AND
    *      (b,c) are all in L2 — the classic candidate-generation join of
    *      L2 with itself on the shared prefix plus the third-pair
    *      verification. L2 is floor-bounded, so C3 is tiny and
    *      broadcasts.
    *   3. COUNT: the 3-way basket self-join is restricted to candidate
    *      (a,b) prefixes BEFORE the third leg joins, and to full
    *      candidates before the floor — the Zipf tail never reaches the
    *      widest join.
    *
    * Equivalence contract (spec-pinned): anti-monotonicity means the
    * candidate restriction drops NO triple that meets the floor, so the
    * result equals the brute-force 3-way count filtered at the end.
    *
    * Output: (a, b, c, s_abc, n_baskets), unordered.
    */
  def frequentTriples(items: DataFrame, basketCols: Seq[String],
      itemCol: String, minSupNum: Long, minSupDen: Long): DataFrame = {
    require(minSupNum >= 0 && minSupDen > 0,
      "relative support is a nonnegative fraction num/den with den > 0")
    val bk = basketCols.map(col)
    val base = Checkpoints.cut(
      items.select((bk :+ col(itemCol).as("it")): _*).distinct())
    val n = base.select(bk: _*).distinct().agg(count(lit(1)).as("n_baskets"))
    val floor = (c: org.apache.spark.sql.Column) =>
      c * lit(minSupDen) >= lit(minSupNum) * col("n_baskets")
    val sup = base.groupBy("it").agg(count(lit(1)).as("s"))
    val freq = sup.crossJoin(broadcast(n)).filter(floor(col("s")))
    val pruned = base.join(broadcast(freq.select("it")), "it")
    def basketEq(l: String, r: String) = basketCols
      .map(k => col(s"$l.$k") === col(s"$r.$k")).reduce(_ && _)
    // r21: the per-basket pair frame feeds BOTH the L2 support counts and
    // the candidate-triple attachment — build the basket self-join ONCE
    // and cut it (baskets × (items-per-basket choose 2) rows, small by
    // the same bound as the join volume) instead of running the heaviest
    // join twice (guide §2.4: duplicated subtrees)
    val pairs = Checkpoints.cut(pruned.as("x")
      .join(pruned.as("y"), basketEq("x", "y") && col("x.it") < col("y.it"))
      .select((basketCols.map(k => col(s"x.$k")) :+
        col("x.it").as("a") :+ col("y.it").as("b")): _*))
    val l2 = pairs
      .groupBy("a", "b").agg(count(lit(1)).as("s_ab"))
      .crossJoin(broadcast(n)).filter(floor(col("s_ab")))
      .select("a", "b")
    val c3 = l2.as("p").join(l2.as("q"),
        col("p.a") === col("q.a") && col("p.b") < col("q.b"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("q.b").as("c"))
      .join(l2.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    val xy = pairs
      .join(broadcast(c3.select("a", "b").distinct()), Seq("a", "b"))
    val out = xy.as("p").join(pruned.as("z"),
        basketEq("p", "z") && col("p.b") < col("z.it"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"),
        col("z.it").as("c"))
      .agg(count(lit(1)).as("s_abc"))
      .join(broadcast(c3), Seq("a", "b", "c"))
      .crossJoin(broadcast(n))
      .filter(floor(col("s_abc")))
      .select(col("a"), col("b"), col("c"), col("s_abc"), col("n_baskets"))
    Checkpoints.sealAndRelease(out, base, pairs)
  }
}
