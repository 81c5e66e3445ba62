package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Sampling

/** Priority-sampling semantics (Duffield–Lund–Thorup JACM 2007): the
  * selected set is exactly the local-math top-k, the estimator is
  * max(w, τ), the exhaustive case degrades to the identity estimator, and
  * Σ est_weight is an unbiased estimate of Σ w across salts.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // the operator's pseudo-uniform: first 8 md5 hex chars as a long, + 1
  private def u(salt: String, id: Long): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5")
        .digest(s"$salt:$id".getBytes(StandardCharsets.UTF_8))
        .take(4).map(b => f"$b%02x").mkString, 16) + 1L

  private val corpus = (1L to 100L).map(i => (i, 10L + (i % 7) * 3L))
  private val df = corpus.toDF("id", "w").repartition(4)

  test("sample is the exact top-k by w/u priority with the max(w, tau) estimator") {
    val k = 10
    val out = Sampling.prioritySample(df, "id", "w", k)
      .select("id", "weight", "priority", "est_weight")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)

    val pri = corpus.map { case (id, w) =>
      (id, w, (w * 4294967296L).toDouble / u("prio", id).toDouble) }
    val ranked = pri.sortBy { case (id, _, p) => (-p, id) }
    val expectIds = ranked.take(k).map(_._1).toSet
    val tau = ranked(k)._3
    assert(out.map(_._1).toSet === expectIds)
    out.foreach { case (id, w, p, est) =>
      val exp = pri.find(_._1 == id).get
      assert(w === exp._2 && p === exp._3, s"priority mismatch for $id")
      assert(est === math.max(w.toDouble, tau), s"estimator mismatch for $id")
    }
  }

  test("k >= corpus size is exhaustive: tau = 0, est_weight = weight") {
    val out = Sampling.prioritySample(df, "id", "w", 500)
      .select("id", "weight", "est_weight")
      .as[(Long, Long, Double)].collect()
    assert(out.length === corpus.size)
    out.foreach { case (_, w, est) => assert(est === w.toDouble) }
  }

  test("sum of est_weight is an unbiased estimate of total weight across salts") {
    val total = corpus.map(_._2).sum.toDouble
    // local replica over many salts — the estimator math is engine-identical
    // (asserted above), so unbiasedness can be checked without 50 Spark jobs
    val k = 10
    val means = (1 to 200).map { s =>
      val pri = corpus.map { case (id, w) =>
        (id, w, (w * 4294967296L).toDouble / u(s"salt$s", id).toDouble) }
      val ranked = pri.sortBy { case (id, _, p) => (-p, id) }
      val tau = ranked(k)._3
      ranked.take(k).map { case (_, w, _) => math.max(w.toDouble, tau) }.sum
    }
    val mean = means.sum / means.size
    assert(math.abs(mean - total) / total < 0.1,
      s"estimator biased: mean $mean vs true $total")
    // and one real Spark run with a non-default salt agrees with the replica
    val sparkSum = Sampling.prioritySample(df, "id", "w", k, salt = "salt7")
      .agg(sum("est_weight")).as[Double].head()
    assert(math.abs(sparkSum - means(6)) < 1e-9)
  }

  test("weight skew does not break selection: a giant weight is always sampled") {
    val skew = (corpus :+ (999L, 1000000L)).toDF("id", "w")
    val out = Sampling.prioritySample(skew, "id", "w", 5)
      .select("id").as[Long].collect().toSet
    // priority = w/u with u <= 2^32: giant w's priority floor (1e6/2^32)
    // can in principle lose, but only if every other doc draws a tiny u;
    // with this fixed salt it is deterministically in
    assert(out.contains(999L))
  }

  test("grouped two-phase rank: per-group gate equals the single-window reference") {
    // three sources, one HEAVILY skewed (80 of 100 rows) — the shape a
    // per-source window partition would serialize; scores collide across
    // and within groups to exercise the (score, id) tiebreak
    val rows = (1L to 80L).map(i => (i, "web", (i % 9) * 10L)) ++
      (81L to 92L).map(i => (i, "code", (i % 5) * 7L)) ++
      (93L to 100L).map(i => (i, "forum", (i % 3) * 11L))
    val docs = rows.toDF("doc_id", "source", "n_chars").repartition(5)
    val out = Sampling.topFractionPerGroup(docs, "doc_id", "source", "n_chars", 500)
      .select("id", "grp", "gpos", "gn", "kept")
      .as[(Long, String, Long, Long, Boolean)].collect()
    // reference: plain per-group sort in memory
    val ref = rows.groupBy(_._2).flatMap { case (g, xs) =>
      val sorted = xs.sortBy(t => (t._3, t._1))
      sorted.zipWithIndex.map { case ((id, _, _), p) =>
        (id, g, p.toLong, xs.size.toLong,
          (xs.size - p) * 1000 <= 500 * xs.size)
      }
    }.toSet
    assert(out.toSet === ref)
    // keep counts are exactly floor(gn/2) per group
    val keptBy = out.filter(_._5).groupBy(_._2).map { case (g, xs) => g -> xs.length }
    assert(keptBy === Map("web" -> 40, "code" -> 6, "forum" -> 4))
    // and the kept rows are the top scores of their group
    out.groupBy(_._2).foreach { case (_, xs) =>
      val keptMin = xs.filter(_._5).map(_._3).min
      val dropMax = xs.filterNot(_._5).map(_._3).max
      assert(dropMax < keptMin, "every kept rank must exceed every dropped rank")
    }
  }

  test("per-group gate on empty input returns an empty frame with the schema") {
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_chars")
    val out = Sampling.topFractionPerGroup(empty, "doc_id", "source", "n_chars", 500)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("id", "grp", "score", "gpos", "gn", "kept"))
  }

  // --- stratified (per-group) priority sampling ---

  private val strata = (1L to 90L).map(i =>
    (i, s"src${i % 3}", 10L + (i % 7) * 3L))
  private val sdf = strata.toDF("id", "grp", "w").repartition(4)

  test("per-group sample is each stratum's exact top-k with its own tau") {
    val k = 10
    val out = Sampling.prioritySamplePerGroup(sdf, "id", "grp", "w", k)
      .select("grp", "id", "weight", "priority", "est_weight")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.groupBy(_._1).forall(_._2.length == k))
    strata.groupBy(_._2).foreach { case (g, xs) =>
      val pri = xs.map { case (id, _, w) =>
        (id, w, (w * 4294967296L).toDouble / u("prio", id).toDouble) }
      val ranked = pri.sortBy { case (id, _, p) => (-p, id) }
      val tau = ranked(k)._3
      val got = out.filter(_._1 == g)
      assert(got.map(_._2).toSet === ranked.take(k).map(_._1).toSet,
        s"selection mismatch in stratum $g")
      got.foreach { case (_, id, w, p, est) =>
        assert(p === pri.find(_._1 == id).get._3)
        assert(est === math.max(w.toDouble, tau), s"estimator mismatch $g/$id")
      }
    }
  }

  test("a small stratum is sampled exhaustively with tau = 0") {
    val mixed = (strata :+ ((1000L, "tiny", 99L)) :+ ((1001L, "tiny", 1L)))
      .toDF("id", "grp", "w")
    val out = Sampling.prioritySamplePerGroup(mixed, "id", "grp", "w", 10)
      .filter($"grp" === "tiny")
      .select("id", "weight", "est_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1000L, 1001L))
    out.foreach { case (_, w, est) =>
      assert(est === w.toDouble, "exhaustive stratum: est_weight = weight") }
  }

  test("per-group top-(k+1) runs under WindowGroupLimit (no full-group sort)") {
    val plan = Sampling.prioritySamplePerGroup(sdf, "id", "grp", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-group heap pruning must fire before the exchange:\n$plan")
  }

  // --- greedy token-budget selection ---

  /** Driver-side greedy knapsack reference: descending score, ties by id,
    * keep rows whose inclusive running cost stays within budget. */
  private def refBudget(rows: Seq[(Long, Long, Long)],
      b: Long): Seq[(Long, Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy { case (id, sc, _) => (-sc, id) }.flatMap {
      case (id, sc, c) =>
        cum += c
        if (cum <= b) Some((id, sc, c, cum)) else None
    }
  }

  private def budget(rows: Seq[(Long, Long, Long)], b: Long,
      buckets: Int = 32): Seq[(Long, Long, Long, Long)] =
    Sampling.budgetSelect(rows.toDF("id", "score", "cost"), "id", "score",
        "cost", b, buckets)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (-r._2, r._1)).toSeq

  test("budgetSelect matches the driver-side greedy reference") {
    val rows = (1L to 100L).map(i => (i, (i * 7) % 31, 10L + i % 9))
    for (b <- Seq(0L, 100L, 500L, 10000L)) {
      assert(budget(rows, b) === refBudget(rows, b), s"budget=$b")
    }
  }

  test("budgetSelect: the overflowing document and everything after it are excluded") {
    // scores force the order c > a > b; c(40) + a(50) = 90 ≤ 100, b
    // overflows at 150 and is cut — greedy prefix, not best-fit
    val rows = Seq((1L, 5L, 50L), (2L, 3L, 60L), (3L, 9L, 40L))
    assert(budget(rows, 100L) ===
      Seq((3L, 9L, 40L, 40L), (1L, 5L, 50L, 90L)))
  }

  test("budgetSelect: equal scores break by id, deterministically") {
    val rows = Seq((10L, 7L, 30L), (2L, 7L, 30L), (5L, 7L, 30L))
    assert(budget(rows, 60L).map(_._1) === Seq(2L, 5L),
      "at equal score the lower id is taken first")
  }

  test("budgetSelect is invariant to bucket count and partitioning") {
    val rows = (1L to 300L).map(i => (i, (i * 13) % 17, 5L + i % 7))
    val expect = refBudget(rows, 400L)
    assert(budget(rows, 400L, buckets = 1) === expect)
    assert(budget(rows, 400L, buckets = 7) === expect)
    val many = Sampling.budgetSelect(
      rows.toDF("id", "score", "cost").repartition(13), "id", "score",
      "cost", 400L, 16)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (-r._2, r._1)).toSeq
    assert(many === expect)
  }

  test("budgetSelect excludes null-scored and null-cost rows instead of ranking them first") {
    // a NULL score negates to NULL and would sort FIRST (ASC NULLS FIRST)
    // without the guard — i.e. the unscored doc would eat the budget ahead
    // of every scored one; the contract is to drop such rows entirely
    val rows = Seq(
      Row(1L, java.lang.Long.valueOf(5L), java.lang.Long.valueOf(50L)),
      Row(2L, null, java.lang.Long.valueOf(60L)),
      Row(3L, java.lang.Long.valueOf(9L), null),
      Row(4L, java.lang.Long.valueOf(7L), java.lang.Long.valueOf(30L)))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", LongType, nullable = true),
      StructField("cost", LongType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = Sampling.budgetSelect(df, "id", "score", "cost", 80L)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (-r._2, r._1)).toSeq
    assert(out === Seq((4L, 7L, 30L, 30L), (1L, 5L, 50L, 80L)),
      "null score/cost rows must not be selected or affect cum")
  }

  test("budgetSelectPerGroup: each group is the global greedy restricted to it") {
    val rows = (1L to 200L).map(i =>
      (s"src${i % 5}", i, (i * 7) % 31, 10L + i % 9))
    for (b <- Seq(0L, 150L, 600L, 10000L)) {
      val got = Sampling.budgetSelectPerGroup(
          rows.toDF("grp", "id", "score", "cost"), "id", "grp", "score",
          "cost", b)
        .as[(String, Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5))
          .sortBy(r => (-r._2, r._1)).toSeq).toMap
      val want = rows.groupBy(_._1).view.mapValues(gr =>
        refBudget(gr.map(r => (r._2, r._3, r._4)), b)).toMap
        .filter(_._2.nonEmpty)
      assert(got === want, s"budget=$b")
    }
  }

  test("budgetSelectPerGroup: one group exhausting its budget leaves others untouched") {
    // src a's best doc alone blows the budget for anything after it;
    // src b fits everything — independence is the point of the operator
    val rows = Seq(("a", 1L, 9L, 95L), ("a", 2L, 8L, 50L),
      ("b", 3L, 1L, 30L), ("b", 4L, 2L, 30L))
    val got = Sampling.budgetSelectPerGroup(
        rows.toDF("grp", "id", "score", "cost"), "id", "grp", "score",
        "cost", 100L)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got === Seq(("a", 1L, 9L, 95L, 95L),
      ("b", 3L, 1L, 30L, 60L), ("b", 4L, 2L, 30L, 30L)))
  }

  test("budgetSelect on an empty frame returns an empty frame") {
    val out = Sampling.budgetSelect(
      Seq.empty[(Long, Long, Long)].toDF("id", "score", "cost"),
      "id", "score", "cost", 100L)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("id", "score", "cost", "cum"))
  }

  // --- weighted median per group ---

  /** Driver-side reference: first (v, id)-ordered row whose inclusive
    * cumulative weight reaches half the group total; zero-total groups
    * absent. */
  private def refWMedian(
      rows: Seq[(Long, String, Long, Long)]): Map[String, (Long, Long)] =
    rows.groupBy(_._2).flatMap { case (g, rs) =>
      val tot = rs.map(_._4).sum
      if (tot <= 0) None
      else {
        var cum = 0L
        val hit = rs.sortBy(r => (r._3, r._1)).find { r =>
          cum += r._4; 2 * cum >= tot
        }.get
        Some(g -> ((hit._3, tot)))
      }
    }

  private def wmed(rows: Seq[(Long, String, Long, Long)],
      buckets: Int = 32): Map[String, (Long, Long)] =
    Sampling.weightedMedianPerGroup(
        rows.toDF("id", "grp", "v", "w"), "id", "grp", "v", "w", buckets)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("weightedMedianPerGroup matches the driver reference") {
    val rows = (1L to 200L).map(i =>
      (i, s"s${i % 5}", (i * 13) % 50, 1L + i % 7))
    assert(wmed(rows) === refWMedian(rows))
  }

  test("weightedMedianPerGroup: one heavy row owns the median") {
    // a single row holding >half the weight IS the weighted median even
    // when most rows are smaller values
    val rows = Seq((1L, "g", 5L, 1L), (2L, "g", 6L, 1L), (3L, "g", 7L, 1L),
      (4L, "g", 100L, 10L))
    assert(wmed(rows) === Map("g" -> ((100L, 13L))))
    // the unweighted median would be 6/7-ish — the weighted one is not
  }

  test("weightedMedianPerGroup is invariant to buckets and partitioning") {
    val rows = (1L to 300L).map(i =>
      (i, s"s${i % 3}", (i * 31) % 90, 1L + i % 5))
    val expect = refWMedian(rows)
    assert(wmed(rows, buckets = 1) === expect)
    assert(wmed(rows, buckets = 9) === expect)
    val many = Sampling.weightedMedianPerGroup(
      rows.toDF("id", "grp", "v", "w").repartition(11), "id", "grp",
      "v", "w", 16)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(many === expect)
  }

  test("weightedMedianPerGroup: empty input and zero-weight groups vanish") {
    assert(wmed(Seq.empty) === Map.empty)
    val rows = Seq((1L, "z", 5L, 0L), (2L, "z", 6L, 0L), (3L, "g", 9L, 2L))
    assert(wmed(rows) === Map("g" -> ((9L, 2L))))
  }

  test("weightedMedianPerGroup: only crossing buckets reach the row window") {
    // the offsets-side crossing filter must sit below the per-row
    // window, so non-boundary buckets never join
    val rows = (1L to 400L).map(i => (i, s"s${i % 2}", i, 1L))
    val df = Sampling.weightedMedianPerGroup(
      rows.toDF("id", "grp", "v", "w"), "id", "grp", "v", "w", 16)
    val plan = df.queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // conditioned joins only: the lazy quantile-cuts broadcast (r21) is a
    // condition-less 1-row crossJoin below the OFFSETS window too — only
    // the offsets equi-join marks the per-row window
    val rowWindows = windows.filterNot(_.child.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.nonEmpty => j
    }.isEmpty)
    assert(rowWindows.nonEmpty, s"expected the per-row weight window:\n$plan")
    rowWindows.foreach { w =>
      val hasCrossingPrune = w.child.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("<") &&
              f.condition.toString.contains(">=") => f
      }
      assert(hasCrossingPrune.nonEmpty,
        s"the crossing-bucket prune must sit below the row window:\n$w")
    }
  }

  // --- exact quantile table per group ---

  /** Driver reference: value at the smallest (v, id)-ordered 1-based
    * rank r with q·r ≥ d·n, for d in 1..q−1. */
  private def refQuantiles(rows: Seq[(Long, String, Long)],
      q: Int): Map[(String, Int), Long] =
    rows.groupBy(_._2).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1)).map(_._3)
      val n = sorted.size
      (1 until q).map { d =>
        val r = (1 to n).find(r => q.toLong * r >= d.toLong * n).get
        (g, d) -> sorted(r - 1)
      }
    }

  private def quant(rows: Seq[(Long, String, Long)], q: Int = 10,
      buckets: Int = 32): Map[(String, Int), Long] =
    Sampling.exactQuantilesPerGroup(rows.toDF("id", "grp", "v"), "id",
        "grp", "v", q, buckets)
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("exactQuantilesPerGroup matches the driver reference, incl. ties") {
    val rows = (1L to 200L).map(i => (i, s"s${i % 4}", (i * 13) % 23))
    assert(quant(rows) === refQuantiles(rows, 10))
    assert(quant(rows, q = 4) === refQuantiles(rows, 4))
  }

  test("exactQuantilesPerGroup emits exactly q-1 rows per group") {
    val rows = (1L to 90L).map(i => (i, s"s${i % 3}", i))
    val out = quant(rows)
    assert(out.size === 3 * 9)
    // on 30 contiguous values per group the deciles are every 3rd value
    val g0 = (1 to 9).map(d => out(("s0", d)))
    assert(g0 === g0.sorted, "deciles are nondecreasing")
  }

  test("exactQuantilesPerGroup: a 1-row group puts its value at every decile") {
    val rows = Seq((1L, "solo", 42L)) ++ (1L to 20L).map(i => (10 + i, "big", i))
    val out = quant(rows)
    assert((1 to 9).forall(d => out(("solo", d)) === 42L))
  }

  test("exactQuantilesPerGroup is invariant to buckets and partitioning") {
    val rows = (1L to 300L).map(i => (i, s"s${i % 2}", (i * 31) % 97))
    val expect = refQuantiles(rows, 10)
    assert(quant(rows, buckets = 1) === expect)
    assert(quant(rows, buckets = 11) === expect)
    val many = Sampling.exactQuantilesPerGroup(
      rows.toDF("id", "grp", "v").repartition(7), "id", "grp", "v", 10, 8)
      .as[(String, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(many === expect)
  }

  test("budgetSelect prunes past-budget buckets before their windows run") {
    // the scale claim: the corpus tail past the boundary bucket must be
    // filtered on the tiny offsets frame, BEFORE the per-row running-sum
    // window — visible in the plan as a Filter on `off` below the Window
    val rows = (1L to 500L).map(i => (i, 500L - i, 10L))
    val df = Sampling.budgetSelect(rows.toDF("id", "score", "cost"), "id",
      "score", "cost", 50L, 16)
    val plan = df.queryExecution.optimizedPlan
    // collect Window nodes and check each sits above a Filter mentioning
    // `off` (the bucket prune) somewhere in its child
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val rowWindow = windows.filterNot( // conditioned joins only (see above)
      _.child.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.nonEmpty => j }.isEmpty)
    assert(rowWindow.nonEmpty, s"expected the per-row running-sum window:\n$plan")
    rowWindow.foreach { w =>
      // the optimizer may rewrite `off` to the underlying window expr —
      // match the budget comparison itself (<= 50) sitting below the
      // row-level window, wherever the filter was pushed
      val hasPrune = w.child.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("<= 50") => f
      }
      assert(hasPrune.nonEmpty,
        s"the off <= budget prune must sit below the running-sum window:\n$w")
    }
  }

  test("stratifiedFolds: exact balance per group, stable under input order") {
    import spark.implicits._
    val rows = (1L to 103L).map(i => (i, if (i % 3 == 0) "a" else "b"))
    val df = rows.toDF("doc_id", "source")
    val out = Sampling.stratifiedFolds(df, "doc_id", "source", 5)
      .select("id", "grp", "fold").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every (group, fold) cell is ⌊n/5⌋ or ⌈n/5⌉ — the exact-balance law
    out.groupBy(_._2).foreach { case (_, rs) =>
      val sizes = (0L until 5L).map(f => rs.count(_._3 == f))
      assert(sizes.max - sizes.min <= 1, s"unbalanced folds: $sizes")
      assert(sizes.sum === rs.length)
    }
    // deterministic: a shuffled, repartitioned input maps ids identically
    val out2 = Sampling.stratifiedFolds(
        df.orderBy(rand(7)).repartition(5), "doc_id", "source", 5)
      .select("id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall { case (id, _, f) => out2(id) == f })
  }

  test("stratifiedFolds: a group smaller than k leaves high folds empty, never unbalanced") {
    import spark.implicits._
    val df = Seq((1L, "tiny"), (2L, "tiny"), (3L, "tiny"))
      .toDF("doc_id", "source")
    val folds = Sampling.stratifiedFolds(df, "doc_id", "source", 5)
      .select("fold").as[Long].collect().toSeq.sorted
    assert(folds === Seq(0L, 1L, 2L), "3 docs deal to folds 0, 1, 2")
  }
}
