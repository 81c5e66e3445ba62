package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Components, Drift, Eval}

/** ScalaCheck properties for the stats/eval/graph-core operators on
  * ARBITRARY inputs — the corpus-bound queries (q176/q177/q178/q184)
  * exercise one data shape; these roam adversarial ones: all-ties,
  * single-class, empty groups, disconnected graphs, k beyond every
  * degree. Each distributed result must equal the textbook in-JVM
  * reference. Trial counts are modest (every trial runs Spark jobs).
  */
class StatPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, trials: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // small value domains force heavy ties — the interesting regime for
  // rank statistics
  private val genLabeled: Gen[List[(Boolean, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf(true, false),
      Gen.choose(0L, 8L)))
  } yield rows

  test("aucHistogram == naive all-pairs Mann–Whitney on arbitrary tied data") {
    check("auc", Prop.forAll(genLabeled) { rows =>
      val got = Eval.aucHistogram(rows.toDF("pos", "v"), "pos", "v")
        .collect().head
      val pos = rows.filter(_._1).map(_._2)
      val neg = rows.filterNot(_._1).map(_._2)
      val naive2U = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      val gotNum = if (got.isNullAt(0)) 0L else got.getLong(0)
      gotNum == naive2U &&
        got.getLong(1) == pos.size.toLong &&
        got.getLong(2) == neg.size.toLong
    })
  }

  test("aucHistogramPerGroup == naive per-group all-pairs Mann–Whitney") {
    val genGrouped: Gen[List[(String, Boolean, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.oneOf(true, false), Gen.choose(0L, 8L)))
    } yield rows
    check("aucg", Prop.forAll(genGrouped) { rows =>
      val got = Eval.aucHistogramPerGroup(
          rows.toDF("g", "pos", "v"), "g", "pos", "v")
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) 0L else r.getLong(1),
            r.getLong(2), r.getLong(3))).toMap
      val want = rows.groupBy(_._1).map { case (g, gr) =>
        val pos = gr.filter(_._2).map(_._3)
        val neg = gr.filterNot(_._2).map(_._3)
        g -> ((for (p <- pos; n <- neg)
          yield if (p > n) 2L else if (p == n) 1L else 0L).sum,
          pos.size.toLong, neg.size.toLong)
      }
      got == want
    })
  }

  // nullable variant: NULL labels and NULL values must follow the stated
  // contract (label → negative, value → excluded), not vanish from both
  // classes (`!NULL` is NULL) or sort engine-dependently
  private val genLabeledNullable
      : Gen[List[(Option[Boolean], Option[Long])]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, Gen.zip(
      Gen.oneOf(Option(true), Option(false), Option.empty[Boolean]),
      Gen.frequency(4 -> Gen.choose(0L, 8L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))))
  } yield rows

  test("aucHistogram NULL contract: NULL label is negative, NULL value is excluded") {
    check("aucNull", Prop.forAll(genLabeledNullable) { rows =>
      val df = rows.map { case (p, v) =>
        (p.map(java.lang.Boolean.valueOf).orNull,
          v.map(java.lang.Long.valueOf).orNull)
      }.toDF("pos", "v")
      val got = Eval.aucHistogram(df, "pos", "v").collect().head
      val kept = rows.collect { case (p, Some(v)) => (p.contains(true), v) }
      val pos = kept.filter(_._1).map(_._2)
      val neg = kept.filterNot(_._1).map(_._2)
      val naive2U = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      val gotNum = if (got.isNullAt(0)) 0L else got.getLong(0)
      val gotPos = if (got.isNullAt(1)) 0L else got.getLong(1)
      val gotNeg = if (got.isNullAt(2)) 0L else got.getLong(2)
      gotNum == naive2U && gotPos == pos.size.toLong &&
        gotNeg == neg.size.toLong
    })
  }

  private val genCounts: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 6L)
      c <- Gen.choose(1L, 5L)
    } yield (g, v, c))
  } yield rows.groupBy(r => (r._1, r._2))
    .map { case ((g, v), rs) => (g, v, rs.map(_._3).sum) }.toList

  test("ksFromCounts == naive ECDF sup per group on arbitrary count tables") {
    check("ks", Prop.forAll(genCounts) { counts =>
      val got = Drift.ksFromCounts(counts.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val all = counts.flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
      val ng = all.size.toLong
      val vals = all.distinct
      got.keySet == counts.map(_._1).toSet && counts.map(_._1).distinct
        .forall { g =>
          val gv = counts.filter(_._1 == g)
            .flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
          val ns = gv.size.toLong
          val naive = vals.map { v =>
            math.abs(gv.count(_ <= v) * ng - all.count(_ <= v) * ns)
          }.max
          got(g) == ((naive, ns, ng))
        }
    })
  }

  test("tvFromCounts == naive L1 distance per group on arbitrary count tables") {
    check("tv", Prop.forAll(genCounts) { counts =>
      val got = Drift.tvFromCounts(counts.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val all = counts.flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
      val ng = all.size.toLong
      val vals = all.distinct
      counts.map(_._1).distinct.forall { g =>
        val gv = counts.filter(_._1 == g)
          .flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
        val ns = gv.size.toLong
        val naive = vals.map { v =>
          math.abs(gv.count(_ == v) * ng - all.count(_ == v) * ns)
        }.sum
        // TV ∈ [0, 1] ⇒ tv_num ≤ 2·ns·ng
        got(g) == ((naive, ns, ng)) && naive <= 2 * ns * ng
      }
    })
  }

  test("ksBetweenCounts == naive two-sample KS on arbitrary count-table pairs") {
    check("ks2", Prop.forAll(genCounts, genCounts) { (ca, cb) =>
      val got = Drift.ksBetweenCounts(ca.toDF("g", "v", "c"),
          cb.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val groups = (ca.map(_._1) ++ cb.map(_._1)).distinct
      got.keySet == groups.toSet && groups.forall { g =>
        val av = ca.filter(_._1 == g)
          .flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
        val bv = cb.filter(_._1 == g)
          .flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
        val (na, nb) = (av.size.toLong, bv.size.toLong)
        val naive = (av ++ bv).distinct.map { v =>
          math.abs(av.count(_ <= v) * nb - bv.count(_ <= v) * na)
        }.max
        got(g) == ((naive, na, nb))
      }
    }, trials = 8)
  }

  test("kuiperBetweenCounts == naive D+ + D-; V >= KS; identical inputs score 0") {
    check("kuiper2", Prop.forAll(genCounts, genCounts) { (ca, cb) =>
      def inst(rows: List[(String, Long, Long)], g: String) =
        rows.filter(_._1 == g).flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
      val got = Drift.kuiperBetweenCounts(ca.toDF("g", "v", "c"),
          cb.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      val ks = Drift.ksBetweenCounts(ca.toDF("g", "v", "c"),
          cb.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val self = Drift.kuiperBetweenCounts(ca.toDF("g", "v", "c"),
          ca.toDF("g", "v", "c"), "g", "v", "c")
        .collect().forall(r => r.getLong(1) == 0L)
      val groups = (ca.map(_._1) ++ cb.map(_._1)).distinct
      self && got.keySet == groups.toSet && groups.forall { g =>
        val (av, bv) = (inst(ca, g), inst(cb, g))
        val (na, nb) = (av.size.toLong, bv.size.toLong)
        val gaps = (av ++ bv).distinct.sorted.map { v =>
          av.count(_ <= v) * nb - bv.count(_ <= v) * na
        }
        val (dp, dm) = (gaps.max.max(0L), gaps.map(-_).max.max(0L))
        // V = D+ + D-, each side >= 0 (the final gap is exactly 0), and
        // V >= the KS sup since KS = max(D+, D-)
        got(g) == ((dp + dm, dp, dm, na, nb)) && dp + dm >= ks(g)
      }
    }, trials = 8)
  }

  test("tv/w1BetweenCounts == their naive two-sample forms on arbitrary count-table pairs") {
    check("tvw12", Prop.forAll(genCounts, genCounts) { (ca, cb) =>
      def inst(rows: List[(String, Long, Long)], g: String) =
        rows.filter(_._1 == g).flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
      val groups = (ca.map(_._1) ++ cb.map(_._1)).distinct
      val gotTv = Drift.tvBetweenCounts(ca.toDF("g", "v", "c"),
          cb.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val gotW1 = Drift.w1BetweenCounts(ca.toDF("g", "v", "c"),
          cb.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      groups.forall { g =>
        val (av, bv) = (inst(ca, g), inst(cb, g))
        val (na, nb) = (av.size.toLong, bv.size.toLong)
        val vals = (av ++ bv).distinct.sorted
        val tvNaive = vals.map { v =>
          math.abs(av.count(_ == v) * nb - bv.count(_ == v) * na)
        }.sum
        val w1Naive = vals.zipAll(vals.drop(1), 0L, -1L).map {
          case (v, nx) =>
            val gap = if (nx == -1L) 0L else nx - v
            math.abs(av.count(_ <= v) * nb - bv.count(_ <= v) * na) * gap
        }.sum
        gotTv(g) == ((tvNaive, na, nb)) && gotW1(g) == ((w1Naive, na, nb))
      }
    }, trials = 6)
  }

  test("cvmBetweenCounts == naive squared-ECDF-gap sum; identical inputs score exactly 0") {
    check("cvm2", Prop.forAll(genCounts, genCounts) { (ca, cb) =>
      def inst(rows: List[(String, Long, Long)], g: String) =
        rows.filter(_._1 == g).flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
      val got = Drift.cvmBetweenCounts(ca.toDF("g", "v", "c"),
          cb.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) ->
          (BigInt(r.getLong(1)), r.getLong(2), r.getLong(3)))
        .toMap
      val groups = (ca.map(_._1) ++ cb.map(_._1)).distinct
      val self = Drift.cvmBetweenCounts(ca.toDF("g", "v", "c"),
          ca.toDF("g", "v", "c"), "g", "v", "c")
        .collect().forall(r => r.getLong(1) == 0L)
      self && got.keySet == groups.toSet && groups.forall { g =>
        val (av, bv) = (inst(ca, g), inst(cb, g))
        val (na, nb) = (av.size.toLong, bv.size.toLong)
        val naive = (av ++ bv).distinct.sorted.map { v =>
          val gap = BigInt(av.count(_ <= v)) * nb - BigInt(bv.count(_ <= v)) * na
          gap * gap * (av.count(_ == v) + bv.count(_ == v))
        }.sum
        got(g) == ((naive, na, nb))
      }
    }, trials = 6)
  }

  test("chi2BetweenCounts == naive homogeneity cells; per-group deviations sum to zero") {
    check("chi2b", Prop.forAll(genCounts, genCounts) { (ca, cb) =>
      def cnt(rows: List[(String, Long, Long)], g: String, v: Long) =
        rows.collect { case (`g`, `v`, c) => c }.sum
      val got = Drift.chi2BetweenCounts(ca.toDF("g", "v", "c"),
          cb.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6))).toMap
      val groups = (ca.map(_._1) ++ cb.map(_._1)).distinct
      val gridOk = groups.forall { g =>
        val vals = (ca ++ cb).filter(_._1 == g).map(_._2).distinct
        val na = ca.filter(_._1 == g).map(_._3).sum
        val nb = cb.filter(_._1 == g).map(_._3).sum
        vals.forall { v =>
          val (a, b) = (cnt(ca, g, v), cnt(cb, g, v))
          got((g, v)) == ((a, b, na, nb, a * nb - b * na))
        } &&
          // side B's deviation is the negation ⇒ the group sums to zero
          vals.map(v => got((g, v))._5).sum == 0L &&
          // textbook float χ² (Σ (obs−exp)²/exp over both sides' cells)
          // == the consumer formula Σ dev²/(n_a·n_b·col_tot), when both
          // sides have mass
          (na == 0L || nb == 0L || {
            val n = (na + nb).toDouble
            val textbook = vals.map { v =>
              val (a, b) = (cnt(ca, g, v), cnt(cb, g, v))
              val ct = (a + b).toDouble
              val (ea, eb) = (na * ct / n, nb * ct / n)
              math.pow(a - ea, 2) / ea + math.pow(b - eb, 2) / eb
            }.sum
            val shipped = vals.map { v =>
              val d = got((g, v))._5.toDouble
              d * d / (na.toDouble * nb * (cnt(ca, g, v) + cnt(cb, g, v)))
            }.sum
            math.abs(textbook - shipped) < 1e-9 * (1 + textbook)
          })
      }
      gridOk && got.keySet == groups.flatMap(g =>
        (ca ++ cb).filter(_._1 == g).map(_._2).distinct.map(v => (g, v))).toSet
    }, trials = 6)
  }

  test("psiBuckets == naive pooled-quantile bucketing; masses add up per group") {
    val genGrouped: Gen[List[(String, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.choose(0L, 8L)))
    } yield rows
    check("psi", Prop.forAll(genGrouped, Gen.oneOf(1, 2, 4, 8)) {
      (rows, b) =>
        val got = Drift.psiBuckets(rows.toDF("g", "v"), "g", "v", b)
          .collect().map(r => (r.getString(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
        // the additive-state form must agree exactly: a monitor reading
        // a persisted count table sees the same PSI rows as the raw scan
        val viaCounts = Drift.psiBucketsFromCounts(
            rows.groupBy(identity).map { case ((g, v), rs) =>
              (g, v, rs.size.toLong) }.toSeq.toDF("g", "v", "c"),
            "g", "v", "c", b)
          .collect().map(r => (r.getString(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
        assert(viaCounts === got)
        val n = rows.size.toLong
        def bkt(v: Long) = rows.count(_._2 < v).toLong * b / n
        val occupied = rows.map(r => bkt(r._2)).distinct
        val groups = rows.map(_._1).distinct
        got.keySet == (for (g <- groups; k <- occupied) yield (g, k)).toSet &&
          groups.forall { g =>
            val grows = rows.filter(_._1 == g)
            occupied.forall { k =>
              got((g, k)) == ((grows.count(r => bkt(r._2) == k).toLong,
                rows.count(r => bkt(r._2) == k).toLong,
                grows.size.toLong, n))
            } &&
              // masses add up: the bucket table is a partition
              occupied.map(k => got((g, k))._1).sum == grows.size.toLong &&
              occupied.map(k => got((g, k))._2).sum == n
          }
    }, trials = 8)
  }

  test("quantilesFromCounts == exactQuantilesPerGroup on the raw rows (any q)") {
    val genGrouped: Gen[List[(String, Long)]] = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.choose(0L, 8L)))
    } yield rows
    check("qfc", Prop.forAll(genGrouped, Gen.oneOf(2, 4, 10)) { (rows, q) =>
      val raw = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      val fromRaw = graft.operators.Sampling.exactQuantilesPerGroup(
          raw.toDF("id", "g", "v"), "id", "g", "v", q)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      val fromCounts = Drift.quantilesFromCounts(
          rows.groupBy(identity).map { case ((g, v), rs) =>
            (g, v, rs.size.toLong) }.toSeq.toDF("g", "v", "c"),
          "g", "v", "c", q)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      fromCounts == fromRaw
    }, trials = 8)
  }

  test("rebinCounts == counting the floored raws, and commutes with mergeCounts") {
    val genGrouped: Gen[List[(String, Long)]] = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b"),
        Gen.choose(0L, 40L)))
    } yield rows
    def counts(rows: List[(String, Long)]) = rows.groupBy(identity)
      .map { case ((g, v), rs) => (g, v, rs.size.toLong) }.toSeq
      .toDF("g", "v", "c")
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    check("rebin", Prop.forAll(genGrouped, genGrouped,
        Gen.oneOf(1L, 3L, 10L)) { (xs, ys, w) =>
      val direct = toSet(Drift.rebinCounts(counts(xs), "g", "v", "c", w))
      val floored = toSet(counts(xs.map { case (g, v) => (g, v / w * w) }))
      // merging then rebinning == rebinning both sides then merging
      val mergedThenRebinned = toSet(Drift.rebinCounts(
        Drift.mergeCounts(counts(xs), ys.toDF("g", "v"), "g", "v", "c"),
        "g", "v", "c", w))
      val rebinnedThenMerged = toSet(Drift.mergeCounts(
        Drift.rebinCounts(counts(xs), "g", "v", "c", w),
        ys.map { case (g, v) => (g, v / w * w) }.toDF("g", "v"),
        "g", "v", "c"))
      direct == floored && mergedThenRebinned == rebinnedThenMerged
    }, trials = 6)
  }

  test("confusionByThreshold == naive per-threshold confusion on arbitrary tied data") {
    check("prt", Prop.forAll(genLabeled) { rows =>
      val got = Eval.confusionByThreshold(rows.toDF("pos", "v"),
          "pos", "v")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val vals = rows.map(_._2).distinct
      got.keySet == vals.toSet && vals.forall { t =>
        val naive = (rows.count(r => r._1 && r._2 >= t).toLong,
          rows.count(r => !r._1 && r._2 >= t).toLong,
          rows.count(r => r._1 && r._2 < t).toLong,
          rows.count(r => !r._1 && r._2 < t).toLong)
        got(t) == naive
      }
    })
  }

  test("confusionByThresholdPerGroup == naive per-(group, threshold) confusion") {
    val genGroupedLabeled: Gen[List[(String, Boolean, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.oneOf(true, false), Gen.choose(0L, 8L)))
    } yield rows
    check("prtg", Prop.forAll(genGroupedLabeled) { rows =>
      val got = Eval.confusionByThresholdPerGroup(
          rows.toDF("g", "pos", "v"), "g", "pos", "v")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      val keys = rows.map(r => (r._1, r._3)).distinct
      got.keySet == keys.toSet && keys.forall { case (g, t) =>
        val gr = rows.filter(_._1 == g)
        got((g, t)) == ((
          gr.count(r => r._2 && r._3 >= t).toLong,
          gr.count(r => !r._2 && r._3 >= t).toLong,
          gr.count(r => r._2 && r._3 < t).toLong,
          gr.count(r => !r._2 && r._3 < t).toLong))
      }
    })
  }

  test("w1FromCounts == naive CDF-gap earth-mover per group on arbitrary count tables") {
    check("w1", Prop.forAll(genCounts) { counts =>
      val got = Drift.w1FromCounts(counts.toDF("g", "v", "c"), "g", "v", "c")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val all = counts.flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
      val ng = all.size.toLong
      val vals = all.distinct.sorted
      counts.map(_._1).distinct.forall { g =>
        val gv = counts.filter(_._1 == g)
          .flatMap { case (_, v, c) => Seq.fill(c.toInt)(v) }
        val ns = gv.size.toLong
        val naive = vals.zipAll(vals.drop(1), 0L, -1L).map {
          case (v, next) =>
            val gap = if (next == -1L) 0L else next - v
            math.abs(gv.count(_ <= v) * ng - all.count(_ <= v) * ns) * gap
        }.sum
        got(g) == ((naive, ns, ng))
      }
    })
  }

  test("drift arithmetic stays exact just under the documented n_grp*n_all overflow bound") {
    // the module doc promises exactness while n_grp*n_all < 2^63; pin it
    // near the edge: two groups of ~2.1e9 observations each (counts, not
    // rows) put every cs*ng product around 8.8e18 — within Long by the
    // documented margin, and a naive Int or Double path would corrupt
    val big = 2100000000L // 2.1e9 per group; ns*ng ≈ 8.8e18 < 2^63
    val counts = Seq(("a", 1L, big), ("a", 2L, 1L),
      ("b", 1L, 1L), ("b", 2L, big)).toDF("g", "v", "c")
    val got = Drift.ksFromCounts(counts, "g", "v", "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ns = big + 1L
    val ng = 2L * ns
    // exact sup at v=1: |cs_a*ng - cg*ns| = |big*ng - (big+1)*ns|
    val expA = math.abs(big * ng - (big + 1L) * ns)
    assert(got("a") === ((expA, ns, ng)))
    assert(got("b") === ((expA, ns, ng)), "symmetric by construction")
    val tv = Drift.tvFromCounts(counts, "g", "v", "c")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // pointwise: both grid values contribute the same displacement
    assert(tv("a") === 2L * expA && tv("b") === 2L * expA)
  }

  test("ks/tv/mergeCounts NULL values: a NULL observation is invisible to the panel") {
    // adding NULL-valued rows to the count table (or NULL observations
    // to a merged batch) must change NOTHING — not the sup/L1 numerators
    // and not the n_grp/n_all denominators. Without the exclusion the
    // NULL ECDF step would land at opposite ends in Spark (NULLS FIRST)
    // and DuckDB (NULLS LAST).
    check("ksTvNull", Prop.forAll(genCounts) { counts =>
      val clean = counts.toDF("g", "v", "c")
      val dirty = (counts.map { case (g, v, c) =>
          (g, java.lang.Long.valueOf(v), c)
        } ++ List(("a", null: java.lang.Long, 2L),
          ("b", null: java.lang.Long, 1L))).toDF("g", "v", "c")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      val ksSame = rows(Drift.ksFromCounts(clean, "g", "v", "c")) ==
        rows(Drift.ksFromCounts(dirty, "g", "v", "c"))
      val tvSame = rows(Drift.tvFromCounts(clean, "g", "v", "c")) ==
        rows(Drift.tvFromCounts(dirty, "g", "v", "c"))
      val batchClean = counts.map { case (g, v, _) => (g, v) }.toDF("g", "v")
      val batchDirty = (counts.map { case (g, v, _) =>
          (g, java.lang.Long.valueOf(v))
        } ++ List(("c", null: java.lang.Long))).toDF("g", "v")
      val empty = List.empty[(String, Long, Long)].toDF("g", "v", "c")
      val mergeSame =
        rows(Drift.mergeCounts(empty, batchClean, "g", "v", "c")) ==
          rows(Drift.mergeCounts(empty, batchDirty, "g", "v", "c"))
      ksSame && tvSame && mergeSame
    }, trials = 5)
  }

  private val genXY: Gen[List[(Long, String, Long, Long)]] = for {
    n <- Gen.choose(1, 50)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b")
      x <- Gen.choose(0L, 9L)
      y <- Gen.choose(0L, 9L)
    } yield (g, x, y))
  } yield rows.zipWithIndex.map { case ((g, x, y), i) => (i.toLong, g, x, y) }

  test("spearmanPerGroup == naive tie-broken rank distance; 0 on any monotone image") {
    check("spearman", Prop.forAll(genXY) { rows =>
      val got = Eval.spearmanPerGroup(rows.toDF("id", "g", "x", "y"),
          "id", "g", "x", "y")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      def ranks(vs: Seq[(Long, Long)]): Map[Long, Long] =
        vs.sortBy(identity).map(_._2).zipWithIndex
          .map { case (id, i) => id -> i.toLong }.toMap
      val byG = rows.groupBy(_._2)
      val naiveOk = byG.forall { case (g, rs) =>
        val r1 = ranks(rs.map(r => (r._3, r._1)))
        val r2 = ranks(rs.map(r => (r._4, r._1)))
        val d2 = rs.map(r => { val d = r1(r._1) - r2(r._1); d * d }).sum
        got(g) == ((rs.size.toLong, d2))
      }
      // x against a strictly monotone image of x has rank distance 0
      val self = Eval.spearmanPerGroup(
          rows.map { case (id, g, x, _) => (id, g, x, 2 * x + 1) }
            .toDF("id", "g", "x", "y"),
          "id", "g", "x", "y")
        .collect().forall(_.getLong(2) == 0L)
      naiveOk && self
    }, trials = 8)
  }

  test("giniPerGroup == closed form and is 0 exactly on uniform counts") {
    check("gini", Prop.forAll(genCounts) { counts =>
      val tbl = counts.map { case (g, v, c) => (g, v.toString, c) }
      val got = Eval.giniPerGroup(tbl.toDF("g", "t", "c"), "g", "t", "c")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      tbl.map(_._1).distinct.forall { g =>
        val cs = tbl.filter(_._1 == g).sortBy(r => (r._3, r._2)).map(_._3)
        val n = cs.size.toLong
        val tot = cs.sum
        val num = cs.zipWithIndex.map { case (c, i) =>
          (2L * (i + 1) - n - 1L) * c
        }.sum
        val (gn, gt, gnum, gden) = got(g)
        gn == n && gt == tot && gnum == num && gden == n * tot &&
          gnum >= 0 && gnum <= gden &&
          (cs.distinct.size != 1 || gnum == 0L)
      }
    })
  }

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
  } yield edges

  /** In-JVM peeling reference (fixpoint). */
  private def refCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    var changed = true
    while (changed) {
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      changed = e2 != e
      e = e2
    }
    e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap.filter(_._2 >= k)
  }

  test("kCoreUntil == reference fixpoint peeling on arbitrary graphs and k") {
    check("kcore", Prop.forAll(genEdges, Gen.choose(1, 5)) { (edges, k) =>
      val got = Components.kCoreUntil(
          edges.toDF("a", "b"), "a", "b", k)
        .as[(Long, Long)].collect().toMap
      got == refCore(edges, k)
    }, trials = 8)
  }
}
