package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the corpus-statistics / eval-metric family
  * (StatOps): each distributed statistic is recomputed in-JVM from the
  * collected raw data by the textbook (not histogram-rewritten) formula —
  * the grid/histogram reformulations the queries use for scale must be
  * value-identical to the naive definitions they replace.
  */
class StatOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private def docsRaw(): Seq[(Long, String, String, Long)] =
    graft.Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  test("q178 histogram AUC equals the naive all-pairs Mann–Whitney count") {
    val rows = docsRaw().map(r => (r._2 == "en", r._4))
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    // naive O(n_pos·n_neg): 2 per strict win, 1 per tie
    val naive2U = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val got = q("q178_auc").collect().head
    assert(got.getLong(0) === naive2U)
    assert(got.getLong(1) === pos.size.toLong)
    assert(got.getLong(2) === neg.size.toLong)
  }

  test("q177 grid KS equals the naive per-source ECDF sup") {
    val rows = docsRaw()
    val all = rows.map(_._4).sorted
    val ng = all.size.toLong
    val got = q("q177_ks_drift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === rows.map(_._3).toSet)
    for ((src, (ksNum, nSrc, nAll)) <- got) {
      val sv = rows.filter(_._3 == src).map(_._4)
      val ns = sv.size.toLong
      // sup over every observed value of |cs·ng − cg·ns| (ECDF steps only
      // at observed values, so scanning them is the exact sup)
      val naive = all.distinct.map { v =>
        val cs = sv.count(_ <= v).toLong
        val cg = all.count(_ <= v).toLong
        math.abs(cs * ng - cg * ns)
      }.max
      assert(ksNum === naive, s"source=$src")
      assert(nSrc === ns)
      assert(nAll === ng)
    }
  }

  test("q184 Gini pair equals the closed-form over collected counts") {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val got = q("q184_gini").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((src, (nTypes, nTokens, gNum, gDen)) <- got) {
      val counts = toks.filter(_._1 == src).groupBy(_._2)
        .view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, c) => (c, t) }
      val n = counts.size.toLong
      val tot = counts.map(_._2).sum
      val num = counts.zipWithIndex.map { case ((_, c), i) =>
        (2L * (i + 1) - n - 1L) * c
      }.sum
      assert(nTypes === n, s"source=$src")
      assert(nTokens === tot, s"source=$src")
      assert(gNum === num, s"source=$src")
      assert(gDen === n * tot, s"source=$src")
      assert(gNum >= 0L && gNum <= gDen, s"Gini must lie in [0,1]: $src")
    }
  }

  test("q180 windowed EWMA equals the in-JVM per-user recursion") {
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3)))
      .toSeq
    val got = q("q180_ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((uid, seq) <- evs.groupBy(_._1)) {
      val ordered = seq.sortBy(e => (e._4.getTime, e._4.getNanos, e._2))
      ordered.zipWithIndex.foreach { case ((_, eid, _, _), i) =>
        // same term order and exact 2^-k scalings as the query
        val expect = (0 to 7).map { k =>
          val v = if (i - k >= 0) ordered(i - k)._3 else 0.0
          v / math.pow(2.0, k + 1)
        }.foldLeft(0.0)(_ + _)
        assert(got((uid, eid)) === expect, s"user=$uid event=$eid")
      }
    }
  }

  test("q182 calibration bins partition the scored corpus with consistent bounds") {
    val bins = q("q182_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(bins.nonEmpty)
    val nScored = q("q129_quality_classifier").count()
    assert(bins.map(_._2).sum === nScored,
      "every scored document lands in exactly one bin")
    for ((bin, n, nPos, minS, maxS, sumS) <- bins) {
      assert(nPos >= 0L && nPos <= n)
      assert(minS <= maxS)
      assert(minS >= bin * 2000L && maxS < (bin + 1) * 2000L,
        s"bin $bin bounds violated: [$minS, $maxS]")
      assert(sumS >= n * minS && sumS <= n * maxS)
    }
  }

  test("q183 vocabulary growth telescopes to the corpus vocabulary") {
    val rows = q("q183_vocab_growth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val vocab = graft.Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .distinct().count()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_._4).sum === vocab, "Σ new_types = |vocabulary|")
    assert(rows.last._5 === vocab, "final cumulative = |vocabulary|")
    assert(rows.map(_._2).sum === nDocs)
    // cumulative is the running sum of new_types in batch order
    assert(rows.map(_._5).toSeq === rows.map(_._4).scanLeft(0L)(_ + _).tail)
  }

  test("q181 chi-square cells: deviations sum to zero, marginals consistent") {
    val cells = q("q181_chi2_cells").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = cells.head._6
    assert(cells.map(_._3).sum === n, "Σ obs = n_total")
    assert(cells.map(_._7).sum === 0L,
      "Σ (obs·n − row·col) telescopes to n² − n² = 0")
    for ((src, lang, obs, rt, ct, nt, dev) <- cells) {
      assert(dev === obs * nt - rt * ct, s"cell ($src,$lang)")
      assert(nt === n)
    }
    // row marginal = Σ obs over the row
    cells.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum === rs.head._4, s"row marginal $src")
    }
    cells.groupBy(_._2).foreach { case (lang, cs) =>
      assert(cs.map(_._3).sum === cs.head._5, s"col marginal $lang")
    }
  }

  test("q179 Zipf probe: products consistent, frequency non-increasing in rank") {
    val rows = q("q179_zipf_probe").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    for ((_, rank, _, freq, rf) <- rows) assert(rf === rank * freq)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank === byRank.sorted.reverse,
        s"freq must be non-increasing in rank for $src")
    }
  }

  test("q185 head overlap equals the naive per-half rank-set intersection") {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val nDocs = graft.Tables.documents(spark, dir).count()
    def headRanks(half: Seq[String]): Map[String, Long] =
      half.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, f) => (-f, t) }
        .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val ra = headRanks(docs.filter(_._1 * 2 < nDocs).map(_._2))
    val rb = headRanks(docs.filterNot(_._1 * 2 < nDocs).map(_._2))
    val got = q("q185_head_overlap").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === Set(1L, 2L, 4L, 8L, 16L))
    for ((d, (overlap, ha, hb)) <- got) {
      val topA = ra.filter(_._2 <= d).keySet
      val topB = rb.filter(_._2 <= d).keySet
      assert(overlap === (topA & topB).size.toLong, s"d=$d")
      assert(ha === topA.size.toLong, s"d=$d")
      assert(hb === topB.size.toLong, s"d=$d")
    }
  }

  test("q186 Mann–Kendall equals the naive pairwise sign sum with tie-corrected variance") {
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("dd"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSeq
    val got = q("q186_trend").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    for ((typ, (nDays, s, var18)) <- got) {
      val cs = daily.filter(_._1 == typ).sortBy(_._2.getTime).map(_._3)
      val n = cs.size.toLong
      val naiveS = (for (i <- cs.indices; j <- (i + 1) until cs.size)
        yield java.lang.Long.signum(cs(j) - cs(i)).toLong).sum
      val tie18 = cs.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      assert(nDays === n, s"type=$typ")
      assert(s === naiveS, s"type=$typ")
      assert(var18 === n * (n - 1) * (2 * n + 5) - tie18, s"type=$typ")
    }
  }

  test("q187 assortativity pair equals the naive Pearson numerators over edges") {
    import spark.implicits._
    val tok = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFns.tokens(
          col("text")))).as("w"))
      .as[(Long, String)].collect().toSeq
    val pairCounts = tok.groupBy(_._1).values.flatMap { doc =>
      val ws = doc.map(_._2).distinct
      for (a <- ws; b <- ws if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val edges = pairCounts.sortBy { case ((a, b), c) => (-c, a, b) }
      .take(100).map(_._1)
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val xy = edges.flatMap(e =>
      Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m2 = xy.size.toLong
    val sx = xy.map(_._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val got = q("q187_assortativity").collect().head
    assert(got.getLong(0) === edges.size.toLong)
    assert(got.getLong(1) === m2 * sxy - sx * sx)
    assert(got.getLong(2) === m2 * sxx - sx * sx)
    assert(got.getLong(2) > 0L, "the co-occurrence graph must not be regular")
  }

  test("q188 Fano pair equals the naive zero-inclusive dispersion per token") {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val nDocs = graft.Tables.documents(spark, dir).count()
    val got = q("q188_burstiness").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size === 20)
    for ((token, (freq, present, num, den)) <- got) {
      val perDoc = toks.filter(_._2 == token).groupBy(_._1)
        .view.mapValues(_.size.toLong).values.toSeq
      val sx = perDoc.sum
      val sxx = perDoc.map(x => x * x).sum
      assert(freq === sx, s"token=$token")
      assert(present === perDoc.size.toLong, s"token=$token")
      // zero-count docs contribute nothing to Σx/Σx² but DO set n
      assert(num === nDocs * sxx - sx * sx, s"token=$token")
      assert(den === (nDocs - 1) * sx, s"token=$token")
    }
  }

  test("q190 association supports equal the naive in-JVM sessionized baskets") {
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    // sessionize: per user, sorted by (us, event_id), break on >30min gaps
    val baskets = evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val ordered = es.sortBy(e => (e._4, e._2))
      var sess = 0L
      var prev = Long.MinValue
      ordered.map { e =>
        if (prev == Long.MinValue || e._4 - prev > 1800000000L) sess += 1
        prev = e._4
        ((uid, sess), e._3)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).values.toSeq
    val n = baskets.size.toLong
    def sup(t: String) = baskets.count(_.contains(t)).toLong
    val got = q("q190_assoc_rules").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    for (((a, b), (sab, sa, sb, nGot)) <- got) {
      assert(sab === baskets.count(s => s.contains(a) && s.contains(b)).toLong,
        s"pair ($a,$b)")
      assert(sa === sup(a) && sb === sup(b) && nGot === n, s"pair ($a,$b)")
      assert(sab <= sa && sab <= sb, s"support monotonicity ($a,$b)")
    }
  }

  test("q201 sequence-pair supports equal the naive exists-before scan") {
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    // sessionized TYPE SEQUENCES (order preserved, not sets)
    val seqs = evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val ordered = es.sortBy(e => (e._4, e._2))
      var sess = 0L
      var prev = Long.MinValue
      ordered.map { e =>
        if (prev == Long.MinValue || e._4 - prev > 1800000000L) sess += 1
        prev = e._4
        ((uid, sess), e._3)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).values.toSeq
    val n = seqs.size.toLong
    // naive "exists i < j with t_i = a, t_j = b" per session
    def before(s: Seq[String], a: String, b: String): Boolean = {
      val fi = s.indexOf(a)
      fi >= 0 && s.lastIndexOf(b) > fi
    }
    val got = q("q201_sequence_pairs").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    for (((a, b), (sSeq, nGot)) <- got) {
      assert(sSeq === seqs.count(before(_, a, b)).toLong, s"pair ($a,$b)")
      assert(nGot === n)
    }
    // and no qualifying ordered pair is missing from the output
    val types = evs.map(_._3).distinct
    for (a <- types; b <- types if a != b) {
      val naive = seqs.count(before(_, a, b)).toLong
      if (naive > 0) assert(got.contains((a, b)), s"missing pair ($a,$b)")
    }
  }

  test("q213 sequence-triple supports equal the naive exists-chain scan") {
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    val seqs = evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val ordered = es.sortBy(e => (e._4, e._2))
      var sess = 0L
      var prev = Long.MinValue
      ordered.map { e =>
        if (prev == Long.MinValue || e._4 - prev > 1800000000L) sess += 1
        prev = e._4
        ((uid, sess), e._3)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).values.toSeq
    val n = seqs.size.toLong
    // naive "exists i < j < k with t_i = a, t_j = b, t_k = c"
    def chain(s: Seq[String], a: String, b: String, c: String): Boolean = {
      val fi = s.indexOf(a)
      if (fi < 0) false
      else {
        val bj = s.indexWhere(_ == b, fi + 1)
        bj >= 0 && s.lastIndexOf(c) > bj
      }
    }
    val got = q("q213_sequence_triples").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    for (((a, b, c), (sSeq, nGot)) <- got) {
      assert(sSeq === seqs.count(chain(_, a, b, c)).toLong,
        s"triple ($a,$b,$c)")
      assert(nGot === n)
    }
    // completeness: every qualifying distinct-type chain is present
    val types = evs.map(_._3).distinct
    for (a <- types; b <- types; c <- types
        if a != b && b != c && a != c) {
      val naive = seqs.count(chain(_, a, b, c)).toLong
      if (naive > 0) assert(got.contains((a, b, c)),
        s"missing triple ($a,$b,$c)")
    }
    // the chain is strictly stronger than its two pair legs
    val pairs = q("q201_sequence_pairs").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (((a, b, c), (sSeq, _)) <- got)
      assert(sSeq <= pairs.getOrElse((a, b), 0L) &&
        sSeq <= pairs.getOrElse((b, c), 0L),
        s"triple ($a,$b,$c) must not exceed its pair supports")
  }

  test("q220 RBO equals the naive truncated geometric sum over the collected heads") {
    val ranked = graft.queries.StatOps.headRanked(spark, dir)
      .select(col("fh"), col("t"), col("r")).collect()
      .map(r => (r.getBoolean(0), r.getString(1), r.getInt(2)))
    val ra = ranked.filter(_._1).map(x => x._2 -> x._3).toMap
    val rb = ranked.filterNot(_._1).map(x => x._2 -> x._3).toMap
    val num = (1 to 16).map { d =>
      val ov = ra.count { case (t, r) => r <= d && rb.get(t).exists(_ <= d) }
      ov.toLong * (720720L / d) * (1L << (16 - d))
    }.sum
    val got = q("q220_rbo").collect().head
    assert(got.getLong(0) === num, "rbo_num must equal the naive sum")
    assert(got.getLong(1) === 720720L * 65536L)
    assert(got.getLong(0) <= got.getLong(1),
      "RBO is a [0, 1] fraction: num <= den")
  }

  test("q219 attribution counts equal the naive per-occurrence window scan") {
    val W = 600000000L
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    val byUser = evs.groupBy(_._1)
    val got = q("q219_attribution_window").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    val types = evs.map(_._3).distinct
    for (a <- types; b <- types if a != b) {
      // naive: for every a-occurrence, does ANY same-user b land in
      // (ta, ta + W]?
      val nAttr = evs.count { e =>
        e._3 == a && byUser(e._1).exists(o =>
          o._3 == b && o._4 > e._4 && o._4 <= e._4 + W)
      }.toLong
      val nA = evs.count(_._3 == a).toLong
      if (nAttr > 0) {
        assert(got.contains((a, b)), s"missing pair ($a,$b)")
        assert(got((a, b)) === ((nAttr, nA)), s"pair ($a,$b)")
      } else assert(!got.contains((a, b)),
        s"pair ($a,$b) attributed nothing and must be absent")
    }
    // attribution is bounded by the a-occurrence count
    got.foreach { case ((a, b), (nAttr, nA)) =>
      assert(nAttr <= nA, s"($a,$b): n_attr must not exceed n_a") }
  }

  test("q206 source-vocabulary overlap equals naive pairwise set intersections") {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val vocab = toks.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = q("q206_source_vocab_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val srcs = vocab.keys.toSeq.sorted
    for (a <- srcs; b <- srcs if a < b) {
      val shared = (vocab(a) intersect vocab(b)).size.toLong
      if (shared > 0) {
        val (sh, na, nb) = got((a, b))
        assert(sh === shared, s"($a,$b)")
        assert(na === vocab(a).size.toLong && nb === vocab(b).size.toLong)
        assert(sh <= math.min(na, nb), "overlap bounded by both vocabularies")
      } else assert(!got.contains((a, b)))
    }
  }

  test("q209 Pareto table telescopes and matches naive per-source masses") {
    val masses = graft.Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = masses.values.sum
    val rows = q("q209_source_pareto").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === (1 to masses.size).toSeq)
    var running = 0L
    for ((rk, src, nt, cum, tot) <- rows) {
      assert(nt === masses(src), s"rank $rk $src")
      running += nt
      assert(cum === running, s"cumulative must telescope at rank $rk")
      assert(tot === total)
    }
    // descending mass with source tiebreak
    val order = rows.map(r => (-r._3, r._2))
    assert(order.toSeq === order.sorted.toSeq)
  }

  test("q191 top trigrams equal the naive per-user path count") {
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    val counts = evs.groupBy(_._1).values.flatMap { es =>
      val t = es.sortBy(e => (e._4, e._2)).map(_._3)
      t.sliding(3).filter(_.size == 3).map(s => (s(0), s(1), s(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expect = counts
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(10)
      .map { case ((a, b, c), n) => (a, b, c, n) }
    val got = q("q191_path_trigrams").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("q176 fixed-round k-core equals the convergence-mode solve on the same graph") {
    import spark.implicits._
    val tok = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFns.tokens(
          col("text")))).as("w"))
    val edges = tok.as("l").join(tok.as("r"),
        col("l.doc_id") === col("r.doc_id") && col("l.w") < col("r.w"))
      .groupBy(col("l.w").as("wa"), col("r.w").as("wb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("wa"), col("wb"))))
      .filter(col("r") <= 100)
    val conv = graft.operators.Components
      .kCoreUntil(edges, "wa", "wb", k = 7)
      .as[(String, Long)].collect().toMap
    val got = q("q176_kcore").as[(String, Long)].collect().toMap
    assert(got === conv,
      "4 fixed peel rounds must reach the fixpoint at this sf")
    assert(got.nonEmpty)
  }

  test("q195 grid W1 equals the naive per-source CDF-gap earth-mover") {
    val rows = docsRaw()
    val all = rows.map(_._4)
    val ng = all.size.toLong
    val vals = all.distinct.sorted
    val got = q("q195_w1_drift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === rows.map(_._3).toSet)
    for ((src, (w1Num, nSrc, nAll)) <- got) {
      val sv = rows.filter(_._3 == src).map(_._4)
      val ns = sv.size.toLong
      val naive = vals.zipAll(vals.drop(1), 0L, -1L).map { case (v, nx) =>
        val gap = if (nx == -1L) 0L else nx - v
        math.abs(sv.count(_ <= v) * ng - all.count(_ <= v) * ns) * gap
      }.sum
      assert(w1Num === naive, s"source=$src")
      assert(nSrc === ns && nAll === ng)
    }
  }

  test("q196 decile shift equals naive per-half lower deciles") {
    val rows = docsRaw()
    val n = rows.size.toLong
    def deciles(half: Seq[(Long, Long)]): Map[Int, Long] = {
      // lower decile: value at the smallest (v, id)-ordered rank with
      // 10·rank ≥ d·n
      val sorted = half.sortBy { case (id, v) => (v, id) }.map(_._2)
      val gn = sorted.size.toLong
      (1 to 9).map { dq =>
        dq -> sorted((((dq * gn + 9) / 10) - 1).toInt)
      }.toMap
    }
    val bySrc = rows.groupBy(_._3)
    val got = q("q196_decile_shift").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((src, rs) <- bySrc; dq <- 1 to 9) {
      val thenD = deciles(rs.filter(_._1 * 2 < n).map(r => (r._1, r._4)))
      val nowD = deciles(rs.filter(_._1 * 2 >= n).map(r => (r._1, r._4)))
      val (vThen, vNow, shift) = got((src, dq))
      assert(vThen === thenD(dq), s"$src d$dq then")
      assert(vNow === nowD(dq), s"$src d$dq now")
      assert(shift === nowD(dq) - thenD(dq), s"$src d$dq shift")
    }
  }

  test("q197 centroid drift equals the naive rounded-centroid cosine") {
    val emb = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray)).toSeq
    val n = emb.size.toLong
    def centroid(vs: Seq[Array[Float]]): Array[Double] = {
      val d = vs.head.length
      val s = new Array[Double](d)
      vs.foreach(v => (0 until d).foreach(i => s(i) += v(i)))
      s.map(x => BigDecimal(x / vs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = q("q197_centroid_drift").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap
    for ((lbl, vs) <- emb.groupBy(_._2)) {
      val thenV = vs.filter(_._1 * 2 < n).map(_._3)
      val nowV = vs.filter(_._1 * 2 >= n).map(_._3)
      val (ca, cb) = (centroid(thenV), centroid(nowV))
      val dot = ca.zip(cb).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(ca.map(x => x * x).sum) *
        math.sqrt(cb.map(x => x * x).sum))
      val (gotCos, nThen, nNow) = got(lbl)
      assert(math.abs(gotCos - cos) < 2e-6, s"label=$lbl got=$gotCos ref=$cos")
      assert(nThen === thenV.size.toLong && nNow === nowV.size.toLong)
    }
  }

  test("q198 novel-bigram counts equal naive per-source type-set difference") {
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    val n = docs.size.toLong
    def bigrams(text: String): Set[String] = {
      // the TextFns.tokens contract in plain JVM: lowercase, split on
      // whitespace runs, drop empties
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (t.length < 2) Set.empty
      else t.sliding(2).map(_.mkString(" ")).toSet
    }
    val got = q("q198_novel_bigrams").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((src, ds) <- docs.groupBy(_._2)) {
      val thenB = ds.filter(_._1 * 2 < n).flatMap(d => bigrams(d._3)).toSet
      val nowB = ds.filter(_._1 * 2 >= n).flatMap(d => bigrams(d._3)).toSet
      if (nowB.nonEmpty) {
        val (nNow, nNovel) = got(src)
        assert(nNow === nowB.size.toLong, s"source=$src")
        assert(nNovel === (nowB -- thenB).size.toLong, s"source=$src")
      }
    }
  }

  test("q225 autocorrelation equals naive lagged Pearson on dense daily counts") {
    // collected daily counts with the SAME day key (epoch day under the
    // UTC session) computed in plain JVM from the raw timestamps
    val byTypeDay = graft.Tables.events(spark, dir)
      .select("event_type", "ts")
      .collect()
      .map(r => (r.getString(0),
        Math.floorDiv(r.getTimestamp(1).getTime, 86400000L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q225_autocorrelation").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val types = byTypeDay.keySet.map(_._1)
    for (t <- types; k <- Seq(1, 2, 7)) {
      val days = byTypeDay.collect { case ((`t`, d), c) => d -> c }
      val (lo, hi) = (days.keys.min, days.keys.max)
      val series = (lo to hi).map(d => days.getOrElse(d, 0L))
      val pairs = series.dropRight(k).zip(series.drop(k))
      val n = pairs.size.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val (gn, gnum, gdx, gdy) = got((t, k))
      assert(gn === n, s"type=$t lag=$k")
      assert(gnum === n * sxy - sx * sy, s"type=$t lag=$k")
      assert(gdx === n * sxx - sx * sx, s"type=$t lag=$k")
      assert(gdy === n * syy - sy * sy, s"type=$t lag=$k")
    }
  }

  test("q225: a constructed 7-periodic stream scores lag-7 perfect, lag-1 weak") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ac7").toString
    val base = 1704067200L // 2024-01-01T00:00:00Z, seconds (epoch-ns loader)
    val pattern = Seq(9L, 2L, 4L, 1L, 3L, 1L, 2L)
    val rows = for {
      d <- 0 until 28
      j <- 0L until pattern(d % 7)
    } yield (d * 100L + j, (base + d * 86400L + j) * 1000000000L,
      1L, "pulse", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q225_autocorrelation")(spark, tmp)
      .collect()
      .map(r => r.getInt(1) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // lag 7: every pair is (x, x) — perfect correlation, r = 1 exactly:
    // num = den_x = den_y > 0
    val (num7, dx7, dy7) = got(7)
    assert(num7 === dx7 && dx7 === dy7 && num7 > 0L)
    // lag 1: decidedly sub-periodic — r² < 1/4 in exact integers
    val (num1, dx1, dy1) = got(1)
    assert(4L * num1 * num1 < dx1 * dy1,
      s"lag-1 num=$num1 den_x=$dx1 den_y=$dy1")
  }

  test("q242 Theil–Sen slope equals the naive median-of-pairwise-slopes on dense daily counts") {
    val byTypeDay = graft.Tables.events(spark, dir)
      .select("event_type", "ts")
      .collect()
      .map(r => (r.getString(0),
        Math.floorDiv(r.getTimestamp(1).getTime, 86400000L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q242_theil_sen").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (t <- byTypeDay.keySet.map(_._1)) {
      val days = byTypeDay.collect { case ((`t`, d), c) => d -> c }
      val (lo, hi) = (days.keys.min, days.keys.max)
      val series = (lo to hi).map(d => days.getOrElse(d, 0L))
      val pairs = for {
        i <- series.indices; j <- (i + 1) until series.size
      } yield (series(j) - series(i), (j - i).toLong)
      // the SAME total order the query uses: one IEEE ratio, then the
      // exact integer components
      val sorted = pairs.sortBy(p => (p._1.toDouble / p._2, p._1, p._2))
      val med = sorted(((pairs.size + 1) / 2) - 1)
      assert(got(t) === ((pairs.size.toLong, med._1, med._2)), s"type=$t")
    }
  }

  test("q242: an exactly linear stream recovers its slope whatever pair is the median") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_tsen").toString
    val base = 1704067200L // 2024-01-01T00:00:00Z, seconds (epoch-ns loader)
    // counts = 3 + 2·day: EVERY pairwise slope is exactly 2
    val rows = for {
      d <- 0 until 14
      j <- 0L until (3L + 2L * d)
    } yield (d * 1000L + j, (base + d * 86400L + j) * 1000000000L,
      1L, "linear", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q242_theil_sen")(spark, tmp).collect()
    assert(got.length === 1)
    val (np, num, den) = (got(0).getLong(1), got(0).getLong(2),
      got(0).getLong(3))
    assert(np === 14L * 13L / 2L)
    assert(num === 2L * den, s"slope must be exactly 2, got $num/$den")
  }

  test("q244 TWAP equals the naive per-(type, day) hold-forward weighting") {
    import org.apache.spark.sql.functions.{col => c, _}
    val rows = graft.Tables.events(spark, dir)
      .select(c("event_type"),
        datediff(to_date(c("ts")), to_date(lit("1970-01-01")))
          .cast("long").as("dd"),
        unix_micros(c("ts")).as("us"), c("event_id"),
        round(c("value") * lit(100)).cast("long").as("vc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val got = q("q244_twap").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (BigInt(r.getLong(2)), r.getLong(3), r.getLong(4)))
      .toMap
    val want = rows.groupBy(r => (r._1, r._2)).map { case (k, grp) =>
      val srt = grp.sortBy(r => (r._3, r._4))
      val gaps = srt.zip(srt.drop(1)).map { case (a, b) => (a._5, b._3 - a._3) }
      k -> ((gaps.map(g => BigInt(g._1) * g._2).sum, gaps.map(_._2).sum,
        grp.length.toLong))
    }
    assert(got === want)
  }

  test("q245 vocabulary richness equals the naive frequency-of-frequencies census") {
    val toks = graft.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(w => (r.getString(0), w)))
    val got = q("q245_vocab_richness").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    for (src <- toks.map(_._1).distinct) {
      val cs = toks.filter(_._1 == src).groupBy(_._2).map(_._2.length.toLong)
      val (n, v) = (cs.sum, cs.size.toLong)
      val f1 = cs.count(_ == 1L).toLong
      val f2 = cs.count(_ == 2L).toLong
      assert(got(src) === ((n, v, f1, f2,
        v * 2 * (f2 + 1) + f1 * (f1 - 1), 2 * (f2 + 1))), s"source=$src")
      // the estimator can never claim fewer types than observed
      assert(got(src)._5 >= got(src)._2 * got(src)._6, s"chao1 >= V, $src")
    }
  }

  test("q246 inter-arrival deciles equal the naive lower-decile scan over day-windowed gaps") {
    val evs = graft.Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = q("q246_interarrival_deciles").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (t <- evs.map(_._1).distinct) {
      val gaps = evs.filter(_._1 == t)
        .groupBy(e => Math.floorDiv(e._2, 86400000000L)).values
        .flatMap { day =>
          val srt = day.toSeq.sortBy(e => (e._2, e._3))
          srt.zip(srt.drop(1)).map { case (a, b) => b._2 - a._2 }
        }.toSeq.sorted
      val n = gaps.size
      for (dec <- 1 to 9) {
        // the q175 lower-quantile convention: value at the smallest rank
        // r with 10·r >= dec·n
        val r = (dec * n + 9) / 10
        assert(got((t, dec)) === gaps(r - 1), s"type=$t decile=$dec")
      }
    }
  }

  test("q236 Gram equals the naive JVM triangle on collected embeddings") {
    val vecs = graft.Tables.embeddings(spark, dir).select("embedding")
      .collect().map(_.getSeq[Float](0))
    def micro(x: Double): Long = {
      val y = x * 1e6
      if (y >= 0) math.floor(y + 0.5).toLong else math.ceil(y - 0.5).toLong
    }
    val ms = vecs.map(_.map(f => micro(f.toDouble)).toArray)
    val got = q("q236_embedding_gram").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size === 64 * 65 / 2)
    for (i <- 1 to 64; j <- i to 64) {
      val s = ms.map(m => m(i - 1) * m(j - 1)).sum
      assert(got((i, j)) === ((s, vecs.length.toLong)), s"cell ($i, $j)")
    }
  }

  test("q232 funnel: each constructed document is eaten by exactly the intended gate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val good = (1 to 40).map(i => s"w$i").mkString(" ") // 40 distinct tokens
    val german = (1 to 40).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, good, "en"),                                // survives everything
      (2L, good, "en"),                                // exact dup of 1 → stage 1
      (3L, german, "de"),                              // wrong lang → stage 2
      (4L, "just nine tokens of text sit right here now", "en"), // → stage 3
      (5L, Seq.fill(40)("spam").mkString(" "), "en"))  // ndt/nt = 1/40 → stage 4
      .map { case (id, t, l) => (id, t, l, "srcA", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q232_prep_funnel")(spark, tmp).collect()
      .map(r => r.getInt(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    def nt(i: Int) = docs(i - 1)._2.split("\\s+").length.toLong
    assert(got(1) === (("exact_dedup", 5L, 4L, 1L,
      nt(1) + nt(3) + nt(4) + nt(5))))
    assert(got(2) === (("lang_en", 4L, 3L, 1L, nt(1) + nt(4) + nt(5))))
    assert(got(3) === (("min_tokens_32", 3L, 2L, 1L, nt(1) + nt(5))))
    assert(got(4) === (("distinct_ratio_30", 2L, 1L, 1L, nt(1))))
  }

  test("q229 CUSUM equals the naive clamped recursion on dense daily counts") {
    // the query computes S via the prefix identity (P_t − min(0, min P),
    // max(0, max P) − P_t); the textbook definition is the per-day
    // clamped recursion — they must agree value-for-value
    val byTypeDay = graft.Tables.events(spark, dir)
      .select("event_type", "ts")
      .collect()
      .map(r => (r.getString(0),
        Math.floorDiv(r.getTimestamp(1).getTime, 86400000L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q229_cusum").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    var checked = 0
    for (t <- byTypeDay.keySet.map(_._1)) {
      val days = byTypeDay.collect { case ((`t`, d), c) => d -> c }
      val (lo, hi) = (days.keys.min, days.keys.max)
      val series = (lo to hi).map(d => d -> days.getOrElse(d, 0L))
      val k = series.map(_._2).sum / series.size
      var (up, dn) = (0L, 0L)
      for ((d, x) <- series) {
        up = math.max(0L, up + (x - k))
        dn = math.max(0L, dn + (k - x))
        assert(got((t, d)) === ((x, k, up, dn)), s"type=$t day=$d")
        checked += 1
      }
    }
    assert(checked === got.size, "the query emitted exactly the dense grid")
  }

  test("q229: a constructed level shift ramps cusum_up from the change day only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    val base = 1704067200L // 2024-01-01T00:00:00Z, seconds (epoch-ns loader)
    // 14 quiet days at 2/day, then 14 loud days at 8/day: k = 5 exactly
    val rows = for {
      d <- 0 until 28
      j <- 0L until (if (d < 14) 2L else 8L)
    } yield (d * 100L + j, (base + d * 86400L + j) * 1000000000L,
      1L, "deploy", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q229_cusum")(spark, tmp).collect()
      .map(r => (r.getLong(1), (r.getLong(3), r.getLong(4), r.getLong(5))))
      .sortBy(_._1).map(_._2)
    assert(got.forall(_._1 == 5L), "k_ref = mean daily count = 5")
    // quiet half: the upper cusum never leaves 0 (x − k = −3, clamped);
    // the lower ramps +3/day to 42
    assert(got.take(14).forall(_._2 == 0L))
    assert(got(13)._3 === 42L)
    // loud half: upper ramps +3/day from the change day to 42, lower
    // drains back to 0 — the change point is readable off the trajectory
    assert(got(20)._2 === 21L)
    assert(got(27)._2 === 42L)
    assert(got(27)._3 === 0L)
  }

  test("q251 dow seasonality: partition laws hold and match the naive census") {
    val rows = q("q251_dow_seasonality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // per type: Σ_dow c_td = c_t and Σ_dow d_td = d_t (both partitions)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sum === rs.head._5, "event counts partition c_t")
      assert(rs.map(_._4).sum === rs.head._6, "calendar days partition d_t")
    }
    // naive replay from collected (type, day) counts
    val byTypeDay = graft.Tables.events(spark, dir)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        Math.floorDiv(r.getTimestamp(1).getTime, 86400000L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (t, dow, cTd, dTd, cT, dT, idx) =>
      val days = byTypeDay.collect { case ((tt, dd), c) if tt == t => (dd, c) }
      val (lo, hi) = (days.map(_._1).min, days.map(_._1).max)
      assert(cT === days.map(_._2).sum)
      assert(dT === hi - lo + 1)
      assert(dTd === (lo to hi).count(_ % 7 == dow))
      assert(cTd === days.collect { case (dd, c) if dd % 7 == dow => c }.sum)
      assert(idx === cTd * dT * 1000000L / (dTd * cT))
    }
  }

  test("q252: a constructed level shift pins the split at the last low day; scores replay naively") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cp").toString
    val base = 1704067200L // 2024-01-01, day 19723
    val rows = for {
      d <- 0 until 20
      j <- 0L until (if (d < 10) 2L else 8L)
    } yield (d * 100L + j, (base + d * 86400L + j) * 1000000000L,
      1L, "deploy", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q252_changepoint")(spark, tmp).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(1) === 19723L + 9L, "split = last day of the low level")
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((10L, 10L, 20L, 80L)))
    // naive: the argmax split over all k replays the query's winner
    val counts = (0 until 20).map(d => if (d < 10) 2L else 8L)
    val best = (1 until 20).map { k =>
      val (s1, s2) = (counts.take(k).sum, counts.drop(k).sum)
      val d = (s1 * (20L - k) - s2 * k).toDouble
      (BigDecimal(d * d / (k.toLong * (20L - k)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, k)
    }.maxBy { case (s, k) => (s, -k) }
    assert(best._2 === 10, "naive argmax agrees")
    assert(r.getDouble(6) === best._1)
  }

  test("q254: a single spike flags exactly once; med/MAD replay naively") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rro").toString
    val base = 1704067200L
    val rows = for {
      d <- 0 until 20
      j <- 0L until (if (d == 15) 50L else 5L)
    } yield (d * 100L + j, (base + d * 86400L + j) * 1000000000L,
      1L, "api", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q254_rolling_robust_outliers")(spark, tmp)
      .collect()
    assert(got.length === 14, "only full 7-day windows emit (20 − 6)")
    val flagged = got.filter(_.getBoolean(5)).map(_.getLong(1)).toSeq
    assert(flagged === Seq(19723L + 15L), "exactly the spike day flags")
    // the spike entering the TRAILING window never shifts the median
    // (6 of 7 values are 5), so no post-spike day misflags
    assert(got.forall(_.getLong(3) === 5L), "rolling median stays at 5")
    // naive replay on real sf0.001 data
    val byTypeDay = graft.Tables.events(spark, dir)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        Math.floorDiv(r.getTimestamp(1).getTime, 86400000L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val real = q("q254_rolling_robust_outliers").collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val (t, dd) = (r.getString(0), r.getLong(1))
      val days = byTypeDay.collect { case ((tt, d2), c) if tt == t => (d2, c) }
      val lo = days.map(_._1).min
      def cAt(d2: Long) = days.toMap.getOrElse(d2, 0L)
      assert(dd - 6 >= lo, "only full windows emit")
      val win = (dd - 6 to dd).map(cAt).sorted
      val med = win(3)
      val mad = (dd - 6 to dd).map(d2 => math.abs(cAt(d2) - med)).sorted.apply(3)
      assert(r.getLong(2) === cAt(dd))
      assert(r.getLong(3) === med)
      assert(r.getLong(4) === mad)
      assert(r.getBoolean(5) === (math.abs(cAt(dd) - med) > 3 * mad))
    }
  }

  test("q259 markov transitions: full grid, row sums, smoothing law, naive counts") {
    val rows = q("q259_markov_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val v = rows.head._5
    assert(rows.length === v * v, "the full V x V grid, zero cells included")
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sum === rs.head._4, "counts partition row_total")
    }
    rows.foreach { case (_, _, c, tot, vv, p) =>
      assert(p === (c + 1) * 1000000L / (tot + vv), "Laplace smoothing law")
    }
    // naive transition counts from per-user (ts, event_id)-sorted walks
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val naive = evs.groupBy(_._1).values.flatMap { us =>
      val seq = us.sortBy(e => (e._2, e._3)).map(_._4)
      seq.zip(seq.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (p, n, c, _, _, _) =>
      assert(c === naive.getOrElse((p, n), 0L), s"count mismatch at ($p, $n)")
    }
  }

  test("q261 bootstrap: resample masses concentrate at n and the CI covers the truth") {
    val rows = q("q261_bootstrap_ci").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 100, "one row per resample")
    rows.foreach { case (_, nEff, sumVal, mean) =>
      assert(mean === sumVal * 1000000L / nEff, "mean law")
    }
    val d0 = graft.Tables.documents(spark, dir)
      .select("n_chars").collect().map(_.getLong(0))
    val n = d0.length.toLong
    // Poisson(1) multiplicities: E[n_eff] = n, σ = √n — all 100 resample
    // masses inside ±5σ is a deterministic fact of the fixed hash family
    rows.foreach { case (b, nEff, _, _) =>
      assert(math.abs(nEff - n) <= 5 * math.sqrt(n.toDouble),
        s"resample $b mass $nEff far from $n")
    }
    // the 5th–95th percentile band of resample means covers the true mean
    val means = rows.map(_._4).sorted
    val trueMean = d0.sum * 1000000L / n
    assert(means(5) <= trueMean && trueMean <= means(94),
      s"CI [${means(5)}, ${means(94)}] must cover $trueMean")
  }

  test("q262 A/B readout: cells replay naively from the md5 arm split; chi2 law") {
    def hash32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val evs = graft.Tables.events(spark, dir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = evs.groupBy(_._1).view.mapValues { es =>
      val np = es.count(_._2 == "purchase")
      val ne = es.count(_._2 == "error")
      np > ne
    }.toMap
    def cell(arm: String, conv: Boolean) = byUser.count { case (u, c) =>
      (if (hash32(s"arm:$u") % 2 == 0) "A" else "B") == arm && c == conv
    }.toLong
    val r = q("q262_ab_readout").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((cell("A", true), cell("A", false), cell("B", true), cell("B", false))))
    val (a, b2, c2, d2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getLong(4) === a + b2 + c2 + d2)
    assert(r.getLong(5) === a * d2 - b2 * c2)
    // the four MARGINALS ship exact instead of their int64 product,
    // which wraps past ~110k users (ADVICE r17)
    assert(r.getLong(6) === a + b2)
    assert(r.getLong(7) === c2 + d2)
    assert(r.getLong(8) === a + c2)
    assert(r.getLong(9) === b2 + d2)
    val den = (a + b2).toDouble * (c2 + d2) * (a + c2) * (b2 + d2)
    val n = (a + b2 + c2 + d2).toDouble
    val dv = (a * d2 - b2 * c2).toDouble
    assert(r.getDouble(10) ===
      BigDecimal(n * dv * dv / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q265 coverage curve: crossing law and naive replay") {
    val rows = q("q265_coverage_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(500L, 900L, 990L, 999L))
    // n_types is monotone in the threshold
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted)
    // naive replay from collected token counts
    val toks = graft.Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map { case (w, c) => (w, c) }
      .sortBy { case (w, c) => (-c, w) }
    val tot = counts.map(_._2).sum
    rows.foreach { case (t, nTypes, tok, cum, totG) =>
      assert(totG === tot)
      val cums = counts.scanLeft(0L)(_ + _._2).tail
      val idx = cums.indexWhere(cm => 1000L * cm >= t * tot)
      assert(nTypes === idx + 1)
      assert(tok === counts(idx)._1)
      assert(cum === cums(idx))
    }
  }

  test("q266 waterfill: hand case (10/20/100, B=52) and exact-budget law") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_wf").toString
    // token counts per source: a=10, b=20, c=100 → B = 2·130/5 = 52 →
    // a, b keep everything; c capped at 22
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("tok").mkString(" "), "en", src, n.toLong)
    (Seq(doc(1, "a", 10), doc(2, "b", 20)) ++
      (0 until 4).map(i => doc(10 + i, "c", 25)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q266_source_waterfill")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(("a", 10L, 10L, false), ("b", 20L, 20L, false),
      ("c", 100L, 22L, true)))
    // real data: Σ alloc = B exactly; alloc ≤ n; caps uniform within ±1
    val real = q("q266_source_waterfill").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val totReal = real.map(_._1).sum
    assert(real.map(_._2).sum === totReal * 2 / 5,
      "allocations must sum to the budget EXACTLY")
    assert(real.forall { case (n, a, _) => a <= n })
    val caps = real.filter(_._3).map(_._2)
    if (caps.nonEmpty) assert(caps.max - caps.min <= 1,
      "capped sources share a uniform cap within the remainder ±1")
  }

  test("q267 cross-correlation equals naive lagged Pearson on dense daily counts") {
    val rows = q("q267_cross_correlation").collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows.nonEmpty)
    val byTypeDay = graft.Tables.events(spark, dir)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        Math.floorDiv(r.getTimestamp(1).getTime, 86400000L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = byTypeDay.keySet.map(_._1).toSeq.sorted
    def dense(t: String): Map[Long, Long] = {
      val ds = byTypeDay.collect { case ((tt, d2), c) if tt == t => (d2, c) }
      val (lo, hi) = (ds.map(_._1).min, ds.map(_._1).max)
      (lo to hi).map(d2 => d2 -> ds.toMap.getOrElse(d2, 0L)).toMap
    }
    for (ta <- types; tb <- types if ta < tb; lag <- -7L to 7L) {
      val (da, db) = (dense(ta), dense(tb))
      val pts = da.keys.toSeq.sorted.flatMap { d2 =>
        db.get(d2 + lag).map(y => (da(d2), y))
      }
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val (sxx, syy) = (pts.map(p => p._1 * p._1).sum,
        pts.map(p => p._2 * p._2).sum)
      assert(rows((ta, tb, lag)) ===
        ((n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)),
        s"mismatch at ($ta, $tb, lag=$lag)")
    }
  }

  test("q269 TPC-H Q18: every surviving order exceeds the HAVING threshold; top-100 ordered") {
    val rows = q("q269_tpch_q18").collect()
      .map(r => (r.getLong(2), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_._3 > 180L), "HAVING sum(l_quantity) > 180")
    val ord = rows.map { case (ok, price, _) => (-price, ok) }.toSeq
    assert(ord === ord.sorted, "(o_totalprice DESC, o_orderkey) order")
    // the per-order quantity re-aggregation matches a naive recount
    val naive = graft.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").sum("l_quantity").collect()
      .map(r => r.getLong(0) -> r.getDouble(1).toLong).toMap
    rows.foreach { case (ok, _, qty) => assert(naive(ok) === qty) }
  }

  test("q270 lang confusion: cells partition the corpus and replay q33's predictions") {
    val rows = q("q270_lang_confusion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_._3).sum === nDocs, "cells partition the corpus")
    rows.foreach { case (a, p, _, c) => assert(c === (a == p)) }
    // cell counts ≡ a recount of q33's own per-doc predictions
    val preds = q("q33_lang_id").collect()
      .map(r => (r.getString(1), r.getAs[String]("predicted")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (a, p, n, _) =>
      assert(preds((a, p)) === n, s"cell ($a, $p)") }
  }

  test("q271 skew profiler: laws hold and the hottest key replays naively") {
    val rows = q("q271_join_skew_profiler").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.length === 3)
    rows.foreach { case (_, nRows, nKeys, maxC, _, num, den) =>
      assert(num === maxC * nKeys && den === nRows)
      assert(num >= den, "max·keys ≥ rows (skew ratio ≥ 1) by definition")
    }
    val ev0 = graft.Tables.events(spark, dir).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hottest = ev0.minBy { case (k, c) => (-c, k) }
    val er = rows.find(_._1 == "events").get
    assert((er._4, er._5) === ((hottest._2, hottest._1)))
    assert(er._2 === ev0.map(_._2).sum && er._3 === ev0.length.toLong)
  }

  test("q273 Q4 shape: every counted order has a late lineitem; none double-counts") {
    val rows = q("q273_tpch_q4").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // naive replay: date-ranged orders with ≥1 lineitem shipped > 30 days
    // after the order date, counted once regardless of late-line count
    val ords = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter { case (_, t, _) =>
        t >= 820454400000000L && t < 828316800000000L } // [1996-01-01, 1996-04-01) UTC µs
    val ship = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), unix_micros(col("l_shipdate").cast("timestamp")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val naive = ords.filter { case (ok, t, _) =>
      ship.get(ok).exists(_ > t + 30L * 86400000000L) }
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    assert(rows.toMap === naive)
  }

  test("q274 RFM: quintile law, balanced cells, and a naive per-user replay") {
    val rows = q("q274_rfm_segments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val n = rows.length
    assert(n > 0)
    rows.foreach { case (_, _, _, _, rq, fq, mq, seg) =>
      assert(rq >= 1 && rq <= 5 && fq >= 1 && fq <= 5 && mq >= 1 && mq <= 5)
      assert(seg === rq * 100 + fq * 10 + mq)
    }
    // each dimension's quintiles are balanced within ±1 of n/5
    Seq[((Long, Long, Long, Long, Long, Long, Long, Long)) => Long](
      _._5, _._6, _._7).foreach { dim =>
      val sizes = rows.groupBy(dim).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"quintiles unbalanced: $sizes")
    }
    // naive replay of one dimension: frequency quintile by (f, user) rank
    val byF = rows.sortBy(r => (r._3, r._1))
    byF.zipWithIndex.foreach { case (r, i) =>
      assert(r._6 === i.toLong * 5 / n + 1, s"fq mismatch for user ${r._1}")
    }
  }

  test("q275 interval coverage: laws hold and a constructed two-session user is exact") {
    val rows = q("q275_interval_coverage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nS, act, span) =>
      assert(nS >= 1 && act >= 0 && act <= span,
        "active time can never exceed the first→last span")
    }
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cov").toString
    val base = 1704067200L
    // u1: [0, 10 min] then a 2 h gap then [130 min, 135 min] →
    // active 15 min of a 135-min span; u2: one event → span 0, pm NULL
    Seq((1L, base, 1L), (2L, base + 600, 1L),
        (3L, base + 7800, 1L), (4L, base + 8100, 1L),
        (5L, base, 2L))
      .map { case (id, t, u) => (id, t * 1000000000L, u, "e", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q275_interval_coverage")(spark, tmp)
      .collect()
    val u1 = got.find(_.getLong(0) == 1L).get
    assert((u1.getLong(1), u1.getLong(2), u1.getLong(3), u1.getLong(4)) ===
      ((2L, 900000000L, 8100000000L, 900L * 1000 / 8100)))
    val u2 = got.find(_.getLong(0) == 2L).get
    assert(u2.getLong(1) === 1L && u2.getLong(3) === 0L && u2.isNullAt(4),
      "a zero-span user's active share is NULL, not 0 or 1")
  }

  test("q276 survival curve: monotone non-increasing; replays naive lifespans") {
    val rows = q("q276_survival_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val alive = rows.sortBy(_._1).map(_._2)
    assert(alive.zip(alive.tail).forall { case (a, b) => b <= a },
      "survival never increases with the horizon")
    val life = graft.Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long").as("dd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(ds => ds.map(_._2).max - ds.map(_._2).min).toMap
    rows.foreach { case (k, nAlive, nTotal, sm) =>
      assert(nTotal === life.size.toLong)
      assert(nAlive === life.values.count(_ >= k).toLong, s"horizon $k")
      assert(sm === nAlive * 1000000L / nTotal)
    }
  }

  test("q277 mixture diversity: bounds, naive replay, and the two-equal-sources pin") {
    val r = q("q277_mixture_diversity").collect().head
    val (nS, tot, sumSq, maxN) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val d2 = r.getDouble(4)
    assert(d2 >= 1.0 && d2 <= nS.toDouble, "1 ≤ D₂ ≤ n_sources")
    // naive replay from collected per-source token counts
    val ns = graft.Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long"))
      .collect().map(r2 => (r2.getString(0), r2.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(nS === ns.size.toLong && tot === ns.values.sum)
    assert(sumSq === ns.values.map(v => v * v).sum && maxN === ns.values.max)
    assert(r.getLong(5) === maxN * 1000000L / tot)
    // a two-equal-sources corpus is exactly 2.0 effective sources
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_d2").toString
    Seq((1L, "a b c d e", "en", "s1", 9L), (2L, "a b c d e", "en", "s2", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val h = SparkEntry.queries("q277_mixture_diversity")(spark, tmp)
      .collect().head
    assert(h.getDouble(4) === 2.0 && h.getLong(5) === 500000L)
  }

  test("q279 Q12 shape: counts partition the date-ranged join naively") {
    val rows = q("q279_tpch_q12").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val pri = graft.Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val lines = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter { case (_, _, t) =>
        t >= 820454400000000L && t < 852076800000000L }
    val naive = lines.groupBy(_._2).view.mapValues { ls =>
      val high = ls.count(l =>
        Set("1-URGENT", "2-HIGH")(pri(l._1)))
      (high.toLong, (ls.length - high).toLong)
    }.toMap
    rows.foreach { case (rf, hi, lo) =>
      assert(naive(rf) === ((hi, lo)), s"flag $rf") }
  }
}
