package graft

import graft.operators.Components

/** Iterative graph-algorithm semantics: personalized PageRank, HITS,
  * warm starts, k-core/k-truss, label propagation — split from
  * ComponentsSpec (r22) so the sharded test groups can run the two
  * halves of the 325 s graph suite in parallel.
  */
class GraphIterSpec extends SparkSpec {
  import spark.implicits._


  /** Same helper as ComponentsSpec.pr — the warm-start identities below
    * compare against plain pageRank runs. */
  private def pr(edges: Seq[(String, String, Long)],
      iters: Int = 3): Map[String, Long] =
    Components.pageRank(edges.toDF("s", "d", "w"), "s", "d", Some("w"), iters)
      .as[(String, Long)].collect().toMap
  // --- personalized PageRank ---

  /** Driver-side reference of the seed-anchored fixed-point recurrence:
    * teleport and dangling mass land on the seed set only. */
  private def refPpr(edges: Seq[(String, String, Long)], seeds: Set[String],
      iters: Int, dampPct: Int = 85,
      unit: Long = 1000000L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val s = nodes.count(seeds)
    val tele = ((100 - dampPct).toLong * unit * n) / (100L * s)
    var r = nodes.map(_ -> unit).toMap
    (1 to iters).foreach { _ =>
      val dang = nodes.filterNot(outW.contains).map(r).sum
      val dps = dang / s
      val in = edges.groupBy(_._2).view.mapValues(_.map {
        case (src, _, w) => (r(src) / outW(src)) * w }.sum).toMap
      r = nodes.map(id => id -> ((if (seeds(id)) tele else 0L) +
        dampPct * (in.getOrElse(id, 0L) +
          (if (seeds(id)) dps else 0L)) / 100)).toMap
    }
    r
  }

  private def ppr(edges: Seq[(String, String, Long)], seeds: Seq[String],
      iters: Int = 3): Map[String, Long] =
    Components.personalizedPageRank(edges.toDF("s", "d", "w"), "s", "d",
        Some("w"), seeds.toDF("seed"), "seed", iters)
      .as[(String, Long)].collect().toMap

  test("personalizedPageRank matches the driver-side recurrence exactly") {
    val edges = Seq(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 1L),
      ("a", "d", 1L), ("d", "a", 2L), ("e", "a", 4L))
    assert(ppr(edges, Seq("a")) === refPpr(edges, Set("a"), 3))
    assert(ppr(edges, Seq("a", "c")) === refPpr(edges, Set("a", "c"), 3))
  }

  test("personalizedPageRank: mass stays seed-anchored") {
    // e points INTO the cycle but nothing points to e: without a uniform
    // teleport floor its rank must decay to exactly 0, while the seed
    // and its neighborhood hold all the mass
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("e", "a", 1L))
    val out = ppr(edges, Seq("a"), iters = 3)
    assert(out("e") === 0L, "a node unreachable from the seeds holds no mass")
    assert(out("a") > out("b"), "the seed anchors the most mass")
    assert(out("b") > 0L, "the seed's successor receives flow")
  }

  test("personalizedPageRank: dangling mass returns to the seeds") {
    // d is dangling; its mass must flow to seed a, not be spread uniformly
    val edges = Seq(("a", "d", 1L), ("b", "a", 1L), ("a", "b", 1L))
    val withDang = ppr(edges, Seq("a"), iters = 2)
    assert(withDang === refPpr(edges, Set("a"), 2))
    assert(withDang("a") > withDang("d"))
  }

  test("personalizedPageRank requires a seed present in the graph") {
    val edges = Seq(("a", "b", 1L))
    val ex = intercept[IllegalArgumentException] {
      ppr(edges, Seq("zzz"), iters = 1)
    }
    assert(ex.getMessage.contains("seed"))
  }

  test("personalizedPageRank on an empty edge frame returns an empty frame") {
    val out = Components.personalizedPageRank(
      Seq.empty[(String, String, Long)].toDF("s", "d", "w"), "s", "d",
      Some("w"), Seq("a").toDF("seed"), "seed", 2)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("id", "rank"))
  }

  test("personalizedPageRank is deterministic across partitionings") {
    val edges = (1L to 200L).map(i => (s"u${i % 13}", s"u${(i * 5) % 13}",
      1L + i % 4))
    val one = Components.personalizedPageRank(
      edges.toDF("s", "d", "w").repartition(1), "s", "d", Some("w"),
      Seq("u1", "u5").toDF("seed"), "seed", 3)
      .as[(String, Long)].collect().toSet
    val many = Components.personalizedPageRank(
      edges.toDF("s", "d", "w").repartition(11), "s", "d", Some("w"),
      Seq("u1", "u5").toDF("seed"), "seed", 3)
    assert(many.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "ppr must return a materialized cut, like pageRank")
    assert(many.as[(String, Long)].collect().toSet === one)
  }

  // Driver-side HITS recurrence mirroring Components.hits exactly:
  // auth from previous hubs, hubs from the JUST-updated auths, each side
  // rescaled by the truncated factor max(1, S div (n·unit)).
  private def refHits(edges: Seq[(String, String, Long)], iters: Int,
      unit: Long = 1000000L): Map[String, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val target = nodes.size * unit
    var hub = nodes.map(_ -> unit).toMap
    var auth = nodes.map(_ -> unit).toMap
    (1 to iters).foreach { _ =>
      val araw = nodes.map(v => v ->
        edges.filter(_._2 == v).map { case (u, _, w) => w * hub(u) }.sum).toMap
      val advr = math.max(araw.values.sum / target, 1L)
      auth = araw.map { case (v, r) => v -> r / advr }
      val hraw = nodes.map(u => u ->
        edges.filter(_._1 == u).map { case (_, v, w) => w * auth(v) }.sum).toMap
      val hdvr = math.max(hraw.values.sum / target, 1L)
      hub = hraw.map { case (u, r) => u -> r / hdvr }
    }
    nodes.map(v => v -> ((auth(v), hub(v)))).toMap
  }

  private def hitsMap(edges: Seq[(String, String, Long)],
      iters: Int): Map[String, (Long, Long)] =
    Components.hits(edges.toDF("s", "d", "w"), "s", "d", Some("w"), iters)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("hits matches the driver-side recurrence exactly (short and long runs)") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "c", 5L), ("d", "a", 2L))
    assert(hitsMap(edges, 2) === refHits(edges, 2))
    assert(hitsMap(edges, 4) === refHits(edges, 4))
  }

  test("hits: a directory node is the top hub, its popular target the top auth") {
    // d links to every authority; everyone links to a1
    val edges = Seq(("d", "a1", 1L), ("d", "a2", 1L), ("d", "a3", 1L),
      ("u1", "a1", 1L), ("u2", "a1", 1L), ("u3", "a1", 1L))
    val out = hitsMap(edges, 3)
    assert(out === refHits(edges, 3))
    val topHub = out.maxBy(_._2._2)._1
    val topAuth = out.maxBy(_._2._1)._1
    assert(topHub === "d", s"the directory must be the top hub, got $topHub")
    assert(topAuth === "a1", s"the in-degree magnet must be the top authority, got $topAuth")
  }

  test("hits on an empty edge frame returns an empty frame") {
    val out = Components.hits(
      Seq.empty[(String, String, Long)].toDF("s", "d", "w"), "s", "d",
      Some("w"), 2)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("id", "auth", "hub"))
  }

  test("hits is deterministic across partitionings and eagerly cut") {
    val edges = (1L to 200L).map(i => (s"u${i % 13}", s"u${(i * 5) % 13}",
      1L + i % 4))
    val one = Components.hits(edges.toDF("s", "d", "w").repartition(1),
      "s", "d", Some("w"), 2).as[(String, Long, Long)].collect().toSet
    val many = Components.hits(edges.toDF("s", "d", "w").repartition(11),
      "s", "d", Some("w"), 2)
    assert(many.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "hits must return a materialized cut, like pageRank")
    assert(many.as[(String, Long, Long)].collect().toSet === one,
      "fixed-point arithmetic must not depend on partitioning")
  }

  test("pageRank warm start: seeded continuation ≡ one longer cold run") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "c", 5L))
    val cold5 = pr(edges, 5)
    val k2 = Components.pageRank(edges.toDF("s", "d", "w"), "s", "d",
      Some("w"), 2)
    val resumed = Components.pageRank(edges.toDF("s", "d", "w"), "s", "d",
        Some("w"), 3, seed = Some(k2))
      .as[(String, Long)].collect().toMap
    assert(resumed === cold5,
      "pageRank(k+m) must equal pageRank(m, seed = pageRank(k))")
    // nodes absent from the seed start at unit: an empty seed IS the cold run
    val emptySeed = Seq.empty[(String, Long)].toDF("id", "rank")
    assert(Components.pageRank(edges.toDF("s", "d", "w"), "s", "d",
        Some("w"), 5, seed = Some(emptySeed))
      .as[(String, Long)].collect().toMap === cold5)
  }

  test("hits warm start: seeded continuation ≡ one longer cold run") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "c", 5L), ("d", "a", 2L))
    val cold4 = hitsMap(edges, 4)
    val k2 = Components.hits(edges.toDF("s", "d", "w"), "s", "d",
      Some("w"), 2)
    val resumed = Components.hits(edges.toDF("s", "d", "w"), "s", "d",
        Some("w"), 2, seed = Some(k2))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(resumed === cold4,
      "hits(k+m) must equal hits(m, seed = hits(k))")
  }

  test("pageRankUntil warm start: a converged seed meets the budget at once") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "c", 5L))
    val (cold, coldRounds) = Components.pageRankUntil(
      edges.toDF("s", "d", "w"), "s", "d", Some("w"), deltaL1 = 5L,
      maxIters = 200)
    val (warm, warmRounds) = Components.pageRankUntil(
      edges.toDF("s", "d", "w"), "s", "d", Some("w"), deltaL1 = 5L,
      maxIters = 200, seed = Some(cold))
    // the stop test re-arms from the seed, and the persistent truncation
    // cycle can exceed the budget for a round or two before settling —
    // "almost immediately" is a handful of rounds, not exactly one
    assert(warmRounds <= 4,
      s"a converged seed must stop almost immediately, ran $warmRounds")
    assert(warmRounds < coldRounds)
    // resumability: the warm run IS the cold trajectory continued
    assert(warm.as[(String, Long)].collect().toMap ===
      pr(edges, coldRounds + warmRounds))
  }

  test("q167 double-run: a cache-stressed session cannot change PPR values") {
    // the q157/q166 determinism contract, applied to the seeded variant
    val dir = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("q167_personalized_pagerank")(spark, dir)
    val baseline = run().collect().map(_.toSeq).toSeq
    assert(baseline.nonEmpty)
    val deferred = run()
    val hogs = (1 to 6).map { i =>
      val h = spark.range(0L, 150000L, 1L, 4)
        .select((org.apache.spark.sql.functions.col("id") * i).as("v"),
          org.apache.spark.sql.functions.sha2(
            org.apache.spark.sql.functions.col("id").cast("string"), 256).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      h.count(); h
    }
    System.gc(); Thread.sleep(50)
    spark.sqlContext.clearCache()
    hogs.foreach(_.unpersist(blocking = true))
    System.gc(); Thread.sleep(50)
    assert(deferred.collect().map(_.toSeq).toSeq === baseline,
      "PPR output depended on post-call session state")
    assert(run().collect().map(_.toSeq).toSeq === baseline,
      "a fresh second run must be bit-identical")
  }

  test("q166 double-run: a cache-stressed session cannot change hits values") {
    // mirror of the q157 case: per-round persist-cuts fix the values at
    // call time; churning caches + the ContextCleaner afterwards must not
    // change a deferred collect, and a fresh run must be bit-identical
    val dir = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("q166_hits")(spark, dir)
    val baseline = run().collect().map(_.toSeq).toSeq
    assert(baseline.nonEmpty)
    val deferred = run()
    val hogs = (1 to 6).map { i =>
      val h = spark.range(0L, 150000L, 1L, 4)
        .select((org.apache.spark.sql.functions.col("id") * i).as("v"),
          org.apache.spark.sql.functions.sha2(
            org.apache.spark.sql.functions.col("id").cast("string"), 256).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      h.count(); h
    }
    System.gc(); Thread.sleep(50)
    spark.sqlContext.clearCache()
    hogs.foreach(_.unpersist(blocking = true))
    System.gc(); Thread.sleep(50)
    val stressed = deferred.collect().map(_.toSeq).toSeq
    assert(stressed === baseline,
      "hits output depended on post-call session state")
    assert(run().collect().map(_.toSeq).toSeq === baseline,
      "a fresh second run must be bit-identical")
  }

  test("pageRankUntil with a loose budget stops earlier, never later") {
    val edges = (1L to 300L).map(i =>
      (s"v${i % 23}", s"v${(i * 11) % 23}", 1L + i % 3))
    val (_, tight) = Components.pageRankUntil(edges.toDF("s", "d", "w"),
      "s", "d", Some("w"), deltaL1 = 23L, maxIters = 200)
    val (_, loose) = Components.pageRankUntil(edges.toDF("s", "d", "w"),
      "s", "d", Some("w"), deltaL1 = 100000L, maxIters = 200)
    assert(loose <= tight)
    assert(loose >= 1)
  }

  // ---- k-core peeling ----

  private def kc(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] =
    Components.kCore(edges.toDF("a", "b"), "a", "b", k, rounds)
      .as[(Long, Long)].collect().toMap

  /** In-JVM reference peeling to the fixpoint. */
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

  // clique {1,2,3,4} plus node 5 with exactly three neighbors (1, 4, 6)
  // and pendant 6: peeling to the 3-core takes TWO rounds — 6 (degree 1)
  // drops first, only THEN does 5 fall under degree 3 — so the
  // multi-round shell cascade is exercised, not just one sweep
  private val cliqueTail = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
    (2L, 4L), (3L, 4L), (1L, 5L), (4L, 5L), (5L, 6L))

  test("kCore peels a pendant path off a clique over multiple rounds") {
    assert(kc(cliqueTail, 3, 4) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(kc(cliqueTail, 3, 4) === refCore(cliqueTail, 3))
    // one round is NOT enough: 5 is still in the subgraph (only 6 fell),
    // so 1 and 4 still count their edge to it — degree 4, not the final 3
    assert(kc(cliqueTail, 3, 1) ===
      Map(1L -> 4L, 2L -> 3L, 3L -> 3L, 4L -> 4L),
      "after one round the cascade must not have finished")
  }

  test("kCore ignores direction, multi-edges and self-loops") {
    val messy = cliqueTail ++ Seq((2L, 1L), (1L, 2L), (3L, 3L), (4L, 3L))
    assert(kc(messy, 3, 4) === kc(cliqueTail, 3, 4))
  }

  test("kCore above the max degree is empty; k=1 keeps every non-isolated node") {
    assert(kc(cliqueTail, 4, 8) === Map.empty)
    assert(kc(cliqueTail, 1, 8) === refCore(cliqueTail, 1))
    assert(kc(Seq.empty[(Long, Long)], 2, 4) === Map.empty)
  }

  test("kCoreUntil converges to the fixed-round result and the reference") {
    for (k <- 2 to 4) {
      val conv = Components.kCoreUntil(cliqueTail.toDF("a", "b"), "a", "b", k)
        .as[(Long, Long)].collect().toMap
      assert(conv === refCore(cliqueTail, k), s"k=$k")
      assert(conv === kc(cliqueTail, k, 8), s"k=$k fixed-round ≥ depth")
    }
  }

  test("kCore extra rounds past convergence are exact no-ops") {
    assert(kc(cliqueTail, 3, 4) === kc(cliqueTail, 3, 12))
  }

  test("coreLevels: ascending continuation equals per-k from-scratch cores") {
    // nested-cores theorem made operational: peeling rung k+1 from rung
    // k's survivors must land exactly where a from-scratch solve does
    val ks = Seq(1, 2, 3)
    val got = Components.coreLevels(cliqueTail.toDF("a", "b"), "a", "b",
        ks, rounds = 8)
      .as[(Long, Long)].collect().toMap
    val expect = ks.flatMap { k =>
      refCore(cliqueTail, k).keys.map(_ -> k.toLong)
    }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(got === expect)
    // the clique sits on the top rung, the pendant path below
    assert(got(1L) === 3L && got(6L) === 1L && got(5L) === 2L)
  }

  test("coreLevels rejects a non-ascending ladder") {
    intercept[IllegalArgumentException] {
      Components.coreLevels(cliqueTail.toDF("a", "b"), "a", "b",
        Seq(4, 2), rounds = 2)
    }
  }

  test("commonNeighborCandidates == the naive wedge scan on the clique+tail fixture") {
    val got = Components
      .commonNeighborCandidates(cliqueTail.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val edges = cliqueTail.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    def nbrs(v: Long) = edges.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }
    val expect = (for {
      a <- nodes; b <- nodes if a < b && !edges((a, b))
      cn = (nbrs(a) intersect nbrs(b)).size.toLong if cn > 0
    } yield (a, b) -> ((cn, nbrs(a).size.toLong, nbrs(b).size.toLong))).toMap
    assert(got === expect)
    // adjacency exclusion: no candidate is an existing edge
    assert(got.keySet.intersect(edges).isEmpty)
  }

  test("resourceAllocationCandidates == naive Σ ⌊1e6/deg(w)⌋ over shared neighbors") {
    val got = Components
      .resourceAllocationCandidates(cliqueTail.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val edges = cliqueTail.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    def nbrs(v: Long) = edges.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }
    val expect = (for {
      a <- nodes; b <- nodes if a < b && !edges((a, b))
      shared = nbrs(a) intersect nbrs(b) if shared.nonEmpty
    } yield (a, b) -> ((shared.size.toLong,
      shared.toSeq.map(w => 1000000L / nbrs(w).size).sum))).toMap
    assert(got === expect)
    // the hub-penalty law on a hand case: path a—b—c plus square
    // a—d—e—f—a... simpler: on a 3-path (10—11—12), RA(10,12) is
    // exactly half a unit — the single shared neighbor has degree 2
    val path = Seq((10L, 11L), (11L, 12L))
    val ra = Components
      .resourceAllocationCandidates(path.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(ra === Seq((10L, 12L, 1L, 500000L)))
  }

  test("q189's 4-round budget reaches the true coreness fixpoint on the real graphs") {
    // q189 matches its oracle round-for-round at ANY data (both sides
    // run exactly 4 peel rounds per rung), so the hash cannot diverge —
    // this spec covers the residual semantic risk: that 4 rounds might
    // stop SHORT of the true coreness ladder on a deeper shell cascade.
    // Checked on the actual co-occurrence graphs at the sfs the driver
    // exercises: the budgeted ladder must equal the convergence-mode
    // (kCoreUntil-style, rounds ≥ any depth) ladder.
    for (sf <- Seq("0.001", "0.01")) {
      val edges = graft.queries.Analytics
        .coocEdges(spark, s"/root/testdata/sf$sf")
      val budgeted = Components
        .coreLevels(edges, "wa", "wb", Seq(2, 4, 6), rounds = 4)
        .as[(String, Long)].collect().toMap
      val converged = Components
        .coreLevels(edges, "wa", "wb", Seq(2, 4, 6), rounds = 64)
        .as[(String, Long)].collect().toMap
      assert(budgeted === converged,
        s"sf$sf: a 4-round rung budget must reach the coreness fixpoint " +
          "— if this ever fails, raise BOTH the engine rounds and the " +
          "oracle unroll together (they must stay equal round-for-round)")
    }
  }

  // driver-side reference of the EXACT labelPropagation semantics:
  // semi-synchronous on string-length parity, adoption by
  // (count DESC, label ASC) over neighbor labels
  private def refLpa(edges: Seq[(String, String)], rounds: Int)
      : Map[String, String] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 <= e._2) e else e.swap).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lbl = adj.keys.map(n => n -> n).toMap
    for (r <- 0 until rounds) {
      lbl = lbl.map { case (n, l) =>
        if (n.length % 2 != r % 2) n -> l
        else {
          val cnt = adj(n).groupBy(lbl).view.mapValues(_.size.toLong)
          n -> cnt.map { case (cl, c) => (-c, cl) }.minBy(identity)._2
        }
      }
    }
    lbl
  }

  private def lpa(edges: Seq[(String, String)], rounds: Int)
      : Map[String, String] = Components
    .labelPropagation(edges.toDF("a", "b"), "a", "b", rounds)
    .as[(String, String)].collect().toMap

  test("labelPropagation == the driver-side reference on two cliques joined by a bridge") {
    // the canonical community fixture: two 4-cliques, one bridge edge —
    // LPA must NOT merge them (where connected components would)
    val k4a = Seq("ant", "bee", "cow", "doe")
    val k4b = Seq("elk", "fox", "gnu", "hen")
    def clique(vs: Seq[String]) =
      for (i <- vs.indices; j <- vs.indices if i < j) yield (vs(i), vs(j))
    val edges = clique(k4a) ++ clique(k4b) :+ (("doe", "elk"))
    val got = lpa(edges, 8)
    assert(got === refLpa(edges, 8))
    assert(got.filterKeys(k4a.contains).values.toSet.size === 1 &&
      got.filterKeys(k4b.contains).values.toSet.size === 1,
      "each clique must collapse to one community")
    assert(got("ant") !== got("fox"),
      "a single bridge edge must not merge two 4-cliques")
  }

  test("labelPropagation edges: zero rounds is identity; self-loops and empty frames vanish") {
    val edges = Seq(("ant", "bee"), ("bee", "cow"))
    assert(lpa(edges, 0) === Map("ant" -> "ant", "bee" -> "bee",
      "cow" -> "cow"), "rounds = 0 must return own-id labels")
    assert(lpa(Seq(("ant", "ant")), 8) === Map.empty,
      "a self-loop-only graph has no propagating nodes")
    assert(Components.labelPropagation(
        Seq.empty[(String, String)].toDF("a", "b"), "a", "b", 8)
      .count() === 0L, "empty edges -> empty partition")
    // duplicate + reversed edges collapse: same result as the single edge
    assert(lpa(Seq(("ant", "bee"), ("bee", "ant"), ("ant", "bee")), 4) ===
      lpa(Seq(("ant", "bee")), 4))
  }

  test("labelPropagation matches the reference on random graphs (property)") {
    val rnd = new scala.util.Random(20216)
    for (trial <- 1 to 5) {
      // mixed-parity node names so both half-rounds do real work
      val n = 12 + rnd.nextInt(10)
      val names = (0 until n).map(i =>
        if (i % 2 == 0) s"n$i" else s"nn$i")
      val edges = (for {
        i <- 0 until n; j <- 0 until n
        if i < j && rnd.nextDouble() < 0.18
      } yield (names(i), names(j)))
      if (edges.nonEmpty)
        assert(lpa(edges, 6) === refLpa(edges, 6), s"trial $trial: $edges")
    }
  }

  test("modularityCells == naive Newman cells; LPA on cliques+bridge scores positive") {
    val k4a = Seq("ant", "bee", "cow", "doe")
    val k4b = Seq("elk", "fox", "gnu", "hen")
    def clique(vs: Seq[String]) =
      for (i <- vs.indices; j <- vs.indices if i < j) yield (vs(i), vs(j))
    val edges = clique(k4a) ++ clique(k4b) :+ (("doe", "elk"))
    val lblMap = refLpa(edges, 8)
    val got = Components.modularityCells(edges.toDF("a", "b"), "a", "b",
        lblMap.toSeq.toDF("id", "community"), "id", "community")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    // naive reference
    val m = edges.size.toLong
    def deg(v: String) = edges.count(e => e._1 == v || e._2 == v).toLong
    val comms = lblMap.values.toSeq.distinct
    for (c <- comms) {
      val members = lblMap.collect { case (v, l) if l == c => v }.toSet
      val ec = edges.count(e =>
        members(e._1) && members(e._2)).toLong
      val dc = members.toSeq.map(deg).sum
      assert(got(c) === ((members.size.toLong, dc, ec, m,
        4L * m * ec - dc * dc)), s"community $c")
    }
    // accounting laws + "two cliques with one bridge IS structure"
    assert(got.values.map(_._2).sum === 2 * m)
    assert(got.values.map(_._3).sum <= m)
    assert(got.values.map(_._5).sum > 0,
      "the two-community partition must score positive modularity")
    // and the trivial one-community partition scores exactly zero
    val one = Components.modularityCells(edges.toDF("a", "b"), "a", "b",
        lblMap.keys.map(_ -> "all").toSeq.toDF("id", "community"),
        "id", "community")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(one.map(_._6).sum === 0L)
  }

  test("q218 accounting on the real graphs: degrees sum to 2m, intra bounded by m") {
    for (sf <- Seq("0.001", "0.01")) {
      val rows = SparkEntry.queries("q218_modularity")(
          spark, s"/root/testdata/sf$sf")
        .as[(String, Long, Long, Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      val m = rows.head._5
      assert(rows.map(_._3).sum === 2 * m, s"sf$sf: sum(d_c) = 2m")
      assert(rows.map(_._4).sum <= m, s"sf$sf: sum(e_c) <= m")
      rows.foreach(r => assert(r._6 === 4 * m * r._4 - r._3 * r._3))
    }
  }

  test("q216's 25000-budget stops at round 2 on every sf, equal to pageRank(iters=2)") {
    // the q216 oracle unrolls exactly 2 rounds with a literal 2 — this
    // pins the two facts that make that static SQL safe: the L1 budget
    // boundary sits between round 1 and round 2 at EVERY testdata sf
    // (measured margins ≥ 1.4× both sides), and the until-mode result
    // at the stopped round is bit-equal to the fixed-iters solve. A
    // testdata regeneration that moves the boundary fails HERE, not
    // silently in the driver hash.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val edges = graft.Tables.events(spark, s"/root/testdata/sf$sf")
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val (until, rounds) = Components.pageRankUntil(edges, "src", "dst",
        Some("w"), deltaL1 = 25000L, maxIters = 60)
      assert(rounds === 2,
        s"sf$sf: the 25000 budget must stop at round 2 — if testdata " +
          "moved the boundary, re-pin the q216 budget AND oracle unroll")
      val fixed = Components.pageRank(edges, "src", "dst", Some("w"),
        iters = 2)
      assert(until.as[(String, Long)].collect().toMap ===
        fixed.as[(String, Long)].collect().toMap,
        s"sf$sf: until-mode at its stopped round must equal fixed-iters")
    }
  }

  test("q210's 8-round budget is a fixed point on the real co-occurrence graphs") {
    // same insurance shape as the q189 test above: the oracle unrolls
    // exactly 8 rounds so the hash cannot diverge at ANY data — this
    // covers the semantic risk that 8 rounds stop short of (or
    // oscillate around) the stable partition. Raghavan-style LPA has no
    // general convergence theorem; the parity staggering removes the
    // 2-cycle mode, and this pins stability AT THE DATA (observed
    // convergence by round 6 at every sf).
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val edges = graft.queries.Analytics
        .coocEdges(spark, s"/root/testdata/sf$sf")
      val at8 = Components.labelPropagation(edges, "wa", "wb", rounds = 8)
        .as[(String, String)].collect().toMap
      val at10 = Components.labelPropagation(edges, "wa", "wb", rounds = 10)
        .as[(String, String)].collect().toMap
      assert(at8 === at10,
        s"sf$sf: rounds=8 must already sit at the LPA fixed point — if " +
          "this fails, raise the engine rounds AND the oracle unroll " +
          "together")
    }
  }

  test("kTruss: a 4-clique survives at k=4, a pendant triangle and a hub star do not") {
    // clique 1-4 (each edge in 2 within-clique triangles), triangle
    // 4-5-6 hanging off it (each of its edges in exactly 1), hub 10
    // with spokes 11-15 (zero triangles — the k-core blind spot)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)) ++
      (11L to 15L).map(s => (10L, s))
    val out = Components.kTruss(edges.toDF("s", "d"), "s", "d",
        k = 4, rounds = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
  }

  test("kTruss: direction, duplicates and self-loops collapse; zero rounds reports raw support") {
    val edges = Seq((2L, 1L), (1L, 2L), (2L, 2L), (1L, 3L), (3L, 2L))
    val out = Components.kTruss(edges.toDF("s", "d"), "s", "d",
        k = 3, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    // triangle 1-2-3 with a duplicate/reversed/self-loop noise: at k=3
    // (support >= 1) all three canonical edges survive with support 1
    assert(out === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val raw = Components.kTruss(edges.toDF("s", "d"), "s", "d",
        k = 4, rounds = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(raw === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)),
      "rounds=0 is the support census of the canonicalized input")
  }

  test("q235's 6-round budget reaches the truss fixed point on the real graphs") {
    // the oracle unrolls exactly 6 support/peel rounds — same insurance
    // shape as the q189/q210 pins: convergence must already hold at the
    // registered budget at every sf, and every surviving edge must
    // satisfy the truss invariants (support >= k-2; within-truss
    // endpoint degree >= k-1)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val edges = graft.queries.Analytics
        .coocEdges(spark, s"/root/testdata/sf$sf")
      val at6 = Components.kTruss(edges, "wa", "wb", k = 4, rounds = 6)
        .as[(String, String, Long)].collect().toSet
      val at8 = Components.kTruss(edges, "wa", "wb", k = 4, rounds = 8)
        .as[(String, String, Long)].collect().toSet
      assert(at6 === at8,
        s"sf$sf: rounds=6 must already sit at the truss fixed point — " +
          "raise the engine rounds AND the oracle unroll together")
      assert(at6.forall(_._3 >= 2L), s"sf$sf: support >= k-2 at the fixpoint")
      val deg = at6.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(at6.forall(e => deg(e._1) >= 3 && deg(e._2) >= 3),
        s"sf$sf: every truss endpoint needs within-truss degree >= k-1")
    }
  }

  test("q263 TextRank: hub outranks leaves on a star; corpus mass conserved") {
    import org.apache.spark.sql.functions.col
    // undirected star: the center must collect the leaves' mass
    val star = Seq(("hub", "a"), ("hub", "b"), ("hub", "c"))
      .flatMap { case (x, y) => Seq((x, y), (y, x)) }
      .toDF("src", "dst")
    val pr = Components.pageRank(star, "src", "dst", None, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("hub") > pr("a") && pr("a") === pr("b") && pr("b") === pr("c"))
    // the registered composition: tokens ≡ coocEdges endpoints, rank
    // mass conserved up to integer truncation (no dangling nodes)
    val out = SparkEntry.queries("q263_textrank_keywords")(
      spark, "/root/testdata/sf0.001").collect()
    val n = out.length.toLong
    assert(n > 0)
    val mass = out.map(_.getLong(1)).sum
    assert(mass <= n * 1000000L && mass >= n * 999000L,
      s"rank mass $mass strays from n·10⁶ = ${n * 1000000L}")
    // sorted by (rank DESC, token) — the keyword-ranking contract
    val pairs = out.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(pairs === pairs.sorted, "output must rank keywords")
  }

  test("q264 negative sampling: never an edge, ≤2 per anchor, anchors cover the graph") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q264_negative_sampling")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    // rebuild the edge set from the same LPA oracle preamble semantics:
    // q210's community output covers the node set; edges via the operator
    val edges = graft.queries.Analytics.coocEdges(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val und = edges ++ edges.map(_.swap)
    out.foreach { case (a, b, _) =>
      assert(a != b && !und.contains((a, b)),
        s"sampled pair ($a, $b) must be a NON-edge")
    }
    out.groupBy(_._1).foreach { case (a, ns) =>
      assert(ns.length <= 2, s"anchor $a oversampled")
      assert(ns.map(_._3).sorted.toSeq === (1L to ns.length.toLong).toSeq,
        s"anchor $a ranks malformed")
    }
    val nodes = und.map(_._1)
    assert(out.map(_._1).toSet === nodes,
      "every graph node is an anchor (the graph is far from complete)")
  }
}
