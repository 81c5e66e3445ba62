package graft

import graft.operators.Components

/** Connected-components semantics: transitivity, direction-independence,
  * convergence on a path graph longer than one propagation round.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("triangle plus disjoint pair form two clusters labeled by min id") {
    val out = cc(Seq((2L, 3L), (3L, 5L), (2L, 5L), (8L, 9L)))
    assert(out === Map(2L -> 2L, 3L -> 2L, 5L -> 2L, 8L -> 8L, 9L -> 8L))
  }

  test("chain a-b, b-c clusters transitively even without an a-c edge") {
    val out = cc(Seq((10L, 20L), (20L, 30L)))
    assert(out.values.toSet === Set(10L))
  }

  test("long path converges to the single min label (multi-round propagation)") {
    // path 1-2-...-12: min label must travel 11 hops, forcing >1 round
    val out = cc((1L to 11L).map(i => (i + 1, i)))
    assert(out === (1L to 12L).map(_ -> 1L).toMap)
  }

  test("edge direction is irrelevant") {
    assert(cc(Seq((7L, 4L))) === Map(4L -> 4L, 7L -> 4L))
  }

  test("star contraction solves a 300-node path in O(log² n) rounds, equal to union-find") {
    val edges = (1L to 299L).map(i => (i + 1, i)).toDF("s", "d")
    val (labels, rounds) = Components.alternating(edges, 50)
    assert(labels.as[(Long, Long)].collect().toMap ===
      (1L to 300L).map(_ -> 1L).toMap)
    assert(rounds <= 20,
      s"a 300-node path must converge in O(log² n) star rounds, took $rounds " +
        "(propagation would need 299)")
  }

  test("high-diameter fallback: 200-hop shuffled-id path converges through contraction") {
    // ids shuffled so label propagation cannot ride monotone adjacency;
    // propagation alone would need ~200 rounds — the PropagationRounds cap
    // triggers the quotient + star-contraction path.
    val rng = new scala.util.Random(7)
    val ids = rng.shuffle((0L to 200L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val out = cc(edges)
    assert(out.keySet === (0L to 200L).toSet)
    assert(out.values.toSet === Set(0L), "single component labeled by min id")
  }

  test("cross-check: agrees with GraphX connectedComponents on real dedup pairs") {
    import org.apache.spark.graphx.{Edge, Graph}
    val pairs = graft.operators.Dedup.ngramJaccard(
      Tables.documents(spark, "/root/testdata/sf0.01"), "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val ours = cc(pairs.toSeq)
    val graph = Graph.fromEdges(
      spark.sparkContext.parallelize(pairs.map { case (a, b) => Edge(a, b, ()) }), ())
    val graphx = graph.connectedComponents().vertices.collect().toMap
    assert(ours === graphx, "GraphX min-id components must match ours")
  }

  test("matches driver-side union-find on random graphs (property)") {
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-label normalization: root chosen as min via ordered union above
      parent.keys.map(k => k -> find(k)).toMap
    }
    val rng = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 2 + rng.nextInt(30)
      val edges = (1 to 1 + rng.nextInt(40))
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        assert(cc(edges) === unionFind(edges), s"edges=$edges")
      }
    }
  }

  // --- incremental components ---

  private def fullThenIncremental(old: Seq[(Long, Long)],
      today: Seq[(Long, Long)]): Map[Long, Long] = {
    val labels = Components.connectedComponents(old.toDF("a", "b"), "a", "b")
    Components.incrementalComponents(labels, today.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("incremental merge of two old clusters equals the batch solve") {
    // old: {1,2} and {5,6}; today's edge 2-5 merges them; 8-9 is brand new
    val out = fullThenIncremental(Seq((1L, 2L), (5L, 6L)),
      Seq((2L, 5L), (8L, 9L)))
    assert(out === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      8L -> 8L, 9L -> 8L))
  }

  test("new node attaching to an old cluster takes the old minimum label") {
    val out = fullThenIncremental(Seq((3L, 4L)), Seq((4L, 100L)))
    assert(out === Map(3L -> 3L, 4L -> 3L, 100L -> 3L))
  }

  test("a new node BELOW the old minimum lowers the merged label") {
    val out = fullThenIncremental(Seq((10L, 11L)), Seq((1L, 11L)))
    assert(out === Map(10L -> 1L, 11L -> 1L, 1L -> 1L),
      "label is the min-reachable id, not the sticky old label")
  }

  test("empty daily batch leaves every label untouched") {
    val out = fullThenIncremental(Seq((1L, 2L), (7L, 8L)), Seq.empty)
    assert(out === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("incremental equals full recompute on random edge splits (property)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 6) {
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val (old, today) = edges.partition(_ => rnd.nextBoolean())
      val full = cc(edges)
      val inc =
        if (old.isEmpty || today.isEmpty) cc(edges)
        else fullThenIncremental(old, today)
      assert(inc === full, s"old=$old today=$today")
    }
  }

  // --- bounded BFS with depths ---

  private def bfs(edges: Seq[(Long, Long)], roots: Seq[Long],
      maxHops: Int): Map[Long, Int] =
    Components.bfsDepths(edges.toDF("p", "c"), "p", "c",
        roots.toDF("r"), "r", maxHops)
      .as[(Long, Int)].collect().toMap

  test("bfs assigns minimum hop depths; the bound truncates the frontier") {
    // 1→2→3→4 chain plus a shortcut 1→3: 3 is depth 1, not 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
    assert(bfs(edges, Seq(1L), 10) ===
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    assert(bfs(edges, Seq(1L), 1) === Map(1L -> 0, 2L -> 1, 3L -> 1),
      "maxHops=1 must stop before reaching 4")
  }

  test("bfs terminates on cycles: revisits are anti-joined away") {
    val out = bfs(Seq((1L, 2L), (2L, 3L), (3L, 1L)), Seq(1L), 50)
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("bfs from multiple roots: first arrival from ANY root wins") {
    val out = bfs(Seq((1L, 5L), (5L, 6L), (9L, 6L)), Seq(1L, 9L), 10)
    assert(out === Map(1L -> 0, 9L -> 0, 5L -> 1, 6L -> 1),
      "6 is depth 1 via root 9, not depth 2 via 1→5→6")
  }

  test("bfs with unreachable roots or empty edges returns the roots alone") {
    assert(bfs(Seq.empty, Seq(3L), 5) === Map(3L -> 0))
  }

  // --- forest depths by binary lifting ---

  private def tree(edges: Seq[(Long, Long)], roots: Seq[Long],
      maxHops: Int): Map[Long, Int] =
    Components.treeDepths(edges.toDF("p", "c"), "p", "c",
        roots.toDF("r"), "r", maxHops)
      .as[(Long, Int)].collect().toMap

  test("treeDepths == bfsDepths on random forests across hop bounds") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      // random forest: parent(v) < v guarantees acyclic single-parent
      val n = 40
      val edges = (1L until n).map(c => (rnd.nextInt(c.toInt).toLong, c))
        .filter(_ => rnd.nextInt(10) > 0) // drop some edges → extra roots
      val roots = Seq(0L)
      for (hops <- Seq(0, 1, 3, 7, 64)) {
        assert(tree(edges, roots, hops) === bfs(edges, roots, hops),
          s"trial=$trial hops=$hops")
      }
    }
  }

  test("treeDepths on the part heap shape: depth(k) = floor(log2 k)") {
    val edges = (2L to 63L).map(k => (k / 2, k))
    val out = tree(edges, Seq(1L), 10)
    assert(out.size === 63)
    out.foreach { case (k, d) =>
      assert(d === 63 - java.lang.Long.numberOfLeadingZeros(k), s"k=$k")
    }
    // ≤-maxHops truncation identical to BFS
    assert(tree(edges, Seq(1L), 3) === bfs(edges, Seq(1L), 3))
  }

  test("treeDepths rejects multi-parent edges and interior roots") {
    intercept[IllegalArgumentException] {
      tree(Seq((1L, 3L), (2L, 3L)), Seq(1L), 5)
    }
    intercept[IllegalArgumentException] {
      tree(Seq((1L, 2L), (2L, 3L)), Seq(2L), 5) // 2 has a parent edge
    }
  }

  test("treeDepths: trees without a listed root are absent; maxHops=0 keeps roots only") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    assert(tree(edges, Seq(1L), 9) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(tree(edges, Seq(1L), 0) === Map(1L -> 0))
  }

  // --- fixed-point PageRank ---

  /** Driver-side reference of the exact integer fixed-point recurrence. */
  private def refPageRank(edges: Seq[(String, String, Long)], iters: Int,
      dampPct: Int = 85, unit: Long = 1000000L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> unit).toMap
    val teleport = (100 - dampPct) * unit / 100
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(outW.contains).map(r).sum
      val pnd = dangling / n
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        (r(s) / outW(s)) * w }.sum).toMap
      r = nodes.map(id =>
        id -> (teleport + dampPct * (in.getOrElse(id, 0L) + pnd) / 100)).toMap
    }
    r
  }

  private def pr(edges: Seq[(String, String, Long)], iters: Int = 3): Map[String, Long] =
    Components.pageRank(edges.toDF("s", "d", "w"), "s", "d", Some("w"), iters)
      .as[(String, Long)].collect().toMap

  test("pageRank matches the driver-side fixed-point recurrence exactly") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "c", 5L)) // d has no in-edges; none dangling
    assert(pr(edges) === refPageRank(edges, 3))
  }

  test("pageRank: dangling sink's mass is redistributed, not lost") {
    // b is a pure sink: without dangling redistribution its absorbed mass
    // vanishes and a's rank collapses toward bare teleport
    val edges = Seq(("a", "b", 1L))
    val out = pr(edges, iters = 3)
    assert(out === refPageRank(edges, 3))
    val teleportOnly = 150000L
    assert(out("a") > teleportOnly,
      s"a must receive a share of b's dangling mass, got ${out("a")}")
  }

  test("pageRank: a hub cited by everyone outranks its spokes") {
    val edges = (1 to 9).map(i => (s"n$i", "hub", 1L)) :+ ("hub", "n1", 1L)
    val out = pr(edges)
    assert(out === refPageRank(edges, 3))
    assert((1 to 9).forall(i => out("hub") > out(s"n$i")))
    assert(out("n1") > out("n2"), "hub's sole out-link boosts n1 above the rest")
  }

  test("pageRank on an empty edge frame returns an empty frame") {
    val out = Components.pageRank(
      Seq.empty[(String, String, Long)].toDF("s", "d", "w"), "s", "d",
      Some("w"), 3)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("id", "rank"))
  }

  test("pageRank is deterministic across partitionings (integer fixed-point)") {
    val edges = (1L to 200L).map(i => (s"u${i % 17}", s"u${(i * 7) % 17}",
      1L + i % 5))
    val one = Components.pageRank(edges.toDF("s", "d", "w").repartition(1),
      "s", "d", Some("w"), 3).as[(String, Long)].collect().toMap
    val many = Components.pageRank(edges.toDF("s", "d", "w").repartition(13),
      "s", "d", Some("w"), 3).as[(String, Long)].collect().toMap
    assert(one === many, "fixed-point arithmetic must not depend on partitioning")
  }

  test("pageRank returns an eagerly-cut frame — the r11 lazy plan is banned") {
    // The q157 hash-flake: a fully-lazy result executed at the consumer's
    // action over localCheckpoint staging blocks that later session state
    // could have unpersisted. The contract now is materialized-at-call:
    // the analyzed plan must BE the lineage cut, with no live operators
    // above it that still read staging frames.
    val out = Components.pageRank(Seq(("a", "b", 1L), ("b", "a", 2L))
      .toDF("s", "d", "w"), "s", "d", Some("w"), 3)
    assert(out.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      s"pageRank must return a materialized cut, got:\n" +
        out.queryExecution.analyzed)
  }

  test("q157 double-run: a cache-stressed session cannot change pageRank values") {
    val dir = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("q157_pagerank")(spark, dir)
    val baseline = run().collect().map(_.toSeq).toSeq
    assert(baseline.nonEmpty)
    // r11 scenario: hold the result frame un-acted-upon while the session
    // churns caches and the ContextCleaner runs, THEN collect. With the
    // eager cut the values were fixed at construction time.
    val deferred = run()
    val hogs = (1 to 6).map { i =>
      val h = spark.range(0L, 150000L, 1L, 4)
        .select((org.apache.spark.sql.functions.col("id") * i).as("v"),
          org.apache.spark.sql.functions.sha2(
            org.apache.spark.sql.functions.col("id").cast("string"), 256).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      h.count(); h
    }
    System.gc(); Thread.sleep(50) // give the ContextCleaner a GC edge
    spark.sqlContext.clearCache()
    hogs.foreach(_.unpersist(blocking = true))
    System.gc(); Thread.sleep(50)
    val stressed = deferred.collect().map(_.toSeq).toSeq
    assert(stressed === baseline,
      "pageRank output depended on post-call session state")
    assert(run().collect().map(_.toSeq).toSeq === baseline,
      "a fresh second run must be bit-identical")
  }

  test("pageRankUntil converges and equals pageRank at the stopped round") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "c", 5L))
    // ppm-of-total-mass budget (5 nodes · unit/10⁶ = 5): truncation noise
    // sits below it, geometric contraction reaches it in tens of rounds
    val (df, rounds) = Components.pageRankUntil(edges.toDF("s", "d", "w"),
      "s", "d", Some("w"), deltaL1 = 5L, maxIters = 200)
    assert(rounds < 200, "must stop on the budget, not the backstop")
    assert(rounds > 3, "a real convergence run outlasts the oracle's 3 rounds")
    val conv = df.as[(String, Long)].collect().toMap
    assert(conv === pr(edges, iters = rounds),
      "convergence mode must be bit-identical to fixed-iters at the same round")
    assert(conv === refPageRank(edges, rounds))
    assert(df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
  }

  // --- bounded-hop weighted shortest paths ---

  /** Driver-side full-relax Bellman–Ford reference: dist after k rounds
    * = min cost over ≤ k-edge paths from any source. */
  private def refSssp(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      k: Int): Map[Long, Long] = {
    var dist = sources.distinct.map(_ -> 0L).toMap
    (1 to k).foreach { _ =>
      val cand = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w))
      }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      dist = (dist.keySet ++ cand.keySet).map { n =>
        n -> math.min(dist.getOrElse(n, Long.MaxValue),
          cand.getOrElse(n, Long.MaxValue))
      }.toMap
    }
    dist
  }

  private def sssp(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      k: Int): Map[Long, Long] =
    Components.shortestPathsBounded(edges.toDF("s", "d", "w"), "s", "d",
        Some("w"), sources.toDF("src"), "src", k)
      .as[(Long, Long)].collect().toMap

  test("shortestPathsBounded: a cheap 2-hop detour needs 2 hops to beat the direct edge") {
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 2L))
    assert(sssp(edges, Seq(1L), 1) === Map(1L -> 0L, 2L -> 10L, 3L -> 2L))
    assert(sssp(edges, Seq(1L), 2) === Map(1L -> 0L, 2L -> 4L, 3L -> 2L))
  }

  test("shortestPathsBounded: horizon truncates, cycles cannot diverge") {
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 1L, 1L))
    assert(sssp(chain, Seq(1L), 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // going all the way around the cycle cannot improve the source
    assert(sssp(chain, Seq(1L), 50) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("shortestPathsBounded: multi-source takes the per-node minimum") {
    val edges = Seq((1L, 5L, 10L), (9L, 5L, 1L))
    assert(sssp(edges, Seq(1L, 9L), 3) ===
      Map(1L -> 0L, 9L -> 0L, 5L -> 1L))
  }

  test("shortestPathsBounded matches full-relax Bellman-Ford (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(80)(
        (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong, 1L + rnd.nextInt(9)))
        .filter(e => e._1 != e._2)
      for (k <- Seq(1, 3, 8)) {
        assert(sssp(edges, Seq(0L, 7L), k) === refSssp(edges, Seq(0L, 7L), k),
          s"k=$k")
      }
    }
  }

  test("shortestPathsBounded with no edges returns the sources at dist 0") {
    assert(sssp(Seq.empty, Seq(3L), 5) === Map(3L -> 0L))
  }

  // --- triangle counting ---

  /** Brute-force per-node triangle reference over the simple undirected
    * collapse of the edge list. */
  private def refTriangles(
      edges: Seq[(String, String)]): Map[String, (Long, Long)] = {
    val ue = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct
    val nodes = ue.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = nodes.map(n => n -> ue.collect {
      case (a, b) if a == n => b
      case (a, b) if b == n => a
    }.toSet).toMap
    nodes.map { n =>
      val tri = (for {
        u <- adj(n).toSeq; v <- adj(n).toSeq if u < v && adj(u)(v)
      } yield 1).size.toLong
      n -> ((adj(n).size.toLong, tri))
    }.toMap
  }

  private def tri(edges: Seq[(String, String)]): Map[String, (Long, Long)] =
    Components.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("triangleCounts: K4, a star, and a triangle-with-tail are exact") {
    // K4: every node sits in C(3,2)=3 triangles at degree 3
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b } yield (a, b)
    assert(tri(k4) === Map("a" -> ((3L, 3L)), "b" -> ((3L, 3L)),
      "c" -> ((3L, 3L)), "d" -> ((3L, 3L))))
    // celebrity star: the hub has every edge but zero triangles
    val star = (1 to 6).map(i => (s"leaf$i", "hub"))
    assert(tri(star).forall { case (_, (_, t)) => t === 0L })
    // triangle with a tail: tail node in 0, triangle nodes in 1
    val tail = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "t"))
    assert(tri(tail) === Map("a" -> ((2L, 1L)), "b" -> ((2L, 1L)),
      "c" -> ((3L, 1L)), "t" -> ((1L, 0L))))
  }

  test("triangleCounts collapses direction, multi-edges and self-loops") {
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"),
      ("b", "c"), ("c", "a"))
    assert(tri(messy) === refTriangles(messy))
    assert(tri(messy)("a") === ((2L, 1L)))
  }

  test("triangleCounts matches brute force on pseudo-random graphs (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(60)((s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}"))
        .filter(e => e._1 != e._2)
      assert(tri(edges) === refTriangles(edges))
    }
  }

  test("triangleCounts on an empty edge frame returns an empty frame") {
    val out = Components.triangleCounts(
      Seq.empty[(String, String)].toDF("s", "d"), "s", "d")
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("id", "degree", "triangles"))
  }

}
