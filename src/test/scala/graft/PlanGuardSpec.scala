package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-regression guards for the headline joins: the asserted shapes are
  * the ones the 100 TB design depends on (broadcast dims, no nested-loop
  * or cartesian fallbacks, bounded exchange counts). A config or upgrade
  * that silently flips a broadcast to a shuffle — or worse, to a nested
  * loop — fails here rather than in a 60× slower bench.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // collect() drives this Dataset's own QE through AQE finalization
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def count(pat: String, plan: String): Int =
    pat.r.findAllIn(plan).size

  /** Joins with NO cross-side equality conjunct — condition-less crosses
    * AND conditioned non-equi predicates alike. Spark can only run these
    * as BroadcastNestedLoopJoin / CartesianProduct, so the guard demands
    * a provably-1-row side (the q157 dangling-mass class); r21's
    * condition-less-only check let a conditioned data-sized nested loop
    * slip by (VERDICT r21 tighten directive).
    */
  private def nonEquiJoins(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.catalyst.plans.logical.Join] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    df.queryExecution.optimizedPlan.collect { case j: Join => j }
      .filterNot { j =>
        def crossSide(l: Expression, r: Expression) =
          (l.references.subsetOf(j.left.outputSet) &&
            r.references.subsetOf(j.right.outputSet)) ||
          (l.references.subsetOf(j.right.outputSet) &&
            r.references.subsetOf(j.left.outputSet))
        j.condition.exists(c => c.collect {
          case EqualTo(l, r) if crossSide(l, r) => true
          case EqualNullSafe(l, r) if crossSide(l, r) => true
        }.nonEmpty)
      }
  }

  private def assertNonEquiOneRow(q: String): Unit =
    nonEquiJoins(SparkEntry.queries(q)(spark, dir)).foreach(j => assert(
      j.left.maxRows.contains(1L) || j.right.maxRows.contains(1L),
      s"$q: every non-equi join (condition-less or conditioned without " +
        "an equi key) must have a provably-1-row side"))

  test("q03 star join: all dims broadcast, no sort-merge, single agg exchange") {
    val p = finalPlan("q03_star_join_broadcast")
    assert(count("BroadcastHashJoin", p) === 3,
      s"customer, nation and region must all broadcast at this SF:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(count("Exchange hashpartitioning", p) <= 1,
      s"only the final aggregation may exchange:\n$p")
  }

  test("q04 fact-fact join: equi-join machinery only, bounded exchanges") {
    val p = finalPlan("q04_factfact_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // two join inputs + distinct-agg re-exchange is the worst acceptable
    assert(count("Exchange hashpartitioning", p) <= 3,
      s"fact-fact join must not grow extra exchanges:\n$p")
  }

  test("q26 supplier join: nation broadcast, no nested loop") {
    val p = finalPlan("q26_supplier_join")
    assert(count("BroadcastHashJoin", p) >= 1, s"nation must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q39 exact pair join: partitioned equi-join, no nested loop, no cartesian") {
    val p = finalPlan("q39_embedding_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the blocked pair join must stay an equi-join:\n$p")
  }

  test("q99 quantized top-k: codegen'd quantize in the scan stage, query side broadcast") {
    val p = finalPlan("q99_quantized_topk")
    assert(!p.contains("CartesianProduct"), p)
    // the deliberate broadcast: the tiny query side rides a BroadcastNLJ
    // against the corpus scan (same shape as q37); the corpus side must
    // never shuffle its vectors before the cosine is computed
    assert(p.contains("BroadcastExchange"),
      s"query side must broadcast, corpus must stream map-side:\n$p")
    assert(p.contains("graft_quantize_i8") || p.contains("int8quantize") ||
      p.toLowerCase.contains("quantize"),
      s"quantization must run inside the plan, not a pre-collected table:\n$p")
  }

  test("q65 gap-fill: no unpartitioned window over the spine") {
    val df = SparkEntry.queries("q65_timeseries_gapfill")(spark, dir)
    df.collect()
    val analyzed = df.queryExecution.optimizedPlan.toString
    // the spine-side fill must be partitioned by the day bucket...
    assert("windowspecdefinition\\(b#\\d+L?, h#\\d+".r.findFirstIn(analyzed).isDefined,
      s"within-bucket fill must be partitioned by bucket:\n$analyzed")
    // ...and no window may order the raw spine hours unpartitioned (the
    // carry window orders the per-bucket frame, #days rows, which is fine)
    assert("windowspecdefinition\\(h#\\d+".r.findFirstIn(analyzed).isEmpty,
      s"found an unpartitioned window over the spine:\n$analyzed")
  }

  test("q101 sequence packing: the only unpartitioned window is the bucket-offsets frame") {
    val df = SparkEntry.queries("q101_seq_packing")(spark, dir)
    df.collect()
    val analyzed = df.queryExecution.optimizedPlan.toString
    // two windows total: the per-bucket cumsum (partitioned by b) and the
    // offsets window over the aggregated bucket totals (unpartitioned by
    // design — `buckets` rows, never the corpus)
    val windows = "windowspecdefinition\\(".r.findAllIn(analyzed).size
    assert(windows >= 2, s"expected the two-phase prefix-sum windows:\n$analyzed")
    assert(analyzed.contains("windowspecdefinition(b#"),
      s"the corpus-side cumsum must be partitioned by bucket:\n$analyzed")
  }

  test("q114 corpus shuffle: the corpus-side rank window is bucket-partitioned") {
    val df = SparkEntry.queries("q114_corpus_shuffle")(spark, dir)
    df.collect()
    val analyzed = df.queryExecution.optimizedPlan.toString
    // same two-phase shape as q101: the row_number over documents must be
    // partitioned by bucket; the only unpartitioned window is the
    // buckets-row offsets frame
    assert(analyzed.contains("windowspecdefinition(b#"),
      s"the corpus-side rank must be partitioned by bucket:\n$analyzed")
  }

  test("q115 length batching: the corpus-side rank window is bucket-partitioned") {
    val df = SparkEntry.queries("q115_length_batches")(spark, dir)
    df.collect()
    val analyzed = df.queryExecution.optimizedPlan.toString
    assert(analyzed.contains("windowspecdefinition(b#"),
      s"the corpus-side rank must be partitioned by bucket:\n$analyzed")
  }

  test("q141 containment: one equi-join family, no nested loop, single pair-agg subtree") {
    val p = finalPlan("q141_ngram_containment")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the inverted-index self-join must stay an equi-join:\n$p")
    // the directed emission is one explode over the aggregated pair row —
    // a self-union would plan the shingle self-join twice and silently
    // double the heaviest stage
    assert("HashAggregate".r.findAllIn(p).size <= 6,
      s"pair aggregation subtree must appear once (explode, not union):\n$p")
    assert(p.contains("Generate explode"),
      s"both directed rows must come from one explode pass:\n$p")
  }

  test("q142/q143 SNM: banded rank-block equi-joins only, candidates carry ids") {
    for (q <- Seq("q142_snm_pairs", "q143_snm_multipass")) {
      val p = finalPlan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: the rank-block neighborhood join must stay an equi-join " +
          s"(O(n·w) by construction):\n$p")
      // the ONLY nested-loop-class joins allowed are the broadcast
      // crossJoins of provably-1-row frames (r21: the lazy quantile-cuts
      // aggregate of the two-phase rank — the q157 dangling-mass class);
      // r22 tighten: CONDITIONED non-equi joins are held to the same
      // 1-row-side bar, not just condition-less ones
      assertNonEquiOneRow(q)
      // no corpus-wide window: every row_number must be bucket-partitioned
      // (the offsets frame over `buckets` rows aggregates, it does not window)
      val df = SparkEntry.queries(q)(spark, dir)
      val analyzed = df.queryExecution.optimizedPlan
      val joins = analyzed.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.condition.exists(_.references.exists(_.name == "probe")) => j
      }
      assert(joins.nonEmpty, s"$q: expected the rank-block (probe) equi-join")
      joins.foreach { j =>
        val carried = (j.left.output ++ j.right.output).map(_.name).toSet
        assert(!carried.contains("hs"),
          s"$q: candidate generation must carry ids/ranks only — the hashed " +
            s"shingle sets rejoin per surviving candidate, got $carried")
      }
    }
  }

  test("q156 prefix filter: equi-joins only, candidates carry ids not shingle sets") {
    val p = finalPlan("q156_prefix_filter_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"prefix self-join must stay a shingle equi-join:\n$p")
    val df = SparkEntry.queries("q156_prefix_filter_jaccard")(spark, dir)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "shingle")) => j
    }
    assert(joins.nonEmpty, "expected the prefix-postings shingle equi-join")
    joins.foreach { j =>
      val carried = (j.left.output ++ j.right.output).map(_.name).toSet
      assert(!carried.contains("hs"),
        s"candidate generation must carry (id, shingle) only; full sets " +
          s"rejoin per surviving candidate, got $carried")
    }
  }

  test("q157 pageRank: propagation is equi-join; only 1-row dangling frames nest") {
    // the registered query's final plan is a sort over the eagerly-cut
    // result (r12: materialized-at-call determinism), so the per-round
    // machinery is guarded on the operator's OWN round builder — the same
    // powerRound every iteration executes
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val e = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L))
      .toDF("src", "dst", "w")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outW = e.groupBy(col("src").as("id"))
      .agg(org.apache.spark.sql.functions.sum("w").as("outw"))
    val base = nodes.join(outW, Seq("id"), "left")
    val ranks = base.select(col("id"), col("outw"), lit(1000000L).as("rank"))
    val round = graft.operators.Components
      .powerRound(e, base, ranks, 3L, 85, 150000L)
    // the ONLY condition-less join allowed is the broadcast crossJoin of
    // the dangling-mass aggregate, and the logical plan can PROVE it is
    // 1-row (ungrouped Aggregate ⇒ maxRows = 1); a graph-sized cross
    // join fails this
    val crossJoins = round.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isEmpty => j
    }
    assert(crossJoins.nonEmpty, "expected the 1-row dangling crossJoin")
    crossJoins.foreach(j => assert(j.right.maxRows.contains(1L),
      s"every crossJoin side must be provably 1-row, got ${j.right.maxRows}"))
    // and the rank-propagation joins themselves are equality joins on the
    // edge endpoints — never part of a nested loop
    val srcJoins = round.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "src")) => j
    }
    assert(srcJoins.nonEmpty, "expected the edges-to-ranks src equi-join")
    srcJoins.foreach(j => assert(j.condition.get.toString.contains("="),
      s"propagation join must be an equality join: ${j.condition.get}"))
    val ex = round.queryExecution.executedPlan.toString
    assert(!ex.contains("CartesianProduct"),
      s"no unbounded cross product in the executed round:\n$ex")
    // the registered query end-to-end still carries no cartesian product
    assert(!finalPlan("q157_pagerank").contains("CartesianProduct"))
  }

  test("q169 triangles: wedge and closing joins are equi-joins, no BNLJ/cartesian") {
    // the degree-ordered orientation only pays off if the wedge
    // generation and the closing-edge probe stay hash-join machinery —
    // a nested loop would re-melt the Σdeg² the orientation avoids.
    // Like q157/q165/q166 the registered query's final plan is a sort
    // over the eagerly-cut result, so guard the operator's own builder.
    import spark.implicits._
    val oe = Seq(("a", "b", 2L), ("a", "c", 2L), ("b", "c", 2L))
      .toDF("u", "v", "dv")
    val tris = graft.operators.Components.closeWedges(oe)
    val joins = tris.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 2,
      s"one apex wedge self-join + one closing probe, got ${joins.size}")
    joins.foreach(j => assert(j.condition.exists(_.toString.contains("=")),
      s"every triangle join must be an equality join: ${j.condition}"))
    val ex = tris.queryExecution.executedPlan.toString
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"),
      s"triangle counting must stay equi-join machinery:\n$ex")
    assert(!finalPlan("q169_triangles").contains("CartesianProduct"))
  }

  test("q171 SSSP: relax join is equi-join on a (src, ds)-only frontier") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val e = Seq((1L, 2L, 3L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val cur = Seq((1L, 0L, true)).toDF("id", "dist", "improved")
    val round = graft.operators.Components.ssspRound(e, cur)
    val joins = round.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 2,
      s"one frontier relax join + one full-outer merge, got ${joins.size}")
    joins.foreach(j => assert(j.condition.exists(_.toString.contains("=")),
      s"every SSSP join must be an equality join: ${j.condition}"))
    assert(joins.exists(_.joinType.toString == "FullOuter"),
      "the dist merge must be a full-outer min-merge")
    // the frontier side of the relax join carries (src, ds) only — no
    // improved flag, no payload, before the shuffle
    val relax = joins.filterNot(_.joinType.toString == "FullOuter")
    relax.foreach { j =>
      val sides = Seq(j.left.output.map(_.name).toSet,
        j.right.output.map(_.name).toSet)
      assert(sides.exists(s => s == Set("src", "ds")),
        s"frontier must be (src, ds) only, got $sides")
    }
    val ex = round.queryExecution.executedPlan.toString
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"))
    assert(!finalPlan("q171_shortest_paths").contains("CartesianProduct"))
  }

  test("q167 PPR: same round invariants as q157 — 1-row dangling broadcast, equi-join propagation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, coalesce}
    val e = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L))
      .toDF("src", "dst", "w")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outW = e.groupBy(col("src").as("id"))
      .agg(org.apache.spark.sql.functions.sum("w").as("outw"))
    val base = nodes.join(outW, Seq("id"), "left")
      .join(Seq("a").toDF("id").select(col("id"), lit(true).as("is_seed")),
        Seq("id"), "left")
      .select(col("id"), col("outw"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
    val ranks = base.select(col("id"), col("outw"), col("is_seed"),
      lit(1000000L).as("rank"))
    val round = graft.operators.Components
      .pprRound(e, base, ranks, 1L, 85, 450000L)
    val crossJoins = round.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isEmpty => j
    }
    assert(crossJoins.nonEmpty, "expected the 1-row dangling crossJoin")
    crossJoins.foreach(j => assert(j.right.maxRows.contains(1L),
      s"every crossJoin side must be provably 1-row, got ${j.right.maxRows}"))
    val srcJoins = round.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "src")) => j
    }
    assert(srcJoins.nonEmpty, "expected the edges-to-ranks src equi-join")
    srcJoins.foreach(j => assert(j.condition.get.toString.contains("="),
      s"propagation join must be an equality join: ${j.condition.get}"))
    assert(!round.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
    assert(!finalPlan("q167_personalized_pagerank").contains("CartesianProduct"))
  }

  test("q166 HITS: gather is equi-join; rescale crossJoin is provably 1-row") {
    // like q157 the registered query's final plan is a sort over the
    // eagerly-cut result, so the per-round machinery is guarded on the
    // operator's own round builders — the same hitsGather/hitsRescale
    // every iteration executes
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val e = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L))
      .toDF("src", "dst", "w")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val scores = nodes.select(col("id"), lit(1000000L).as("auth"),
      lit(1000000L).as("hub"))
    val gather = graft.operators.Components
      .hitsGather(e, scores, "hub", "src", "dst")
    // the gather half — the round's corpus-sized work — must be an
    // equality join on the edge endpoint, never a nested loop
    val gJoins = gather.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(gJoins.nonEmpty, "expected the edges-to-scores src equi-join")
    gJoins.foreach { j =>
      assert(j.condition.exists(_.toString.contains("=")),
        s"gather join must be an equality join: ${j.condition}")
    }
    val gEx = gather.queryExecution.executedPlan.toString
    assert(!gEx.contains("BroadcastNestedLoopJoin") &&
      !gEx.contains("CartesianProduct"),
      s"gather must stay hash-join machinery:\n$gEx")
    // the rescale half: its ONLY condition-less join is the broadcast of
    // the ungrouped divisor aggregate, provably 1-row (maxRows = 1) — a
    // graph-sized cross join fails this
    val raw = gather // stands in for the cut raw frame; same schema/plan
    val rescale = graft.operators.Components
      .hitsRescale(nodes, raw, 3000000L, "auth")
    val crossJoins = rescale.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isEmpty => j
    }
    assert(crossJoins.nonEmpty, "expected the 1-row divisor crossJoin")
    crossJoins.foreach(j => assert(j.right.maxRows.contains(1L),
      s"every crossJoin side must be provably 1-row, got ${j.right.maxRows}"))
    val rEx = rescale.queryExecution.executedPlan.toString
    assert(!rEx.contains("CartesianProduct"),
      s"no unbounded cross product in the rescale:\n$rEx")
    // the registered query end-to-end still carries no cartesian product
    assert(!finalPlan("q166_hits").contains("CartesianProduct"))
  }

  test("q165 BFS: per-hop expansion is equi-join + anti-join on id-only frames") {
    // same situation as q157: hops are cut as they execute, so the final
    // plan is a sort over the visited cut — guard the operator's own hop
    // builder
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("p", "c")
    val frontier = Seq((1L, 0)).toDF("id", "depth")
    val step = graft.operators.Components.bfsStep(e, frontier, frontier, 0)
    val joins = step.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 2,
      s"one parent equi-join + one visited anti-join, got ${joins.size}")
    joins.foreach(j => assert(j.condition.exists(_.toString.contains("=")),
      s"every hop join must be an equality join: ${j.condition}"))
    assert(joins.exists(_.joinType.toString == "LeftAnti"),
      "the visited dedup must be a LEFT ANTI join")
    // frontier/visited join sides carry the node id ONLY — depth and any
    // payload columns must be pruned before the shuffle
    joins.foreach { j =>
      val right = j.right.output.map(_.name).toSet
      assert(right == Set("id") || right == Set("p"),
        s"hop-join sides must be id-only, got $right")
    }
    val ex = step.queryExecution.executedPlan.toString
    assert(!ex.contains("BroadcastNestedLoopJoin") && !ex.contains("CartesianProduct"),
      s"hop expansion must stay hash-join machinery:\n$ex")
    assert(!finalPlan("q165_bfs_hierarchy").contains("CartesianProduct"))
  }

  test("q160 point-in-time features: band equi-join only, no inequality join") {
    val p = finalPlan("q160_point_in_time_features")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the (key, bucket) band construction must keep the window predicate " +
        s"out of the join condition:\n$p")
  }

  test("q118/q120 TPC-H top-k: TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("q118_tpch_q3", "q120_tpch_q10")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q: top-k must plan as TakeOrderedAndProject:\n$plan")
      // SortExec prints as `Sort [keys], global, offset` — forbid any
      // global=true sort anywhere in the tree (the shape top-k avoids)
      assert(!"Sort \\[[^\\]]*\\], true,".r.findFirstIn(plan).isDefined,
        s"$q: no global sort may appear:\n$plan")
    }
  }

  test("q118-q120 TPC-H showcases: broadcast dims, date predicates pushed") {
    // the headline compositions must keep the 100 TB shape even as
    // Catalyst/conf evolve: dims broadcast (never sort-merge or nested
    // loop), and every date/segment predicate reaches its parquet scan —
    // hashes staying green cannot certify these, only the plan can
    val cases = Seq(
      // (query, min broadcast joins, predicates that must be pushed)
      ("q118_tpch_q3", 2, Seq(
        "EqualTo(c_mktsegment,BUILDING)",
        "LessThan(o_orderdate", "GreaterThan(l_shipdate")),
      ("q119_tpch_q5", 3, Seq(
        "EqualTo(r_name,ASIA)",
        "GreaterThanOrEqual(o_orderdate", "LessThan(o_orderdate")),
      ("q120_tpch_q10", 2, Seq(
        "EqualTo(l_returnflag,R)",
        "GreaterThanOrEqual(o_orderdate", "LessThan(o_orderdate")))
    for ((q, minBc, pushed) <- cases) {
      val p = finalPlan(q)
      assert(count("BroadcastHashJoin", p) >= minBc,
        s"$q: expected >= $minBc broadcast joins:\n$p")
      assert(count("BroadcastNestedLoopJoin|CartesianProduct", p) === 0,
        s"$q: no nested-loop/cartesian fallback allowed:\n$p")
      for (pred <- pushed)
        assert(p.contains(pred),
          s"$q: predicate $pred must be pushed to the scan:\n$p")
    }
  }

  test("q151 survivors: argmax is a hash agg, never a per-cluster window") {
    val p = finalPlan("q151_quality_survivors")
    assert(!p.contains("Window"),
      s"survivor argmax must not plan a per-cluster window (skew trap):\n$p")
    assert(count("BroadcastNestedLoopJoin|CartesianProduct", p) === 0, p)
  }

  test("q152 semantic decontamination: bench broadcast, corpus never shuffles") {
    val p = finalPlan("q152_semantic_decontamination")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"bench side must broadcast (the operator's small-suite contract):\n$p")
    // the only hash exchange allowed is the per-vector argmax agg (and it
    // carries (id, bench_id, cos) rows, never embeddings)
    assert(count("Exchange hashpartitioning", p) <= 1,
      s"corpus embeddings must stream map-side, not shuffle:\n$p")
  }

  test("q154 PMI: top-k is TakeOrdered, never a global sort") {
    val p = finalPlan("q154_pmi_phrases")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must plan as TakeOrderedAndProject:\n$p")
    assert(!"Sort \\[[^\\]]*\\], true,".r.findFirstIn(p).isDefined,
      s"no global sort may appear:\n$p")
    assert(count("CartesianProduct", p) === 0,
      s"the totals joins must broadcast (1-row frames):\n$p")
  }

  test("q155 profile card: one scan, no join/union of per-metric passes") {
    val p = finalPlan("q155_profile_card")
    assert(count("FileScan|Scan parquet", p) <= 2, // Expand for countDistinct re-reads nothing
      s"the card must ride one scan:\n$p")
    assert(!p.contains("Join") && !p.contains("Union"),
      s"no per-metric scan multiplication:\n$p")
  }

  test("q176 k-core: peel round is semi-join restriction, no BNLJ/cartesian") {
    import spark.implicits._
    val ue = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
      .toDF("a", "b")
    val round = graft.operators.Components.peelRound(ue, 2)
    val joins = round.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 2,
      s"two survivor semi-join restrictions per round, got ${joins.size}")
    joins.foreach { j =>
      assert(j.joinType.toString == "LeftSemi",
        s"survivor restriction must be a semi-join: ${j.joinType}")
      assert(j.condition.exists(_.toString.contains("=")),
        s"restriction must be an equality join: ${j.condition}")
    }
    val ex = round.queryExecution.executedPlan.toString
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"),
      s"peeling must stay equi-join machinery:\n$ex")
    assert(!finalPlan("q176_kcore").contains("CartesianProduct"))
  }

  test("q210 LPA: one round is two equi-joins + combinable aggs, no BNLJ/cartesian") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")).toDF("s", "d")
    val bo = e.union(e.select($"d", $"s"))
    val lbls = bo.select($"s".as("id")).distinct()
      .select($"id", $"id".as("lbl"))
    val round = graft.operators.Components.lpaRound(bo, lbls, 0)
    val joins = round.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 2,
      s"neighbor-label gather + adoption merge, got ${joins.size}")
    joins.foreach(j => assert(j.condition.exists(_.toString.contains("=")),
      s"every LPA join must be an equality join: ${j.condition}"))
    val ex = round.queryExecution.executedPlan.toString
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"),
      s"LPA must stay hash machinery on the node id:\n$ex")
    // and the winner choice is ONE combinable min-struct agg — no
    // per-node rank window anywhere in the round
    assert(!ex.contains("Window"),
      s"adoption must be the min-struct agg, not a window:\n$ex")
    assert(!finalPlan("q210_communities").contains("CartesianProduct"))
  }

  test("q178 AUC: no corpus-partition window — the running sum rides the value grid") {
    // the naive rank-sum AUC is `rank() OVER (ORDER BY score)` on the
    // CORPUS; the shipped plan aggregates to the distinct-value histogram
    // FIRST, so the single unpartitioned window sees post-agg rows only
    val df = SparkEntry.queries("q178_auc")(spark, dir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // r22: the histogram is pinned (Checkpoints.cut) before the window —
    // the aggregate runs once at cut time, so the window's subtree shows
    // either the Aggregate itself or the grid-schema LogicalRDD cut;
    // a window over RAW corpus rows would show the corpus scan instead
    windows.foreach { w =>
      val gridBelow = w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case l: org.apache.spark.sql.execution.LogicalRDD => l
      }
      assert(gridBelow.nonEmpty,
        s"the window must ride the histogram aggregate or its pinned " +
          s"cut, not raw rows:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("q219 attribution window: band join is equi on (user, bucket), no cartesian") {
    // the naive form is a per-user non-equi time join (occurrence lists
    // crossed); the shipped plan explodes the a-side to two W-sized
    // buckets and joins EQUI on (user_id, bk) — the q160 band pattern
    val p = finalPlan("q219_attribution_window")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the window match must stay an equi-join:\n$p")
  }

  test("q241 concurrent sessions: the interval overlap join is equi on the bucket, no cartesian") {
    // the naive form is an interval×interval non-equi theta join (a
    // cartesian per key in the fallback plan); the shipped plan explodes
    // each session to its 1-hour buckets and joins EQUI on the bucket —
    // the two-sided q219 band pattern
    val p = finalPlan("q241_concurrent_sessions")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the overlap match must stay an equi-join:\n$p")
  }

  test("q211 PR table: both cumulative windows ride the class histogram, not corpus rows") {
    // same ban as q178: a per-row threshold sweep would be a
    // corpus-sized window; the shipped plan aggregates to the
    // distinct-value class histogram first
    val df = SparkEntry.queries("q211_pr_thresholds")(spark, dir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      // r22: the class histogram is pinned (Checkpoints.cut) before the
      // windows — accept the Aggregate or its grid-schema LogicalRDD cut
      val gridBelow = w.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case l: org.apache.spark.sql.execution.LogicalRDD => l
      }
      assert(gridBelow.nonEmpty,
        s"every window must sit above the histogram aggregate or its " +
          s"pinned cut:\n${df.queryExecution.optimizedPlan}")
    }
    // and the whole table rides ONE corpus scan: class totals are
    // whole-grid windows, not a second aggregate branch over the scan
    // (r22: the corpus scan runs once at cut time, so the main plan
    // shows ZERO parquet scans)
    val p = finalPlan("q211_pr_thresholds")
    assert(count("FileScan|Scan parquet", p) <= 1,
      s"the totals must not re-scan the corpus:\n$p")
  }

  test("q185/q179 vocabulary rank windows are group-limited (top-16 heap before the sort)") {
    // q185 partitions its window on a 2-value column — without the
    // group limit each corpus half's ENTIRE vocabulary sorts in one
    // task; q179 spreads per-source but still sorts each source's full
    // vocabulary. The literal r <= 16 predicate on the RAW rank
    // attribute lets InferWindowGroupLimit insert the per-partition
    // heap, so each task keeps 16 rows instead of Heap's-law many.
    // q185's ranked frame now sits behind a Checkpoints.cut (r16 — one
    // tokenize pass instead of three), so its registered query's plan
    // can't show the window; assert on the exposed pre-cut builder
    // (the peelRound/lpaRound pattern)
    val p185 = graft.queries.StatOps.headRanked(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p185.contains("WindowGroupLimit"),
      s"q185's head rank must heap-prune to r <= 16 before sorting:\n$p185")
    val p179 = finalPlan("q179_zipf_probe")
    assert(p179.contains("WindowGroupLimit"),
      s"q179 must heap-prune its rank window to r <= 16 before sorting:\n$p179")
  }

  test("q188 burstiness: global top-20 is TakeOrdered, no rank window at all") {
    val p = finalPlan("q188_burstiness")
    assert(count("Window", p) === 0,
      s"top-k must not be an unpartitioned rank window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must run as per-partition heaps + a 20-row driver merge:\n$p")
  }

  test("itemset/sequence miners: support prunes broadcast, no cartesian fallback") {
    // the only nested-loop joins allowed are the Cross builds against
    // 1-row aggregates (the n_baskets/n_sessions broadcast — the house
    // crossJoin pattern); the frequent-item/candidate prunes must reach
    // the basket frame as BroadcastHashJoins, never shuffles of the
    // floor-bounded side
    for (q <- Seq("q194_frequent_pairs", "q200_frequent_triples",
        "q201_sequence_pairs", "q213_sequence_triples")) {
      val p = finalPlan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      val bnlj = "BroadcastNestedLoopJoin BuildRight, Cross|" +
        "BroadcastNestedLoopJoin Cross"
      assert(count("BroadcastNestedLoopJoin", p) ===
        count(bnlj, p), s"$q: every BNLJ must be a Cross 1-row build:\n$p")
    }
    for (q <- Seq("q194_frequent_pairs", "q200_frequent_triples")) {
      val p = finalPlan(q)
      assert(count("BroadcastHashJoin", p) >= 2,
        s"$q: the support prune and attachment joins must broadcast:\n$p")
    }
  }

  // scan counting needs the STATIC plan: finalized adaptive plans hide
  // scans below leaf QueryStageExecs (the ScanAudit lesson), so AQE is
  // off while the plan under inspection is built
  private def scanCount(name: String, table: String): Int = {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        .collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.relation.location.rootPaths.headOption
                .exists(_.getName == table) => s
        }.size
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("staged drift queries pay ONE corpus scan (the r16 ScanAudit sweep, pinned)") {
    // the FromCounts trio cuts its normalized count table inside the
    // operator — the one corpus scan runs in the cut's own
    // materialization job, so the REGISTERED plan reads the staged
    // LogicalRDD and holds at most one residual corpus scan (q177 held
    // SIX before the sweep); ≥2 here is the repeated-scan smell back
    for (q <- Seq("q177_ks_drift", "q192_tv_drift", "q195_w1_drift"))
      assert(scanCount(q, "documents.parquet") <= 1,
        s"$q must not re-derive the staged count table per consumer")
  }

  test("q232 funnel pays ONE corpus scan (flags + fold in a single pass)") {
    assert(scanCount("q232_prep_funnel", "documents.parquet") <= 1,
      "the funnel must not re-scan per gate")
  }

  test("q231 binary Hamming: at most four embedding scans (codes, rerank fetch, two query builds)") {
    // the documented ANN multi-pass class: the 1-bit codes pass, the
    // candidate vector fetch, and the two pushed-filter query-side
    // builds; growth past 4 means a stage re-derives the corpus
    assert(scanCount("q231_binary_hamming_topk", "embeddings.parquet") <= 4)
  }

  test("q224 backoff LM: two heavy corpus passes (train fold + scoring), three scans total") {
    // train collapses to the staged (p2, p1, w) context-count table in
    // ONE pass; scoring explodes once; the third scan is the doc_id-only
    // presence read (column-pruned). Growth past 3 means a rate table
    // re-runs the explode
    assert(scanCount("q224_lm_backoff", "documents.parquet") <= 3)
  }

  test("q283 TPC-H Q22: NOT EXISTS plans as LeftAnti, no nested loop anywhere") {
    val df = SparkEntry.queries("q283_tpch_q22")(spark, dir)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.exists(_.joinType.toString == "LeftAnti"),
      s"the no-recent-orders predicate must become an anti-join:\n" +
        joins.map(_.joinType).mkString(","))
    // the UNCORRELATED global-average subquery is legal as a one-shot
    // scalar (executed once, reused as a literal) — the guard is that
    // nothing per-row survives: no nested-loop, no cartesian
    val ex = finalPlan("q283_tpch_q22")
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"), ex)
  }

  test("q287 TPC-H Q21: both correlated probes decorrelate — a LeftSemi AND a LeftAnti, no per-row subplan") {
    val df = SparkEntry.queries("q287_tpch_q21")(spark, dir)
    val opt = df.queryExecution.optimizedPlan
    val types = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.joinType.toString
    }
    assert(types.contains("LeftSemi") && types.contains("LeftAnti"),
      s"EXISTS→semi and NOT EXISTS→anti must both decorrelate: $types")
    val ex = finalPlan("q287_tpch_q21")
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"), ex)
  }

  test("q293 TPC-H Q16: NOT IN plans as a null-aware anti join; the IN-list pushes to the part scan") {
    // sf0.01, not the suite's sf0.001: the exclusion subquery is EMPTY
    // at sf0.001 and AQE's empty-relation propagation then (correctly)
    // erases the anti join from the final plan — the machinery is only
    // observable where the excluded set is non-empty
    val df = SparkEntry.queries("q293_tpch_q16")(spark, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case other => other.toString
    }
    assert(p.contains("LeftAnti"),
      s"NOT IN must become anti-join machinery:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("In(p_size"),
      s"the IN-list predicate must reach the part scan's PushedFilters:\n$p")
  }

  test("q294 TPC-H Q19: the equi-key extracts from the disjunction — hash join, never nested loop") {
    val p = finalPlan("q294_tpch_q19")
    assert(p.contains("HashJoin"),
      s"the common p_partkey = l_partkey must plan as an equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"the disjunction must not swallow the join key:\n$p")
  }

  test("q296 TPC-H Q20: both nesting levels decorrelate — scalar→aggregate-join inside, IN→LeftSemi outside") {
    val df = SparkEntry.queries("q296_tpch_q20")(spark, dir)
    val opt = df.queryExecution.optimizedPlan
    // level 1: the per-(part, supplier) demand scalar must be rewritten
    // away — a surviving per-row subplan re-aggregates lineitem once per
    // probe pair, quadratic at 100 TB
    assert(!opt.toString.contains("scalar-subquery"),
      s"the correlated scalar (inside the IN) must decorrelate:\n$opt")
    val aggs = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists(_.toString.contains("l_suppkey"))
        => a
    }
    // two grouped (partkey, suppkey) aggregates survive: the avail build
    // and the decorrelated 1996-demand side
    assert(aggs.size >= 2,
      s"both pair-grain aggregates must plan as grouped aggregates:\n$opt")
    // level 2: the IN membership must become a semi join
    val types = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.joinType.toString
    }
    assert(types.contains("LeftSemi"),
      s"IN must decorrelate to a LeftSemi: $types")
    val ex = finalPlan("q296_tpch_q20")
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"), ex)
  }

  test("q300 TPC-H Q7: the symmetric region-pair disjunction never breaks the equi joins") {
    val ex = finalPlan("q300_tpch_q7")
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"),
      s"the pair disjunction must stay a post-join filter:\n$ex")
  }

  test("q303 TPC-H Q11: the HAVING-threshold scalar is one-shot — no per-group re-scan") {
    // the uncorrelated total is legal as a one-shot scalar subquery
    // (executed once, reused as a literal); the guard is that nothing
    // per-row/per-group survives
    val ex = finalPlan("q303_tpch_q11")
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"), ex)
  }

  test("q305 TPC-H Q2: the correlated min decorrelates to a per-part aggregate-join") {
    val df = SparkEntry.queries("q305_tpch_q2")(spark, dir)
    val opt = df.queryExecution.optimizedPlan
    assert(!opt.toString.contains("scalar-subquery"),
      s"the correlated regional-min must be rewritten away:\n$opt")
    val aggs = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.exists(_.toString.toLowerCase
            .contains("min")) &&
            a.groupingExpressions.nonEmpty => a
    }
    assert(aggs.nonEmpty,
      s"the regional min must plan as a grouped aggregate:\n$opt")
    val ex = finalPlan("q305_tpch_q2")
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"), ex)
  }

  test("q280 TPC-H Q17: the correlated scalar subquery decorrelates to an aggregate-join") {
    val df = SparkEntry.queries("q280_tpch_q17")(spark, dir)
    val opt = df.queryExecution.optimizedPlan
    // the decorrelation is the whole point: a surviving per-row scalar
    // subplan would re-aggregate lineitem once per probe row — quadratic
    // at 100 TB
    assert(!opt.toString.contains("scalar-subquery"),
      s"the scalar subquery must be rewritten away:\n$opt")
    val aggs = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists(_.toString.contains("l_partkey"))
        => a
    }
    assert(aggs.nonEmpty,
      s"the per-part avg must plan as ONE grouped aggregate:\n$opt")
    val ex = finalPlan("q280_tpch_q17")
    assert(!ex.contains("BroadcastNestedLoopJoin") &&
      !ex.contains("CartesianProduct"),
      s"the avg side must equi-join back, never nested-loop:\n$ex")
  }

  test("r20 queries: every join equi-keyed — no nested loop, no cartesian") {
    // q311's rank join-backs, q313's level probes, q316's diagonal token
    // join: each is an equi-join by construction; a refactor that breaks
    // a key into a non-equi predicate would silently go nested-loop and
    // die at corpus scale
    for (q <- Seq("q311_spearman_avg_rank", "q313_longest_shared_span",
        "q316_exact_longest_span")) {
      val p = finalPlan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      // r21: q311's grouped two-phase ranks carry the lazy quantile-cuts
      // broadcast (a provably-1-row crossJoin, the q157 dangling class);
      // r22 tighten: conditioned non-equi joins held to the same bar
      assertNonEquiOneRow(q)
    }
  }

  test("the non-equi guard flags a conditioned data-sized nested loop (synthetic)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val a = Seq(1L, 2L, 3L).toDF("x")
    val b = Seq(1L, 2L, 3L).toDF("y")
    // conditioned but with no equi key and both sides >1 row: Spark can
    // only nested-loop this — exactly the shape r21's condition-less-only
    // check waved through
    val bad = a.join(b, col("x") < col("y"))
    val flagged = nonEquiJoins(bad)
    assert(flagged.nonEmpty, "a conditioned non-equi join must be flagged")
    assert(flagged.exists(j =>
      !(j.left.maxRows.contains(1L) || j.right.maxRows.contains(1L))),
      "the synthetic violation has no 1-row side, so the guard must fail it")
    // and an equi-keyed join with a residual range predicate is NOT flagged
    val ok = a.join(b.withColumnRenamed("y", "x").withColumn("z", col("x") + 1),
      Seq("x")).where(col("z") > col("x"))
    assert(nonEquiJoins(ok).isEmpty)
  }
}
