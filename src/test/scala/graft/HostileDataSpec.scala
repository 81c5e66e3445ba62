package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, TextFns}
import graft.operators.{Components, Dedup, Packing, Sampling, Skew}

/** Adversarial-distribution hardening: the operators that survive a benign
  * corpus must also survive the shapes hostile data actually takes — a
  * fully-duplicated corpus, a single hot key owning every row, a star/path
  * graph, a degenerate weight vector, one document dwarfing the corpus.
  * Each case asserts exact semantics (not just "no crash"): the hostile
  * shape must change the COST profile only, never the answer.
  */
class HostileDataSpec extends SparkSpec {
  import spark.implicits._

  test("fully-duplicated corpus: exact dedup keeps one; LSH emits all true pairs; spanScrub empties every doc") {
    val n = 30
    val txt = (1 to 20).map(i => s"tok$i").mkString(" ")
    val corpus = (1L to n.toLong).map(i => (i, txt)).toDF("doc_id", "text")

    val survivors = Dedup.exact(corpus, lower(col("text")), "doc_id")
    assert(survivors.count() === 1L)
    assert(survivors.select("doc_id").as[Long].head() === 1L)

    // n identical docs have n(n-1)/2 TRUE near-dup pairs — LSH must not
    // prune any of them (banding prunes non-dups; these are all dups)
    val pairs = Dedup.minHashLsh(corpus, "doc_id", "text", 3, 0.9)
    assert(pairs.count() === n.toLong * (n - 1) / 2)
    assert(pairs.agg(min("jaccard")).as[Double].head() === 1.0)

    // every span is shared by all docs -> everything scrubbed
    val scrubbed = Dedup.spanScrub(corpus, "doc_id", "text", 8)
    assert(scrubbed.agg(sum("kept_tokens")).as[Long].head() === 0L)
    assert(scrubbed.filter(col("clean_text") =!= "").count() === 0L)

    // containment on identical docs is 1.0 in BOTH directions: n(n-1)
    // directed rows — the output is inherently quadratic in the clone
    // count, like any true-pair listing
    val cont = Dedup.ngramContainment(corpus, "doc_id", "text", 3, 0.8)
    assert(cont.count() === n.toLong * (n - 1))
    assert(cont.agg(min("containment")).as[Double].head() === 1.0)

    // identical docs all tie on the length key: every clone pair is within
    // any window ≥ n, and at w = n the sorted neighborhood must list all
    // true pairs exactly once
    val snm = Dedup.snmPairs(corpus, "doc_id", "text", 3, n, 0.9)
    assert(snm.count() === n.toLong * (n - 1) / 2)
    assert(snm.agg(min("jaccard")).as[Double].head() === 1.0)
  }

  test("fully-duplicated corpus: prefix filter still emits every true pair") {
    // all-same docs ⇒ every shingle has df=n and every prefix is the same
    // set — the prefix index degenerates to q34's cost profile but the
    // LOSSLESS contract must hold: all n(n-1)/2 pairs at jaccard 1.0
    val n = 25
    val txt = (1 to 20).map(i => s"tok$i").mkString(" ")
    val corpus = (1L to n.toLong).map(i => (i, txt)).toDF("doc_id", "text")
    val pre = Dedup.ngramJaccardPrefix(corpus, "doc_id", "text", 3, 0.9)
    assert(pre.count() === n.toLong * (n - 1) / 2)
    assert(pre.select("jaccard").distinct().as[Double].collect().toSeq === Seq(1.0))
  }

  test("pageRank: zero-weight edges are absent — their source goes dangling") {
    // a: one real edge + one zero edge (zero ignored, outW=1);
    // z: ONLY a zero-weight edge — honestly dangling-by-filter, and since
    // it has no other incidence it leaves the graph entirely
    val edges = Seq(("a", "b", 1L), ("a", "c", 0L), ("z", "b", 0L))
      .toDF("s", "d", "w")
    val out = Components.pageRank(edges, "s", "d", Some("w"), 2)
      .as[(String, Long)].collect().toMap
    assert(out.keySet === Set("a", "b"),
      s"c and z ride only zero-weight edges and must vanish, got $out")
    val ref = Components.pageRank(Seq(("a", "b", 1L)).toDF("s", "d", "w"),
      "s", "d", Some("w"), 2).as[(String, Long)].collect().toMap
    assert(out === ref, "zero-weight edges must not perturb the solved graph")
  }

  test("MAD gate where >50% of a source shares one value: off-majority rows flagged") {
    val rows = (1L to 60L).map(i => (i, "s", 100L)) ++
      Seq((100L, "s", 101L), (101L, "s", 250L))
    val out = graft.operators.Robust.madOutliers(
        rows.toDF("id", "g", "v"), "id", "g", "v", 3)
      .filter(col("outlier")).select("id").as[Long].collect().sorted
    assert(out.toSeq === Seq(100L, 101L),
      "MAD=0 degenerate: strict > flags every deviation from the majority value")
  }

  test("star graph (maximum-degree hub) and long path both converge to one component") {
    // hub 0 touches every node: diameter 2, but degree = n-1 (worst skew)
    val star = (1L to 200L).map(i => (0L, i)).toDF("src", "dst")
    val starOut = Components.connectedComponents(star, "src", "dst")
    assert(starOut.select("cluster").distinct().as[Long].collect() === Array(0L))
    assert(starOut.count() === 201L)

    // path of length 60: diameter far beyond the 8 propagation rounds —
    // must hit the star-contraction fallback and still converge
    val path = (0L until 60L).map(i => (i, i + 1)).toDF("src", "dst")
    val pathOut = Components.connectedComponents(path, "src", "dst")
    assert(pathOut.select("cluster").distinct().as[Long].collect() === Array(0L))
    assert(pathOut.count() === 61L)
  }

  test("salted join with 100% hot key equals the plain join") {
    val big = (1L to 500L).map(i => ("hot", i)).toDF("k", "v")
    val small = Seq(("hot", "payload1"), ("hot", "payload2"), ("cold", "x"))
      .toDF("k", "p")
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
    val plain = big.join(small, "k")
    assert(salted.count() === 1000L)
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
  }

  test("Misra-Gries guarantee holds at both extremes: one dominant key and all-distinct") {
    val k = 5
    // one key is 90% of the stream
    val dominant = ((1 to 900).map(_ => "big") ++ (1 to 100).map(i => s"u$i"))
      .toDF("tok")
    val est = dominant.agg(HeavyHitters.sketch(spark, col("tok"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e._1"), col("e._2"))
      .as[(String, Long)].collect().toMap
    // undercount bound: est >= true - n/(k+1)
    assert(est.contains("big"))
    assert(est("big") >= 900L - 1000L / (k + 1))

    // all-distinct: nothing can be guaranteed heavy; summary stays O(k)
    // and every reported min_count respects the bound (true count = 1)
    val distinct = (1 to 1000).map(i => s"d$i").toDF("tok")
    val out = distinct.agg(HeavyHitters.sketch(spark, col("tok"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e._2")).as[Long].collect()
    assert(out.length <= k)
    out.foreach(c => assert(c <= 1L, "min_count may never exceed the true count"))
  }

  test("priority sampling with zero-weight rows: never sampled while positive weights remain") {
    val df = ((1L to 50L).map(i => (i, 0L)) ++ (51L to 60L).map(i => (i, 5L)))
      .toDF("id", "w")
    val out = Sampling.prioritySample(df, "id", "w", 10)
      .select("id", "weight").as[(Long, Long)].collect()
    assert(out.length === 10)
    assert(out.forall(_._2 > 0L), "zero-weight rows (priority 0) must lose to any positive weight")
  }

  test("one giant document dominating the corpus: packing conserves tokens and accounts the straddle") {
    val giant = (1 to 5000).map(i => s"g$i").mkString(" ")
    val docs = ((1L to 20L).map(i => (i, "a b c")) :+ (21L, giant))
      .toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", 128)
      .select("bin", "n_docs", "n_tokens", "split_docs")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // every doc STARTS in bin 0 (20×3 tokens, giant at offset 60) — one
    // output row; the giant's 39-bin span must show as ONE straddle, not
    // phantom per-bin rows
    assert(out.length === 1)
    assert(out(0) === ((0L, 21L, 20L * 3 + 5000L, 1L)))
  }

  test("tokenizer is total on hostile strings") {
    val weird = Seq((1L, ""), (2L, "   \t  "), (3L, "héllo wörld   x"),
      (4L, "a" * 10000)).toDF("doc_id", "text")
    val out = weird.select(col("doc_id"),
      size(TextFns.tokens(col("text"))).as("n")).as[(Long, Int)].collect().toMap
    assert(out(1L) === 0 && out(2L) === 0)
    assert(out(3L) >= 2)
    assert(out(4L) === 1)
  }
}
