package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Chunking and sequence-packing invariants: coverage/overlap arithmetic on
  * known token counts, and — the load-bearing property of the two-phase
  * prefix sum — bucket-count independence of the packing result.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"w$i").mkString(" "))

  test("chunk: coverage, overlap, short docs, exact boundaries") {
    val docs = Seq(doc(1, 5), doc(2, 32), doc(3, 33), doc(4, 56), doc(5, 57))
      .toDF("doc_id", "text")
    val out = Packing.chunk(docs, "doc_id", "text", 32, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).map(_._4).toSeq === Seq(5), "sub-chunk doc emits one short chunk")
    assert(byDoc(2L).map(_._4).toSeq === Seq(32), "exactly one chunk at the boundary")
    assert(byDoc(3L).map(_._4).toSeq === Seq(32, 9), "one extra token forces a second chunk")
    assert(byDoc(4L).map(_._4).toSeq === Seq(32, 32), "56 = 32 + 24: two full chunks")
    assert(byDoc(5L).map(_._4).toSeq === Seq(32, 32, 9))
    // chunk i starts at token i*stride + 1; overlap region repeats
    assert(byDoc(3L)(1)._3.startsWith("w25 "), "second chunk starts at token 25 (stride 24)")
    assert(byDoc(3L)(0)._3.endsWith(" w32") && byDoc(3L)(1)._3.contains("w32"),
      "the 8-token overlap region appears in both chunks")
    // every token covered exactly: union of chunk tokens = all tokens
    val covered = byDoc(5L).flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 57).map(i => s"w$i").toSet)
  }

  test("packSequences: token conservation, bin arithmetic, straddle accounting") {
    // 10 docs x 100 tokens, seqLen 256: stream is 1000 tokens -> bins 0..3
    val docs = (0L until 10L).map(i => doc(i, 100)).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", 256)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getLong(2)).sum === 1000L, "every token accounted to exactly one bin")
    // doc 2 spans tokens [200, 300) -> straddles the 256 boundary
    assert(out(0).getLong(1) === 3 && out(0).getLong(5) === 1,
      "bin 0 holds docs 0-2 and exactly one straddler")
    assert(out.map(_.getLong(5)).sum === 3, "boundaries at 256/512/768 each split one doc")
  }

  test("packSequences bucketing survives pathological id distributions") {
    // the id shapes real pipelines produce: 990 docs crammed into 1% of the
    // id range (one tenant owning its prefix), plus one far outlier that
    // stretches the range 100x. A range-width scheme lands 99.9% of the
    // token mass in one bucket; quantile bounds must keep every bucket's
    // share near 1/buckets.
    val ids = (0L until 990L) :+ 100000L
    val docs = ids.map(i => doc(i, 10)).toDF("doc_id", "text")
    val buckets = 8
    val shares = Packing.bucketAssignments(docs, "doc_id", "text", buckets)
      .groupBy("b").agg(sum("n").as("bn")).collect()
      .map(_.getLong(1).toDouble / (ids.size * 10))
    assert(shares.max <= 2.0 / buckets,
      f"max bucket token share ${shares.max}%.3f exceeds 2/buckets")
    // and the packing result itself is still the buckets=1 reference
    val ref = Packing.packSequences(docs, "doc_id", "text", 512, buckets = 1)
      .orderBy("bin").collect().toSeq
    val got = Packing.packSequences(docs, "doc_id", "text", 512, buckets = buckets)
      .orderBy("bin").collect().toSeq
    assert(got === ref, "quantile bucketing must not change the packing")
  }

  test("packSequences on an empty frame returns an empty result, not MatchError") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", 256)
    assert(out.columns.toSeq ===
      Seq("bin", "n_docs", "n_tokens", "first_doc", "last_doc", "split_docs"))
    assert(out.count() === 0)
  }

  test("packSequences is bucket-count independent (two-phase prefix sum is exact)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = Packing.packSequences(docs, "doc_id", "text", 512, buckets = 1)
      .orderBy("bin").collect().toSeq
    for (b <- Seq(3, 7, 32)) {
      val got = Packing.packSequences(docs, "doc_id", "text", 512, buckets = b)
        .orderBy("bin").collect().toSeq
      assert(got === ref, s"buckets=$b must reproduce the buckets=1 packing exactly")
    }
  }

  test("deterministicShuffle: positions are a contiguous permutation in (h, id) order") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Packing.deterministicShuffle(docs, "doc_id", "shuf", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.count()
    assert(out.map(_._3).sorted.toSeq === (0L until n).toSeq,
      "pos must be exactly 0..N-1, no gaps or duplicates")
    // pos order == (h, id) lexicographic order
    val byPos = out.sortBy(_._3).map(t => (t._2, t._1)).toSeq
    assert(byPos === byPos.sorted, "pos must rank documents in (h, id) order")
  }

  test("deterministicShuffle is bucket-count independent and seed-reproducible") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = Packing.deterministicShuffle(docs, "doc_id", "shuf", 1)
      .orderBy("id").collect().toSeq
    for (b <- Seq(5, 32)) {
      val got = Packing.deterministicShuffle(docs, "doc_id", "shuf", b)
        .orderBy("id").collect().toSeq
      assert(got === ref, s"buckets=$b must reproduce the buckets=1 permutation")
    }
    // a different seed is a different permutation (with overwhelming prob.)
    val other = Packing.deterministicShuffle(docs, "doc_id", "shuf2", 8)
      .orderBy("id").collect().toSeq
    assert(other.map(r => r.getLong(2)) !== ref.map(r => r.getLong(2)),
      "changing the seed must change the permutation")
  }

  test("lengthBatches: batch arithmetic, padding accounting, bucket independence") {
    // lengths 1..10 repeated: with batchSize 4, ranks group sorted lengths
    val docs = (0L until 20L).map(i => doc(i, (i % 10).toInt + 1)).toDF("doc_id", "text")
    val out = Packing.lengthBatches(docs, "doc_id", "text", 4, buckets = 8)
      .orderBy("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.map(_._2).sum === 20L, "every sequence lands in exactly one batch")
    assert(out.map(_._1).toSeq === (0L until 5L).toSeq, "20 seqs / 4 = 5 batches")
    // sorted lengths are 1,1,2,2,...,10,10 -> batch 0 = (1,1,2,2): padding 2
    assert(out(0) === ((0L, 4L, 1L, 2L, 6L, 2L)))
    // per-batch padding identity holds everywhere
    out.foreach { case (_, n, _, mx, sm, pad) => assert(pad === n * mx - sm) }
    // and the result is bucket-count independent
    val ref = Packing.lengthBatches(docs, "doc_id", "text", 4, buckets = 1)
      .orderBy("batch").collect().toSeq
    assert(Packing.lengthBatches(docs, "doc_id", "text", 4, buckets = 8)
      .orderBy("batch").collect().toSeq === ref)
    // length-sorted batching must never pad more than unsorted id-order
    val unsortedPad = docs
      .selectExpr("doc_id", "size(filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)) len")
      .selectExpr("cast(floor(doc_id / 4) as long) batch", "len")
      .groupBy("batch").agg(count(lit(1)).as("n"), max("len").as("mx"), sum("len").as("sm"))
      .selectExpr("sum(n * mx - sm)").head.getLong(0)
    assert(out.map(_._6).sum <= unsortedPad,
      "length-sorting must not increase total padding")
  }

  test("deterministicShuffle survives pathological id distributions and empty input") {
    val ids = (0L until 990L) :+ 100000L
    val docs = ids.map(i => doc(i, 1)).toDF("doc_id", "text")
    val buckets = 8
    val out = Packing.deterministicShuffle(docs, "doc_id", "s", buckets)
    assert(out.select(countDistinct("pos")).head.getLong(0) === ids.size.toLong)
    // the permutation stays contiguous regardless of the id shape
    assert(out.agg(min("pos"), max("pos")).head ===
      org.apache.spark.sql.Row(0L, ids.size.toLong - 1))
    // and the internal quantile bucketing on h stays balanced: recompute
    // the same cut assignment from the emitted hashes and bound every
    // bucket's share (this is the property that keeps phase 2
    // partition-parallel on hostile id spaces)
    val cuts = out.stat.approxQuantile("h",
      (1 until buckets).map(_.toDouble / buckets).toArray, 1e-3)
    val bCol = cuts.map(c => when(col("h") >= lit(c), 1L).otherwise(0L))
      .reduce(_ + _)
    val shares = out.groupBy(bCol.as("g")).count().collect()
      .map(_.getLong(1).toDouble / ids.size)
    assert(shares.max <= 2.0 / buckets,
      f"max hash-bucket share ${shares.max}%.3f exceeds 2/buckets")
    val empty = Packing.deterministicShuffle(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "s", 8)
    assert(empty.columns.toSeq === Seq("id", "h", "pos") && empty.count() === 0)
  }

  test("curriculumOrder: stage-monotone, equal-fill stages, seeded intra-stage shuffle") {
    // 40 docs with token counts 1..40 — difficulty rank == n_toks - 1
    val docs = (1L to 40L).map(i => doc(i, i.toInt)).toDF("doc_id", "text")
    val out = Packing.curriculumOrder(docs, "doc_id", "text", 4, "s", 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("stage"), r.getAs[Long]("h"), r.getAs[Long]("pos")))
    assert(out.length === 40)
    // positions are a contiguous permutation
    assert(out.map(_._5).sorted.toSeq === (0L until 40L))
    // equal-fill: 4 stages x 10 docs, stage = (rank*4) div 40
    val byStage = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byStage === Map(0L -> 10, 1L -> 10, 2L -> 10, 3L -> 10))
    // stage-monotone in difficulty: every doc in stage k is shorter than
    // every doc in stage k+1 (token counts are unique here)
    for (k <- 0L to 2L) {
      val maxK = out.filter(_._3 == k).map(_._2).max
      val minK1 = out.filter(_._3 == k + 1).map(_._2).min
      assert(maxK < minK1, s"stage $k overlaps stage ${k + 1}")
    }
    // all of stage k precedes any of stage k+1 in the curriculum order
    for (k <- 0L to 2L) {
      val lastK = out.filter(_._3 == k).map(_._5).max
      val firstK1 = out.filter(_._3 == k + 1).map(_._5).min
      assert(lastK < firstK1)
    }
    // within a stage the order follows the seeded hash, not the length
    val s0 = out.filter(_._3 == 0L).sortBy(_._5)
    assert(s0.map(_._4).toSeq === s0.map(_._4).sorted.toSeq,
      "intra-stage order must follow the seeded hash")
    // a different seed permutes within stages but keeps the same stages
    val other = Packing.curriculumOrder(docs, "doc_id", "text", 4, "t", 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("stage"),
        r.getAs[Long]("pos")))
    assert(other.map(t => t._1 -> t._2).toMap === out.map(t => t._1 -> t._3).toMap)
    assert(other.map(t => t._1 -> t._3).toMap !== out.map(t => t._1 -> t._5).toMap)
    // empty input keeps the schema
    val empty = Packing.curriculumOrder(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 4, "s", 8)
    assert(empty.columns.toSeq === Seq("id", "n_toks", "stage", "h", "pos")
      && empty.count() === 0)
  }

  test("gridCumsums small and bucketed paths agree on every consumer") {
    // the r22 pooled-grid cumulative dispatches on measured grid size:
    // graft.grid.cumsum.smallMax=0 forces the bucketed path, the default
    // takes the one-task path at this scale — results must be identical
    // for every operator riding it (inclusive cum, totals, gap splicing,
    // exclusive cum derived at the caller, non-numeric fallback)
    import graft.operators.{Drift, Eval}
    val rnd = new scala.util.Random(7)
    // near-unique values + heavy ties + negatives, two groups
    val rows = (1 to 400).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v = if (i % 5 == 0) 42L else rnd.nextInt(2000).toLong - 1000L
      (g, v, (rnd.nextInt(9) + 1).toLong)
    }
    val counts = rows.toDF("g", "v", "c")
    val scored = rows.map { case (g, v, c) => (g == "a", v, c) }
      .toDF("pos", "v", "c")
    def both(f: => Array[org.apache.spark.sql.Row])
        : (Seq[Seq[Any]], Seq[Seq[Any]]) = {
      val small = f.map(_.toSeq).toSeq
      spark.conf.set("graft.grid.cumsum.smallMax", "0")
      try { (small, f.map(_.toSeq).toSeq) }
      finally spark.conf.unset("graft.grid.cumsum.smallMax")
    }
    val (ks1, ks2) = both(
      Drift.ksFromCounts(counts, "g", "v", "c").collect())
    assert(ks1.toSet === ks2.toSet && ks1.nonEmpty)
    val (w11, w12) = both(
      Drift.w1FromCounts(counts, "g", "v", "c").collect())
    assert(w11.toSet === w12.toSet && w11.nonEmpty)
    val (psi1, psi2) = both(
      Drift.psiBucketsFromCounts(counts, "g", "v", "c", 8).collect())
    assert(psi1.toSet === psi2.toSet && psi1.nonEmpty)
    val (auc1, auc2) = both(
      Eval.aucHistogram(scored, "pos", "v").collect())
    assert(auc1 === auc2)
    val (pr1, pr2) = both(
      Eval.confusionByThreshold(scored, "pos", "v").collect())
    assert(pr1.toSet === pr2.toSet && pr1.nonEmpty)
    // non-numeric grid falls back to one bucket on the bucketed path
    val sCounts = rows.map { case (g, v, c) => (g, f"s$v%05d", c) }
      .toDF("g", "v", "c")
    val (ksS1, ksS2) = both(
      Drift.ksFromCounts(sCounts, "g", "v", "c").collect())
    assert(ksS1.toSet === ksS2.toSet && ksS1.nonEmpty)
  }
}
