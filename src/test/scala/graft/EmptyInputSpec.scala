package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Components, Dedup, IncrementalAgg, Mixture, Packing,
  Sampling, Similarity, Skew, Upsert}

/** Zero-row inputs across the operator family. An empty partition, an
  * empty daily delta, or a filter that matched nothing is routine at
  * scale — every operator must return an empty (or identity) result with
  * its normal schema, never throw. This is the regression guard for the
  * head(1)/null-aggregate short-circuits scattered through the operators
  * (packSequences' former MatchError on agg(min,max) of zero rows is the
  * canonical failure mode).
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyVecs: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private def someDocs: DataFrame =
    Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"))
      .toDF("doc_id", "text")
  private def someVecs: DataFrame =
    Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")

  test("text/dedup operators return empty results on an empty corpus") {
    assert(Dedup.exact(emptyDocs, lower(col("text")), "doc_id").count() === 0)
    assert(Dedup.minHashLsh(emptyDocs, "doc_id", "text", 3, 0.6).count() === 0)
    assert(Dedup.ngramJaccard(emptyDocs, "doc_id", "text", 3, 0.6).count() === 0)
    assert(Dedup.ngramContainment(emptyDocs, "doc_id", "text", 3, 0.8).count() === 0)
    assert(Dedup.snmPairs(emptyDocs, "doc_id", "text", 3, 10, 0.6).count() === 0)
    assert(Dedup.simHashPairs(emptyDocs, "doc_id", "text", 3).count() === 0)
    assert(Dedup.winnow(emptyDocs, "doc_id", "text", 3, 4).count() === 0)
    assert(Dedup.snmPairsMultiPass(emptyDocs, "doc_id", "text", 3, 10, 0.6)
      .count() === 0)
    assert(Dedup.spanScrub(emptyDocs, "doc_id", "text", 16).count() === 0)
    assert(Packing.chunk(emptyDocs, "doc_id", "text", 32, 8).count() === 0)
    assert(Mixture.temperatureSampleSummary(
      emptyDocs, "doc_id", "text", "text", 3, 10).count() === 0)
    assert(Sampling.prioritySample(
      emptyDocs.withColumn("w", lit(1L)), "doc_id", "w", 5).count() === 0)
    assert(Dedup.ngramJaccardPrefix(emptyDocs, "doc_id", "text", 3, 0.6)
      .count() === 0)
    assert(Sampling.prioritySamplePerGroup(
      emptyDocs.withColumn("w", lit(1L)).withColumn("g", lit("s")),
      "doc_id", "g", "w", 5).count() === 0)
    assert(graft.operators.Robust.madOutliers(
      emptyDocs.withColumn("v", lit(1L)).withColumn("g", lit("s")),
      "doc_id", "g", "v", 3).count() === 0)
    // empty LABEL side and empty EVENT side of the point-in-time join
    val someLabels = Seq((1L, 5L, new java.sql.Timestamp(7200000L)))
      .toDF("lid", "user", "lts")
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user", "ets", "v")
    assert(graft.operators.Features.pointInTime(someLabels.limit(0),
      emptyEvents, "user", "lid", "lts", "ets", 3600L,
      Seq(count(lit(1)).as("n"))).count() === 0)
    assert(graft.operators.Features.pointInTime(someLabels, emptyEvents,
      "user", "lid", "lts", "ets", 3600L,
      Seq(count(lit(1)).as("n"))).count() === 1,
      "labels survive an empty event stream (left join)")
    assert(graft.operators.Collocations.pmiPhrases(emptyDocs, "text", 2, 10)
      .count() === 0)
    assert(Mixture.epochMix(emptyDocs, "doc_id", "text", "text",
      Seq("x" -> 1L), 1, 1, 3).count() === 0)
    // empty pair frame: every scored doc is its own singleton, all kept
    val scored = someDocs.withColumn("sc", lit(1.0))
    val sv = Dedup.survivorsByScore(
      emptyDocs.select(col("doc_id").as("id_a"), col("doc_id").as("id_b")),
      scored, "doc_id", "sc")
    assert(sv.count() === 2 && sv.where(col("kept")).count() === 2)
    // empty scores: nothing to select from
    assert(Dedup.survivorsByScore(
      someDocs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b")),
      emptyDocs.withColumn("sc", lit(1.0)), "doc_id", "sc").count() === 0)
    // profile card on empty input keeps its full fixed row set
    assert(graft.operators.Profile.card(emptyDocs, Seq("text"), Seq("doc_id"))
      .count() === 7)
  }

  test("asymmetric operators: one empty side behaves as identity/empty") {
    // empty probe / empty corpus for decontamination
    assert(Dedup.contamination(someDocs, emptyDocs, "doc_id", "text", 3, 1)
      .count() === 0)
    assert(Dedup.contamination(emptyDocs, someDocs, "doc_id", "text", 3, 1)
      .count() === 0)
    // empty history -> whole batch is new; empty batch -> nothing new
    assert(Dedup.incrementalNew(emptyDocs, someDocs, lower(col("text")), 100)
      .count() === 2)
    assert(Dedup.incrementalNew(someDocs, emptyDocs, lower(col("text")), 100)
      .count() === 0)
    // upsert: empty updates = base unchanged; empty base = updates
    assert(Upsert(someDocs, emptyDocs, Seq("doc_id")).count() === 2)
    assert(Upsert(emptyDocs, someDocs, Seq("doc_id")).count() === 2)
    assert(IncrementalAgg.merge(
      IncrementalAgg.partial(someDocs.withColumn("v", lit(1L)), Seq("doc_id"), "v"),
      IncrementalAgg.partial(emptyDocs.withColumn("v", lit(1L)), Seq("doc_id"), "v"),
      Seq("doc_id")).count() === 2)
  }

  test("similarity operators return empty results on an empty corpus") {
    assert(Similarity.semanticContamination(emptyVecs, "vec_id", "embedding",
      col("vec_id") === 0L, 0.5).count() === 0)
    assert(Similarity.bruteForceTopK(emptyVecs, "vec_id", "embedding",
      col("vec_id") < 0, 5).count() === 0)
    assert(Similarity.quantizedTopK(emptyVecs, "vec_id", "embedding",
      col("vec_id") < 0, 5).count() === 0)
    assert(Similarity.ivfTopK(emptyVecs, "vec_id", "embedding",
      col("vec_id") < 0, 5, 4, 2).count() === 0)
    assert(Similarity.kmeansCentroids(emptyVecs, "vec_id", "embedding", 4, 2)
      .count() === 0)
    assert(Similarity.cosinePairs(emptyVecs, "vec_id", "embedding", 0.5)
      .count() === 0)
    assert(Similarity.cosinePairsLsh(emptyVecs, "vec_id", "embedding", 0.5)
      .count() === 0)
    assert(Similarity.semDedup(emptyVecs, "vec_id", "embedding", 0.5, 4)
      .count() === 0)
    assert(Similarity.pqTopK(emptyVecs, "vec_id", "embedding",
      col("vec_id") < 0, 5, m = 2, kCodes = 4).count() === 0)
    assert(Similarity.pqEncode(emptyVecs, "vec_id", "embedding",
      Similarity.pqTrain(emptyVecs, "vec_id", "embedding", 2, 4)).count() === 0)
    // the q122 serving shape: cached codebook + mKnown WITHOUT dKnown —
    // the d-probe must not head() an empty corpus (regression guard for
    // the mKnown>0 path that used to skip the emptiness check)
    val cb = Similarity.pqTrain(someVecs, "vec_id", "embedding", 2, 2)
    assert(Similarity.pqEncode(emptyVecs, "vec_id", "embedding", cb,
      mKnown = 2).count() === 0)
    assert(Similarity.pqTopKWith(emptyVecs, "vec_id", "embedding",
      col("vec_id") < 0, 5, cb, refine = 10, mKnown = 2).count() === 0)
    val emptyLabeled = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardNegatives(emptyLabeled, "vec_id", "embedding",
      "label", col("vec_id") < 0, 5).count() === 0)
    assert(Similarity.randomProjection(emptyVecs, "vec_id", "embedding",
      16, "s").count() === 0)
    // no queries at all: an empty query set yields an empty result even
    // over a non-empty corpus
    assert(Similarity.bruteForceTopK(someVecs, "vec_id", "embedding",
      lit(false), 5).count() === 0)
    // rank fusion over empty rankings: empty, not a throw
    val emptyRanking = Seq.empty[(Long, Int, Long)]
      .toDF("query_id", "rank", "neighbor_id")
    assert(Similarity.rrfFuse(Seq(emptyRanking, emptyRanking), 5).count() === 0)
    // MMR: empty corpus and empty query set both yield empty, not a throw
    assert(Similarity.mmrRerank(emptyVecs, "vec_id", "embedding",
      col("vec_id") < 0, 3, 5, 0.5).count() === 0)
    assert(Similarity.mmrRerank(someVecs, "vec_id", "embedding",
      lit(false), 3, 5, 0.5).count() === 0)
  }

  test("BPE: empty merge list and empty corpus through encode/vocabStats") {
    import graft.operators.Bpe
    // no merges: encode is pure char-splitting, lossless
    val out = Bpe.encode(someDocs, "doc_id", "text", Seq.empty)
      .select("id", "toks").as[(Long, Seq[String])].collect().toMap
    assert(out(1L).mkString === "alphabetagammadelta")
    assert(out(1L).forall(_.length === 1))
    // empty model: vocabStats of a zero-word segmentation is empty
    val empty = Bpe.learn(emptyDocs, "text", 3)
    assert(Bpe.vocabStats(empty).count() === 0)
    assert(Bpe.encode(emptyDocs, "doc_id", "text", empty.merges).count() === 0)
  }

  test("q131/q132 LM scoring on an empty corpus returns empty, not a throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_lm").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("q131_lm_fluency")(spark, dir).count() === 0)
    assert(SparkEntry.queries("q132_dsir_weights")(spark, dir).count() === 0)
  }

  test("q112 BM25 on an empty corpus returns empty, not NPE") {
    // the corpus-stats head() sees Row(0, null) here — the avgdl guard
    // must absorb it (sum over zero rows is null, n is 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("q112_bm25")(spark, dir).count() === 0)
  }

  test("graph/skew operators tolerate empty inputs") {
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Components.connectedComponents(emptyEdges, "src", "dst").count() === 0)
    assert(Components.resourceAllocationCandidates(
      emptyEdges, "src", "dst").count() === 0)
    assert(Skew.saltedCountSum(
      emptyDocs.withColumn("v", lit(1L)), Seq("doc_id"), "v").count() === 0)
    assert(Skew.saltedJoin(emptyDocs, someDocs.select(col("doc_id"),
      col("text").as("t2")), "doc_id").count() === 0)
    assert(Skew.saltedJoin(someDocs, emptyDocs.select(col("doc_id"),
      col("text").as("t2")), "doc_id").count() === 0)
  }

  test("drift/eval/itemset operators tolerate empty inputs") {
    val emptyCounts = Seq.empty[(String, Long, Long)].toDF("g", "v", "c")
    val someCounts = Seq(("a", 1L, 2L), ("b", 2L, 1L)).toDF("g", "v", "c")
    assert(graft.operators.Drift
      .ksFromCounts(emptyCounts, "g", "v", "c").count() === 0)
    assert(graft.operators.Drift
      .tvFromCounts(emptyCounts, "g", "v", "c").count() === 0)
    assert(graft.operators.Drift
      .w1FromCounts(emptyCounts, "g", "v", "c").count() === 0)
    // between-states: one empty side is NOT empty output — every group
    // from the populated side reports with the other side's n = 0 (the
    // "no basis for comparison" contract the consumer reads off nA·nB)
    val oneSided = graft.operators.Drift
      .ksBetweenCounts(someCounts, emptyCounts, "g", "v", "c")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(oneSided === Map("a" -> ((2L, 0L)), "b" -> ((1L, 0L))))
    assert(graft.operators.Drift
      .ksBetweenCounts(emptyCounts, emptyCounts, "g", "v", "c")
      .count() === 0)
    // an empty micro-batch merge is the identity on the state
    assert(graft.operators.Drift
      .mergeCounts(someCounts, Seq.empty[(String, Long)].toDF("g", "v"),
        "g", "v", "c")
      .collect().map(_.toSeq).toSet ===
      someCounts.collect().map(_.toSeq).toSet)
    val emptyLabeled = Seq.empty[(Boolean, Long)].toDF("pos", "v")
    val aucRow = graft.operators.Eval
      .aucHistogram(emptyLabeled, "pos", "v").collect()
    assert(aucRow.length === 1 && aucRow.head.isNullAt(0),
      "empty-input AUC is the documented all-null single row")
    assert(graft.operators.Eval
      .giniPerGroup(emptyCounts, "g", "v", "c").count() === 0)
    val emptyBaskets = Seq.empty[(Int, String)].toDF("bid", "it")
    assert(graft.operators.Itemsets
      .frequentPairs(emptyBaskets, Seq("bid"), "it", 1L, 10L).count() === 0)
    assert(graft.operators.Itemsets
      .frequentTriples(emptyBaskets, Seq("bid"), "it", 1L, 10L).count() === 0)
  }

  test("the r17 operators return empty/identity results on empty inputs") {
    val emptyGrouped = Seq.empty[(String, Boolean, Long)].toDF("g", "pos", "v")
    assert(graft.operators.Eval
      .aucHistogramPerGroup(emptyGrouped, "g", "pos", "v").count() === 0)
    assert(graft.operators.Eval
      .confusionByThresholdPerGroup(emptyGrouped, "g", "pos", "v")
      .count() === 0)
    assert(Sampling.budgetSelectPerGroup(
      Seq.empty[(String, Long, Long, Long)].toDF("g", "id", "sc", "c"),
      "id", "g", "sc", "c", 100L).count() === 0)
    assert(Similarity.binaryHammingTopK(emptyVecs, "vec_id", "embedding",
      col("vec_id") < 1, 8, 4).count() === 0)
    // an all-queries corpus still pairs each query against the others
    assert(Similarity.binaryHammingTopK(someVecs, "vec_id", "embedding",
      col("vec_id") < 100, 8, 4).count() === 2)
    assert(Components.kTruss(
      Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d", 4, 3).count() === 0)
    // GramAggregator on zero rows finishes to the empty triangle
    val ga = org.apache.spark.sql.functions.udaf(
      graft.functions.GramAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val g = emptyVecs.agg(ga(col("embedding")).as("g"))
      .select(explode(col("g._1"))).count()
    assert(g === 0)
  }

  test("the r19 operators return empty/identity results on empty inputs") {
    // Kendall census: empty in, empty out (and a singleton group has
    // zero pairs, all census columns 0)
    val emptyKendall = Seq.empty[(String, Long, Long, Long)]
      .toDF("g", "id", "x", "y")
    assert(graft.operators.Concordance
      .kendallCensus(emptyKendall, "g", "id", "x", "y").count() === 0)
    val single = graft.operators.Concordance.kendallCensus(
        Seq(("a", 1L, 5L, 7L)).toDF("g", "id", "x", "y"),
        "g", "id", "x", "y")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(single.toSeq === Seq(("a", 0L, 0L, 0L, 0L, 0L, 0L)))
    // Kuiper: empty sides and one-empty-side (n_a or n_b = 0 ⇒ every
    // gap term is 0 — "no basis for comparison", the family contract)
    val emptyCounts = Seq.empty[(String, Long, Long)].toDF("g", "v", "c")
    val someCounts = Seq(("a", 1L, 2L), ("a", 2L, 3L)).toDF("g", "v", "c")
    assert(graft.operators.Drift
      .kuiperBetweenCounts(emptyCounts, emptyCounts, "g", "v", "c")
      .count() === 0)
    val oneSide = graft.operators.Drift
      .kuiperBetweenCounts(someCounts, emptyCounts, "g", "v", "c")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(oneSide.toSeq === Seq(("a", 0L, 0L, 0L, 5L, 0L)))
    // winnow index lifecycle: an empty batch probes to zero matches; an
    // empty corpus builds a valid (empty) index that probes to zero
    val p1 = java.nio.file.Files.createTempDirectory("graft_empty_win").toString
    Dedup.buildWinnowIndex(someDocs, "doc_id", "text", 3, 4, p1)
    assert(Dedup.winnowIndexedMatches(spark, p1, emptyDocs,
      "doc_id", "text", 1).count() === 0)
    val p2 = java.nio.file.Files.createTempDirectory("graft_empty_win2").toString
    Dedup.buildWinnowIndex(emptyDocs, "doc_id", "text", 3, 4, p2)
    assert(Dedup.winnowIndexedMatches(spark, p2, someDocs,
      "doc_id", "text", 1).count() === 0)
  }

  test("the r20 operators return empty/identity results on empty inputs") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    // span family: empty candidates in, empty out; candidates against an
    // empty corpus score level 0 / span 0 (no gram can match)
    assert(Dedup.longestSharedSpanLevel(someDocs, "doc_id", "text",
      emptyPairs).count() === 0)
    assert(Dedup.exactLongestSharedSpan(someDocs, "doc_id", "text",
      emptyPairs).count() === 0)
    val ghostPairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val lvl = Dedup.longestSharedSpanLevel(emptyDocs, "doc_id", "text",
      ghostPairs).as[(Long, Long, Int)].collect()
    assert(lvl.toSeq === Seq((1L, 2L, 0)))
    val ex = Dedup.exactLongestSharedSpan(emptyDocs, "doc_id", "text",
      ghostPairs).as[(Long, Long, Long)].collect()
    assert(ex.toSeq === Seq((1L, 2L, 0L)))
    // average-rank Spearman: empty in, empty out; singleton group ranks
    // to itself (d2 = 0, no tie terms)
    assert(graft.operators.Eval.spearmanAvgRankPerGroup(
      Seq.empty[(Long, String, Long, Long)].toDF("id", "g", "x", "y"),
      "id", "g", "x", "y").count() === 0)
    val one = graft.operators.Eval.spearmanAvgRankPerGroup(
        Seq((1L, "a", 5L, 7L)).toDF("id", "g", "x", "y"),
        "id", "g", "x", "y")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(one.toSeq === Seq(("a", 1L, 0L, 0L, 0L)))
    // compaction of a freshly-built (no appends) index is a no-op in
    // content: probe before ≡ after, file count does not grow
    val p = java.nio.file.Files.createTempDirectory("graft_empty_cmp").toString
    Dedup.buildWinnowIndex(someDocs, "doc_id", "text", 3, 4, p)
    val before = Dedup.winnowIndexedMatches(spark, p, someDocs,
      "doc_id", "text", 1).collect().map(_.toSeq).toSet
    val (b, a) = Dedup.compactWinnowIndex(spark, p)
    assert(a <= b)
    assert(Dedup.winnowIndexedMatches(spark, p, someDocs,
      "doc_id", "text", 1).collect().map(_.toSeq).toSet === before)
  }
}
