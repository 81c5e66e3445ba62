package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product-quantization contracts: codebook shape, code-range and
  * reconstruction invariants, run-to-run determinism, and — the reason the
  * driver check is rows-only — recall of the compressed ranking against
  * the exact brute-force top-k on the real embeddings.
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)

  test("pqTrain/pqEncode: codebook shape, dense code range, reconstruction arity") {
    val m = 8; val kCodes = 16
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m, kCodes)
    val perSub = cb.groupBy("sub").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSub.keySet === (0 until m).toSet, "one codebook per subspace")
    assert(perSub.values.forall(c => c > 0 && c <= kCodes),
      "each subspace trains at most kCodes codewords")
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", cb)
    val n = emb.count()
    assert(enc.count() === n, "every vector encodes")
    val bad = enc.filter(size(col("codes")) =!= m ||
      exists(col("codes"), c => c < 0 || c >= kCodes) ||
      size(col("decoded")) =!= 64).count()
    assert(bad === 0, "codes are m dense indices in [0, kCodes); decoded is d-dim")
  }

  test("ivfPqTopK: both compression levers stack and still recall the exact top-k") {
    val isQ = col("vec_id") < 20
    val k = 10
    val got = Similarity.ivfPqTopK(emb, "vec_id", "embedding", isQ, k,
      nCentroids = 16, nProbe = 4, m = 8, kCodes = 256, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val again = Similarity.ivfPqTopK(emb, "vec_id", "embedding", isQ, k,
      nCentroids = 16, nProbe = 4, m = 8, kCodes = 256, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === again, "IVF-PQ ranking must be re-run stable")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQ, k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = got.count(exact.contains).toDouble / exact.size
    // the nProbe=4/16 candidate restriction stacks ON TOP of the lossy
    // code, so the floor sits below the pure-PQ one; it still catches a
    // broken bucket routing or codebook outright
    assert(recall >= 0.35, f"IVF-PQ recall@10 $recall%.2f below floor")
  }

  test("materialized IVF-PQ index: build once, probe == inline, no training on probe") {
    val coarse = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", 8, 64, 2)
    val path = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    Similarity.buildPqIndex(emb, "vec_id", "embedding", coarse, cb, path)
    // codes at rest: the bucket table holds (id, codes, bucket) — no floats
    val stored = spark.read.parquet(s"$path/buckets")
    assert(stored.columns.toSet === Set("id", "codes", "bucket"),
      s"index rows must store codes, not vectors: ${stored.columns.toSeq}")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    // two query batches against the SAME saved index — training and the
    // corpus encode are never re-run (identity vs the training-free inline
    // core over the same centroids/codebook pins exactness of the decode)
    for ((lo, hi) <- Seq((0L, 10L), (10L, 20L))) {
      val inline = Similarity.ivfPqTopKWith(emb, "vec_id", "embedding",
        col("vec_id") >= lo && col("vec_id") < hi, 10, 4, coarse, cb)
      val batch = emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
      val indexed = Similarity.ivfPqTopKIndexed(spark, path, batch,
        "vec_id", "embedding", 10, 4)
      assert(rows(indexed) === rows(inline),
        s"saved-index IVF-PQ probe must reproduce the inline path for [$lo,$hi)")
      // the probe plan must not contain the corpus assignment pass
      val finalPlan = indexed.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(!finalPlan.contains("csim"),
        s"probe must not re-assign the corpus to centroids:\n$finalPlan")
      assert(finalPlan.contains("dynamicpruning"),
        s"probed buckets must prune the index scan:\n$finalPlan")
    }
  }

  test("pqTopK with a trainMod the id space misses falls back to full training") {
    import spark.implicits._
    // all-odd ids: pmod(id, 2) === 0 matches nothing — the fallback must
    // still produce a ranking over the non-empty corpus
    val vecs = Seq(1L, 3L, 5L, 7L, 9L)
      .map(i => (i, Array.tabulate(4)(j => (i + j).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs, "vec_id", "embedding",
      col("vec_id") === 1L, 3, m = 2, kCodes = 4, iters = 1, trainMod = 2)
    assert(out.count() === 3, "non-empty corpus must never yield an empty ranking")
  }

  test("pqTopK is deterministic and recalls the exact top-k") {
    val isQ = col("vec_id") < 20
    val k = 10
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", isQ, k,
      m = 8, kCodes = 256, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val pq2 = Similarity.pqTopK(emb, "vec_id", "embedding", isQ, k,
      m = 8, kCodes = 256, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(pq === pq2, "PQ ranking must be re-run stable")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQ, k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = pq.map { case (q, _, nb) => (q, nb) }
    val recall = approx.count(exact.contains).toDouble / exact.size
    // PQ8 (8 subquantizers x 8-bit codebooks = 8 bytes/vector, 32x
    // compression) is still lossy; the floor catches a broken
    // codebook/assignment, not codec noise
    assert(recall >= 0.5, f"PQ recall@10 $recall%.2f below floor")
  }

  test("refine >= corpus makes pqTopK identical to the exact brute force") {
    // with every corpus vector in the candidate set, the exact re-rank IS
    // bruteForceTopK — same cosine, same rounding, same tiebreak — so the
    // refine stage's scoring can never drift from the exact baseline
    val isQ = col("vec_id") < 10
    val refined = Similarity.pqTopK(emb, "vec_id", "embedding", isQ, 10,
      m = 8, kCodes = 16, iters = 1, refine = 1000000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQ, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(refined === exact,
      "full-corpus refine must reproduce bruteForceTopK exactly, ranks and scores included")
  }

  test("refine lifts weak-codebook recall; refined ranking stays deterministic") {
    val isQ = col("vec_id") < 20
    val k = 10
    def recallOf(refine: Int) = {
      val got = Similarity.pqTopK(emb, "vec_id", "embedding", isQ, k,
        m = 8, kCodes = 64, iters = 2, trainMod = 8, refine = refine)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQ, k)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      got.count(exact.contains).toDouble / exact.size
    }
    val adcOnly = recallOf(0)
    val refined = recallOf(5 * k)
    assert(refined >= adcOnly,
      f"refine must not lose recall: $refined%.2f < $adcOnly%.2f")
    assert(refined >= 0.7,
      f"refined recall@10 $refined%.2f below floor (q122's registered config)")
  }

  test("indexed refine == inline refine; missing exactVecs is a domain error") {
    val coarse = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", 8, 64, 2)
    val path = java.nio.file.Files.createTempDirectory("graft_pq_refine").toString
    Similarity.buildPqIndex(emb, "vec_id", "embedding", coarse, cb, path)
    val isQ = col("vec_id") < 10
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val inline = Similarity.ivfPqTopKWith(emb, "vec_id", "embedding",
      isQ, 10, 4, coarse, cb, refine = 30)
    val indexed = Similarity.ivfPqTopKIndexed(spark, path, emb.filter(isQ),
      "vec_id", "embedding", 10, 4, refine = 30, exactVecs = Some(emb))
    assert(rows(indexed) === rows(inline),
      "saved-index refine must reproduce the inline refined path")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexed(spark, path, emb.filter(isQ),
        "vec_id", "embedding", 10, 4, refine = 30)
    }
    assert(e.getMessage.contains("exactVecs"))
  }

  test("appendToPqIndex: append == rebuild under the frozen model; wrong kind is a domain error") {
    val coarse = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", 8, 64, 2)
    val grown = java.nio.file.Files.createTempDirectory("graft_pq_app").toString
    val full = java.nio.file.Files.createTempDirectory("graft_pq_full").toString
    // build on a third of the corpus, append the rest in daily batches
    Similarity.buildPqIndex(emb.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", coarse, cb, grown)
    (1 to 2).foreach { i =>
      Similarity.appendToPqIndex(spark, grown,
        emb.filter(col("vec_id") % 3 === i), "vec_id", "embedding")
    }
    Similarity.buildPqIndex(emb, "vec_id", "embedding", coarse, cb, full)
    def probe(path: String) = Similarity.ivfPqTopKIndexed(spark, path,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", 10, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(probe(grown) === probe(full),
      "build-then-append must probe exactly like a full rebuild with the same model")
    // appending PQ rows into an IVF index (or vice versa) is a kind error
    val ivfPath = java.nio.file.Files.createTempDirectory("graft_pq_kind").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", coarse, ivfPath)
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToPqIndex(spark, ivfPath, emb, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("kind"), e.getMessage)
  }

  test("compactIvfIndex serves the PQ index too: probes identical, one file per bucket") {
    val coarse = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", 8, 64, 2)
    val path = java.nio.file.Files.createTempDirectory("graft_pq_cmp").toString
    Similarity.buildPqIndex(emb, "vec_id", "embedding", coarse, cb, path)
    def probe() = Similarity.ivfPqTopKIndexed(spark, path,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", 10, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val before = probe()
    val (_, nAfter) = Similarity.compactIvfIndex(spark, path)
    val bucketDirs = new java.io.File(s"$path/buckets").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty && bucketDirs.forall(
      d => d.listFiles().count(_.getName.endsWith(".parquet")) === 1),
      "each bucket directory must compact to a single file")
    assert(nAfter === bucketDirs.length)
    assert(probe() === before, "compaction must not change PQ probe results")
  }
}
