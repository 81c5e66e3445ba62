package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** The at-rest MinHash-LSH near-dup index lifecycle: build once, append
  * incrementally, probe many — the dedup-side sibling of the IVF/PQ
  * vector-index lifecycle, so the contracts mirror IvfIndex's: parameters
  * live in the index (never re-supplied), appended docs are immediately
  * discoverable, and probing a non-index path is a domain error.
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely different content about spark query engines and shuffle plans"),
    (3L, "another unrelated document mentioning joins aggregates and windows only")
  ).toDF("doc_id", "text")

  test("build + probe finds the planted near-dup with index-stored parameters") {
    val path = tmp("graft_lsh_spec")
    Dedup.buildLshIndex(corpus, "doc_id", "text", 3, path)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (11L, "nothing in common with anything indexed here at all whatsoever")
    ).toDF("doc_id", "text")
    val pairs = Dedup.lshIndexedPairs(spark, path, batch, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((10L, 1L)),
      "only the planted near-dup may pair, batch-id first")
    assert(pairs.head._3 > 0.5)
  }

  test("append makes new corpus docs discoverable without re-signing the old") {
    val path = tmp("graft_lsh_spec_app")
    Dedup.buildLshIndex(corpus, "doc_id", "text", 3, path)
    val day2 = Seq(
      (4L, "fresh corpus document with its own words arriving on day two"))
      .toDF("doc_id", "text")
    Dedup.appendToLshIndex(spark, path, day2, "doc_id", "text")
    val batch = Seq(
      (20L, "fresh corpus document with its own words arriving on day three"))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshIndexedPairs(spark, path, batch, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((20L, 4L)),
      "the appended doc must be probe-visible; the original corpus stays")
  }

  test("indexed probe equals in-memory LSH restricted to cross pairs (real corpus)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val path = tmp("graft_lsh_spec_real")
    Dedup.buildLshIndex(hist, "doc_id", "text", 3, path)
    val indexed = Dedup.lshIndexedPairs(spark, path, batch, "doc_id", "text", 0.6)
      .select("id_a", "id_b", "jaccard").collect().map(_.toSeq).toSet
    // reference: one-shot LSH over the union, keeping only (batch, corpus)
    // pairs, normalized to batch-id-first
    val all = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.6)
      .as[(Long, Long, Double)].collect()
    val expected = all.flatMap { case (a, b, j) =>
      (a % 5 == 0, b % 5 == 0) match {
        case (true, false) => Some(Seq(a, b, j))
        case (false, true) => Some(Seq(b, a, j))
        case _ => None
      }
    }.toSet
    assert(indexed === expected)
  }

  test("mutable-source contract: a cut probe snapshot is append-immune") {
    // the q228 composition bug class: lshIndexedPairs reads the bucket
    // postings lazily, so a probe frame held across a later append MAY
    // see the grown index when finally evaluated (whether it does hinges
    // on Spark's file-listing cache, i.e. not a contract either way).
    // The documented contract is to Checkpoints.cut the frame before
    // mutating — the snapshot must be bit-stable across appends.
    val path = tmp("graft_lsh_spec_mut")
    Dedup.buildLshIndex(corpus, "doc_id", "text", 3, path)
    val batch = Seq(
      (30L, "a very specific sentence that will also arrive in the appended day"))
      .toDF("doc_id", "text")
    val cutPairs = graft.operators.Checkpoints.cut(
      Dedup.lshIndexedPairs(spark, path, batch, "doc_id", "text", 0.5))
    assert(cutPairs.count() === 0, "nothing indexed matches the batch yet")
    // append a near-dup of the batch doc INTO the index
    Dedup.appendToLshIndex(spark, path,
      Seq((31L, "a very specific sentence that will also arrive in the appended days"))
        .toDF("doc_id", "text"), "doc_id", "text")
    // ground truth that the index really grew: a FRESH probe finds it
    assert(Dedup.lshIndexedPairs(spark, path, batch, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .toSet === Set((30L, 31L)))
    assert(cutPairs.count() === 0,
      "the cut snapshot must not see postings appended after it")
  }

  test("N appends + compact ≡ one-shot build: files collapse, probes bit-identical") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    // three "daily" ingest slices of the standing corpus
    val slices = (1 to 4).map(r => hist.filter(col("doc_id") % 5 === r))
    val path = tmp("graft_lsh_spec_compact")
    Dedup.buildLshIndex(slices.head, "doc_id", "text", 3, path)
    slices.tail.foreach(s =>
      Dedup.appendToLshIndex(spark, path, s, "doc_id", "text"))
    val beforeProbe = Dedup.lshIndexedPairs(spark, path, batch,
      "doc_id", "text", 0.6).collect().map(_.toSeq).toSet
    val (nBefore, nAfter) = Dedup.compactLshIndex(spark, path)
    assert(nAfter < nBefore,
      s"compaction must collapse the per-append files ($nBefore -> $nAfter)")
    val afterProbe = Dedup.lshIndexedPairs(spark, path, batch,
      "doc_id", "text", 0.6).collect().map(_.toSeq).toSet
    assert(afterProbe === beforeProbe, "probe must be identical across compact")
    // and ≡ a one-shot build over the union
    val oneShot = tmp("graft_lsh_spec_oneshot")
    Dedup.buildLshIndex(hist, "doc_id", "text", 3, oneShot)
    val oneShotProbe = Dedup.lshIndexedPairs(spark, oneShot, batch,
      "doc_id", "text", 0.6).collect().map(_.toSeq).toSet
    assert(afterProbe === oneShotProbe)
    // wrong-kind guard: the compactor refuses a winnow index
    val wn = tmp("graft_lsh_spec_compact_wrong")
    Dedup.buildWinnowIndex(corpus, "doc_id", "text", 3, 4, wn)
    assert(intercept[IllegalArgumentException] {
      Dedup.compactLshIndex(spark, wn)
    }.getMessage.contains("kind"))
  }

  test("probing a non-index or wrong-kind path is a domain error") {
    val none = intercept[IllegalArgumentException] {
      Dedup.lshIndexedPairs(spark, tmp("graft_lsh_none"), corpus,
        "doc_id", "text", 0.5)
    }
    assert(none.getMessage.contains("no graft index"))
    // an IVF index is not an LSH index
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivfPath = tmp("graft_lsh_wrongkind")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4, 1), ivfPath)
    val wrong = intercept[IllegalArgumentException] {
      Dedup.lshIndexedPairs(spark, ivfPath, corpus, "doc_id", "text", 0.5)
    }
    assert(wrong.getMessage.contains("kind"))
  }
}
