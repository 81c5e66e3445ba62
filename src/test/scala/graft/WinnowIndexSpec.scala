package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The at-rest winnowing fingerprint index lifecycle (q298): build once,
  * append incrementally, probe many — MOSS's fingerprint store restated
  * with the house index contracts (parameters live in `_graft_index`,
  * appended docs are immediately probe-visible, indexed ≡ inline).
  */
class WinnowIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely different content about spark query engines and shuffle plans"),
    (3L, "another unrelated document mentioning joins aggregates and windows only")
  ).toDF("doc_id", "text")

  test("build + probe finds the shared passage with index-stored parameters") {
    val path = tmp("graft_winnow_spec")
    Dedup.buildWinnowIndex(corpus, "doc_id", "text", 3, 4, path)
    val batch = Seq(
      // shares a long passage with doc 1 (≥ w+k−1 = 6 tokens ⇒ winnowing
      // guarantees a common selected fingerprint)
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (11L, "nothing in common with anything indexed here at all whatsoever")
    ).toDF("doc_id", "text")
    val m = Dedup.winnowIndexedMatches(spark, path, batch, "doc_id", "text", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(m.map(p => (p._1, p._2)) === Set((10L, 1L)),
      "only the overlapping pair may match, batch-id first")
    assert(m.head._3 >= 2L)
  }

  test("append makes new corpus docs discoverable without re-fingerprinting the old") {
    val path = tmp("graft_winnow_spec_app")
    Dedup.buildWinnowIndex(corpus, "doc_id", "text", 3, 4, path)
    val day2 = Seq(
      (4L, "fresh corpus document with its very own words arriving on day two"))
      .toDF("doc_id", "text")
    Dedup.appendToWinnowIndex(spark, path, day2, "doc_id", "text")
    val batch = Seq(
      (20L, "fresh corpus document with its very own words arriving on day three"))
      .toDF("doc_id", "text")
    val m = Dedup.winnowIndexedMatches(spark, path, batch, "doc_id", "text", 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(m === Set((20L, 4L)),
      "the appended doc must be probe-visible; the original corpus stays")
  }

  test("indexed probe equals the inline winnow join (real corpus)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val path = tmp("graft_winnow_spec_real")
    Dedup.buildWinnowIndex(hist, "doc_id", "text", 3, 4, path)
    val indexed = Dedup
      .winnowIndexedMatches(spark, path, batch, "doc_id", "text", 2)
      .as[(Long, Long, Long)].collect().toSet
    // inline reference: winnow both slices in memory and join on fp
    val bf = Dedup.winnow(batch, "doc_id", "text", 3, 4)
      .select("id", "fp").distinct()
    val cf = Dedup.winnow(hist, "doc_id", "text", 3, 4)
      .select("id", "fp").distinct()
    val inline = bf.as("b").join(cf.as("c"), col("b.fp") === col("c.fp"))
      .groupBy(col("b.id").as("id_a"), col("c.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(indexed === inline)
  }

  test("N appends + compact ≡ one-shot build: files collapse, probes bit-identical") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val slices = (1 to 4).map(r => hist.filter(col("doc_id") % 5 === r))
    val path = tmp("graft_winnow_spec_compact")
    Dedup.buildWinnowIndex(slices.head, "doc_id", "text", 4, 4, path)
    slices.tail.foreach(s =>
      Dedup.appendToWinnowIndex(spark, path, s, "doc_id", "text"))
    val beforeProbe = Dedup.winnowIndexedMatches(spark, path, batch,
      "doc_id", "text", 2).collect().map(_.toSeq).toSet
    val (nBefore, nAfter) = Dedup.compactWinnowIndex(spark, path)
    assert(nAfter < nBefore,
      s"compaction must collapse the per-append files ($nBefore -> $nAfter)")
    val afterProbe = Dedup.winnowIndexedMatches(spark, path, batch,
      "doc_id", "text", 2).collect().map(_.toSeq).toSet
    assert(afterProbe === beforeProbe, "probe must be identical across compact")
    val oneShot = tmp("graft_winnow_spec_oneshot")
    Dedup.buildWinnowIndex(hist, "doc_id", "text", 4, 4, oneShot)
    val oneShotProbe = Dedup.winnowIndexedMatches(spark, oneShot, batch,
      "doc_id", "text", 2).collect().map(_.toSeq).toSet
    assert(afterProbe === oneShotProbe)
    // wrong-kind guard: the compactor refuses an LSH index
    val lsh = tmp("graft_winnow_spec_compact_wrong")
    Dedup.buildLshIndex(corpus, "doc_id", "text", 3, lsh)
    assert(intercept[IllegalArgumentException] {
      Dedup.compactWinnowIndex(spark, lsh)
    }.getMessage.contains("kind"))
  }

  test("probing a wrong-kind path is a domain error") {
    val path = tmp("graft_winnow_spec_kind")
    Dedup.buildLshIndex(corpus, "doc_id", "text", 3, path)
    val batch = Seq((30L, "whatever words")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.winnowIndexedMatches(spark, path, batch, "doc_id", "text", 2)
        .collect()
    }
    assert(e.getMessage.contains("winnow") || e.getMessage.contains("lsh"))
  }
}
