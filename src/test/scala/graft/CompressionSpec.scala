package graft

import org.apache.spark.sql.functions._

import graft.functions.{CompressionOps, TextCompression}

/** Semantics of the compression-ratio repetition proxy (q137): repetitive
  * text must deflate far below its raw size, incompressible text must not,
  * and the Expression must agree with the plain library call (interpreted
  * vs codegen parity rides the same assertions — the projection runs under
  * whole-stage codegen here).
  */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  test("deflated length: repetitive text collapses, varied text doesn't") {
    val repetitive = "spam ham " * 500
    // deterministic pseudo-random text (no shared substrings to exploit)
    val rng = new scala.util.Random(7)
    val varied = Seq.fill(1000)(rng.alphanumeric.take(4).mkString).mkString(" ")
    val df = Seq((1L, repetitive), (2L, varied)).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        octet_length(col("text")).as("nb"),
        TextCompression.deflatedLen(spark, col("text")).as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val (rb, rd) = out(1L)
    val (vb, vd) = out(2L)
    assert(rd.toDouble / rb < 0.05, s"repetitive ratio ${rd.toDouble / rb}")
    assert(vd.toDouble / vb > 0.5, s"varied ratio ${vd.toDouble / vb}")
  }

  test("expression equals the library call; null and unicode are safe") {
    val texts = Seq("", "a", "héllo wörld ✓", "abc" * 100)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextCompression.deflatedLen(spark, col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) ===
        CompressionOps.deflatedLength(t.getBytes("UTF-8")))
    }
    val withNull = Seq((1L, null: String)).toDF("id", "text")
    val r = withNull.select(
      TextCompression.deflatedLen(spark, col("text")).as("n")).head()
    assert(r.isNullAt(0), "null text must yield null, not a crash")
  }

  test("q137 semantics: empty text scores NULL, not repetitive") {
    // zero-byte docs are a separate case — deflate's fixed header would
    // otherwise make ratio 0 (or garbage) and flag empties as maximal
    // repetition, which Gopher-style filters never do
    val df = Seq((1L, ""), (2L, "spam ham " * 500)).toDF("doc_id", "text")
    val rows = graft.queries.TextScoreOps.compressionRatio(spark, df)
      .orderBy("doc_id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("ratio_micro")),
      "empty doc: ratio must be NULL")
    assert(rows(0).isNullAt(rows(0).fieldIndex("repetitive")),
      "empty doc: flag must be NULL")
    assert(rows(1).getBoolean(rows(1).fieldIndex("repetitive")),
      "repetitive doc still flags true")
  }

  test("thread-local deflater resets between rows: per-row results independent") {
    // the Deflater is reused per executor thread with reset() between
    // rows — results must equal the fresh-instance computation for every
    // row regardless of what the same thread compressed before
    val texts = (1 to 200).map(i => (i.toLong, ("ab" * i) + s"unique$i"))
    val df = texts.toDF("id", "text")
    val got = df.select(col("id"),
        TextCompression.deflatedLen(spark, col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.foreach { case (i, t) =>
      val fresh = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION)
      fresh.setInput(t.getBytes("UTF-8")); fresh.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!fresh.finished()) total += fresh.deflate(buf)
      fresh.end()
      assert(got(i) === total, s"row $i diverged from fresh-deflater result")
    }
  }

  test("q281 trigram repetition: loops score near 1e6, varied text near 0, short windows NULL") {
    val rng = new scala.util.Random(11)
    val varied = Seq.fill(200)(rng.alphanumeric.take(4).mkString).mkString(" ")
    val df = Seq(
      (1L, "ab" * 400),   // 2-period loop: 2 distinct trigrams in 510
      (2L, varied),       // pseudo-random: mostly distinct trigrams
      (3L, ""), (4L, "ab") // windows under 3 chars
    ).toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_q281").toString
    df.write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q281_trigram_repetition")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(1L) === ((510L, 2L, Some(996078L))),
      "a 2-period loop re-uses its 2 trigrams: mass = 508e6 div 510")
    assert(got(2L)._3.exists(_ < 100000L),
      s"varied text must stay near 0, got ${got(2L)}")
    assert(got(3L) === ((0L, 0L, None)) && got(4L) === ((0L, 0L, None)),
      "sub-trigram windows: n_tri = 0, NULL mass — the q137 empty stance")
  }

  test("q281 co-moves with q137's deflate ratio (negative corr on real docs + both constructed poles)") {
    val dir = "/root/testdata/sf0.001"
    val rep = SparkEntry.queries("q281_trigram_repetition")(spark, dir)
      .select(col("doc_id"), col("rep_micro"))
    val dfl = SparkEntry.queries("q137_compression_ratio")(spark, dir)
      .select(col("doc_id"), col("ratio_micro"))
    val c = rep.join(dfl, "doc_id")
      .agg(corr(col("rep_micro").cast("double"),
        col("ratio_micro").cast("double")))
      .head().getDouble(0)
    // more trigram re-use ⇒ more LZ77 back-references ⇒ LOWER deflate
    // ratio: the portable proxy must track the zlib signal it replaces
    assert(c < -0.5, s"expected strong negative correlation, got $c")
  }
}
