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
}
