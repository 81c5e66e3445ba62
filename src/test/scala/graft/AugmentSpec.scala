package graft

import org.apache.spark.sql.functions._

import graft.operators.Augment

/** The deterministic-augmentation contract: the mask is a pure function
  * of (salt, id, position, token) — replayable by any engine (q202's
  * oracle proves DuckDB), by a resumed job, and HERE by a plain-JVM md5
  * reference; rate 0 is the identity, rate 1 empties, and the salt
  * yields independent masks.
  */
class AugmentSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"), // identical text, different id
    (3L, "solo"),
    (4L, "")).toDF("doc_id", "text")

  private def kept(salt: String, num: Long, den: Long): Map[Long, Seq[String]] =
    Augment.tokenDropout(docs, "doc_id", "text", num, den, salt)
      .select(col("doc_id"), col("aug_tokens"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  private def jvmHash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("the mask equals the plain-JVM md5 reference, token by token") {
    val got = kept("e7", 3, 10)
    for ((id, text) <- Seq(1L -> "the cat sat on the mat",
        2L -> "the cat sat on the mat", 3L -> "solo", 4L -> "")) {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val expect = toks.zipWithIndex.collect {
        case (tok, i) if jvmHash32(s"e7:$id:${i + 1}:$tok") % 10 >= 3 => tok
      }.toSeq
      assert(got(id) === expect, s"doc $id")
    }
  }

  test("identical texts under different ids get different masks") {
    // a shared-text mask would correlate augmentation across duplicates
    val got = kept("e9", 5, 10)
    assert(got(1L) !== got(2L),
      "doc_id must be part of the hash key (statistically certain at rate 1/2 over 6 tokens for this fixed salt)")
  }

  test("rate 0 is the identity; rate 1 empties; salts are independent") {
    assert(kept("x", 0, 10)(1L) === Seq("the", "cat", "sat", "on", "the", "mat"))
    assert(kept("x", 10, 10).values.forall(_.isEmpty))
    assert(kept("epoch1", 5, 10)(1L) !== kept("epoch2", 5, 10)(1L),
      "different salts give different masks (fixed salts chosen to differ)")
  }

  test("invalid rates are rejected") {
    intercept[IllegalArgumentException] {
      Augment.tokenDropout(docs, "doc_id", "text", 2, 1)
    }
    intercept[IllegalArgumentException] {
      Augment.tokenDropout(docs, "doc_id", "text", 1, 0)
    }
  }

  test("null text reads as the empty document in both ops") {
    val withNull = Seq((1L, "alpha beta"), (2L, null))
      .toDF("doc_id", "text")
    val drop = Augment.tokenDropout(withNull, "doc_id", "text", 0, 10)
      .select(col("doc_id"), col("aug_tokens")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(drop(1L) === Seq("alpha", "beta") && drop(2L) === Seq.empty)
    val span = Augment.spanCorruption(withNull, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[String](4))).toMap
    assert(span(2L)._1 === 0L && span(2L)._2 === Seq.empty)
  }

  test("span corruption round-trips: splicing targets into inputs reconstructs the corpus") {
    val Sent = "<extra_id_(\\d+)>".r
    val rows = Augment.spanCorruption(
        Tables.documents(spark, "/root/testdata/sf0.001"),
        "doc_id", "text", salt = "rt")
      .collect()
    assert(rows.length > 0)
    assert(rows.exists(_.getLong(2) > 0), "some doc must have spans")
    val orig = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    for (r <- rows) {
      val (id, nTok, nSpans, nMasked) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val input = r.getSeq[String](4)
      val target = r.getSeq[String](5)
      // parse the target into spans keyed by sentinel ordinal
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      target.foreach {
        case Sent(k) => cur = k.toInt; spans(cur) = Vector.empty
        case tok => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.keySet === (0 until nSpans.toInt).toSet,
        s"doc $id: sentinel ordinals must be 0..n_spans-1")
      assert(spans.values.map(_.size.toLong).sum === nMasked, s"doc $id")
      assert(spans.values.forall(sp => sp.size >= 1 && sp.size <= 3),
        s"doc $id: span lengths are 1..3")
      // splice: replace each input sentinel with its hidden span
      val rebuilt = input.flatMap {
        case Sent(k) => spans(k.toInt)
        case tok => Seq(tok)
      }
      assert(rebuilt === orig(id), s"doc $id must round-trip")
      assert(nTok === orig(id).size.toLong)
      // sentinels appear in document order in the input too
      val seen = input.collect { case Sent(k) => k.toInt }
      assert(seen === seen.sorted, s"doc $id: input sentinel order")
    }
  }
}
