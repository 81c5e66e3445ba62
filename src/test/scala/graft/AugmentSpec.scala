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
}
