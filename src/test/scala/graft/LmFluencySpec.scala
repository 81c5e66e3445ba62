package graft

/** q131 bigram-LM fluency: the hand-computed contract on a corpus small
  * enough to verify every conditional count by eye, plus degenerate docs
  * (single-token, null text) that must score zero rather than vanish —
  * the oracle's LEFT JOIN and the Spark side's coalesce must agree.
  */
class LmFluencySpec extends SparkSpec {
  import spark.implicits._

  test("q131: hand-computed bigram conditional scores; degenerate docs score 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fluency").toString
    Seq(
      (1L, Some("a b x"), "en", "s", 5L),
      (2L, Some("a b"), "en", "s", 3L),
      (3L, Some("a c"), "en", "s", 3L),
      (4L, Some("z"), "en", "s", 1L),
      (5L, None, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q131_lm_fluency")(spark, dir)
      .select("doc_id", "n_bigrams", "score_sum", "fluency_micro")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // uni: a=3 b=2 x=1 c=1 z=1; bi: (a,b)=2 (b,x)=1 (a,c)=1
    // parts: (a,b)=floor(1e6·2/3)=666666, (b,x)=floor(1e6·1/2)=500000,
    //        (a,c)=floor(1e6·1/3)=333333
    assert(out === Seq(
      (1L, 2, 666666L + 500000L, (666666L + 500000L) / 2),
      (2L, 1, 666666L, 666666L),
      (3L, 1, 333333L, 333333L),
      (4L, 0, 0L, 0L),
      (5L, 0, 0L, 0L)))
  }

  test("q224: stupid backoff falls through tri → bi → uni → OOV as hand-computed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_backoff").toString
    // 6 docs → train ("then") = doc_id 0..2, score ("now") = 3..5.
    // Train counts: N=11; cu a=3 b=3 c=4 d=1;
    //   cb (a,b)=3 (b,c)=2 (c,a)=1 (b,d)=1 (c,c)=1;
    //   ct (a,b,c)=2 (b,c,a)=1 (c,a,b)=1 (a,b,d)=1
    Seq(
      (0L, Some("a b c a b c"), "en", "s", 11L),
      (1L, Some("a b d"), "en", "s", 5L),
      (2L, Some("c c"), "en", "s", 3L),
      (3L, Some("a b c d z"), "en", "s", 9L),
      (4L, Some("d b c"), "en", "s", 5L),
      (5L, Some("z"), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q224_lm_backoff")(spark, dir)
      .select("doc_id", "n_pos", "n_tri", "n_bi", "n_uni", "n_oov",
        "score_sum", "fluency_micro")
      .as[(Long, Int, Int, Int, Int, Int, Long, Long)].collect().toSeq
    // doc 3 "a b c d z":
    //   (a,b,c) trigram hit: floor(1e6·2/3)            = 666666 (depth 3)
    //   (b,c,d) tri+bi miss, uni d: floor(16e4·1/11)   = 14545  (depth 1)
    //   (c,d,z) all-orders OOV                         = 0      (depth 0)
    // doc 4 "d b c":
    //   (d,b,c) tri miss, bi (b,c): floor(4e5·2/3)     = 266666 (depth 2)
    // doc 5 "z": no trigram positions → all-zero row via the left join
    assert(out === Seq(
      (3L, 3, 1, 0, 1, 1, 666666L + 14545L, (666666L + 14545L) / 3),
      (4L, 1, 0, 1, 0, 0, 266666L, 266666L),
      (5L, 0, 0, 0, 0, 0, 0L, 0L)))
  }
}
