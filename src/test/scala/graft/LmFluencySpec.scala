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
}
