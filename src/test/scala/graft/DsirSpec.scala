package graft

/** q132 DSIR-shaped importance weighting: exact equality with an
  * independent sequential reference (own md5, own counting, own
  * smoothing arithmetic — nothing shared with the engine path), plus the
  * qualitative contract that target-language docs score target-like.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("q132: weights equal the sequential reference; en docs are target-like") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    val rows = Seq(
      (1L, "the cat sat", "en"), (2L, "the cat", "en"),
      (3L, "el gato", "es"), (4L, "le chat noir", "fr"),
      (5L, "the the the", "en"), (6L, "gato gato", "es"))
    rows.map { case (id, txt, lg) => (id, txt, lg, "s", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    def feats(txt: String): Seq[String] = {
      val t = txt.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val inst = rows.flatMap { case (id, txt, lg) =>
      feats(txt).map(f => (id, lg, hash32(f) % 4096))
    }
    val cs = inst.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = inst.filter(_._2 == "en").groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap
    val ns = inst.size.toLong
    val nt = inst.count(_._2 == "en").toLong
    def part(b: Long): Long =
      math.floor(1e6 * (((ct.getOrElse(b, 0L) + 1).toDouble / (nt + 4096)) /
        ((cs(b) + 1).toDouble / (ns + 4096)))).toLong
    val expected = rows.map { case (id, txt, lg) =>
      val bs = feats(txt).map(f => hash32(f) % 4096)
      val ws = bs.map(part).sum
      val wm = math.floor(ws.toDouble / bs.size).toLong
      (id, lg, bs.size, ws, wm, wm >= 1000000L)
    }

    val got = SparkEntry.queries("q132_dsir_weights")(spark, dir)
      .as[(Long, String, Int, Long, Long, Boolean)].collect().toSeq
    assert(got === expected)
    // the qualitative DSIR contract on this corpus: every en doc weighs in
    // target-like, every non-en doc does not
    got.foreach { case (_, lg, _, _, _, tl) => assert(tl === (lg == "en")) }
  }
}
