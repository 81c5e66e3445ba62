package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE vocabulary training, checked against an in-JVM reference
  * implementation of the textbook algorithm (Sennrich ACL'16: weighted
  * adjacent-pair counts with overlaps, greedy leftmost-nonoverlapping
  * merge), plus the model invariants that must hold at any scale.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (driver-side, test-only) ----------------

  private def refPairCounts(words: Map[Vector[String], Long])
      : Map[(String, String), Long] =
    words.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.drop(1)).map(p => p -> f)
    }.groupBy(_._1).map { case (p, fs) => p -> fs.map(_._2).sum }

  private def refMergeWord(syms: Vector[String], l: String, r: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** (merge list, final segmentations) per the reference algorithm. */
  private def refBpe(corpus: Seq[String], numMerges: Int, minCount: Long)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var words = corpus.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.split("").filter(_.nonEmpty).toVector -> ws.size.toLong
      }
    val merges = Seq.newBuilder[(String, String, Long)]
    var rank = 0
    var stop = false
    while (rank < numMerges && !stop) {
      val counts = refPairCounts(words)
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < minCount) stop = true
        else {
          merges += ((l, r, c))
          words = words.toSeq.map { case (syms, f) =>
            refMergeWord(syms, l, r) -> f
          }.groupBy(_._1).map { case (s, fs) => s -> fs.map(_._2).sum }
          rank += 1
        }
      }
    }
    (merges.result(), words.map { case (syms, _) => syms.mkString -> syms })
  }

  // ---- specs -------------------------------------------------------------

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the quick brown fox the lazy dog the end")

  test("learned merges match the reference algorithm exactly") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 12, minCount = 2)
    val (refMerges, refSegs) = refBpe(corpus, 12, 2)

    assert(model.merges.map(m => (m.left, m.right, m.count)) === refMerges)
    assert(model.merges.map(_.rank) === (1 to model.merges.size))

    val segs = model.segments.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(segs.view.mapValues(_.toVector).toMap === refSegs)
  }

  test("batched rounds stay exactly sequential: tie traps, symbol collisions, random corpus") {
    // each corpus is an adversarial case for merge BATCHING (r7: top-slice
    // prefix batching + incremental pair counts) — all must still equal the
    // one-at-a-time reference exactly, ties and all
    val corpora: Seq[Seq[String]] = Seq(
      // tie trap (hand-built): (a,z)=100 ties (b,b)=100; merging (a,z)
      // destroys (z,y) but creates (az,y)=100, which STILL ties (b,b) and
      // wins the tiebreak ("az" < "b") — a naive disjoint batch
      // [(a,z),(b,b)] would misorder; the strict barrier must cut after
      // the head
      Seq.fill(100)("azy") ++ Seq.fill(100)("bb"),
      // everything tied at the same count across a dense 2-letter
      // alphabet: maximal tie + symbol-sharing pressure on the prefix rule
      Seq.fill(30)("abab") ++ Seq.fill(30)("baba") ++
        Seq.fill(30)("aabb") ++ Seq.fill(30)("bbaa"),
      // random 3-letter words: merged symbols recombine organically —
      // collisions, overlapping counts, reappearing adjacency
      { val rnd = new scala.util.Random(11)
        (0 until 1500).map { _ =>
          val n = 2 + rnd.nextInt(7)
          (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString } },
      // wider alphabet, longer words: many disjoint pairs per round (the
      // regime batching exists for)
      { val rnd = new scala.util.Random(42)
        (0 until 1000).map { _ =>
          val n = 3 + rnd.nextInt(9)
          (0 until n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString } },
      // SELF-pair trap (r7 review): merging (a,a) on a long run creates
      // (aa,aa)=4 > (x,y)=3, but (x,y) is symbol-disjoint from (a,a) and
      // no slice pair SHARES a symbol with it, so a barrier that only
      // measures sharing pairs would wrongly batch [(a,a),(x,y)] — the
      // true second merge is (aa,aa)
      Seq("aaaaaaaaaa") ++ Seq.fill(3)("xy"),
      // same trap one level deeper: self-pair of a merged symbol
      Seq.fill(2)("cccccccc") ++ Seq.fill(5)("pq")
    )
    for ((wordSeq, ci) <- corpora.zipWithIndex; numMerges <- Seq(5, 40)) {
      val corpus = wordSeq.grouped(10).map(_.mkString(" ")).toSeq
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val model = Bpe.learn(docs, "text", numMerges, minCount = 2)
      val (refMerges, refSegs) = refBpe(corpus, numMerges, 2)
      assert(model.merges.map(m => (m.left, m.right, m.count)) === refMerges,
        s"corpus $ci, numMerges $numMerges: merge list diverged from sequential reference")
      val segs = model.segments.select("word", "syms")
        .as[(String, Seq[String])].collect().toMap
      assert(segs.view.mapValues(_.toVector).toMap === refSegs,
        s"corpus $ci, numMerges $numMerges: segmentation diverged")
    }
  }

  test("model invariants: symbol concatenation, monotone counts, freq conservation") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 8, minCount = 2)

    // merging never loses characters: concat(syms) == word, every word
    val broken = model.segments
      .filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(broken === 0L)

    // the best-pair count is non-increasing in rank: a merge only creates
    // pairs at most as frequent as itself and only removes count elsewhere
    val counts = model.merges.map(_.count)
    assert(counts.zip(counts.drop(1)).forall { case (a, b) => a >= b })

    // every recorded count respects minCount
    assert(counts.forall(_ >= 2L))

    // word frequencies are untouched by training
    val total = model.segments.agg(sum("freq")).head().getLong(0)
    val expected = corpus.flatMap(_.split("\\s+")).count(_.nonEmpty).toLong
    assert(total === expected)
  }

  test("greedy leftmost-nonoverlapping merge: 'aaa' under (a,a) becomes [aa, a]") {
    val docs = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 1, minCount = 1)
    assert(model.merges.map(m => (m.left, m.right)) === Seq(("a", "a")))
    // count is with overlaps: "aaa" has 2, "aaaa" has 3
    assert(model.merges.head.count === 5L)
    val segs = model.segments.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(segs("aaa") === Seq("aa", "a"))
    assert(segs("aaaa") === Seq("aa", "aa"))
  }

  test("regex metacharacters in symbols are treated literally") {
    val docs = Seq((1L, "a+b a+b a+b (c) (c)")).toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 6, minCount = 2)
    val segs = model.segments.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(segs("a+b") === Seq("a+b"), "merges through + must be literal")
    assert(segs("(c)") === Seq("(c)"), "merges through parens must be literal")
  }

  test("early stop on minCount and empty input") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 10, minCount = 2)
    assert(model.merges.isEmpty, "all pairs are singletons under minCount 2")

    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m2 = Bpe.learn(empty, "text", numMerges = 5)
    assert(m2.merges.isEmpty && m2.segments.count() === 0L)
  }

  test("encode reproduces the training segmentation on the training corpus") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 12, minCount = 2)
    val encoded = Bpe.encode(docs, "doc_id", "text", model.merges)
    // total token count identity: Σ n_tokens == Σ freq · |syms|
    val total = encoded.agg(sum("n_tokens")).head().getLong(0)
    val expected = model.segments
      .agg(sum(col("freq") * size(col("syms")))).head().getLong(0)
    assert(total === expected)
    // word-level identity: every encoded word matches its training syms
    val perWord = encoded.select(explode(col("toks")).as("sym")).groupBy("sym")
      .count().as[(String, Long)].collect().toMap
    val fromSegs = Bpe.vocabStats(model)
      .select("sym", "occurrences").as[(String, Long)].collect().toMap
    assert(perWord === fromSegs)
  }

  test("at-rest artifact: writeModel/readMerges round-trips exactly; wrong-kind fails fast") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 12, minCount = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_spec").toString
    Bpe.writeModel(spark, model.merges, path)
    val back = Bpe.readMerges(spark, path)
    assert(back === model.merges,
      "the persisted merge list must round-trip in rank order, counts included")
    // encode from the artifact ≡ encode from the in-memory model
    val a = Bpe.encode(docs, "doc_id", "text", back)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Bpe.encode(docs, "doc_id", "text", model.merges)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a === b)
    // a non-tokenizer path is a domain error (the shared kind-tag contract)
    val none = intercept[IllegalArgumentException] {
      Bpe.readMerges(spark,
        java.nio.file.Files.createTempDirectory("graft_bpe_none").toString)
    }
    assert(none.getMessage.contains("no graft index"))
  }

  test("encode handles unseen words: char fallback plus applicable merges") {
    val train = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learn(train, "text", numMerges = 12, minCount = 2)
    val unseen = Seq((100L, "lowly snowy plow zzz"), (101L, "")).toDF("doc_id", "text")
    val got = Bpe.encode(unseen, "doc_id", "text", model.merges)
      .select("id", "toks").as[(Long, Seq[String])].collect().toMap

    // reference: fold the learned merges in rank order over each word
    def ref(w: String): Vector[String] =
      model.merges.sortBy(_.rank).foldLeft(
        w.split("").filter(_.nonEmpty).toVector)((s, m) =>
        refMergeWord(s, m.left, m.right))
    val expect = "lowly snowy plow zzz".split(" ").flatMap(ref).toSeq
    assert(got(100L) === expect)
    assert(got(101L) === Seq.empty, "empty doc encodes to zero tokens")
    // null text behaves like an empty doc, not an executor NPE
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(102L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val nt = Bpe.encode(withNull, "doc_id", "text", model.merges)
      .select("n_tokens").as[Long].head()
    assert(nt === 0L)
    // no characters lost on OOV words
    assert(got(100L).mkString === "lowlysnowyplowzzz")
  }

  test("unicode text: character conservation holds (incl. surrogate pairs)") {
    val docs = Seq((1L, "日本語 データ処理 😀😀 naïve café"),
      (2L, "日本語 naïve 😀😀")).toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 6, minCount = 1)
    val broken = model.segments
      .filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(broken === 0L, "merging must never lose or reorder code units")
    val enc = Bpe.encode(docs, "doc_id", "text", model.merges)
      .select("id", "toks").as[(Long, Seq[String])].collect().toMap
    assert(enc(1L).mkString === "日本語データ処理😀😀naïvecafé")
    assert(enc(2L).mkString === "日本語naïve😀😀")
  }

  test("q299 fertility panel equals the q128 encode aggregated per source; fertility >= 1") {
    val dir = "/root/testdata/sf0.001"
    val panel = SparkEntry.queries("q299_tokenizer_fertility")(spark, dir)
      .select("source", "n_words", "n_tokens", "fertility_micro")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // reference: the plain q128 in-memory encode, aggregated per source
    val docs = Tables.documents(spark, dir)
    val enc = SparkEntry.queries("q128_bpe_encode")(spark, dir)
      .select(col("doc_id"), col("n_tokens").cast("long").as("nt"))
    val ref = docs.select(col("doc_id"), col("source"))
      .join(enc, "doc_id").groupBy("source")
      .agg(sum("nt").as("nt")).as[(String, Long)].collect().toMap
    panel.foreach { case (src, nw, nt, fm) =>
      assert(nt === ref(src),
        s"$src: panel token total must equal the q128 encode's")
      // BPE splits words into >= 1 token each, so fertility >= 1.0
      assert(nt >= nw && fm >= 1000000L, s"$src fertility below 1")
      assert(fm === nt * 1000000L / nw)
    }
    assert(panel.map(_._1).toSeq === ref.keys.toSeq.sorted)
  }

  test("vocabStats aggregates the trained segmentation") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.learn(docs, "text", numMerges = 12, minCount = 2)
    val stats = Bpe.vocabStats(model)
      .select("sym", "occurrences", "n_words", "sym_len")
      .as[(String, Long, Long, Int)].collect()

    // total symbol occurrences == sum over words of freq * |syms|
    val expected = model.segments
      .agg(sum(col("freq") * size(col("syms")))).head().getLong(0)
    assert(stats.map(_._2).sum === expected)
    // "newest" dominates the corpus; its full merge should be a symbol
    assert(stats.exists(s => s._1.length > 1 && s._4 === s._1.length))
    // n_words counts distinct words, not occurrences
    assert(stats.forall(_._3 >= 1L))
  }
}
