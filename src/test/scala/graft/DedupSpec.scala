package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operator semantics on a controlled corpus: exact survivor choice,
  * LSH finding planted near-dups without false negatives at high
  * similarity, SimHash distance properties.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffle exchange plans"),
    (4L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK TODAY"), // case-dup of 1
    (5L, "another unrelated document mentioning joins aggregates and windows only once")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest-id survivor per normalized fingerprint") {
    val out = Dedup.exact(docs, lower(col("text")), "doc_id")
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 5L), "4 is a case-duplicate of 1 and must drop")
  }

  test("minhash LSH finds the planted near-dup pair and verifies with exact jaccard") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)),
      "case-folded duplicate must collide after lowercase tokenization")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH pairs equal exact inverted-index pairs on this corpus (recall check)") {
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "jaccard").collect().toSet
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "jaccard").collect().toSet
    assert(lsh === exact)
  }

  test("band self-join carries ids only — shingle arrays do not ride the explode") {
    val out = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.5)
    val joins = out.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "band")) => j
    }
    assert(joins.nonEmpty, "expected a band-key equi-self-join in the plan")
    joins.foreach { j =>
      assert(!(j.left.output ++ j.right.output).exists(_.name == "hs"),
        "band-join inputs must not carry the hashed-shingle array — " +
          "that is a bands× shuffle amplification of the widest column")
    }
  }

  test("contamination finds the train docs overlapping the probe set") {
    val out = Dedup.contamination(
        docs.filter(col("doc_id") =!= 1L), // train: 2,3,4,5
        docs.filter(col("doc_id") === 1L), // probe: 1
        "doc_id", "text", 3, 3)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    // 2 and 4 share nearly all 3-grams with 1; 3 and 5 share none
    assert(out === Set((2L, 1L), (4L, 1L)))
  }

  test("identical docs have identical simhash; near-dups are close, unrelated far") {
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(4L), "case-insensitive tokens ⇒ equal sketches")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      "near-dup must be closer than unrelated doc")
  }

  test("simHashPairs banding finds every pair within the hamming budget") {
    val viaBanding = Dedup.simHashPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bruteForce = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3
    } yield (a, b)).toSet
    assert(viaBanding === bruteForce, "pigeonhole banding must have perfect recall")
  }

  test("incrementalNew is exact: equals the plain anti-join, bloom in the plan") {
    // 200 history docs; a 300-doc batch where every third doc repeats a
    // history text (the duplicates the bloom must never miss)
    // through parquet, not toDF: on a LocalRelation the optimizer folds the
    // bloom probe away driver-side (still correct, but the plan assert
    // below would see nothing)
    val tmp = java.nio.file.Files.createTempDirectory("graft_incr").toString
    (0L until 200L).map(i => (i, s"history document number $i"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/history")
    (200L until 500L).map { i =>
      val t = if (i % 3 == 0) s"history document number ${i % 200}"
      else s"fresh document number $i"
      (i, t)
    }.toDF("doc_id", "text").write.parquet(s"$tmp/batch")
    val history = spark.read.parquet(s"$tmp/history")
    val batch = spark.read.parquet(s"$tmp/batch")
    val out = Dedup.incrementalNew(history, batch, lower(col("text")), 10000L)
    val expected = batch.withColumn("fingerprint", md5(lower(col("text"))))
      .join(history.select(md5(lower(col("text"))).as("fingerprint")),
        Seq("fingerprint"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet === expected)
    assert(out.count() === expected.size,
      "no document may be admitted twice (sure-new and verified overlap)")
    // every history-duplicated batch doc is dropped (no false negatives)
    assert(!out.select("doc_id").as[Long].collect().exists(_ % 3 == 0))
    // the fast path is real: the bloom probe appears in the executed plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloommightcontain"),
      s"expected a bloom probe in the plan:\n$plan")
  }

  test("incrementalNew self-protects: oversized filter goes sharded, same result") {
    val history = (0L until 50L).map(i => (i, s"h$i")).toDF("doc_id", "text")
    val batch = (50L until 100L).map(i => (i, if (i % 2 == 0) s"h${i - 50}" else s"b$i"))
      .toDF("doc_id", "text")
    val small = Dedup.incrementalNew(history, batch, col("text"), 50L)
      .select("doc_id").as[Long].collect().toSet
    // a budget one filter cannot fit -> the sharded path, same exact result
    val sharded = Dedup.incrementalNew(history, batch, col("text"),
      expectedItems = 1L << 40, maxBloomBytes = 1024)
    assert(sharded.select("doc_id").as[Long].collect().toSet === small)
    assert(!sharded.queryExecution.executedPlan.toString
      .toLowerCase.contains("bloommightcontain"),
      "the sharded path probes per-shard filters inside cogroup, not the " +
        "single broadcast-expression filter")
  }

  test("sharded bloom prefilter is exact and its sure-new slice skips history") {
    // 1000-key history forced into many shards by a 64-byte budget: the
    // per-shard filters must behave exactly like the single filter —
    // every true duplicate verified out, every fresh key admitted
    val history = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val batch = (1000L until 1600L).map { i =>
      (i, if (i % 3 == 0) s"doc ${i % 1000}" else s"new $i")
    }.toDF("doc_id", "text")
    val hFp = history.select(md5(lower(col("text"))).as("fingerprint"))
    val bFp = batch.withColumn("fingerprint", md5(lower(col("text"))))
    val (sureNew, verified) =
      Dedup.incrementalNewSharded(hFp, bFp, shards = 16,
        expectedItems = 1000L, fpp = 0.01)
    val got = sureNew.unionByName(verified)
      .select("doc_id").as[Long].collect().toSet
    val expected = bFp
      .join(hFp, Seq("fingerprint"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected)
    assert(!got.exists(_ % 3 == 0), "no history duplicate may slip through")
    // the sharded switch is what incrementalNew takes at this budget
    assert(Dedup.incrementalNew(history, batch, lower(col("text")),
      expectedItems = 1000L, maxBloomBytes = 64)
      .select("doc_id").as[Long].collect().toSet === expected)
    // the guaranteed-new slice anti-joins the cogroup's maybe-set, NEVER
    // the history relation: its only LeftAnti join must sit on top of the
    // CoGroup subtree
    val antiJoins = sureNew.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antiJoins.size === 1, "sure-new pays exactly one anti-join")
    val rightHasCoGroup = antiJoins.head.right.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.CoGroup => c
    }.nonEmpty
    assert(rightHasCoGroup,
      "the anti-join's right side must be the per-shard bloom verdicts, " +
        "not a second scan of history")
  }

  test("inverted-index counts join: shuffle strategy equals broadcast strategy") {
    // broadcastDocLimit = 0 forces the un-hinted (shuffle/AQE) set-size
    // joins; the default hints the broadcast — identical pairs either way
    val docsSf = Tables.documents(spark, "/root/testdata/sf0.001")
    val bc = Dedup.ngramJaccard(docsSf, "doc_id", "text", 3, 0.6)
      .collect().map(_.toSeq).toSet
    val sh = Dedup.ngramJaccard(docsSf, "doc_id", "text", 3, 0.6,
      broadcastDocLimit = 0L).collect().map(_.toSeq).toSet
    assert(bc === sh)
    assert(bc.nonEmpty)
    val cbc = Dedup.ngramContainment(docsSf, "doc_id", "text", 3, 0.8)
      .collect().map(_.toSeq).toSet
    val csh = Dedup.ngramContainment(docsSf, "doc_id", "text", 3, 0.8,
      broadcastDocLimit = 0L).collect().map(_.toSeq).toSet
    assert(cbc === csh)
  }

  test("incrementalNew with empty history admits the whole batch") {
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = (0L until 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    assert(Dedup.incrementalNew(history, batch, col("text"), 100L)
      .count() === 10L)
  }

  // --- spanScrub: cross-document duplicated-span removal ---

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("spanScrub drops exactly the cross-doc spans and reassembles in order") {
    val boiler = words("b", 4) // a shared 4-token block = one span at span=4
    val corpus = Seq(
      (1L, s"${words("x", 4)} $boiler ${words("y", 4)}"),
      (2L, s"${words("z", 4)} $boiler ${words("v", 4)}"),
      (3L, words("solo", 8))
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(corpus, "doc_id", "text", 4)
      .select("id", "n_spans", "dropped_spans", "dropped_tokens",
        "kept_tokens", "clean_text")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .sortBy(_._1)
    assert(out(0) === ((1L, 3L, 1L, 4L, 8L, s"${words("x", 4)} ${words("y", 4)}")))
    assert(out(1) === ((2L, 3L, 1L, 4L, 8L, s"${words("z", 4)} ${words("v", 4)}")))
    assert(out(2) === ((3L, 2L, 0L, 0L, 8L, words("solo", 8))))
  }

  test("ngramContainment: quoted-small-in-big detected; Jaccard misses it") {
    // doc 1 = 10 tokens, fully quoted inside doc 2's 100-token page plus
    // 90 tokens of filler -> containment(1 in 2) = 1.0 while Jaccard is
    // tiny; doc 3 is unrelated
    val small = words("q", 10)
    val corpus = Seq(
      (1L, small),
      (2L, s"$small ${words("filler", 90)}"),
      (3L, words("other", 20))).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(corpus, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont.contains((1L, 2L, 1.0)), "quoted doc must be contained")
    assert(!cont.exists(_._1 == 2L), "big page is NOT contained in the quote")
    assert(!cont.exists(t => t._1 == 3L || t._2 == 3L))
    val jac = Dedup.ngramJaccard(corpus, "doc_id", "text", 3, 0.6)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(p => Set(p._1, p._2) == Set(1L, 2L)),
      "symmetric Jaccard at 0.6 structurally misses the quotation pair")
  }

  test("ngramContainment: mutual near-dups emit both directions") {
    val a = words("m", 12)
    val corpus = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(corpus, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("snmPairs: adjacent-rank dups found, beyond-window pair missed by design") {
    // 16 docs, ALL the same character length (20 four-char tokens), so the
    // (len, id) rank order is exactly id order: doc 1 and doc 15 are true
    // near-dups 14 rank positions apart (> window 10 -> MISSED, the
    // documented SNM trade), docs 15/16 are identical and adjacent ->
    // found. Fillers are token-disjoint.
    def tok(p: String, i: Int) = f"$p$i%03d"
    def doc(p: String) = (0 until 20).map(tok(p, _)).mkString(" ")
    val base = doc("aa")
    val variant = base.replace(tok("aa", 10), tok("zz", 10)) // same length
    val rows = Seq((1L, base)) ++
      (2L to 14L).map(i => (i, doc("b" + ('a' + i - 2).toChar))) ++ // 2-char prefixes: every doc same length
      Seq((15L, variant), (16L, variant))
    val corpus = rows.toDF("doc_id", "text")
    val snm = Dedup.snmPairs(corpus, "doc_id", "text", 3, 10, 0.6)
      .as[(Long, Long, Double)].collect().toSet
    assert(snm === Set((15L, 16L, 1.0)),
      "only the adjacent pair is inside the window")
    // the exact path sees all three true pairs — what SNM trades away
    val exact = Dedup.ngramJaccard(corpus, "doc_id", "text", 3, 0.6)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(exact === Set((1L, 15L), (1L, 16L), (15L, 16L)))
    // Hernández–Stolfo's fix: a second, independent sort key. Docs 1, 15
    // and 16 share their first 6 characters ("aa000 ") while every filler
    // starts "b…", so the prefix-key pass ranks the three adjacent and the
    // multi-pass union recovers exactly the pairs the length pass missed.
    val multi = Dedup.snmPairsMultiPass(corpus, "doc_id", "text", 3, 10, 0.6)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(multi === exact,
      "the prefix-key pass must close the constructed beyond-window miss")
  }

  test("snmPairsWithDist: the dist <= w slice equals snmPairs(w) for every w") {
    // the identity q289 rides (one wmax pass serves the whole window
    // ladder): for each w <= maxWindow, slicing the dist-tagged pass at
    // dist <= w must reproduce snmPairs(w) exactly — ids AND jaccard
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val tagged = Dedup.snmPairsWithDist(docs, "doc_id", "text", 3, 10, 0.6)
      .as[(Long, Long, Long, Double)].collect()
    assert(tagged.forall(t => t._3 >= 1 && t._3 <= 10),
      "rank distance must lie in [1, maxWindow]")
    for (w <- Seq(2, 5, 10)) {
      val slice = tagged.filter(_._3 <= w)
        .map(t => (t._1, t._2, t._4)).toSet
      val direct = Dedup.snmPairs(docs, "doc_id", "text", 3, w, 0.6)
        .as[(Long, Long, Double)].collect().toSet
      assert(slice === direct, s"dist <= $w slice must equal snmPairs($w)")
    }
  }

  test("snmPairs is sound (subset of exact) with measured recall on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val snm = Dedup.snmPairs(docs, "doc_id", "text", 3, 10, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(snm.subsetOf(exact), "every SNM pair is exactly verified")
    assert(exact.nonEmpty)
    val recall = snm.size.toDouble / exact.size
    info(f"SNM recall vs exact at w=10: $recall%.3f (${snm.size}/${exact.size})")
    assert(recall > 0.5,
      f"length-sorted neighborhood should catch most near-dups, got $recall%.3f")
  }

  test("prefix-filtered Jaccard equals the full inverted-index path") {
    // controlled corpus at a loose threshold AND the real corpus slice at
    // the registered q34/q156 threshold: the prefix lemma promises exact
    // equality, not approximate recall
    val small = Dedup.ngramJaccardPrefix(docs, "doc_id", "text", 3, 0.5)
      .collect().map(_.toSeq).toSet
    val smallRef = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .collect().map(_.toSeq).toSet
    assert(small === smallRef && small.nonEmpty)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val pre = Dedup.ngramJaccardPrefix(real, "doc_id", "text", 3, 0.6)
      .collect().map(_.toSeq).toSet
    val ref = Dedup.ngramJaccard(real, "doc_id", "text", 3, 0.6)
      .collect().map(_.toSeq).toSet
    assert(pre === ref && pre.nonEmpty,
      "prefix filtering is deterministic-lossless: identical pair set")
  }

  test("prefix filter collapses candidate volume on a boilerplate corpus") {
    // 40 documents sharing an identical boilerplate opening (every shingle
    // of it has df=40 — the adversarial Σdf² regime) plus unique tails; no
    // pair is a near-dup, so the full index pays ~40²/2 candidate pairs
    // per boilerplate shingle for nothing while rarest-first prefixes
    // index the unique tails instead
    // tail length chosen so each document's rarest-first prefix (≈0.4·n+1
    // shingles at t=0.6) is filled entirely by its df=1 tail shingles
    val boiler = "terms of service apply to all users of this site please read carefully before proceeding"
    val corpus = (1 to 40).map { i =>
      (i.toLong, boiler + " " +
        (0 until 14).map(j => s"tok${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val (prefixVol, fullVol) =
      Dedup.prefixCandidateVolume(corpus, "doc_id", "text", 3, 0.6)
    info(s"candidate volume: prefix=$prefixVol full=$fullVol " +
      f"(${fullVol.toDouble / math.max(1L, prefixVol)}%.1fx reduction)")
    assert(fullVol >= 20L * prefixVol,
      s"boilerplate shingles must not generate candidates: $prefixVol vs $fullVol")
    // and the (empty) qualifying pair set still matches the exact path
    val pre = Dedup.ngramJaccardPrefix(corpus, "doc_id", "text", 3, 0.6)
    val ref = Dedup.ngramJaccard(corpus, "doc_id", "text", 3, 0.6)
    assert(pre.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
  }

  test("position filter prunes a prefix collision whose bound cannot reach t") {
    // two 3-shingle docs sharing exactly their LAST-ranked shingle
    // (df=2 sorts after the df=1 shingles): the prefix stage emits the
    // pair, but the first-collision bound min(3-3, 3-3)+1 = 1 is below
    // the required overlap 0.6/1.6·6 = 2.25, so the position stage drops
    // it before any full-set join — and the exact output is still empty
    val corpus = Seq(
      (1L, "c1 c2 c3 a1 a2"),
      (2L, "c1 c2 c3 b1 b2")).toDF("doc_id", "text")
    val (pre, post) =
      Dedup.positionalPruneCounts(corpus, "doc_id", "text", 3, 0.6)
    assert(pre === 1L && post === 0L,
      s"prefix emits the pair, position prunes it: got ($pre, $post)")
    assert(Dedup.ngramJaccardPrefix(corpus, "doc_id", "text", 3, 0.6)
      .collect().isEmpty)
  }

  test("prefix-filtered Jaccard on empty input returns an empty frame") {
    val out = Dedup.ngramJaccardPrefix(docs.limit(0), "doc_id", "text", 3, 0.6)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("id_a", "id_b", "jaccard"))
  }

  test("leakage-proof split: no near-dup pair ever straddles a split boundary") {
    val d = "/root/testdata/sf0.001"
    val split = SparkEntry.queries("q150_leakage_proof_split")(spark, d)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val pairs = Dedup.ngramJaccard(Tables.documents(spark, d),
        "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) === split(b),
        s"near-dups $a/$b landed in ${split(a)}/${split(b)} — eval leakage")
    }
    // and the split is still a split: all three sides populated
    assert(split.values.toSet === Set("train", "val", "test"))
  }

  test("winnow: a shared passage of w+k-1 tokens shares a fingerprint at ANY offset") {
    // k=3, w=4 => guarantee length 6: the passage yields 4 full k-grams,
    // so one whole window sits inside it in BOTH docs despite different
    // offsets — the alignment-independence a fixed-stride fingerprint lacks
    val pass = "alpha beta gamma delta epsilon zeta"
    val corpus = Seq(
      (1L, s"$pass one two three four"),
      (2L, s"x1 y2 z3 $pass p q"),
      (3L, "totally different words entirely over here right now")
    ).toDF("doc_id", "text")
    val sel = Dedup.winnow(corpus, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long)].collect()
    def fps(id: Long) = sel.filter(_._1 == id).map(_._3).toSet
    assert((fps(1L) & fps(2L)).nonEmpty,
      "the shared passage must be fingerprinted in both documents")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)
  }

  test("winnow: every window is covered; sub-window docs emit their global min") {
    val doc = (1 to 30).map(i => s"t$i").mkString(" ") // 28 k-grams at k=3
    val corpus = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")
    val sel = Dedup.winnow(corpus, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long)].collect()
    val pos1 = sel.filter(_._1 == 1L).map(_._2).toSet
    // the SWA coverage invariant: each window of w=4 consecutive k-gram
    // positions contains at least one selected position
    (3 to 27).foreach { e =>
      assert((e - 3 to e).exists(p => pos1.contains(p.toLong)),
        s"window ending at $e has no selected fingerprint")
    }
    // density ~ 2/(w+1): far fewer than all 28 positions selected
    assert(pos1.size < 28 && pos1.size >= 7)
    // doc 2 has a single k-gram (< w): exactly its global min, never zero
    val d2 = sel.filter(_._1 == 2L)
    assert(d2.length === 1 && d2.head._2 === 0L)
  }

  test("spanScrub keeps intra-doc repetition (distinct-doc count, not occurrences)") {
    val rep = words("r", 4)
    val corpus = Seq((1L, s"$rep $rep ${words("u", 4)}")).toDF("doc_id", "text")
    val out = Dedup.spanScrub(corpus, "doc_id", "text", 4)
      .select("dropped_spans", "clean_text")
      .as[(Long, String)].head()
    assert(out === ((0L, s"$rep $rep ${words("u", 4)}")))
  }

  test("spanScrub conserves tokens and passes empty/short docs through") {
    val corpus = Seq(
      (1L, ""), // zero tokens
      (2L, "one"), // sub-span doc
      (3L, words("a", 10)), // ragged tail span
      (4L, words("a", 10)) // full dup of 3 -> everything dropped
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(corpus, "doc_id", "text", 4)
      .select("id", "n_spans", "dropped_tokens", "kept_tokens", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 0L, 0L, 0L, "")))
    assert(out(1) === ((2L, 1L, 0L, 1L, "one")))
    assert(out(2) === ((3L, 3L, 10L, 0L, "")), "full dup must scrub to empty")
    assert(out(3) === ((4L, 3L, 10L, 0L, "")))
    // conservation: kept + dropped == token count, every doc
    out.foreach { case (id, _, drop, kept, _) =>
      val n = corpus.where(col("doc_id") === id)
        .select(size(graft.functions.TextFns.tokens(col("text"))))
        .as[Int].head()
      assert(drop + kept === n.toLong, s"token leak in doc $id")
    }
  }

  test("survivorsByScore keeps the argmax-quality member, ties to lowest id") {
    // cluster {1,2,3} via chained pairs; doc 2 scores highest -> survivor.
    // cluster {5,6} ties on score -> lowest id 5 survives. 9 is a
    // singleton (no pair) -> its own cluster, always kept.
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val scored = Seq(
      (1L, 0.3), (2L, 0.9), (3L, 0.5),
      (5L, 0.7), (6L, 0.7),
      (9L, 0.1)).toDF("doc_id", "score")
    val out = Dedup.survivorsByScore(pairs, scored, "doc_id", "score")
      .select("doc_id", "cluster", "survivor_id", "n_members", "kept")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 3L, false), (2L, 1L, 2L, 3L, true),
      (3L, 1L, 2L, 3L, false),
      (5L, 5L, 5L, 2L, true), (6L, 5L, 5L, 2L, false),
      (9L, 9L, 9L, 1L, true)))
    // exactly one survivor per cluster
    val perCluster = out.groupBy(_._2).map { case (_, g) => g.count(_._5) }
    assert(perCluster.forall(_ === 1))
  }

  test("survivorsByScore differs from min-id exactly when quality says so") {
    // min-id dedup would keep 10; score-aware keeps the cleaner 11
    val pairs = Seq((10L, 11L)).toDF("id_a", "id_b")
    val scored = Seq((10L, 0.2), (11L, 0.8)).toDF("doc_id", "score")
    val surv = Dedup.survivorsByScore(pairs, scored, "doc_id", "score")
      .where(col("kept")).select("doc_id").as[Long].collect().toSeq
    assert(surv === Seq(11L))
  }

  test("minhashEstimateAudit: identical docs audit at exactly 48/48 and zero error") {
    val pairs = Seq((1L, 4L)).toDF("id_a", "id_b") // case-dup pair of `docs`
    val out = Dedup.minhashEstimateAudit(docs, "doc_id", "text", 3, pairs)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(2) === 48L, "all signature positions match")
    assert(r.getLong(3) === r.getLong(4), "inter == union for identical sets")
    assert(r.getAs[Long]("est_micro") === 1000000L)
    assert(r.getAs[Long]("jac_micro") === 1000000L)
    assert(r.getAs[Long]("err_micro") === 0L)
  }

  test("minhashEstimateAudit: estimator stays near exact Jaccard on real near-dups") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b")
    val out = Dedup.minhashEstimateAudit(d, "doc_id", "text", 3, pairs)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (m, inter, unio) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(m >= 0 && m <= 48)
      assert(r.getAs[Long]("est_micro") === m * 1000000L / 48)
      assert(r.getAs[Long]("jac_micro") === inter * 1000000L / unio)
      // 48-perm estimator σ ≈ √(j(1−j)/48) ≈ 0.05 at j ≈ 0.9: allow 3σ
      assert(r.getAs[Long]("err_micro") <= 150000L,
        s"sketch far off exact for pair (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("weightedJaccardPairs: identical docs score 10^6; rare overlap outranks common overlap") {
    import spark.implicits._
    // pairs (1,2) and (3,4) have IDENTICAL unweighted structure (3
    // shingles each, 2 shared), but (3,4)'s shared shingles also appear
    // in four boilerplate docs — inverse-df weighting must separate them
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"),
      (3L, "p q r s t"), (4L, "p q r s u"),
      (5L, "p q r s w1 x1"), (6L, "p q r s w2 x2"),
      (7L, "p q r s w3 x3"), (8L, "p q r s w4 x4"),
      (9L, "a b c d e") // exact twin of 1
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.weightedJaccardPairs(corpus, "doc_id", "text", 3, pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("wsim_micro"))
      .toMap
    assert(out((1L, 9L)) === 1000000L, "identical sets score exactly 1")
    assert(out((1L, 2L)) > out((3L, 4L)),
      s"rare overlap must outrank boilerplate overlap: $out")
    // naive replay of the rare pair's score
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val texts = Map(1L -> "a b c d e", 2L -> "a b c d f",
      3L -> "p q r s t", 4L -> "p q r s u")
    val all = corpus.collect().map(r => (r.getLong(0), sh(r.getString(1))))
    def df(g: String) = all.count(_._2.contains(g)).toLong
    def w(g: String) = 1000000L / df(g)
    def wsim(a: Long, b: Long) = {
      val (sa, sb) = (sh(texts(a)), sh(texts(b)))
      val iw = (sa & sb).toSeq.map(w).sum
      iw * 1000000L / (sa.toSeq.map(w).sum + sb.toSeq.map(w).sum - iw)
    }
    assert(out((1L, 2L)) === wsim(1L, 2L))
    assert(out((3L, 4L)) === wsim(3L, 4L))
  }

  test("q268 scheme planner: exact dups survive surely; fewer rows per band = higher recall") {
    val rows = SparkEntry.queries("q268_lsh_scheme_planner")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    // constructed exact-dup pair: sim = 1 survives every scheme surely
    locally {
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_lshp").toString
      Seq((1L, "alpha beta gamma delta epsilon", "en", "web", 29L),
          (2L, "alpha beta gamma delta epsilon", "en", "web", 29L),
          (3L, "zeta eta theta iota kappa", "en", "web", 25L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/documents.parquet")
      val ex = SparkEntry.queries("q268_lsh_scheme_planner")(spark, tmp)
        .collect()
      assert(ex.length === 1)
      assert(ex.head.getLong(2) === ex.head.getLong(3), "inter == union")
      assert(ex.head.getDouble(4) === 1.0 && ex.head.getDouble(5) === 1.0 &&
        ex.head.getDouble(6) === 1.0)
    }
    // for every pair: r=4 banding ≥ r=6 ≥ r=8 (s < 1 strictly orders)
    rows.foreach { case (_, _, p4, p6, p8) =>
      assert(p4 >= p6 && p6 >= p8,
        s"banding recall must fall as rows-per-band grows: $p4 $p6 $p8")
    }
    // survival is monotone in similarity within a scheme
    val bySim = rows.sortBy(r => r._1.toDouble / r._2)
    assert(bySim.map(_._3).toSeq === bySim.map(_._3).toSeq.sorted)
  }

  test("q272 mixture shift: kept ≡ naive bag-of-words dedup per source; shifts balance near zero") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q272_dedup_mixture_shift")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(7)))
    assert(rows.nonEmpty)
    // survivors per source ≡ a naive bag-of-words min-id dedup replay
    val all = Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bow(t: String) = t.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).distinct.sorted.mkString(" ")
    val surv = all.groupBy(d => bow(d._3)).values
      .map(_.map(_._1).min).toSet
    val bySource = all.map(d => (d._1, d._2))
    rows.foreach { case (src, nDocs, nKept, _, _, _) =>
      val docs0 = bySource.filter(_._2 == src)
      assert(nDocs === docs0.length.toLong)
      assert(nKept === docs0.count(d => surv(d._1)).toLong, s"source $src")
    }
    // micro-shares partition 10⁶ up to integer truncation, so the
    // shifts sum to ~0 (|Σ| bounded by the number of sources)
    val shiftSum = rows.map(_._6).sum
    assert(math.abs(shiftSum) <= rows.length.toLong,
      s"shifts must balance near zero, got $shiftSum")
    // dedup actually removed something somewhere (the read is non-trivial)
    assert(rows.exists { case (_, n, k, _, _, _) => k < n })
  }

  test("q278 transitivity: a constructed triangle + open chain counts exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_trans").toString
    def w(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    def x(n: Int) = (1 to n).map(i => s"x$i").mkString(" ")
    // triangle 1=2=3 (disjoint w-alphabet, 3 closed wedges);
    // chain 10–11–12 on the x-alphabet: j(10,11) = 8/12, j(11,12) =
    // 12/16 (both ≥ 0.6) but j(10,12) = 8/16 < 0.6 → 1 open wedge
    Seq((1L, w(10)), (2L, w(10)), (3L, w(10)),
        (10L, x(10)), (11L, x(14)), (12L, x(18)))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q278_dedup_transitivity")(spark, tmp)
      .collect().head
    assert(r.getLong(0) === 5L, "edges: the clique's 3 + the chain's 2")
    assert(r.getLong(1) === 4L, "wedges: 3 at the clique + 1 at the chain")
    assert(r.getLong(2) === 3L, "closed: the clique's")
    assert(r.getLong(3) === 1L, "open: the chain's middle")
    assert(r.getLong(4) === 750000L)
  }

  test("q289 blocking recall: SNM pairs are a subset of truth, recall monotone in the window") {
    val rows = SparkEntry.queries("q289_blocking_recall")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(2L, 5L, 10L))
    // SNM verifies the same exact Jaccard as the truth side, so every
    // blocked pair IS a true pair — n_hit ≡ n_blocked is the audit's law
    rows.foreach { case (w, nt, nb, nh, _) =>
      assert(nh === nb, s"w=$w: a blocked pair escaped the truth set")
      assert(nh <= nt, s"w=$w: recall cannot exceed 1")
    }
    // a wider window can only ADD candidate pairs
    assert(rows.map(_._4).toSeq === rows.map(_._4).toSeq.sorted,
      "n_hit must be monotone in the window")
    assert(rows.map(_._2).distinct.size === 1,
      "the truth side is window-independent")
  }

  test("q295 simhash audit: identical docs at distance 0; true pairs separate from the background") {
    // constructed: an identical pair must audit at (hamming 0, jaccard 1)
    val tmp = java.nio.file.Files.createTempDirectory("graft_q295").toString
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, t), (2L, t), (3L, "one two three four five six seven"))
      .map { case (id, x) => (id, x, "en", "web", x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q295_simhash_estimate_audit")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 2L, 0, 1.0)))
    // real data: the mean hamming over TRUE pairs must sit well below
    // the all-pairs background mean — the separation that makes the
    // hamming cut usable as a near-dup screen at all
    val dir = "/root/testdata/sf0.001"
    val audit = SparkEntry.queries("q295_simhash_estimate_audit")(spark, dir)
      .collect().map(_.getInt(2))
    assert(audit.nonEmpty)
    val sigs = graft.operators.Dedup
      .simHash(graft.Tables.documents(spark, dir), "doc_id", "text")
      .collect().map(_.getLong(1))
    val bg = (for { i <- sigs.indices; j <- (i + 1) until sigs.length }
      yield java.lang.Long.bitCount(sigs(i) ^ sigs(j)).toDouble)
    val (am, bm) = (audit.map(_.toDouble).sum / audit.length,
      bg.sum / bg.length)
    assert(am < bm / 2,
      s"true-pair mean hamming $am must sit below half the background $bm")
  }

  test("q291 cluster-size histogram: conservation law and no size-0/negative rows") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q291_cluster_size_histogram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(r => r._1 >= 1L && r._2 > 0L),
      "every histogram row is a real (csize >= 1, count > 0) bucket")
    assert(rows.forall(r => r._3 === r._1 * r._2))
    val total = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_._3).sum === total,
      "every document lands in exactly one cluster (singletons included)")
  }
}
