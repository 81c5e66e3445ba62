package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distributed byte-pair-encoding vocabulary training (Sennrich et al.,
  * ACL 2016) — the tokenizer-learning step of an LLM data pipeline,
  * restated for Spark's execution model.
  *
  * Scale posture: the corpus is touched exactly ONCE — tokenize → explode →
  * word-frequency aggregation (map-side partial combine; the same shuffle
  * shape as q32's token counting). Every merge round after that runs on the
  * DISTINCT-WORD table, which Heap's law keeps orders of magnitude smaller
  * than the corpus (~100 M rows for a 100 TB corpus — still distributed,
  * never collected). A round is: pull the top pair slice to the driver
  * (metadata — the same scalar-witness pattern as [[Components]]'
  * convergence probe), select the longest provably sequential-equivalent
  * merge BATCH from it, rewrite the symbol column in ONE narrow JVM-scan
  * pass, and fold the changed words' −old/+new pair contributions into
  * the standing (l, r, cnt) table — the full pair explode happens once,
  * at round zero (see [[learn]]). Lineage is cut per round via
  * [[Checkpoints.cut]] with superseded rounds released, so the logical
  * plan stays O(1) deep across any merge count.
  *
  * The merge rewrite is [[applyMergesToSyms]]'s greedy
  * leftmost-nonoverlapping scan ("a a a" under merge (a,a) → "aa a", not
  * "aa aa") — the SAME function [[encode]] folds over unseen words, so
  * training and inference cannot drift.
  *
  * Determinism: pair argmax breaks ties (count desc, left asc, right asc);
  * re-running on any partitioning yields the identical merge list.
  */
object Bpe {

  /** One learned merge: rank 1..n, the adjacent pair it joins, and the
    * freq-weighted adjacent-pair count that made it the argmax (counted
    * with overlaps, per the reference algorithm's get_stats).
    */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** The trained model: the driver-side merge list (k rows — it arrives on
    * the driver one argmax row per round by construction) plus the final
    * distributed word-segmentation table (word, freq, syms) whose `syms`
    * concatenation is always exactly `word`.
    */
  final case class Model(merges: Seq[Merge], segments: DataFrame)

  /** Corpus word-frequency table — the one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Freq-weighted adjacent-pair counts of a segmentation table —
    * (l, r, cnt), overlaps included (the reference algorithm's get_stats).
    */
  private def pairCountsOf(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(zipAdjacent(col("syms"))).as("p"))
      .groupBy(col("p.l"), col("p.r")).agg(sum("freq").as("cnt"))

  /** How many of the top slice rows the driver pulls per round to pick a
    * merge batch from. The slice is metadata (3 small columns), never data.
    */
  private val SliceSize = 64

  /** Learn up to `numMerges` BPE merges over `textCol`; stops early when
    * the best remaining adjacent pair occurs fewer than `minCount` times
    * (freq-weighted). Initial symbols are single CODE POINTS, produced by
    * the same splitter [[encode]]'s fallback uses ([[splitCodePoints]] as
    * a UDF over the distinct-word table) — the encode ≡ training identity
    * is structural, not a coincidence of two splitter implementations.
    *
    * Result-identical to the sequential textbook loop (BpeSpec pins exact
    * equality, ties and overlaps included), but restated so cost per merge
    * falls instead of staying flat:
    *
    *  - INCREMENTAL pair counts (Sennrich's own fast-BPE refinement): the
    *    (l, r, cnt) table is maintained by DELTA — after a merge, only the
    *    words whose segmentation actually changed recompute their pair
    *    contributions (−old +new on that sliver), then fold into the pair
    *    table with one small union-agg. The full-table pair explode +
    *    corpus-wide hash-agg the naive loop pays per round happens exactly
    *    once, at round zero.
    *  - BATCHED rounds: each driver round trip pulls the top [[SliceSize]]
    *    pairs and applies the longest prefix that provably behaves as if
    *    merged one-at-a-time (see [[selectBatch]] — pairwise
    *    symbol-disjoint, cut at the first count that a sharing pair's
    *    post-merge growth could tie or beat). B merges then cost ONE
    *    narrow chained-rewrite pass + one delta agg instead of B of each,
    *    and the per-merge share of the ~2-job round floor shrinks by B.
    */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L): Model = {
    require(numMerges >= 0 && minCount >= 1, "need numMerges >= 0, minCount >= 1")
    var words = Checkpoints.cut(
      wordCounts(docs, textCol).withColumn("syms",
        splitCodePointsUdf(col("word"))))
    // the CUT frame behind `words` (which may be a projection of it) —
    // what release() must be handed when the round advances
    var wordsCut = words
    if (numMerges == 0) return Model(Nil, words)
    // driver-side symbol vocabulary: initial code points now, plus every
    // merged symbol as it is learned. Bounded (distinct code points +
    // numMerges) and needed by selectBatch's collision rule: a merge whose
    // result STRING already exists as a symbol can INCREASE other pairs'
    // counts, which invalidates any batch member after it.
    val symbols = scala.collection.mutable.Set.empty[String]
    words.select(explode(col("syms")).as("s")).distinct()
      .collect().foreach(r => symbols += r.getString(0))
    var pairs = Checkpoints.cut(pairCountsOf(words))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (!done && rank <= numMerges) {
      val top = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .head(SliceSize)
        .map { case Row(l: String, r: String, cnt: Long) => (l, r, cnt) }
      val batch = selectBatch(top, numMerges - rank + 1, minCount, symbols)
      if (batch.isEmpty) done = true
      else {
        batch.foreach { case (l, r, cnt) =>
          merges += Merge(rank, l, r, cnt)
          symbols += (l + r)
          rank += 1
        }
        // one narrow pass applies the whole batch in rank order via the
        // same greedy JVM scan encode uses (disjointness makes it ≡
        // one-at-a-time). NOT a chained when/regexp expression: that
        // duplicates its child 4× per level, so a B-merge batch builds a
        // 4^B-node expression tree and large batches blow up analysis.
        // The round materializes the word table ONCE, carrying BOTH the
        // old and new segmentation, so the delta below reads changed rows
        // from these blocks instead of re-running the rewrite per consumer.
        val batchPairs = batch.map { case (l, r, _) => (l, r) }.toArray
        val merged = udf((syms: Seq[String]) =>
          applyMergesToSyms(syms.toArray, batchPairs))
        val staged = Checkpoints.cut(words.select(col("word"), col("freq"),
          col("syms"), merged(col("syms")).as("nsyms")))
        // delta maintenance: only words whose segmentation CHANGED move
        // pair counts — −freq on their old pairs, +freq on their new
        // ones, both sides exploded in a SINGLE scan of the sliver
        val delta = staged.filter(not(col("nsyms") <=> col("syms")))
          .select(explode(concat(
            transform(zipAdjacent(col("syms")), p =>
              struct(p.getField("l").as("l"), p.getField("r").as("r"),
                (-col("freq")).as("w"))),
            transform(zipAdjacent(col("nsyms")), p =>
              struct(p.getField("l").as("l"), p.getField("r").as("r"),
                col("freq").as("w"))))).as("d"))
          .groupBy(col("d.l"), col("d.r")).agg(sum(col("d.w")).as("cnt"))
        val nextPairs = Checkpoints.cut(
          pairs.unionAll(delta).groupBy("l", "r").agg(sum("cnt").as("cnt"))
            .filter(col("cnt") > 0))
        Checkpoints.release(pairs)
        Checkpoints.release(wordsCut)
        pairs = nextPairs
        wordsCut = staged
        // the next round's word table is a lazy PROJECTION of the staged
        // blocks — no second materialization of the rewrite
        words = staged.select(col("word"), col("freq"),
          col("nsyms").as("syms"))
      }
    }
    Model(merges.result(), words)
  }

  /** The longest prefix of the sorted (cnt desc, l, r) top slice that is
    * provably identical to merging one pair at a time:
    *
    *  - the head is the true argmax — always safe;
    *  - selection stops at the first candidate SHARING a symbol with an
    *    already-selected pair (its own count may have just changed, so its
    *    sequential position is unknowable without recounting);
    *  - selection stops after a merge whose result string collides with an
    *    existing symbol OR with a symbol an earlier batch member creates
    *    (two sources feeding one symbol lets pairs involving it GROW past
    *    the single-sharing-pair bound, so nothing after it is safe this
    *    round);
    *  - selection stops after a SELF-pair (l == r): its merge turns runs
    *    "a a a a" into pairs (aa, aa)/(aa, a) whose counts are bounded by
    *    the pair's OWN count — which the sharing barrier below cannot see
    *    (it excludes batch members) — so nothing after it is safe either;
    *  - finally the tail is truncated to counts STRICTLY above the
    *    barrier: the highest count among slice pairs that share a symbol
    *    with the selection, or the slice's last row when the slice is full
    *    (unseen pairs below it may share). Merging a selected pair can
    *    create new pairs with count up to its sharing pairs' counts, and a
    *    tie can win the (l, r) tiebreak — strictness closes that corner.
    *
    * Disjoint pairs' counts cannot change under each other's merges (an
    * occurrence overlap would need a shared symbol), so every kept member
    * is still the argmax at its turn; its recorded count is its sequential
    * count.
    */
  private def selectBatch(top: Array[(String, String, Long)], maxB: Int,
      minCount: Long, symbols: scala.collection.Set[String])
      : Seq[(String, String, Long)] = {
    val selected = Seq.newBuilder[(String, String, Long)]
    var nSel = 0
    val used = scala.collection.mutable.Set.empty[String]
    val created = scala.collection.mutable.Set.empty[String]
    var i = 0
    var stop = false
    while (!stop && i < top.length && nSel < maxB) {
      val (l, r, cnt) = top(i)
      if (cnt < minCount) stop = true
      else if (nSel > 0 && (used.contains(l) || used.contains(r))) stop = true
      else {
        selected += top(i)
        nSel += 1
        used += l
        used += r
        // collision: this merge's symbol gains occurrences from a second
        // source, so pairs involving it can grow — end the batch here
        if (symbols.contains(l + r) || created.contains(l + r)) stop = true
        // SELF-pair (l == r): merging a run "a a a a" creates (aa, aa) and
        // (aa, a) pairs whose counts are bounded by this pair's OWN count —
        // not by any sharing pair's, which is all the barrier below
        // measures (it excludes batch members) — so a later disjoint
        // member could outrank a pair this merge just created. End the
        // batch here too; the next round recounts. BpeSpec's
        // "a"*10 + "xy"*3 corpus pins the corner.
        if (l == r) stop = true
        created += (l + r)
      }
      i += 1
    }
    val picked = selected.result()
    if (picked.isEmpty) return picked
    val inBatch = picked.toSet
    val sharing = top.iterator.filterNot(inBatch)
      .filter { case (l, r, _) => used.contains(l) || used.contains(r) }
      .map(_._3)
    val unseen =
      if (top.length == SliceSize) Iterator.single(top.last._3)
      else Iterator.empty
    val barrier = (sharing ++ unseen).foldLeft(Long.MinValue)(math.max)
    picked.head +: picked.tail.takeWhile(_._3 > barrier)
  }

  /** [[splitCodePoints]] as a column function — used for training's
    * initial symbols so training and [[encode]] share ONE splitter. A UDF
    * is acceptable here: it runs once per DISTINCT word (the Heap's-law
    * table), never per corpus row.
    */
  private lazy val splitCodePointsUdf =
    udf((w: String) => splitCodePoints(w))

  /** Adjacent symbol pairs of a symbol array, as (l, r) structs — zip of
    * the array against itself shifted by one. Requires size >= 2 upstream
    * (zip_with pads the SHORTER side with nulls, so unequal slices would
    * otherwise fabricate a null-tailed pair).
    */
  private def zipAdjacent(syms: org.apache.spark.sql.Column) =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** One string per Unicode code point (surrogate pairs kept whole). */
  private def splitCodePoints(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** The learned merges as a driver-checkable DataFrame:
    * (rank, left, right, merged, pair_count), one row per merge.
    */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "pair_count")
      .select(col("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
  }

  /** Persist the trained merge list as the tokenizer's AT-REST artifact —
    * the lifecycle rung every other long-lived state here already has
    * (LSH index, IVF/PQ index, drift count + vector-sum states): a
    * production tokenizer is trained once and read by every encode job
    * for years; retraining per session would not even be correct (a new
    * corpus snapshot could learn different merges and silently re-tokenize
    * the world). Layout: `path/merges` = (rank, left, right, merged,
    * pair_count) parquet + the shared `_graft_index` kind tag ("bpe"), so
    * probing a non-tokenizer path is a domain error (the LSH/IVF
    * contract). The artifact is merge-LIST-sized (k rows), never
    * corpus-sized.
    */
  def writeModel(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], path: String): Unit = {
    mergesDf(spark, merges).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/merges")
    Similarity.writeIndexMeta(spark, path, "bpe", Seq(merges.size.toString))
  }

  /** Read a persisted merge list back in rank order — with the stored
    * count require()d, so a partially-written artifact fails fast instead
    * of silently encoding with a truncated grammar.
    */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] = {
    val Seq(n) = Similarity.readIndexMeta(spark, path, "bpe").map(_.toInt)
    val out = spark.read.parquet(s"$path/merges").orderBy("rank")
      .select("rank", "left", "right", "pair_count").collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    require(out.size == n,
      s"bpe artifact at $path holds ${out.size} merges, expected $n")
    out
  }

  /** Encode arbitrary text with a trained merge list — the inference half
    * of the tokenizer lifecycle (training's segmentation table only covers
    * the words training saw; this handles unseen corpora, with unseen words
    * falling back to characters plus whatever learned merges apply).
    * Output: (id, n_tokens, toks array<string>).
    *
    * Semantics: merges apply strictly in rank order, each with the same
    * greedy leftmost-nonoverlapping rewrite as training — so encoding the
    * training corpus reproduces the training segmentation exactly
    * (BpeSpec asserts the identity). Map-side ONLY: tokenize, then a
    * per-partition imperative merge loop over a broadcast merge array —
    * the same mapPartitions posture as the multimodal codecs (an opaque
    * per-value algorithm Catalyst buys nothing on), no shuffle anywhere.
    * A per-partition word→tokens memo exploits Zipf: each distinct word
    * per partition pays the O(merges·len) fold once (capped so a
    * pathological all-distinct corpus cannot grow the memo unboundedly).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray
    val bc = spark.sparkContext.broadcast(ranked)
    // null text encodes to zero tokens (tokens(null) is a null array, and a
    // null Seq would NPE in the fold below — learn() never sees the row
    // because explode drops it, so encode must also not die on it)
    docs.select(col(idCol).cast("long").as("id"),
        coalesce(TextFns.tokens(col(textCol)),
          array().cast("array<string>")).as("t"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, words) =>
          val toks = words.iterator.flatMap { w =>
            if (memo.size < 1000000) memo.getOrElseUpdate(w, applyMerges(w, ms))
            else memo.getOrElse(w, applyMerges(w, ms))
          }.toArray
          (id, toks.length.toLong, toks)
        }
      }.toDF("id", "n_tokens", "toks")
  }

  /** Fold the ranked merges over one word: per merge, the greedy
    * leftmost-nonoverlapping scan (identical semantics to training's regex
    * rewrite), with a cheap containment pre-check.
    *
    * Initial symbols are CODE POINTS, not UTF-16 code units: Java's
    * `split("")` would cut a surrogate pair into two lone-surrogate
    * strings, and a lone surrogate cannot survive the JVM→UTF8String
    * boundary (Catalyst re-encodes it as '?'), silently corrupting every
    * supplementary character — emoji, rare CJK — in the corpus. BpeSpec's
    * unicode case pins the losslessness.
    */
  private def applyMerges(word: String,
      merges: Array[(String, String)]): Array[String] =
    applyMergesToSyms(splitCodePoints(word), merges)

  /** Fold ranked merges over a symbol array: per merge, the greedy
    * leftmost-nonoverlapping scan with a cheap containment pre-check.
    * ONE shared implementation behind training's per-round rewrite AND
    * encode's fallback — the training ≡ encode identity is structural.
    */
  private def applyMergesToSyms(syms0: Array[String],
      merges: Array[(String, String)]): Array[String] = {
    var syms = syms0
    var mi = 0
    while (mi < merges.length && syms.length >= 2) {
      val (l, r) = merges(mi)
      if (syms.contains(l) && syms.contains(r)) {
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      mi += 1
    }
    syms
  }

  /** Corpus-wide vocabulary statistics under the trained segmentation:
    * one row per final symbol — total occurrences (freq-weighted), the
    * number of distinct words it appears in, and its character length.
    * This is "encode the corpus with the learned tokenizer and count
    * tokens": the training segmentation already IS the encoding of every
    * corpus word, so no second corpus pass is needed.
    */
  def vocabStats(model: Model): DataFrame =
    model.segments
      .select(col("word"), col("freq"), explode(col("syms")).as("sym"))
      .groupBy("sym")
      .agg(sum("freq").as("occurrences"),
        countDistinct(col("word")).as("n_words"))
      .withColumn("sym_len", length(col("sym")))
}
