package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Context-window preparation for LLM training data: overlapping token
  * chunking (the retrieval / fine-tuning shape) and GPT-style
  * concat-and-split sequence packing (the pre-training shape). Both are
  * deterministic column pipelines — no UDFs, no driver loops — and the
  * packing prefix-sum is two-phase so no global single-partition window
  * appears anywhere in the plan.
  */
object Packing {

  /** Overlapping token chunks: chunk `i` of a document covers tokens
    * `[i·stride, i·stride + chunkSize)` with `stride = chunkSize −
    * overlap`; the last chunk may be short, and every token belongs to at
    * least one chunk. Chunk count `1 + ⌈max(n − chunkSize, 0) / stride⌉`
    * — a document shorter than one chunk still emits its single (short)
    * chunk. Map-side only: tokenize → sequence-explode → slice, all
    * codegen'd; chunks shuffle nowhere.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    docs.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("t"))
      .withColumn("n", size(col("t")))
      .withColumn("k", (lit(1) + floor(
        (greatest(col("n") - chunkSize, lit(0)) + lit(stride - 1)) /
          lit(stride.toDouble))).cast("int"))
      .select(col("id"), col("t"),
        explode(sequence(lit(0), col("k") - 1)).as("i"))
      .select(col("id"), col("i").cast("int").as("chunk_idx"),
        concat_ws(" ",
          slice(col("t"), col("i") * stride + 1, lit(chunkSize))).as("chunk_text"),
        size(slice(col("t"), col("i") * stride + 1, lit(chunkSize))).as("n_tokens"))
  }

  /** GPT-style sequence packing: conceptually concatenate all documents in
    * `idCol` order and split the token stream every `seqLen` tokens; each
    * document is accounted to the sequence its FIRST token lands in, and
    * `split_docs` counts documents straddling a sequence boundary (the
    * attention-mask / document-leakage accounting a packing step owes its
    * pipeline).
    *
    * Scale posture — the global running offset is a two-phase distributed
    * prefix sum, NOT a global-window sort: documents range-bucket by id
    * (order-preserving), per-bucket token totals aggregate to `buckets`
    * rows whose running offsets compute in a single tiny window (buckets
    * rows, not documents), broadcast back, and the within-bucket cumsum
    * runs partition-parallel. No stage materializes a single global
    * partition of the corpus.
    *
    * Bucket bounds come from the OBSERVED id distribution (approxQuantile
    * cut points at i/buckets), not from the id RANGE: snowflake ids with
    * epoch gaps, hash-prefixed ids, or one tenant owning 99% of an id range
    * would collapse a range-width scheme's token mass into one bucket and
    * degenerate phase 2 toward the global window this operator exists to
    * avoid. Quantile bounds cap any bucket's row share at ~1/buckets
    * (±0.1% rank error) regardless of id shape, and any monotone-in-id
    * assignment leaves the packing result bit-identical (the
    * bucket-count-independence property PackingSpec pins). Note: deriving
    * the bounds runs one eager Spark job at operator-construction time —
    * true of every quantile-bucketed operator in this file
    * ([[deterministicShuffle]] and [[lengthBatches]] likewise), since the
    * split points must be data before the plan is built.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, buckets: Int = 32): DataFrame = {
    require(seqLen > 0 && buckets > 0, "need positive seqLen and buckets")
    val base = docs.select(col(idCol).cast("long").as("id"),
      size(TextFns.tokens(col(textCol))).cast("long").as("n"))
    // empty input -> empty result with the output schema (the agg-based
    // min/max scheme this replaces threw MatchError on Row(null, null))
    if (base.head(1).isEmpty) return emptyPacking(docs)
    val bucketed = assignBuckets(base, buckets)
    // phase 1: per-bucket totals → running bucket offsets. The unpartitioned
    // window is over `buckets` rows (one per bucket), not the corpus.
    val offsets = bucketed.groupBy("b").agg(sum("n").as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("b", "off")
    // phase 2: within-bucket cumsum (partition-parallel) + bucket offset
    val cum = bucketed.join(broadcast(offsets), "b")
      .withColumn("s", sum(col("n")).over(
        Window.partitionBy("b").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, 0)) + col("off"))
      .withColumn("start", col("s") - col("n"))
      .withColumn("bin", floor(col("start") / lit(seqLen.toDouble)).cast("long"))
      .withColumn("straddle",
        (floor(col("start") / lit(seqLen.toDouble)) =!=
          floor((col("s") - 1) / lit(seqLen.toDouble))).cast("long"))
    cum.groupBy("bin").agg(
      count(lit(1)).as("n_docs"),
      sum("n").as("n_tokens"),
      min("id").as("first_doc"),
      max("id").as("last_doc"),
      sum("straddle").as("split_docs"))
  }

  /** Deterministic seeded corpus shuffle: a reproducible global training
    * order. Each document gets a portable 32-bit hash of `seed:id`
    * (TextFns.hash32, md5-derived so an external consumer — or the DuckDB
    * oracle — can recompute it), and `pos` is the document's contiguous
    * 0-based rank in `(h, id)` order: the order a trainer reads shards in.
    *
    * Scale posture: positions come from the same two-phase scheme as
    * [[packSequences]] — NO global-window `row_number` over the corpus.
    * Documents bucket by quantile cut points on `h` (monotone in `h`, so
    * bucket order extends hash order; ±0.1% rank error only moves bucket
    * BOUNDARIES, never changes `pos`), per-bucket counts roll into running
    * offsets in one `buckets`-row window, and within-bucket ranks run
    * partition-parallel. Re-running with the same seed reproduces the
    * permutation bit-for-bit on any cluster size — the property that makes
    * a training run resumable and an ablation comparable.
    */
  def deterministicShuffle(docs: DataFrame, idCol: String, seed: String,
      buckets: Int = 32): DataFrame = {
    require(buckets > 0, "need positive buckets")
    val base = docs.select(col(idCol).cast("long").as("id"))
      .withColumn("h", TextFns.hash32(concat(lit(seed + ":"), col("id"))))
    if (base.head(1).isEmpty)
      return base.withColumn("pos", lit(0L)).limit(0)
    twoPhaseRank(base, "h", buckets).select("id", "h", "pos")
  }

  /** Length-bucketed batch packing: rank documents by (token count, id),
    * cut the ranking into fixed-size batches, and account the padding each
    * batch would pay (`n_seqs · max_len − sum_len`) — the dynamic-batching
    * step that minimizes pad-token waste when batches are padded to their
    * longest member (the reason training input pipelines length-sort at
    * all). Output: one row per batch — (batch, n_seqs, min_len, max_len,
    * sum_len, padding); the trailing batch may be short.
    *
    * Same two-phase rank as [[deterministicShuffle]], keyed on length:
    * equal lengths always share a bucket (assignment depends only on the
    * key), so the global (len, id) order is exactly reproduced with no
    * single-partition window over the corpus.
    */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
      batchSize: Int, buckets: Int = 32): DataFrame = {
    require(batchSize > 0 && buckets > 0, "need positive batchSize and buckets")
    val base = docs.select(col(idCol).cast("long").as("id"),
      size(TextFns.tokens(col(textCol))).cast("long").as("len"))
    if (base.head(1).isEmpty)
      return base.select(lit(0L).as("batch"), lit(0L).as("n_seqs"),
        col("len").as("min_len"), col("len").as("max_len"),
        col("len").as("sum_len"), lit(0L).as("padding")).limit(0)
    twoPhaseRank(base, "len", buckets)
      .withColumn("batch", floor(col("pos") / lit(batchSize.toDouble)).cast("long"))
      .groupBy("batch")
      .agg(count(lit(1)).as("n_seqs"), min("len").as("min_len"),
        max("len").as("max_len"), sum("len").as("sum_len"))
      .withColumn("padding", col("n_seqs") * col("max_len") - col("sum_len"))
  }

  /** Curriculum construction: order the corpus easy→hard in `stages`
    * difficulty stages with a deterministic seeded interleave inside each
    * stage (Bengio et al. 2009 curriculum learning; length staging as in
    * the common short→long schedules). Difficulty here is token count —
    * callers wanting model-scored difficulty feed the same machinery a
    * different key.
    *
    * Exactness contract: the approx-quantile bucketing is INTERNAL
    * partitioning only — stage, hash, and final position are exact
    * functions of (token count, id, seed), reproducible by a SQL oracle:
    *  - difficulty rank `dr` = exact (n_toks, id) rank via [[twoPhaseRank]]
    *    (no single-partition window);
    *  - `stage` = ⌊dr·stages/N⌋ — the equal-fill cut, N from a broadcast
    *    1-row total;
    *  - within-stage order = md5-derived 32-bit hash of `seed:id`
    *    ([[graft.functions.TextFns.hash32]], portable), so each stage is a
    *    reproducible shuffle — adjacent batches mix content, but all of
    *    stage k precedes any of stage k+1;
    *  - final `pos` = exact rank of (stage·2³² + h, id), again two-phase.
    * Scale posture: two bounded shuffles + one broadcast; no corpus-wide
    * window, no collect.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, textCol: String,
      stages: Int, seed: String, buckets: Int = 32): DataFrame = {
    require(stages > 0 && buckets > 0, "need positive stages and buckets")
    val base = docs.select(col(idCol).cast("long").as("id"),
      size(TextFns.tokens(col(textCol))).cast("long").as("n_toks"))
    if (base.head(1).isEmpty)
      return base.select(col("id"), col("n_toks"), lit(0L).as("stage"),
        lit(0L).as("h"), lit(0L).as("pos")).limit(0)
    val total = base.agg(count(lit(1)).as("n_total"))
    val staged = twoPhaseRank(base, "n_toks", buckets)
      .withColumnRenamed("pos", "dr")
      .crossJoin(broadcast(total))
      .withColumn("stage", expr(s"(dr * $stages) div n_total"))
      .withColumn("h", TextFns.hash32(concat(lit(seed + ":"), col("id"))))
      .withColumn("ck", col("stage") * lit(4294967296L) + col("h"))
      .select("id", "n_toks", "stage", "h", "ck")
    twoPhaseRank(staged, "ck", buckets)
      .select("id", "n_toks", "stage", "h", "pos")
  }

  /** Contiguous 0-based rank of every row in (`keyCol`, id) order, with no
    * global window: quantile cut points bucket rows monotonically in the
    * key (equal keys can never straddle a bucket boundary), per-bucket
    * counts roll into running offsets in one `buckets`-row window, and
    * within-bucket ranks run partition-parallel. Input needs (id, keyCol);
    * output adds `pos`.
    */
  private[operators] def twoPhaseRank(base: DataFrame, keyCol: String,
      buckets: Int): DataFrame = {
    val bucketed = quantileBuckets(base, keyCol, buckets)
    // phase 1: per-bucket counts → running offsets (buckets rows, tiny)
    val offsets = bucketed.groupBy("b").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("b", "off")
    // phase 2: within-bucket rank (partition-parallel) + bucket offset
    bucketed.join(broadcast(offsets), "b")
      .withColumn("pos",
        row_number().over(Window.partitionBy("b").orderBy(keyCol, "id"))
          .cast("long") - 1L + col("off"))
      .drop("b", "off")
  }

  /** The shared monotone quantile bucketing: internal cut points at ranks
    * i/buckets on `keyCol` (±0.01% rank error), then `b = #{cuts <= key}`
    * — a codegen'd sum of comparisons. Monotone in the key, so equal keys
    * never straddle a bucket boundary and any downstream
    * order-by-(key, id) extends across buckets.
    *
    * LAZY since r21: the cut points ride a broadcast 1-row
    * percentile_approx aggregate instead of an eager driver
    * `approxQuantile` job. The old eager job meant every two-phase rank
    * cost an extra driver action (plan + schedule + collect) — q138's two
    * chained ranks ran 3 actions where 1 suffices, and ~30 board queries
    * ride this machinery. The ranks stay EXACT for ANY cut values
    * (bucketing is monotone and offsets come from actual counts —
    * RankPropertySpec pins bucket-count independence), so swapping the
    * sketch cannot change any output. The 1-row crossJoin is the same
    * plan-guarded provably-1-row broadcast class as q157's dangling-mass
    * frame.
    */
  private[operators] def quantileBuckets(base: DataFrame, keyCol: String,
      buckets: Int): DataFrame = {
    if (buckets <= 1) return base.withColumn("b", lit(0L))
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val cutsRow = base.agg(percentile_approx(col(keyCol).cast("double"),
      typedLit(probs), lit(10000)).as("__cuts"))
    base.crossJoin(broadcast(cutsRow))
      .withColumn("b",
        (1 until buckets).map(i =>
          when(col(keyCol) >= element_at(col("__cuts"), i), 1L)
            .otherwise(0L)).reduce(_ + _))
      .drop("__cuts")
  }

  /** Weighted per-group running total over a (grp, v, c) CLASS HISTOGRAM
    * (r21): adds `cum` = Σ c over the group's values ≤ v (inclusive) and
    * `gn` = the group's total weight, with the [[groupedTwoPhaseRank]]
    * skew discipline applied ON THE GRID — global quantile buckets on v,
    * per-(grp, bucket) weighted offsets (a groups×buckets frame, the only
    * unpartitioned window), within-(grp, bucket) running sums partition-
    * parallel. A group whose value grid is huge never serializes in one
    * window task. This is the order-statistics workhorse for operators
    * that need VALUES at ranks (medians, deciles) rather than per-row
    * ranks: the corpus collapses to the grid via map-side combine BEFORE
    * any shuffle.
    */
  private[operators] def groupedWeightedCumsum(hist: DataFrame,
      buckets: Int): DataFrame = {
    val bucketed = quantileBuckets(hist, "v", buckets)
    val offs = bucketed.groupBy("grp", "b").agg(sum("c").as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.partitionBy("grp").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("gn", sum(col("bn")).over(Window.partitionBy("grp")))
      .select(col("grp"), col("b"), col("off"), col("gn"))
    bucketed.join(broadcast(offs), Seq("grp", "b"))
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy("grp", "b").orderBy("v"))
          + col("off"))
      .drop("b", "off")
  }

  /** Bucketed POOLED cumulative sums over a distinct-value grid (one row
    * per `v`) — the unpartitioned-window companion to
    * [[groupedWeightedCumsum]] (r22): for every weight column w this adds
    * `cum_<w>` (inclusive running sum in `v` order) and `tot_<w>` (grid
    * total), and with `withGap` a `gap` column = next grid value − v
    * (0 at the last value; `v` must be integral then). The textbook
    * `Window.orderBy("v")` puts the WHOLE grid in one task — fine for a
    * 100-value length grid, a serialization cliff when the grid is
    * near-unique (the q246 measurement proved such grids exist in this
    * corpus). Here the [[twoPhaseRank]] discipline rides the grid
    * instead: global quantile buckets on `v`, per-bucket weight totals
    * rolled into running offsets on a ≤`buckets`-row frame (the only
    * single-partition work — partitioned by a constant so the
    * WindowExec single-partition alarm stays meaningful for genuinely
    * unbounded frames), within-bucket running sums partition-parallel.
    * Bucket-boundary gaps splice via each bucket's min value carried on
    * the same offsets frame. NON-NUMERIC `v` falls back to one bucket
    * (= the old plan shape): quantile cuts need a numeric probe, and a
    * numeric cast of a string would not be monotone in the string sort
    * order the cumsum runs in.
    */
  /** Grids at or under this many rows take the one-task cumulative (a
    * ≤~6 MB sort in one window task — trivially fine on any executor);
    * only bigger grids pay the bucketed machinery's extra stages. The
    * dispatch is on the MEASURED size of the pinned grid, so it is
    * scale-adaptive by data, not by a local[32] constant: a bounded
    * value domain stays on the cheap path at any corpus size, and a
    * near-unique grid (the q246 class) takes the bucketed path even at
    * sf0.001. Conf-overridable for testing and for executors where even
    * 256k rows in one task is unwelcome.
    */
  private val SmallGridConf = "graft.grid.cumsum.smallMax"
  private val DefaultSmallGridMax = 1L << 18

  private[operators] def gridCumsums(grid: DataFrame, weights: Seq[String],
      buckets: Int, withGap: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    // CUT the grid: every branch below reads it at least twice (the
    // size dispatch, then the quantile probe / per-bucket offsets / main
    // cumulative) — without the cut each consumer would re-run the
    // caller's corpus scan + count shuffle (Catalyst does not fuse
    // sibling consumers; the ksFromCounts staging rationale). The pinned
    // frame is grid-sized, cheap at any SF, and makes the dispatch
    // count() a near-free pinned-relation scan.
    val (g, gridRows) = Checkpoints.cutWithCount(grid)
    val smallMax = g.sparkSession.conf
      .getOption(SmallGridConf).map(_.toLong)
      .getOrElse(DefaultSmallGridMax)
    if (gridRows <= smallMax) {
      // bounded grid, MEASURED: one window task is the cheapest plan
      // (the bucketed path costs ~6 extra stages — pure overhead here).
      // partitionBy(lit(0)) is semantically the empty partition spec but
      // keeps WindowExec's "No Partition Defined" alarm meaningful for
      // genuinely unbounded frames elsewhere.
      val wOne = Window.partitionBy(lit(0))
      val wCum = wOne.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      var out = g
      for (w <- weights) out = out
        .withColumn(s"cum_$w", sum(col(w)).over(wCum))
        .withColumn(s"tot_$w", sum(col(w)).over(wOne))
      if (withGap) out = out.withColumn("gap", coalesce(
        lead("v", 1).over(wOne.orderBy("v")) - col("v"), lit(0L)))
      return out
    }
    val numeric = g.schema("v").dataType.isInstanceOf[NumericType]
    val bucketed =
      if (numeric) quantileBuckets(g, "v", buckets)
      else g.withColumn("b", lit(0L))
    val aggs = weights.map(w => sum(col(w)).as(s"__bn_$w")) ++
      (if (withGap) Seq(min(col("v")).as("__bmin")) else Nil)
    val wOne = Window.partitionBy(lit(0))
    val wOff = wOne.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    var offs = bucketed.groupBy("b").agg(aggs.head, aggs.tail: _*)
    for (w <- weights) offs = offs
      .withColumn(s"__off_$w",
        coalesce(sum(col(s"__bn_$w")).over(wOff), lit(0L)))
      .withColumn(s"tot_$w", sum(col(s"__bn_$w")).over(wOne))
    if (withGap)
      offs = offs.withColumn("__nextmin",
        lead("__bmin", 1).over(wOne.orderBy("b")))
    val keep = col("b") +: (weights.flatMap(w =>
      Seq(col(s"__off_$w"), col(s"tot_$w"))) ++
      (if (withGap) Seq(col("__nextmin")) else Nil))
    var out = bucketed.join(broadcast(offs.select(keep: _*)), "b")
    val wb = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (w <- weights)
      out = out.withColumn(s"cum_$w", sum(col(w)).over(wb) + col(s"__off_$w"))
    if (withGap)
      out = out.withColumn("gap", coalesce(
        coalesce(lead("v", 1).over(Window.partitionBy("b").orderBy("v")),
          col("__nextmin")) - col("v"), lit(0L)))
    out.drop("b" +: "__nextmin" +: weights.map(w => s"__off_$w"): _*)
  }

  /** Per-GROUP contiguous 0-based rank of every row in (`keyCol`, id)
    * order — the grouped generalization of [[twoPhaseRank]], for exact
    * within-group order statistics WITHOUT a per-group window: a window
    * partitioned by the group alone puts each group in ONE task, so a
    * single skewed group (half the corpus from one source) serializes.
    * Here the GLOBAL quantile cuts on `keyCol` bucket rows monotonically
    * (equal keys never straddle), per-(group, bucket) counts roll into
    * per-group running offsets in one groups×buckets-row window (tiny —
    * that frame, not the corpus, is all the unpartitioned work), and
    * within-(group, bucket) ranks run partition-parallel — a skewed group
    * spreads over all `buckets` partitions. Input needs (`gCol`, id,
    * `keyCol`); output adds `gpos` (rank within group) and `gn` (group
    * size).
    */
  private[operators] def groupedTwoPhaseRank(base: DataFrame, gCol: String,
      keyCol: String, buckets: Int): DataFrame = {
    val bucketed = quantileBuckets(base, keyCol, buckets)
    val offsets = bucketed.groupBy(gCol, "b").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.partitionBy(gCol).orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("gn", sum(col("bn")).over(Window.partitionBy(gCol)))
      .select(col(gCol), col("b"), col("off"), col("gn"))
    bucketed.join(broadcast(offsets), Seq(gCol, "b"))
      .withColumn("gpos",
        row_number().over(Window.partitionBy(gCol, "b").orderBy(keyCol, "id"))
          .cast("long") - 1L + col("off"))
      .drop("b", "off")
  }

  /** Monotone-in-id bucket assignment over (id, n) rows: internal cut
    * points at ranks 1/buckets .. (buckets-1)/buckets from approxQuantile
    * (±0.1% rank error), then `b = #{cut points <= id}` — a codegen'd sum
    * of comparisons against at most buckets−1 literals. Quantile (not
    * range-width) bounds cap any bucket's row share at ~1/buckets for ANY
    * id shape; duplicate cut points merely leave buckets empty.
    */
  private def assignBuckets(base: DataFrame, buckets: Int): DataFrame =
    quantileBuckets(base, "id", buckets)

  /** The (id, n, b) bucket assignment [[packSequences]] runs on — exposed
    * so specs can assert the skew bound (max bucket token share) directly.
    */
  private[graft] def bucketAssignments(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    assignBuckets(docs.select(col(idCol).cast("long").as("id"),
      size(TextFns.tokens(col(textCol))).cast("long").as("n")), buckets)

  /** Zero-row frame with [[packSequences]]'s output schema. */
  private def emptyPacking(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("bin", LongType), StructField("n_docs", LongType, nullable = false),
      StructField("n_tokens", LongType), StructField("first_doc", LongType),
      StructField("last_doc", LongType), StructField("split_docs", LongType)))
    docs.sparkSession.createDataFrame(
      docs.sparkSession.sparkContext.emptyRDD[Row], schema)
  }
}
