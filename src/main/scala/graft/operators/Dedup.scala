package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns._

/** Deduplication family for the LLM-data-pipeline closure (north star,
  * /root/repo/BASELINE.json): exact, MinHash+LSH, SimHash, and exact n-gram
  * Jaccard. The reference itself dedups only by keyed upsert
  * (`dags/jira/db_ops.py:29-43` — see [[Upsert]]); these generalize to
  * content-defined identity.
  *
  * 100 TB posture, per operator:
  *  - exact: hash-shuffle on the fingerprint, one exchange, map-side
  *    combine. Never ships full text twice (fingerprint computed in the
  *    scan stage).
  *  - MinHash+LSH: linear-time candidate generation — signatures are O(1)
  *    per doc, the band-bucket equi-join shuffles on (band, key) so only
  *    colliding docs meet. The O(n²) all-pairs compare never materializes.
  *  - SimHash: 32-bit sketch + pigeonhole banding (hamming ≤ k ⇒ some
  *    k+1-way block matches) — again equi-join, no cross product.
  *  - n-gram Jaccard (exact): inverted-index self-join on the shingle. The
  *    honest gold standard; at 100 TB run it only behind LSH candidate
  *    filtering (its cost is Σ_shingle df² — bounded here, unbounded in
  *    adversarial corpora).
  */
object Dedup {

  /** Exact dedup: one survivor (lowest `orderCol`) per fingerprint of
    * `keyExpr`. Equivalent SQL: row_number() OVER (PARTITION BY fp ORDER BY
    * orderCol) = 1.
    */
  def exact(df: DataFrame, keyExpr: Column, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col("_graft_fp")).orderBy(col(orderCol))
    df.withColumn("_graft_fp", md5(keyExpr))
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
      .withColumnRenamed("_graft_fp", "fingerprint")
  }

  /** MinHash estimator-error audit over a given candidate-pair set: for
    * each pair, the SKETCH's similarity estimate (matching signature
    * positions / perms — the Broder '97 unbiased estimator the LSH path
    * banks on) next to the exact shingle Jaccard, both as integer
    * micro-ratios. The calibration read behind choosing `perms`: at 48
    * permutations the estimator's σ ≈ √(j(1−j)/48) ≈ 0.07 at j = 0.6, and
    * a drifting corpus (longer docs, different shingle-set sizes) can
    * silently push the sketch off the exact value — this table is the
    * evidence, per pair, not a textbook bound.
    *
    * Scale: signatures are computed ONLY for docs appearing in `pairs`
    * (semi-join first) — at 100 TB the audit rides an existing candidate
    * index (the q34/q77 memo), never a corpus re-sign.
    */
  def minhashEstimateAudit(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, pairs: DataFrame, perms: Int = 48): DataFrame = {
    val ids = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
    val hsig = docSignatures(
      docs.join(ids.withColumnRenamed("id", idCol), Seq(idCol), "left_semi"),
      idCol, textCol, shingleN, perms)
    val sets = hsig.select(col("id"), col("hs"))
    val sigs = hsig.select(col("id"), col("sig"))
    val out = pairs.select("id_a", "id_b")
      .join(sets.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("unio", size(col("hs_a")).cast("long") +
        size(col("hs_b")).cast("long") - col("inter"))
      .withColumn("sig_matches", aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v))
      .withColumn("est_micro", expr(s"sig_matches * 1000000 div $perms"))
      .withColumn("jac_micro", expr("inter * 1000000 div unio"))
      .withColumn("err_micro", abs(col("est_micro") - col("jac_micro")))
      .select("id_a", "id_b", "sig_matches", "inter", "unio",
        "est_micro", "jac_micro", "err_micro")
    Checkpoints.sealAndRelease(out, hsig)
  }

  /** Inverse-df-WEIGHTED Jaccard over a given candidate-pair set — the
    * rarity-aware rescoring of plain set Jaccard (the Chaudhuri/Xiao
    * weighted-similarity-join reading): two docs sharing rare shingles
    * are far stronger duplicate evidence than two sharing boilerplate,
    * and the unweighted q34 score can't tell them apart. Weight per
    * shingle = ⌊10⁶/df⌋ — integer, log-free (the q179 stance: idf's ln
    * is library-dependent, inverse-df orders identically), so num/den
    * are exact int64 sums and the micro quotient is one integer
    * division.
    *
    * Scale: df is one (shingle → count) aggregate over the postings the
    * near-dup index already materializes; pair scoring joins postings
    * only for pair-PARTICIPATING docs (semi-join first). Never an
    * all-pairs pass — candidates come from the caller (q34's memo here,
    * the LSH index at 100 TB).
    */
  def weightedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, pairs: DataFrame): DataFrame = {
    val post = Checkpoints.cut(
      shinglePostings(docs, idCol, textCol, shingleN))
    val wt = post.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .withColumn("w", expr("1000000 div df"))
      .select("shingle", "w")
    val wpost = Checkpoints.cut(post.join(wt, "shingle"))
    val ids = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
    val ppost = Checkpoints.cut(
      wpost.join(ids, Seq("id"), "left_semi"))
    val totals = ppost.groupBy("id").agg(sum("w").as("wt_total"))
    val common = pairs
      .join(ppost.select(col("id").as("id_a"), col("shingle"),
        col("w")), Seq("id_a"))
      .join(ppost.select(col("id").as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(sum("w").as("inter_w"))
    val res = pairs
      .join(common, Seq("id_a", "id_b"), "left")
      .join(totals.select(col("id").as("id_a"), col("wt_total").as("wa")),
        "id_a")
      .join(totals.select(col("id").as("id_b"), col("wt_total").as("wb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        coalesce(col("inter_w"), lit(0L)).as("inter_w"),
        (col("wa") + col("wb") - coalesce(col("inter_w"), lit(0L)))
          .as("union_w"))
      .withColumn("wsim_micro", expr("inter_w * 1000000 div union_w"))
    Checkpoints.sealAndRelease(res, post, wpost, ppost)
  }

  /** Distinct hashed-shingle postings (id, shingle₆₀) — the shared front of
    * both near-dup paths: one pass of the [[graft.functions.ShingleGenerator]]
    * UDTF (tokens evaluated once per doc, n-grams streamed out with no
    * shuffle and no per-row array blowup), then a relational `distinct()`.
    * The higher-order-function formulation (array transform + slice) ran
    * interpreted and re-evaluated the inlined token expression per lambda —
    * measured ~10× slower; a lead()-window form costs an extra shuffle.
    */
  private def shinglePostings(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame = {
    graft.functions.ShingleGenerator.register(
      org.apache.spark.sql.SparkSession.active)
    docs
      .select(col(idCol).as("id"),
        call_function(graft.functions.ShingleGenerator.name,
          tokens(col(textCol)), lit(shingleN)).as("s"))
      .select(col("id"), hash60(col("s")).as("shingle"))
      .distinct()
  }

  /** Candidate pairs (idCol_a < idCol_b) whose exact shingle-Jaccard ≥
    * `threshold`, generated by MinHash-LSH banding then verified exactly —
    * the scale path. Probabilistic recall: a pair at similarity s survives
    * banding with prob 1-(1-s^rows)^bands (≈1 for s≥0.9 at 12×4, with the
    * independent permutation family — see TextFns.PermConsts).
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      perms: Int = 48, bands: Int = 12): DataFrame = {
    val rows = perms / bands
    val hsig = docSignatures(docs, idCol, textCol, shingleN, perms)
    // The band explode and its self-join carry (band, key, id) ONLY: the
    // hashed-shingle arrays would otherwise ride the `bands`-way explode
    // through both shuffle sides (12× amplification of the heaviest column
    // at scale). They rejoin below, after the candidate set is deduplicated
    // to one row per pair, from the persisted one-row-per-doc `hs` relation.
    val buckets = bandKeys(hsig, bands, rows)
    val candIds = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sets = hsig.select(col("id"), col("hs"))
    candIds
      .join(sets.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("jaccard", round(jaccard(col("hs_a"), col("hs_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Default doc-count ceiling under which the per-doc set-size table is
    * broadcast in the inverted-index family: 2²⁰ (long, long) rows is tens
    * of MB serialized — comfortably shippable; beyond it the hint would
    * override Catalyst's own size logic with a corpus-sized relation.
    */
  val CountsBroadcastLimit: Long = 1L << 20

  /** The q94/q105 self-protection applied to the per-doc set-size table:
    * `counts` is one row per DOCUMENT — corpus-sized by definition — so an
    * unconditional broadcast hint is a driver/executor OOM at the 100 TB
    * posture. Probe the cardinality (one cheap agg over the
    * already-materialized postings) and hint the broadcast only under
    * `limit` rows; above it the hint is omitted and the set-size joins run
    * as ordinary shuffle joins on the pair keys the stream already carries
    * (AQE may still broadcast from real size stats). DedupSpec proves both
    * strategies return identical pairs.
    */
  private def countsJoinGuard(counts: DataFrame,
      limit: Long): DataFrame => DataFrame =
    if (counts.count() <= limit) df => broadcast(df) else identity

  /** Per-doc hashed shingle sets and MinHash signatures, both cut. Staged
    * as two pinned one-row-per-doc relations: higher-order functions run
    * interpreted (no codegen/CSE) and projection collapse inlines a
    * referenced column into EVERY lambda body — without the lineage
    * breaks, the hash array recomputes per permutation (48×/row) and the
    * signature per band key and join side (~24×). Checkpoints.cut, not
    * persist(): same lineage break + reuse, but nothing stays registered
    * in the session cache manager after the call — blocks are reclaimed
    * by the context cleaner once the result is dereferenced. Reliable
    * checkpoint() instead when graft.checkpoint.dir is set (cluster mode).
    */
  /** ONE materialized (id, hs, sig) frame per signing: per-doc hashed
    * shingle sets AND their MinHash signatures in a single cut. r21: the
    * old two-stage shape (an hs cut, then a sig cut reading it) paid a
    * second corpus-sized materialization pass — and carried the heavy hs
    * arrays through it — purely to stage an expression the first pass
    * could compute in place. Every caller needs both columns off the
    * same frame.
    */
  private def docSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, perms: Int): DataFrame =
    Checkpoints.cut(shinglePostings(docs, idCol, textCol, shingleN)
      .groupBy("id")
      .agg(collect_list(col("shingle")).as("hs"))
      .withColumn("sig", minHashSignatureFromHashes(
        transform(col("hs"), h => h % MinHashP), perms)))

  /** (id, band, key) band-bucket postings for a signature frame. Band key
    * = xxhash64 of the rows-per-band signature slice: a single long
    * equi-join key. Hash collisions only add candidate pairs, which the
    * exact-Jaccard verification filters — no correctness impact.
    */
  private def bandKeys(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)))))
        .as(Seq("band", "key")))

  /** At-rest MinHash-LSH near-dup index — the dedup-side sibling of the
    * IVF/PQ vector-index lifecycle (build once / append batches / probe
    * many): a 100 TB corpus cannot re-sign itself on every ingest, so the
    * band-bucket postings and per-doc hashed shingle sets live as
    * partitioned parquet and each daily batch signs only ITSELF.
    *
    * Layout: `path/buckets` = (id, key) partitioned by band (the probe's
    * equi-join side), `path/sets` = (id, hs) (the verification side),
    * `path/_graft_index` = kind `lsh` + (shingleN, perms, bands) — the
    * parameters are part of the index identity: a probe signed with
    * different parameters would silently miss everything, so they are
    * read back, never re-supplied.
    */
  def buildLshIndex(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, path: String, perms: Int = 48, bands: Int = 12): Unit = {
    require(perms % bands == 0, "bands must divide perms")
    val spark = docs.sparkSession
    val hsig = docSignatures(docs, idCol, textCol, shingleN, perms)
    bandKeys(hsig, bands, perms / bands).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("band").parquet(s"$path/buckets")
    hsig.select("id", "hs").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/sets")
    Similarity.writeIndexMeta(spark, path, "lsh",
      Seq(shingleN.toString, perms.toString, bands.toString))
    Checkpoints.release(hsig)
  }

  /** Incremental third of the lifecycle: sign ONLY the new documents with
    * the index's own stored parameters and append their band postings and
    * shingle sets. The existing corpus is never re-read, never re-signed.
    */
  def appendToLshIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      docs: DataFrame, idCol: String, textCol: String): Unit = {
    val Seq(shingleN, perms, bands) =
      Similarity.readIndexMeta(spark, path, "lsh").map(_.toInt)
    val hsig = docSignatures(docs, idCol, textCol, shingleN, perms)
    bandKeys(hsig, bands, perms / bands).write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("band").parquet(s"$path/buckets")
    hsig.select("id", "hs").write
      .mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$path/sets")
    Checkpoints.release(hsig)
  }

  /** Index maintenance (r19 directive #3): compact the LSH index's small
    * files. Daily [[appendToLshIndex]] batches land one file per batch in
    * each band directory and one per batch under `sets`; after a year
    * that is 365 files per band scanned by EVERY probe, and at 100 TB
    * scan cost is dominated by file count once files shrink below the FS
    * block size. [[Similarity.stagedSwap]] template per table — staging
    * dir + two renames, crash-safe (same concurrent-reader caveat). Row
    * content is copied verbatim, so probe results are identical
    * before/after and appends-then-compact ≡ one-shot build
    * (LshIndexSpec asserts both). Rewrite widths are size-derived
    * (ceil(bytes/128 MiB)): `buckets` range-partitions on (band, key) —
    * the partition column has only `bands` values, so keying the shuffle
    * by band alone would emit one monolithic file per band at any corpus
    * size — and `sets` hash-partitions on id. Returns (files before,
    * after) summed over both tables.
    */
  def compactLshIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int) = {
    Similarity.readIndexMeta(spark, path, "lsh")
    val (b1, a1) = Similarity.stagedSwap(spark, s"$path/buckets") { staging =>
      graft.sources.TableSink.writePartitioned(
        spark.read.parquet(s"$path/buckets")
          .repartitionByRange(Similarity.compactWidth(spark, s"$path/buckets"),
            col("band"), col("key")),
        staging, Seq("band"))
    }
    val (b2, a2) = Similarity.stagedSwap(spark, s"$path/sets") { staging =>
      spark.read.parquet(s"$path/sets")
        .repartition(Similarity.compactWidth(spark, s"$path/sets"), col("id"))
        .write.parquet(staging)
    }
    (b1 + b2, a1 + a2)
  }

  /** Probe: near-dup pairs (batch doc, indexed doc) with exact Jaccard ≥
    * `threshold`, candidates from the batch's band keys against the
    * at-rest bucket table. The batch side (a daily ingest, small next to
    * the corpus) is explicitly broadcast, so the corpus postings stream
    * map-side and never shuffle; the at-rest `sets` side joins the
    * deduplicated candidate list (AQE broadcasts it), so full shingle
    * sets of the corpus never move either. Recall is banding's
    * 1−(1−s^rows)^bands, the same contract as [[minHashLsh]].
    *
    * MUTABLE-SOURCE contract: the returned frame reads the index's
    * bucket/set files LAZILY (in local persist-cut mode
    * [[Checkpoints.sealAndRelease]] deliberately does not materialize).
    * A caller that will [[appendToLshIndex]] afterwards and still hold
    * this frame must snapshot it first (`Checkpoints.cut`) — otherwise a
    * later evaluation may probe the GROWN index (Spark's file-listing
    * cache decides, not this API) and return pairs the batch never saw
    * (exactly the daily-relabel composition bug q228 guards against).
    */
  def lshIndexedPairs(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val Seq(shingleN, perms, bands) =
      Similarity.readIndexMeta(spark, path, "lsh").map(_.toInt)
    val bhsig = docSignatures(batch, idCol, textCol, shingleN, perms)
    val probe = bandKeys(bhsig, bands, perms / bands)
    val idx = spark.read.parquet(s"$path/buckets")
    val cand = idx.as("c").join(broadcast(probe.as("b")),
        col("c.band") === col("b.band") && col("c.key") === col("b.key") &&
          col("c.id") =!= col("b.id"))
      .select(col("b.id").as("id_a"), col("c.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sets = spark.read.parquet(s"$path/sets")
    val out = cand
      .join(bhsig.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("jaccard", round(jaccard(col("hs_a"), col("hs_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    Checkpoints.sealAndRelease(out, bhsig)
  }

  /** Exact n-gram Jaccard pairs ≥ threshold via inverted-index self-join —
    * the gold standard the LSH path approximates (and, on this corpus,
    * matches exactly).
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      broadcastDocLimit: Long = CountsBroadcastLimit): DataFrame = {
    // Checkpoints.cut: both sides of the self-join read the posting list
    // from the materialized blocks instead of re-running the shingle
    // pipeline per side, and no cache-manager entry outlives the call.
    // Postings carry the 60-bit shingle hash, not the string: ~2× narrower
    // shuffle and long-vs-string join compares (injective on the corpus;
    // see hash60).
    val inv = Checkpoints.cut(shinglePostings(docs, idCol, textCol, shingleN))
    val counts = inv.groupBy("id").agg(count(lit(1)).as("n"))
    val guard = countsJoinGuard(counts, broadcastDocLimit)
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    // set sizes join AFTER the pair aggregation (size-guarded broadcast) so
    // the wide shingle-match stream stays (id_a, id_b) only
    pairs
      .join(guard(counts.select(col("id").as("id_a"), col("n").as("na"))), "id_a")
      .join(guard(counts.select(col("id").as("id_b"), col("n").as("nb"))), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Prefix-filtered exact n-gram Jaccard — the same output contract as
    * [[ngramJaccard]] (every pair with Jaccard ≥ `threshold`, exactly) at
    * a fraction of its join volume, via the prefix-filtering principle of
    * set-similarity joins (Chaudhuri, Ganti & Kaushik, ICDE 2006; Bayardo,
    * Ma & Srikant, WWW 2007; Xiao et al.'s PPJoin, WWW 2008):
    *
    * Order every document's shingle set by ONE global total order —
    * ascending document frequency, ties by shingle value — and index only
    * each document's first |S| − ⌊t·|S|⌋ + 1 shingles. The prefix lemma:
    * two sets with |A∩B| ≥ o sorted by a shared total order must collide
    * within their (|A|−o+1)- and (|B|−o+1)-prefixes, and J(A,B) ≥ t forces
    * o ≥ ⌈t·|A|⌉ — so no qualifying pair is ever missed (⌊·⌋ rather than
    * ⌈·⌉ lengthens the prefix by ≤1, buying immunity to float jitter in
    * t·n). Every candidate is then verified with the exact Jaccard, so
    * false candidates cost time, never correctness.
    *
    * Why it wins at scale: [[ngramJaccard]]'s self-join costs Σ_shingle
    * df² — unbounded in adversarial corpora, dominated by exactly the
    * boilerplate shingles every page shares. Rarest-first ordering pushes
    * those high-df shingles into suffixes that are never indexed: the
    * candidate cost collapses to Σ over PREFIX postings of df_prefix²,
    * and a shingle appearing in half the corpus generates zero candidate
    * pairs unless it is one of a document's rarest ~(1−t)·|S| shingles.
    * DedupSpec proves output equality with the unfiltered path and pins a
    * constructed boilerplate corpus where the candidate volume drops ~25×.
    *
    * Plan shape: one shuffle on the shingle for df, one per-document
    * window (bounded by document length — never corpus-wide) for the
    * rank, a prefix-only equi-join on the shingle, then the standard
    * full-set rejoin + exact verification. No broadcast of anything
    * corpus-sized; AQE handles the candidate-side joins from real stats.
    *
    * A fused POSITION filter (PPJoin §4's second stage) then prunes
    * candidates whose first-collision position bound
    * min(n_a−r_a, n_b−r_b)+1 cannot reach the required overlap
    * t/(1+t)·(n_a+n_b) — sound because prefixes are downward-closed in
    * the global order, so the smallest common shingle of any pair IS a
    * prefix collision and every common shingle sorts at-or-after it.
    * Pruned pairs never touch the full shingle sets.
    */
  def ngramJaccardPrefix(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    val inv = Checkpoints.cut(shinglePostings(docs, idCol, textCol, shingleN))
    val cand = prefixCandidatePairs(inv, threshold, positional = true)
    val hs = Checkpoints.cut(inv.groupBy("id")
      .agg(collect_list(col("shingle")).as("hs")))
    val out = cand
      .join(hs.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(hs.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("jaccard", round(jaccard(col("hs_a"), col("hs_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    Checkpoints.sealAndRelease(out, hs, inv)
  }

  /** Deduplicated candidate pairs from the rarest-first prefix index of a
    * postings frame, optionally pruned by the POSITION filter (PPJoin §4's
    * second stage) fused into the dedup aggregation: the collision with
    * the smallest global order has min rank on BOTH sides (within-doc rank
    * is monotone in the shared (df, shingle) total order), prefixes are
    * downward-closed in that order so the smallest COMMON shingle of any
    * pair is itself a prefix collision, and every common shingle sorts
    * at-or-after it — hence overlap ≤ min(n_a−r_a, n_b−r_b)+1 at that
    * first collision, while J ≥ t forces overlap ≥ t/(1+t)·(n_a+n_b).
    * Candidates whose bound cannot reach it are dropped before the full
    * shingle sets are ever joined back (− ε keeps the prune strictly
    * sound under float evaluation).
    */
  private def prefixCandidatePairs(inv: DataFrame, threshold: Double,
      positional: Boolean): DataFrame = {
    val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("id")
    // CUT (r22): the self-join below reads this frame on BOTH sides —
    // without the cut each side re-runs the df aggregation, the df join
    // and the two per-doc windows (the plan dump shows the whole chain
    // duplicated). One pinned prefix-postings frame, read twice.
    val prefix = Checkpoints.cut(inv.join(dfreq, "shingle")
      .withColumn("r",
        row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
      .withColumn("n", count(lit(1)).over(byDoc))
      .filter(col("r") <=
        col("n") - floor(lit(threshold) * col("n")) + lit(1))
      .select("id", "shingle", "r", "n"))
    // LENGTH filter (Arasu VLDB'06) fused into the join condition (r22):
    // J ≥ t forces min(n_a, n_b) ≥ t·max(n_a, n_b), so size-mismatched
    // collisions drop BEFORE the pair-aggregation shuffle. Post-agg it
    // adds nothing (the positional filter is strictly stronger — with
    // r ≥ 1, min(n−r)+1 ≤ min(n) — so output is provably unchanged);
    // the −ε slack keeps the prune sound under float evaluation, the
    // positional-filter discipline.
    val agg = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id") &&
          col("a.n") >= lit(threshold) * col("b.n") - lit(1e-9) &&
          col("b.n") >= lit(threshold) * col("a.n") - lit(1e-9))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(min(col("a.r")).as("ra"), min(col("b.r")).as("rb"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
    val kept =
      if (!positional) agg
      else agg.filter(
        least(col("na") - col("ra"), col("nb") - col("rb")) + lit(1) >=
          lit(threshold / (1 + threshold)) * (col("na") + col("nb")) -
            lit(1e-9))
    kept.select("id_a", "id_b")
  }

  /** Pair counts surviving the prefix stage alone vs prefix + position
    * filter — the spec's measurement hook for the second-stage prune.
    */
  private[graft] def positionalPruneCounts(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int, threshold: Double): (Long, Long) = {
    val inv = Checkpoints.cut(shinglePostings(docs, idCol, textCol, shingleN))
    val out = (prefixCandidatePairs(inv, threshold, positional = false).count(),
      prefixCandidatePairs(inv, threshold, positional = true).count())
    Checkpoints.release(inv)
    out
  }

  /** Candidate pair count of [[ngramJaccardPrefix]]'s prefix index vs the
    * full inverted index on the same corpus — the spec's measurement hook
    * for the Σdf² → Σdf_prefix² collapse (returns (prefixCandidates,
    * fullCandidates) as one-row aggregates, never materializing pairs).
    */
  private[graft] def prefixCandidateVolume(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int, threshold: Double): (Long, Long) = {
    val inv = Checkpoints.cut(shinglePostings(docs, idCol, textCol, shingleN))
    val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    def pairs(p: DataFrame): Long =
      p.groupBy("shingle").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)))
        .head().getLong(0) / 2
    val byDoc = Window.partitionBy("id")
    val prefix = inv.join(dfreq, "shingle")
      .withColumn("r",
        row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
      .withColumn("n", count(lit(1)).over(byDoc))
      .filter(col("r") <=
        col("n") - floor(lit(threshold) * col("n")) + lit(1))
      .select("id", "shingle")
    val out = (pairs(prefix), pairs(inv))
    Checkpoints.release(inv)
    out
  }

  /** Sorted-neighborhood near-dup blocking (Hernández & Stolfo, SIGMOD
    * 1995): rank the corpus by a cheap monotone key — text length, since
    * near-dups have near-equal lengths — and verify exact shingle-Jaccard
    * ONLY within a ±`window` neighborhood of that ranking. O(n·window)
    * candidate pairs BY CONSTRUCTION — the third blocking family next to
    * LSH (probabilistic bound) and the inverted index (exact, Σdf²):
    * deterministic and bounded, with recall limited to pairs the key
    * sorts near each other (the classic SNM trade; DedupSpec measures it
    * against the exact path on the real corpus).
    *
    * Scale posture: the rank is [[Packing.twoPhaseRank]] (exact global
    * order, no single-partition window), and the neighborhood join is a
    * banded equi-join on rank blocks of size `window` — each right row
    * probes its own and its previous block (q21's time-bucket pattern in
    * rank space), so candidates ride an equi-join carrying ids only; the
    * hashed shingle sets rejoin per surviving candidate.
    */
  def snmPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, window: Int, threshold: Double,
      buckets: Int = 32): DataFrame =
    snmPairsKeyed(docs, idCol, textCol, shingleN, window, threshold, buckets,
      Seq(length(col(textCol))))

  /** Multi-pass SNM — Hernández & Stolfo's actual prescription (SIGMOD'95
    * §4: "several independent runs … each time using a different key"):
    * one pass per INDEPENDENT sort key, candidate sets unioned BEFORE the
    * exact verification. A single key's neighborhood structurally misses
    * any near-dup pair the key does not sort together (DedupSpec pins a
    * constructed beyond-window miss for the length key); a second,
    * independent key gives such a pair a second chance to land adjacent,
    * at the same O(n·window) candidate cost per pass. Keys here: text
    * length (pass 1, = [[snmPairs]]) and the numeric encoding of the
    * first `prefixChars` characters (pass 2, [[prefixKey]]) — near-dups
    * that differ mid-document share their opening characters even when an
    * insertion shifted their lengths apart.
    */
  def snmPairsMultiPass(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, window: Int, threshold: Double,
      buckets: Int = 32, prefixChars: Int = 6): DataFrame =
    snmPairsKeyed(docs, idCol, textCol, shingleN, window, threshold, buckets,
      Seq(length(col(textCol)), prefixKey(col(textCol), prefixChars)))

  /** Order-preserving (for 7-bit text) numeric encoding of the first `n`
    * characters: Σ min(charcode, 127)·128^(n−1−i) over the space-padded
    * prefix. Stays under 2^(7n) — double-exact through the rank machinery
    * for n ≤ 7. Oracle portability (a SQL engine reproducing the key
    * byte-for-byte) holds for 7-bit text — the corpus contract here; on
    * non-ASCII input the key is still a deterministic function of the
    * prefix (the operator stays exact), but engines disagree on what
    * `ascii` of a multi-byte character is, so cross-engine replay and
    * strict lexicographic order both end at codepoint 127.
    */
  private[graft] def prefixKey(text: Column, n: Int): Column = {
    require(n > 0 && n <= 7, "prefix key packs 7-bit chars into a <2^53 long")
    (0 until n).map(i =>
        least(ascii(substring(rpad(text, n, " "), i + 1, 1)), lit(127))
          .cast("long") * (1L << (7 * (n - 1 - i))))
      .reduce(_ + _)
  }

  /** Unordered candidate id pairs within ±`window` of the exact (k, id)
    * ranking — one SNM pass over an (id, k) frame. Two-phase exact rank
    * (no single-partition window) + banded rank-block equi-join: each
    * right row probes its own and the previous rank block, so every pair
    * with 0 < pos_b − pos_a ≤ window meets exactly once and candidates
    * ride an equi-join carrying ids only.
    */
  private def snmCandidates(keyed: DataFrame, window: Int,
      buckets: Int): DataFrame =
    snmCandidatesDist(keyed, window, buckets).drop("dist")

  /** [[snmCandidates]] keeping the rank distance `dist = pos_b − pos_a ∈
    * [1, window]` on each candidate row. Because every pair with
    * 0 < pos_b − pos_a ≤ window meets exactly once, the `dist ≤ w` slice
    * of a `window = wmax` run IS the w-window candidate set for any
    * w ≤ wmax — what lets a recall-curve audit (q289) read every window
    * from ONE ranking pass.
    */
  private def snmCandidatesDist(keyed: DataFrame, window: Int,
      buckets: Int): DataFrame = {
    val ranked = Packing.twoPhaseRank(keyed, "k", buckets)
      .select(col("id"), col("pos"), expr(s"pos div $window").as("blk"))
    val left = ranked.select(col("id").as("ia"), col("pos").as("pa"),
      col("blk").as("probe"))
    val right = ranked.select(col("id").as("ib"), col("pos").as("pb"),
      explode(array(col("blk"), col("blk") - 1)).as("probe"))
    left.join(right, Seq("probe"))
      .filter(col("pb") > col("pa") && col("pb") <= col("pa") + window)
      .select(least(col("ia"), col("ib")).as("ia"),
        greatest(col("ia"), col("ib")).as("ib"),
        (col("pb") - col("pa")).as("dist"))
  }

  /** Single-pass windowed SNM pair table — [[snmPairs]] for EVERY window
    * w ≤ `maxWindow` at the cost of one: one length-key ranking pass at
    * `maxWindow`, each candidate tagged with its rank distance, ONE exact
    * Jaccard verification of the widest candidate set. For any
    * w ≤ maxWindow, `snmPairs(…, window = w, …)` ≡ the `dist ≤ w` slice
    * (each unordered pair meets exactly once with its unique rank
    * distance — positions are a total order — so slicing by dist
    * reproduces the w-window candidate set exactly; DedupSpec pins the
    * identity). The recall-curve planner (q289) reads its whole window
    * ladder from this one O(n·maxWindow) pass instead of paying one
    * ranking + verification per rung (r21: 3 passes → 1).
    *
    * Output: (id_a, id_b, dist, jaccard), jaccard ≥ `threshold`.
    */
  def snmPairsWithDist(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, maxWindow: Int, threshold: Double,
      buckets: Int = 32): DataFrame = {
    require(maxWindow > 0, "need a positive neighborhood window")
    val keyed = docs.select(col(idCol).cast("long").as("id"),
      coalesce(length(col(textCol)).cast("long"), lit(0L)).as("k"))
    if (keyed.head(1).isEmpty)
      return keyed.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0L).as("dist"), lit(0.0).as("jaccard")).limit(0)
    val cand = snmCandidatesDist(keyed, maxWindow, buckets)
    val hs = Checkpoints.cut(shinglePostings(docs, idCol, textCol, shingleN)
      .groupBy("id").agg(collect_list(col("shingle")).as("hs")))
    val out = cand
      .join(hs.select(col("id").as("ia"), col("hs").as("hs_a")), "ia")
      .join(hs.select(col("id").as("ib"), col("hs").as("hs_b")), "ib")
      .withColumn("jaccard", round(jaccard(col("hs_a"), col("hs_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("ia").as("id_a"), col("ib").as("id_b"), col("dist"),
        col("jaccard"))
    Checkpoints.sealAndRelease(out, hs)
  }

  /** [[snmCandidates]] for SEVERAL independent sort keys in ONE ranking
    * pass (r21): rows arrive key-tagged (g, id, k) — one per-GROUP
    * quantile probe (cuts computed per key; the keys live on wildly
    * different scales, so global cuts would collapse one key's whole
    * corpus into a single bucket and serialize its rank window), one
    * bucketed rank pipeline partitioned by (g, bucket), and ONE rank-block
    * equi-join keyed (g, probe). Per group the positions are exactly
    * [[Packing.twoPhaseRank]]'s (same (k, id) order, per-group offsets),
    * so the emitted pair set is exactly the UNION of the per-key
    * [[snmCandidates]] runs — at one pass's worth of jobs/exchanges
    * instead of one per key.
    */
  private def snmCandidatesTagged(tagged: DataFrame, window: Int,
      buckets: Int): DataFrame = {
    val bucketed =
      if (buckets <= 1) tagged.withColumn("b", lit(0L))
      else {
        val probs = (1 until buckets).map(_.toDouble / buckets)
        val cuts = tagged.groupBy("g").agg(
          percentile_approx(col("k").cast("double"), typedLit(probs),
            lit(10000)).as("__cuts"))
        tagged.join(broadcast(cuts), "g")
          .withColumn("b",
            (1 until buckets).map(i =>
              when(col("k") >= element_at(col("__cuts"), i), 1L)
                .otherwise(0L)).reduce(_ + _))
          .drop("__cuts")
      }
    val offsets = bucketed.groupBy("g", "b").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.partitionBy("g").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("g", "b", "off")
    val ranked = bucketed.join(broadcast(offsets), Seq("g", "b"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("g", "b").orderBy("k", "id"))
          .cast("long") - 1L + col("off"))
      .select(col("g"), col("id"), col("pos"),
        expr(s"pos div $window").as("blk"))
    val left = ranked.select(col("g"), col("id").as("ia"),
      col("pos").as("pa"), col("blk").as("probe"))
    val right = ranked.select(col("g"), col("id").as("ib"),
      col("pos").as("pb"),
      explode(array(col("blk"), col("blk") - 1)).as("probe"))
    left.join(right, Seq("g", "probe"))
      .filter(col("pb") > col("pa") && col("pb") <= col("pa") + window)
      .select(least(col("ia"), col("ib")).as("ia"),
        greatest(col("ia"), col("ib")).as("ib"))
  }

  private def snmPairsKeyed(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, window: Int, threshold: Double, buckets: Int,
      keys: Seq[Column]): DataFrame = {
    require(window > 0, "need a positive neighborhood window")
    require(keys.nonEmpty, "need at least one sort key")
    val keyed = docs.select(
      col(idCol).cast("long").as("id") +:
        keys.zipWithIndex.map { case (k, i) =>
          coalesce(k.cast("long"), lit(0L)).as(s"k$i") }: _*)
    if (keyed.head(1).isEmpty)
      return keyed.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("jaccard")).limit(0)
    // union the per-key candidate neighborhoods, dedup to one row per
    // unordered pair, THEN verify once — a pair found by both passes pays
    // one Jaccard, and the verification cost is |∪ candidates|, not Σ.
    // r21: the per-key passes fused into ONE tagged ranking pass
    // (snmCandidatesTagged) — same pair set, one pass's worth of
    // jobs/exchanges instead of one per key. The tagged frame is cut
    // (multi-pass only): the rank pipeline reads it three times (quantile
    // probe, bucketing, rank join) and each lazy re-read would otherwise
    // re-scan the source and recompute every key expression.
    val tagged = if (keys.size == 1) None
      else Some(Checkpoints.cut(
        keys.indices.map(i => keyed.select(lit(i.toLong).as("g"),
          col("id"), col(s"k$i").as("k"))).reduce(_ unionAll _)))
    val cand = tagged
      .map(snmCandidatesTagged(_, window, buckets))
      .getOrElse(snmCandidates(keyed.select(col("id"), col("k0").as("k")),
        window, buckets))
      .dropDuplicates("ia", "ib")
    val hs = Checkpoints.cut(shinglePostings(docs, idCol, textCol, shingleN)
      .groupBy("id").agg(collect_list(col("shingle")).as("hs")))
    val out = cand
      .join(hs.select(col("id").as("ia"), col("hs").as("hs_a")), "ia")
      .join(hs.select(col("id").as("ib"), col("hs").as("hs_b")), "ib")
      .withColumn("jaccard", round(jaccard(col("hs_a"), col("hs_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("ia").as("id_a"), col("ib").as("id_b"), col("jaccard"))
    tagged match {
      case Some(t) => Checkpoints.sealAndRelease(out, hs, t)
      case None => Checkpoints.sealAndRelease(out, hs)
    }
  }

  /** Asymmetric near-dup: containment(A in B) = |shingles(A)∩shingles(B)|
    * / |shingles(A)| (Broder 1997's resemblance companion). Jaccard misses
    * the small-doc-inside-big-doc case by construction — a fully quoted
    * 100-word doc inside a 10k-word aggregation page has Jaccard ≈ 0.01
    * but containment 1.0 — and quotation/aggregation pages are a real
    * dedup class in web corpora (Lee et al. ACL'22 §4 discuss substring
    * overlap for exactly this reason). Same inverted-index shape as
    * [[ngramJaccard]] — one shingle-hash shuffle, pair aggregation, set
    * sizes broadcast-joined AFTER the aggregation — but the pair stream is
    * DIRECTED (a ≠ b, not a < b): containment is per-direction, and both
    * directions of one unordered pair can legitimately pass (mutual
    * near-dup). Output: (contained_id, container_id, containment).
    */
  def ngramContainment(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      broadcastDocLimit: Long = CountsBroadcastLimit): DataFrame = {
    val inv = Checkpoints.cut(shinglePostings(docs, idCol, textCol, shingleN))
    // ONE-SIDED prefix filter (r22, the ngramJaccardPrefix principle
    // transposed to the asymmetric score): containment(A in B) ≥ t means
    // |A∩B| ≥ ⌈t·n_a⌉, which bounds ONLY the contained side — sort A's
    // shingles rarest-first (the shared (df, shingle) total order) and A
    // must collide with B inside its first n_a − ⌊t·n_a⌋ + 1 shingles,
    // else at most ⌈t·n_a⌉ − 1 shared shingles remain (⌊·⌋ lengthens the
    // prefix by ≤1 — float-jitter immunity, the Jaccard-path stance).
    // The container side has NO length bound (a 100-word quote inside a
    // 10k-word page qualifies), so it stays fully indexed. Candidate
    // volume collapses from Σdf² to Σ df_prefix·df with the corpus's
    // boilerplate shingles pushed out of every prefix; the exact
    // verification below makes false candidates cost time, never
    // correctness.
    val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("id")
    val prefix = inv.join(dfreq, "shingle")
      .withColumn("r",
        row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
      .withColumn("n", count(lit(1)).over(byDoc))
      .filter(col("r") <=
        col("n") - floor(lit(threshold) * col("n")) + lit(1))
      .select("id", "shingle")
    // directed candidates (contained-side prefix × full index),
    // canonicalized unordered so each pair's sets are joined back ONCE
    val cand = prefix.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("ia"),
        greatest(col("a.id"), col("b.id")).as("ib"))
      .distinct()
    // exact verification on the full shingle sets; both directed rows
    // come out of ONE pass over the verified pair (explode of a 2-struct
    // array), not a self-union — a union would put the candidate subtree
    // in the plan twice
    val hs = Checkpoints.cut(inv.groupBy("id")
      .agg(collect_list(col("shingle")).as("hs")))
    val out = cand
      .join(hs.select(col("id").as("ia"), col("hs").as("hs_a")), "ia")
      .join(hs.select(col("id").as("ib"), col("hs").as("hs_b")), "ib")
      .withColumn("inter",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double"))
      .select(explode(array(
        struct(col("ia").as("contained_id"), col("ib").as("container_id"),
          round(col("inter") / size(col("hs_a")), 4).as("containment")),
        struct(col("ib").as("contained_id"), col("ia").as("container_id"),
          round(col("inter") / size(col("hs_b")), 4).as("containment"))))
        .as("r"))
      .select(col("r.contained_id").as("contained_id"),
        col("r.container_id").as("container_id"),
        col("r.containment").as("containment"))
      .filter(col("containment") >= threshold)
    Checkpoints.sealAndRelease(out, hs, inv)
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every positional word
    * `k`-gram, slide a window of `w` consecutive hashes, and keep each
    * window's minimum. The paper's guarantee: any shared passage of at
    * least w+k−1 tokens shares a selected fingerprint REGARDLESS of where
    * it sits in either document — the alignment-independence a
    * fixed-stride rolling fingerprint (q40) lacks — at density ≈ 2/(w+1)
    * of the full k-gram set.
    *
    * Variant pinned here: leftmost-minimum tie rule, carried by ONE packed
    * key h·2²⁰ + pos whose numeric window-min IS the lexicographic
    * (hash, position) minimum — portable to any engine with window frames
    * (the q144 oracle replays it verbatim). Positions are bounded to 2²⁰
    * per document (the key stays < 2⁵², exact through doubles); documents
    * with fewer than `w` k-grams contribute their global minimum (one
    * fingerprint), never zero.
    *
    * Scale posture: a map-side explode of positional k-gram hashes, one
    * PER-DOCUMENT window pass (both frames share the id shuffle — never a
    * corpus-wide window), one distinct. The selected set is the at-rest
    * overlap index a plagiarism/near-dup pipeline equi-joins on, exactly
    * like the shingle inverted index at 2/(w+1) the postings.
    */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k > 0 && w > 0, "need a positive k-gram size and window")
    val P = 1L << 20
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
    val grams = toks.filter(size(col("t")) >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), size(col("t")) - (k - 1)),
        i => hash32(concat_ws(" ", slice(col("t"), i, lit(k))))))
        .as(Seq("pos", "h")))
      .withColumn("key", col("h") * lit(P) + col("pos"))
    val byDoc = Window.partitionBy("id")
    val sliding = byDoc.orderBy("pos").rowsBetween(-(w - 1), 0)
    grams
      .withColumn("sel", min(col("key")).over(sliding))
      .withColumn("mx", max(col("pos")).over(byDoc))
      .filter(col("pos") >= w - 1 || col("pos") === col("mx"))
      .select(col("id"), (col("sel") % P).as("pos"),
        expr(s"sel div $P").as("fp"))
      .distinct()
  }

  /** At-rest winnowing fingerprint index — the MOSS deploy shape for
    * [[winnow]] (Schleimer et al. §5 store document fingerprints in an
    * inverted index keyed by the fingerprint): build once on the standing
    * corpus, append each ingest batch (which fingerprints only ITSELF),
    * probe with a batch to find overlapping corpus documents. Same
    * lifecycle contract as [[buildLshIndex]]: `path/fps` = the DISTINCT
    * (id, fp) posting set, `path/_graft_index` = kind `winnow` + (k, w)
    * — the parameters are index identity, read back on append/probe,
    * never re-supplied (a probe winnowed with different k/w silently
    * misses everything).
    */
  def buildWinnowIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, path: String): Unit = {
    winnow(docs, idCol, textCol, k, w).select("id", "fp").distinct()
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/fps")
    Similarity.writeIndexMeta(docs.sparkSession, path, "winnow",
      Seq(k.toString, w.toString))
  }

  /** Incremental third of the winnow lifecycle: fingerprint ONLY the new
    * documents with the index's stored (k, w) and append. The standing
    * corpus is never re-read, never re-fingerprinted.
    */
  def appendToWinnowIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, docs: DataFrame, idCol: String, textCol: String): Unit = {
    val Seq(k, w) = Similarity.readIndexMeta(spark, path, "winnow").map(_.toInt)
    winnow(docs, idCol, textCol, k, w).select("id", "fp").distinct()
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/fps")
  }

  /** Index maintenance (r19 directive #3): compact the winnow index's
    * posting files — [[appendToWinnowIndex]] lands one file per batch
    * under `fps`, and every probe scans them all. Same
    * [[Similarity.stagedSwap]] template as [[compactLshIndex]] (staging +
    * two renames, crash-safe, maintenance-window caveat); rows copied
    * verbatim ⇒ probes identical before/after and appends-then-compact ≡
    * one-shot build (each append fingerprints only its own NEW ids with
    * the stored (k, w), so the union of per-batch distinct posting sets
    * IS the one-shot distinct set — WinnowIndexSpec asserts it). Rewrite
    * width is size-derived, hash-keyed on fp (the probe's join key, so a
    * bucket-pruned future reader stays possible). Returns (files before,
    * after).
    */
  def compactWinnowIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int) = {
    Similarity.readIndexMeta(spark, path, "winnow")
    Similarity.stagedSwap(spark, s"$path/fps") { staging =>
      spark.read.parquet(s"$path/fps")
        .repartition(Similarity.compactWidth(spark, s"$path/fps"), col("fp"))
        .write.parquet(staging)
    }
  }

  /** Probe: (batch doc, indexed doc) pairs sharing ≥ `minShared` DISTINCT
    * selected fingerprints — winnowing's overlap guarantee makes this the
    * shared-passage detector (any common run of ≥ w+k−1 tokens shares a
    * fingerprint). The batch side is explicitly broadcast (a daily ingest
    * is small next to the corpus), so the at-rest posting set streams
    * map-side and never shuffles; the only exchange is the pair
    * aggregation, sized by true matches. Shares [[lshIndexedPairs]]'
    * MUTABLE-SOURCE contract: the frame reads `path/fps` lazily — snapshot
    * with `Checkpoints.cut` before a later append if it must stay stable.
    */
  def winnowIndexedMatches(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, textCol: String,
      minShared: Int): DataFrame = {
    val Seq(k, w) = Similarity.readIndexMeta(spark, path, "winnow").map(_.toInt)
    val bfp = winnow(batch, idCol, textCol, k, w).select("id", "fp").distinct()
    spark.read.parquet(s"$path/fps").as("c")
      .join(broadcast(bfp.as("b")),
        col("c.fp") === col("b.fp") && col("c.id") =!= col("b.id"))
      .groupBy(col("b.id").as("id_a"), col("c.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Bounded longest-shared-span audit (r19 stretch #7) — the
    * suffix-array "longest duplicated substring" question (Lee et al.,
    * ACL 2022) restated for the candidate pairs an index already found:
    * for each (id_a, id_b) of `candidates`, the maximum n ∈ `levels`
    * (ascending, e.g. 8/16/32/64 tokens) such that the two documents
    * share an exact contiguous n-token span — 0 when even the smallest
    * level misses. [[spanScrub]] asks "which fixed-n spans repeat
    * corpus-wide"; this grades HOW LONG the overlap is per pair — the
    * severity axis of the span-dedup family (a 64-token shared span is
    * verbatim boilerplate; an 8-token one may be a common phrase).
    *
    * Probe shape, monotone by construction: a shared n-gram contains a
    * shared m-gram for every m < n, so levels probe ASCENDING and each
    * level fingerprints only the documents of pairs still alive at the
    * previous level — the staged binary-probe narrowing. Per level: one
    * distinct (id, hash60(n-gram)) posting build over the alive docs
    * (map-side explode, one combine shuffle), a self-equi-join on the
    * gram hash restricted to alive candidate pairs (leftsemi), never a
    * corpus cross. At 100 TB the level-8 postings ride the candidate
    * pairs' doc set — index-output-sized, not corpus-sized — and every
    * later level shrinks with the surviving pairs.
    *
    * Output: (id_a, id_b, max_shared_n), one row per candidate pair.
    */
  def longestSharedSpanLevel(docs: DataFrame, idCol: String,
      textCol: String, candidates: DataFrame,
      levels: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    // distinct: a duplicated candidate row would otherwise duplicate its
    // output row (and its probe work) — pair frames from joins aren't
    // guaranteed row-unique. least/greatest normalization (ADVICE r20):
    // the level probe's self-join enforces a.id < b.id, so a (b, a)-
    // oriented candidate would silently probe nothing and report
    // max_shared_n = 0, breaking the bracket = max{n ≤ exact} law for
    // non-memo callers; normalizing up front makes orientation a
    // non-contract (identity for already-oriented pairs).
    val cand = Checkpoints.cut(candidates
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b")).distinct())
    // the candidate pairs' documents, extracted from the corpus ONCE —
    // every level's shrinking alive set is a subset, so later levels
    // semi-join this cut instead of re-scanning the corpus
    val candDocs = Checkpoints.cut(docs.join(
        cand.select(col("id_a").as("id"))
          .union(cand.select(col("id_b").as("id"))).distinct(),
        docs(idCol) === col("id"), "leftsemi")
      .select(col(idCol), col(textCol)))
    val cuts = scala.collection.mutable.ArrayBuffer[DataFrame](cand, candDocs)
    val tagged = scala.collection.mutable.ArrayBuffer[DataFrame](
      cand.withColumn("lvl", lit(0)))
    var alive = cand
    for (n <- levels.sorted) {
      if (!alive.isEmpty) {
        val ids = alive.select(col("id_a").as("id"))
          .union(alive.select(col("id_b").as("id"))).distinct()
        val sub = candDocs.join(ids, candDocs(idCol) === ids("id"), "leftsemi")
        // the post cut is load-bearing (re-measured r21): the self-join
        // plans one side as a BroadcastExchange, so exchange reuse does
        // NOT fire and an uncut posting subtree would compute twice
        val post = Checkpoints.cut(shinglePostings(sub, idCol, textCol, n))
        val hit = Checkpoints.cut(
          post.as("a").join(post.as("b"),
              col("a.shingle") === col("b.shingle") &&
                col("a.id") < col("b.id"))
            .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
            .distinct()
            .join(alive, Seq("id_a", "id_b"), "leftsemi"))
        Checkpoints.release(post)
        cuts += hit
        tagged += hit.withColumn("lvl", lit(n))
        alive = hit
      }
    }
    val out = tagged.reduce(_.unionByName(_))
      .groupBy("id_a", "id_b").agg(max("lvl").as("max_shared_n"))
    Checkpoints.sealAndRelease(out, cuts.toSeq: _*)
  }

  /** EXACT longest shared token run per candidate pair — the precise
    * answer [[longestSharedSpanLevel]] brackets: for each (id_a, id_b)
    * the length (in tokens) of the longest contiguous token sequence the
    * two documents share, 0 if no token matches. Classic diagonal
    * run-length formulation of longest common substring: join the two
    * docs' (pos, token) streams on token equality; matches lying on one
    * diagonal d = pos_a − pos_b at CONSECUTIVE pos_a form a shared run,
    * found with the rownumber-gap grouping (pos_a − row_number per
    * (pair, d) is constant exactly along a consecutive run).
    *
    * Cost contract: the token-match join is Σ_tok occ_a(tok)·occ_b(tok)
    * PER PAIR — quadratic in a stopword's occurrence counts — so this is
    * the EVAL-SLICE precision tool (candidates are an index's output,
    * the q286 contract); corpus-scale span triage uses the binary
    * bracket ([[longestSharedSpanLevel]]), whose probes ride distinct
    * n-gram postings, and reserves this for the survivors it cares
    * about. Law (spec- and gate-checkable): bracket(levels) =
    * max{n ∈ levels : n ≤ exact}, because a shared L-token run contains
    * a shared n-gram for every n ≤ L.
    *
    * Output: (id_a, id_b, longest_shared_span), one row per candidate.
    */
  def exactLongestSharedSpan(docs: DataFrame, idCol: String,
      textCol: String, candidates: DataFrame): DataFrame = {
    // distinct: a duplicated candidate row would duplicate its output row
    val cand = Checkpoints.cut(candidates.select("id_a", "id_b").distinct())
    val ids = cand.select(col("id_a").as("id"))
      .union(cand.select(col("id_b").as("id"))).distinct()
    val toks = Checkpoints.cut(docs
      .join(ids, docs(idCol) === ids("id"), "leftsemi")
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok"))))
    val m = cand
      .join(toks.as("a"), col("a.id") === col("id_a"))
      .join(toks.as("b"),
        col("b.id") === col("id_b") && col("a.tok") === col("b.tok"))
      .select(col("id_a"), col("id_b"),
        (col("a.pos") - col("b.pos")).as("d"), col("a.pos").as("pa"))
    // along one diagonal, pa determines pb, so (pair, d, pa) is unique
    // and pa − row_number is constant exactly on consecutive-pa runs
    val runs = m
      .withColumn("grp", col("pa") - row_number().over(
        Window.partitionBy("id_a", "id_b", "d").orderBy("pa")))
      .groupBy("id_a", "id_b", "d", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("id_a", "id_b").agg(max("len").as("longest_shared_span"))
    val out = cand.join(runs, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("longest_shared_span"), lit(0L))
          .as("longest_shared_span"))
    Checkpoints.sealAndRelease(out, cand, toks)
  }

  /** Cross-corpus contamination check — the decontamination step of an LLM
    * training pipeline: for each document of `probe` (the benchmark/eval
    * set), every document of `corpus` sharing at least `minShared` distinct
    * word-`shingleN`-grams. Same inverted-index shape as [[ngramJaccard]]
    * but across two corpora, so the join cost is Σ_shingle df_corpus·df_probe
    * — linear in the corpus when the probe set is small (the realistic
    * decontamination regime: benchmarks are tiny next to training data).
    * Output: (train_id, eval_id, n_shared), one shuffle on the shingle +
    * one pair aggregation.
    */
  def contamination(corpus: DataFrame, probe: DataFrame, idCol: String,
      textCol: String, shingleN: Int, minShared: Int): DataFrame = {
    val tr = shinglePostings(corpus, idCol, textCol, shingleN)
    val ev = shinglePostings(probe, idCol, textCol, shingleN)
    // the probe side is the BENCHMARK set — small by the operator's own
    // contract (that is what makes the cost linear in the corpus) — so
    // broadcast it explicitly: the corpus-side posting list then never
    // shuffles (map-side join + partial pair agg), which at 100 TB is the
    // difference between one full-corpus exchange and none. Catalyst
    // cannot infer this on its own: the posting list is a derived frame
    // with no size stats.
    tr.as("t").join(broadcast(ev.as("e")), col("t.shingle") === col("e.shingle"))
      .groupBy(col("t.id").as("train_id"), col("e.id").as("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** 32-bit SimHash per row: weighted (by token count) sign-sum of each
    * token-hash bit. Distributed formulation: explode → per-(doc,token)
    * counts → cross with the 32 bit positions → two hash-aggregations.
    * Portable: token hash is [[hash32]], so the oracle recomputes it.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tc = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", hash32(col("tok")))
    // one conditional sum per bit (32 codegen'd agg columns in a single
    // hash aggregation) instead of exploding tokens × 32 bit positions —
    // same result, no 32× row blowup through the shuffle
    val bitSums = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"s$b"))
    val perDoc = tc.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 32).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    perDoc.select(col("id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, candidates
    * by pigeonhole banding: split the 32-bit sketch into maxHamming+1
    * blocks; any pair within distance must agree on ≥1 whole block, so an
    * equi-join on (block_idx, block_value) has perfect recall.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    val blockBits = 32 / nBlocks
    val sh = simHash(docs, idCol, textCol)
    val blocks = sh.select(col("id"), col("simhash"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"))
      .withColumn("bval",
        call_function("shiftright", col("simhash"), col("blk") * blockBits)
          .bitwiseAND((1L << blockBits) - 1))
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Incremental (cross-batch) exact dedup: of `batch`, keep only the
    * documents whose `keyExpr` fingerprint does NOT appear in `history` —
    * the daily-ingest step that admits yesterday's-unseen documents into a
    * growing corpus.
    *
    * The result is EXACT, but the history never joins against the whole
    * batch: a bloom filter over the history fingerprints (built by one
    * distributed aggregate, `expectedItems`/`fpp`-sized) splits the batch
    * map-side into guaranteed-new documents (bloom says absent — no false
    * negatives, so absent IS new; these pass through with NO shuffle) and
    * maybe-seen documents (the true duplicates plus an `fpp` sliver of
    * false positives), and only that sliver pays the exact anti-join. At a
    * mostly-new 100 TB daily batch the anti-join's left side shrinks from
    * the whole batch to ≈ dup-rate + fpp of it.
    *
    * Self-protecting (the q94 pattern): the single filter lives on the
    * driver and ships to every task, so its size is a real budget — if the
    * optimal bit array for (`expectedItems`, `fpp`) exceeds
    * `maxBloomBytes`, the operator switches to the SHARDED formulation
    * ([[incrementalNewSharded]]: one filter per key-hash shard, no task
    * ever holding more than `maxBloomBytes` of filter) instead of shipping
    * a multi-GB filter or building an undersized one whose fpp quietly
    * approaches 1 and with it the anti-join it was meant to avoid. A
    * multi-billion-key history therefore still prefilters — the regime
    * where skipping the prefilter costs the most.
    */
  def incrementalNew(history: DataFrame, batch: DataFrame, keyExpr: Column,
      expectedItems: Long, fpp: Double = 0.01,
      maxBloomBytes: Long = 256L << 20): DataFrame = {
    val spark = batch.sparkSession
    val hFp = history.select(md5(keyExpr).as("fingerprint"))
    val bFp = batch.withColumn("fingerprint", md5(keyExpr))
    // no usable size estimate — the filter cannot be allocated honestly
    if (expectedItems <= 0)
      return bFp.join(hFp, Seq("fingerprint"), "left_anti")
    // stat.bloomFilter NPEs on a zero-row aggregate; an empty history
    // means the whole batch is new anyway
    if (hFp.head(1).isEmpty) return bFp
    // optimal bits m = -n ln p / (ln 2)²; the create() below allocates this
    val optimalBytes =
      math.ceil(-expectedItems * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong / 8
    if (optimalBytes > maxBloomBytes) {
      val shards = math.min(1L << 20,
        (optimalBytes + maxBloomBytes - 1) / maxBloomBytes).toInt
      val (sureNew, verified) =
        incrementalNewSharded(hFp, bFp, shards, expectedItems, fpp)
      return sureNew.unionByName(verified)
    }
    val bloom = hFp.stat.bloomFilter("fingerprint", expectedItems, fpp)
    val might = graft.functions.BloomFns.mightContain(
      spark, col("fingerprint"), bloom)
    val sureNew = bFp.filter(!might)
    val verified = bFp.filter(might).join(hFp, Seq("fingerprint"), "left_anti")
    sureNew.unionByName(verified)
  }

  /** Partitioned-bloom prefilter — the multi-billion-key regime where one
    * filter exceeds the per-task shipping budget. One filter per key-hash
    * shard, each sized for `expectedItems`/`shards` keys:
    *
    *  - BUILD: history fingerprints shuffle ONCE by shard (narrow 32-char
    *    rows) and each reduce task folds only its own shards' filters.
    *    Deliberately `mapGroups`, not an `Aggregator`: map-side partial
    *    aggregation would materialize EVERY shard's partial filter in
    *    EVERY map task — the full filter's footprint per task, exactly
    *    what sharding exists to avoid.
    *  - PROBE: batch fingerprints cogroup with the filter table on the
    *    shard key, so each task deserializes exactly one shard's filter
    *    and streams its rows through it. A shard with no history rows has
    *    no filter row — its whole batch slice is new by definition.
    *  - Bloom-positive fingerprints (the true duplicates plus an `fpp`
    *    sliver) are the ONLY rows that pay the exact anti-join against
    *    history; bloom-negative rows are guaranteed new (no false
    *    negatives) and never touch history again — they anti-join only the
    *    tiny maybe-set, which AQE broadcasts.
    *
    * Exact regardless of sizing: an underestimated `expectedItems` only
    * saturates the filters (fpp rises, more rows pay the verify join),
    * never loses a duplicate. Returns (sure-new, verified) so the spec can
    * assert the guaranteed-new slice's plan anti-joins the cogroup output,
    * not the history relation.
    */
  private[graft] def incrementalNewSharded(hFp: DataFrame, bFp: DataFrame,
      shards: Int, expectedItems: Long,
      fpp: Double): (DataFrame, DataFrame) = {
    val spark = bFp.sparkSession
    import spark.implicits._
    require(shards > 0, "need at least one shard")
    val perShard = math.max(64L, (expectedItems + shards - 1) / shards)
    def withShard(df: DataFrame) =
      df.select(col("fingerprint"),
          pmod(xxhash64(col("fingerprint")), lit(shards.toLong)).cast("int")
            .as("shard"))
        .as[(String, Int)]
    val filters = withShard(hFp).groupByKey(_._2).mapGroups { (shard, it) =>
      val bf = org.apache.spark.util.sketch.BloomFilter.create(perShard, fpp)
      it.foreach(t => bf.putString(t._1))
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      (shard, bos.toByteArray)
    }
    val maybe = withShard(bFp.select("fingerprint")).groupByKey(_._2)
      .cogroup(filters.groupByKey(_._1)) { (_, fps, fl) =>
        if (!fl.hasNext) Iterator.empty
        else {
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(fl.next()._2))
          fps.collect { case (fp, _) if bf.mightContainString(fp) => fp }
        }
      }.toDF("fingerprint")
    val sureNew = bFp.join(maybe, Seq("fingerprint"), "left_anti")
    val verified = bFp.join(maybe, Seq("fingerprint"), "left_semi")
      .join(hFp, Seq("fingerprint"), "left_anti")
    (sureNew, verified)
  }

  /** Cross-document duplicated-SPAN scrubbing — the intra-document
    * complement to whole-doc dedup: segment each document's token stream
    * into non-overlapping `spanTokens`-token spans, count how many DISTINCT
    * documents each span's content appears in corpus-wide, drop every
    * occurrence of any span shared by ≥ 2 documents, and reassemble the
    * surviving spans in order. This is the scalable restatement of
    * suffix-array substring dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL 2022) and of CCNet's paragraph-level
    * dedup — boilerplate shared across pages vanishes while each document's
    * unique prose survives. Intra-document repetition is deliberately KEPT
    * (distinct-doc count, not occurrence count): that signal belongs to the
    * q96 Gopher rules, and scrubbing it here would double-count.
    *
    * Scale posture: spans explode map-side; the corpus-wide count shuffles
    * the 60-bit span HASH (not span text) once with map-side combine; one
    * hash-keyed join back (AQE broadcasts the count side when small); the
    * reassembly is a single per-document hash aggregation whose
    * `array_sort(collect_list(...))` buffers only that document's kept
    * spans. No stage holds more than one document's text in one place —
    * text never shuffles except sliced into its own spans.
    *
    * Output: one row per input document — (id, n_spans, dropped_spans,
    * dropped_tokens, kept_tokens, clean_text). Zero-token documents pass
    * through with zeros and empty clean_text.
    */
  /** Quality-aware dedup survivor selection: given a near-dup pair frame
    * (`id_a`, `id_b` — any of the family's outputs) and a per-document
    * score frame, keep the HIGHEST-scoring member of every duplicate
    * cluster instead of the arbitrary lowest-id one. This is the curation
    * rule real pipelines want — near-dup clusters mix a clean original
    * with truncated/boilerplate-wrapped copies, and min-id keeps whichever
    * was crawled first, not whichever is best.
    *
    * Semantics: connected components over the pair graph (shared with
    * q77/q150) label each cluster; the survivor is argmax(score), ties
    * broken by LOWEST id so the rule is total. Documents in no pair are
    * their own singleton cluster and always survive.
    *
    * Scale posture: the argmax is a hash aggregation (`max_by` over a
    * (score, −id) struct) with map-side partial combine — no per-cluster
    * window partition, so one giant cluster (the adversarial all-dups
    * corpus) cannot serialize onto one task. The survivor frame is
    * cluster-cardinality-sized; AQE broadcasts it back onto the doc-keyed
    * join when small. Component labeling cost is the q77 machinery
    * (iterative min-label propagation, checkpoint-staged).
    *
    * Output: one row per scored document —
    * (idCol, cluster, score, survivor_id, kept).
    */
  def survivorsByScore(pairs: DataFrame, scored: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val cl = Components.connectedComponents(pairs, "id_a", "id_b")
    val withCl = scored
      .select(col(idCol).cast("long").as("id"), col(scoreCol).as("score"))
      .join(cl.withColumnRenamed("id", "cid"), col("id") === col("cid"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("id")))
      .select("id", "cluster", "score")
    val surv = withCl.groupBy("cluster").agg(
      max_by(col("id"), struct(col("score"), (-col("id")).as("nid")))
        .as("survivor_id"),
      count(lit(1)).as("n_members"))
    withCl.join(surv, Seq("cluster"))
      .select(col("id").as(idCol), col("cluster"), col("score"),
        col("survivor_id"), col("n_members"),
        (col("id") === col("survivor_id")).as("kept"))
  }

  def spanScrub(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    require(spanTokens > 0, "need positive span length")
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
    val segs = toks.filter(size(col("t")) > 0)
      .select(col("id"), col("t"), explode(sequence(lit(0),
        floor((size(col("t")) + lit(spanTokens - 1)) /
          lit(spanTokens.toDouble)).cast("int") - 1)).as("i"))
      .select(col("id"), col("i").cast("int").as("i"),
        concat_ws(" ",
          slice(col("t"), col("i") * spanTokens + 1, lit(spanTokens))).as("seg"),
        size(slice(col("t"), col("i") * spanTokens + 1, lit(spanTokens)))
          .cast("long").as("stok"))
      .withColumn("h", hash60(col("seg")))
    val counts = segs.groupBy("h").agg(countDistinct(col("id")).as("ndocs"))
    val scrubbed = segs.join(counts, "h")
      .groupBy("id").agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("dropped_spans"),
        sum(when(col("ndocs") > 1, col("stok")).otherwise(0L)).as("dropped_tokens"),
        sum(when(col("ndocs") === 1, col("stok")).otherwise(0L)).as("kept_tokens"),
        array_join(transform(array_sort(collect_list(
          when(col("ndocs") === 1, struct(col("i"), col("seg"))))),
          x => x.getField("seg")), " ").as("clean_text"))
    toks.select("id").join(scrubbed, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dropped_spans"), lit(0L)).as("dropped_spans"),
        coalesce(col("dropped_tokens"), lit(0L)).as("dropped_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
