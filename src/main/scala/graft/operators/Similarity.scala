package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k (the exact baseline) and an IVF-bucketed approximate variant
  * (the scale path). North-star LLM-pipeline closure — the reference has no
  * vector surface.
  *
  * Determinism contract: all arithmetic is float→double cast per element,
  * then multiplied and summed left-to-right — the exact op order DuckDB's
  * list_transform/list_sum uses, so cosine values are bit-comparable before
  * the final rounding.
  *
  * 100 TB posture: the query side is broadcast (small by construction);
  * candidates never shuffle their vectors for the brute-force path — the
  * cosine is computed map-side in the scan stage, and only (qid, nid, cos)
  * triples (not vectors) enter the top-k exchange. Top-k is two-phase:
  * per-partition row_number prunes to k·partitions rows before the final
  * per-query window — no global sort of the full pair set.
  *
  * `isQuery` contract (uniform across every entry point): the predicate is
  * applied to the CALLER's frame, before any internal rename — write it
  * against the columns you passed in (`col("vec_id") < 20`, or any other
  * column of your frame). It never sees internal names like `id`/`v`/`nrm`,
  * so an internal rename or name collision cannot silently rebind it.
  */
object Similarity {

  /** Σ aᵢ·bᵢ with per-element double casts, left-to-right — the codegen'd
    * native expression (graft.functions.FloatDotProduct); same accumulation
    * order as the interpreted `aggregate(zip_with(...))` form it replaced.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(
      org.apache.spark.sql.SparkSession.active, a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-norm vectors (no direction, no signal) score 0 against
    * everything instead of dividing by zero — under Spark 4's default ANSI
    * mode a bare division would otherwise turn ONE malformed embedding in
    * a corpus scan into a job-killing DIVIDE_BY_ZERO (FilteredAnnSpec's
    * zero-vector case pins the tolerant behavior). The guard compares
    * norms already computed for the division; on well-formed data the
    * result is bit-identical to the bare quotient, so the oracles are
    * untouched.
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    when(normA === 0.0 || normB === 0.0, lit(0.0))
      .otherwise(dot(a, b) / (normA * normB))

  /** Exact cosine top-k: for each query row (filtered by `isQuery`), the k
    * nearest other rows. Output: (query_id, rank, neighbor_id, cos).
    */
  def bruteForceTopK(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int): DataFrame = {
    val withNorm = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val q = vecs.filter(isQuery) // caller's frame — see the isQuery contract
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val pairs = withNorm.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("v"), col("qn"), col("nrm")), 6))
      .select("query_id", "id", "cos")
    twoPhaseTopK(pairs, k)
  }

  /** Margin-scored mutual-nearest-neighbor pair mining (Artetxe &
    * Schwenk, ACL 2019's ratio margin): a pair (a, b) is emitted when b
    * is a's cosine-nearest neighbor AND a is b's — the mutual-top-1
    * criterion bitext/near-dup miners use to kill hub vectors — and its
    * score is the cosine RELATIVE to both endpoints' k-NN neighborhoods,
    * margin = cos(a,b) / ((avgₖ(a) + avgₖ(b)) / 2): a 0.8 cosine means
    * nothing in a dense hub region and everything in a sparse one. Each
    * avg divides by the endpoint's ACTUAL neighbor count (≤ k — a block
    * smaller than k+1 vectors yields shorter neighborhoods), so the
    * avg-of-top-k semantics holds at every block size.
    *
    * Universe contract: neighborhoods are computed WITHIN the frame the
    * caller passes — at 100 TB that frame is one LSH/IVF block (the
    * operator runs per candidate block, the q108/q127 stance), or a
    * bounded evaluation slice. All-pairs cost is the caller's choice of
    * block size, never a corpus cross.
    *
    * Determinism: cosines are 6dp-rounded before ranking (the q37
    * stance); the k-NN sum folds over the (cos, id)-sorted list
    * left-to-right, so the oracle's `list_sum(list(... ORDER BY ...))`
    * replays it bit-for-bit; margin is one add + one divide + round.
    */
  def mutualTopKMargin(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    // cut: the frame is bounded by the universe contract (a candidate
    // block / eval slice) and feeds both pair sides — one scan, not three
    val v = Checkpoints.cut(
      vecs.select(col(idCol).as("ia"), col(vecCol).as("va"))
        .withColumn("na", l2norm(col("va"))))
    val b = v.select(col("ia").as("ib"), col("va").as("vb"),
      col("na").as("nb"))
    val ranked = v.join(broadcast(b), col("ia") =!= col("ib"))
      .withColumn("cos",
        round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
      .select("ia", "ib", "cos")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("ia").orderBy(col("cos").desc, col("ib"))))
      .filter(col("rnk") <= k)
    val top1 = ranked.filter(col("rnk") === 1).select("ia", "ib", "cos")
    // Σ of each id's top-k cosines, folded over the value-sorted list so
    // float addition order is pinned (see determinism note above) — plus
    // the ACTUAL neighbor count: a block with fewer than k+1 vectors
    // sums fewer than k cosines, and dividing by k there would overstate
    // the margin against the documented avg-of-top-k semantics
    // (ADVICE r17). With full neighborhoods and k a power of two the
    // count-aware form is bit-identical to 2k·cos/(ska+skb) — exact
    // power-of-two scalings commute with IEEE rounding.
    val sumk = ranked.groupBy("ia").agg(
      aggregate(array_sort(collect_list(struct(col("cos"), col("ib")))),
        lit(0.0), (acc, s) => acc + s.getField("cos")).as("sk"),
      count(lit(1)).as("ck"))
    val out = top1.as("t")
      .join(top1.select(col("ia").as("ib"), col("ib").as("ia2")),
        Seq("ib")).filter(col("ia2") === col("ia") && col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"), col("cos"))
      .join(sumk.select(col("ia").as("id_a"), col("sk").as("ska"),
        col("ck").as("cka")), "id_a")
      .join(sumk.select(col("ia").as("id_b"), col("sk").as("skb"),
        col("ck").as("ckb")), "id_b")
      .withColumn("margin", round(col("cos") /
        ((col("ska") / col("cka") + col("skb") / col("ckb")) / lit(2.0)),
        6))
      .select("id_a", "id_b", "cos", "margin")
    Checkpoints.sealAndRelease(out, v)
  }

  /** Two-phase per-query top-k over (query_id, id, cos): local prune to k
    * per (query, partition), then the final per-query window — only
    * k·partitions rows reach the last exchange, never a global sort.
    */
  private def twoPhaseTopK(pairs: DataFrame, k: Int): DataFrame = {
    val local = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("cos").desc, col("id"))
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id"))
    pairs
      .withColumn("_lrn", row_number().over(local)).filter(col("_lrn") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("cos"))
  }

  /** Binary 1-bit scalar quantization words for a float-vector column:
    * bit j−1 of word w is sign(v[32w + j] > 0), 32 dims per long word,
    * packed by a DOUBLING fold (bits enter high-to-low, acc·2 + bit) so
    * no variable-distance shift is needed and every word stays in
    * [0, 2³²) — no sign/overflow games in either engine. Exposed for the
    * spec's naive cross-check.
    */
  private[graft] def packSignWords(vecCol: String): Column = expr(
    s"""transform(sequence(0, (size($vecCol) - 1) div 32),
          w -> aggregate(sequence(32, 1, -1), 0L,
            (acc, j) -> acc * 2L + IF(w * 32 + j <= size($vecCol)
                AND element_at($vecCol, CAST(w * 32 + j AS INT)) > 0,
              1L, 0L)))""")

  /** Binary sign-quantized Hamming top-k with exact cosine rerank — the
    * 1-bit compression rung of the ANN ladder (q99's int8 is the 4×
    * memory lever; sign binarization is the 32× one, the "binary
    * quantization" recipe vector stores ship for first-pass retrieval):
    * each 64-float vector collapses to two 32-bit words, candidate
    * generation runs entirely in the compressed domain (XOR + popcount
    * per word pair — memory-bandwidth arithmetic, no floats), and only
    * the per-query `shortlist` Hamming-nearest rows are reranked with
    * the exact float cosine.
    *
    * Determinism: the shortlist boundary orders by (hamming, id) and the
    * rerank by (6dp-rounded cos, id) — both total orders, so the oracle
    * replays bit-for-bit (the q37 rounding stance). Scale shape: the
    * query side broadcasts; the corpus streams map-side emitting only
    * (query_id, id, hamming) into the two-phase top-shortlist windows
    * (per-partition heaps first — corpus vectors never shuffle); the
    * rerank joins the queries×shortlist candidate list (broadcast) back
    * to the corpus vectors, so full floats move only for candidates.
    *
    * Output: (query_id, rank, neighbor_id, hamming, cos), rank 1..k by
    * exact cosine within the shortlist.
    */
  def binaryHammingTopK(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, "the rerank pool must cover the output k")
    val coded = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("words", packSignWords("v"))
      .select("id", "words")
    val qc = vecs.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qwords", packSignWords("qv"))
      .select("query_id", "qwords")
    val pairs = coded.join(broadcast(qc), col("id") =!= col("query_id"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(qwords, words, (x, y) -> bit_count(x ^ y)), 0, (a, b) -> a + b)"))
      .select("query_id", "id", "hamming")
    val localW = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("hamming"), col("id"))
    val globalW = Window.partitionBy("query_id")
      .orderBy(col("hamming"), col("id"))
    val cand = pairs
      .withColumn("_lrn", row_number().over(localW))
      .filter(col("_lrn") <= shortlist)
      .withColumn("_rn", row_number().over(globalW))
      .filter(col("_rn") <= shortlist)
      .select("query_id", "id", "hamming")
    val cv = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val qv = vecs.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val rank = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("id"))
    cv.join(broadcast(cand), "id").join(broadcast(qv), "query_id")
      .withColumn("cos",
        round(cosine(col("qv"), col("v"), col("qn"), col("nrm")), 6))
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("hamming"), col("cos"))
  }

  /** Exact-moment PCA of a float-vector column — the classical spectral
    * read of an embedding corpus (intrinsic dimensionality, anisotropy,
    * whitening basis; Jolliffe, Principal Component Analysis):
    * distributed work computes ONLY the exact integer moments (the
    * [[graft.functions.GramAggregator]] second-moment triangle + the
    * per-dim micro-unit first moments — one map-side-combined pass
    * each), and the d×d eigenproblem is solved ON THE DRIVER by cyclic
    * Jacobi — at d = 64 that is a 4096-double problem, the one piece of
    * PCA that never belongs on the cluster. 100 TB posture: rows stream
    * through two combinable aggregates; nothing corpus-sized ever
    * shuffles or collects (the collected frames are d(d+1)/2 and d
    * rows).
    *
    * Determinism: the covariance enters as exact integers (micro-unit
    * grid), Jacobi sweeps cyclically in fixed (p, q) order with a fixed
    * convergence threshold, eigenpairs sort by (eigenvalue desc, then
    * original index), and each vector is sign-fixed (largest-|loading|
    * component positive, ties by lowest dim) — so the output is
    * bit-reproducible run to run (GoldenHashSpec pins it; no SQL engine
    * can replay a Jacobi sweep, hence rows-only at the driver).
    *
    * Output: (component 1..topK, dim 1..d, loading, eigenvalue) with
    * loading/eigenvalue raw doubles (callers round for display);
    * eigenvalues are of the COVARIANCE in original float units.
    */
  def principalComponents(vecs: DataFrame, vecCol: String,
      topK: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    require(topK >= 1, "need at least one component")
    val ga = udaf(graft.functions.GramAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val g = vecs.filter(col(vecCol).isNotNull)
      .agg(ga(col(vecCol)).as("g")).head()
    val cells = g.getStruct(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val n = g.getStruct(0).getLong(1)
    require(n > 1, "PCA needs at least two vectors")
    val d = cells.map(_._2).max
    val sums = vecs.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("d0", "x")))
      .groupBy((col("d0") + 1).cast("int").as("dim"))
      .agg(sum(round(col("x").cast("double") * lit(1e6)).cast("long"))
        .as("s"))
      .as[(Int, Long)].collect().toMap
    // covariance in original units: (n·G_ij − S_i·S_j) / (n² · 1e12) —
    // numerator exact integer-derived, one double division per cell
    val c = Array.ofDim[Double](d, d)
    for ((i, j, gij) <- cells) {
      val num = BigDecimal(BigInt(n) * BigInt(gij) -
        BigInt(sums(i)) * BigInt(sums(j)))
      val v = (num / (BigDecimal(n) * BigDecimal(n) * BigDecimal(1e12)))
        .toDouble
      c(i - 1)(j - 1) = v
      c(j - 1)(i - 1) = v
    }
    val (evals, evecs) = jacobiEigen(c)
    val order = evals.indices.sortBy(i => (-evals(i), i)).take(topK)
    val rows = order.zipWithIndex.flatMap { case (ei, rank) =>
      val vec = Array.tabulate(d)(r => evecs(r)(ei))
      // sign fix: the largest-|loading| component positive, ties by dim
      val lead = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      val s = if (vec(lead) < 0) -1.0 else 1.0
      vec.indices.map(r =>
        (rank + 1, r + 1, s * vec(r), evals(ei)))
    }
    rows.toDF("component", "dim", "loading", "eigenvalue")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — fixed
    * (p, q) sweep order, convergence when the off-diagonal Frobenius
    * mass falls under 1e-14 × the diagonal scale (deterministic: every
    * float op happens in one fixed order). Returns (eigenvalues,
    * eigenvector COLUMNS aligned with them). */
  private def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- (i + 1) until d) s += a(i)(j) * a(i)(j)
      s
    }
    def scale(): Double = {
      var s = 1e-300
      for (i <- 0 until d) s += a(i)(i) * a(i)(i)
      s
    }
    var sweep = 0
    while (off() > 1e-14 * scale() && sweep < 100) {
      for (p <- 0 until d; q <- (p + 1) until d if a(p)(q) != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val cs = 1.0 / math.sqrt(t * t + 1.0)
        val sn = t * cs
        for (k <- 0 until d) {
          val (akp, akq) = (a(k)(p), a(k)(q))
          a(k)(p) = cs * akp - sn * akq
          a(k)(q) = sn * akp + cs * akq
        }
        for (k <- 0 until d) {
          val (apk, aqk) = (a(p)(k), a(q)(k))
          a(p)(k) = cs * apk - sn * aqk
          a(q)(k) = sn * apk + cs * aqk
        }
        for (k <- 0 until d) {
          val (vkp, vkq) = (v(k)(p), v(k)(q))
          v(k)(p) = cs * vkp - sn * vkq
          v(k)(q) = sn * vkp + cs * vkq
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Hard-negative mining for contrastive training (the DPR/SimCSE
    * recipe, Karpukhin et al. EMNLP 2020 §3.2): for each query row, the
    * `k` most-similar rows with a DIFFERENT `labelCol` — the negatives
    * close enough to the decision boundary to actually move a contrastive
    * loss, where random negatives are mostly trivial. Exact brute-force
    * formulation: the label inequality composes into the same
    * query-broadcast blocked join as [[bruteForceTopK]] (the corpus
    * streams map-side and never shuffles its vectors; only the tiny query
    * set broadcasts), and the per-query top-k is the two-phase window. At
    * 100 TB, swap the pair source for an indexed ANN candidate frame and
    * post-filter labels — the candidates-then-filter composition the
    * filtered-search path (q126) already exercises; this operator is the
    * exact oracle that composition is measured against. Rows with a NULL
    * label never pair (the inequality is null-rejecting on both sides) —
    * an unlabeled vector is neither query nor negative.
    */
  def hardNegatives(vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, isQuery: Column, k: Int): DataFrame = {
    val corpus = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
        col(labelCol).as("lbl"))
      .withColumn("nrm", l2norm(col("v")))
    val q = vecs.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("qlbl"))
      .withColumn("qn", l2norm(col("qv")))
    val pairs = corpus.join(broadcast(q),
        col("id") =!= col("query_id") && col("lbl") =!= col("qlbl"))
      .withColumn("cos",
        round(cosine(col("qv"), col("v"), col("qn"), col("nrm")), 6))
      .select("query_id", "id", "cos")
    twoPhaseTopK(pairs, k)
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions with a
    * deterministic ±1/√outDim sign matrix (Achlioptas, JCSS 2003:
    * database-friendly random projections — sign matrices carry the same
    * JL distance-preservation guarantee as Gaussians at a fraction of the
    * compute). The matrix is DERIVED, never stored: sign(j,i) = parity of
    * the portable 32-bit md5 hash of "seed:j:i" — any engine (and the
    * q145 oracle) regenerates it bit-identically, so a 100 TB re-run or a
    * cross-system consumer needs no side model file, and two corpora
    * projected with the same seed land in the same space.
    *
    * Execution: `outDim` codegen'd [[dot]] columns against literal sign
    * vectors — map-side only, ZERO shuffle, left-to-right accumulation
    * (the oracle replays the exact float→double order). This is the
    * embedding-compression step before ANN/clustering: 64→16 dims is 4×
    * less shuffle volume for every downstream pair join at a bounded
    * cosine distortion (SimilaritySpec measures it on the real corpus).
    * Output: (vec_id, dim, value) — one row per projected coordinate,
    * rounded to 6 dp.
    */
  def randomProjection(vecs: DataFrame, idCol: String, vecCol: String,
      outDim: Int, seed: String, dKnown: Int = -1): DataFrame = {
    require(outDim > 0, "need a positive target dimension")
    if (vecs.head(1).isEmpty)
      return vecs.select(col(idCol).cast("long").as("vec_id"),
        lit(0).as("dim"), lit(0.0).as("value")).limit(0)
    val d = if (dKnown > 0) dKnown
      else vecs.select(max(size(col(vecCol)))).head().getInt(0)
    val scale = math.sqrt(outDim.toDouble)
    val comps = (0 until outDim).map { j =>
      val signs = Array.tabulate(d)(i =>
        if (portableHash32(s"$seed:$j:$i") % 2 == 0) 1.0f else -1.0f)
      struct(lit(j).as("dim"),
        round(dot(col("v"), lit(signs)) / scale, 6).as("value"))
    }
    vecs.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .select(col("vec_id"), explode(array(comps: _*)).as("c"))
      .select(col("vec_id"), col("c.dim").as("dim"), col("c.value").as("value"))
  }

  /** Per-query retrieval-evaluation metrics — the measurement half a
    * retrieval pipeline needs beside its indexes (and the feedback loop
    * that tunes nProbe/refine/banding): given a ranking (query_id, rank,
    * neighbor_id) and a relevance set (query_id, doc_id), compute
    * hits@k, recall@k (hits / n_rel), MRR@k (1 / first hit rank, 0 when
    * no hit) and binary-gain nDCG@k per query.
    *
    * Scale posture: one equi-join of the top-k ranking against the
    * relevance set (both bounded: k rows per query, n_rel per query) and
    * one per-query aggregation — never touches the corpus the ranking
    * came from. Float portability: DCG sums run left-to-right over the
    * rank-sorted term array (an `aggregate` over `array_sort`, the same
    * discipline as the cosine oracles), so a SQL oracle replays the
    * accumulation order exactly; zero terms add exactly.
    */
  def retrievalMetrics(ranking: DataFrame, rels: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, "need positive k")
    val marked = ranking.filter(col("rank") <= k)
      .join(rels.select(col("query_id"), col("doc_id").as("neighbor_id"))
          .withColumn("rel", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val nRel = rels.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    marked.groupBy("query_id").agg(
        sum(col("rel")).as("hits"),
        min(when(col("rel") === 1, col("rank"))).cast("int").as("first_hit"),
        // (rank, term) structs sorted by rank ⇒ the DCG accumulation order
        // is the rank order on both engines, not collect_list's partition
        // order
        array_sort(collect_list(struct(col("rank"),
          (when(col("rel") === 1, lit(1.0) / log2(col("rank") + lit(1.0)))
            .otherwise(lit(0.0))).as("term")))).as("tr"))
      .join(nRel, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("dcg", aggregate(col("tr"), lit(0.0),
        (acc, x) => acc + x.getField("term")))
      .withColumn("idcg", when(col("n_rel") > 0,
        aggregate(sequence(lit(1), least(col("n_rel"), lit(k.toLong)).cast("int")),
          lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + lit(1.0))))
        .otherwise(lit(0.0)))
      .select(col("query_id"), col("n_rel"), col("hits"),
        col("first_hit"),
        when(col("n_rel") > 0,
          round(col("hits").cast("double") / col("n_rel"), 6)).as("recall_at_k"),
        when(col("first_hit").isNotNull,
          round(lit(1.0) / col("first_hit"), 6)).otherwise(lit(0.0)).as("mrr"),
        when(col("idcg") > 0.0, round(col("dcg") / col("idcg"), 6)).as("ndcg"))
  }

  /** Driver-side twin of [[graft.functions.TextFns.hash32]] (first 8 md5
    * hex chars, base-16) — the same portable hash, computed in Scala for
    * plan-literal derivation.
    */
  private def portableHash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: each input ranking
    * contributes 1/(rrfK + rank) per (query, doc), summed across
    * rankings, fused top-k by score. Rank-based, so heterogeneous score
    * scales (BM25 vs cosine vs quantized cosine) fuse without
    * calibration; rrfK = 60 is the paper's constant. Deterministic given
    * deterministic inputs: scores are rounded to 6 dp BEFORE ranking and
    * ties break on neighbor_id, so the fused order is engine-portable
    * (q140 hash-matches a full DuckDB oracle).
    *
    * Scale posture: inputs are already per-query top-k frames (bounded:
    * Σ k_i candidates per query), so the fuse is one hash-agg plus a
    * per-query window over ≤ Σ k_i rows — never touches the corpus.
    * Inputs must carry (query_id, rank, neighbor_id).
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    val tagged = rankings
      .map(_.select(col("query_id"), col("rank"), col("neighbor_id")))
      .reduce(_ unionByName _)
    val scored = tagged.groupBy("query_id", "neighbor_id")
      .agg(round(sum(lit(1.0) / (lit(rrfK) + col("rank"))), 6).as("rrf"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("rrf"))
  }

  /** Int8-quantized brute-force cosine top-k — the compressed-domain
    * variant of [[bruteForceTopK]]: vectors are max-abs scalar-quantized
    * map-side ([[graft.functions.Int8Quantize]], one codegen'd pass) to
    * integer-valued floats, so every pair dot is integer-exact and the
    * whole ranking is reproducible bit-for-bit from the quantization
    * formula alone. At 100 TB this is the 4× memory/bandwidth lever for
    * embedding search (int8 at rest; staged as floats here to reuse the
    * codegen'd dot); recall vs. the float ranking is asserted in
    * SimilaritySpec. Zero vectors (amax = 0) are dropped, mirroring the
    * oracle's `amax > 0` guard.
    */
  def quantizedTopK(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    // quantize IN PLACE of the vector column, keeping every other caller
    // column, so isQuery still resolves against the caller's namespace
    val q = vecs.withColumn(vecCol,
        graft.functions.VectorExpressions.quantizeInt8(spark, col(vecCol)))
      .filter(exists(col(vecCol), _ =!= lit(0f)))
    bruteForceTopK(q, idCol, vecCol, isQuery, k)
  }

  /** IVF (inverted-file) approximate top-k: vectors are bucketed by nearest
    * of `nCentroids` seed centroids (deterministically: the rows with the
    * lowest ids); each query probes its `nProbe` nearest centroid buckets
    * only. Trades recall for a `nProbe/nCentroids` scan fraction — the
    * standard ANN scale path when brute force no longer fits.
    * Approximate ⇒ driver rows-only check; recall vs. brute force is
    * asserted in the ScalaTest spec.
    */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val seeds = base.orderBy("id").limit(nCentroids)
      .select(col("id").as("cid"), col("v").as("cv"))
    ivfTopKWith(vecs, idCol, vecCol, isQuery, k, nProbe, seeds)
  }

  /** Lloyd's k-means over the vector column — IVF centroid training.
    * Deterministic: seeds are the k lowest-id vectors, assignment ties
    * break on cid, and the elementwise-mean UDAF
    * ([[graft.functions.CentroidAggregator]]) does partial+final merge so
    * only one vector per (bucket, partition) shuffles. Each round is one
    * broadcast assign + one agg; lineage cut per round via
    * [[Checkpoints.cut]] (iterative frames otherwise double their logical
    * plan per iteration), with superseded rounds released.
    * Output: (cid, cv float-array) for [[ivfTopKWith]].
    */
  def kmeansCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    val centroidOf = udaf(graft.functions.CentroidAggregator)
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    // The centroid set is the MODEL — k·d floats, bounded by construction
    // (same category as BPE's vocab-sized driver state) — so each round
    // collects it to the driver and the next round's plan is flat: corpus
    // scan × a local literal relation. No per-round lineage cuts, no
    // broadcast exchange over checkpointed blocks; the per-round
    // expressions are unchanged, so the trained values are bit-identical
    // to the former cut-per-round loop.
    val seeds = base.orderBy("id").limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
    var centRows = seeds.collect()
    var centSchema = seeds.schema
    (1 to iters).foreach { _ =>
      if (centRows.nonEmpty) {
        val cf = localFrame(spark, centRows, centSchema)
          .select(col("cid"), transform(col("cv"), _.cast("float")).as("cv"))
          .withColumn("cn", l2norm(col("cv")))
        val wA = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid"))
        val assigned = base.crossJoin(broadcast(cf))
          .withColumn("csim", cosine(col("v"), col("cv"), col("nrm"), col("cn")))
          .withColumn("crn", row_number().over(wA)).filter(col("crn") === 1)
          .select(col("cid"), col("v"))
        val next = assigned.groupBy("cid").agg(centroidOf(col("v")).as("cv"))
        centRows = next.collect()
        centSchema = next.schema
      }
    }
    localFrame(spark, centRows, centSchema)
      .select(col("cid"), transform(col("cv"), _.cast("float")).as("cv"))
  }

  /** A driver-held model (centroids, codebook) as a local literal
    * relation: broadcasting it costs no job and plans over it stay flat.
    */
  private def localFrame(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private def normCentroids(centroids: DataFrame): DataFrame =
    centroids.select(col("cid"), col("cv")).withColumn("cn", l2norm(col("cv")))

  /** Nearest-centroid assignment of every corpus vector — the pass a
    * materialized index exists to amortize. Broadcast NL join against the
    * k-row centroid frame; ties break on cid.
    */
  private def assignToBuckets(base: DataFrame, cents: DataFrame,
      meta: Seq[String] = Nil): DataFrame = {
    // rank-1 window, NOT a max-struct aggregation: Spark 4 rewrites the
    // rn=1 filter into WindowGroupLimit (bounded per-group top-1 pushed
    // before the exchange — no full sort of the n·k exploded join),
    // whereas max(struct(..)) over a struct falls back to SortAggregate,
    // which DOES sort all n·k rows twice (measured slower here)
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("csim").desc, col("cid"))
    base.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("v"), col("cv"), col("nrm"), col("cn")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("id") +: col("v") +: col("nrm") +:
        col("cid").as("bucket") +: meta.map(col): _*)
  }

  /** Each query's nProbe nearest centroid buckets: (query_id, qv, qn, bucket). */
  private def probeBuckets(queries: DataFrame, cents: DataFrame,
      nProbe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("psim").desc, col("cid"))
    queries.crossJoin(broadcast(cents))
      .withColumn("psim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid").as("bucket"))
  }

  /** Probed-bucket scan → (query_id, rank, neighbor_id, cos) top-k. */
  private def topKOverBuckets(assigned: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    val cand = assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("v"), col("qn"), col("nrm")), 6))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id"))
    cand
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("cos"))
  }

  /** IVF probe/scan against a supplied centroid table (cid, cv). Inline
    * form: the assignment pass re-runs per invocation — fine for one-shot
    * queries; a probe-many workload should [[buildIvfIndex]] once and
    * [[ivfTopKIndexed]] against it.
    */
  def ivfTopKWith(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nProbe: Int, centroids: DataFrame): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val cents = normCentroids(centroids)
    val queries = vecs.filter(isQuery) // caller's frame — isQuery contract
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    topKOverBuckets(assignToBuckets(base, cents),
      probeBuckets(queries, cents, nProbe), k)
  }

  /** Build-once half of the IVF lifecycle: run the nearest-centroid
    * assignment pass ONCE and persist it as a bucket-partitioned parquet
    * table (`path/buckets`, directory-keyed by `bucket`) plus the centroid
    * table (`path/centroids`). At 100 TB the assignment pass — a full
    * corpus scan against the centroid broadcast — dominates repeated
    * queries; materializing it turns every later query batch into a read
    * of `nProbe/nCentroids` of the index directories (partition pruning
    * makes the scan fraction physical, not just logical).
    */
  def buildIvfIndex(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, path: String, metaCols: Seq[String] = Nil): Unit = {
    val base = vecs.select(
      (col(idCol).as("id") +: col(vecCol).as("v") +: metaCols.map(col)): _*)
      .withColumn("nrm", l2norm(col("v")))
    graft.sources.TableSink.writePartitioned(
      assignToBuckets(base, normCentroids(centroids), metaCols),
      s"$path/buckets", Seq("bucket"))
    centroids.select(col("cid"), col("cv")).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/centroids")
    writeIndexMeta(vecs.sparkSession, path, "ivf", metaCols)
  }

  // ------------------------------------------------------------------
  // Index metadata: a tiny `_graft_index` file beside the parquet dirs
  // records the index KIND and its metadata-column list EXPLICITLY, so (a)
  // append validates against what the index was BUILT with instead of
  // inferring "any column not in the internal set" — a future internal
  // column can never be misclassified as user metadata — and (b) probing
  // or appending to a path that holds no index fails with a domain
  // message, not a parquet read error. Format: line 1 = kind, one metadata
  // column name per following line (column names cannot contain newlines).

  private[operators] def indexMetaPath(path: String) = new Path(s"$path/_graft_index")

  private[operators] def writeIndexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, kind: String, metaCols: Seq[String]): Unit = {
    val p = indexMetaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((kind +: metaCols).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[operators] def readIndexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, expectKinds: String*): Seq[String] = {
    val p = indexMetaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no graft index at $path (missing ${p.getName}) — build one with " +
        "buildIvfIndex/buildPqIndex/buildLshIndex before appending or probing")
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val text = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    val lines = text.split("\n", -1).toSeq
    require(expectKinds.contains(lines.head),
      s"index at $path is kind '${lines.head}', expected " +
        expectKinds.mkString("one of ", "/", ""))
    lines.tail.filter(_.nonEmpty)
  }

  /** Incremental third of the lifecycle: assign ONLY the new vectors
    * against the saved (frozen) centroids and append them to the bucket
    * table — the daily-ingest path. The existing corpus is never
    * re-scanned: bucket membership depends only on the centroids, so
    * append-then-probe is exactly a full rebuild over the union (spec-
    * asserted). Retrain centroids and [[buildIvfIndex]] afresh only when
    * drift degrades recall — that cadence is an offline decision, not a
    * per-ingest cost.
    */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newVecs: DataFrame, idCol: String, vecCol: String): Unit = {
    // carry exactly the metadata columns the index was BUILT with — the
    // recorded list, not schema inference, so internal layout columns can
    // never be misclassified as user metadata. Appended rows missing a
    // recorded column would read back null and silently fall out of every
    // filtered search; validate up front with a domain message instead.
    val metaCols = readIndexMeta(spark, path, "ivf")
    val missing = metaCols.filterNot(newVecs.columns.contains)
    require(missing.isEmpty,
      s"index at $path was built with metadata columns $metaCols; the " +
        s"appended frame lacks ${missing.mkString(", ")}")
    val cents = normCentroids(spark.read.parquet(s"$path/centroids"))
    val base = newVecs.select(
      (col(idCol).as("id") +: col(vecCol).as("v") +: metaCols.map(col)): _*)
      .withColumn("nrm", l2norm(col("v")))
    graft.sources.TableSink.writePartitioned(
      assignToBuckets(base, cents, metaCols), s"$path/buckets", Seq("bucket"),
      mode = org.apache.spark.sql.SaveMode.Append)
  }

  /** Index maintenance: compact the bucket table's small files. Daily
    * [[appendToIvfIndex]] batches land one file per batch per bucket
    * directory, and at 100 TB scan cost is dominated by file count once
    * files shrink below the FS block size. One shuffle hash-keyed by
    * `bucket` puts each bucket wholly in one task → one output file per
    * directory; the rewrite goes to a sibling staging dir and is swapped
    * in with two renames — CRASH-safe (a reader never sees a half-WRITTEN
    * table, and a crashed compact leaves the live table untouched), but
    * not concurrent-reader-safe: between the two renames the buckets path
    * is briefly absent, and a probe that listed files just before the
    * swap can lose them to the retired-dir delete — on object stores,
    * where "rename" is a copy, the window widens further. Run compaction
    * in a maintenance window, or front the path with a manifest/table
    * format when probes cannot pause. Probe results are identical
    * before/after (vectors, norms and codes round-trip parquet exactly —
    * spec-asserted). Returns (parquet files before, after).
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int) = {
    // layout-agnostic over both bucket-partitioned index kinds: (id, v,
    // nrm, meta…) IVF rows and (id, codes, meta…) IVF-PQ rows compact the
    // same way — one shuffle keyed on bucket, one file per directory
    readIndexMeta(spark, path, "ivf", "ivfpq")
    stagedSwap(spark, s"$path/buckets") { staging =>
      graft.sources.TableSink.writePartitioned(
        spark.read.parquet(s"$path/buckets").repartition(col("bucket")),
        staging, Seq("bucket"))
    }
  }

  /** Parquet data-file count under `p`, recursive. */
  private[operators] def parquetFileCount(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Int = {
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Total parquet bytes under `p` — sizes a compaction's shuffle width so
    * rewritten files land near the scan granularity instead of one file
    * per key (fine for thousands of IVF buckets, catastrophic for an index
    * whose partition column has 12 values at 100 TB).
    */
  private[operators] def parquetBytes(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Long = {
    val it = fs.listFiles(p, true)
    var b = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) b += f.getLen
    }
    b
  }

  /** The staged-swap compaction template, shared by [[compactIvfIndex]]
    * and the Dedup postings compactors (the r19 directive): `write`
    * rewrites the live dir's content into the sibling staging dir it is
    * handed, then two renames swap it in — CRASH-safe (a reader never
    * sees a half-written table; a crashed compact leaves the live table
    * untouched and its debris is cleared on the next run), but not
    * concurrent-reader-safe: between the renames the live path is briefly
    * absent, and on object stores (rename = copy) the window widens — run
    * in a maintenance window or front with a manifest/table format.
    * Returns (parquet files before, after).
    *
    * RECOVERY CAVEAT (ADVICE r20): "crash-safe" means no torn reads and
    * no data loss, NOT that every crash leaves a live path. A crash
    * BETWEEN the two renames leaves the table at `<live>_retired` and no
    * `<live>` — the next compact run only clears `_compacting` debris, it
    * does not restore. Operator recovery: rename `<live>_retired` back to
    * `<live>` (the rows are intact — staging was never published). A
    * deploy that cannot tolerate the manual step should publish into
    * versioned dirs behind a pointer/manifest so a live table always
    * exists.
    */
  private[operators] def stagedSwap(spark: org.apache.spark.sql.SparkSession,
      liveDir: String)(write: String => Unit): (Int, Int) = {
    val live = new Path(liveDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = parquetFileCount(fs, live)
    val staging = new Path(s"${liveDir}_compacting")
    fs.delete(staging, true) // a crashed previous compact leaves no debris
    write(staging.toString)
    val retired = new Path(s"${liveDir}_retired")
    fs.delete(retired, true)
    require(fs.rename(live, retired), s"could not retire $live")
    require(fs.rename(staging, live), s"could not publish $staging")
    fs.delete(retired, true)
    (before, parquetFileCount(fs, live))
  }

  /** Shuffle width for a compaction rewrite: ceil(live bytes / 128 MiB)
    * — one output file per scan-granularity chunk — FLOORED at
    * min(defaultParallelism, ceil(bytes / 16 MiB)) (r21, VERDICT r20 #6):
    * a small index otherwise compacts to 1–2 files and every later
    * map-side probe scans on 1–2 cores (q314's 10×-replica probe ran
    * 9.6 s vs q298's 2.6 s from exactly this). The 16 MiB divisor keeps
    * the floor from shattering a tiny index into per-core splinter files;
    * at real scale the 128 MiB term dominates and the width is unchanged.
    */
  private[operators] def compactWidth(spark: org.apache.spark.sql.SparkSession,
      liveDir: String): Int = {
    val live = new Path(liveDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = parquetBytes(fs, live)
    val target = math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20))
    val floor = math.min(spark.sparkContext.defaultParallelism.toLong,
      math.max(1L, (bytes + (16L << 20) - 1) / (16L << 20)))
    math.max(target, floor).toInt
  }

  /** Probe-many half: top-k for a fresh query batch against a saved
    * [[buildIvfIndex]] index. No corpus pass, no assignment join — the only
    * crossJoin is the query batch against the k-row centroid frame; the
    * bucket table is read through its partition key, so the broadcast
    * bucket join prunes unprobed directories at runtime. Identical results
    * to [[ivfTopKWith]] over the same centroids (vectors and norms
    * round-trip parquet exactly); SimilaritySpec asserts both halves.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int, pred: Column = lit(true)): DataFrame = {
    readIndexMeta(spark, path, "ivf") // domain message if no index is here
    val cents = normCentroids(spark.read.parquet(s"$path/centroids"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    // `pred` is FILTERED vector search done right: the predicate lands on
    // the index scan itself (PushedFilters — FilteredAnnSpec asserts it), so
    // top-k ranks only rows that satisfy it. Post-filtering an unfiltered
    // top-k would instead return FEWER than k (or zero) matches whenever the
    // neighborhood is dominated by non-matching rows. Predicate columns must
    // have been materialized into the index via buildIvfIndex(metaCols).
    // partition-column read-back infers int; restore the centroid-id type
    val assigned = spark.read.parquet(s"$path/buckets").filter(pred)
      .select(col("id"), col("v"), col("nrm"), col("bucket").cast("long").as("bucket"))
    topKOverBuckets(assigned, probeBuckets(q, cents, nProbe), k)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b —
    * EXACT (recall 1), as a blocked equi-join rather than a nested-loop
    * cross product.
    *
    * Plan shape (the 1-bucket-theta scheme, Okcan & Riedewald, SIGMOD'11):
    * every vector gets a block id g = id mod `blocks`; the left side
    * replicates each vector to cells (g, *), the right side to cells (*, g),
    * and the join is an EQUI-join on the (cellA, cellB) pair — each ordered
    * pair of vectors meets in exactly one of the blocks² cells, so `id_a <
    * id_b` needs no dedup. The O(n²) cosine work is inherent to exactness,
    * but it now shuffle-partitions across blocks² reducers instead of
    * broadcasting one whole side through a BroadcastNestedLoopJoin — the
    * shape that survives when neither side fits an executor. Replication
    * cost: `blocks`× each side; pick blocks ≈ √parallelism.
    *
    * For approximate-but-sublinear candidate generation use
    * [[cosinePairsLsh]]; on corpora where the threshold sits near the
    * background angle (see HyperplaneBandKeys scaladoc) this exact plan is
    * the honest choice.
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 6): DataFrame = {
    val withNorm = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .withColumn("g", pmod(col("id"), lit(blocks)).cast("int"))
    val grid = sequence(lit(0), lit(blocks - 1))
    // explicit repartition by the cell key, one partition per cell: AQE's
    // byte-based partition coalescing would otherwise merge these tiny-by-
    // bytes but O(|cell|²)-by-compute shuffle partitions onto 1-2 cores
    // (measured 2.9 s → 0.8 s at sf0.1); REPARTITION_BY_NUM is exempt
    // from coalescing, and the join reuses the distribution
    val x = withNorm.withColumn("cb", explode(grid))
      .repartition(blocks * blocks, col("g"), col("cb")).as("x")
    val y = withNorm.withColumn("ca", explode(grid))
      .repartition(blocks * blocks, col("ca"), col("g")).as("y")
    x.join(y,
        col("x.g") === col("y.ca") && col("x.cb") === col("y.g") &&
          col("x.id") < col("y.id"))
      .withColumn("cos",
        round(cosine(col("x.v"), col("y.v"), col("x.nrm"), col("y.nrm")), 6))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("cos"))
  }

  /** Probability that an UNCORRELATED pair (cos ≈ 0, sign-bit agreement
    * 1/2) collides in at least one band — the fraction of the O(n²)
    * background the banding scheme FAILS to prune. A property of
    * (bands, rows) alone; when it is high, LSH candidate generation is
    * all-pairs-plus-overhead and the exact blocked join dominates.
    */
  def lshBackgroundRetention(bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(0.5, rows), bands)

  /** Expected recall of a pair at cosine `t` under the scheme: sign-bit
    * agreement p = 1 − arccos(t)/π (Charikar), collide-in-≥1-band
    * 1 − (1 − p^rows)^bands.
    */
  def lshRecallAt(t: Double, bands: Int, rows: Int): Double = {
    val p = 1.0 - math.acos(math.min(math.max(t, -1.0), 1.0)) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, rows), bands)
  }

  /** LSH candidate (id_a, id_b) pairs — the pre-verification set an
    * equi-self-join on (band, key) produces, ids only. Public so recall /
    * pruning-power claims are measurable in specs and scale checks.
    */
  def lshCandidates(vecs: DataFrame, idCol: String, vecCol: String,
      bands: Int, rows: Int, seed: Long = 42L): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    val sk = vecs.select(col(idCol).as("id"),
      posexplode(graft.functions.HyperplaneBandKeys.keys(
        spark, col(vecCol), bands, rows, seed)).as(Seq("band", "key")))
    sk.as("x").join(sk.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Approximate cosine pairs via random-hyperplane LSH banding + exact
    * verification: band keys from [[graft.functions.HyperplaneBandKeys]],
    * candidates from an equi-self-join on (band, key) carrying ids ONLY
    * (vectors never ride the bands× explode), then the surviving (id_a,
    * id_b) set — deduplicated to one row per pair — joins the vectors back
    * for the exact thresholded cosine. Recall for a pair at bit-agreement
    * p is 1−(1−p^rows)^bands; false candidates only cost verification work,
    * never correctness.
    *
    * SELF-PROTECTING: when [[lshBackgroundRetention]] of (bands, rows)
    * exceeds `maxBackgroundRetention`, banding cannot prune the O(n²)
    * background (measured: exponent 1.46 vs the blocked join's 0.93 at
    * retention 0.99 — SCALING.md), so the operator logs the regime and
    * delegates to the exact [[cosinePairs]] plan, which returns the
    * identical result for strictly less work. Pass
    * `maxBackgroundRetention = 1.0` to force the LSH plan regardless.
    *
    * Cache scope: the norm'd projection is materialized once
    * ([[Checkpoints.cut]]: executor-local by default, reliable
    * checkpoint() when `graft.checkpoint.dir` is set) instead of
    * persist() — nothing is left registered in the session cache manager
    * after the call, and the blocks are reclaimed by the context cleaner
    * once the result is dereferenced (the long-lived-service posture).
    */
  def cosinePairsLsh(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 32, rows: Int = 3,
      seed: Long = 42L, maxBackgroundRetention: Double = 0.25): DataFrame = {
    val bg = lshBackgroundRetention(bands, rows)
    if (bg > maxBackgroundRetention) {
      log.warn(f"cosinePairsLsh: background retention $bg%.3f of " +
        f"(bands=$bands, rows=$rows) exceeds $maxBackgroundRetention%.2f — " +
        "banding cannot prune this regime; delegating to the exact blocked join")
      return cosinePairs(vecs, idCol, vecCol, threshold)
    }
    log.info(f"cosinePairsLsh: background retention $bg%.4f, recall at " +
      f"threshold ${lshRecallAt(threshold, bands, rows)}%.4f")
    // one-row-per-vector staging, materialized once: the band explode and
    // both verification rejoins read it without recomputing norms
    val withNorm = Checkpoints.cut(
      vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
        .withColumn("nrm", l2norm(col("v"))))
    val candIds = lshCandidates(withNorm, "id", "v", bands, rows, seed)
    val verified = candIds
      .join(withNorm.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(withNorm.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cos", round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
    // reliable mode: seal the (small) pair result and release the staging
    // directory now — a long-lived service must not accumulate one staging
    // dir per call (no-op in localCheckpoint mode; blocks are cleaner-owned)
    Checkpoints.sealAndRelease(verified, withNorm)
  }

  /** Embedding-space benchmark decontamination — the semantic sibling of
    * [[Dedup.contamination]]'s n-gram check: flag every corpus vector whose
    * cosine against ANY benchmark vector reaches `threshold`, with the
    * best-matching benchmark id as evidence. Paraphrased eval leakage
    * (reworded GSM8K problems, translated MMLU items) shares no 8-gram
    * with its source but sits at high cosine; contamination audits run
    * both checks and union the flags.
    *
    * Scale posture, same contract as the n-gram path: the benchmark side
    * is SMALL by the operator's definition (eval suites are thousands of
    * rows, the corpus is billions), so it is explicitly broadcast and the
    * corpus streams through map-side — one scan, zero corpus shuffle,
    * |corpus|·|bench| codegen'd dots. The per-corpus-vector argmax is a
    * map-side-combinable `max_by` hash aggregation on the scan's own
    * partitioning (no added exchange). At an eval-suite size where the
    * broadcast no longer fits, delegate candidate generation to the LSH /
    * IVF index paths (q94/q126) and keep this as their exact oracle.
    *
    * Output: one row per CONTAMINATED corpus vector —
    * (id, bench_id, cos) with cos the max over the benchmark, rounded to
    * 6 places (the cosine-oracle float discipline), ties on cos broken by
    * lowest bench_id.
    */
  def semanticContamination(vecs: DataFrame, idCol: String, vecCol: String,
      isBenchmark: Column, threshold: Double): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      isBenchmark.as("isb")).withColumn("nrm", l2norm(col("v")))
    val bench = base.filter(col("isb"))
      .select(col("id").as("bench_id"), col("v").as("bv"),
        col("nrm").as("bnrm"))
    base.filter(!col("isb")).crossJoin(broadcast(bench))
      .withColumn("cos",
        round(cosine(col("v"), col("bv"), col("nrm"), col("bnrm")), 6))
      .filter(col("cos") >= threshold)
      .groupBy("id").agg(
        max_by(col("bench_id"),
          struct(col("cos"), (-col("bench_id")).as("nid"))).as("bench_id"),
        max(col("cos")).as("cos"))
  }

  /** SemDeDup-style semantic dedup (cluster-then-prune; Abbas et al. 2023,
    * arXiv:2303.09540): k-means the corpus into `k` semantic clusters,
    * then WITHIN each cluster drop every vector that has a higher-priority
    * neighbor at cosine ≥ `threshold` (priority = lowest id — the paper
    * keeps one representative per ε-ball; lowest-id is the deterministic,
    * re-run-stable choice of representative). Cross-cluster near-dups are
    * deliberately out of scope — that approximation is the entire point:
    * it shrinks the candidate space from O(n²) to Σ|cluster|².
    *
    * Scale posture: clustering is [[kmeansCentroids]] (broadcast assign +
    * mergeable centroid UDAF per round); the intra-cluster pair join is
    * keyed on (bucket, grid-cell) — the [[cosinePairs]] blocked-grid
    * refinement APPLIED PER CLUSTER, so one mega-cluster (skewed data) still
    * spreads its |c|² pair-work across `blocks`² reducers instead of one.
    * Output: the SURVIVORS (id, bucket), one row per kept vector.
    */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int, iters: Int = 2, blocks: Int = 4): DataFrame = {
    val cents = normCentroids(kmeansCentroids(vecs, idCol, vecCol, k, iters))
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val assigned = Checkpoints.cut(assignToBuckets(base, cents))
    val withCell = assigned.withColumn("g", pmod(col("id"), lit(blocks)).cast("int"))
    val grid = sequence(lit(0), lit(blocks - 1))
    val x = withCell.withColumn("cb", explode(grid))
      .repartition(blocks * blocks, col("bucket"), col("g"), col("cb")).as("x")
    val y = withCell.withColumn("ca", explode(grid))
      .repartition(blocks * blocks, col("bucket"), col("ca"), col("g")).as("y")
    val dropped = x.join(y,
        col("x.bucket") === col("y.bucket") &&
          col("x.g") === col("y.ca") && col("x.cb") === col("y.g") &&
          col("x.id") < col("y.id"))
      .filter(cosine(col("x.v"), col("y.v"), col("x.nrm"), col("y.nrm"))
        >= threshold)
      .select(col("y.id").as("id")).distinct()
    val survivors = assigned.join(dropped, Seq("id"), "left_anti")
      .select(col("id"), col("bucket"))
    Checkpoints.sealAndRelease(survivors, assigned)
  }

  // ------------------------------------------------------------------
  // Product quantization (Jégou, Douze & Schmid, "Product Quantization
  // for Nearest Neighbor Search", TPAMI 2011): split the d dimensions
  // into m subspaces, k-means each subspace, and store every vector as m
  // small codebook indices — m·log₂(kCodes) bits instead of 4·d bytes
  // (64-dim float → 8 bytes at the standard m=8, kCodes=256 "PQ8": a 32×
  // compression). Assignment is euclidean (the paper's rule — and the one
  // the reconstruction-dot objective wants minimized);
  // search scores queries against the RECONSTRUCTED corpus vectors,
  // which equals the classic ADC lookup-table sum exactly
  // (dot(q, x̂) = Σ_sub dot(q_sub, codeword_sub)) while reusing the
  // codegen'd FloatDotProduct — deterministic accumulation order, unlike
  // an explode+groupBy lookup-table sum whose partial-merge order is not.
  // At scale the codes are the at-rest/shuffled form; reconstruction is
  // a map-side broadcast-codebook decode in the scan stage.

  /** One subvector row per (vector, subspace): (id, sub, sv). */
  private def pqSubvectors(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, sw: Int): DataFrame =
    vecs.select(col(idCol).cast("long").as("id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col(vecCol), s * sw + 1, lit(sw)))).as(Seq("sub", "sv")))

  /** Euclidean nearest-codeword assignment: argmin ‖sv − cv‖² =
    * argmax (sv·cv − ‖cv‖²/2) — the classic PQ rule, which is also what
    * the reconstruction-dot search objective wants minimized. The argmax
    * is a hash AGGREGATION over a lexicographic (score, −code, …) struct
    * — deterministic (ties take the lowest code) and map-side combining,
    * where a row_number window over the kCodes-way exploded join was a
    * full sort of n·m·kCodes rows (measured 4× the whole query).
    * Output: (id, sub, sv, code, cv) of the winner.
    */
  private def pqAssign(subs: DataFrame, cents: DataFrame): DataFrame = {
    // rank-1 window over the kCodes-way join: Spark 4 rewrites the rn=1
    // filter into WindowGroupLimit — a bounded per-(id, sub) top-1 kept
    // map-side before any exchange — where the previous max(struct(..))
    // aggregation fell back to SortAggregate and sorted all n·m·kCodes
    // rows twice (partial+final). Winner identical: max score, ties
    // lowest code.
    val w = Window.partitionBy(col("id"), col("sub"))
      .orderBy(col("score").desc, col("code"))
    subs.join(broadcast(cents
        .withColumn("h", dot(col("cv"), col("cv")) / 2)), "sub")
      .withColumn("score", dot(col("sv"), col("cv")) - col("h"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("id"), col("sub"), col("sv"), col("code"), col("cv"))
  }

  /** Train the PQ codebook: (sub, code, cv) — `m` euclidean k-means run
    * as ONE grouped Lloyd over all subspaces (a single exploded frame,
    * one broadcast-assign + one mergeable-centroid agg per round — not m
    * sequential trainings). Deterministic: seeds are each subspace's
    * kCodes lowest-id subvectors, ties on code. One eager size() probe
    * fixes d; on a real corpus, train on a sample — the codebook is the
    * model, not the data.
    */
  def pqTrain(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, kCodes: Int, iters: Int = 2, dKnown: Int = -1): DataFrame = {
    require(m > 0 && kCodes > 1, "need positive m and kCodes > 1")
    // dKnown > 0 skips the emptiness + dimension probe jobs when the
    // caller already paid for them (pqTopK/ivfPqTopK probe once and
    // thread the result through train and encode)
    if (dKnown <= 0 && vecs.head(1).isEmpty)
      return vecs.select(lit(0).as("sub"), lit(0).as("code"),
        transform(col(vecCol), _.cast("float")).as("cv")).limit(0)
    val d = if (dKnown > 0) dKnown else vecs.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dim $d must divide into m=$m subspaces")
    val spark = vecs.sparkSession
    // lazy — the explode is a map-only projection of the (sampled) train
    // set, cheaper to recompute per round than to eagerly materialize
    val subs = pqSubvectors(vecs, idCol, vecCol, m, d / m)
    val centroidOf = udaf(graft.functions.CentroidAggregator)
    // seeds: the subvectors of the kCodes lowest-id vectors —
    // TakeOrderedAndProject on the VECTOR frame, then a window over the
    // tiny kCodes·m seed frame; never a row_number sort of all n·m
    // subvector rows (m-way parallelism on a full-corpus sort is the
    // shape this family avoids)
    val seedVecs = vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy("id").limit(kCodes)
    val wSeed = Window.partitionBy(col("sub")).orderBy(col("id"))
    val seed = pqSubvectors(seedVecs, "id", "v", m, d / m)
      .withColumn("code", row_number().over(wSeed).cast("int") - 1)
      .select(col("sub"), col("code"), col("sv").as("cv"))
    // codebook rounds collect the m·kCodes model to the driver (see
    // kmeansCentroids): flat per-round plans, no cuts, bit-identical
    // values — pqAssign and the centroid UDAF are unchanged
    var rows = seed.collect()
    var schema = seed.schema
    (1 to iters).foreach { _ =>
      if (rows.nonEmpty) {
        val next = pqAssign(subs, localFrame(spark, rows, schema))
          .groupBy("sub", "code").agg(centroidOf(col("sv")).as("cv"))
          .select(col("sub"), col("code"),
            transform(col("cv"), _.cast("float")).as("cv"))
        rows = next.collect()
        schema = next.schema
      }
    }
    localFrame(spark, rows, schema)
  }

  /** Encode every vector as its m nearest-codeword indices, and carry the
    * reconstruction: (id, codes array<int>, decoded array<float>). The
    * codes (m small ints — the at-rest form) are what a 100 TB corpus
    * stores and shuffles; `decoded` here is the broadcast-codebook
    * reconstruction a scan stage would materialize map-side.
    */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, mKnown: Int = -1, dKnown: Int = -1): DataFrame = {
    // mKnown/dKnown > 0 skip the three probe jobs (two head(1) + one agg)
    // when the caller already knows both — the per-call PQ demos thread
    // them through so a single probe pays for the whole pipeline. The
    // empty-in→empty-out guard keys on whichever probe would otherwise
    // run: with dKnown missing, the d-probe's head() would throw on an
    // empty corpus, so emptiness must be answered first; with BOTH known,
    // no driver action runs at all and an empty corpus flows through the
    // lazy pipeline to an empty result (EmptyInputSpec covers this
    // mKnown/dKnown path via pqTopKWith).
    if ((mKnown <= 0 || dKnown <= 0) &&
        (codebook.head(1).isEmpty || vecs.head(1).isEmpty))
      return vecs.select(col(idCol).cast("long").as("id"),
        array().cast("array<int>").as("codes"),
        transform(col(vecCol), _.cast("float")).as("decoded")).limit(0)
    val m = if (mKnown > 0) mKnown else codebook.agg(max("sub")).head().getInt(0) + 1
    val d = if (dKnown > 0) dKnown else vecs.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0,
      s"dim $d does not divide into the codebook's m=$m subspaces")
    pqAssign(pqSubvectors(vecs, idCol, vecCol, m, d / m), codebook)
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("sub"), col("code"), col("cv"))))
        .as("parts"))
      .select(col("id"),
        transform(col("parts"), p => p.getField("code")).as("codes"),
        flatten(transform(col("parts"), p => p.getField("cv"))).as("decoded"))
  }

  /** FAISS-style exact re-ranking stage (IndexRefineFlat; the DiskANN
    * serving split): the compressed-domain ranking SELECTS a candidate
    * superset, exact cosine over the survivors DECIDES the final top k.
    * Motivated by measurement, not taste: ADC-only ranking at 32×
    * compression prices the top-10 boundary wrong (recall@10 0.17–0.18 on
    * the 8× ScaleCheck corpus; SCALING.md), and re-ranking `refine`
    * candidates per query restores it for the cost of nq·refine exact
    * dots. The corpus-sized `exact` side streams ONCE through a
    * broadcast-hash join against the tiny candidate-id set — full vectors
    * never shuffle, and only candidate rows pay a dot product.
    *
    * `cands` is [[twoPhaseTopK]] output over compressed-domain scores;
    * `queries` is (query_id, qv, qn); `exact` is the source-of-truth
    * vector table (id, v, nrm).
    */
  private def refineExact(cands: DataFrame, queries: DataFrame,
      exact: DataFrame, k: Int): DataFrame = {
    val pairs = exact
      .join(broadcast(cands.select(col("query_id"), col("neighbor_id"))),
        col("id") === col("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos",
        round(cosine(col("qv"), col("v"), col("qn"), col("nrm")), 6))
      .select("query_id", "id", "cos")
    twoPhaseTopK(pairs, k)
  }

  /** PQ approximate cosine top-k: train → encode → score queries' FULL
    * vectors against the reconstructed corpus (= ADC). Approximate ⇒
    * rows-only driver check; recall vs brute force is PqSpec's contract.
    * `refine > k` re-ranks the top-`refine` ADC candidates with exact
    * cosine ([[refineExact]]); `refine >= corpus` makes the result
    * IDENTICAL to [[bruteForceTopK]] (PqSpec pins that identity).
    */
  def pqTopK(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, m: Int = 8, kCodes: Int = 256,
      iters: Int = 2, trainMod: Int = 1, refine: Int = 0): DataFrame = {
    // trainMod > 1 trains the codebook on the deterministic id-mod sample
    // (standard PQ practice — the codebook is a model; Lloyd on the full
    // 100 TB corpus buys nothing over a representative sample) while the
    // ENCODE pass still covers every vector. An id space the mod misses
    // entirely falls back to full-corpus training — never a silent empty
    // result over a non-empty corpus.
    // ONE probe job answers emptiness, sample coverage, and dimension —
    // the per-call demo previously paid four separate driver actions for
    // the same facts (two head(1), a size() head, and pqEncode's m agg)
    val probe = vecs.agg(count(lit(1)).as("n"),
      count(when(pmod(col(idCol), lit(math.max(trainMod, 1))) === 0, 1)).as("ns"),
      max(size(col(vecCol))).as("d")).head()
    if (probe.getLong(0) == 0L)
      return vecs.select(col(idCol).as("query_id"), lit(1).as("rank"),
        col(idCol).cast("long").as("neighbor_id"), lit(0.0).as("cos")).limit(0)
    val d = probe.getInt(2)
    val trainSet =
      if (trainMod > 1 && probe.getLong(1) > 0L)
        vecs.filter(pmod(col(idCol), lit(trainMod)) === 0)
      else vecs
    val cb = pqTrain(trainSet, idCol, vecCol, m, kCodes, iters, d)
    pqTopKWith(vecs, idCol, vecCol, isQuery, k, cb, refine, m, d)
  }

  /** PQ ADC scan against a SUPPLIED codebook — the training-free core
    * [[pqTopK]] wraps. A session that already holds the codebook (the
    * model — training is an offline, amortized step at scale) pays only
    * encode + ADC + refine per call; the registered q122 serves from a
    * per-(session, dir) cached codebook exactly as q130 serves from its
    * materialized index.
    */
  def pqTopKWith(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, codebook: DataFrame, refine: Int = 0,
      mKnown: Int = -1, dKnown: Int = -1): DataFrame = {
    // no lineage cut on the encode: it is consumed exactly once by the ADC
    // scan below, so an eager materialization is a wasted corpus pass —
    // the materialized at-rest form is buildPqIndex's job (q130)
    val enc = pqEncode(vecs, idCol, vecCol, codebook, mKnown, dKnown)
      .withColumn("dn", l2norm(col("decoded")))
    val q = vecs.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val pairs = enc.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cos",
        round(cosine(col("qv"), col("decoded"), col("qn"), col("dn")), 6))
      .select("query_id", "id", "cos")
    val adc = twoPhaseTopK(pairs, math.max(k, refine))
    if (refine > k)
      refineExact(adc, q,
        vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
          .withColumn("nrm", l2norm(col("v"))), k)
    else adc
  }

  /** IVF-PQ (the FAISS-style pairing): coarse IVF buckets bound WHICH
    * vectors each query scans (`nProbe/nCentroids` of the corpus), PQ
    * codes bound WHAT is stored and scanned per vector (m bytes, scored
    * against the broadcast-codebook reconstruction). Composition of the
    * existing pieces — coarse k-means + bucket assignment from the IVF
    * path, codebook/encode/ADC from the PQ path — so both compression
    * levers stack: scan fraction × 32 bytes-per-vector. (Classic IVF-PQ
    * encodes residuals v − coarse_centroid; this variant encodes raw
    * vectors — simpler, and the recall contract is PqSpec's to pin.)
    * Approximate ⇒ rows-only driver check.
    */
  def ivfPqTopK(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 8, kCodes: Int = 64, iters: Int = 2,
      trainMod: Int = 1, refine: Int = 0): DataFrame = {
    // ONE probe job for emptiness, sample coverage, and dimension (see
    // pqTopK); both trainings — coarse k-means AND codebook — run on the
    // deterministic id-mod sample: centroids and codebooks are models, and
    // Lloyd over the full 100 TB corpus buys nothing over a representative
    // slice while costing a full crossJoin+window pass per iteration
    val probe = vecs.agg(count(lit(1)).as("n"),
      count(when(pmod(col(idCol), lit(math.max(trainMod, 1))) === 0, 1)).as("ns"),
      max(size(col(vecCol))).as("d")).head()
    if (probe.getLong(0) == 0L)
      return vecs.select(col(idCol).cast("long").as("query_id"),
        lit(1).as("rank"), col(idCol).cast("long").as("neighbor_id"),
        lit(0.0).as("cos")).limit(0)
    val d = probe.getInt(2)
    val trainSet =
      if (trainMod > 1 && probe.getLong(1) > 0L)
        vecs.filter(pmod(col(idCol), lit(trainMod)) === 0)
      else vecs
    val coarse = kmeansCentroids(trainSet, idCol, vecCol, nCentroids, iters)
    val cb = pqTrain(trainSet, idCol, vecCol, m, kCodes, iters, d)
    ivfPqTopKWith(vecs, idCol, vecCol, isQuery, k, nProbe, coarse, cb, refine,
      mKnown = m, dKnown = d)
  }

  /** IVF-PQ probe/scan against SUPPLIED coarse centroids and codebook —
    * the training-free core [[ivfPqTopK]] wraps and the identity anchor
    * for the materialized index: [[buildPqIndex]] + [[ivfPqTopKIndexed]]
    * over the same (centroids, codebook) reproduce this exactly
    * (PqSpec-asserted; codes, reconstructions and norms round-trip
    * parquet bit-exactly).
    */
  def ivfPqTopKWith(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nProbe: Int, coarseCentroids: DataFrame,
      codebook: DataFrame, refine: Int = 0,
      mKnown: Int = -1, dKnown: Int = -1): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val coarse = normCentroids(coarseCentroids)
    // the stored index row: (bucket, id, codes→decoded, norm) — what a
    // materialized IVF-PQ table persists (codes at rest; decode map-side).
    // NOT lineage-cut here: the probe scan below consumes it exactly once,
    // and the materialized at-rest form is buildPqIndex's job (q130)
    val enc = assignToBuckets(base, coarse).select("id", "bucket")
        .join(pqEncode(vecs, idCol, vecCol, codebook, mKnown, dKnown), "id")
        .withColumn("dn", l2norm(col("decoded")))
    val queries = vecs.filter(isQuery) // caller's frame — isQuery contract
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val probes = probeBuckets(queries, coarse, nProbe)
    val pairs = enc.join(broadcast(probes), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos",
        round(cosine(col("qv"), col("decoded"), col("qn"), col("dn")), 6))
      .select("query_id", "id", "cos")
    val adc = twoPhaseTopK(pairs, math.max(k, refine))
    val out =
      if (refine > k) refineExact(adc, queries, base, k) else adc
    Checkpoints.sealAndRelease(out, enc)
  }

  /** Build-once half of the PQ lifecycle — the IVF index lifecycle
    * ([[buildIvfIndex]]) one compression lever up: persist
    * `path/codebook` (sub, code, cv), `path/centroids` (cid, cv), and a
    * bucket-partitioned `path/buckets` table of (id, codes, meta…) rows.
    * The corpus is stored as m small code indices per vector — the
    * at-rest form is m·log₂(kCodes) bits instead of 4·d bytes — and the
    * expensive passes (codebook training upstream, corpus encode here)
    * run ONCE instead of per query batch. `metaCols` materializes
    * predicate columns for filtered search, as in [[buildIvfIndex]].
    */
  def buildPqIndex(vecs: DataFrame, idCol: String, vecCol: String,
      coarseCentroids: DataFrame, codebook: DataFrame, path: String,
      metaCols: Seq[String] = Nil): Unit = {
    val base = vecs.select(
      (col(idCol).as("id") +: col(vecCol).as("v") +: metaCols.map(col)): _*)
      .withColumn("nrm", l2norm(col("v")))
    val buckets = assignToBuckets(base, normCentroids(coarseCentroids), metaCols)
      .select(col("id") +: col("bucket") +: metaCols.map(col): _*)
    val coded = buckets
      .join(pqEncode(vecs, idCol, vecCol, codebook).select("id", "codes"), "id")
    graft.sources.TableSink.writePartitioned(coded, s"$path/buckets",
      Seq("bucket"))
    codebook.select(col("sub"), col("code"), col("cv")).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/codebook")
    coarseCentroids.select(col("cid"), col("cv")).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/centroids")
    writeIndexMeta(vecs.sparkSession, path, "ivfpq", metaCols)
  }

  /** Incremental third of the PQ lifecycle, mirroring
    * [[appendToIvfIndex]]: encode ONLY the new vectors against the FROZEN
    * saved codebook and coarse centroids, and append their
    * (id, codes, meta…) rows to the bucket table. Both the bucket
    * assignment and the code assignment are deterministic functions of
    * the frozen model, so append-then-probe is exactly a rebuild over the
    * union with the same codebook (spec-asserted) — probes see one index,
    * never two generations. Retraining cadence stays an offline decision.
    */
  def appendToPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newVecs: DataFrame, idCol: String, vecCol: String): Unit = {
    val metaCols = readIndexMeta(spark, path, "ivfpq")
    val missing = metaCols.filterNot(newVecs.columns.contains)
    require(missing.isEmpty,
      s"index at $path was built with metadata columns $metaCols; the " +
        s"appended frame lacks ${missing.mkString(", ")}")
    val cents = normCentroids(spark.read.parquet(s"$path/centroids"))
    val cb = spark.read.parquet(s"$path/codebook")
    val base = newVecs.select(
      (col(idCol).as("id") +: col(vecCol).as("v") +: metaCols.map(col)): _*)
      .withColumn("nrm", l2norm(col("v")))
    val buckets = assignToBuckets(base, cents, metaCols)
      .select(col("id") +: col("bucket") +: metaCols.map(col): _*)
    val coded = buckets.join(
      pqEncode(newVecs, idCol, vecCol, cb).select("id", "codes"), "id")
    graft.sources.TableSink.writePartitioned(coded, s"$path/buckets",
      Seq("bucket"), mode = org.apache.spark.sql.SaveMode.Append)
  }

  /** Probe-many half: IVF-PQ top-k for a fresh query batch against a saved
    * [[buildPqIndex]] index — no codebook training, no corpus encode, no
    * assignment pass. The bucket table is read through its partition key
    * (probed buckets prune unread directories at runtime), `pred` lands on
    * the index scan as in [[ivfTopKIndexed]], and the stored codes are
    * decoded MAP-SIDE in the scan stage against the broadcast codebook
    * (one k-row crossJoin of nested code→codeword maps — the ADC posture:
    * codes are what rests and ships; floats exist only inside the scan).
    * Identical results to [[ivfPqTopKWith]] over the same centroids and
    * codebook.
    */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int, pred: Column = lit(true),
      refine: Int = 0, exactVecs: Option[DataFrame] = None): DataFrame = {
    // refine needs source-of-truth vectors the index deliberately does not
    // store (codes ARE the at-rest form): the caller passes the corpus
    // table — the DiskANN split, compressed codes serve candidates, the
    // flat table serves the re-rank. Column names follow idCol/vecCol.
    require(refine <= k || exactVecs.isDefined,
      s"refine=$refine > k=$k needs exactVecs (the index stores codes, not vectors)")
    readIndexMeta(spark, path, "ivfpq") // domain message if no index here
    val cents = normCentroids(spark.read.parquet(s"$path/centroids"))
    // one row of nested maps sub → (code → codeword): order-insensitive
    // lookup by KEY, so sparse codebooks (codes lost to empty Lloyd
    // clusters) decode exactly — a positional array would mis-align them
    val cbMap = spark.read.parquet(s"$path/codebook")
      .groupBy("sub")
      .agg(map_from_entries(collect_list(struct(col("code"), col("cv"))))
        .as("cm"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("sub"), col("cm"))))
        .as("cb"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val probes = probeBuckets(q, cents, nProbe)
    val idx = spark.read.parquet(s"$path/buckets").filter(pred)
      .select(col("id"), col("codes"),
        col("bucket").cast("long").as("bucket"))
    val decoded = idx.crossJoin(broadcast(cbMap))
      .withColumn("decoded", flatten(transform(col("codes"),
        (c, i) => element_at(element_at(col("cb"), i), c))))
      .withColumn("dn", l2norm(col("decoded")))
    val pairs = decoded.join(broadcast(probes), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos",
        round(cosine(col("qv"), col("decoded"), col("qn"), col("dn")), 6))
      .select("query_id", "id", "cos")
    val adc = twoPhaseTopK(pairs, math.max(k, refine))
    if (refine > k)
      refineExact(adc, q,
        exactVecs.get.select(col(idCol).as("id"), col(vecCol).as("v"))
          .withColumn("nrm", l2norm(col("v"))), k)
    else adc
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98) over an exact top-`poolSize` candidate pool: greedily pick k
    * results maximizing `λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)` — the
    * diversity pass a retrieval pipeline runs between ANN and the consumer
    * so near-duplicate neighbors don't crowd out distinct ones.
    *
    * Scale posture: the distributed part — candidate generation — reuses
    * [[bruteForceTopK]]'s map-side-dot/two-phase-top-k shape (swap in the
    * IVF path upstream for approximate pools); the greedy selection is
    * inherently sequential PER QUERY but embarrassingly parallel ACROSS
    * queries, so it runs as a grouped flatMap over `poolSize`-bounded
    * candidate lists (bounded memory per task, queries partition-parallel).
    * This is per-group imperative logic, not a driver loop — no collect.
    *
    * Deterministic: pool ties break on id (inherited), selection ties break
    * on (score desc, id asc); `rel` is the pool's rounded cosine and
    * pairwise cosines use the same per-element double-cast accumulation as
    * [[dot]]. Output: (query_id, rank, neighbor_id, score) with `score` the
    * MMR objective at selection time, rounded to 6 dp (rank 1's score is
    * just λ·rel — nothing is selected yet to repel from).
    */
  def mmrRerank(vecs: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, poolSize: Int, lambda: Double): DataFrame = {
    require(poolSize >= k, "need poolSize >= k")
    mmrRerank(vecs, idCol, vecCol,
      bruteForceTopK(vecs, idCol, vecCol, isQuery, poolSize), k, lambda)
  }

  /** MMR over a CALLER-SUPPLIED candidate pool of (query_id, neighbor_id,
    * cos) — the [[bruteForceTopK]]/[[ivfTopKIndexed]]/[[ivfPqTopKIndexed]]
    * output shape (extra columns such as `rank` are ignored), so any ANN
    * front-end composes with the diversity pass: pool from an approximate
    * index, re-rank exactly. `cos` is taken as the relevance score; the
    * pairwise repulsion cosines are recomputed exactly from `vecs`, which
    * must contain every pooled neighbor id.
    */
  def mmrRerank(vecs: DataFrame, idCol: String, vecCol: String,
      pool: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, "need lambda in [0, 1]")
    val spark = vecs.sparkSession
    import spark.implicits._
    val side = vecs.select(col(idCol).cast("long").as("nid"), col(vecCol).as("nv"))
    val cands = pool
      .join(side, col("neighbor_id") === col("nid"))
      .groupBy(col("query_id").cast("long").as("query_id"))
      .agg(collect_list(struct(col("neighbor_id").cast("long").as("_1"),
        col("nv").as("_2"), col("cos").as("_3"))).as("cands"))
      .as[(Long, Seq[(Long, Seq[Float], Double)])]
    cands.flatMap { case (qid, plist) =>
      // graft's own top-k pools never carry NaN (the zero-norm cosine
      // guard scores degenerate vectors 0.0), but this overload accepts
      // EXTERNAL pools whose relevance column may — map NaN below every
      // real cosine so the argmax stays total and the greedy loop can
      // never strand (descending NaN would otherwise sort first)
      // EXTERNAL pools may also list a neighbor twice for one query (e.g.
      // a union of two ANN sources): selection is tracked per array slot,
      // so a duplicate would re-win the very next rank and the output
      // would repeat an id. Dedup on id keeping the best (rel, then the
      // NaN-mapped value) — deterministic whatever the pool's row order.
      val arr = plist.map { case (id, v, rel) =>
        (id, v, if (rel.isNaN) -2.0 else rel)
      }.groupBy(_._1).valuesIterator
        .map(_.maxBy(_._3)).toSeq
        .sortBy { case (id, _, rel) => (-rel, id) }.toArray
      val n = arr.length
      val sel = Array.fill(n)(false)
      val out = Seq.newBuilder[(Long, Int, Long, Double)]
      // max cosine to any already-selected candidate, updated incrementally
      val repel = Array.fill(n)(0.0)
      var rank = 1
      val kk = math.min(k, n)
      while (rank <= kk) {
        var bi = -1; var bs = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!sel(i)) {
            val s = lambda * arr(i)._3 - (1.0 - lambda) * repel(i)
            // strict > plus rel-desc/id-asc scan order = (score, -rel, id) tiebreak
            if (s > bs || bi == -1) { bs = s; bi = i }
          }
          i += 1
        }
        out += ((qid, rank, arr(bi)._1, math.rint(bs * 1e6) / 1e6))
        sel(bi) = true
        val bv = arr(bi)._2
        i = 0
        while (i < n) {
          if (!sel(i)) repel(i) = math.max(repel(i), jvmCosine(arr(i)._2, bv))
          i += 1
        }
        rank += 1
      }
      out.result()
    }.toDF("query_id", "rank", "neighbor_id", "score")
  }

  /** Plain-JVM cosine with the same per-element double-cast, left-to-right
    * accumulation as [[dot]] — used inside [[mmrRerank]]'s per-group loop.
    */
  private def jvmCosine(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
