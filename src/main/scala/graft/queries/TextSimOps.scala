package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Mixture, Packing, Sampling, Similarity}
import graft.functions.{SketchExpressions, TextFns}

import graft.queries.TextShared.emb

/** Similarity-search family over `embeddings`: brute-force cosine top-k
  * (the pinned oracle for every approximate path), int8 quantization, JL
  * random projection, IVF / PQ / IVF-PQ ANN with their build-once
  * materialized-index lifecycles, hyperplane-LSH pairs, SemDeDup,
  * filtered search, MMR re-ranking, RRF hybrid retrieval, hard-negative
  * mining, retrieval metrics and semantic decontamination. Split from
  * TextOps along the family seam — pure move, no behavior change; shared
  * portability rules in [[TextShared]].
  */
object TextSimOps {

  // q103's saved IVF index, built once per (session, sf dir) — the
  // build-once/probe-many lifecycle; later calls are pure probes.
  private val ivfIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  // q126's metadata-carrying IVF index (label materialized for filtered
  // search) — same build-once lifecycle, separate table: a production
  // deployment decides at BUILD time which predicate columns the index
  // carries, so the two shapes are genuinely different indexes.
  private val ivfMetaIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  // q130's materialized IVF-PQ index: coarse k-means + codebook training +
  // corpus encode all happen once per (session, sf dir); probes read codes
  // through partition pruning and decode map-side.
  private val ivfPqIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  // The IVF family's trained centroids (full-corpus Lloyd, 16×2 — the
  // training inputs q38/q103/q126 have always shared), held once per
  // (session, sf dir): q38's per-call cost becomes assignment + probed
  // scan, and the q38 ≡ q103 pin identity is free because build and
  // inline consume the SAME frame. Driver-sized local literal relation
  // (see Similarity.kmeansCentroids).
  private val ivfCentroidCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), org.apache.spark.sql.DataFrame]
  private def ivfCentroids(s: SparkSession, d: String) =
    ivfCentroidCache.getOrElseUpdate((s, d),
      Similarity.kmeansCentroids(emb(s, d), "vec_id", "embedding", 16, 2))

  // The PQ family's trained model — (coarse centroids, codebook), both
  // learned on the deterministic id-mod-8 sample — held once per
  // (session, sf dir). Training is the OFFLINE step of the lifecycle
  // (the model is k·d + m·kCodes·(d/m) floats, driver-sized by
  // construction, materialized as local literal relations); q122/q123
  // pay encode + scan per call, q130 only the probe. One model feeds all
  // three, which is also what pins q123 ≡ q130.
  private val pqModelCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]
  private def pqModels(s: SparkSession, d: String) =
    pqModelCache.getOrElseUpdate((s, d), {
      val sample = emb(s, d).filter(pmod(col("vec_id"), lit(8)) === 0)
      (Similarity.kmeansCentroids(sample, "vec_id", "embedding", 16, 2),
        Similarity.pqTrain(sample, "vec_id", "embedding", 8, 64, 2))
    })

  // DuckDB-side exact cosine pairs >= 0.45 (shared oracle for the exact
  // blocked join AND the hyperplane-LSH path — with 32 bands × 3 rows the
  // fixed-seed sketch's per-pair miss probability at the threshold is
  // ~4e-5, and recall measured 1.0 at sf0.001/0.01/0.1; SimilaritySpec
  // asserts LSH == exact on real embeddings).
  private val OCosinePairs =
    """WITH v AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
        FROM embeddings)
      SELECT a.vec_id id_a, b.vec_id id_b,
        round(list_sum(list_transform(generate_series(1, len(a.embedding)),
                i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
              / (a.nrm * b.nrm), 6) cos
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE round(list_sum(list_transform(generate_series(1, len(a.embedding)),
                i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
              / (a.nrm * b.nrm), 6) >= 0.45
      ORDER BY id_a, id_b"""

  private[graft] val defs: Seq[QueryDef] = Seq(

    // q145: Johnson–Lindenstrauss random projection 64→16 dims with the
    // seed-derived ±1/√16 sign matrix (Achlioptas 2003) — the embedding
    // compression step before ANN/clustering: 4× less shuffle volume for
    // every downstream pair join at bounded cosine distortion
    // (SimilaritySpec measures the distortion on the real corpus). Matrix
    // regenerated from md5 parity by both engines; map-side only, zero
    // shuffle, left-to-right accumulation replayed by the oracle.
    QueryDef("q145_random_projection",
      (s, d) => Similarity.randomProjection(emb(s, d), "vec_id", "embedding",
          16, "jl42", dKnown = 64)
        .orderBy("vec_id", "dim"),
      Some("""SELECT e.vec_id, CAST(j.j AS INTEGER) AS dim,
          round(list_sum(list_transform(generate_series(1, len(e.embedding)),
            i -> e.embedding[i]::DOUBLE *
              (CASE WHEN ('0x' || substr(md5('jl42:' || j.j || ':' || (i - 1)), 1, 8))::BIGINT % 2 = 0
                THEN 1.0 ELSE -1.0 END))) / sqrt(16), 6) AS value
        FROM embeddings e, (SELECT unnest(generate_series(0, 15)) j) j
        ORDER BY vec_id, dim""")),

    // q146: hard-negative mining (DPR recipe) — for each query vector the
    // top-10 most-similar vectors with a DIFFERENT label: the contrastive
    // negatives near the decision boundary. Same query-broadcast blocked
    // join + two-phase top-k as q37 with the label inequality composed in.
    QueryDef("q146_hard_negatives",
      (s, d) => Similarity.hardNegatives(emb(s, d), "vec_id", "embedding",
          "label", col("vec_id") < 20, 10)
        .select(col("query_id"), col("rank").cast("int").as("rnk"),
          col("neighbor_id"), col("cos"))
        .orderBy("query_id", "rnk"),
      Some("""WITH v AS (
          SELECT vec_id, embedding, label,
                 sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
          FROM embeddings),
        p AS (
          SELECT q.vec_id query_id, n.vec_id neighbor_id,
            round(list_sum(list_transform(generate_series(1, len(q.embedding)),
                    i -> q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE))
                  / (q.nrm * n.nrm), 6) cos
          FROM v q JOIN v n ON n.vec_id != q.vec_id AND n.label != q.label
          WHERE q.vec_id < 20)
        SELECT query_id, CAST(rn AS INTEGER) rnk, neighbor_id, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) rn
          FROM p) t
        WHERE rn <= 10 ORDER BY query_id, rnk""")),

    // q149: retrieval-evaluation metrics — recall@10, MRR@10 and
    // binary-gain nDCG@10 per query over the q37 brute-force ranking,
    // with same-label as the relevance proxy: the measurement loop that
    // tunes every ANN knob (nProbe, refine, banding) lives IN the engine,
    // not in a notebook. Bounded joins only (top-k × relevance set); DCG
    // sums run left-to-right over rank-sorted term arrays so the oracle
    // replays the float accumulation exactly.
    QueryDef("q149_retrieval_metrics",
      (s, d) => {
        val e = emb(s, d)
        val ranking = Similarity.bruteForceTopK(e, "vec_id", "embedding",
          col("vec_id") < 20, 10)
        val rels = e.as("q").join(e.as("n"),
            col("q.label") === col("n.label") &&
              col("q.vec_id") =!= col("n.vec_id"))
          .filter(col("q.vec_id") < 20)
          .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("doc_id"))
        Similarity.retrievalMetrics(ranking, rels, 10).orderBy("query_id")
      },
      Some("""WITH v AS (
          SELECT vec_id, embedding, label,
                 sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
          FROM embeddings),
        p AS (
          SELECT q.vec_id query_id, n.vec_id neighbor_id,
            round(list_sum(list_transform(generate_series(1, len(q.embedding)),
                    i -> q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE))
                  / (q.nrm * n.nrm), 6) cos
          FROM v q JOIN v n ON n.vec_id != q.vec_id
          WHERE q.vec_id < 20),
        rk AS (SELECT query_id, neighbor_id, rn AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) rn FROM p) t
          WHERE rn <= 10),
        rel AS (SELECT a.vec_id query_id, b.vec_id doc_id
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id != b.vec_id
          WHERE a.vec_id < 20),
        nr AS (SELECT query_id, count(*) n_rel FROM rel GROUP BY 1),
        hit AS (SELECT rk.query_id, rk.rank,
            CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END r
          FROM rk LEFT JOIN rel
            ON rk.query_id = rel.query_id AND rk.neighbor_id = rel.doc_id),
        agg AS (SELECT query_id,
            CAST(sum(r) AS BIGINT) hits,
            CAST(min(CASE WHEN r = 1 THEN rank END) AS INTEGER) first_hit,
            list_sum(list(CASE WHEN r = 1 THEN 1.0 / log2(rank + 1.0)
              ELSE 0.0 END ORDER BY rank)) dcg
          FROM hit GROUP BY 1)
        SELECT a.query_id, coalesce(nr.n_rel, 0) AS n_rel, a.hits,
          a.first_hit,
          CASE WHEN coalesce(nr.n_rel, 0) > 0
            THEN round(a.hits / nr.n_rel, 6) END AS recall_at_k,
          CASE WHEN a.first_hit IS NULL THEN 0.0
            ELSE round(1.0 / a.first_hit, 6) END AS mrr,
          CASE WHEN coalesce(nr.n_rel, 0) > 0 THEN
            round(a.dcg / list_sum(list_transform(
              generate_series(1, least(nr.n_rel, 10)),
              i -> 1.0 / log2(i + 1.0))), 6) END AS ndcg
        FROM agg a LEFT JOIN nr ON a.query_id = nr.query_id
        ORDER BY a.query_id""")),

    // q37: brute-force cosine top-10 for the first 20 vectors — the exact
    // ANN baseline. Query side broadcast; two-phase top-k (see Similarity).
    QueryDef("q37_embedding_topk",
      (s, d) => Similarity.bruteForceTopK(emb(s, d), "vec_id", "embedding",
          col("vec_id") < 20, 10)
        .select(col("query_id"), col("rank").cast("int").as("rnk"),
          col("neighbor_id"), col("cos"))
        .orderBy("query_id", "rnk"),
      Some("""WITH v AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
          FROM embeddings),
        p AS (
          SELECT q.vec_id query_id, n.vec_id neighbor_id,
            round(list_sum(list_transform(generate_series(1, len(q.embedding)),
                    i -> q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE))
                  / (q.nrm * n.nrm), 6) cos
          FROM v q JOIN v n ON n.vec_id != q.vec_id
          WHERE q.vec_id < 20)
        SELECT query_id, CAST(rn AS INTEGER) rnk, neighbor_id, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) rn
          FROM p) t
        WHERE rn <= 10 ORDER BY query_id, rnk""")),

    // q99: int8-quantized brute-force cosine top-10 — the compressed-
    // domain exact baseline. Max-abs scalar quantization (a single-pass
    // codegen'd expression) emits integer-valued vectors whose pair dots
    // are integer-exact, so the oracle recomputes the IDENTICAL doubles
    // from the same floor(x*127/amax + 0.5) formula: a hash-matched
    // oracle for the compressed path (q38's IVF is the scan-fraction
    // lever; quantization is the 4x memory/bandwidth lever at 100 TB).
    QueryDef("q99_quantized_topk",
      (s, d) => Similarity.quantizedTopK(emb(s, d), "vec_id", "embedding",
          col("vec_id") < 20, 10)
        .select(col("query_id"), col("rank").cast("int").as("rnk"),
          col("neighbor_id"), col("cos").as("qcos"))
        .orderBy("query_id", "rnk"),
      Some("""WITH qv AS (
          SELECT vec_id,
            list_transform(embedding, x -> floor(x::DOUBLE * 127.0 / amax + 0.5)) q
          FROM (SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) amax
                FROM embeddings)
          WHERE amax > 0),
        v AS (SELECT vec_id, q, sqrt(list_sum(list_transform(q, x -> x * x))) nrm FROM qv),
        p AS (
          SELECT a.vec_id query_id, n.vec_id neighbor_id,
            round(list_sum(list_transform(generate_series(1, len(a.q)),
                    i -> a.q[i] * n.q[i])) / (a.nrm * n.nrm), 6) qcos
          FROM v a JOIN v n ON n.vec_id != a.vec_id
          WHERE a.vec_id < 20)
        SELECT query_id, CAST(rn AS INTEGER) rnk, neighbor_id, qcos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) rn
          FROM p) t
        WHERE rn <= 10 ORDER BY query_id, rnk""")),

    // q231: binary sign-quantized Hamming top-10 — the 1-bit compression
    // rung next to q99's int8 (32× memory vs 4×): 64 float dims pack
    // into two 32-bit sign words, candidates come from XOR+popcount
    // Hamming in the compressed domain (top-64 shortlist per query,
    // deterministic (hamming, id) boundary), and the exact float cosine
    // reranks ONLY the shortlist — full vectors move for candidates
    // alone. Fully deterministic ⇒ the oracle replays the packing, the
    // Hamming shortlist, and the rounded-cos rerank bit-for-bit; recall
    // vs the exact q37 ranking is measured in SimilaritySpec.
    QueryDef("q231_binary_hamming_topk",
      (s, d) => Similarity.binaryHammingTopK(emb(s, d), "vec_id",
          "embedding", col("vec_id") < 20, 64, 10)
        .select(col("query_id"), col("rank").cast("int").as("rnk"),
          col("neighbor_id"), col("hamming"), col("cos"))
        .orderBy("query_id", "rnk"),
      Some("""WITH c AS (
          SELECT vec_id,
            CAST(list_sum(list_transform(generate_series(1, 32),
              j -> CASE WHEN embedding[j] > 0
                THEN (1::BIGINT << (j - 1)) ELSE 0 END)) AS BIGINT) lo,
            CAST(list_sum(list_transform(generate_series(33, 64),
              j -> CASE WHEN embedding[j] > 0
                THEN (1::BIGINT << (j - 33)) ELSE 0 END)) AS BIGINT) hi,
            embedding,
            sqrt(list_sum(list_transform(embedding,
              x -> x::DOUBLE * x::DOUBLE))) nrm
          FROM embeddings),
        h AS (
          SELECT q.vec_id query_id, n.vec_id id,
            bit_count(xor(q.lo, n.lo)) + bit_count(xor(q.hi, n.hi)) hamming
          FROM c q JOIN c n ON n.vec_id != q.vec_id
          WHERE q.vec_id < 20),
        sl AS (SELECT query_id, id, hamming FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY hamming, id) rn FROM h) t
          WHERE rn <= 64),
        r AS (
          SELECT sl.query_id, sl.id, sl.hamming,
            round(list_sum(list_transform(
                generate_series(1, len(q.embedding)),
                i -> q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE))
              / (q.nrm * n.nrm), 6) cos
          FROM sl JOIN c q ON q.vec_id = sl.query_id
            JOIN c n ON n.vec_id = sl.id)
        SELECT query_id, CAST(rn AS INTEGER) rnk, id AS neighbor_id,
          CAST(hamming AS INTEGER) hamming, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, id) rn FROM r) t
        WHERE rn <= 10 ORDER BY query_id, rnk""")),

    // q238: PCA of the embedding corpus from the EXACT integer moments —
    // the spectral read (intrinsic dimensionality, anisotropy, the
    // whitening basis JL/IVF/PQ all implicitly fight): the cluster
    // computes only the two combinable moment aggregates (q236's Gram
    // triangle + per-dim micro sums), and the 64×64 eigenproblem runs
    // on the driver by cyclic Jacobi with a fixed sweep order —
    // bit-reproducible, so GoldenHashSpec pins the content; no SQL
    // engine replays a Jacobi sweep, hence rows-only at the driver (the
    // q128 stance). Output: top-8 components × 64 sign-fixed loadings.
    QueryDef("q238_pca_components",
      (s, d) => graft.operators.Similarity
        .principalComponents(emb(s, d), "embedding", 8)
        .select(col("component"), col("dim"),
          round(col("loading"), 6).as("loading"),
          round(col("eigenvalue"), 6).as("eigenvalue"))
        .orderBy("component", "dim"),
      None),

    // q140: hybrid retrieval via reciprocal-rank fusion — the exact float
    // ranking (q37's path) and the int8-quantized ranking (q99's path)
    // each contribute their top-20 per query; RRF (1/(60+rank), Cormack
    // SIGIR'09) fuses them into a final top-10. Rank-based fusion needs
    // no score calibration across the two scales, and because both input
    // rankings are deterministic the fused order is too — full DuckDB
    // oracle replays both rankings and the fuse. At scale the inputs are
    // any two ANN/term rankings (IVF-PQ + BM25 being the production pair);
    // the fuse itself only ever sees Σk candidates per query.
    QueryDef("q140_rrf_fusion",
      (s, d) => {
        val e = emb(s, d)
        val isQ = col("vec_id") < 20
        graft.operators.Similarity.rrfFuse(Seq(
            graft.operators.Similarity.bruteForceTopK(e, "vec_id", "embedding", isQ, 20),
            graft.operators.Similarity.quantizedTopK(e, "vec_id", "embedding", isQ, 20)),
          k = 10)
          .select(col("query_id"), col("rank").cast("int").as("rnk"),
            col("neighbor_id"), col("rrf"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH v AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
          FROM embeddings),
        p AS (
          SELECT q.vec_id query_id, n.vec_id neighbor_id,
            round(list_sum(list_transform(generate_series(1, len(q.embedding)),
                    i -> q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE))
                  / (q.nrm * n.nrm), 6) cos
          FROM v q JOIN v n ON n.vec_id != q.vec_id
          WHERE q.vec_id < 20),
        exact_r AS (
          SELECT query_id, neighbor_id, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) rn FROM p) t
          WHERE rn <= 20),
        qv AS (
          SELECT vec_id,
            list_transform(embedding, x -> floor(x::DOUBLE * 127.0 / amax + 0.5)) q
          FROM (SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) amax
                FROM embeddings)
          WHERE amax > 0),
        v2 AS (SELECT vec_id, q, sqrt(list_sum(list_transform(q, x -> x * x))) nrm FROM qv),
        p2 AS (
          SELECT a.vec_id query_id, n.vec_id neighbor_id,
            round(list_sum(list_transform(generate_series(1, len(a.q)),
                    i -> a.q[i] * n.q[i])) / (a.nrm * n.nrm), 6) qcos
          FROM v2 a JOIN v2 n ON n.vec_id != a.vec_id
          WHERE a.vec_id < 20),
        quant_r AS (
          SELECT query_id, neighbor_id, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY qcos DESC, neighbor_id) rn FROM p2) t
          WHERE rn <= 20),
        u AS (SELECT * FROM exact_r UNION ALL SELECT * FROM quant_r),
        f AS (
          SELECT query_id, neighbor_id,
            round(sum(1.0 / (60 + rn)), 6) rrf
          FROM u GROUP BY query_id, neighbor_id)
        SELECT query_id, CAST(rn AS INTEGER) rnk, neighbor_id, rrf FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, neighbor_id) rn FROM f) t
        WHERE rn <= 10 ORDER BY query_id, rnk""")),

    // q38: IVF approximate top-10 (16 k-means-trained centroids, probe 4)
    // — the ANN scale path: 2 Lloyd rounds refine the seed centroids, then
    // each query scans ~nProbe/nCentroids of the corpus. Approximate by
    // design ⇒ rows-only driver check; recall vs q37 asserted in
    // SimilaritySpec.
    QueryDef("q38_ann_ivf",
      (s, d) => {
        val e = emb(s, d)
        // centroids from the session model cache (identical values to
        // training inline — same full-corpus Lloyd); per call this demo
        // pays assignment + the probed-bucket scan
        Similarity.ivfTopKWith(e, "vec_id", "embedding",
            col("vec_id") < 20, 10, 4, ivfCentroids(s, d))
          .select(col("query_id"), col("rank").cast("int").as("rnk"),
            col("neighbor_id"), col("cos"))
          .orderBy("query_id", "rnk")
      },
      None),

    // q103: the materialized-index IVF lifecycle as a driver-visible query:
    // the session's FIRST call builds the bucket-partitioned index (k-means
    // centroids + one assignment pass, persisted via TableSink); every
    // later call probes the saved index with no corpus re-assignment —
    // the probed bucket set reaches the index scan as a runtime partition
    // filter. The build-once/probe-many shape an ANN service runs at
    // 100 TB. Approximate by design ⇒ rows-only driver check; identity
    // with the inline path and the assignment-free plan are asserted in
    // SimilaritySpec.
    QueryDef("q103_ivf_indexed",
      (s, d) => {
        val path = ivfIndexCache.getOrElseUpdate((s, d), {
          val p = java.nio.file.Files.createTempDirectory("graft_ivf_q103").toString
          Similarity.buildIvfIndex(emb(s, d), "vec_id", "embedding",
            ivfCentroids(s, d), p)
          p
        })
        Similarity.ivfTopKIndexed(s, path, emb(s, d).filter(col("vec_id") < 20),
            "vec_id", "embedding", 10, 4)
          .select(col("query_id"), col("rank").cast("int").as("rnk"),
            col("neighbor_id"), col("cos"))
          .orderBy("query_id", "rnk")
      },
      None),

    // q39: embedding near-dup pairs (cosine ≥ 0.45), EXACT — a blocked
    // equi-join (1-bucket-theta): O(n²) cosine work partitioned across
    // blocks² shuffle cells, no BroadcastNestedLoopJoin anywhere in the
    // plan. Sign-LSH cannot prune this corpus at 0.45 (bit-agreement 0.648
    // vs 0.5 background keeps ~98% of pairs as candidates — measured, see
    // SCALING.md), so exact-partitioned is the honest scale plan here.
    QueryDef("q39_embedding_pairs",
      (s, d) => Similarity.cosinePairs(emb(s, d), "vec_id", "embedding", 0.45)
        .orderBy("id_a", "id_b"),
      Some(OCosinePairs)),

    // q94: the same pair set through random-hyperplane LSH banding + exact
    // verify — the sublinear candidate path for corpora/thresholds where
    // the angle gap is real (cos ≥ 0.7 on near-orthogonal background).
    // Candidates ride an equi-join on (band, key) carrying ids only; the
    // exact cosine check re-joins vectors per surviving pair, so false
    // candidates cost work, never rows. Exact oracle: recall measured 1.0
    // at every SF with the fixed seed (miss prob ~4e-5/pair at 0.45).
    QueryDef("q94_lsh_pairs",
      (s, d) => Similarity.cosinePairsLsh(emb(s, d), "vec_id", "embedding", 0.45)
        .orderBy("id_a", "id_b"),
      Some(OCosinePairs)),

    // q108: SemDeDup — semantic (embedding-space) dedup: k-means clusters,
    // then drop any vector with a lower-id neighbor at cos ≥ 0.5 inside its
    // cluster; intra-cluster pair-work spread per (bucket, grid-cell).
    // Rows-only by design (k-means is not SQL-expressible); exactness on
    // planted duplicate structure is SimilaritySpec's semDedup case.
    QueryDef("q108_semdedup",
      (s, d) => Similarity.semDedup(emb(s, d), "vec_id", "embedding",
          threshold = 0.5, k = 8, iters = 2)
        .select(col("id").as("vec_id"), col("bucket"))
        .orderBy("vec_id"),
      None),

    // q122: product-quantization ANN top-k (Jégou et al. TPAMI 2011) —
    // codebook trained as ONE grouped Lloyd over all subspaces, corpus
    // stored as m small codes, queries scored against the
    // broadcast-codebook reconstruction (≡ the ADC lookup-table sum, in
    // deterministic codegen'd order). This query runs the WHOLE lifecycle
    // (sampled train → full encode → search) per call, so it sizes the
    // codebook at 6-bit/sub (64 codewords, id-mod-8 training sample);
    // PqSpec exercises the standard 8-bit PQ8 and pins recall. A real
    // deployment materializes the codes once (the q103 IVF lifecycle
    // argument) and amortizes everything but the search. refine=50
    // re-ranks the ADC top-50 with exact cosine (FAISS IndexRefineFlat
    // posture): refine recall is capped by ADC candidate COVERAGE, a
    // corpus-relative knob — measured at the 8x ScaleCheck corpus:
    // ADC-only 0.18, R=50 0.37, R=500 (~0.1% of corpus) 0.87, R=5000
    // (1%) 1.00 (SCALING.md). Approximate ⇒ rows-only; recall and
    // determinism are PqSpec's contract.
    QueryDef("q122_pq_topk",
      (s, d) => {
        // codebook from the session model cache — identical values to
        // training inline with trainMod=8 (same sample, same arithmetic),
        // but the demo's per-call cost is the serving cost: encode + ADC
        // + refine, never Lloyd
        val (_, cb) = pqModels(s, d)
        graft.operators.Similarity
          .pqTopKWith(emb(s, d), "vec_id", "embedding", col("vec_id") < 20,
            10, cb, refine = 50, mKnown = 8)
          .select(col("query_id"), col("rank").cast("int").as("rnk"),
            col("neighbor_id"), col("cos"))
          .orderBy("query_id", "rnk")
      },
      None),

    // q123: IVF-PQ ANN top-k — the FAISS-style pairing of both ANN
    // levers: coarse IVF buckets bound WHICH vectors each query scans
    // (nProbe/nCentroids of the corpus), PQ codes bound WHAT is stored
    // and scanned per vector (m bytes vs 4·d). Composition of q38's
    // bucketing and q122's codebooks, with q122's exact refine stage on
    // top (candidates from probed buckets only, then nq·50 exact dots);
    // rows-only, recall + determinism in PqSpec.
    QueryDef("q123_ivfpq_topk",
      (s, d) => {
        // both models from the session cache (the offline step); per call
        // this demo pays assignment + encode + probed-bucket ADC + refine
        val (coarse, cb) = pqModels(s, d)
        graft.operators.Similarity
          .ivfPqTopKWith(emb(s, d), "vec_id", "embedding", col("vec_id") < 20,
            10, 4, coarse, cb, refine = 50, mKnown = 8)
          .select(col("query_id"), col("rank").cast("int").as("rnk"),
            col("neighbor_id"), col("cos"))
          .orderBy("query_id", "rnk")
      },
      None),

    // q130: the materialized IVF-PQ index lifecycle — q123's whole
    // training+encode pipeline (coarse k-means, grouped-Lloyd codebook,
    // corpus encode, bucket assignment) runs ONCE per (session, dir) into
    // a saved index whose at-rest form is m=8 one-byte codes per vector;
    // every later call is a probe (+ the refine re-rank against the
    // source vector table — the DiskANN split: codes serve candidates,
    // the flat table serves nq·50 exact dots): partition-pruned bucket reads +
    // map-side broadcast-codebook decode (ADC). The shape an ANN service
    // actually runs at 100 TB — the corpus-encode scan is never paid per
    // query batch. Approximate ⇒ rows-only; exact identity with the inline
    // ivfPqTopKWith over the same centroids/codebook is PqSpec's contract.
    QueryDef("q130_ivfpq_indexed",
      (s, d) => {
        val path = ivfPqIndexCache.getOrElseUpdate((s, d), {
          // the SAME session model as q122/q123 (pqModels) — the q123 ≡
          // q130 golden-pin identity requires identical (centroids,
          // codebook) inputs
          val (coarse, cb) = pqModels(s, d)
          val p = java.nio.file.Files.createTempDirectory("graft_ivfpq_q130").toString
          Similarity.buildPqIndex(emb(s, d), "vec_id", "embedding", coarse, cb, p)
          p
        })
        Similarity.ivfPqTopKIndexed(s, path,
            emb(s, d).filter(col("vec_id") < 20), "vec_id", "embedding", 10, 4,
            refine = 50, exactVecs = Some(emb(s, d)))
          .select(col("query_id"), col("rank").cast("int").as("rnk"),
            col("neighbor_id"), col("cos"))
          .orderBy("query_id", "rnk")
      },
      None),

    // q126: FILTERED vector search — the predicate is pushed INTO the
    // saved IVF index scan (label is materialized into the bucket table at
    // build time; PushedFilters asserted in FilteredAnnSpec), so top-k
    // ranks only matching rows. Post-filtering an unfiltered top-k would
    // under-return whenever a neighborhood is dominated by non-matching
    // vectors (~90% here). Approximate ⇒ rows-only; exact identity with
    // the assign-after-filter inline path is FilteredAnnSpec's contract.
    QueryDef("q126_filtered_ann",
      (s, d) => {
        val path = ivfMetaIndexCache.getOrElseUpdate((s, d), {
          val p = java.nio.file.Files.createTempDirectory("graft_ivf_q126").toString
          Similarity.buildIvfIndex(emb(s, d), "vec_id", "embedding",
            ivfCentroids(s, d), p, metaCols = Seq("label"))
          p
        })
        Similarity.ivfTopKIndexed(s, path,
            emb(s, d).filter(col("label") === 1 && col("vec_id") < 30),
            "vec_id", "embedding", 10, 4, pred = col("label") === 1)
          .select(col("query_id"), col("rank").cast("int").as("rnk"),
            col("neighbor_id"), col("cos"))
          .orderBy("query_id", "rnk")
      },
      None),

    // q127: MMR diversity re-ranking (Carbonell & Goldstein SIGIR'98) over
    // an exact top-30 pool: λ·rel − (1−λ)·max-cos-to-selected, greedy —
    // the pass that stops near-duplicate neighbors crowding a result list.
    // Candidate generation is the distributed two-phase top-k; selection is
    // per-query imperative logic over a 30-bounded list, queries
    // partition-parallel. Iterative greedy ⇒ rows-only; the λ=1 ≡
    // relevance-ranking identity and a hand-checked diversity case are
    // FilteredAnnSpec's contract.
    QueryDef("q127_mmr_rerank",
      (s, d) => Similarity.mmrRerank(emb(s, d), "vec_id", "embedding",
          col("vec_id") < 10, k = 10, poolSize = 30, lambda = 0.5)
        .orderBy("query_id", "rank"),
      None),

    // q152: embedding-space benchmark decontamination — the semantic
    // sibling of q97's n-gram check, catching paraphrased eval leakage no
    // shared 8-gram reveals. Benchmark slice = vec_id ≡ 0 (mod 20),
    // broadcast by the operator's small-eval-suite contract; the corpus
    // streams map-side (zero corpus shuffle), per-vector argmax is a
    // combinable max_by agg.
    QueryDef("q152_semantic_decontamination",
      (s, d) => Similarity.semanticContamination(emb(s, d), "vec_id",
          "embedding", pmod(col("vec_id"), lit(20)) === 0, 0.35)
        .select(col("id").as("vec_id"), col("bench_id"), col("cos"))
        .orderBy("vec_id"),
      Some("""WITH v AS (
          SELECT vec_id, embedding,
            sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
          FROM embeddings),
        b AS (SELECT vec_id bench_id, embedding be, nrm bnrm
              FROM v WHERE vec_id % 20 = 0),
        c AS (SELECT vec_id, embedding, nrm FROM v WHERE vec_id % 20 <> 0),
        p AS (SELECT c.vec_id, b.bench_id,
            round(list_sum(list_transform(generate_series(1, len(c.embedding)),
              i -> c.embedding[i]::DOUBLE * b.be[i]::DOUBLE))
              / (c.nrm * b.bnrm), 6) cos
          FROM c CROSS JOIN b),
        f AS (SELECT * FROM p WHERE cos >= 0.35)
        SELECT vec_id, bench_id, cos FROM (
          SELECT vec_id, bench_id, cos,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, bench_id) rn
          FROM f) r
        WHERE rn = 1 ORDER BY vec_id""")),

    // q249: margin-scored mutual-nearest-neighbor mining (Artetxe &
    // Schwenk ACL'19 ratio margin) — the pair-MINING read of the ANN
    // family: q37 answers "what is near x", this answers "which pairs
    // pick EACH OTHER", with the cosine normalized by both endpoints'
    // 4-NN neighborhood density so hub vectors (near everything, the
    // known failure of raw-cosine mining) stop dominating. Universe =
    // the first-200 evaluation slice (the q68/q37 bounded-set stance);
    // at 100 TB the operator runs per LSH/IVF candidate block. Output:
    // mutual top-1 pairs with cosine and ratio margin.
    QueryDef("q249_mutual_knn_margin",
      (s, d) => Similarity.mutualTopKMargin(
          emb(s, d).filter(col("vec_id") < 200), "vec_id", "embedding", 4)
        .orderBy("id_a"),
      Some("""WITH v AS (
          SELECT vec_id, embedding,
            sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
          FROM embeddings WHERE vec_id < 200),
        p AS (SELECT a.vec_id ia, b.vec_id ib,
            round(list_sum(list_transform(generate_series(1, len(a.embedding)),
                i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
              / (a.nrm * b.nrm), 6) cos
          FROM v a JOIN v b ON a.vec_id != b.vec_id),
        r AS (SELECT ia, ib, cos,
            row_number() OVER (PARTITION BY ia ORDER BY cos DESC, ib) rnk
          FROM p),
        t1 AS (SELECT ia, ib, cos FROM r WHERE rnk = 1),
        s4 AS (SELECT ia, list_sum(list(cos ORDER BY cos, ib)) sk,
            count(*) ck
          FROM r WHERE rnk <= 4 GROUP BY ia)
        SELECT t.ia id_a, t.ib id_b, t.cos,
          round(t.cos / ((sa.sk / sa.ck + sb.sk / sb.ck) / 2.0), 6) margin
        FROM t1 t JOIN t1 u ON t.ib = u.ia AND u.ib = t.ia AND t.ia < t.ib
        JOIN s4 sa ON sa.ia = t.ia
        JOIN s4 sb ON sb.ia = t.ib
        ORDER BY id_a""")),
  )
}
