package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Mixture, Packing, Sampling, Similarity}
import graft.functions.{SketchExpressions, TextFns}

/** LLM-data-pipeline closure over `documents` and `embeddings` (north star,
  * /root/repo/BASELINE.json): dedup (exact, MinHash-LSH, SimHash, exact
  * n-gram Jaccard), similarity search (brute-force + IVF ANN), and text
  * analysis (quality stats, token counts, language-ID heuristic,
  * fingerprinting).
  *
  * Oracle portability rule: every hash the oracle must reproduce is
  * md5-derived (TextFns.hash32), every float is computed float→double per
  * element and summed left-to-right, and every output is totally ordered.
  * Floats are either grid-immune rounded sums or RAW single-division
  * doubles (bit-identical across engines — rounding a ratio whose
  * denominator is 2^a·5^b-smooth flips at half-boundaries, see q31).
  * DuckDB SQL mirrors the computation op-for-op.
  */
object TextOps {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** q137's scoring, exposed for spec-level semantics: deflate the UTF-8
    * text (codegen'd zlib Expression) and score ratio_micro =
    * ⌊1e6·deflated/raw⌋; repetitive ⇔ ratio < 0.4. Empty text is a
    * SEPARATE case, not maximal repetition: ratio and flag are NULL for
    * n_bytes=0 (Gopher-style filters treat empties with a dedicated
    * length gate, and ratio 0 would have tagged them repetitive=true).
    */
  def compressionRatio(s: SparkSession,
      documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dl = graft.functions.TextCompression.deflatedLen(s, col("text"))
    documents.select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        dl.cast("long").as("n_deflate"))
      .withColumn("ratio_micro",
        when(col("n_bytes") > 0,
          expr("(1000000 * n_deflate) div n_bytes")).otherwise(lit(null)))
      .withColumn("repetitive",
        when(col("n_bytes") > 0, col("ratio_micro") < 400000L)
          .otherwise(lit(null)))
  }

  // Shared dedup index: q34, q77 and q85 all consume the exact-Jaccard
  // pair set — memoized per (session, sf dir) and persist()'d, the way a
  // real pipeline materializes its candidate-pair index. persist, NOT
  // localCheckpoint, deliberately: this frame is SESSION-lived, and a
  // memo that survives the session must survive executor loss — persist
  // recomputes lost blocks from lineage, where localCheckpoint's truncated
  // lineage would hand every later caller a permanently poisoned frame.
  // (A clearCache() de-materializes it; it transparently recomputes.)
  // Bounded: one tiny (pairs ≪ docs) frame per data dir per session.
  private val pairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), org.apache.spark.sql.DataFrame]
  private def jaccardPairs(s: SparkSession, d: String) =
    pairsCache.getOrElseUpdate((s, d),
      Dedup.ngramJaccard(docs(s, d), "doc_id", "text", 3, 0.6).persist())
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // q103's saved IVF index, built once per (session, sf dir) — the
  // build-once/probe-many lifecycle; later calls are pure probes.
  private val ivfIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  // q147's saved MinHash-LSH near-dup index over the corpus slice — same
  // build-once lifecycle; later calls are pure batch probes.
  private val lshIndexCache =
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

  // q124/q125's trained BPE model, learned once per (session, sf dir): the
  // merge list is driver-sized by construction (one argmax row per round);
  // the segmentation table stays distributed. Durability of the memoized
  // segments frame follows Checkpoints' mode: with graft.checkpoint.dir set
  // (the cluster posture) the final round is a reliable checkpoint that
  // survives executor loss; in localCheckpoint mode it is single-node
  // session state, same as every iterative operator here.
  private val bpeModelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.operators.Bpe.Model]
  private def bpeModel(s: SparkSession, d: String) =
    bpeModelCache.getOrElseUpdate((s, d),
      graft.operators.Bpe.learn(docs(s, d), "text", numMerges = 20, minCount = 2))

  // DuckDB-side token pipeline shared by several oracles.
  private val OToks =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""
  // DuckDB-side distinct word 3-grams over token list t.
  private val OShingles =
    """list_distinct([array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)])"""
  // DuckDB-side exact 3-gram Jaccard pairs >= 0.6 (shared oracle for the
  // exact inverted-index path AND the MinHash-LSH path — banding recall for
  // the planted ~0.99-similarity pairs is 1-(1-s^4)^12 ≈ 1-1e-13, and the
  // corpus has no pairs in (0.3, 0.8) to sit near the threshold).
  private val OJaccardPairs =
    s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
       sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
       inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
       pairs AS (
         SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
         FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4)
       SELECT id_a, id_b, round(inter / (na + nb - inter), 4) AS jaccard
       FROM pairs WHERE round(inter / (na + nb - inter), 4) >= 0.6
       ORDER BY id_a, id_b"""

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

  val defs: Seq[QueryDef] = Seq(

    // q30: exact dedup — one survivor (lowest doc_id) per md5 fingerprint
    // of the lowercased text. One fingerprint-shuffle; the scan stage
    // computes the hash so full text never ships twice.
    QueryDef("q30_dedup_exact",
      (s, d) => Dedup.exact(docs(s, d), lower(col("text")), "doc_id")
        .select("doc_id", "fingerprint")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, fingerprint FROM (
          SELECT doc_id, md5(lower(text)) AS fingerprint,
                 row_number() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) rn
          FROM documents) t
        WHERE rn = 1 ORDER BY doc_id""")),

    // q31: per-document quality stats — token counts, distinct ratio, mean
    // token length, stopword ratio, composite score. Pure map-side column
    // math (higher-order functions, no explode, no shuffle).
    QueryDef("q31_text_quality",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val nt = size(t).cast("long")
        val nd = size(array_distinct(t)).cast("long")
        val sumLen = aggregate(t, lit(0L), (acc, x) => acc + length(x))
        val stops = size(filter(t, x => x.isin("the", "a"))).cast("long")
        // Every ratio is ONE division of exact integers — bit-identical
        // doubles in both engines, so no rounding (and no rounding is
        // safe here: nt ∈ {32, 48, 64, 80, ...} is 2^a·5^b-smooth, so the
        // true quality lands EXACTLY on 4th-decimal half-boundaries
        // (0.65875 at nt=80) where the engines' round() disagreed — 11
        // docs flipped at sf0.1. quality ≡ 0.4·nd/nt + 0.3·(1−st/nt) +
        // 0.3·min(nt,100)/100, over the common denominator 10000·nt.
        val quality = (lit(4000L) * nd + lit(3000L) * (nt - stops)
          + lit(30L) * least(nt, lit(100L)) * nt).cast("double") /
          (lit(10000L) * nt).cast("double")
        docs(s, d).select(
          col("doc_id"),
          size(t).as("n_tokens"),
          size(array_distinct(t)).as("n_distinct"),
          (sumLen.cast("double") / nt.cast("double")).as("avg_tok_len"),
          (stops.cast("double") / nt.cast("double")).as("stopword_ratio"),
          quality.as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
          m AS (SELECT doc_id, len(t) nt, len(list_distinct(t)) nd,
                  list_sum(list_transform(t, x -> len(x))) sl,
                  len(list_filter(t, x -> x IN ('the','a'))) st
                FROM x)
        SELECT doc_id,
          CAST(nt AS INTEGER) AS n_tokens,
          CAST(nd AS INTEGER) AS n_distinct,
          sl::DOUBLE / nt::DOUBLE AS avg_tok_len,
          st::DOUBLE / nt::DOUBLE AS stopword_ratio,
          (4000*nd + 3000*(nt-st) + 30*least(nt,100)*nt)::DOUBLE
            / (10000*nt)::DOUBLE AS quality
        FROM m ORDER BY doc_id""")),

    // q32: corpus token frequency top-20 — explode + two-level hash agg
    // (partial map-side combine keeps the shuffle at |vocab| rows).
    QueryDef("q32_token_topk",
      (s, d) => docs(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_total"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_total").desc, col("token"))
        .limit(20),
      Some(s"""SELECT token, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest($OToks) token FROM documents) t
        GROUP BY token ORDER BY n_total DESC, token LIMIT 20""")),

    // q33: language-ID heuristic — marker-word hit counts per language,
    // argmax with a fixed precedence tiebreak. (The synthetic corpus has no
    // real language signal; the operator contract is the deterministic
    // rule, mirrored exactly by the oracle.)
    QueryDef("q33_lang_id",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        def score(ws: Seq[String]) = size(filter(t, x => x.isin(ws: _*)))
        val sEn = score(Seq("the", "a", "fast", "slow"))
        val sEs = score(Seq("data", "query", "table"))
        val sDe = score(Seq("window", "group", "hash"))
        val sFr = score(Seq("join", "filter", "merge"))
        val sZh = score(Seq("spark", "scan", "batch"))
        docs(s, d).select(
          col("doc_id"), col("lang"),
          sEn.as("s_en"), sEs.as("s_es"), sDe.as("s_de"), sFr.as("s_fr"), sZh.as("s_zh"))
          .withColumn("predicted",
            when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de")
              && col("s_en") >= col("s_fr") && col("s_en") >= col("s_zh"), "en")
              .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr")
                && col("s_es") >= col("s_zh"), "es")
              .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), "de")
              .when(col("s_fr") >= col("s_zh"), "fr")
              .otherwise("zh"))
          .orderBy("doc_id")
      },
      Some(s"""WITH x AS (SELECT doc_id, lang, $OToks t FROM documents),
        sc AS (SELECT doc_id, lang,
          CAST(len(list_filter(t, x -> x IN ('the','a','fast','slow'))) AS INTEGER) s_en,
          CAST(len(list_filter(t, x -> x IN ('data','query','table'))) AS INTEGER) s_es,
          CAST(len(list_filter(t, x -> x IN ('window','group','hash'))) AS INTEGER) s_de,
          CAST(len(list_filter(t, x -> x IN ('join','filter','merge'))) AS INTEGER) s_fr,
          CAST(len(list_filter(t, x -> x IN ('spark','scan','batch'))) AS INTEGER) s_zh
        FROM x)
        SELECT doc_id, lang, s_en, s_es, s_de, s_fr, s_zh,
          CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
               WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
               WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
               WHEN s_fr >= s_zh THEN 'fr'
               ELSE 'zh' END AS predicted
        FROM sc ORDER BY doc_id""")),

    // q34: exact near-dup gold standard — 3-gram Jaccard ≥ 0.6 via
    // inverted-index self-join (cost Σ df² over shingles; run behind LSH
    // at adversarial scale).
    QueryDef("q34_ngram_jaccard",
      (s, d) => jaccardPairs(s, d)
        .orderBy("id_a", "id_b"),
      Some(OJaccardPairs)),

    // q35: MinHash-LSH near-dup — the linear-time scale path; banding
    // (12 bands × 4 rows over a 48-perm signature) generates candidates,
    // exact Jaccard verifies. Same oracle as q34 (see OJaccardPairs note).
    QueryDef("q35_minhash_lsh",
      (s, d) => Dedup.minHashLsh(docs(s, d), "doc_id", "text", 3, 0.6)
        .orderBy("id_a", "id_b"),
      Some(OJaccardPairs)),

    // q141: n-gram CONTAINMENT pairs — the asymmetric companion to q34's
    // Jaccard: |sh(A)∩sh(B)|/|sh(A)| ≥ 0.8 emits (contained, container)
    // DIRECTED (both directions of a mutual near-dup pass). Catches the
    // quoted-small-doc-inside-aggregation-page class symmetric Jaccard
    // structurally misses. Same inverted index, same Σdf² cost envelope
    // (gold-standard path; LSH banding stays the scale path for search).
    QueryDef("q141_ngram_containment",
      (s, d) => Dedup.ngramContainment(docs(s, d), "doc_id", "text", 3, 0.8)
        .orderBy("contained_id", "container_id"),
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
        pairs AS (
          SELECT a.doc_id contained_id, b.doc_id container_id, a.n na,
            count(*) inter
          FROM inv a JOIN inv b
            ON a.shingle = b.shingle AND a.doc_id != b.doc_id
          GROUP BY 1, 2, 3)
        SELECT contained_id, container_id,
          round(inter / na, 4) AS containment
        FROM pairs WHERE round(inter / na, 4) >= 0.8
        ORDER BY contained_id, container_id""")),

    // q142: sorted-neighborhood near-dup — the THIRD blocking family
    // (deterministic windowed, Hernández–Stolfo SNM) next to q35's LSH
    // and q34's inverted index: rank by text length (two-phase, no global
    // window), verify exact Jaccard only within ±10 rank positions via a
    // banded rank-block equi-join. O(n·w) candidates by construction;
    // recall vs the exact path measured in DedupSpec. Fully deterministic
    // ⇒ full DuckDB oracle replays rank, window and Jaccard.
    QueryDef("q142_snm_pairs",
      (s, d) => Dedup.snmPairs(docs(s, d), "doc_id", "text", 3, 10, 0.6)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t
          FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks
          WHERE len(t) >= 3),
        rw AS (SELECT doc_id,
            row_number() OVER (ORDER BY length(text), doc_id) - 1 AS pos
          FROM documents),
        cand AS (
          SELECT a.doc_id ia, b.doc_id ib FROM rw a JOIN rw b
          ON b.pos > a.pos AND b.pos <= a.pos + 10),
        scored AS (
          SELECT least(c.ia, c.ib) id_a, greatest(c.ia, c.ib) id_b,
            round(len(list_intersect(x.sh, y.sh)) /
              (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
              4) AS jaccard
          FROM cand c
          JOIN sets x ON x.doc_id = c.ia
          JOIN sets y ON y.doc_id = c.ib)
        SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.6
        ORDER BY id_a, id_b""")),

    // q143: MULTI-PASS sorted-neighborhood near-dup — Hernández–Stolfo's
    // actual algorithm (SIGMOD'95 §4 prescribes several runs with
    // independent keys): q142's length pass UNIONed with a first-6-chars
    // prefix-key pass before one shared exact-Jaccard verification. Each
    // pass is the same O(n·w) banded rank-block construction; the second
    // key closes the recall hole where an insertion shifts two near-dups'
    // lengths beyond the window but leaves their openings equal (DedupSpec
    // pins a constructed instance). Fully deterministic ⇒ the oracle
    // replays both rankings, the candidate union, and the verification.
    QueryDef("q143_snm_multipass",
      (s, d) => Dedup.snmPairsMultiPass(docs(s, d), "doc_id", "text", 3, 10, 0.6)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        pk AS (SELECT doc_id,
            least(ascii(substr(rpad(text, 6, ' '), 1, 1)), 127) * 34359738368
          + least(ascii(substr(rpad(text, 6, ' '), 2, 1)), 127) * 268435456
          + least(ascii(substr(rpad(text, 6, ' '), 3, 1)), 127) * 2097152
          + least(ascii(substr(rpad(text, 6, ' '), 4, 1)), 127) * 16384
          + least(ascii(substr(rpad(text, 6, ' '), 5, 1)), 127) * 128
          + least(ascii(substr(rpad(text, 6, ' '), 6, 1)), 127) AS k
          FROM documents),
        rw1 AS (SELECT doc_id,
            row_number() OVER (ORDER BY length(text), doc_id) - 1 AS pos
          FROM documents),
        rw2 AS (SELECT doc_id,
            row_number() OVER (ORDER BY k, doc_id) - 1 AS pos FROM pk),
        cand AS (
          SELECT least(a.doc_id, b.doc_id) ia, greatest(a.doc_id, b.doc_id) ib
          FROM rw1 a JOIN rw1 b ON b.pos > a.pos AND b.pos <= a.pos + 10
          UNION
          SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id)
          FROM rw2 a JOIN rw2 b ON b.pos > a.pos AND b.pos <= a.pos + 10),
        scored AS (
          SELECT c.ia id_a, c.ib id_b,
            round(len(list_intersect(x.sh, y.sh)) /
              (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
              4) AS jaccard
          FROM cand c
          JOIN sets x ON x.doc_id = c.ia
          JOIN sets y ON y.doc_id = c.ib)
        SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.6
        ORDER BY id_a, id_b""")),

    // q156: PREFIX-FILTERED exact Jaccard (Chaudhuri ICDE'06 / Bayardo
    // WWW'07 / PPJoin WWW'08) — the FOURTH candidate-generation family:
    // same exact output contract as q34 (hence the SAME oracle — the
    // hash-match IS the equivalence proof), but only each document's
    // (1−t)·|S|+1 RAREST shingles are indexed, so the self-join volume
    // collapses from Σdf² to Σdf_prefix² and corpus-wide boilerplate
    // shingles generate zero candidates. Unlike q35's LSH (probabilistic
    // recall) this is deterministic-lossless: the prefix lemma guarantees
    // every qualifying pair collides inside the indexed prefixes.
    QueryDef("q156_prefix_filter_jaccard",
      (s, d) => Dedup.ngramJaccardPrefix(docs(s, d), "doc_id", "text", 3, 0.6)
        .orderBy("id_a", "id_b"),
      Some(OJaccardPairs)),

    // q144: WINNOWING fingerprints (Schleimer–Wilkerson–Aiken SIGMOD'03,
    // the MOSS algorithm) — hash positional word 3-grams, keep each
    // 4-window's minimum (leftmost-min tie rule via the packed
    // h·2²⁰+pos key): any shared passage ≥ w+k−1 tokens shares a selected
    // fingerprint regardless of alignment, at ~2/(w+1) the postings of
    // the full shingle index. One map-side explode + one per-doc window
    // (both frames share the id shuffle) + distinct; fully deterministic
    // ⇒ the oracle replays the packed-key window-min verbatim.
    QueryDef("q144_winnowing",
      (s, d) => Dedup.winnow(docs(s, d), "doc_id", "text", 3, 4)
        .select(col("id").as("doc_id"), col("pos"), col("fp"))
        .orderBy("doc_id", "pos", "fp"),
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
            ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 8))::BIGINT
              * 1048576 + (i - 1) AS key
          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) i) s
          WHERE len(t) >= 3),
        w AS (SELECT doc_id, pos,
            min(key) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) sel,
            max(pos) OVER (PARTITION BY doc_id) mx
          FROM g)
        SELECT DISTINCT doc_id, sel % 1048576 AS pos, sel // 1048576 AS fp
        FROM w WHERE pos >= 3 OR pos = mx
        ORDER BY doc_id, pos, fp""")),

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

    // q147: INDEXED incremental near-dup — the at-rest MinHash-LSH index
    // lifecycle (build once on the standing corpus / probe each ingest
    // batch), the near-dup sibling of q105's exact incremental dedup and
    // of the q103/q130 vector-index lifecycles: at 100 TB the corpus
    // cannot re-sign itself per batch, so band postings + shingle sets
    // live as partitioned parquet and only the batch signs itself.
    // Corpus = doc_id % 5 != 0 (indexed once per session), batch = the
    // rest. Full oracle: the exact cross-slice inverted-index Jaccard —
    // the same shared-oracle argument as q35 (banding recall ≈ 1 at the
    // corpus's planted similarities; no pairs sit near the threshold).
    QueryDef("q147_lsh_indexed_neardup",
      (s, d) => {
        val path = lshIndexCache.getOrElseUpdate((s, d), {
          val p = java.nio.file.Files.createTempDirectory("graft_lsh_q147").toString
          Dedup.buildLshIndex(docs(s, d).filter(col("doc_id") % 5 =!= 0),
            "doc_id", "text", 3, p)
          p
        })
        Dedup.lshIndexedPairs(s, path,
            docs(s, d).filter(col("doc_id") % 5 === 0), "doc_id", "text", 0.6)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv_a AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets
          WHERE doc_id % 5 = 0),
        inv_b AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets
          WHERE doc_id % 5 != 0),
        pairs AS (
          SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
          FROM inv_a a JOIN inv_b b ON a.shingle = b.shingle
          GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b, round(inter / (na + nb - inter), 4) AS jaccard
        FROM pairs WHERE round(inter / (na + nb - inter), 4) >= 0.6
        ORDER BY id_a, id_b""")),

    // q148: per-source quality-percentile gate — keep each source's top
    // 50% by score (n_chars as the deterministic stand-in; any scoring
    // column plugs in): the CCNet/RefinedWeb per-bucket discipline where
    // an absolute threshold tuned on one source would gut another. The
    // within-source rank is the GROUPED two-phase rank (global score
    // quantiles + per-(source, bucket) offsets) so one dominant source
    // spreads over all buckets instead of serializing a per-source window
    // partition. Pure integer keep rule ⇒ fully oracle-replayable.
    QueryDef("q148_per_source_quality_gate",
      (s, d) => graft.operators.Sampling.topFractionPerGroup(
          docs(s, d), "doc_id", "source", "n_chars", 500)
        .select(col("id").as("doc_id"), col("grp").as("source"),
          col("score"), col("gpos"), col("gn"), col("kept"))
        .orderBy("doc_id"),
      Some("""WITH r AS (SELECT doc_id, source, n_chars,
            row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1 AS gpos,
            count(*) OVER (PARTITION BY source) AS gn
          FROM documents)
        SELECT doc_id, source, n_chars AS score, gpos, gn,
          (gn - gpos) * 1000 <= 500 * gn AS kept
        FROM r ORDER BY doc_id""")),

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

    // q150: LEAKAGE-PROOF train/val/test split — q75's hash split keyed on
    // the near-dup CLUSTER representative instead of the document: two
    // near-duplicate documents split independently leak eval content into
    // training (the exact failure benchmark decontamination exists to
    // catch after the fact); hashing the connected-component label sends
    // every member of a dup cluster to the SAME side by construction.
    // Composition of the shared pair index (q34/q77/q85's memoized exact
    // pairs), star-contraction components, and the portable split hash;
    // singletons key on their own id. Oracle replays clusters (recursive
    // CTE) + split.
    QueryDef("q150_leakage_proof_split",
      (s, d) => {
        val clusters = graft.operators.Components
          .connectedComponents(jaccardPairs(s, d), "id_a", "id_b")
          .withColumnRenamed("id", "doc_id")
        val bucket = TextFns.hash32(
          concat(lit("split:"), col("cluster"))) % 100
        docs(s, d).join(clusters, Seq("doc_id"), "left")
          .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test"))
          .select(col("doc_id"), col("cluster"), col("split"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE
          toks AS (SELECT doc_id, $OToks t FROM documents),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          jp AS (
            SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
              FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          edges AS (SELECT id_a s, id_b d FROM jp UNION ALL SELECT id_b, id_a FROM jp),
          reach AS (
            SELECT DISTINCT s AS id, s AS lbl FROM edges
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
          cl AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY 1),
          x AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
            FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
        SELECT doc_id, cluster,
          CASE WHEN ('0x' || substr(md5('split:' || CAST(cluster AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
               WHEN ('0x' || substr(md5('split:' || CAST(cluster AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM x ORDER BY doc_id""")),

    // q36: SimHash near-dup — 32-bit weighted sketch, hamming ≤ 1 pairs via
    // pigeonhole banding (2×16-bit blocks, perfect recall for ≤1).
    QueryDef("q36_simhash_pairs",
      (s, d) => Dedup.simHashPairs(docs(s, d), "doc_id", "text", 1)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy("id_a", "id_b"),
      Some("""WITH tc AS (
          SELECT doc_id, tok, count(*) cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT h
          FROM (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) tok
                FROM documents) t
          GROUP BY doc_id, tok),
        bits AS (
          SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN cnt ELSE -cnt END) s
          FROM tc, (SELECT unnest(generate_series(0, 31)) b) bb
          GROUP BY 1, 2),
        sh AS (
          SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) simhash
          FROM bits GROUP BY 1)
        SELECT a.doc_id id_a, b.doc_id id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
        ORDER BY id_a, id_b""")),

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

    // q97: benchmark decontamination — train docs sharing ≥3 distinct
    // 3-grams with any eval doc (deterministic doc_id%20 split stands in
    // for the benchmark set). Inverted-index equi-join on the shingle
    // hash; cost Σ df_train·df_eval is linear in the corpus for a small
    // probe set. The canonical pre-training hygiene step next to dedup.
    QueryDef("q97_decontamination",
      (s, d) => {
        val all = docs(s, d)
        Dedup.contamination(
            all.filter(col("doc_id") % 20 =!= 0),
            all.filter(col("doc_id") % 20 === 0),
            "doc_id", "text", 3, 3)
          .orderBy("train_id", "eval_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, unnest(sh) shingle FROM sets),
        ev AS (SELECT * FROM inv WHERE doc_id % 20 = 0),
        tr AS (SELECT * FROM inv WHERE doc_id % 20 != 0)
        SELECT tr.doc_id train_id, ev.doc_id eval_id, count(*) n_shared
        FROM tr JOIN ev ON tr.shingle = ev.shingle
        GROUP BY 1, 2 HAVING count(*) >= 3
        ORDER BY train_id, eval_id""")),

    // q96: intra-document repetition signals — the Gopher-rule family
    // (Rae et al. 2021 §A1.1): top-token frequency and duplicate 2-/3-gram
    // fractions, the filters a training-data pipeline applies before any
    // cross-doc dedup. One explode + hash-aggs per signal, all map-side
    // shuffles on doc_id; fractions are single int/int divisions (bit-
    // identical across engines, no rounding needed).
    QueryDef("q96_repetition",
      (s, d) => {
        graft.functions.ShingleGenerator.register(s)
        val toks = docs(s, d).select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
        def grams(n: Int, suf: String) = toks
          .select(col("doc_id"),
            call_function(graft.functions.ShingleGenerator.name, col("t"), lit(n)))
          .groupBy("doc_id")
          .agg(count(lit(1)).as(s"n$suf"), countDistinct(col("shingle")).as(s"d$suf"))
        val top = toks.select(col("doc_id"), explode(col("t")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(max("c").as("top_tok_n"))
        toks.select(col("doc_id"), size(col("t")).cast("long").as("n_toks"))
          .join(top, Seq("doc_id"), "left")
          .join(grams(2, "2"), Seq("doc_id"), "left")
          .join(grams(3, "3"), Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_toks"), col("top_tok_n"),
            when(col("n2") > 0, (col("n2") - col("d2")) / col("n2")).as("dup2_frac"),
            when(col("n3") > 0, (col("n3") - col("d3")) / col("n3")).as("dup3_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
        g AS (SELECT doc_id, len(t) n_toks,
                [array_to_string(t[i:i+1], ' ') for i in generate_series(1, len(t)-1)] g2,
                [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)] g3
              FROM x),
        tc AS (SELECT doc_id, CAST(max(c) AS BIGINT) top_tok_n FROM (
                SELECT doc_id, tok, count(*) c
                FROM (SELECT doc_id, unnest(t) tok FROM x) GROUP BY 1, 2) GROUP BY 1)
        SELECT g.doc_id AS doc_id, CAST(n_toks AS BIGINT) n_toks, top_tok_n,
          CASE WHEN len(g2) > 0 THEN (len(g2) - len(list_distinct(g2))) / len(g2) END AS dup2_frac,
          CASE WHEN len(g3) > 0 THEN (len(g3) - len(list_distinct(g3))) / len(g3) END AS dup3_frac
        FROM g JOIN tc ON g.doc_id = tc.doc_id
        ORDER BY doc_id""")),

    // q40: document fingerprints — full-text md5, order-insensitive bag
    // fingerprint (sorted distinct tokens), 8-token prefix fingerprint,
    // and a Karp-Rabin rolling polynomial hash over the token-hash stream
    // (H ← (H·B + h(tok)) mod P, left fold — the incremental form used for
    // content-defined chunking). All map-side; the natural keys for
    // incremental dedup at 100 TB.
    QueryDef("q40_fingerprint",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val B = 1000003L
        val rolling = aggregate(
          transform(t, x => TextFns.hash32(x) % TextFns.MinHashP),
          lit(0L), (acc, h) => (acc * B + h) % TextFns.MinHashP)
        docs(s, d).select(
          col("doc_id"),
          md5(col("text")).as("fp_full"),
          md5(concat_ws(" ", array_sort(array_distinct(t)))).as("fp_bag"),
          md5(concat_ws(" ", slice(t, 1, 8))).as("fp_prefix"),
          rolling.as("fp_rolling"))
          .orderBy("doc_id")
      },
      Some(s"""WITH x AS (SELECT doc_id, text, $OToks t FROM documents)
        SELECT doc_id, md5(text) AS fp_full,
          md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp_bag,
          md5(array_to_string(t[1:8], ' ')) AS fp_prefix,
          list_reduce(
            list_prepend(0::BIGINT,
              list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 2147483647)),
            (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fp_rolling
        FROM x ORDER BY doc_id""")),

    // q74: BPE-ish regex tokenization beside whitespace tokenization — the
    // token-counting pair from the north-star text-analysis list. The
    // regex splits words / digit runs / single non-alnum symbols, the
    // first-stage shape of byte-pair pretokenizers.
    QueryDef("q74_regex_tokens",
      (s, d) => {
        val ws = TextFns.tokens(col("text"))
        val bpe = regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
        docs(s, d).select(
          col("doc_id"),
          size(ws).as("n_ws_tokens"),
          size(bpe).as("n_bpe_tokens"),
          size(array_distinct(bpe)).as("n_bpe_distinct"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
          CAST(len($OToks) AS INTEGER) AS n_ws_tokens,
          CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
          CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS INTEGER) AS n_bpe_distinct
        FROM documents ORDER BY doc_id""")),

    // q102: Misra-Gries heavy-hitter tokens — the one-pass O(k)-state
    // sketch next to q32's exact full-shuffle top-k: partials merge
    // map-side, only k-entry summaries cross the wire. On this bounded-
    // vocabulary corpus distinct tokens < k = 64, so no decrement ever
    // fires and the sketch is EXACT (scaladoc documents why) — giving a
    // deterministic hash-matched oracle; the eviction-regime guarantee
    // (freq > n/(k+1) always surfaces) is spec-asserted on synthetic data.
    QueryDef("q102_heavy_hitters",
      (s, d) => {
        docs(s, d).select(explode(TextFns.tokens(col("text"))).as("tok"))
          .agg(graft.functions.HeavyHitters.sketch(s, col("tok"), 64).as("hh"))
          .select(explode(col("hh")).as("e"))
          .select(col("e._1").as("token"), col("e._2").as("cnt"))
          .orderBy(desc("cnt"), col("token"))
          .limit(20)
      },
      Some(s"""SELECT token, CAST(count(*) AS BIGINT) cnt
        FROM (SELECT unnest($OToks) token FROM documents) t
        GROUP BY token ORDER BY cnt DESC, token LIMIT 20""")),

    // q100: overlapping context-window chunking — 32-token chunks with
    // 8-token overlap (stride 24), the retrieval / fine-tuning prep shape.
    // Map-side only (tokenize → sequence-explode → slice, all codegen'd);
    // chunks shuffle nowhere. Every token is covered; the last chunk may
    // be short; sub-chunk docs emit their single short chunk.
    QueryDef("q100_chunking",
      (s, d) => Packing.chunk(docs(s, d), "doc_id", "text", 32, 8)
        .select(col("id").as("doc_id"), col("chunk_idx"),
          col("chunk_text"), col("n_tokens"))
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
        c AS (SELECT doc_id, t,
                1 + CAST(floor((greatest(len(t) - 32, 0) + 23) / 24.0) AS INTEGER) k FROM x),
        g AS (SELECT doc_id, t, CAST(unnest(generate_series(0, k - 1)) AS INTEGER) i FROM c)
        SELECT doc_id, i AS chunk_idx,
          array_to_string(list_slice(t, i*24 + 1, i*24 + 32), ' ') AS chunk_text,
          CAST(len(list_slice(t, i*24 + 1, i*24 + 32)) AS INTEGER) AS n_tokens
        FROM g ORDER BY doc_id, chunk_idx""")),

    // q101: GPT-style concat-and-split sequence packing — concatenate the
    // corpus in doc_id order, split every 2048 tokens, account each doc
    // to the sequence holding its first token, and count boundary-
    // straddling docs (the attention-mask accounting). The global offset
    // is a TWO-PHASE distributed prefix sum (range-bucket → per-bucket
    // totals → tiny offsets window → partition-parallel within-bucket
    // cumsum) — no global single-partition window anywhere in the plan;
    // the oracle's single-node window computes the same stream.
    QueryDef("q101_seq_packing",
      (s, d) => Packing.packSequences(docs(s, d), "doc_id", "text", 2048)
        .orderBy("bin"),
      Some(s"""WITH x AS (SELECT doc_id, len($OToks) n FROM documents),
        c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) s FROM x),
        b AS (SELECT doc_id, n, CAST(floor((s - n) / 2048.0) AS BIGINT) bin,
                CASE WHEN floor((s - n) / 2048.0) <> floor((s - 1) / 2048.0) THEN 1 ELSE 0 END st
              FROM c)
        SELECT bin, CAST(count(*) AS BIGINT) n_docs, CAST(sum(n) AS BIGINT) n_tokens,
          min(doc_id) first_doc, max(doc_id) last_doc, CAST(sum(st) AS BIGINT) split_docs
        FROM b GROUP BY bin ORDER BY bin""")),

    // q75: deterministic train/val/test split — hash-bucket the key
    // (80/10/10), never rand(): reproducible across runs, clusters, and
    // engines, and a doc keeps its split when the corpus grows. Map-side
    // only; the oracle recomputes the same md5-derived bucket.
    QueryDef("q75_hash_split",
      (s, d) => {
        val bucket = TextFns.hash32(concat(lit("split:"), col("doc_id"))) % 100
        docs(s, d)
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
          .orderBy("lang", "split")
      },
      Some("""WITH x AS (
          SELECT *, ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
          FROM documents)
        SELECT lang,
          CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
          count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM x GROUP BY 1, 2 ORDER BY lang, split""")),

    // q76: balanced per-class sample — k docs per language, chosen by
    // smallest key-hash (a deterministic uniform draw) with the id as the
    // total-order tiebreak. The class-rebalancing primitive; one shuffle
    // on the class key, WindowGroupLimit prunes map-side.
    QueryDef("q76_balanced_sample",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(TextFns.hash32(concat(lit("sample:"), col("doc_id"))), col("doc_id"))
        docs(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 50)
          .select(col("lang"), col("rn").cast("int").as("rn"), col("doc_id"))
          .orderBy("lang", "rn")
      },
      Some("""SELECT lang, CAST(rn AS INTEGER) AS rn, doc_id FROM (
          SELECT lang, doc_id,
            row_number() OVER (PARTITION BY lang
              ORDER BY ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id) AS rn
          FROM documents) t
        WHERE rn <= 50 ORDER BY lang, rn""")),

    // q77: duplicate clusters — connected components (iterative min-label
    // propagation, O(diameter) shuffles; see operators.Components) over the
    // exact-Jaccard near-dup pairs. The step that turns pairwise dedup
    // output into canonical-survivor groups: a~b, b~c ⇒ one cluster {a,b,c}
    // even when (a,c) itself scores below the threshold. Oracle: DuckDB
    // recursive CTE computing the same min-reachable-id fixpoint.
    QueryDef("q77_dup_clusters",
      (s, d) => {
        val pairs = jaccardPairs(s, d)
        graft.operators.Components.connectedComponents(pairs, "id_a", "id_b")
          .withColumn("csize",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("cluster"))).cast("int"))
          .select(col("id").as("doc_id"), col("cluster"), col("csize"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE
          toks AS (SELECT doc_id, $OToks t FROM documents),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          jp AS (
            SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
              FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          edges AS (SELECT id_a s, id_b d FROM jp UNION ALL SELECT id_b, id_a FROM jp),
          reach AS (
            SELECT DISTINCT s AS id, s AS lbl FROM edges
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
          cl AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY 1)
        SELECT doc_id, cluster,
               CAST(count(*) OVER (PARTITION BY cluster) AS INTEGER) csize
        FROM cl ORDER BY doc_id""")),

    // q164: INCREMENTAL connected components — the daily-relabel half of
    // the dedup-cluster lifecycle: yesterday's pairs (a deterministic
    // half of the shared index) solve to labels, today's remaining pairs
    // merge through incrementalComponents — which touches only affected
    // components and never re-iterates the label table. The oracle is the
    // FULL recursive-CTE solve over ALL pairs, so the hash-match IS the
    // incremental ≡ batch identity.
    QueryDef("q164_incremental_components",
      (s, d) => {
        val pairs = jaccardPairs(s, d)
        val old = pairs.filter(pmod(col("id_a") + col("id_b"), lit(2)) === 0)
        val today = pairs.filter(pmod(col("id_a") + col("id_b"), lit(2)) === 1)
        val labels = graft.operators.Components
          .connectedComponents(old, "id_a", "id_b")
        graft.operators.Components
          .incrementalComponents(labels, today, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE
          toks AS (SELECT doc_id, $OToks t FROM documents),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          jp AS (
            SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
              FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          edges AS (SELECT id_a s, id_b d FROM jp UNION ALL SELECT id_b, id_a FROM jp),
          reach AS (
            SELECT DISTINCT s AS id, s AS lbl FROM edges
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
          cl AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY 1)
        SELECT doc_id, cluster FROM cl ORDER BY doc_id""")),

    // q85: dedup savings accounting — the step after q77's clusters: per
    // cluster the canonical survivor (min id == the cluster label), member
    // count, and bytes kept vs dropped. Closes the dedup pipeline story:
    // pairs (q34/35/36) → clusters (q77) → survivors + storage savings.
    QueryDef("q85_dedup_savings",
      (s, d) => {
        val pairs = jaccardPairs(s, d)
        val cl = graft.operators.Components
          .connectedComponents(pairs, "id_a", "id_b")
          .withColumnRenamed("id", "doc_id")
        cl.join(docs(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
          .groupBy("cluster")
          .agg(count(lit(1)).cast("int").as("n_members"),
            sum("n_chars").as("chars_total"),
            min(when(col("doc_id") === col("cluster"), col("n_chars")))
              .as("chars_kept"))
          .withColumn("chars_saved", col("chars_total") - col("chars_kept"))
          .orderBy("cluster")
      },
      Some(s"""WITH RECURSIVE
          toks AS (SELECT doc_id, $OToks t FROM documents),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          jp AS (
            SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
              FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          edges AS (SELECT id_a s, id_b d FROM jp UNION ALL SELECT id_b, id_a FROM jp),
          reach AS (
            SELECT DISTINCT s AS id, s AS lbl FROM edges
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
          cl AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY 1)
        SELECT cluster, CAST(count(*) AS INTEGER) AS n_members,
          CAST(sum(n_chars) AS BIGINT) AS chars_total,
          CAST(min(CASE WHEN doc_id = cluster THEN n_chars END) AS BIGINT) AS chars_kept,
          CAST(sum(n_chars) - min(CASE WHEN doc_id = cluster THEN n_chars END) AS BIGINT) AS chars_saved
        FROM cl JOIN documents USING (doc_id)
        GROUP BY cluster ORDER BY cluster""")),

    // q87: text cleaning + PII redaction — the pre-tokenization scrub of a
    // training-data pipeline: URL → <url>, email → <email>, punctuation →
    // space, whitespace collapse, trim. The corpus has no natural
    // URLs/emails, so the query plants doc_id-derived ones and the oracle
    // must redact them identically; redaction counts are recovered by
    // length arithmetic (exact ints). Pure map-side column work.
    QueryDef("q87_text_clean",
      (s, d) => {
        val raw = concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or https://ex.com/d/"), col("doc_id"), lit(" now"))
        val cleaned = trim(regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(lower(raw), "https?://[^ ]+", "<url>"),
              "[a-z0-9._%+-]+@[a-z0-9.-]+", "<email>"),
            "[^a-z0-9<> ]", " "),
          " +", " "))
        docs(s, d).select(
          col("doc_id"), cleaned.as("cleaned"),
          length(raw).as("n_raw"), length(cleaned).as("n_clean"),
          ((length(cleaned) - length(regexp_replace(cleaned, "<url>", ""))) / 5)
            .cast("int").as("n_urls"),
          ((length(cleaned) - length(regexp_replace(cleaned, "<email>", ""))) / 7)
            .cast("int").as("n_emails"))
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (
          SELECT doc_id,
            text || ' contact user' || doc_id || '@example.com or https://ex.com/d/' || doc_id || ' now' AS t
          FROM documents),
         c AS (
          SELECT doc_id,
            trim(regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(lower(t), 'https?://[^ ]+', '<url>', 'g'),
                  '[a-z0-9._%+-]+@[a-z0-9.-]+', '<email>', 'g'),
                '[^a-z0-9<> ]', ' ', 'g'),
              ' +', ' ', 'g')) AS cleaned, t FROM raw)
        SELECT doc_id, cleaned, CAST(len(t) AS INTEGER) AS n_raw,
          CAST(len(cleaned) AS INTEGER) AS n_clean,
          CAST((len(cleaned) - len(replace(cleaned, '<url>', ''))) // 5 AS INTEGER) AS n_urls,
          CAST((len(cleaned) - len(replace(cleaned, '<email>', ''))) // 7 AS INTEGER) AS n_emails
        FROM c ORDER BY doc_id""")),

    // q90: the composed data-prep pipeline — exact-dedup survivors →
    // token-count quality gate → deterministic hash split → per-split
    // stats, all one declarative plan (Catalyst fuses the stages; the
    // only shuffles are the dedup fingerprint and the final tiny agg).
    // The capstone the individual operators (q30/q31/q75) exist for.
    QueryDef("q90_prep_pipeline",
      (s, d) => {
        val surv = Dedup.exact(docs(s, d), lower(col("text")), "doc_id")
        val nt = size(TextFns.tokens(col("text")))
        val bucket = TextFns.hash32(concat(lit("split:"), col("doc_id"))) % 100
        surv
          .withColumn("nt", nt).filter(col("nt") >= 32)
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"), sum("nt").cast("long").as("n_tokens"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .orderBy("split")
      },
      Some(s"""WITH surv AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
              row_number() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) rn
            FROM documents) t WHERE rn = 1),
         qual AS (
          SELECT doc_id, len($OToks) nt FROM surv WHERE len($OToks) >= 32),
         assigned AS (
          SELECT doc_id, nt,
            CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                 WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                 ELSE 'test' END AS split
          FROM qual)
        SELECT split, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
          CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc
        FROM assigned GROUP BY split ORDER BY split""")),

    // q78: TF-IDF top terms per document — the classic text-analysis
    // ranking. IDF kept rational ((tf·N)/df, no log) so both engines do
    // integer-exact arithmetic up to one identical double division —
    // bit-portable, with the term as a total-order tiebreak. One shuffle
    // for tf, a broadcast-sized df join (vocab ≪ corpus), window top-3.
    QueryDef("q78_tfidf",
      (s, d) => {
        val dd = docs(s, d)
        val n = dd.count()
        val tf = dd
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val score = (col("tf") * lit(n)) / col("df")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(score.desc, col("term"))
        tf.join(broadcast(df), "term")
          .withColumn("rnk", row_number().over(w).cast("int"))
          .filter(col("rnk") <= 3)
          // raw double, no round: tf*N is integer-exact in a double and
          // the single division is bit-identical in both engines — rounding
          // could only ADD a half-boundary divergence (the q31 lesson)
          .select(col("doc_id"), col("term"), col("rnk"), col("tf"), col("df"),
            score.as("score"))
          .orderBy("doc_id", "rnk")
      },
      Some(s"""WITH
          toks AS (SELECT doc_id, unnest($OToks) tok FROM documents),
          tf AS (SELECT doc_id, tok, count(*) tf FROM toks GROUP BY 1, 2),
          df AS (SELECT tok, count(*) df FROM tf GROUP BY 1),
          n AS (SELECT count(*) n FROM documents),
          scored AS (
            SELECT doc_id, tok, tf, df, (tf * n) / df AS score,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY (tf * n) / df DESC, tok) rnk
            FROM tf JOIN df USING (tok) CROSS JOIN n)
        SELECT doc_id, tok AS term, CAST(rnk AS INTEGER) rnk,
               CAST(tf AS BIGINT) tf, CAST(df AS BIGINT) df, score
        FROM scored WHERE rnk <= 3 ORDER BY doc_id, rnk""")),

    // q104: temperature-based mixture resampling (α = 0.5) — per-source
    // ⌊√mass⌋ weights split a 30% global token budget, documents admitted
    // in id order under a two-phase per-source prefix sum. Every step
    // integer-exact (⌊√⌋, long multiply, integer div), so even the budget
    // boundaries hash-match the oracle. The mixture-rebalancing step a
    // multi-source pretraining corpus runs after dedup.
    QueryDef("q104_temperature_mix",
      (s, d) => Mixture.temperatureSampleSummary(
          docs(s, d), "doc_id", "source", "text", 3, 10)
        .select(col("grp").as("source"), col("docs_kept"), col("toks_kept"),
          col("budget_toks"))
        .orderBy("source"),
      Some(s"""WITH base AS (
          SELECT doc_id, source, CAST(len($OToks) AS BIGINT) n FROM documents),
        masses AS (SELECT source, CAST(sum(n) AS BIGINT) m FROM base GROUP BY 1),
        wts AS (SELECT source, m, CAST(floor(sqrt(m)) AS BIGINT) w FROM masses),
        tot AS (SELECT CAST(sum(m) AS BIGINT) tot, CAST(sum(w) AS BIGINT) wsum FROM wts),
        budgets AS (
          SELECT source, (w * ((tot * 3) // 10)) // wsum AS budget_toks
          FROM wts, tot),
        cum AS (
          SELECT doc_id, source, n,
            CAST(sum(n) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) cum_toks
          FROM base),
        kept AS (
          SELECT c.source, c.n, b.budget_toks
          FROM cum c JOIN budgets b USING (source)
          WHERE c.cum_toks <= b.budget_toks)
        SELECT source, count(*) AS docs_kept, CAST(sum(n) AS BIGINT) AS toks_kept,
          budget_toks
        FROM kept GROUP BY source, budget_toks ORDER BY source""")),

    // q105: bloom-prefiltered incremental dedup — the daily-ingest step:
    // even-id docs play yesterday's corpus, odd-id docs today's batch; a
    // bloom filter over history fingerprints passes guaranteed-new docs
    // through shuffle-free and only the maybe-seen sliver pays the exact
    // anti-join. EXACT despite the sketch (bloom has no false negatives),
    // so it hash-matches a plain NOT EXISTS oracle.
    QueryDef("q105_incremental_dedup",
      (s, d) => {
        val dd = docs(s, d)
        Dedup.incrementalNew(
            dd.filter(col("doc_id") % 2 === 0),
            dd.filter(col("doc_id") % 2 === 1),
            lower(col("text")), expectedItems = 100000L, fpp = 0.01)
          .select(col("doc_id"), col("fingerprint"))
          .orderBy("doc_id")
      },
      Some("""SELECT b.doc_id, md5(lower(b.text)) AS fingerprint
        FROM documents b
        WHERE b.doc_id % 2 = 1 AND NOT EXISTS (
          SELECT 1 FROM documents h
          WHERE h.doc_id % 2 = 0 AND md5(lower(h.text)) = md5(lower(b.text)))
        ORDER BY doc_id""")),

    // q106: rare-bigram novelty scoring — the n-gram-LM quality-filter
    // analog (CCNet-style perplexity gating, restated over exact corpus
    // statistics so it oracles): per document, the fraction of bigram
    // OCCURRENCES whose corpus document-frequency is 1. High ratio = novel
    // or noisy text; low ratio = boilerplate. Map-side bigram explode with
    // per-(doc,bigram) combine, a vocabulary-sized df aggregate, one
    // bigram-keyed join (AQE broadcasts the df side when small), and a
    // single long/long → double division (bit-portable, q78 lesson).
    QueryDef("q106_rare_bigrams",
      (s, d) => {
        val toks = docs(s, d)
          .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 2)
        val big = toks.select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("t")) - 1),
            i => concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1)))).as("bg"))
        val occ = big.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        val df = occ.groupBy("bg").agg(count(lit(1)).as("df"))
        occ.join(df, "bg")
          .groupBy("doc_id")
          .agg(sum("c").as("n_bigrams"),
            sum(when(col("df") === 1, col("c")).otherwise(0L)).as("rare_bigrams"))
          .withColumn("rare_ratio", col("rare_bigrams") / col("n_bigrams"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        big AS (
          SELECT doc_id,
            unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) bg
          FROM toks WHERE len(t) >= 2),
        occ AS (SELECT doc_id, bg, count(*) c FROM big GROUP BY 1, 2),
        df AS (SELECT bg, count(*) df FROM occ GROUP BY 1)
        SELECT o.doc_id, CAST(sum(o.c) AS BIGINT) n_bigrams,
          CAST(sum(CASE WHEN d.df = 1 THEN o.c ELSE 0 END) AS BIGINT) rare_bigrams,
          CAST(sum(CASE WHEN d.df = 1 THEN o.c ELSE 0 END) AS BIGINT)
            / CAST(sum(o.c) AS BIGINT) AS rare_ratio
        FROM occ o JOIN df d USING (bg)
        GROUP BY o.doc_id ORDER BY o.doc_id""")),

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

    // q109: Duffield–Lund–Thorup priority sampling — deterministic
    // quality-weighted corpus subsample (k=20 by n_chars) with the
    // unbiased max(w, τ) weight estimator. Priorities are ONE
    // correctly-rounded long/long division (bit-portable, q31 lesson);
    // the top-k is TakeOrderedAndProject so the corpus never globally
    // sorts; the only window runs over the k+1 surviving rows.
    QueryDef("q109_priority_sample",
      (s, d) => Sampling.prioritySample(docs(s, d), "doc_id", "n_chars", 20)
        .select(col("id").as("doc_id"), col("weight"),
          col("priority"), col("est_weight"))
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id, n_chars AS weight,
            ('0x' || substr(md5('prio:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS u
          FROM documents),
        p AS (SELECT doc_id, weight,
                (weight * 4294967296)::DOUBLE / u::DOUBLE AS priority FROM w),
        r AS (SELECT doc_id, weight, priority,
                row_number() OVER (ORDER BY priority DESC, doc_id) rn FROM p),
        t AS (SELECT max(CASE WHEN rn = 21 THEN priority END) AS tau FROM r)
        SELECT doc_id, weight, priority,
          greatest(weight::DOUBLE, coalesce(tau, 0.0)) AS est_weight
        FROM r, t WHERE rn <= 20 ORDER BY doc_id""")),

    // q158: STRATIFIED priority sample — q109's DLT sampler per SOURCE:
    // each stratum draws its own top-5 by w/u priority with its own
    // threshold τ_g and unbiased ŵ = max(w, τ_g) estimator, the "k best
    // docs per source" curation shape where one heavy-tailed source must
    // not crowd out the rest. Same exactly-portable integer-u priority as
    // q109; the per-group top-(k+1) runs under WindowGroupLimit so no
    // stratum materializes beyond k+1 rows per map task (plan-guarded).
    QueryDef("q158_stratified_priority_sample",
      (s, d) => Sampling.prioritySamplePerGroup(
          docs(s, d), "doc_id", "source", "n_chars", 5)
        .select(col("grp").as("source"), col("id").as("doc_id"),
          col("weight"), col("priority"), col("est_weight"))
        .orderBy("source", "doc_id"),
      Some("""WITH w AS (SELECT source, doc_id, n_chars AS weight,
            ('0x' || substr(md5('prio:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS u
          FROM documents),
        p AS (SELECT source, doc_id, weight,
                (weight * 4294967296)::DOUBLE / u::DOUBLE AS priority FROM w),
        r AS (SELECT source, doc_id, weight, priority,
                row_number() OVER (PARTITION BY source
                  ORDER BY priority DESC, doc_id) rn FROM p),
        t AS (SELECT source, max(CASE WHEN rn = 6 THEN priority END) AS tau
              FROM r GROUP BY source)
        SELECT r.source, r.doc_id, r.weight, r.priority,
          greatest(r.weight::DOUBLE, coalesce(t.tau, 0.0)) AS est_weight
        FROM r JOIN t ON r.source = t.source
        WHERE r.rn <= 5 ORDER BY r.source, r.doc_id""")),

    // q159: robust per-source length-outlier gate — the Hampel / 3-MAD
    // rule (median ± 3·median-absolute-deviation): mean±kσ fails here
    // because outliers drag the mean and σ themselves (one 100MB crawl
    // blob inflates a source's σ until nothing is an outlier); median and
    // MAD have a 50% breakdown point. Integer-exact end-to-end: lower
    // medians (corpus values, no interpolation), integer |v−med| > 3·MAD
    // — any engine replays it bit-identically. Both ranking passes are
    // the grouped two-phase rank (no per-source window partition, skewed
    // sources spread over all quantile buckets).
    QueryDef("q159_mad_outliers",
      (s, d) => graft.operators.Robust.madOutliers(
          docs(s, d), "doc_id", "source", "n_chars", 3)
        .select(col("id").as("doc_id"), col("grp").as("source"),
          col("v").as("n_chars"), col("med"), col("mad"), col("outlier"))
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, source, n_chars FROM documents),
        r1 AS (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) - 1 AS gpos,
            count(*) OVER (PARTITION BY source) AS gn FROM b),
        med AS (SELECT source, n_chars AS med FROM r1
          WHERE gpos = (gn - 1) // 2),
        d AS (SELECT b.doc_id, b.source, b.n_chars, med.med,
            abs(b.n_chars - med.med) AS dev
          FROM b JOIN med ON b.source = med.source),
        r2 AS (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY dev, doc_id) - 1 AS gpos,
            count(*) OVER (PARTITION BY source) AS gn FROM d),
        mad AS (SELECT source, dev AS mad FROM r2
          WHERE gpos = (gn - 1) // 2)
        SELECT d.doc_id, d.source, d.n_chars, d.med, mad.mad,
          (d.dev > 3 * mad.mad) AS outlier
        FROM d JOIN mad ON d.source = mad.source
        ORDER BY d.doc_id""")),

    // q110: count-min sketch point frequencies — Spark's codegen'd
    // count_min_sketch aggregate over the token stream (ε=1e-4 → width
    // 20000, conf 0.9999 → depth 10, fixed seed) probed PLAN-SIDE by the
    // CmsEstimate expression: no driver collect anywhere. On this corpus
    // the estimates are provably exact — 31-token vocabulary vs 20000
    // counters/row puts P(a token collides in all 10 rows) below 1e-28 —
    // so the oracle states true counts and the hash-match verifies
    // build + serialization + probe end-to-end; the ε·N error bound
    // itself is CountMinSketchSpec's contract.
    QueryDef("q110_cms_frequency",
      (s, d) => {
        import s.implicits._
        val probes = Seq("join", "hash", "row", "the", "a", "query",
          "dup", "zzz_absent")
        val sk = docs(s, d)
          .select(explode(TextFns.tokens(col("text"))).as("tok"))
          .agg(count_min_sketch(col("tok"), lit(0.0001d), lit(0.9999d),
            lit(42)).as("cms"))
        probes.toDF("token").crossJoin(broadcast(sk))
          .select(col("token"),
            SketchExpressions.cmsEstimate(s, col("cms"), col("token"))
              .as("est_count"))
          .orderBy("token")
      },
      Some(s"""WITH tf AS (SELECT tok, CAST(count(*) AS BIGINT) c FROM (
            SELECT unnest($OToks) tok FROM documents) GROUP BY tok)
        SELECT p.token, coalesce(tf.c, 0) AS est_count
        FROM (VALUES ('join'),('hash'),('row'),('the'),('a'),('query'),
              ('dup'),('zzz_absent')) p(token)
        LEFT JOIN tf ON tf.tok = p.token
        ORDER BY token""")),

    // q111: cross-document duplicated-span scrubbing — the scalable
    // restatement of suffix-array substring dedup (Lee et al. ACL 2022) /
    // CCNet paragraph dedup: 16-token spans, corpus-wide distinct-doc
    // counts on the 60-bit span hash (one combine shuffle), every
    // occurrence of a span shared by ≥2 docs dropped, survivors
    // reassembled in order. Whole-doc dedup drops documents; this scrubs
    // boilerplate INSIDE them. Intra-doc repetition is deliberately kept
    // (that signal is q96's).
    QueryDef("q111_span_scrub",
      (s, d) => Dedup.spanScrub(docs(s, d), "doc_id", "text", 16)
        .select(col("id").as("doc_id"), col("n_spans"), col("dropped_spans"),
          col("dropped_tokens"), col("kept_tokens"), col("clean_text"))
        .orderBy("doc_id"),
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
        sp AS (SELECT doc_id, t,
                CAST(unnest(generate_series(0, CAST(ceil(len(t) / 16.0) AS INTEGER) - 1)) AS INTEGER) i
              FROM x WHERE len(t) > 0),
        g AS (SELECT doc_id, i,
                array_to_string(list_slice(t, i*16 + 1, i*16 + 16), ' ') seg,
                len(list_slice(t, i*16 + 1, i*16 + 16)) stok
              FROM sp),
        c AS (SELECT seg, count(DISTINCT doc_id) ndocs FROM g GROUP BY 1),
        j AS (SELECT g.doc_id, g.i, g.seg, g.stok, c.ndocs
              FROM g JOIN c USING (seg)),
        a AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_spans,
                CAST(sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) dropped_spans,
                CAST(sum(CASE WHEN ndocs > 1 THEN stok ELSE 0 END) AS BIGINT) dropped_tokens,
                CAST(sum(CASE WHEN ndocs = 1 THEN stok ELSE 0 END) AS BIGINT) kept_tokens,
                string_agg(CASE WHEN ndocs = 1 THEN seg END, ' ' ORDER BY i) clean_text
              FROM j GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
          coalesce(dropped_spans, 0) AS dropped_spans,
          coalesce(dropped_tokens, 0) AS dropped_tokens,
          coalesce(kept_tokens, 0) AS kept_tokens,
          coalesce(clean_text, '') AS clean_text
        FROM documents d LEFT JOIN a USING (doc_id) ORDER BY doc_id""")),

    // q112: BM25 term ranking (Robertson/Sparck Jones, k1=1.2 b=0.75) —
    // q78's TF-IDF with the two refinements retrieval actually uses: tf
    // saturation and doc-length normalization. Log-free RATIO idf
    // ((N−df+0.5)/(df+0.5)) keeps every operation +,−,×,÷ — all IEEE
    // correctly-rounded and bit-identical across engines, where ln() is
    // library-dependent — and the oracle pins every fractional literal
    // ::DOUBLE so DuckDB can't run the numerator in exact DECIMAL and
    // round differently. Same scale shape as q78: one tf shuffle, a
    // broadcast df join, per-doc top-3 window.
    QueryDef("q112_bm25",
      (s, d) => {
        val ta = docs(s, d)
          .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
        val st = ta.agg(count(lit(1)), sum(size(col("t")))).head
        val n = st.getLong(0)
        // empty corpus: sum() is null and n is 0 — any avgdl works, every
        // downstream frame is empty anyway (EmptyInputSpec pins this)
        val avgdl = if (st.isNullAt(1)) 1.0 else st.getLong(1).toDouble / n
        val tf = ta
          .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
            explode(col("t")).as("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val idf = (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        val norm = lit(0.25) + lit(0.75) * (col("dl") / lit(avgdl))
        val sat = (col("tf") * lit(2.2)) / (col("tf") + lit(1.2) * norm)
        val score = idf * sat
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(score.desc, col("term"))
        tf.join(broadcast(dfc), "term")
          .withColumn("rnk", row_number().over(w).cast("int"))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("term"), col("rnk"), col("tf"),
            col("df"), col("dl"), score.as("score"))
          .orderBy("doc_id", "rnk")
      },
      Some(s"""WITH t AS (SELECT doc_id, $OToks t FROM documents),
          n AS (SELECT count(*) n,
                  CAST(sum(len(t)) AS DOUBLE) / count(*) avgdl FROM t),
          toks AS (SELECT doc_id, CAST(len(t) AS BIGINT) dl, unnest(t) term FROM t),
          tf AS (SELECT doc_id, dl, term, count(*) tf FROM toks GROUP BY 1, 2, 3),
          df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
          scored AS (
            SELECT doc_id, term, tf, df, dl,
              ((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                * ((tf * 2.2::DOUBLE)
                   / (tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * (dl / avgdl)))) score,
              row_number() OVER (PARTITION BY doc_id ORDER BY
                ((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                  * ((tf * 2.2::DOUBLE)
                     / (tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * (dl / avgdl)))) DESC,
                term) rnk
            FROM tf JOIN df USING (term) CROSS JOIN n)
        SELECT doc_id, term, CAST(rnk AS INTEGER) rnk, CAST(tf AS BIGINT) tf,
          CAST(df AS BIGINT) df, dl, score
        FROM scored WHERE rnk <= 3 ORDER BY doc_id, rnk""")),

    // q113: vocabulary construction + OOV accounting — the tokenizer-prep
    // step: top-V terms by (count DESC, term) become the vocab with dense
    // ids 0..V−1, then every document reports token count, OOV count,
    // the integer-exact sum of its in-vocab token ids (pins the id
    // assignment itself into the hash-match), and the OOV rate (one
    // long/long division). V=16 < the corpus vocabulary so the OOV path
    // is genuinely exercised. Scale: top-V is TakeOrderedAndProject (no
    // global sort), the only window runs over the V-row vocab, and the
    // vocab joins back broadcast.
    QueryDef("q113_vocab_oov",
      (s, d) => {
        val toks = docs(s, d)
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("term"))
        val vocab = toks.groupBy("term").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("term")).limit(16)
          .withColumn("token_id", row_number().over(w).cast("long") - 1L)
        toks.join(broadcast(vocab.select("term", "token_id")), Seq("term"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
            coalesce(sum("token_id"), lit(0L)).as("vocab_id_sum"))
          .withColumn("oov_rate", col("n_oov") / col("n_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($OToks) term FROM documents),
          counts AS (SELECT term, count(*) c FROM toks GROUP BY 1),
          vocab AS (SELECT term,
              CAST(row_number() OVER (ORDER BY c DESC, term) - 1 AS BIGINT) token_id
            FROM counts ORDER BY c DESC, term LIMIT 16)
        SELECT doc_id, CAST(count(*) AS BIGINT) n_tokens,
          CAST(sum(CASE WHEN token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_oov,
          CAST(coalesce(sum(token_id), 0) AS BIGINT) vocab_id_sum,
          CAST(sum(CASE WHEN token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            / CAST(count(*) AS BIGINT) AS oov_rate
        FROM toks LEFT JOIN vocab USING (term)
        GROUP BY doc_id ORDER BY doc_id""")),

    // q114: deterministic seeded corpus shuffle — the reproducible global
    // training order (hash32("shuf:"||id), contiguous 0-based positions).
    // Positions come from Packing.deterministicShuffle's two-phase rank:
    // quantile-bucketed by hash, per-bucket counts → a buckets-row offset
    // window, within-bucket ranks partition-parallel — the corpus never
    // passes through a single-partition window, yet the result is
    // bit-identical to the oracle's global row_number (PackingSpec pins
    // bucket-count independence; PlanGuardSpec pins the window shape).
    QueryDef("q114_corpus_shuffle",
      (s, d) => graft.operators.Packing
        .deterministicShuffle(docs(s, d), "doc_id", "shuf", 32)
        .select(col("id").as("doc_id"), col("h"), col("pos"))
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id,
            ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
          FROM documents)
        SELECT doc_id, h,
          CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        FROM h ORDER BY doc_id""")),

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

    // q115: length-bucketed batch packing — rank by (token count, id),
    // cut into 64-sequence batches, account the padding each batch pays
    // when padded to its longest member: the dynamic-batching step that
    // makes length-sorting worth doing in a training input pipeline. The
    // ranking reuses the two-phase scheme (equal lengths never straddle a
    // bucket boundary), so the batch boundaries are bit-identical to the
    // oracle's global row_number without any corpus-wide window.
    QueryDef("q115_length_batches",
      (s, d) => graft.operators.Packing
        .lengthBatches(docs(s, d), "doc_id", "text", 64)
        .orderBy("batch"),
      Some(s"""WITH base AS (
          SELECT doc_id, CAST(len($OToks) AS BIGINT) len FROM documents),
        r AS (SELECT doc_id, len,
                row_number() OVER (ORDER BY len, doc_id) - 1 AS pos FROM base),
        b AS (SELECT CAST(pos // 64 AS BIGINT) batch, len FROM r)
        SELECT batch, CAST(count(*) AS BIGINT) n_seqs, min(len) min_len,
          max(len) max_len, CAST(sum(len) AS BIGINT) sum_len,
          CAST(count(*) * max(len) - sum(len) AS BIGINT) padding
        FROM b GROUP BY batch ORDER BY batch""")),

    // q124: distributed BPE vocabulary training (Sennrich ACL'16) — the
    // tokenizer-learning step of an LLM pipeline. The corpus is scanned
    // ONCE into a word-frequency table; every merge round then runs on the
    // Heap's-law-small distinct-word table (pair explode → weighted
    // hash-agg → 1-row argmax scalar witness → codegen'd regex merge),
    // lineage cut per round. Iterative argmax is not SQL-expressible ⇒
    // rows-only; BpeSpec pins exact equality with the reference algorithm,
    // greedy-merge semantics, and the monotone-count invariant.
    QueryDef("q124_bpe_merges",
      (s, d) => graft.operators.Bpe.mergesDf(s, bpeModel(s, d).merges)
        .orderBy("rank"),
      None),

    // q125: corpus token statistics under the trained BPE segmentation —
    // "encode the corpus and count tokens" without a second corpus pass:
    // training's final word-segmentation table IS the encoding of every
    // corpus word, so vocab stats are one explode + hash-agg over it.
    // Depends on the learned merges ⇒ rows-only; conservation invariants
    // (Σ occurrences = Σ freq·|syms|, concat(syms) = word) are BpeSpec's.
    QueryDef("q125_bpe_vocab",
      (s, d) => graft.operators.Bpe.vocabStats(bpeModel(s, d))
        .orderBy(col("occurrences").desc, col("sym")),
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

    // q128: BPE corpus encoding (inference) — apply the trained merge list
    // to documents: tokenize → per-partition rank-order merge fold against
    // the broadcast merges, unseen words fall back to chars + applicable
    // merges. Map-side only, no shuffle; a per-partition word→tokens memo
    // exploits Zipf. Depends on learned merges ⇒ rows-only; the
    // encode≡training-segmentation identity and OOV fallback are BpeSpec's.
    QueryDef("q128_bpe_encode",
      (s, d) => graft.operators.Bpe.encode(docs(s, d), "doc_id", "text",
          bpeModel(s, d).merges)
        .select(col("id").as("doc_id"), col("n_tokens"),
          concat_ws(" ", slice(col("toks"), 1, 8)).as("tok_prefix"))
        .orderBy("doc_id"),
      None),

    // q129: hashed-feature linear quality classifier — the fasttext-shaped
    // model-based filtering step of an LLM pipeline (score every document
    // with a linear model over hashed unigram+bigram features, keep/drop on
    // the sign). Weights here are md5-derived pseudo-random integers so the
    // WHOLE inference path — feature extraction, 4096-bucket hashing,
    // weight lookup, integer score — is portable and the oracle
    // hash-matches; swapping in trained weights is a broadcast-join change,
    // not a plan change. Map-side explode → one hash-agg by doc_id (partial
    // combine; shuffle carries (doc_id, partial sums), never features).
    QueryDef("q129_quality_classifier",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val bigrams = when(size(t) >= 2,
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))
        val bucket = pmod(TextFns.hash32(col("feat")), lit(4096L))
        val weight = TextFns.hash32(concat(lit("w:"), bucket.cast("string"))) %
          lit(2001L) - lit(1000L)
        docs(s, d)
          .select(col("doc_id"), explode(concat(t, bigrams)).as("feat"))
          .select(col("doc_id"), weight.as("w"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_feats"), sum("w").as("score"))
          .withColumn("keep", col("score") > 0)
          .orderBy("doc_id")
      },
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
          f AS (SELECT doc_id, unnest(t ||
                  [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) feat
                FROM x),
          w AS (SELECT doc_id,
                  ('0x' || substr(md5('w:' || CAST(
                    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096
                  AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000 AS w
                FROM f)
        SELECT doc_id, count(*) AS n_feats, CAST(sum(w) AS BIGINT) AS score,
          sum(w) > 0 AS keep
        FROM w GROUP BY doc_id ORDER BY doc_id""")),

    // q131: bigram-LM fluency scoring — the perplexity-shaped fluency
    // filter of an LLM pipeline (CCNet scores documents with a KenLM
    // n-gram model; Wenzek et al., LREC 2020), restated integer-portable
    // so the WHOLE train+score path hash-matches the oracle instead of
    // going rows-only: the model is the corpus's own bigram table, and a
    // bigram instance scores floor(1e6 · c(l,r) / c(l)) — exact integer
    // counts, then one IEEE multiply + divide + floor, each bit-portable
    // across engines (ln/exp would not be — the log-space perplexity is
    // deliberately traded for a monotone-equivalent rational score).
    // Shape: two count tables built with map-side partial combine; the
    // conditional-rate table joins bigram INSTANCES once (shuffle keyed on
    // the bigram — the rate side is vocabulary-sized, Heap's-law bounded,
    // NOT corpus-sized); then one doc_id hash-agg carrying partial sums.
    QueryDef("q131_lm_fluency",
      (s, d) => {
        val x = docs(s, d).select(col("doc_id"),
          TextFns.tokens(col("text")).as("t"))
        val inst = x.filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(zip_with(
            slice(col("t"), lit(1), size(col("t")) - 1),
            slice(col("t"), lit(2), size(col("t")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .select(col("doc_id"), col("p.l").as("l"), col("p.r").as("r"))
        val uni = x.select(explode(col("t")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cu"))
        val bi = inst.groupBy("l", "r").agg(count(lit(1)).as("cb"))
        val rate = bi.join(uni, col("l") === col("w"))
          .select(col("l"), col("r"),
            floor(lit(1e6) * (col("cb") / col("cu"))).as("part"))
        val per = inst.join(rate, Seq("l", "r"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nb"), sum("part").as("ss"))
        x.select("doc_id").join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("nb"), lit(0L)).cast("int").as("n_bigrams"),
            coalesce(col("ss"), lit(0L)).as("score_sum"),
            when(col("nb").isNull, lit(0L))
              .otherwise(floor(col("ss") / col("nb"))).as("fluency_micro"))
          .orderBy("doc_id")
      },
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
          f AS (SELECT doc_id,
                  unnest([struct_pack(l := t[i], r := t[i+1])
                          for i in generate_series(1, len(t)-1)]) p
                FROM x),
          inst AS (SELECT doc_id, p.l AS l, p.r AS r FROM f),
          uni AS (SELECT w, count(*) AS cu
                  FROM (SELECT unnest(t) AS w FROM x) GROUP BY 1),
          bi AS (SELECT l, r, count(*) AS cb FROM inst GROUP BY 1, 2),
          rate AS (SELECT l, r,
                     CAST(floor(1000000.0 * (cb::DOUBLE / cu::DOUBLE))
                       AS BIGINT) AS part
                   FROM bi JOIN uni ON bi.l = uni.w),
          per AS (SELECT doc_id, count(*) AS nb,
                    CAST(sum(part) AS BIGINT) AS ss
                  FROM inst JOIN rate USING (l, r) GROUP BY 1)
        SELECT x.doc_id,
          CAST(coalesce(nb, 0) AS INTEGER) AS n_bigrams,
          coalesce(ss, 0) AS score_sum,
          CAST(CASE WHEN nb IS NULL THEN 0
            ELSE floor(ss::DOUBLE / nb::DOUBLE) END AS BIGINT)
            AS fluency_micro
        FROM x LEFT JOIN per ON x.doc_id = per.doc_id
        ORDER BY x.doc_id""")),

    // q132: hashed n-gram importance weighting for domain selection — the
    // DSIR step of an LLM pipeline (Xie et al., NeurIPS 2023: weight raw
    // documents by how target-like their hashed-ngram distribution is,
    // then resample). Target here is the lang='en' slice; features are
    // unigram+bigram instances hashed into 4096 buckets (q129's md5
    // bucketing, so the oracle mirrors bit-for-bit); per-bucket importance
    // is the add-1-smoothed probability ratio, kept as floor(1e6·ratio)
    // whose three IEEE divides + multiply are bit-portable — DSIR's
    // log-space product is deliberately traded for a rational per-feature
    // sum so the WHOLE train+score path hash-matches instead of going
    // rows-only. Shape: ONE feature-instance pass feeds both distributions
    // (count + count-if-target per bucket, map-side combine to ≤4096
    // rows); totals are a 1-row broadcast witness; the ≤4096-row rate
    // table broadcast-joins back to instances; one doc_id hash-agg.
    QueryDef("q132_dsir_weights",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val bigrams = when(size(t) >= 2,
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))
        val inst = docs(s, d)
          .select(col("doc_id"), col("lang"), explode(concat(t, bigrams)).as("feat"))
          .select(col("doc_id"), col("lang"),
            pmod(TextFns.hash32(col("feat")), lit(4096L)).as("b"))
        val isT = (col("lang") <=> "en").cast("long") // null lang → 0, matching the oracle's CASE/coalesce
        val buckets = inst.groupBy("b")
          .agg(count(lit(1)).as("cs"), sum(isT).as("ct"))
        val totals = buckets.agg(sum("cs").as("ns"), sum("ct").as("nt"))
        val rate = buckets.crossJoin(broadcast(totals))
          .select(col("b"), floor(lit(1e6) *
            (((col("ct") + 1) / (col("nt") + 4096)) /
              ((col("cs") + 1) / (col("ns") + 4096)))).as("part"))
        val per = inst.join(broadcast(rate), Seq("b"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nf"), sum("part").as("ws"))
        docs(s, d).select("doc_id", "lang").join(per, Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang"),
            coalesce(col("nf"), lit(0L)).cast("int").as("n_feats"),
            coalesce(col("ws"), lit(0L)).as("weight_sum"),
            when(col("nf").isNull, lit(0L))
              .otherwise(floor(col("ws") / col("nf"))).as("weight_micro"))
          .withColumn("targetlike", col("weight_micro") >= lit(1000000L))
          .orderBy("doc_id")
      },
      Some(s"""WITH x AS (SELECT doc_id, lang, $OToks t FROM documents),
          f AS (SELECT doc_id, lang, unnest(t ||
                  [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) feat
                FROM x),
          inst AS (SELECT doc_id, lang,
                     ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096 AS b
                   FROM f),
          buckets AS (SELECT b, count(*) AS cs,
                        coalesce(sum(CASE WHEN lang = 'en' THEN 1 END), 0) AS ct
                      FROM inst GROUP BY 1),
          totals AS (SELECT CAST(sum(cs) AS BIGINT) AS ns,
                       CAST(sum(ct) AS BIGINT) AS nt FROM buckets),
          rate AS (SELECT b,
                     CAST(floor(1000000.0 *
                       (((ct + 1)::DOUBLE / (nt + 4096)::DOUBLE) /
                        ((cs + 1)::DOUBLE / (ns + 4096)::DOUBLE)))
                       AS BIGINT) AS part
                   FROM buckets, totals),
          per AS (SELECT doc_id, count(*) AS nf,
                    CAST(sum(part) AS BIGINT) AS ws
                  FROM inst JOIN rate USING (b) GROUP BY 1)
        SELECT x.doc_id, x.lang,
          CAST(coalesce(nf, 0) AS INTEGER) AS n_feats,
          coalesce(ws, 0) AS weight_sum,
          CAST(CASE WHEN nf IS NULL THEN 0
            ELSE floor(ws::DOUBLE / nf::DOUBLE) END AS BIGINT)
            AS weight_micro,
          (CASE WHEN nf IS NULL THEN 0
            ELSE floor(ws::DOUBLE / nf::DOUBLE) END) >= 1000000
            AS targetlike
        FROM x LEFT JOIN per ON x.doc_id = per.doc_id
        ORDER BY x.doc_id""")),

    // q137: compression-ratio repetition proxy — deflate the UTF-8 text
    // (codegen'd native Expression over the JDK's zlib) and score
    // ratio_micro = ⌊1e6·deflated/raw⌋; templated/repetitive docs
    // collapse, near-random text doesn't (Gopher §A.1.1 / RefinedWeb use
    // this as a cheap corpus-quality lever). Deterministic per zlib build
    // but not SQL-portable → rows-only, content-pinned in GoldenHashSpec,
    // with constructed-case semantics in CompressionSpec. One map-side
    // pass; the only shuffle is the presentation orderBy.
    QueryDef("q137_compression_ratio",
      (s, d) => compressionRatio(s, docs(s, d)).orderBy("doc_id"),
      None),

    // q138: curriculum construction — easy→hard staging by token count
    // with a deterministic seeded interleave inside each stage
    // (Packing.curriculumOrder; Bengio'09 curriculum, short→long length
    // schedule). Stage and position are EXACT ranks (two-phase, no global
    // window) so the full schedule hash-matches the oracle's
    // row_number-over-everything formulation.
    QueryDef("q138_curriculum_order",
      (s, d) => graft.operators.Packing
        .curriculumOrder(docs(s, d), "doc_id", "text", 4, "curr", 32)
        .select(col("id").as("doc_id"), col("n_toks"), col("stage"),
          col("h"), col("pos"))
        .orderBy("doc_id"),
      Some(s"""WITH base AS (
          SELECT doc_id, CAST(len($OToks) AS BIGINT) n_toks FROM documents),
        r AS (SELECT doc_id, n_toks,
                row_number() OVER (ORDER BY n_toks, doc_id) - 1 AS dr,
                count(*) OVER () AS n_total
              FROM base),
        s AS (SELECT doc_id, n_toks,
                CAST((dr * 4) // n_total AS BIGINT) AS stage,
                ('0x' || substr(md5('curr:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
              FROM r)
        SELECT doc_id, n_toks, stage, h,
          CAST(row_number() OVER (ORDER BY stage, h, doc_id) - 1 AS BIGINT) AS pos
        FROM s ORDER BY doc_id""")),

    // q151: quality-aware dedup survivor selection — per near-dup cluster
    // (the q34/q77/q150 shared pair index → connected components) keep the
    // HIGHEST q31-quality member, ties to lowest id, instead of the
    // arbitrary min-id survivor. The argmax is a map-side-combinable
    // max_by hash agg (no per-cluster window), so an adversarial
    // one-giant-cluster corpus cannot serialize one task.
    QueryDef("q151_quality_survivors",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val nt = size(t).cast("long")
        val nd = size(array_distinct(t)).cast("long")
        val stops = size(filter(t, x => x.isin("the", "a"))).cast("long")
        // q31's integer-portable composite quality (one exact division)
        val quality = (lit(4000L) * nd + lit(3000L) * (nt - stops)
          + lit(30L) * least(nt, lit(100L)) * nt).cast("double") /
          (lit(10000L) * nt).cast("double")
        val scored = docs(s, d).select(col("doc_id"), quality.as("quality"))
        Dedup.survivorsByScore(jaccardPairs(s, d), scored, "doc_id", "quality")
          .withColumnRenamed("score", "quality")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE
          toks AS (SELECT doc_id, $OToks t FROM documents),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          jp AS (
            SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
              FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          edges AS (SELECT id_a s, id_b d FROM jp UNION ALL SELECT id_b, id_a FROM jp),
          reach AS (
            SELECT DISTINCT s AS id, s AS lbl FROM edges
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
          cl AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY 1),
          q AS (SELECT doc_id,
              (4000*nd + 3000*(nt-st) + 30*least(nt,100)*nt)::DOUBLE
                / (10000*nt)::DOUBLE AS quality
            FROM (SELECT doc_id, len(t) nt, len(list_distinct(t)) nd,
                    len(list_filter(t, x -> x IN ('the','a'))) st
                  FROM toks) m),
          x AS (SELECT q.doc_id, coalesce(cl.cluster, q.doc_id) AS cluster,
                  q.quality
                FROM q LEFT JOIN cl ON q.doc_id = cl.doc_id),
          sv AS (SELECT cluster, doc_id AS survivor_id, n_members FROM (
              SELECT cluster, doc_id,
                count(*) OVER (PARTITION BY cluster) n_members,
                row_number() OVER (PARTITION BY cluster
                  ORDER BY quality DESC, doc_id) rn
              FROM x) r WHERE rn = 1)
        SELECT x.doc_id, x.cluster, x.quality, sv.survivor_id,
          CAST(sv.n_members AS BIGINT) AS n_members,
          x.doc_id = sv.survivor_id AS kept
        FROM x JOIN sv USING (cluster) ORDER BY x.doc_id""")),

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

    // q153: epoch-replication mixture — stated per-language weights + a
    // 200% token budget, capped at 3 epochs, yield integer per-document
    // repeat counts (GPT-3/LLaMA's published epochs table as an operator).
    // Up- AND down-samples, unlike q104's admission-only α-sampling.
    // Integer-exact end to end; remainder admission is the two-phase
    // bucketed prefix sum.
    QueryDef("q153_epoch_mixture",
      (s, d) => Mixture.epochMix(docs(s, d), "doc_id", "lang", "text",
          Seq("en" -> 40L, "es" -> 15L, "de" -> 15L, "fr" -> 15L,
            "zh" -> 15L), 2L, 1L, 3)
        .select(col("id").as("doc_id"), col("grp").as("lang"),
          col("n_toks"), col("full_epochs"), col("repeats"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
          SELECT doc_id, lang, CAST(len($OToks) AS BIGINT) n_toks
          FROM documents),
        m AS (SELECT lang, sum(n_toks) m FROM t GROUP BY 1),
        w AS (SELECT * FROM (VALUES ('en', 40), ('es', 15), ('de', 15),
               ('fr', 15), ('zh', 15)) wv(lang, wt)),
        mw AS (SELECT m.lang, m.m, coalesce(w.wt, 0) w
               FROM m LEFT JOIN w USING (lang)),
        tot AS (SELECT sum(m) tot, sum(w) wsum FROM mw),
        tg AS (SELECT lang, m, w,
            CASE WHEN wsum = 0 THEN 0
                 ELSE (w * ((tot * 2) // 1)) // wsum END target
          FROM mw CROSS JOIN tot),
        tg2 AS (SELECT lang, m,
            CASE WHEN m = 0 THEN 0 ELSE least(target // m, 3) END fe,
            CASE WHEN m = 0 THEN 0
                 WHEN least(target // m, 3) < 3
                   THEN target - least(target // m, 3) * m
                 ELSE 0 END rem
          FROM tg),
        cum AS (SELECT doc_id, lang, n_toks,
            sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ct
          FROM t)
        SELECT c.doc_id, c.lang, c.n_toks,
          CAST(g.fe AS BIGINT) full_epochs,
          CAST(g.fe + CASE WHEN c.ct <= g.rem THEN 1 ELSE 0 END AS BIGINT)
            repeats
        FROM cum c JOIN tg2 g USING (lang) ORDER BY c.doc_id""")),

    // q154: PMI phrase mining — corpus-level collocation table (the
    // word2phrase / tokenizer-seeding step). Ranking by the scaled PMI
    // RATIO (log-free, fixed IEEE op order) keeps the score portable;
    // min-support 5, top-50, TakeOrdered global top-k.
    QueryDef("q154_pmi_phrases",
      (s, d) => graft.operators.Collocations
        .pmiPhrases(docs(s, d), "text", 5L, 50),
      Some(s"""WITH toks AS (SELECT $OToks t FROM documents),
        uni AS (SELECT w, count(*) c FROM (SELECT unnest(t) w FROM toks) u
                GROUP BY 1),
        ut AS (SELECT sum(c) nu FROM uni),
        bg AS (SELECT t[i] w1, t[i + 1] w2 FROM (
            SELECT t, unnest(generate_series(1, len(t) - 1)) i
            FROM toks WHERE len(t) >= 2) z),
        bc AS (SELECT w1, w2, count(*) cab FROM bg GROUP BY 1, 2),
        bt AS (SELECT sum(cab) nb FROM bc),
        j AS (SELECT bc.w1, bc.w2, bc.cab, a.c ca, b.c cb, nu, nb
          FROM bc JOIN uni a ON bc.w1 = a.w JOIN uni b ON bc.w2 = b.w
          CROSS JOIN ut CROSS JOIN bt
          WHERE bc.cab >= 5)
        SELECT w1, w2, cab, ca, cb,
          CAST(floor(((cab::DOUBLE * nu::DOUBLE) / (ca::DOUBLE * cb::DOUBLE))
            * (nu::DOUBLE / nb::DOUBLE) * 10000) AS BIGINT) pmi_scaled
        FROM j
        ORDER BY pmi_scaled DESC, w1, w2 LIMIT 50""")),

    // q155: dataset profile card — the per-release statistics block, ONE
    // full-scan aggregation for every metric (row count, dim distinct/null
    // counts, integral measure min/max/sum/nulls) unpivoted to a fixed
    // diffable (metric, value) card. Float sums are refused by the
    // operator's portability contract; every value here is an
    // exactly-representable integer in a double.
    QueryDef("q155_profile_card",
      (s, d) => graft.operators.Profile.card(docs(s, d),
        Seq("lang", "source"), Seq("n_chars", "doc_id")),
      Some("""WITH a AS (SELECT
          count(*)::DOUBLE n_rows,
          count(DISTINCT lang)::DOUBLE lang_distinct,
          sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::DOUBLE lang_nulls,
          count(DISTINCT source)::DOUBLE source_distinct,
          sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::DOUBLE source_nulls,
          min(n_chars)::DOUBLE n_chars_min,
          max(n_chars)::DOUBLE n_chars_max,
          sum(n_chars)::DOUBLE n_chars_sum,
          sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::DOUBLE n_chars_nulls,
          min(doc_id)::DOUBLE doc_id_min,
          max(doc_id)::DOUBLE doc_id_max,
          sum(doc_id)::DOUBLE doc_id_sum,
          sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::DOUBLE doc_id_nulls
        FROM documents)
        SELECT 'n_rows' AS metric, n_rows AS "value" FROM a
        UNION ALL SELECT 'lang_distinct', lang_distinct FROM a
        UNION ALL SELECT 'lang_nulls', lang_nulls FROM a
        UNION ALL SELECT 'source_distinct', source_distinct FROM a
        UNION ALL SELECT 'source_nulls', source_nulls FROM a
        UNION ALL SELECT 'n_chars_min', n_chars_min FROM a
        UNION ALL SELECT 'n_chars_max', n_chars_max FROM a
        UNION ALL SELECT 'n_chars_sum', n_chars_sum FROM a
        UNION ALL SELECT 'n_chars_nulls', n_chars_nulls FROM a
        UNION ALL SELECT 'doc_id_min', doc_id_min FROM a
        UNION ALL SELECT 'doc_id_max', doc_id_max FROM a
        UNION ALL SELECT 'doc_id_sum', doc_id_sum FROM a
        UNION ALL SELECT 'doc_id_nulls', doc_id_nulls FROM a
        ORDER BY metric"""))
  )
}
