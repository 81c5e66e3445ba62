package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Mixture, Packing, Sampling, Similarity}
import graft.functions.{SketchExpressions, TextFns}

import graft.queries.TextShared.{docs, OShingles, OToks}

/** Deduplication family over `documents`: exact, the four near-dup
  * candidate-generation schemes (inverted-index Jaccard, MinHash-LSH,
  * SimHash, sorted-neighborhood ± multi-pass, PPJoin prefix filter,
  * winnowing), the at-rest index lifecycle (build/append/probe,
  * bloom-prefiltered incremental), cluster formation (batch and
  * incremental), decontamination, span scrubbing, survivor selection and
  * the savings accounting. Split from TextOps along the family seam —
  * pure move, no behavior change; shared portability rules in
  * [[TextShared]].
  */
object TextDedupOps {

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

  // q147's saved MinHash-LSH near-dup index over the corpus slice — same
  // build-once lifecycle; later calls are pure batch probes.
  private val lshIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  // q298's saved winnowing fingerprint index (built + appended once per
  // session/dir; the registered query is then a pure batch probe)
  private val winnowIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  // q314/q315's compacted index twins (build + append + COMPACT once per
  // session/dir — their own dirs, never q147/q298's: compaction swaps
  // directories, and a sibling query's lazily-listed files must not be
  // retired under it)
  private val compactedWinnowCache = new SessionMemo[String]
  private val compactedLshCache = new SessionMemo[String]

  // q228's full daily-relabel lifecycle artifact (index build + two
  // append/probe/relabel rounds + the final label table), run ONCE per
  // (session, sf dir): the appends MUTATE the at-rest index, so the
  // lifecycle itself must not re-run per invocation — the registered
  // query reads the published labels, the q193/q221 at-rest stance.
  private val relabelCache = new SessionMemo[String]

  // q250's oracle replays the MinHash permutation family itself — the
  // fixed-seed (a_j, b_j) constants inlined as a VALUES list so DuckDB
  // computes the identical signatures.
  private val OPermConsts = TextFns.PermConsts.take(48).zipWithIndex
    .map { case ((a, b), j) => s"($j, ${a}::BIGINT, ${b}::BIGINT)" }
    .mkString(", ")

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

  private[graft] val defs: Seq[QueryDef] = Seq(

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
    // Maintenance: daily appends accumulate one file per batch per band —
    // Dedup.compactLshIndex (r19 directive #3, staged-swap, probe-
    // identical, spec: appends+compact ≡ one-shot build) bounds the file
    // count the probes scan.
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

    // q228: the WHOLE daily-relabel story through one gate — the dedup
    // family's at-rest lifecycle composed end-to-end (what q147 proves
    // for the index and q164 for the label algebra, composed and driven
    // through a hash-match): batch 0 builds the LSH index and seeds the
    // label table from its own near-dup pairs; each later batch (1) is
    // APPENDED to the index (signs only itself — appendToLshIndex),
    // (2) probes the index for its pairs against everything ingested so
    // far (including itself), and (3) relabels ONLY the touched
    // components (incrementalComponents — the corpus label table is
    // never iterated). Every cross-batch pair is discovered exactly by
    // the later batch's probe, and min-id labels compose, so the final
    // table must equal the full recursive-CTE solve over ALL exact
    // near-dup pairs — which is the oracle (shared-oracle argument as
    // q35/q147: banding recall ≈ 1 on this corpus's planted pairs). The
    // lifecycle runs once per session/dir (appends mutate the index);
    // the registered read is label-table-sized. At 100 TB each day pays
    // ONE batch signing + a batch-broadcast probe + a quotient-graph
    // solve bounded by the day's collisions.
    QueryDef("q228_dedup_relabel_lifecycle",
      (s, d) => {
        val path = relabelCache(s, d) {
          val base = java.nio.file.Files
            .createTempDirectory("graft_q228").toString
          val idx = s"$base/index"
          def slice(i: Int) =
            docs(s, d).filter(pmod(col("doc_id"), lit(3L)) === i)
          Dedup.buildLshIndex(slice(0), "doc_id", "text", 3, idx)
          // every probe and label table is SNAPSHOTTED (Checkpoints.cut)
          // before the next append MUTATES the index: lshIndexedPairs
          // returns a lazy frame that re-reads the bucket postings at
          // evaluation time, so an un-cut round-1 probe evaluated inside
          // round 2's plan would see batch 2's postings and silently
          // mislabel (the production shape too — a daily relabel
          // materializes the day's pairs before the next ingest lands)
          var labels = graft.operators.Components.connectedComponents(
            graft.operators.Checkpoints.cut(
              Dedup.lshIndexedPairs(s, idx, slice(0), "doc_id", "text", 0.6)),
            "id_a", "id_b")
          (1 to 2).foreach { i =>
            Dedup.appendToLshIndex(s, idx, slice(i), "doc_id", "text")
            val pairs = graft.operators.Checkpoints.cut(
              Dedup.lshIndexedPairs(s, idx, slice(i), "doc_id", "text", 0.6))
            labels = graft.operators.Checkpoints.cut(
              graft.operators.Components.incrementalComponents(
                labels, pairs, "id_a", "id_b"))
          }
          labels.write.parquet(s"$base/labels")
          s"$base/labels"
        }
        s.read.parquet(path)
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE
          toks AS (SELECT doc_id, $OToks t FROM documents),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          jp AS (
            SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
                count(*) inter
              FROM inv a JOIN inv b ON a.shingle = b.shingle
                AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          edges AS (SELECT id_a s, id_b d FROM jp
            UNION ALL SELECT id_b, id_a FROM jp),
          reach AS (
            SELECT DISTINCT s AS id, s AS lbl FROM edges
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id)
        SELECT CAST(id AS BIGINT) doc_id,
          CAST(min(lbl) AS BIGINT) AS "cluster"
        FROM reach GROUP BY 1 ORDER BY doc_id""")),

    // q239: the cross-source NEAR-DUP FLOW matrix — who copies from
    // whom: per unordered source pair, how many exact near-dup pairs
    // (3-gram Jaccard ≥ 0.6, the q34 gold standard) straddle the two —
    // the provenance read behind mixture double-counting (two sources
    // sharing content make their stated mixture weights lie) and
    // cross-source leakage audits. Rides the memoized shared pair index
    // (q34/q77/q85/q150's frame — zero extra corpus work); the
    // doc_id → source attachments are equi-joins against the tiny pairs
    // frame; diagonal cells (both docs in one source) are intra-source
    // duplication and kept — the matrix is complete. At 100 TB the
    // pairs frame comes from the LSH path and the matrix stays
    // |sources|²-bounded.
    QueryDef("q239_neardup_flow",
      (s, d) => {
        val src = docs(s, d).select(col("doc_id"), col("source"))
        jaccardPairs(s, d)
          .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
            "id_a")
          .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
            "id_b")
          .groupBy(least(col("sa"), col("sb")).as("src_lo"),
            greatest(col("sa"), col("sb")).as("src_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("src_lo", "src_hi")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
        pairs AS (
          SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
          FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        nd AS (SELECT id_a, id_b FROM pairs
          WHERE round(inter / (na + nb - inter), 4) >= 0.6),
        j AS (SELECT da.source sa, db.source sb FROM nd
          JOIN documents da ON da.doc_id = nd.id_a
          JOIN documents db ON db.doc_id = nd.id_b)
        SELECT least(sa, sb) src_lo, greatest(sa, sb) src_hi,
          count(*) AS n_pairs
        FROM j GROUP BY 1, 2 ORDER BY 1, 2""")),

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

    // q250: MinHash estimator-error audit — per near-dup pair (the q34
    // shared index), the sketch's similarity estimate (matching signature
    // positions over 48 permutations, Broder '97) NEXT TO the exact
    // shingle Jaccard, both integer micro-ratios. The calibration
    // evidence behind the LSH path's `perms` choice: the oracle replays
    // the whole permutation family ((aⱼ·h + bⱼ) mod P, constants inlined
    // from TextFns.PermConsts), so this is the one query that hash-pins
    // the SIGNATURES themselves, not just the verified pair set.
    QueryDef("q250_minhash_estimate_audit",
      (s, d) => Dedup.minhashEstimateAudit(docs(s, d), "doc_id", "text", 3,
          jaccardPairs(s, d), 48)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
        pr AS (SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
            count(*) inter
          FROM inv a JOIN inv b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        np AS (SELECT id_a, id_b, CAST(inter AS BIGINT) inter,
            CAST(na + nb - inter AS BIGINT) unio
          FROM pr WHERE round(inter / (na + nb - inter), 4) >= 0.6),
        ids AS (SELECT id_a doc_id FROM np UNION SELECT id_b FROM np),
        hv AS (SELECT i.doc_id,
            ('0x' || substr(md5(i.shingle), 1, 15))::BIGINT % 2147483647 hp
          FROM inv i JOIN ids USING (doc_id)),
        cst AS (SELECT * FROM (VALUES $OPermConsts) v(j, a, b)),
        sig AS (SELECT doc_id, j, min((a * hp + b) % 2147483647) sv
          FROM hv CROSS JOIN cst GROUP BY 1, 2),
        m AS (SELECT np.id_a, np.id_b, np.inter, np.unio,
            CAST(sum(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) AS BIGINT)
              sig_matches
          FROM np JOIN sig sa ON sa.doc_id = np.id_a
            JOIN sig sb ON sb.doc_id = np.id_b AND sb.j = sa.j
          GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b, sig_matches, inter, unio,
          CAST(sig_matches * 1000000 // 48 AS BIGINT) est_micro,
          CAST(inter * 1000000 // unio AS BIGINT) jac_micro,
          CAST(abs(sig_matches * 1000000 // 48 - inter * 1000000 // unio)
            AS BIGINT) err_micro
        FROM m ORDER BY id_a, id_b""")),

    // q256: inverse-df-WEIGHTED Jaccard over the q34 pair set — the
    // rarity-aware rescoring (Chaudhuri/Xiao weighted similarity joins):
    // two docs sharing RARE shingles are far stronger dup evidence than
    // two sharing boilerplate, and plain Jaccard can't tell them apart.
    // Weight = ⌊10⁶/df⌋, integer and log-free (idf's ln is
    // library-dependent, inverse-df orders identically — the q179
    // stance); num/den exact int64. df rides the postings the near-dup
    // index already materializes; scoring touches only
    // pair-participating docs.
    QueryDef("q256_weighted_jaccard",
      (s, d) => Dedup.weightedJaccardPairs(docs(s, d), "doc_id", "text", 3,
          jaccardPairs(s, d).select("id_a", "id_b"))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
        df AS (SELECT shingle, count(*) df FROM inv GROUP BY 1),
        wp AS (SELECT inv.doc_id, inv.shingle, 1000000 // df.df w
          FROM inv JOIN df USING (shingle)),
        pr AS (SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
            count(*) inter
          FROM inv a JOIN inv b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        np AS (SELECT id_a, id_b FROM pr
          WHERE round(inter / (na + nb - inter), 4) >= 0.6),
        tw AS (SELECT doc_id, CAST(sum(w) AS BIGINT) wt FROM wp GROUP BY 1),
        cw AS (SELECT np.id_a, np.id_b, CAST(sum(a.w) AS BIGINT) inter_w
          FROM np JOIN wp a ON a.doc_id = np.id_a
            JOIN wp b ON b.doc_id = np.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2)
        SELECT np.id_a, np.id_b, coalesce(cw.inter_w, 0) inter_w,
          ta.wt + tb.wt - coalesce(cw.inter_w, 0) union_w,
          CAST(coalesce(cw.inter_w, 0) * 1000000 //
            (ta.wt + tb.wt - coalesce(cw.inter_w, 0)) AS BIGINT) wsim_micro
        FROM np LEFT JOIN cw USING (id_a, id_b)
          JOIN tw ta ON ta.doc_id = np.id_a
          JOIN tw tb ON tb.doc_id = np.id_b
        ORDER BY id_a, id_b""")),

    // q268: LSH banding-scheme planner — per true near-dup pair, the
    // banding survival probability 1 − (1 − s^r)^b under the three
    // candidate schemes that partition a 48-perm signature (12×4, 8×6,
    // 6×8): the recall-vs-candidate-volume tuning table behind q35's
    // 12×4 choice, evaluated on the ACTUAL pair similarities instead of
    // a textbook S-curve. Float portability: s = one exact-integer
    // division; every power is an explicit multiply CHAIN (square-and-
    // multiply, identical op order both engines) — pow() is a libm call
    // and libm is not part of the contract.
    QueryDef("q268_lsh_scheme_planner",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val pairs0 = jaccardPairs(s, d).select("id_a", "id_b")
        val ids = pairs0.select(col("id_a").as("doc_id"))
          .union(pairs0.select(col("id_b").as("doc_id"))).distinct()
        // semi-join first (the q250 stance): shingle sets exist only for
        // pair-PARTICIPATING docs, and the cut frame feeds both join
        // sides — one docs scan, pair-sized state. No size(sh) > 0 filter:
        // every id in `ids` comes from the pair memo, whose pairs exist
        // only for docs with ≥ 3 tokens (they produced shingle postings),
        // so the filter was a no-op on values — and Catalyst substituted
        // the whole shingle expression into it and pushed it BELOW the
        // semi-join, making the FULL corpus scan evaluate the interpreted
        // higher-order shingle expression twice (r21: 4.3 s → 0.6 s).
        val sets = graft.operators.Checkpoints.cut(
          docs(s, d).join(ids, Seq("doc_id"), "left_semi")
            .select(col("doc_id"), TextFns.shingles(t, 3).as("sh")))
        val base = pairs0
          .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sha")),
            "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("sh").as("shb")),
            "id_b")
          .withColumn("inter",
            size(array_intersect(col("sha"), col("shb"))).cast("long"))
          .withColumn("unio", size(col("sha")).cast("long") +
            size(col("shb")).cast("long") - col("inter"))
          .withColumn("sim", col("inter").cast("double") / col("unio"))
          .withColumn("s2", col("sim") * col("sim"))
          .withColumn("s4", col("s2") * col("s2"))
          .withColumn("s6", col("s4") * col("s2"))
          .withColumn("s8", col("s4") * col("s4"))
          .withColumn("u", lit(1.0) - col("s4"))
          .withColumn("v", lit(1.0) - col("s6"))
          .withColumn("w", lit(1.0) - col("s8"))
          .withColumn("u2", col("u") * col("u"))
          .withColumn("v2", col("v") * col("v"))
          .withColumn("w2", col("w") * col("w"))
          .withColumn("u4", col("u2") * col("u2"))
          .withColumn("v4", col("v2") * col("v2"))
          .withColumn("w4", col("w2") * col("w2"))
          .withColumn("u8", col("u4") * col("u4"))
        val res = base.select(col("id_a"), col("id_b"), col("inter"),
            col("unio"),
            round(lit(1.0) - col("u8") * col("u4"), 6).as("p_12x4"),
            round(lit(1.0) - col("v4") * col("v4"), 6).as("p_8x6"),
            round(lit(1.0) - col("w4") * col("w2"), 6).as("p_6x8"))
          .orderBy("id_a", "id_b")
        graft.operators.Checkpoints.sealAndRelease(res, sets)
      },
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
        pr AS (SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
            count(*) inter
          FROM inv a JOIN inv b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        np AS (SELECT id_a, id_b, CAST(inter AS BIGINT) inter,
            CAST(na + nb - inter AS BIGINT) unio
          FROM pr WHERE round(inter / (na + nb - inter), 4) >= 0.6),
        c0 AS (SELECT *, CAST(inter AS DOUBLE) / unio sim FROM np),
        c1 AS (SELECT *, sim * sim s2 FROM c0),
        c2 AS (SELECT *, s2 * s2 s4 FROM c1),
        c3 AS (SELECT *, s4 * s2 s6, s4 * s4 s8, 1 - s4 u FROM c2),
        c4 AS (SELECT *, u * u u2, 1 - s6 v, 1 - s8 w FROM c3),
        c5 AS (SELECT *, u2 * u2 u4, v * v v2, w * w w2 FROM c4),
        c6 AS (SELECT *, u4 * u4 u8, v2 * v2 v4, w2 * w2 w4 FROM c5)
        SELECT id_a, id_b, inter, unio,
          round(1 - u8 * u4, 6) p_12x4,
          round(1 - v4 * v4, 6) p_8x6,
          round(1 - w4 * w2, 6) p_6x8
        FROM c6 ORDER BY id_a, id_b""")),

    // q272: dedup mixture shift — "dedup silently reweights the
    // mixture": dedup removes duplicates NON-uniformly across sources
    // (boilerplate-heavy sources lose more), so the post-dedup token
    // shares differ from the raw shares a mixture was tuned against.
    // Dedup key = md5 of the SORTED DISTINCT token set (bag-of-words
    // dedup — catches shuffled/permuted near-copies byte-exact dedup
    // misses; the corpus has no byte dups but ~12 % BoW dups), min-id
    // survivor. Per source: docs/tokens before and after, and the
    // share shift in exact micro units (negative = the source LOST
    // mixture weight). One fingerprint shuffle + one source aggregate.
    QueryDef("q272_dedup_mixture_shift",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("doc_id")
        val base = docs(s, d).select(col("doc_id"), col("source"),
            size(TextFns.tokens(col("text"))).cast("long").as("nt"),
            md5(array_join(array_sort(array_distinct(
              TextFns.tokens(col("text")))), " ")).as("fp"))
          .withColumn("kept", row_number().over(w) === 1)
        val per = base.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum("nt").as("tok_raw"),
            sum(when(col("kept"), col("nt")).otherwise(0L)).as("tok_kept"))
        val tot = per.agg(sum("tok_raw").as("tr"), sum("tok_kept").as("tk"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_kept"),
            col("tok_raw"), col("tok_kept"),
            expr("tok_raw * 1000000 div tr").as("share_raw_micro"),
            expr("tok_kept * 1000000 div tk").as("share_kept_micro"),
            (expr("tok_kept * 1000000 div tk") -
              expr("tok_raw * 1000000 div tr")).as("shift_micro"))
          .orderBy("source")
      },
      Some(s"""WITH b0 AS (SELECT doc_id, source, len($OToks) nt,
            md5(array_to_string(list_sort(list_distinct($OToks)), ' ')) fp
          FROM documents),
        b AS (SELECT *, row_number() OVER (PARTITION BY fp
            ORDER BY doc_id) = 1 kept FROM b0),
        per AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
            CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) n_kept,
            CAST(sum(nt) AS BIGINT) tok_raw,
            CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT) tok_kept
          FROM b GROUP BY 1),
        tot AS (SELECT sum(tok_raw) tr, sum(tok_kept) tk FROM per)
        SELECT source, n_docs, n_kept, tok_raw, tok_kept,
          CAST(tok_raw * 1000000 // tr AS BIGINT) share_raw_micro,
          CAST(tok_kept * 1000000 // tk AS BIGINT) share_kept_micro,
          CAST(tok_kept * 1000000 // tk - tok_raw * 1000000 // tr
            AS BIGINT) shift_micro
        FROM per, tot ORDER BY source""")),

    // q278: near-dup transitivity audit — the one-row justification for
    // clustering (q77) over pairwise deletion: "A~B and B~C but not
    // A~C" wedges are exactly where deleting one side of every pair
    // either over- or under-deletes. Counts edges, wedges (neighbor
    // pairs at a shared center), closed wedges (the third side IS a
    // near-dup pair) and the closure rate in exact micro units. Rides
    // the shared q34 pair memo; wedge join is pair-table-sized.
    QueryDef("q278_dedup_transitivity",
      (s, d) => {
        val p = jaccardPairs(s, d).select("id_a", "id_b")
        val adj = p.select(col("id_a").as("c"), col("id_b").as("n"))
          .union(p.select(col("id_b").as("c"), col("id_a").as("n")))
        val wedges = adj.as("x").join(adj.as("y"),
            col("x.c") === col("y.c") && col("x.n") < col("y.n"))
          .select(col("x.n").as("u"), col("y.n").as("v"))
        val closed = wedges
          .join(p.select(col("id_a").as("u"), col("id_b").as("v"),
            lit(true).as("cl")), Seq("u", "v"), "left")
        val nEdges = p.count()
        closed.agg(count(lit(1)).as("n_wedges"),
            sum(when(col("cl"), 1L).otherwise(0L)).as("n_closed"))
          .select(lit(nEdges).as("n_edges"), col("n_wedges"),
            col("n_closed"),
            (col("n_wedges") - col("n_closed")).as("n_open"),
            when(col("n_wedges") > 0L,
              expr("n_closed * 1000000 div n_wedges")).as("closure_micro"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
        pr AS (SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
            count(*) inter
          FROM inv a JOIN inv b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        np AS (SELECT id_a, id_b FROM pr
          WHERE round(inter / (na + nb - inter), 4) >= 0.6),
        adj AS (SELECT id_a c, id_b n FROM np
          UNION ALL SELECT id_b, id_a FROM np),
        w AS (SELECT x.n u, y.n v FROM adj x JOIN adj y
          ON x.c = y.c AND x.n < y.n),
        cl AS (SELECT w.u, w.v, np.id_a IS NOT NULL c
          FROM w LEFT JOIN np ON np.id_a = w.u AND np.id_b = w.v)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM np) n_edges,
          CAST(count(*) AS BIGINT) n_wedges,
          CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) n_closed,
          CAST(count(*) - sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT)
            n_open,
          CASE WHEN count(*) > 0 THEN
            CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) * 1000000 // count(*)
              AS BIGINT) END closure_micro
        FROM cl""")),

    // q289: blocking-recall planning table — the candidate-generation
    // audit every blocked dedup deploy needs BEFORE picking its window:
    // for SNM windows w ∈ {2, 5, 10}, the exact recall of the length-key
    // sorted-neighborhood pass against the TRUE ≥0.6-Jaccard pair set
    // (the shared q34 memo). q250 audits the SKETCH's estimate per pair;
    // this audits the BLOCKING's coverage per window — together they are
    // the two error sources of the scale path (LSH/SNM candidates ×
    // sketch scores). n_hit ≡ n_blocked by construction (SNM verifies
    // the same exact Jaccard), so the law is spec-checkable and the
    // recall curve recall_micro = n_hit·1e6/n_true is the deliverable:
    // the window where it saturates is the cheapest safe deploy. Cost:
    // one O(n·w) SNM pass per window over the rank frame + pair-memo
    // semi-joins; the truth side is the session pair memo, never re-
    // derived.
    QueryDef("q289_blocking_recall",
      (s, d) => {
        // ONE dist-tagged SNM pass at the widest window (r21, guide §2.4:
        // snmPairs(w) ≡ the dist ≤ w slice of the wmax pass — see
        // Dedup.snmPairsWithDist — so the three rungs' rankings and
        // verifications collapse into one; per-w counts are conditional
        // sums over the single verified pair table, and the truth flag
        // rides one left join instead of three semi-joins).
        val truth = jaccardPairs(s, d).select("id_a", "id_b")
        val ws = Seq(2, 5, 10)
        val snm = Dedup.snmPairsWithDist(docs(s, d), "doc_id", "text", 3,
          ws.max, 0.6).select("id_a", "id_b", "dist")
        val flagged = snm.join(
          truth.withColumn("hit", lit(true)), Seq("id_a", "id_b"), "left")
        val aggs = ws.flatMap(w => Seq(
          coalesce(sum(when(col("dist") <= w, 1L)), lit(0L)).as(s"b$w"),
          coalesce(sum(when(col("dist") <= w && col("hit"), 1L)),
            lit(0L)).as(s"h$w")))
        val perW = flagged.agg(aggs.head, aggs.tail: _*)
        truth.agg(count(lit(1)).as("n_true")).crossJoin(perW)
          .select(explode(array(ws.map(w =>
            struct(lit(w.toLong).as("w"), col("n_true"),
              col(s"b$w").as("n_blocked"), col(s"h$w").as("n_hit"))): _*))
            .as("r"))
          .select(col("r.w").as("w"), col("r.n_true").as("n_true"),
            col("r.n_blocked").as("n_blocked"), col("r.n_hit").as("n_hit"),
            expr("r.n_hit * 1000000 div r.n_true").as("recall_micro"))
          .orderBy("w")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
        pr AS (SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
            count(*) inter
          FROM inv a JOIN inv b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        tp AS (SELECT id_a, id_b FROM pr
          WHERE round(inter / (na + nb - inter), 4) >= 0.6),
        nt AS (SELECT count(*) n_true FROM tp),
        rw AS (SELECT doc_id,
            row_number() OVER (ORDER BY length(text), doc_id) - 1 AS pos
          FROM documents),
        ws AS (SELECT unnest([2, 5, 10]) w),
        cand AS (SELECT ws.w, a.doc_id ia, b.doc_id ib
          FROM rw a JOIN rw b ON b.pos > a.pos CROSS JOIN ws
          WHERE b.pos <= a.pos + ws.w),
        scored AS (SELECT c.w, least(c.ia, c.ib) id_a,
            greatest(c.ia, c.ib) id_b,
            round(len(list_intersect(x.sh, y.sh)) /
              (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
              4) AS jaccard
          FROM cand c
          JOIN sets x ON x.doc_id = c.ia
          JOIN sets y ON y.doc_id = c.ib),
        snm AS (SELECT w, id_a, id_b FROM scored WHERE jaccard >= 0.6),
        nb AS (SELECT w, count(*) n_blocked FROM snm GROUP BY 1),
        nh AS (SELECT w, count(*) n_hit FROM snm JOIN tp USING (id_a, id_b)
          GROUP BY 1)
      SELECT CAST(ws.w AS BIGINT) w, CAST(nt.n_true AS BIGINT) n_true,
        CAST(coalesce(nb.n_blocked, 0) AS BIGINT) n_blocked,
        CAST(coalesce(nh.n_hit, 0) AS BIGINT) n_hit,
        CAST(coalesce(nh.n_hit, 0) * 1000000 // nt.n_true AS BIGINT)
          recall_micro
      FROM ws CROSS JOIN nt
        LEFT JOIN nb ON ws.w = nb.w LEFT JOIN nh ON ws.w = nh.w
      ORDER BY w""")),

    // q295: SimHash estimator-error audit — q250's companion for the
    // OTHER sketch family: per TRUE ≥0.6-Jaccard pair (the shared q34
    // memo), the 32-bit SimHash signature hamming distance NEXT TO the
    // exact Jaccard — the calibration evidence behind choosing q36's
    // hamming cut (MinHash estimates RESEMBLANCE linearly, q250;
    // SimHash hamming is the Charikar '02 cosine-angle proxy, so its
    // relation to Jaccard is data-dependent — exactly why it must be
    // MEASURED per corpus, not assumed). Signatures computed only for
    // pair-participating docs via semi-join (the q250 stance — never a
    // corpus re-sign); the oracle replays the whole bit-wise sign-sum
    // signature construction, so the hash pins the signatures
    // themselves. Pair-memo-sized throughout.
    QueryDef("q295_simhash_estimate_audit",
      (s, d) => {
        val pairs = jaccardPairs(s, d)
        val ids = pairs.select(col("id_a").as("doc_id"))
          .union(pairs.select(col("id_b"))).distinct()
        val sh = Dedup.simHash(
          docs(s, d).join(ids, Seq("doc_id"), "left_semi"),
          "doc_id", "text")
        pairs
          .join(sh.select(col("id").as("id_a"), col("simhash").as("sa")),
            "id_a")
          .join(sh.select(col("id").as("id_b"), col("simhash").as("sb")),
            "id_b")
          .select(col("id_a"), col("id_b"),
            bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int")
              .as("hamming"),
            col("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
        sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
        pr AS (SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
            count(*) inter
          FROM inv a JOIN inv b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        tp AS (SELECT id_a, id_b,
            round(inter / (na + nb - inter), 4) jaccard
          FROM pr WHERE round(inter / (na + nb - inter), 4) >= 0.6),
        ids AS (SELECT id_a doc_id FROM tp UNION SELECT id_b FROM tp),
        tc AS (SELECT t.doc_id, tok, count(*) cnt,
            ('0x' || substr(md5(tok), 1, 8))::BIGINT h
          FROM (SELECT d.doc_id, unnest(list_filter(
                string_split_regex(lower(d.text), '\\s+'),
                x -> len(x) > 0)) tok
              FROM documents d JOIN ids USING (doc_id)) t
          GROUP BY 1, 2),
        bits AS (SELECT doc_id, b,
            sum(CASE WHEN ((h >> b) & 1) = 1 THEN cnt ELSE -cnt END) s
          FROM tc, (SELECT unnest(generate_series(0, 31)) b) bb
          GROUP BY 1, 2),
        shh AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0
              THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) simhash
          FROM bits GROUP BY 1)
      SELECT tp.id_a, tp.id_b,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) hamming,
        tp.jaccard
      FROM tp JOIN shh a ON a.doc_id = tp.id_a
        JOIN shh b ON b.doc_id = tp.id_b
      ORDER BY id_a, id_b""")),

    // q291: dup-cluster size histogram — the SHAPE of the duplication
    // q85's savings number summarizes away: csize → how many clusters,
    // including the singleton row (docs in no ≥0.6 pair are clusters of
    // size 1 — q77's component solve only sees edge-incident docs, so
    // the singleton count is total − paired, computed without a second
    // corpus pass). The distribution is what decides the dedup STRATEGY:
    // a fat head (one giant template cluster) wants span-scrub/survivor
    // selection, a long tail of pairs wants plain exact dedup; and
    // Σ csize·n_clusters ≡ n_docs is the conservation law the spec pins.
    // Rides the session pair memo + the q77 component machinery; the
    // histogram is cluster-count-sized.
    QueryDef("q291_cluster_size_histogram",
      (s, d) => {
        val comp = graft.operators.Components
          .connectedComponents(jaccardPairs(s, d), "id_a", "id_b")
        val hist = comp.groupBy("cluster").agg(count(lit(1)).as("csize"))
          .groupBy("csize").agg(count(lit(1)).as("n_clusters"))
        val singles = comp.agg(count(lit(1)).as("np"))
          .crossJoin(broadcast(docs(s, d).agg(count(lit(1)).as("ndocs"))))
          .select(lit(1L).as("csize"),
            (col("ndocs") - col("np")).as("n_clusters"))
        hist.unionByName(singles)
          .groupBy("csize").agg(sum("n_clusters").as("n_clusters"))
          .select(col("csize"), col("n_clusters"),
            (col("csize") * col("n_clusters")).as("n_docs"))
          .orderBy("csize")
      },
      Some(s"""WITH RECURSIVE
          toks AS (SELECT doc_id, $OToks t FROM documents),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          jp AS (
            SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
                count(*) inter
              FROM inv a JOIN inv b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          edges AS (SELECT id_a s, id_b d FROM jp
            UNION ALL SELECT id_b, id_a FROM jp),
          reach AS (
            SELECT DISTINCT s AS id, s AS lbl FROM edges
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
          cl AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach
            GROUP BY 1),
          cs AS (SELECT cluster, count(*) csize FROM cl GROUP BY 1),
          h AS (SELECT csize, count(*) n_clusters FROM cs GROUP BY 1
            UNION ALL
            SELECT 1,
              (SELECT count(*) FROM documents) - (SELECT count(*) FROM cl))
        SELECT CAST(csize AS BIGINT) csize,
          CAST(sum(n_clusters) AS BIGINT) n_clusters,
          CAST(csize * sum(n_clusters) AS BIGINT) n_docs
        FROM h GROUP BY csize ORDER BY csize""")),

    // q298: the at-rest WINNOWING fingerprint index lifecycle (r18
    // stretch #7) — q144's MOSS fingerprints stored as a build/append/
    // probe artifact like q147's LSH postings: the standing corpus is
    // fingerprinted ONCE (build on doc_id%5 ∈ {1,2}, then an APPEND of
    // %5 ∈ {3,4} that signs only itself — the oracle replays the WHOLE
    // corpus inline, so a broken append hash-fails here, the q228
    // stance), and the probe batch (%5 = 0) broadcast-joins the at-rest
    // posting set map-side (the corpus side never shuffles; the only
    // exchange is the true-match-sized pair agg). minShared = 2 distinct
    // shared fingerprints ≈ MOSS's match threshold; winnowing's
    // guarantee makes a shared ≥ w+k−1-token passage always discoverable.
    // WinnowIndexSpec pins append visibility + the indexed ≡ inline law,
    // plus the maintenance leg: Dedup.compactWinnowIndex (r19 directive
    // #3, staged-swap, probe-identical, appends+compact ≡ one-shot
    // build) collapses the one-file-per-append accumulation; q312 drives
    // the appends from a real STREAMING query's foreachBatch.
    QueryDef("q298_winnow_indexed_overlap",
      (s, d) => {
        val path = winnowIndexCache.getOrElseUpdate((s, d), {
          val p = java.nio.file.Files
            .createTempDirectory("graft_winnow_q298").toString
          Dedup.buildWinnowIndex(docs(s, d).filter(col("doc_id") % 5 === 1 ||
              col("doc_id") % 5 === 2), "doc_id", "text", 3, 4, p)
          Dedup.appendToWinnowIndex(s, p, docs(s, d)
            .filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
            "doc_id", "text")
          p
        })
        Dedup.winnowIndexedMatches(s, path,
            docs(s, d).filter(col("doc_id") % 5 === 0), "doc_id", "text", 2)
          .orderBy("id_a", "id_b")
      },
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
            FROM g),
          fps AS (SELECT DISTINCT doc_id, sel // 1048576 AS fp
            FROM w WHERE pos >= 3 OR pos = mx)
        SELECT b.doc_id id_a, c.doc_id id_b,
          CAST(count(*) AS BIGINT) n_shared
        FROM fps b JOIN fps c ON b.fp = c.fp AND b.doc_id != c.doc_id
        WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 != 0
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY 1, 2""")),

    // q308: winnowing DENSITY audit per source — Schleimer et al. §4's
    // sizing guarantee measured on the real corpus: winnowing selects
    // ≈ 2/(w+1) of the k-gram stream (0.4 at w = 4), and that fraction
    // IS the q298 index's storage plan (postings = density × corpus
    // grams). The audit ships exact integers — selected fingerprints,
    // total positional k-grams, density in micro-units — per source, so
    // a capacity planner reads byte budgets off it and a density drift
    // (boilerplate-heavy source → more window ties → lower density)
    // surfaces as a per-source row, not a global average. One winnow
    // pass + one map-side gram count; grids are source-sized.
    QueryDef("q308_winnow_density",
      (s, d) => {
        val src = docs(s, d).select(col("doc_id").as("id"), col("source"))
        val ng = docs(s, d)
          .select(col("source"), TextFns.tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 3)
          .groupBy("source")
          .agg(sum((size(col("t")) - 2).cast("long")).as("n_grams"))
        Dedup.winnow(docs(s, d), "doc_id", "text", 3, 4)
          .join(src, "id")
          .groupBy("source").agg(count(lit(1)).as("n_fps"))
          .join(ng, "source")
          .select(col("source"), col("n_fps"), col("n_grams"),
            expr("n_fps * 1000000 div n_grams").as("density_micro"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, $OToks t FROM documents),
          g AS (SELECT doc_id, source, i - 1 AS pos,
              ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 8))::BIGINT
                * 1048576 + (i - 1) AS key
            FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) i) s
            WHERE len(t) >= 3),
          w AS (SELECT doc_id, source, pos,
              min(key) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) sel,
              max(pos) OVER (PARTITION BY doc_id) mx
            FROM g),
          fps AS (SELECT DISTINCT doc_id, source, sel
            FROM w WHERE pos >= 3 OR pos = mx),
          ng AS (SELECT source, count(*) n_grams FROM g GROUP BY 1),
          nf AS (SELECT source, count(*) n_fps FROM fps GROUP BY 1)
        SELECT ng.source, CAST(nf.n_fps AS BIGINT) n_fps,
          CAST(ng.n_grams AS BIGINT) n_grams,
          CAST(nf.n_fps * 1000000 // ng.n_grams AS BIGINT) density_micro
        FROM ng JOIN nf USING (source) ORDER BY 1""")),

    // q313: bounded longest-shared-span audit (r19 stretch #7) — for
    // each near-dup candidate pair from the session's exact-Jaccard
    // index (the q34/q151 shared pair memo), the maximum n ∈
    // {8,16,32,64} at which the pair shares an exact contiguous n-token
    // span (0 = shorter than 8). q111 scrubs fixed-16 spans corpus-wide;
    // this grades overlap SEVERITY per pair — Lee et al. ACL'22's
    // longest-duplicate question answered to binary precision by
    // ascending monotone probes that fingerprint only the docs of pairs
    // still alive (see Dedup.longestSharedSpanLevel). The oracle replays
    // every level's gram join verbatim on the candidate pairs. Spark
    // joins gram hash60s, the oracle gram strings — the documented
    // injective-on-the-corpus equivalence (q34's stance).
    QueryDef("q313_longest_shared_span",
      (s, d) => Dedup.longestSharedSpanLevel(docs(s, d), "doc_id", "text",
          jaccardPairs(s, d))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          cand AS (SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
                count(*) inter
              FROM inv a JOIN inv b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          g AS (${Seq(8, 16, 32, 64).map(n =>
            s"""SELECT DISTINCT doc_id, $n AS n,
              array_to_string(t[i:i+$n-1], ' ') gram
            FROM toks,
              LATERAL (SELECT unnest(generate_series(1, len(t) - $n + 1)) i) s
            WHERE len(t) >= $n""").mkString(" UNION ALL ")}),
          hits AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b, a.n
            FROM g a JOIN g b
              ON a.gram = b.gram AND a.n = b.n AND a.doc_id < b.doc_id)
        SELECT c.id_a, c.id_b,
          CAST(coalesce(max(h.n), 0) AS INTEGER) max_shared_n
        FROM cand c LEFT JOIN hits h
          ON c.id_a = h.id_a AND c.id_b = h.id_b
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // q314: the winnow index's COMPACTED lifecycle through the driver
    // gate (r19 directive #3 "proven ≡ rebuild", gated, not just
    // spec'd): build on %5 ∈ {1,2}, append %5 ∈ {3,4} (two files land
    // per append), then compactWinnowIndex's staged-swap rewrite, THEN
    // the probe — against the same exact whole-corpus oracle as q298.
    // A compaction that drops, duplicates, or corrupts one posting row
    // hash-fails here; q298 (uncompacted) and q312 (stream-built) pin
    // the other two corners of the lifecycle, so a divergence localizes
    // to the compactor. Own index dir — compaction swaps directories,
    // so it never runs under q298's lazily-listed files.
    QueryDef("q314_winnow_compacted_probe",
      (s, d) => {
        val path = compactedWinnowCache(s, d) {
          val p = java.nio.file.Files
            .createTempDirectory("graft_winnow_q314").toString
          Dedup.buildWinnowIndex(docs(s, d).filter(col("doc_id") % 5 === 1 ||
              col("doc_id") % 5 === 2), "doc_id", "text", 3, 4, p)
          Dedup.appendToWinnowIndex(s, p, docs(s, d)
            .filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
            "doc_id", "text")
          val (before, after) = Dedup.compactWinnowIndex(s, p)
          require(after <= before, s"compaction grew the index ($before -> $after)")
          p
        }
        Dedup.winnowIndexedMatches(s, path,
            docs(s, d).filter(col("doc_id") % 5 === 0), "doc_id", "text", 2)
          .orderBy("id_a", "id_b")
      },
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
            FROM g),
          fps AS (SELECT DISTINCT doc_id, sel // 1048576 AS fp
            FROM w WHERE pos >= 3 OR pos = mx)
        SELECT b.doc_id id_a, c.doc_id id_b,
          CAST(count(*) AS BIGINT) n_shared
        FROM fps b JOIN fps c ON b.fp = c.fp AND b.doc_id != c.doc_id
        WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 != 0
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY 1, 2""")),

    // q315: the LSH index's COMPACTED lifecycle through the driver gate —
    // q314's twin for the band-postings layout (the compactor's hard
    // case: the partition column has only `bands` values, so the rewrite
    // range-partitions on (band, key)): build on %5 ∈ {1,2}, append
    // %5 ∈ {3,4}, compactLshIndex (buckets AND sets tables), probe the
    // %5 = 0 batch at 0.6 — against q147's exact cross-slice Jaccard
    // oracle (the same banding-recall ≈ 1 shared-oracle argument).
    QueryDef("q315_lsh_compacted_probe",
      (s, d) => {
        val path = compactedLshCache(s, d) {
          val p = java.nio.file.Files
            .createTempDirectory("graft_lsh_q315").toString
          Dedup.buildLshIndex(docs(s, d).filter(col("doc_id") % 5 === 1 ||
              col("doc_id") % 5 === 2), "doc_id", "text", 3, p)
          Dedup.appendToLshIndex(s, p, docs(s, d)
            .filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
            "doc_id", "text")
          val (before, after) = Dedup.compactLshIndex(s, p)
          require(after <= before, s"compaction grew the index ($before -> $after)")
          p
        }
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

    // q316: EXACT longest shared token run per candidate pair — the
    // precise value q313 brackets (the span family complete: q111 fixed-
    // 16 scrub corpus-wide, q313 binary bracket at index scale, q316
    // exact length at eval-slice precision). Diagonal run-length
    // formulation of longest common substring: token-equality join of
    // the two docs' (pos, token) streams, runs found where pos_a −
    // row_number is constant along a diagonal pos_a − pos_b — see
    // Dedup.exactLongestSharedSpan (and its eval-slice cost contract:
    // the join is Σ occ_a·occ_b per pair, so corpus scale triages with
    // q313 first). The oracle replays the same diagonal grouping; the
    // bracket law (q313 = max{n ∈ levels : n ≤ q316}) is spec-pinned on
    // the real corpus.
    QueryDef("q316_exact_longest_span",
      (s, d) => Dedup.exactLongestSharedSpan(docs(s, d), "doc_id", "text",
          jaccardPairs(s, d))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH toks AS (SELECT doc_id, $OToks t FROM documents),
          tp AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok FROM toks,
            LATERAL (SELECT unnest(generate_series(1, len(t))) i) s),
          sets AS (SELECT doc_id, $OShingles sh FROM toks WHERE len(t) >= 3),
          inv AS (SELECT doc_id, len(sh) n, unnest(sh) shingle FROM sets),
          cand AS (SELECT id_a, id_b FROM (
              SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb,
                count(*) inter
              FROM inv a JOIN inv b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4) p
            WHERE round(inter / (na + nb - inter), 4) >= 0.6),
          m AS (SELECT c.id_a, c.id_b, a.pos - b.pos AS d, a.pos AS pa
            FROM cand c
            JOIN tp a ON a.doc_id = c.id_a
            JOIN tp b ON b.doc_id = c.id_b AND a.tok = b.tok),
          r AS (SELECT id_a, id_b, d,
              pa - row_number() OVER (PARTITION BY id_a, id_b, d
                ORDER BY pa) AS grp
            FROM m),
          l AS (SELECT id_a, id_b, d, grp, count(*) len FROM r
            GROUP BY 1, 2, 3, 4)
        SELECT c.id_a, c.id_b,
          CAST(coalesce(max(l.len), 0) AS BIGINT) longest_shared_span
        FROM cand c LEFT JOIN l ON c.id_a = l.id_a AND c.id_b = l.id_b
        GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
