package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Mixture, Packing, Sampling, Similarity}
import graft.functions.{SketchExpressions, TextFns}

import graft.queries.TextShared.{docs, OToks}

/** Text-analysis and scoring family over `documents`: quality stats,
  * token accounting, language-ID, repetition and fluency signals,
  * TF-IDF / BM25 / PMI term statistics, vocabulary + OOV accounting,
  * classifier and importance-weight scoring, fingerprinting, cleaning +
  * PII redaction, sketches (heavy hitters, count-min), the composed prep
  * pipeline and the dataset profile card. Split from TextOps along the
  * family seam — pure move, no behavior change; shared portability rules
  * in [[TextShared]].
  */
object TextScoreOps {

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

  private[graft] val defs: Seq[QueryDef] = Seq(

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
        val st = ta.agg(count(lit(1)), sum(size(col("t")))).head()
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
        // r21: the weight is a pure function of the 4096-value bucket, so
        // its md5 is a broadcast lookup computed once per bucket instead
        // of once per exploded feature (one of the two per-feature md5s
        // gone). LEFT join: row-for-row identical to the inline
        // expression — n_feats counts every feature row, and a
        // hypothetical null bucket yields null w exactly as the inline
        // weight did (sum skips it) — while avoiding the inner join's
        // pushed isnotnull(bucket) filter, which would re-evaluate the
        // bucket md5 per feature a second time.
        val weights = s.range(4096).select(col("id").as("bucket"),
          (TextFns.hash32(concat(lit("w:"), col("id").cast("string"))) %
            lit(2001L) - lit(1000L)).as("w"))
        docs(s, d)
          .select(col("doc_id"), explode(concat(t, bigrams)).as("feat"))
          .select(col("doc_id"), bucket.as("bucket"))
          .join(broadcast(weights), Seq("bucket"), "left")
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
    // q172: filter-agreement report — Cohen's kappa between the two
    // quality filters the pipeline already runs (q129's hashed-feature
    // linear classifier sign vs q31's heuristic score at a 0.62 cut):
    // the eval-harness question "do my filters agree beyond chance, and
    // where do they disagree" as one confusion-matrix row. Everything is
    // INTEGER: the q31 threshold is cleared of its division
    // (quality ≥ 0.62 ⇔ score_num ≥ 6200·nt over the common denominator),
    // and kappa = (n·agree − Σ marginal products)/(n² − Σ marginal
    // products) ships as numerator/denominator — no float, and no
    // integer-division convention gap (Spark div truncates toward zero,
    // DuckDB // floors; a negative kappa would disagree) — the consumer
    // divides. One corpus scan per label, one 1-row aggregate.
    // Overflow bound, explicit (same bound class as q174): kappa_den ≈ n²
    // needs n < 3.0×10⁹ documents in a long — beyond that Spark's BIGINT
    // wraps silently while DuckDB promotes to HUGEINT and the oracle's
    // BIGINT cast errors; upgrade the num/den pair to DECIMAL(38,0) on
    // BOTH sides (both engines carry it exactly) past that corpus size.
    QueryDef("q172_classifier_agreement",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val bigrams = when(size(t) >= 2,
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))
        val bucket = pmod(TextFns.hash32(col("feat")), lit(4096L))
        val weight = TextFns.hash32(concat(lit("w:"), bucket.cast("string"))) %
          lit(2001L) - lit(1000L)
        val labA = docs(s, d)
          .select(col("doc_id"), explode(concat(t, bigrams)).as("feat"))
          .select(col("doc_id"), weight.as("w"))
          .groupBy("doc_id").agg((sum("w") > 0).as("a"))
        val nt = size(t).cast("long")
        val nd = size(array_distinct(t)).cast("long")
        val stops = size(filter(t, x => x.isin("the", "a"))).cast("long")
        val labB = docs(s, d).select(col("doc_id"),
          ((lit(4000L) * nd + lit(3000L) * (nt - stops)
            + lit(30L) * least(nt, lit(100L)) * nt) >= lit(6200L) * nt)
            .as("b"))
        val cm = labB.join(labA, Seq("doc_id"), "left")
          .select(coalesce(col("a"), lit(false)).as("a"), col("b"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
            sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
            sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
            sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
        cm.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          (col("n") * (col("n11") + col("n00")) -
            ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
             (col("n01") + col("n00")) * (col("n10") + col("n00"))))
            .as("kappa_num"),
          (col("n") * col("n") -
            ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
             (col("n01") + col("n00")) * (col("n10") + col("n00"))))
            .as("kappa_den"))
      },
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
          f AS (SELECT doc_id, unnest(t ||
                  [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) feat
                FROM x),
          wsum AS (SELECT doc_id, sum(
                  ('0x' || substr(md5('w:' || CAST(
                    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096
                  AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS score
                FROM f GROUP BY doc_id),
          lab AS (SELECT x.doc_id,
                  coalesce(w.score > 0, false) AS a,
                  (4000 * len(list_distinct(t))
                   + 3000 * (len(t) - len(list_filter(t, q -> q IN ('the','a'))))
                   + 30 * least(len(t), 100) * len(t)) >= 6200 * len(t) AS b
                FROM x LEFT JOIN wsum w ON x.doc_id = w.doc_id),
          cm AS (SELECT count(*) AS n,
                  sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
                  sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
                  sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
                  sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
                FROM lab)
        SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
          CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
          CAST(n00 AS BIGINT) AS n00,
          CAST(n * (n11 + n00) -
            ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
            AS BIGINT) AS kappa_num,
          CAST(n * n -
            ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
            AS BIGINT) AS kappa_den
        FROM cm""")),

    // q174: per-source vocabulary concentration — the Simpson index
    // Σ p_t² of each source's token distribution, the "is this source a
    // template/spam mill" signal (boilerplate repeats a few tokens →
    // concentration near 1; diverse prose → near 1/|vocab|). Shipped as
    // the integer pair (Σ c_t², (Σ c_t)²) — one rational, no float sum
    // order, no division-convention gap; consumers compute 1 − num/den
    // for Simpson DIVERSITY. Overflow bound, explicit: den = nt² needs
    // nt < 3.0×10⁹ tokens per source in a long — beyond that, upgrade
    // the pair to DECIMAL(38,0) (both engines carry it exactly) or
    // compute per-shard pairs and combine. Shape: one explode + one
    // (source, token) count shuffle + one source-level sum — the count
    // table is Heap's-law vocabulary-sized per source, never corpus-row
    // sized.
    QueryDef("q174_token_concentration",
      (s, d) => {
        val counts = docs(s, d)
          .select(col("source"), explode(TextFns.tokens(col("text"))).as("t"))
          .groupBy("source", "t").agg(count(lit(1)).as("c"))
        counts.groupBy("source")
          .agg(sum("c").as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            sum(col("c") * col("c")).as("simpson_num"))
          .select(col("source"), col("n_tokens"), col("n_distinct"),
            col("simpson_num"),
            (col("n_tokens") * col("n_tokens")).as("simpson_den"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (SELECT source, unnest($OToks) AS t FROM documents),
          c AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2)
        SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
          CAST(count(*) AS BIGINT) AS n_distinct,
          CAST(sum(c * c) AS BIGINT) AS simpson_num,
          CAST(sum(c) * sum(c) AS BIGINT) AS simpson_den
        FROM c GROUP BY source ORDER BY source""")),

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

    // q281: deflate-free repetition proxy — the SQL-portable sibling of
    // q137's zlib ratio (which is deterministic per zlib build but can
    // never hash-match an oracle): over a FIXED 512-char window, the
    // char-trigram repetition mass rep_micro = ⌊1e6·(total − distinct)/
    // total⌋ — templated/looping text re-uses trigrams (distinct ≪
    // total, mass → 1e6) exactly where deflate's LZ77 window finds back-
    // references, so the two scores co-move (TextScoreSpec pins the
    // correlation on real docs AND constructed loop/random cases) while
    // this one is pure integer arithmetic both engines. The fixed window
    // is the scale lever: cost is O(512) per document regardless of
    // document length — no explode, no shuffle, one map-side pass
    // (size/array_distinct on a 510-element array), the q31 stance; the
    // only exchange is the presentation orderBy. Empty/short windows
    // (< 3 chars) ship n_tri = 0 with NULL mass — the q137 empty-text
    // stance, not maximal repetition.
    QueryDef("q281_trigram_repetition",
      (s, d) => docs(s, d)
        .withColumn("win", substring(col("text"), 1, 512))
        .withColumn("tris", when(length(col("win")) >= 3,
            expr("transform(sequence(1, length(win) - 2)," +
              " i -> substring(win, i, 3))"))
          .otherwise(array()))
        .select(col("doc_id"),
          size(col("tris")).cast("long").as("n_tri"),
          size(array_distinct(col("tris"))).cast("long").as("n_uniq"))
        .withColumn("rep_micro", when(col("n_tri") > 0L,
          expr("((n_tri - n_uniq) * 1000000) div n_tri")))
        .orderBy("doc_id"),
      Some("""WITH x AS (SELECT doc_id, substr(text, 1, 512) w
            FROM documents),
          t AS (SELECT doc_id, CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w) - 2),
                i -> substr(w, i, 3))
              ELSE [] END tris
            FROM x)
        SELECT doc_id, CAST(len(tris) AS BIGINT) n_tri,
          CAST(len(list_distinct(tris)) AS BIGINT) n_uniq,
          CASE WHEN len(tris) > 0
            THEN ((len(tris) - len(list_distinct(tris))) * 1000000)
              // len(tris) END rep_micro
        FROM t ORDER BY doc_id""")),

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
        ORDER BY metric""")),

    // q224: trigram stupid-backoff LM fluency — q131's next rung: real
    // perplexity filtering (Wenzek et al., LREC 2020) uses higher-order
    // models with back-off; "stupid backoff" (Brants et al., EMNLP 2007)
    // is the web-scale variant that skips discount normalization:
    // S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂) if seen, else α·c(w₂w₃)/c(w₂),
    // else α²·c(w₃)/N — restated integer-portable with the q131
    // floor(1e6·ratio) stance and α = 0.4 as the exact factor pair
    // (1e6, 4e5, 1.6e5). Train/score split is the q198 half convention
    // (train = "then", score = "now"), so back-off genuinely fires:
    // now-half trigrams unseen in the then half fall to the bigram leg,
    // then the unigram leg, then 0 (the all-orders-OOV case). Shape:
    // ONE token-instance explode carries each position's two left
    // neighbors; the TRAIN side collapses it once into a staged
    // (p2, p1, w) context-count table from which uni/bi/tri/N all
    // derive as marginals (the q181/q212 staged-cells pattern — the
    // corpus pays one explode for training, one for scoring), the rate
    // tables are Heap's-law bounded (trigram/bigram/unigram types), so
    // the three scoring joins are vocabulary-keyed — broadcastable when
    // they fit, hash-shuffle on the n-gram key at corpus scale; the
    // per-doc rollup is one combinable hash agg.
    QueryDef("q224_lm_backoff",
      (s, d) => {
        val nd = docs(s, d).agg(count(lit(1)).as("nd"))
        val x = docs(s, d).crossJoin(broadcast(nd))
          .select(col("doc_id"), (col("doc_id") * 2 < col("nd")).as("fh"),
            TextFns.tokens(col("text")).as("t"))
        // every token position with its (up to two) left neighbors:
        // one explode shape feeds unigram/bigram/trigram counts and the
        // scoring instances alike
        val inst = x.select(col("doc_id"), col("fh"),
          // size >= 1 guard: sequence(1, 0) runs BACKWARDS on an empty
          // token array (the TextFns.shingles gotcha) and element_at
          // rejects index 0
          explode(when(size(col("t")) >= 1,
            transform(sequence(lit(1), size(col("t"))),
              i => struct(
                element_at(col("t"), i).as("w"),
                when(i >= 2, element_at(col("t"), i - 1)).as("p1"),
                when(i >= 3, element_at(col("t"), i - 2)).as("p2"))))
            .otherwise(array().cast(
              "array<struct<w:string,p1:string,p2:string>>")))
            .as("g"))
          .select(col("doc_id"), col("fh"), col("g.w").as("w"),
            col("g.p1").as("p1"), col("g.p2").as("p2"))
        // ONE train pass: the (p2, p1, w) context-count table holds every
        // lower-order count as a marginal (rows with p2 NULL are the
        // bigram-only positions, p1 NULL the document starts), so
        // uni/bi/tri/N all derive from this staged Heap's-law-bounded
        // frame — the q181/q212 marginals-from-staged-cells pattern;
        // without the cut each rate table re-ran the corpus explode
        val tcc = graft.operators.Checkpoints.cut(
          inst.filter(col("fh"))
            .groupBy(col("p2"), col("p1"), col("w"))
            .agg(count(lit(1)).as("cnt")))
        val uni = tcc.groupBy("w").agg(sum("cnt").as("cu"))
        val ntok = tcc.agg(sum("cnt").as("n"))
        val bi = tcc.filter(col("p1").isNotNull)
          .groupBy(col("p1").as("l"), col("w").as("r"))
          .agg(sum("cnt").as("cb"))
        val tri = tcc.filter(col("p2").isNotNull)
          .select(col("p2").as("a"), col("p1").as("b"), col("w").as("c"),
            col("cnt").as("ct"))
        val rate3 = tri.join(bi,
            tri("a") === bi("l") && tri("b") === bi("r"))
          .select(col("a"), col("b"), col("c"),
            floor(lit(1e6) * (col("ct") / col("cb"))).as("s3"))
        val rate2 = bi.join(uni, bi("l") === uni("w"))
          .select(col("l"), col("r"),
            floor(lit(4e5) * (col("cb") / col("cu"))).as("s2"))
        val rate1 = uni.crossJoin(broadcast(ntok))
          .select(col("w").as("u"),
            floor(lit(1.6e5) * (col("cu") / col("n"))).as("s1"))
        val scored = inst.filter(!col("fh") && col("p2").isNotNull)
          .join(rate3, col("p2") === col("a") && col("p1") === col("b") &&
            col("w") === col("c"), "left")
          .join(rate2, col("p1") === col("l") && col("w") === col("r"),
            "left")
          .join(rate1, col("w") === col("u"), "left")
          .select(col("doc_id"),
            coalesce(col("s3"), col("s2"), col("s1"), lit(0L)).as("sco"),
            when(col("s3").isNotNull, 3).when(col("s2").isNotNull, 2)
              .when(col("s1").isNotNull, 1).otherwise(0).as("depth"))
        val per = scored.groupBy("doc_id")
          .agg(count(lit(1)).as("np"),
            sum(when(col("depth") === 3, 1L).otherwise(0L)).as("n3"),
            sum(when(col("depth") === 2, 1L).otherwise(0L)).as("n2"),
            sum(when(col("depth") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("depth") === 0, 1L).otherwise(0L)).as("n0"),
            sum("sco").as("ss"))
        graft.operators.Checkpoints.sealAndRelease(
          x.filter(!col("fh")).select("doc_id")
            .join(per, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("np"), lit(0L)).cast("int").as("n_pos"),
              coalesce(col("n3"), lit(0L)).cast("int").as("n_tri"),
              coalesce(col("n2"), lit(0L)).cast("int").as("n_bi"),
              coalesce(col("n1"), lit(0L)).cast("int").as("n_uni"),
              coalesce(col("n0"), lit(0L)).cast("int").as("n_oov"),
              coalesce(col("ss"), lit(0L)).as("score_sum"),
              when(col("np").isNull, lit(0L))
                .otherwise(floor(col("ss") / col("np"))).as("fluency_micro"))
            .orderBy("doc_id"),
          tcc)
      },
      Some(s"""WITH n AS (SELECT count(*) nd FROM documents),
          x AS (SELECT doc_id, (doc_id * 2 < n.nd) fh, $OToks t
            FROM documents CROSS JOIN n),
          i0 AS (SELECT doc_id, fh,
              unnest([struct_pack(w := t[i],
                  p1 := CASE WHEN i >= 2 THEN t[i-1] END,
                  p2 := CASE WHEN i >= 3 THEN t[i-2] END)
                for i in generate_series(1, len(t))]) g
            FROM x),
          inst AS (SELECT doc_id, fh, g.w w, g.p1 p1, g.p2 p2 FROM i0),
          uni AS (SELECT w, count(*) cu FROM inst WHERE fh GROUP BY 1),
          nt AS (SELECT count(*) n FROM inst WHERE fh),
          bi AS (SELECT p1 l, w r, count(*) cb FROM inst
            WHERE fh AND p1 IS NOT NULL GROUP BY 1, 2),
          tri AS (SELECT p2 a, p1 b, w c, count(*) ct FROM inst
            WHERE fh AND p2 IS NOT NULL GROUP BY 1, 2, 3),
          rate3 AS (SELECT a, b, c,
              CAST(floor(1000000.0 * (ct::DOUBLE / cb::DOUBLE)) AS BIGINT) s3
            FROM tri JOIN bi ON tri.a = bi.l AND tri.b = bi.r),
          rate2 AS (SELECT l, r,
              CAST(floor(400000.0 * (cb::DOUBLE / cu::DOUBLE)) AS BIGINT) s2
            FROM bi JOIN uni ON bi.l = uni.w),
          rate1 AS (SELECT w u,
              CAST(floor(160000.0 * (cu::DOUBLE / n::DOUBLE)) AS BIGINT) s1
            FROM uni CROSS JOIN nt),
          sc AS (SELECT i.doc_id, coalesce(r3.s3, r2.s2, r1.s1, 0) sco,
              CASE WHEN r3.s3 IS NOT NULL THEN 3
                WHEN r2.s2 IS NOT NULL THEN 2
                WHEN r1.s1 IS NOT NULL THEN 1 ELSE 0 END depth
            FROM inst i
            LEFT JOIN rate3 r3 ON i.p2 = r3.a AND i.p1 = r3.b AND i.w = r3.c
            LEFT JOIN rate2 r2 ON i.p1 = r2.l AND i.w = r2.r
            LEFT JOIN rate1 r1 ON i.w = r1.u
            WHERE NOT i.fh AND i.p2 IS NOT NULL),
          per AS (SELECT doc_id, count(*) np,
              sum(CASE WHEN depth = 3 THEN 1 ELSE 0 END) n3,
              sum(CASE WHEN depth = 2 THEN 1 ELSE 0 END) n2,
              sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) n1,
              sum(CASE WHEN depth = 0 THEN 1 ELSE 0 END) n0,
              sum(sco) ss
            FROM sc GROUP BY 1)
        SELECT x.doc_id,
          CAST(coalesce(np, 0) AS INTEGER) n_pos,
          CAST(coalesce(n3, 0) AS INTEGER) n_tri,
          CAST(coalesce(n2, 0) AS INTEGER) n_bi,
          CAST(coalesce(n1, 0) AS INTEGER) n_uni,
          CAST(coalesce(n0, 0) AS INTEGER) n_oov,
          CAST(coalesce(ss, 0) AS BIGINT) score_sum,
          CAST(CASE WHEN np IS NULL THEN 0
            ELSE floor(ss::DOUBLE / np::DOUBLE) END AS BIGINT) fluency_micro
        FROM x LEFT JOIN per ON x.doc_id = per.doc_id
        WHERE NOT x.fh ORDER BY x.doc_id""")),

    // q232: the prep-pipeline SURVIVAL FUNNEL — per-stage drop accounting
    // for the q90 cascade (exact-dedup → lang → min-length → repetition
    // gate), the observability read a composed pipeline owes its
    // operator ("which gate ate my corpus?" — q90 reports only the final
    // split census; a miswired gate that drops 40% is invisible there).
    // One corpus scan: per-doc flags are cumulative conjunctions
    // computed in a single projection over the fingerprint window, then
    // ONE aggregate folds stage counts + surviving-token sums, and the
    // 4-row funnel reshapes from that single row (stack — grid-sized).
    // Stages: 1 exact-dup survivor (q30's rn=1 per md5(lower(text))),
    // 2 lang='en', 3 ≥32 tokens, 4 distinct-token ratio ≥ 30% (the q96
    // repetition cut, integer form ndt·10 ≥ nt·3). tokens_out tracks
    // the BUDGET view (surviving tokens per stage) beside the doc view.
    QueryDef("q232_prep_funnel",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("doc_id")
        val flagged = docs(s, d)
          .select(col("doc_id"), col("lang"),
            md5(lower(col("text"))).as("fp"),
            size(t).cast("long").as("nt"),
            size(array_distinct(t)).cast("long").as("ndt"))
          .withColumn("s1", row_number().over(w) === 1)
          .withColumn("s2", col("s1") && col("lang") === "en")
          .withColumn("s3", col("s2") && col("nt") >= 32L)
          .withColumn("s4", col("s3") && col("ndt") * 10L >= col("nt") * 3L)
        def n(c: String) = sum(when(col(c), 1L).otherwise(0L))
        def tok(c: String) = sum(when(col(c), col("nt")).otherwise(0L))
        flagged.agg(count(lit(1)).as("n0"),
            n("s1").as("n1"), n("s2").as("n2"),
            n("s3").as("n3"), n("s4").as("n4"),
            tok("s1").as("tok1"), tok("s2").as("tok2"),
            tok("s3").as("tok3"), tok("s4").as("tok4"))
          .selectExpr("""stack(4,
              1, 'exact_dedup',       n0, n1, tok1,
              2, 'lang_en',           n1, n2, tok2,
              3, 'min_tokens_32',     n2, n3, tok3,
              4, 'distinct_ratio_30', n3, n4, tok4)
            as (stage, gate, n_in, n_out, tokens_out)""")
          .withColumn("dropped", col("n_in") - col("n_out"))
          .select("stage", "gate", "n_in", "n_out", "dropped", "tokens_out")
          .orderBy("stage")
      },
      Some(s"""WITH x AS (SELECT doc_id, lang, md5(lower(text)) fp,
            $OToks t FROM documents),
          f AS (SELECT doc_id, lang, CAST(len(t) AS BIGINT) nt,
              CAST(len(list_distinct(t)) AS BIGINT) ndt,
              row_number() OVER (PARTITION BY fp ORDER BY doc_id) rn
            FROM x),
          g AS (SELECT nt, (rn = 1) s1,
              (rn = 1 AND lang = 'en') s2,
              (rn = 1 AND lang = 'en' AND nt >= 32) s3,
              (rn = 1 AND lang = 'en' AND nt >= 32 AND ndt * 10 >= nt * 3) s4
            FROM f),
          a AS (SELECT CAST(count(*) AS BIGINT) n0,
              CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) n1,
              CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) n2,
              CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) n3,
              CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) n4,
              CAST(sum(CASE WHEN s1 THEN nt ELSE 0 END) AS BIGINT) tok1,
              CAST(sum(CASE WHEN s2 THEN nt ELSE 0 END) AS BIGINT) tok2,
              CAST(sum(CASE WHEN s3 THEN nt ELSE 0 END) AS BIGINT) tok3,
              CAST(sum(CASE WHEN s4 THEN nt ELSE 0 END) AS BIGINT) tok4
            FROM g)
        SELECT stage, gate, n_in, n_out, n_in - n_out AS dropped, tokens_out
        FROM (
          SELECT 1 stage, 'exact_dedup' gate, n0 n_in, n1 n_out,
            tok1 tokens_out FROM a
          UNION ALL SELECT 2, 'lang_en', n1, n2, tok2 FROM a
          UNION ALL SELECT 3, 'min_tokens_32', n2, n3, tok3 FROM a
          UNION ALL SELECT 4, 'distinct_ratio_30', n3, n4, tok4 FROM a)
        ORDER BY stage""")),

    // q270: language-ID confusion matrix — the EVALUATION of q33's
    // classifier against the labeled `lang` column (q33 ships
    // predictions; a classifier nobody scores is a liability): per
    // (actual, predicted) cell the exact doc count plus the diagonal
    // flag, the table per-language precision/recall read straight off.
    // One map-side score + one cells-sized count shuffle.
    QueryDef("q270_lang_confusion",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        def score(ws: Seq[String]) = size(filter(t, x => x.isin(ws: _*)))
        val sEn = score(Seq("the", "a", "fast", "slow"))
        val sEs = score(Seq("data", "query", "table"))
        val sDe = score(Seq("window", "group", "hash"))
        val sFr = score(Seq("join", "filter", "merge"))
        val sZh = score(Seq("spark", "scan", "batch"))
        docs(s, d).select(col("lang"),
            sEn.as("s_en"), sEs.as("s_es"), sDe.as("s_de"),
            sFr.as("s_fr"), sZh.as("s_zh"))
          .withColumn("predicted",
            when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de")
              && col("s_en") >= col("s_fr") && col("s_en") >= col("s_zh"),
              "en")
              .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr")
                && col("s_es") >= col("s_zh"), "es")
              .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"),
                "de")
              .when(col("s_fr") >= col("s_zh"), "fr")
              .otherwise("zh"))
          .groupBy(col("lang").as("actual"), col("predicted"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("correct", col("actual") === col("predicted"))
          .orderBy("actual", "predicted")
      },
      Some(s"""WITH x AS (SELECT lang, $OToks t FROM documents),
        sc AS (SELECT lang,
            len(list_filter(t, w -> w IN ('the', 'a', 'fast', 'slow'))) s_en,
            len(list_filter(t, w -> w IN ('data', 'query', 'table'))) s_es,
            len(list_filter(t, w -> w IN ('window', 'group', 'hash'))) s_de,
            len(list_filter(t, w -> w IN ('join', 'filter', 'merge'))) s_fr,
            len(list_filter(t, w -> w IN ('spark', 'scan', 'batch'))) s_zh
          FROM x),
        p AS (SELECT lang actual,
            CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr
                AND s_en >= s_zh THEN 'en'
              WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
              WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
              WHEN s_fr >= s_zh THEN 'fr'
              ELSE 'zh' END predicted
          FROM sc)
        SELECT actual, predicted, CAST(count(*) AS BIGINT) n_docs,
          actual = predicted AS correct
        FROM p GROUP BY 1, 2 ORDER BY actual, predicted""")),
  )
}
