package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.queries.TextShared.{docs, emb, OToks}

/** Corpus-statistics / drift / eval-metric query family — the measurement
  * layer a training-data pipeline runs BESIDE the filters: distribution
  * drift between sources (KS), ranking quality of a filter score (AUC),
  * calibration of the model-based classifier, power-law probes (Zipf,
  * Gini), vocabulary growth (Heap), independence decomposition (χ²),
  * and time-series smoothing (EWMA).
  *
  * Family-wide determinism stance (TextShared rules): every statistic
  * ships as INTEGER numerator/denominator pairs — the consumer divides —
  * so the oracle replays bit-for-bit with no float-sum order or
  * rounding-grid exposure; the one float op (q180's EWMA) is built
  * exclusively from exact IEEE ops (×2⁻ᵏ scalings + additions in fixed
  * written order). Sup/max statistics are computed on the VALUE GRID
  * (distinct values / bins), never via a corpus-sized global window —
  * the q168 lesson applied to stats: a `rank() OVER (ORDER BY score)`
  * over the corpus puts 100 TB in one task; the same statistic over the
  * per-value histogram is grid-sized.
  */
object StatOps {

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Tables.events(s, d)

  // q193's persisted drift state, built ONCE per (session, sf dir) under
  // /tmp — the q161/q163 at-rest-artifact lifecycle: an empty state is
  // seeded (Drift.writeCounts), the corpus lands in three doc_id-sliced
  // micro-batches through the staged-swap merge (Drift.mergeIntoCounts),
  // and the registered query is then a pure read of the published files.
  private val driftStateCache = new SessionMemo[String]

  // q226's persisted vector-sum states (one per corpus half), built ONCE
  // per (session, sf dir) — the q193 lifecycle transposed to the
  // semantic leg: each half's state is seeded empty (Drift.writeVecSums)
  // and fed by three vec_id-sliced micro-batches through the staged-swap
  // merge; the registered query is then a (labels × dims)-sized read.
  private val vecStateCache = new SessionMemo[(String, String)]

  // q185's pre-cut ranked-head builder, exposed (the peelRound/lpaRound
  // pattern) so PlanGuardSpec can assert the WindowGroupLimit shape
  // directly — the Checkpoints.cut in the registered query hides the
  // window's plan from the query's own lineage. The r <= 16 literal on
  // the RAW row_number attribute is load-bearing: it lets
  // InferWindowGroupLimit heap-prune each half's vocabulary BEFORE the
  // rank sort — the window partitions on a 2-value column, so without
  // the group limit each half's ENTIRE Heap's-law vocabulary sorts in
  // one task; with it, each task keeps a 16-element heap (a cast
  // wrapper on r would block the rule; r stays IntegerType and is
  // never output).
  private[graft] def headRanked(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val nd = docs(s, d).agg(count(lit(1)).as("nd"))
    val counts = docs(s, d).crossJoin(broadcast(nd))
      .select((col("doc_id") * 2 < col("nd")).as("fh"),
        explode(TextFns.tokens(col("text"))).as("t"))
      .groupBy("fh", "t").agg(count(lit(1)).as("f"))
    val w = Window.partitionBy("fh").orderBy(col("f").desc, col("t"))
    counts.withColumn("r", row_number().over(w))
      .filter(col("r") <= 16)
  }

  /** Shared single-pass frame for the hashed-feature classifier eval trio
    * (q182 / q248 / q285): per doc with ≥1 feature, the integer linear
    * score, the heuristic quality label, and (optionally) the source —
    * (doc_id, score, b[, source]).
    *
    * r21 shape, deliberate operator by operator (guide §2.3/§2.4, §7.2):
    *   - ONE corpus scan: the label is a row-local expression, so it is
    *     computed BEFORE the explode (its own Project below the Generate —
    *     per doc, not per feature) and travels through the explode as a
    *     plain column; the old second scan + doc_id join are gone.
    *   - The 4096-value bucket→weight md5 is a broadcast lookup computed
    *     once per bucket, not once per exploded feature. LEFT join, not
    *     inner: an inner join's null-guard pushes an isnotnull(bucket)
    *     filter below the join that re-evaluates the bucket md5 per
    *     feature (Filter + Project each compute it); with every bucket in
    *     [0, 4096) present on the build side the left join is row-for-row
    *     identical and keeps the md5 single-evaluated. (If a feature could
    *     hash to a null bucket, the left join's null w matches the old
    *     inline expression's null-skipping sum exactly.)
    *   - The per-doc aggregation groups by (doc_id[, source], b) — the
    *     extra keys are constant within a doc, so the groups are exactly
    *     the doc_ids. Carrying source/b as KEYS (not min() aggregates)
    *     keeps the aggregate a HashAggregate: a min(string) BUFFER is not
    *     fixed-width, which demotes the whole per-doc aggregation to
    *     SortAggregate and sorts the full exploded feature stream.
    * Zero-feature docs drop out of the explode exactly as they dropped out
    * of the old scores⋈labels inner join.
    */
  private def classifierScoreFrame(s: org.apache.spark.sql.SparkSession,
      d: String, withSource: Boolean): org.apache.spark.sql.DataFrame = {
    val t = TextFns.tokens(col("text"))
    val bigrams = when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val bucket = pmod(TextFns.hash32(col("feat")), lit(4096L))
    val weights = s.range(4096).select(col("id").as("bucket"),
      (TextFns.hash32(concat(lit("w:"), col("id").cast("string"))) %
        lit(2001L) - lit(1000L)).as("w"))
    val nt = size(t).cast("long")
    val nd = size(array_distinct(t)).cast("long")
    val stops = size(filter(t, x => x.isin("the", "a"))).cast("long")
    val ids = if (withSource) Seq(col("doc_id"), col("source"))
      else Seq(col("doc_id"))
    val pre = docs(s, d).select(ids ++ Seq(
      ((lit(4000L) * nd + lit(3000L) * (nt - stops)
        + lit(30L) * least(nt, lit(100L)) * nt) >= lit(6200L) * nt).as("b"),
      concat(t, bigrams).as("feats")): _*)
    pre.select(ids ++ Seq(col("b"), explode(col("feats")).as("feat")): _*)
      .select(ids ++ Seq(col("b"), bucket.as("bucket")): _*)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(ids ++ Seq(col("b")): _*)
      .agg(sum("w").as("score"))
  }

  val defs: Seq[QueryDef] = Seq(

    // q177: per-source two-sample Kolmogorov–Smirnov drift vs the whole
    // corpus on the document-length distribution — the "did source X
    // change under me" monitor. KS = sup_v |F_src(v) − F_all(v)|; both
    // ECDFs are step functions changing only at corpus-distinct lengths,
    // so the sup is exact on the distinct-value grid: ks_num =
    // max_v |cs·n_all − cg·n_src| over sources × distinct-values rows
    // (histogram-sized, NOT corpus-sized — the corpus contributes one
    // count shuffle), and KS = ks_num/(n_src·n_all) at the consumer.
    // Overflow: cs·n_all ≤ n_src·n_all needs n_src·n_all < 9.2×10¹⁸ —
    // per-source rows × corpus rows; past that, pre-bucket lengths or
    // ship DECIMAL(38,0). All-integer, exact. The statistic runs on the
    // ADDITIVE count table via Drift.ksFromCounts, so a streaming
    // monitor merges micro-batch counts (Drift.mergeCounts) and pays
    // grid-sized work per check — StreamingSpec pins streamed ≡ batch.
    QueryDef("q177_ks_drift",
      (s, d) => {
        val counts = docs(s, d)
          .groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c"))
        graft.operators.Drift.ksFromCounts(counts, "source", "v", "c")
          .withColumnRenamed("n_grp", "n_src")
          .orderBy("source")
      },
      Some("""WITH dc AS (SELECT source, n_chars v FROM documents),
          srcs AS (SELECT source, count(*) ns FROM dc GROUP BY 1),
          na AS (SELECT count(*) ng FROM dc),
          per AS (SELECT source, v, count(*) c FROM dc GROUP BY 1, 2),
          grid AS (SELECT srcs.source, vals.v FROM srcs
                   CROSS JOIN (SELECT DISTINCT v FROM dc) vals),
          scum AS (SELECT g.source, g.v,
              sum(coalesce(per.c, 0)) OVER (PARTITION BY g.source
                ORDER BY g.v ROWS UNBOUNDED PRECEDING) cs
            FROM grid g LEFT JOIN per
              ON per.source = g.source AND per.v = g.v),
          gcum AS (SELECT v, sum(count(*)) OVER (ORDER BY v
                ROWS UNBOUNDED PRECEDING) cg
            FROM dc GROUP BY v)
        SELECT s.source AS source,
          CAST(max(abs(s.cs * na.ng - gcum.cg * srcs.ns)) AS BIGINT) ks_num,
          CAST(max(srcs.ns) AS BIGINT) n_src, CAST(max(na.ng) AS BIGINT) n_all
        FROM scum s JOIN gcum USING (v)
          JOIN srcs ON s.source = srcs.source CROSS JOIN na
        GROUP BY s.source ORDER BY s.source""")),

    // q192: per-source total-variation drift vs the corpus — the L1
    // companion to q177's sup-metric KS on the SAME additive count
    // state: TV = ½ Σ_v |p_v − q_v| sees the whole mass displacement,
    // catching many-small-shifts drift a sup metric underweights (and a
    // language-mix rotation that leaves every single length threshold
    // nearly balanced). tv_num = Σ_v |c_s·n_all − c_v·n_src| integer,
    // TV = tv_num/(2·n_src·n_all) at the consumer. Cheaper than KS:
    // pointwise, so no cumulative window at all — one grid join + one
    // hash agg. Same n_src·n_all overflow bound as q177.
    QueryDef("q192_tv_drift",
      (s, d) => {
        val counts = docs(s, d)
          .groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c"))
        graft.operators.Drift.tvFromCounts(counts, "source", "v", "c")
          .withColumnRenamed("n_grp", "n_src")
          .orderBy("source")
      },
      Some("""WITH dc AS (SELECT source, n_chars v FROM documents),
          srcs AS (SELECT source, count(*) ns FROM dc GROUP BY 1),
          na AS (SELECT count(*) ng FROM dc),
          per AS (SELECT source, v, count(*) c FROM dc GROUP BY 1, 2),
          gv AS (SELECT v, count(*) cv FROM dc GROUP BY 1),
          grid AS (SELECT srcs.source, gv.v, gv.cv FROM srcs CROSS JOIN gv)
        SELECT g.source AS source,
          CAST(sum(abs(coalesce(per.c, 0) * na.ng - g.cv * srcs.ns))
            AS BIGINT) tv_num,
          CAST(max(srcs.ns) AS BIGINT) n_src, CAST(max(na.ng) AS BIGINT) n_all
        FROM grid g LEFT JOIN per ON per.source = g.source AND per.v = g.v
          JOIN srcs ON g.source = srcs.source CROSS JOIN na
        GROUP BY g.source ORDER BY g.source""")),

    // q178: AUC of the length signal predicting English — the
    // Mann–Whitney rank statistic computed HISTOGRAM-STYLE: AUC only
    // depends on per-distinct-score class counts, so 2U =
    // Σ_v np_v·(2·nn_below(v) + nn_v) (each positive beats all negatives
    // strictly below and half-credits ties) over the distinct-value grid;
    // the corpus contributes one count shuffle, the running nn_below
    // window is grid-sized. AUC = auc_num2/(2·n_pos·n_neg) at the
    // consumer. Integer-exact, no corpus-sized rank window (which is how
    // rank-sum AUC is usually written and what dies at 100 TB). Lives in
    // Eval.aucHistogram so any score column can be graded; the property
    // spec drives it on arbitrary generated frames.
    QueryDef("q178_auc",
      (s, d) => graft.operators.Eval.aucHistogram(
        docs(s, d).select((col("lang") === lit("en")).as("pos"),
          col("n_chars").as("v")),
        "pos", "v"),
      Some("""WITH h AS (SELECT n_chars v,
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) np,
            sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) nn
          FROM documents GROUP BY 1),
          c AS (SELECT v, np, nn, coalesce(sum(nn) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) nnb
            FROM h)
        SELECT CAST(sum(np * (2 * nnb + nn)) AS BIGINT) auc_num2,
          CAST(sum(np) AS BIGINT) n_pos, CAST(sum(nn) AS BIGINT) n_neg
        FROM c""")),

    // q179: Zipf power-law probe — per-source token frequency at
    // dyadic ranks 1,2,4,8,16 with the rank·frequency product: under
    // Zipf's law r·f_r is near-constant, so the product column IS the
    // fit diagnostic, log-free (ln() is library-dependent across
    // engines — the q112 stance — so the exponent regression is traded
    // for the dyadic probe, monotone-equivalent for the "is this source
    // power-law or template" read). Rank by (freq DESC, token ASC) is a
    // total order; the per-source window rides the vocabulary-sized
    // count table (Heap's-law bounded), never the corpus.
    QueryDef("q179_zipf_probe",
      (s, d) => {
        val counts = docs(s, d)
          .select(col("source"), explode(TextFns.tokens(col("text"))).as("t"))
          .groupBy("source", "t").agg(count(lit(1)).as("f"))
        val w = Window.partitionBy("source")
          .orderBy(col("f").desc, col("t"))
        // the redundant r <= 16 conjunct is load-bearing: an `In`
        // predicate alone doesn't trigger InferWindowGroupLimit, the
        // `<=` literal does — each source's vocabulary is then top-16
        // heap-pruned before the rank sort instead of fully sorted.
        // The filter rides the RAW row_number attribute (the rule
        // matches bare rank attributes; a cast wrapper blocks it) —
        // the BIGINT output contract is applied after, in the select
        counts.withColumn("r", row_number().over(w))
          .filter(col("r") <= 16 && col("r").isin(1, 2, 4, 8, 16))
          .select(col("source"), col("r").cast("long").as("rank"),
            col("t").as("token"), col("f").as("freq"),
            (col("r").cast("long") * col("f")).as("rank_freq"))
          .orderBy("source", "rank")
      },
      Some(s"""WITH tf AS (SELECT source, tok t, count(*) f FROM (
            SELECT source, unnest($OToks) tok FROM documents) GROUP BY 1, 2),
          rk AS (SELECT source, t, f, row_number() OVER (
              PARTITION BY source ORDER BY f DESC, t) r FROM tf)
        SELECT source, CAST(r AS BIGINT) rank, t token,
          CAST(f AS BIGINT) freq, CAST(r * f AS BIGINT) rank_freq
        FROM rk WHERE r IN (1, 2, 4, 8, 16) ORDER BY source, rank""")),

    // q180: per-user EWMA (α = ½) over each user's last-8-event value
    // window — the monitoring smoother, in the ONE float formulation
    // both engines replay bit-for-bit: each term is value·2⁻ᵏ (exact
    // IEEE scaling — 2⁻ᵏ is a power of two), terms are added in fixed
    // written order (same expression tree both sides), and missing lags
    // contribute an exact 0.0 — no frame-sum whose addition order an
    // engine may choose. The per-user lag window is the op's semantics;
    // user_id partitioning spreads it.
    QueryDef("q180_ewma",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        def tl(i: Int): org.apache.spark.sql.Column =
          coalesce(lag(col("value"), i).over(w), lit(0.0)) /
            lit(math.pow(2.0, i + 1))
        ev(s, d).select(col("user_id"), col("event_id"),
            (tl(0) + tl(1) + tl(2) + tl(3) + tl(4) + tl(5) + tl(6) + tl(7))
              .as("ewma"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
          coalesce(lag(value, 0) OVER w, 0) / 2
          + coalesce(lag(value, 1) OVER w, 0) / 4
          + coalesce(lag(value, 2) OVER w, 0) / 8
          + coalesce(lag(value, 3) OVER w, 0) / 16
          + coalesce(lag(value, 4) OVER w, 0) / 32
          + coalesce(lag(value, 5) OVER w, 0) / 64
          + coalesce(lag(value, 6) OVER w, 0) / 128
          + coalesce(lag(value, 7) OVER w, 0) / 256 AS ewma
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id""")),

    // q181: χ²-of-independence decomposition for source × lang — "does
    // language depend on source" shipped as the exact integer cell
    // table: per cell the observed count, marginals, and the deviation
    // numerator obs·n − row·col (χ² = Σ dev²/(row·col·n) at the
    // consumer). ZERO cells are materialized via the marginal-grid cross
    // join (sources × langs — card product of two small dimensions, not
    // data-sized) because absent combinations are evidence, not missing
    // data. Overflow: obs·n and row·col need n·n < 9.2×10¹⁸ per cell —
    // same n² bound class as q172/q174.
    QueryDef("q181_chi2_cells",
      (s, d) => {
        // CUT: marginals and the total all derive from the cell table —
        // stage it once (dimensions-sized) instead of four corpus
        // scans; the ksFromCounts staging policy, applied r16
        val cells = graft.operators.Checkpoints.cut(
          docs(s, d).groupBy("source", "lang").agg(count(lit(1)).as("c")))
        val rows = cells.groupBy("source").agg(sum("c").as("row_tot"))
        val cols = cells.groupBy("lang").agg(sum("c").as("col_tot"))
        val tot = cells.agg(sum("c").as("n_total"))
        graft.operators.Checkpoints.sealAndRelease(
          rows.crossJoin(cols).join(cells, Seq("source", "lang"), "left")
            .crossJoin(broadcast(tot))
            .select(col("source"), col("lang"),
              coalesce(col("c"), lit(0L)).as("obs"),
              col("row_tot"), col("col_tot"), col("n_total"),
              (coalesce(col("c"), lit(0L)) * col("n_total") -
                col("row_tot") * col("col_tot")).as("dev_num"))
            .orderBy("source", "lang"),
          cells)
      },
      Some("""WITH r AS (SELECT source, count(*) row_tot FROM documents GROUP BY 1),
          c AS (SELECT lang, count(*) col_tot FROM documents GROUP BY 1),
          t AS (SELECT count(*) n_total FROM documents),
          cell AS (SELECT source, lang, count(*) cc FROM documents GROUP BY 1, 2)
        SELECT r.source, c.lang, CAST(coalesce(cell.cc, 0) AS BIGINT) obs,
          CAST(r.row_tot AS BIGINT) row_tot, CAST(c.col_tot AS BIGINT) col_tot,
          CAST(t.n_total AS BIGINT) n_total,
          CAST(coalesce(cell.cc, 0) * t.n_total
            - r.row_tot * c.col_tot AS BIGINT) dev_num
        FROM r CROSS JOIN c CROSS JOIN t
        LEFT JOIN cell ON cell.source = r.source AND cell.lang = c.lang
        ORDER BY r.source, c.lang""")),

    // q182: calibration (reliability) table for the q129 hashed-feature
    // classifier against the q172 heuristic quality label — per
    // FIXED-WIDTH margin bin (width 2000 of the integer score; binning
    // by floor(score/2000.0) is one exact-at-boundaries IEEE divide both
    // engines share, where integer `div`-vs-`//` differ on negatives and
    // an ntile would be a corpus-sized global window): document count,
    // positive-label count, and the score sum — the "is the margin
    // monotone in realized quality" read, integer-exact.
    QueryDef("q182_calibration",
      (s, d) => {
        // r21: one corpus scan, label below the explode, broadcast weight
        // lookup, hash-aggregatable per-doc agg — see classifierScoreFrame
        classifierScoreFrame(s, d, withSource = false)
          .withColumn("bin",
            floor(col("score") / lit(2000.0)).cast("long"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("b"), 1L).otherwise(0L)).as("n_pos"),
            min("score").as("min_score"), max("score").as("max_score"),
            sum("score").as("sum_score"))
          .orderBy("bin")
      },
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
          f AS (SELECT doc_id, unnest(t ||
                  [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) feat
                FROM x),
          sc AS (SELECT doc_id, sum(
                  ('0x' || substr(md5('w:' || CAST(
                    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096
                  AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS score
                FROM f GROUP BY doc_id),
          lab AS (SELECT doc_id,
                  (4000 * len(list_distinct(t))
                   + 3000 * (len(t) - len(list_filter(t, q -> q IN ('the','a'))))
                   + 30 * least(len(t), 100) * len(t)) >= 6200 * len(t) AS b
                FROM x),
          j AS (SELECT CAST(floor(sc.score / 2000.0) AS BIGINT) bin,
                  sc.score, lab.b
                FROM sc JOIN lab USING (doc_id))
        SELECT bin, CAST(count(*) AS BIGINT) n_docs,
          CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) n_pos,
          CAST(min(score) AS BIGINT) min_score,
          CAST(max(score) AS BIGINT) max_score,
          CAST(sum(score) AS BIGINT) sum_score
        FROM j GROUP BY bin ORDER BY bin""")),

    // q183: vocabulary-growth (Heap's-law) curve — new distinct token
    // types per 50-document ingest batch with the running cumulative:
    // the "is this source still teaching the tokenizer anything" curve.
    // First-seen batch per type is one min-agg over the (token →
    // min doc_id) table (vocabulary-sized); the cumulative rides the
    // batch grid (corpus/50 rows). Batch ids are nonnegative, so
    // truncating `div` and flooring `//` agree.
    QueryDef("q183_vocab_growth",
      (s, d) => {
        val firsts = docs(s, d)
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
          .groupBy("t").agg(min("doc_id").as("fd"))
          .select(expr("fd div 50").as("batch"))
          .groupBy("batch").agg(count(lit(1)).as("new_types"))
        val vol = docs(s, d)
          .select(expr("doc_id div 50").as("batch"),
            size(TextFns.tokens(col("text"))).cast("long").as("ntok"))
          .groupBy("batch").agg(count(lit(1)).as("n_docs"),
            sum("ntok").as("n_tokens"))
        vol.join(firsts, Seq("batch"), "left")
          .select(col("batch"), col("n_docs"), col("n_tokens"),
            coalesce(col("new_types"), lit(0L)).as("new_types"))
          .withColumn("cum_types", sum("new_types").over(
            Window.orderBy("batch")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy("batch")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($OToks) t FROM documents),
          fs AS (SELECT min(doc_id) // 50 batch FROM tok GROUP BY t),
          nw AS (SELECT batch, count(*) new_types FROM fs GROUP BY 1),
          vol AS (SELECT doc_id // 50 batch, count(*) n_docs,
              sum(len($OToks)) n_tokens
            FROM documents GROUP BY 1)
        SELECT vol.batch, CAST(n_docs AS BIGINT) n_docs,
          CAST(n_tokens AS BIGINT) n_tokens,
          CAST(coalesce(new_types, 0) AS BIGINT) new_types,
          CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY vol.batch
            ROWS UNBOUNDED PRECEDING) AS BIGINT) cum_types
        FROM vol LEFT JOIN nw USING (batch) ORDER BY batch""")),

    // q184: per-source Gini concentration of the token distribution —
    // the Lorenz-curve sibling of q174's Simpson index (Simpson weighs
    // big types quadratically; Gini reads the whole inequality curve).
    // With counts sorted ascending (tie-break token), G = Σ(2r − n − 1)·c
    // over n·Σc — shipped as the integer (gini_num, gini_den) pair.
    // The rank window rides the per-source vocabulary table (Heap's-law
    // bounded); a skewed source's vocabulary is still vocabulary-sized.
    // Overflow: gini_den = n_types·n_tokens < 9.2×10¹⁸ — vocabulary ×
    // volume, far looser than the q174 n² bound. Lives in
    // Eval.giniPerGroup over any pre-counted (group, item, count) table.
    QueryDef("q184_gini",
      (s, d) => {
        val counts = docs(s, d)
          .select(col("source"), explode(TextFns.tokens(col("text"))).as("t"))
          .groupBy("source", "t").agg(count(lit(1)).as("c"))
        graft.operators.Eval.giniPerGroup(counts, "source", "t", "c")
          .orderBy("source")
      },
      Some(s"""WITH tf AS (SELECT source, tok t, count(*) c FROM (
            SELECT source, unnest($OToks) tok FROM documents) GROUP BY 1, 2),
          rk AS (SELECT source, t, c, row_number() OVER (
              PARTITION BY source ORDER BY c, t) r FROM tf),
          g AS (SELECT source, count(*) n_types, sum(c) n_tokens,
              sum((2 * r - 1) * c) rsum
            FROM rk GROUP BY source)
        SELECT source, CAST(n_types AS BIGINT) n_types,
          CAST(n_tokens AS BIGINT) n_tokens,
          CAST(rsum - n_types * n_tokens AS BIGINT) gini_num,
          CAST(n_types * n_tokens AS BIGINT) gini_den
        FROM g ORDER BY source""")),

    // q185: head-vocabulary overlap between the corpus's two halves —
    // the "did the head of the distribution rotate" drift probe RBO
    // approximates, restated integer-exact at dyadic depths: rank each
    // half's token frequencies (freq DESC, token ASC — total order),
    // and at depth d ∈ {1,2,4,8,16} report |top_d(A) ∩ top_d(B)| with
    // both head sizes (head < d when a half's vocabulary runs out);
    // Jaccard@d = overlap/(head_a + head_b − overlap) at the consumer.
    // The halves split on 2·doc_id < n_docs (id-range halves = "then vs
    // now" for append-ordered ids); rank windows ride per-half
    // vocabulary tables, the depth explode is ×5 on vocabulary rows.
    QueryDef("q185_head_overlap",
      (s, d) => {
        // CUT: three consumers (heads, both overlap sides) — without it
        // each re-runs the corpus tokenize + count shuffle; the cut
        // frame is ≤ 32 rows (2 halves × top-16). The heap-prune plan
        // shape lives in headRanked (PlanGuardSpec asserts it there —
        // the cut hides it from this query's own plan).
        val ranked = graft.operators.Checkpoints.cut(headRanked(s, d))
        val depths = array((Seq(1L, 2L, 4L, 8L, 16L)).map(lit): _*)
        val heads = ranked.select(col("fh"), explode(depths).as("d"),
            when(col("r") <= col("d"), 1L).otherwise(0L).as("in_head"))
          .groupBy("d")
          .agg(sum(when(col("fh"), col("in_head")).otherwise(0L))
              .as("head_a"),
            sum(when(!col("fh"), col("in_head")).otherwise(0L))
              .as("head_b"))
        val ra = ranked.filter(col("fh")).select(col("t"), col("r").as("ra"))
        val rb = ranked.filter(!col("fh")).select(col("t"), col("r").as("rb"))
        val ov = ra.join(rb, "t")
          .select(explode(depths).as("d"),
            col("ra"), col("rb"))
          .groupBy("d")
          .agg(sum(when(col("ra") <= col("d") && col("rb") <= col("d"), 1L)
            .otherwise(0L)).as("overlap"))
        graft.operators.Checkpoints.sealAndRelease(
          heads.join(ov, "d")
            .select(col("d"), col("overlap"), col("head_a"), col("head_b"))
            .orderBy("d"),
          ranked)
      },
      Some(s"""WITH n AS (SELECT count(*) nd FROM documents),
          tf AS (SELECT (doc_id * 2 < n.nd) fh, tok t, count(*) f FROM (
              SELECT doc_id, unnest($OToks) tok FROM documents) CROSS JOIN n
            GROUP BY 1, 2),
          rk AS (SELECT fh, t, row_number() OVER (
              PARTITION BY fh ORDER BY f DESC, t) r FROM tf),
          ds AS (SELECT unnest([1, 2, 4, 8, 16]) d),
          heads AS (SELECT ds.d,
              sum(CASE WHEN rk.fh AND rk.r <= ds.d THEN 1 ELSE 0 END) head_a,
              sum(CASE WHEN NOT rk.fh AND rk.r <= ds.d THEN 1 ELSE 0 END) head_b
            FROM ds CROSS JOIN rk GROUP BY 1),
          ov AS (SELECT ds.d, sum(CASE WHEN a.r <= ds.d AND b.r <= ds.d
                THEN 1 ELSE 0 END) overlap
            FROM ds CROSS JOIN (SELECT t, r FROM rk WHERE fh) a
            JOIN (SELECT t, r FROM rk WHERE NOT fh) b ON a.t = b.t
            GROUP BY 1)
        SELECT CAST(heads.d AS BIGINT) d, CAST(overlap AS BIGINT) overlap,
          CAST(head_a AS BIGINT) head_a, CAST(head_b AS BIGINT) head_b
        FROM heads JOIN ov ON heads.d = ov.d ORDER BY d""")),

    // q186: Mann–Kendall trend test per event type — the nonparametric
    // "is daily volume trending" monitor, integer-exact: S = Σ_{i<j}
    // sign(c_j − c_i) over day-ordered daily counts, and the
    // tie-corrected variance ships as var18 = 18·Var(S) =
    // n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (t = days sharing a count value);
    // Z = S/√(var18/18) at the consumer. The corpus collapses to the
    // (type, day) count grid in one agg; the pair "join" is a per-type
    // self-join of ~30 day rows — day-grid-sized, never event-sized.
    QueryDef("q186_trend",
      (s, d) => {
        // CUT: the daily grid feeds both pair-join sides AND the tie
        // table — without it each re-runs the corpus count shuffle (the
        // collapsed-frame staging line, r17 audit; day-grid-sized)
        val daily = graft.operators.Checkpoints.cut(ev(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("c")))
        val a = daily.select(col("event_type"), col("day").as("d1"),
          col("c").as("c1"))
        val b = daily.select(col("event_type"), col("day").as("d2"),
          col("c").as("c2"))
        val sStat = a.join(b, "event_type").filter(col("d1") < col("d2"))
          .groupBy("event_type")
          .agg(sum(when(col("c2") > col("c1"), 1L)
            .when(col("c2") < col("c1"), -1L).otherwise(0L)).as("s_stat"))
        val ties = daily.groupBy("event_type", "c")
          .agg(count(lit(1)).as("t"))
          .groupBy("event_type")
          .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
            .as("tie18"), sum("t").as("n_days"))
        graft.operators.Checkpoints.sealAndRelease(
          ties.join(sStat, "event_type")
            .select(col("event_type"), col("n_days"), col("s_stat"),
              (col("n_days") * (col("n_days") - 1L) *
                (lit(2L) * col("n_days") + 5L) - col("tie18")).as("var18"))
            .orderBy("event_type"),
          daily)
      },
      Some("""WITH daily AS (SELECT event_type, date_trunc('day', ts) dd,
            count(*) c FROM events GROUP BY 1, 2),
          s AS (SELECT a.event_type,
              sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
                ELSE 0 END) s_stat
            FROM daily a JOIN daily b ON a.event_type = b.event_type
              AND a.dd < b.dd
            GROUP BY 1),
          tie AS (SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) tie18,
              sum(t) n_days
            FROM (SELECT event_type, c, count(*) t FROM daily GROUP BY 1, 2)
            GROUP BY 1)
        SELECT tie.event_type, CAST(n_days AS BIGINT) n_days,
          CAST(s_stat AS BIGINT) s_stat,
          CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie18 AS BIGINT)
            var18
        FROM tie JOIN s ON tie.event_type = s.event_type
        ORDER BY tie.event_type""")),

    // q188: token burstiness (Fano factor / index of dispersion) for the
    // top-20 corpus tokens — the classic "bursty content word vs
    // uniformly-sprinkled function word" signal (Church–Gale): over
    // per-document counts INCLUDING zero-docs, Fano = var/mean ships as
    // the integer pair fano_num = n·Σx² − (Σx)², fano_den = (n−1)·Σx
    // (sample variance over mean; = 1 under Poisson, > 1 bursty). The
    // zero-docs contribute nothing to Σx/Σx², so the per-(token, doc)
    // count table — corpus-instance sized, the one real shuffle — is
    // enough and no token×doc grid is ever materialized; the top-20 cut
    // rides the vocabulary table. Overflow: n·Σx² needs n_docs·Σx² <
    // 9.2×10¹⁸ — document count × squared-count volume; shard-combine or
    // DECIMAL(38,0) past that.
    QueryDef("q188_burstiness",
      (s, d) => {
        val nd = docs(s, d).agg(count(lit(1)).as("n"))
        val perDoc = docs(s, d)
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
          .groupBy("t", "doc_id").agg(count(lit(1)).as("x"))
        val perTok = perDoc.groupBy("t")
          .agg(count(lit(1)).as("n_docs_present"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sxx"))
        // global top-20 is TakeOrdered (per-partition heaps + a 20-row
        // driver merge — the q154/q191 stance), never an unpartitioned
        // rank window that needs the optimizer's group-limit favor
        perTok.orderBy(col("sx").desc, col("t")).limit(20)
          .crossJoin(broadcast(nd))
          .select(col("t").as("token"), col("sx").as("freq"),
            col("n_docs_present"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("fano_num"),
            ((col("n") - 1L) * col("sx")).as("fano_den"))
          .orderBy(col("freq").desc, col("token"))
      },
      Some(s"""WITH n AS (SELECT count(*) nd FROM documents),
          pd AS (SELECT tok t, doc_id, count(*) x FROM (
              SELECT doc_id, unnest($OToks) tok FROM documents) GROUP BY 1, 2),
          pt AS (SELECT t, count(*) n_docs_present, sum(x) sx,
              sum(x * x) sxx FROM pd GROUP BY 1),
          rk AS (SELECT *, row_number() OVER (ORDER BY sx DESC, t) r FROM pt)
        SELECT t token, CAST(sx AS BIGINT) freq,
          CAST(n_docs_present AS BIGINT) n_docs_present,
          CAST(nd * sxx - sx * sx AS BIGINT) fano_num,
          CAST((nd - 1) * sx AS BIGINT) fano_den
        FROM rk CROSS JOIN n WHERE r <= 20
        ORDER BY freq DESC, token""")),

    // q193: the drift panel AS A RESTARTED MONITOR sees it — KS (q177)
    // and TV (q192) both computed from the PERSISTED count state after
    // three micro-batch merges through the at-rest table: writeCounts
    // seeds an empty state, each doc_id-sliced batch lands via
    // mergeIntoCounts' staged swap, readCounts resumes from the
    // published files + recorded column names. The count state is
    // ADDITIVE, so replaying the corpus in batches reproduces the
    // all-at-once counts exactly — the oracle therefore states the
    // panel directly from `documents`, and any defect in the
    // write/merge/swap/read path (lost batch, torn swap, NULL or
    // column-name drift) hash-fails here. One state table serves both
    // metrics; the check itself is grid-sized.
    QueryDef("q193_drift_panel_at_rest",
      (s, d) => {
        val path = driftStateCache(s, d) {
          val t = java.nio.file.Files
            .createTempDirectory("graft_q193").toString + "/state"
          import s.implicits._
          graft.operators.Drift.writeCounts(
            Seq.empty[(String, Long, Long)].toDF("source", "v", "c"),
            t, "source", "v", "c")
          (0L to 2L).foreach { i =>
            graft.operators.Drift.mergeIntoCounts(s, t,
              docs(s, d).filter(pmod(col("doc_id"), lit(3L)) === i)
                .select(col("source"), col("n_chars").as("v")))
          }
          t
        }
        val (state, g, v, c) = graft.operators.Drift.readCounts(s, path)
        val ks = graft.operators.Drift.ksFromCounts(state, g, v, c)
          .select(col("source"), col("ks_num"),
            col("n_grp").as("n_src"), col("n_all"))
        val tv = graft.operators.Drift.tvFromCounts(state, g, v, c)
          .select(col("source"), col("tv_num"))
        ks.join(tv, "source")
          .select(col("source"), col("ks_num"), col("tv_num"),
            col("n_src"), col("n_all"))
          .orderBy("source")
      },
      Some("""WITH dc AS (SELECT source, n_chars v FROM documents),
          srcs AS (SELECT source, count(*) ns FROM dc GROUP BY 1),
          na AS (SELECT count(*) ng FROM dc),
          per AS (SELECT source, v, count(*) c FROM dc GROUP BY 1, 2),
          grid AS (SELECT srcs.source, vals.v FROM srcs
                   CROSS JOIN (SELECT DISTINCT v FROM dc) vals),
          scum AS (SELECT g.source, g.v,
              sum(coalesce(per.c, 0)) OVER (PARTITION BY g.source
                ORDER BY g.v ROWS UNBOUNDED PRECEDING) cs
            FROM grid g LEFT JOIN per
              ON per.source = g.source AND per.v = g.v),
          gcum AS (SELECT v, sum(count(*)) OVER (ORDER BY v
                ROWS UNBOUNDED PRECEDING) cg
            FROM dc GROUP BY v),
          gv AS (SELECT v, count(*) cv FROM dc GROUP BY 1),
          ks AS (SELECT s.source,
              max(abs(s.cs * na.ng - gcum.cg * srcs.ns)) ks_num,
              max(srcs.ns) ns, max(na.ng) ng
            FROM scum s JOIN gcum USING (v)
              JOIN srcs ON s.source = srcs.source CROSS JOIN na
            GROUP BY s.source),
          tv AS (SELECT g.source,
              sum(abs(coalesce(per.c, 0) * na.ng - g.cv * srcs.ns)) tv_num
            FROM (SELECT srcs.source, gv.v, gv.cv FROM srcs CROSS JOIN gv) g
            LEFT JOIN per ON per.source = g.source AND per.v = g.v
            JOIN srcs ON g.source = srcs.source CROSS JOIN na
            GROUP BY g.source)
        SELECT ks.source AS source, CAST(ks_num AS BIGINT) ks_num,
          CAST(tv_num AS BIGINT) tv_num, CAST(ns AS BIGINT) n_src,
          CAST(ng AS BIGINT) n_all
        FROM ks JOIN tv ON ks.source = tv.source ORDER BY source""")),

    // q195: per-source Wasserstein-1 (earth-mover) drift vs the corpus
    // on document length — the magnitude-aware third leg of the drift
    // panel over the SAME additive count state as q177/q192: KS reads
    // the worst threshold, TV the total mass displaced, W1 the mass
    // times HOW FAR it moved (a length distribution sliding far right
    // and one sliding one step have equal TV; W1 separates them — the
    // "source started shipping 10× longer documents" alarm). Integral
    // values make it exact: w1_num = Σ_v |cs·n_all − cg·n_src|·gap(v),
    // W1 = w1_num/(n_src·n_all) at the consumer. Overflow bound
    // n_src·n_all·range(n_chars) < 9.2×10¹⁸ — tighter than q177's by
    // the value range; pre-bucket past it.
    QueryDef("q195_w1_drift",
      (s, d) => {
        val counts = docs(s, d)
          .groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c"))
        graft.operators.Drift.w1FromCounts(counts, "source", "v", "c")
          .withColumnRenamed("n_grp", "n_src")
          .orderBy("source")
      },
      Some("""WITH dc AS (SELECT source, n_chars v FROM documents),
          srcs AS (SELECT source, count(*) ns FROM dc GROUP BY 1),
          na AS (SELECT count(*) ng FROM dc),
          per AS (SELECT source, v, count(*) c FROM dc GROUP BY 1, 2),
          grid AS (SELECT srcs.source, vals.v FROM srcs
                   CROSS JOIN (SELECT DISTINCT v FROM dc) vals),
          scum AS (SELECT g.source, g.v,
              sum(coalesce(per.c, 0)) OVER (PARTITION BY g.source
                ORDER BY g.v ROWS UNBOUNDED PRECEDING) cs
            FROM grid g LEFT JOIN per
              ON per.source = g.source AND per.v = g.v),
          gcum AS (SELECT v, sum(sum(c)) OVER (ORDER BY v
                ROWS UNBOUNDED PRECEDING) cg,
              coalesce(lead(v, 1) OVER (ORDER BY v) - v, 0) gap
            FROM per GROUP BY v)
        SELECT s.source AS source,
          CAST(sum(abs(s.cs * na.ng - gcum.cg * srcs.ns) * gcum.gap)
            AS BIGINT) w1_num,
          CAST(max(srcs.ns) AS BIGINT) n_src, CAST(max(na.ng) AS BIGINT) n_all
        FROM scum s JOIN gcum USING (v)
          JOIN srcs ON s.source = srcs.source CROSS JOIN na
        GROUP BY s.source ORDER BY s.source""")),

    // q196: per-source decile-shift drift between the corpus's two
    // halves — W1 (q195) says HOW MUCH the distribution moved, this says
    // WHERE: for each source and d ∈ 1..9 the exact lower-decile value
    // in the "then" half (2·doc_id < n) and the "now" half, plus the
    // integer shift — a median shift reads as re-centering, a d=9-only
    // shift as a new long tail. Exact deciles via the grouped two-phase
    // rank (q175's machinery, once per half — no per-(half, source)
    // corpus window, skewed sources spread over all quantile buckets);
    // the halves join on (source, decile), a 9·|sources|-row frame.
    QueryDef("q196_decile_shift",
      (s, d) => {
        val nd = docs(s, d).agg(count(lit(1)).as("nd"))
        // ONE ranking pass with the composite (half, source) group —
        // two per-half exactQuantilesPerGroup calls would re-scan and
        // re-rank the corpus twice for the same answer; \u0001 as the
        // key separator, absent from source names
        val base = docs(s, d).crossJoin(broadcast(nd))
          .select(col("doc_id"),
            concat(when(col("doc_id") * 2 < col("nd"), lit("t"))
              .otherwise(lit("n")), lit("\u0001"), col("source")).as("hs"),
            col("n_chars"))
        val qs = graft.operators.Sampling.exactQuantilesPerGroup(
            base, "doc_id", "hs", "n_chars", q = 10)
          .select(split(col("grp"), "\u0001").as("p"), col("quantile"),
            col("value"))
          .select((element_at(col("p"), 1) === "t").as("fh"),
            element_at(col("p"), 2).as("source"), col("quantile"),
            col("value"))
        val thenQ = qs.filter(col("fh"))
          .select(col("source"), col("quantile"), col("value").as("v_then"))
        val nowQ = qs.filter(!col("fh"))
          .select(col("source"), col("quantile"), col("value").as("v_now"))
        thenQ.join(nowQ, Seq("source", "quantile"))
          .select(col("source"), col("quantile"), col("v_then"),
            col("v_now"), (col("v_now") - col("v_then")).as("shift"))
          .orderBy("source", "quantile")
      },
      Some("""WITH n AS (SELECT count(*) nd FROM documents),
          b AS (SELECT doc_id, source, n_chars,
              (doc_id * 2 < n.nd) fh FROM documents CROSS JOIN n),
          r AS (SELECT fh, source, n_chars v,
              row_number() OVER (PARTITION BY fh, source
                ORDER BY n_chars, doc_id) rn,
              count(*) OVER (PARTITION BY fh, source) gn
            FROM b),
          d AS (SELECT unnest(generate_series(1, 9)) dq),
          j AS (SELECT r.fh, r.source, d.dq, min(r.v) val
            FROM r JOIN d ON 10 * r.rn >= d.dq * r.gn
            GROUP BY 1, 2, 3)
        SELECT a.source AS source, CAST(a.dq AS INTEGER) quantile,
          CAST(a.val AS BIGINT) v_then, CAST(bb.val AS BIGINT) v_now,
          CAST(bb.val - a.val AS BIGINT) shift
        FROM j a JOIN j bb ON a.source = bb.source AND a.dq = bb.dq
          AND a.fh AND NOT bb.fh
        ORDER BY source, quantile""")),

    // q197: per-label embedding-centroid drift between the corpus's two
    // halves — the SEMANTIC drift leg the length-grid panel can't see
    // (a source can keep its length distribution while its content
    // rotates): cosine between each label's "then" and "now" centroids
    // (1 → stable, drifting → the training-mix re-weighting alarm).
    // Determinism: centroids are the q44 aggregator (map-side partial
    // elementwise sums — the shuffle carries one 64-dim buffer per
    // partition per group, never rows), each dimension ROUNDED to 6 dp
    // FIRST (the q44-proven stability grid), so both engines feed the
    // cosine bit-identical inputs and the final 6 dp round is safe.
    // Work: one aggregator shuffle + a |labels|-row join; 64-term dots
    // on driver-sized rows.
    QueryDef("q197_centroid_drift",
      (s, d) => {
        val cen = udaf(graft.functions.CentroidAggregator,
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
        val nv = graft.Tables.embeddings(s, d).agg(count(lit(1)).as("nv"))
        // CUT: the centroid table is |labels|×2 rows and feeds both
        // join sides — without it each side re-runs the corpus-sized
        // aggregator pass (the collapsed-frame staging line, r17 audit)
        val cents = graft.operators.Checkpoints.cut(
          graft.Tables.embeddings(s, d).crossJoin(broadcast(nv))
            .select(col("label"), (col("vec_id") * 2 < col("nv")).as("fh"),
              col("embedding"))
            .groupBy("label", "fh")
            .agg(cen(col("embedding")).as("c0"), count(lit(1)).as("n"))
            .select(col("label"), col("fh"),
              transform(col("c0"), x => round(x.cast("double"), 6)).as("c"),
              col("n")))
        def ddot(x: org.apache.spark.sql.Column,
            y: org.apache.spark.sql.Column) =
          aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0),
            (acc, v) => acc + v)
        val a = cents.filter(col("fh"))
          .select(col("label"), col("c").as("ca"), col("n").as("n_then"))
        val b = cents.filter(!col("fh"))
          .select(col("label"), col("c").as("cb"), col("n").as("n_now"))
        graft.operators.Checkpoints.sealAndRelease(
          a.join(b, "label")
            .select(col("label"),
              round(ddot(col("ca"), col("cb")) /
                (sqrt(ddot(col("ca"), col("ca"))) *
                  sqrt(ddot(col("cb"), col("cb")))), 6).as("cos_drift"),
              col("n_then"), col("n_now"))
            .orderBy("label"),
          cents)
      },
      Some("""WITH n AS (SELECT count(*) nv FROM embeddings),
          h AS (SELECT label, (vec_id * 2 < n.nv) fh, embedding
            FROM embeddings CROSS JOIN n),
          c AS (SELECT label, fh, i, round(avg(embedding[i]), 6) c
            FROM h, (SELECT unnest(generate_series(1, 64)) i) ii
            GROUP BY 1, 2, 3),
          j AS (SELECT a.label, sum(a.c * b.c) dot,
              sum(a.c * a.c) na2, sum(b.c * b.c) nb2
            FROM c a JOIN c b ON a.label = b.label AND a.i = b.i
              AND a.fh AND NOT b.fh
            GROUP BY 1),
          cnt AS (SELECT label,
              sum(CASE WHEN fh THEN 1 ELSE 0 END) n_then,
              sum(CASE WHEN NOT fh THEN 1 ELSE 0 END) n_now
            FROM h GROUP BY 1)
        SELECT j.label, round(j.dot / (sqrt(na2) * sqrt(nb2)), 6) cos_drift,
          CAST(n_then AS BIGINT) n_then, CAST(n_now AS BIGINT) n_now
        FROM j JOIN cnt ON j.label = cnt.label ORDER BY j.label""")),

    // q198: novel-bigram rate per source between the corpus's two
    // halves — the "is this source still producing new content or
    // recycling templates" freshness probe (and the dual of q183's
    // vocabulary-growth curve, at bigram granularity and per source):
    // of the bigram TYPES present in a source's "now" half, how many
    // never occurred in its "then" half. Type-level (distinct before
    // counting) so a single spammed novel bigram can't masquerade as
    // fresh content; the anti-join runs on the (source, bigram) type
    // table — Heap's-law bounded, never instance-sized.
    QueryDef("q198_novel_bigrams",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        val bigrams = when(size(t) >= 2,
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))
        val nd = docs(s, d).agg(count(lit(1)).as("nd"))
        // single-pass form (r16): instead of the type-table anti-join —
        // which needed three reads of the bigram explode — fold the
        // then/now presence bits per (source, bigram) in ONE aggregation
        // (bool_or is combinable), then count now-types and novel types
        // in a second |types|-sized agg. One explode pass, two hash
        // shuffles, zero joins; identical rows by construction
        // (novel ⟺ has_now ∧ ¬has_then ⟺ the anti-join survivor).
        docs(s, d).crossJoin(broadcast(nd))
          .select(col("source"), (col("doc_id") * 2 < col("nd")).as("fh"),
            explode(bigrams).as("bg"))
          .groupBy("source", "bg")
          .agg(max(col("fh")).as("has_then"), max(!col("fh")).as("has_now"))
          .groupBy("source")
          .agg(sum(when(col("has_now"), 1L).otherwise(0L))
              .as("n_now_types"),
            sum(when(col("has_now") && !col("has_then"), 1L).otherwise(0L))
              .as("n_novel_types"))
          .filter(col("n_now_types") > 0)
          .orderBy("source")
      },
      Some(s"""WITH n AS (SELECT count(*) nd FROM documents),
          x AS (SELECT source, (doc_id * 2 < n.nd) fh, $OToks t
            FROM documents CROSS JOIN n),
          b AS (SELECT DISTINCT source, fh,
              unnest([t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) bg
            FROM x),
          nw AS (SELECT source, bg FROM b WHERE NOT fh),
          th AS (SELECT source, bg FROM b WHERE fh)
        SELECT nw.source AS source, CAST(count(*) AS BIGINT) n_now_types,
          CAST(sum(CASE WHEN th.bg IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            n_novel_types
        FROM nw LEFT JOIN th ON nw.source = th.source AND nw.bg = th.bg
        GROUP BY 1 ORDER BY nw.source""")),

    // q206: pairwise source-vocabulary overlap — the inter-source
    // redundancy matrix a mixture designer reads before weighting ("are
    // crawl-3 and crawl-7 the same corpus twice?"): for every source
    // pair the shared token-TYPE count plus both vocabulary sizes, so
    // Jaccard/containment are one consumer division each. Type-level
    // like q198 (a spammed shared token counts once). Shape: the
    // (source, type) table is Heap's-law bounded; the pair join is the
    // inverted-index construction — work Σ_t df(t)² with df ≤ |sources|,
    // so vocabulary × |sources|² worst case, never corpus-instance
    // sized; output |sources|²/2 rows.
    QueryDef("q206_source_vocab_overlap",
      (s, d) => {
        val st = docs(s, d)
          .select(col("source"),
            explode(array_distinct(TextFns.tokens(col("text")))).as("t"))
          .distinct()
        val n = st.groupBy("source").agg(count(lit(1)).as("nt"))
        st.as("x").join(st.as("y"),
            col("x.t") === col("y.t") && col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("source_a"),
            col("y.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared"))
          .join(broadcast(n.select(col("source").as("source_a"),
            col("nt").as("n_a_types"))), "source_a")
          .join(broadcast(n.select(col("source").as("source_b"),
            col("nt").as("n_b_types"))), "source_b")
          .select(col("source_a"), col("source_b"), col("n_shared"),
            col("n_a_types"), col("n_b_types"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH st AS (SELECT DISTINCT source, unnest($OToks) t
            FROM documents),
          n AS (SELECT source, count(*) nt FROM st GROUP BY 1),
          p AS (SELECT x.source sa, y.source sb, count(*) sh FROM st x
            JOIN st y ON x.t = y.t AND x.source < y.source GROUP BY 1, 2)
        SELECT sa source_a, sb source_b, CAST(sh AS BIGINT) n_shared,
          CAST(na.nt AS BIGINT) n_a_types, CAST(nb.nt AS BIGINT) n_b_types
        FROM p JOIN n na ON sa = na.source JOIN n nb ON sb = nb.source
        ORDER BY source_a, source_b""")),

    // q207: per-source Spearman association between document length and
    // lexical diversity (distinct-token count) — the "is long actually
    // richer, per source" read behind length-based quality gates:
    // monotone association that Pearson misses on nonlinear relations
    // and outliers can't drag. Integer pair (n, d2_sum = Σ(r_x − r_y)²),
    // ρ = 1 − 6·d2/(n(n²−1)) at the consumer; ranks id-tie-broken (the
    // documented deterministic deviation from average-rank ties). Both
    // ranking passes are the grouped two-phase rank — no per-source
    // corpus window.
    QueryDef("q207_spearman",
      (s, d) => graft.operators.Eval.spearmanPerGroup(
          docs(s, d).select(col("doc_id"), col("source"), col("n_chars"),
            size(array_distinct(TextFns.tokens(col("text")))).as("ydiv")),
          "doc_id", "source", "n_chars", "ydiv")
        .orderBy("source"),
      Some(s"""WITH b AS (SELECT doc_id, source, n_chars x,
            len(list_distinct($OToks)) y FROM documents),
          rx AS (SELECT doc_id, source,
              row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
                - 1 r1 FROM b),
          ry AS (SELECT doc_id,
              row_number() OVER (PARTITION BY source ORDER BY y, doc_id)
                - 1 r2 FROM b)
        SELECT rx.source AS source, CAST(count(*) AS BIGINT) n,
          CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) d2_sum
        FROM rx JOIN ry USING (doc_id)
        GROUP BY 1 ORDER BY rx.source""")),

    // q199: the full drift panel BETWEEN the corpus's halves, per source
    // — the "today vs yesterday" form of the monitor (q177/q192/q195
    // compare each source against the POOLED corpus, which dilutes: a
    // big source IS most of the pool, so its own drift partly cancels;
    // comparing its two time slices against each other doesn't). All
    // three legs from the same per-(source, half) count tables over each
    // source's union value grid: ks_num = max_v |cumA·n_now −
    // cumB·n_then| (worst threshold), tv_num = Σ_v |cA·n_now −
    // cB·n_then| (total mass displaced), w1_num = Σ_v |cumA·n_now −
    // cumB·n_then|·gap(v) (mass × distance moved); denominators
    // n_then·n_now (KS, W1) and 2·n_then·n_now (TV) at the consumer.
    // Grid-sized per source past the one count shuffle.
    QueryDef("q199_drift_between_halves",
      (s, d) => {
        val nd = docs(s, d).agg(count(lit(1)).as("nd"))
        // CUT: all three legs re-read the per-(source, half) counts (and
        // each pays the full-outer mergedGrid again); without the cut
        // the corpus scan + count shuffle runs once PER LEG — the
        // sessionItems/budgetSelect staging policy applied here
        val counts = graft.operators.Checkpoints.cut(
          docs(s, d).crossJoin(broadcast(nd))
            .select(col("source"), (col("doc_id") * 2 < col("nd")).as("fh"),
              col("n_chars").as("v"))
            .groupBy("source", "fh", "v").agg(count(lit(1)).as("c")))
        val a = counts.filter(col("fh")).select("source", "v", "c")
        val b = counts.filter(!col("fh")).select("source", "v", "c")
        val ks = graft.operators.Drift
          .ksBetweenCounts(a, b, "source", "v", "c")
          .select(col("source"), col("ks_num"))
        val tv = graft.operators.Drift
          .tvBetweenCounts(a, b, "source", "v", "c")
          .select(col("source"), col("tv_num"))
        val w1 = graft.operators.Drift
          .w1BetweenCounts(a, b, "source", "v", "c")
        graft.operators.Checkpoints.sealAndRelease(
          ks.join(tv, "source").join(w1, "source")
            .select(col("source"), col("ks_num"), col("tv_num"),
              col("w1_num"), col("n_a").as("n_then"), col("n_b").as("n_now"))
            .orderBy("source"),
          counts)
      },
      Some("""WITH n AS (SELECT count(*) nd FROM documents),
          b AS (SELECT source, (doc_id * 2 < n.nd) fh, n_chars v
            FROM documents CROSS JOIN n),
          pa AS (SELECT source, v, count(*) ca FROM b WHERE fh GROUP BY 1, 2),
          pb AS (SELECT source, v, count(*) cb FROM b WHERE NOT fh
            GROUP BY 1, 2),
          m AS (SELECT coalesce(pa.source, pb.source) source,
              coalesce(pa.v, pb.v) v, coalesce(ca, 0) ca, coalesce(cb, 0) cb
            FROM pa FULL JOIN pb ON pa.source = pb.source AND pa.v = pb.v),
          cum AS (SELECT source, v, ca, cb,
              sum(ca) OVER (PARTITION BY source ORDER BY v
                ROWS UNBOUNDED PRECEDING) sa,
              sum(cb) OVER (PARTITION BY source ORDER BY v
                ROWS UNBOUNDED PRECEDING) sb,
              sum(ca) OVER (PARTITION BY source) na,
              sum(cb) OVER (PARTITION BY source) nb,
              coalesce(lead(v, 1) OVER (PARTITION BY source ORDER BY v) - v,
                0) gap
            FROM m)
        SELECT source, CAST(max(abs(sa * nb - sb * na)) AS BIGINT) ks_num,
          CAST(sum(abs(ca * nb - cb * na)) AS BIGINT) tv_num,
          CAST(sum(abs(sa * nb - sb * na) * gap) AS BIGINT) w1_num,
          CAST(max(na) AS BIGINT) n_then, CAST(max(nb) AS BIGINT) n_now
        FROM cum GROUP BY source ORDER BY source""")),

    // q208: per-source 5%-trimmed length sum — the third robust location
    // next to q159's median and MAD gate: drop each source's lowest and
    // highest ⌊n/20⌋ lengths ((value, id)-ordered, deterministic tie
    // cuts) and ship (n_total, n_kept, sum_kept); the trimmed mean is
    // one consumer division. The mean is dragged by any single crawl
    // blob, the median ignores everything but one row — the trimmed
    // mean reads all central mass, the usual reporting statistic for
    // skewed length columns. Grouped two-phase rank, trim by rank
    // arithmetic — no per-source corpus window.
    QueryDef("q208_trimmed_mean",
      (s, d) => graft.operators.Robust.trimmedSumPerGroup(
          docs(s, d), "doc_id", "source", "n_chars",
          trimNum = 1L, trimDen = 20L)
        .orderBy("source"),
      Some("""WITH r AS (SELECT source, n_chars v,
            row_number() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) - 1 gpos,
            count(*) OVER (PARTITION BY source) gn
          FROM documents)
        SELECT source, CAST(max(gn) AS BIGINT) n_total,
          CAST(sum(CASE WHEN gpos >= gn // 20 AND gpos < gn - gn // 20
            THEN 1 ELSE 0 END) AS BIGINT) n_kept,
          CAST(sum(CASE WHEN gpos >= gn // 20 AND gpos < gn - gn // 20
            THEN v END) AS BIGINT) sum_kept
        FROM r GROUP BY source ORDER BY source""")),

    // q209: corpus Pareto table over sources — "the top k sources hold
    // X% of the tokens", the mixture-concentration read at the SOURCE
    // grain (q184's Gini reads tokens within a source; this reads the
    // corpus across sources): sources ranked by token mass (mass DESC,
    // source ASC total order) with the running cumulative and the
    // total, so share and cumulative share are consumer divisions. The
    // corpus pays one tokenize+count shuffle; every window rides the
    // |sources|-row mass table — grid-sized by construction, the q178
    // bounded-global-window stance.
    QueryDef("q209_source_pareto",
      (s, d) => {
        val mass = docs(s, d)
          .select(col("source"),
            size(TextFns.tokens(col("text"))).cast("long").as("nt"))
          .groupBy("source").agg(sum("nt").as("n_tokens"))
        val w = Window.orderBy(col("n_tokens").desc, col("source"))
        mass
          .withColumn("rank", row_number().over(w))
          .withColumn("cum_tokens", sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("total_tokens",
            sum("n_tokens").over(Window.partitionBy()))
          .select(col("rank"), col("source"), col("n_tokens"),
            col("cum_tokens"), col("total_tokens"))
          .orderBy("rank")
      },
      Some(s"""WITH m AS (SELECT source, sum(len($OToks)) n_tokens
            FROM documents GROUP BY 1)
        SELECT CAST(row_number() OVER
            (ORDER BY n_tokens DESC, source) AS INTEGER) rank,
          source, CAST(n_tokens AS BIGINT) n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, source
            ROWS UNBOUNDED PRECEDING) AS BIGINT) cum_tokens,
          CAST(sum(n_tokens) OVER () AS BIGINT) total_tokens
        FROM m ORDER BY rank""")),

    // q211: the precision-recall threshold table for the q178 signal
    // (n_chars predicting lang = 'en') — the operating-point choice
    // q178's single AUC number can't make: one exact integer
    // (threshold, TP, FP, FN, TN) row per DISTINCT observed value for
    // the rule "positive when n_chars ≥ t" (between observed values the
    // confusion matrix cannot change, so the distinct grid is the
    // EXHAUSTIVE threshold family); precision/recall/Fβ are consumer
    // divisions. Same scale shape as q178: the corpus pays one class-
    // histogram count shuffle, both running windows ride the
    // distinct-value grid — never a corpus-sized rank sweep.
    QueryDef("q211_pr_thresholds",
      (s, d) => graft.operators.Eval.confusionByThreshold(
        docs(s, d).select((col("lang") === lit("en")).as("pos"),
          col("n_chars").as("v")),
        "pos", "v").orderBy("threshold"),
      Some("""WITH h AS (SELECT n_chars v,
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) np,
            sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) nn
          FROM documents GROUP BY 1),
          t AS (SELECT sum(np) n_pos, sum(nn) n_neg FROM h),
          c AS (SELECT v,
              coalesce(sum(np) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) npb,
              coalesce(sum(nn) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) nnb
            FROM h)
        SELECT c.v AS threshold, CAST(t.n_pos - c.npb AS BIGINT) tp,
          CAST(t.n_neg - c.nnb AS BIGINT) fp, CAST(c.npb AS BIGINT) fn,
          CAST(c.nnb AS BIGINT) tn
        FROM c CROSS JOIN t ORDER BY threshold""")),

    // q212: χ²-of-homogeneity cells between the corpus's halves, per
    // source — the classical significance leg the q199 panel lacked
    // (KS/TV/W1 measure HOW FAR apart the halves sit; the χ² cell table
    // is what a monitor feeds a p-value lookup to ask IS the gap more
    // than sampling noise). Same halves construction as q199; ships the
    // exact integer cell decomposition (dev_num = cA·n_b − cB·n_a, the
    // q181 obs·n − row·col stance restated for two samples — side B's
    // deviation is the negation, Σ_v dev_num = 0 per source), zero
    // cells materialized by the union grid. Grid-sized past the one
    // count shuffle.
    QueryDef("q212_chi2_between_halves",
      (s, d) => {
        val nd = docs(s, d).agg(count(lit(1)).as("nd"))
        // CUT: both sides of the homogeneity table filter the same
        // per-(source, half) counts — the q199 staging policy
        val counts = graft.operators.Checkpoints.cut(
          docs(s, d).crossJoin(broadcast(nd))
            .select(col("source"), (col("doc_id") * 2 < col("nd")).as("fh"),
              col("n_chars").as("v"))
            .groupBy("source", "fh", "v").agg(count(lit(1)).as("c")))
        graft.operators.Checkpoints.sealAndRelease(
          graft.operators.Drift.chi2BetweenCounts(
              counts.filter(col("fh")).select("source", "v", "c"),
              counts.filter(!col("fh")).select("source", "v", "c"),
              "source", "v", "c")
            .orderBy("source", "v"),
          counts)
      },
      Some("""WITH n AS (SELECT count(*) nd FROM documents),
          b AS (SELECT source, (doc_id * 2 < n.nd) fh, n_chars v
            FROM documents CROSS JOIN n),
          pa AS (SELECT source, v, count(*) ca FROM b WHERE fh GROUP BY 1, 2),
          pb AS (SELECT source, v, count(*) cb FROM b WHERE NOT fh
            GROUP BY 1, 2),
          m AS (SELECT coalesce(pa.source, pb.source) source,
              coalesce(pa.v, pb.v) v, coalesce(ca, 0) ca, coalesce(cb, 0) cb
            FROM pa FULL JOIN pb ON pa.source = pb.source AND pa.v = pb.v),
          w AS (SELECT source, v, ca, cb,
              sum(ca) OVER (PARTITION BY source) na,
              sum(cb) OVER (PARTITION BY source) nb
            FROM m)
        SELECT source, v, CAST(ca AS BIGINT) c_a, CAST(cb AS BIGINT) c_b,
          CAST(na AS BIGINT) n_a, CAST(nb AS BIGINT) n_b,
          CAST(ca * nb - cb * na AS BIGINT) dev_num
        FROM w ORDER BY source, v""")),

    // q215: population-stability bucket table — per source the count
    // pairs over OCTILE buckets of the pooled length distribution
    // (Drift.psiBuckets): the industry PSI read without its ln()
    // (library-dependent — the q179 log-free stance); the consumer
    // applies PSI or any other f-divergence to the integer (c_src,
    // c_pool, n_src, n_pool) rows. Value-based integer bucketing
    // (⌊cum_below·8/n⌋ — ties never split, the truncating div replays
    // on any engine) where a float quantile cut would be
    // implementation-defined; zero cells materialized per occupied
    // bucket. Corpus pays two count shuffles; the cumulative window
    // rides the distinct-length grid.
    QueryDef("q215_psi_buckets",
      (s, d) => graft.operators.Drift.psiBuckets(
          docs(s, d).select(col("source"), col("n_chars")),
          "source", "n_chars", buckets = 8)
        .withColumnRenamed("c_grp", "c_src")
        .withColumnRenamed("n_grp", "n_src")
        .orderBy("source", "bucket"),
      Some("""WITH gv AS (SELECT n_chars v, count(*) cv FROM documents
            GROUP BY 1),
          np AS (SELECT sum(cv) n_pool FROM gv),
          vb AS (SELECT v, cv,
              (coalesce(sum(cv) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 8)
                // np.n_pool bkt
            FROM gv CROSS JOIN np),
          pb AS (SELECT bkt, sum(cv) c_pool FROM vb GROUP BY 1),
          sv AS (SELECT source, n_chars v, count(*) c FROM documents
            GROUP BY 1, 2),
          sb AS (SELECT sv.source, vb.bkt, sum(sv.c) c_src FROM sv
            JOIN vb ON sv.v = vb.v GROUP BY 1, 2),
          srcs AS (SELECT source, count(*) ns FROM documents GROUP BY 1),
          grid AS (SELECT srcs.source, srcs.ns, pb.bkt, pb.c_pool
            FROM srcs CROSS JOIN pb)
        SELECT g.source AS source, CAST(g.bkt AS BIGINT) bucket,
          CAST(coalesce(sb.c_src, 0) AS BIGINT) c_src,
          CAST(g.c_pool AS BIGINT) c_pool, CAST(g.ns AS BIGINT) n_src,
          CAST(np.n_pool AS BIGINT) n_pool
        FROM grid g LEFT JOIN sb ON g.source = sb.source AND g.bkt = sb.bkt
          CROSS JOIN np
        ORDER BY source, bucket""")),

    // q221: the PSI bucket table AS A RESTARTED MONITOR sees it — q215
    // from the PERSISTED additive count state instead of the raw scan
    // (the q193 lifecycle: the state is seeded empty and fed by three
    // doc_id-sliced micro-batches through the crash-safe staged-swap
    // merge, ONCE per session/dir — shared with q193; the registered
    // query is then a pure grid-sized read of published files). The
    // oracle deliberately states from `documents` directly, so the
    // hash-match proves state-building + psiBucketsFromCounts ≡ the
    // one-shot batch computation — the resume-without-rescan guarantee
    // at the driver gate for the PSI leg, as q193 proves it for KS/TV.
    QueryDef("q221_psi_at_rest",
      (s, d) => {
        val path = driftStateCache(s, d) {
          val t = java.nio.file.Files
            .createTempDirectory("graft_q193").toString + "/state"
          import s.implicits._
          graft.operators.Drift.writeCounts(
            Seq.empty[(String, Long, Long)].toDF("source", "v", "c"),
            t, "source", "v", "c")
          (0L to 2L).foreach { i =>
            graft.operators.Drift.mergeIntoCounts(s, t,
              docs(s, d).filter(pmod(col("doc_id"), lit(3L)) === i)
                .select(col("source"), col("n_chars").as("v")))
          }
          t
        }
        val (state, g, v, c) = graft.operators.Drift.readCounts(s, path)
        graft.operators.Drift.psiBucketsFromCounts(state, g, v, c,
            buckets = 8)
          .withColumnRenamed("c_grp", "c_src")
          .withColumnRenamed("n_grp", "n_src")
          .orderBy("source", "bucket")
      },
      Some("""WITH gv AS (SELECT n_chars v, count(*) cv FROM documents
            GROUP BY 1),
          np AS (SELECT sum(cv) n_pool FROM gv),
          vb AS (SELECT v, cv,
              (coalesce(sum(cv) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 8)
                // np.n_pool bkt
            FROM gv CROSS JOIN np),
          pb AS (SELECT bkt, sum(cv) c_pool FROM vb GROUP BY 1),
          sv AS (SELECT source, n_chars v, count(*) c FROM documents
            GROUP BY 1, 2),
          sb AS (SELECT sv.source, vb.bkt, sum(sv.c) c_src FROM sv
            JOIN vb ON sv.v = vb.v GROUP BY 1, 2),
          srcs AS (SELECT source, count(*) ns FROM documents GROUP BY 1),
          grid AS (SELECT srcs.source, srcs.ns, pb.bkt, pb.c_pool
            FROM srcs CROSS JOIN pb)
        SELECT g.source AS source, CAST(g.bkt AS BIGINT) bucket,
          CAST(coalesce(sb.c_src, 0) AS BIGINT) c_src,
          CAST(g.c_pool AS BIGINT) c_pool, CAST(g.ns AS BIGINT) n_src,
          CAST(np.n_pool AS BIGINT) n_pool
        FROM grid g LEFT JOIN sb ON g.source = sb.source AND g.bkt = sb.bkt
          CROSS JOIN np
        ORDER BY source, bucket""")),

    // q222: exact per-source DECILES from the persisted count state —
    // the order-statistics read that justifies keeping the state EXACT
    // (per-value counts) instead of sketched: any quantile of the
    // underlying corpus is recoverable at rest, bit-equal to computing
    // it from the raw rows (the oracle IS q175's raw-row decile SQL —
    // the hash-match proves state ≡ corpus for order statistics, as
    // q193/q221 prove it for the drift panel). Shares the q193 state
    // cache; the check itself is grid-sized, no corpus rescan, no ×9
    // blowup (crossing-run explode).
    QueryDef("q222_deciles_at_rest",
      (s, d) => {
        val path = driftStateCache(s, d) {
          val t = java.nio.file.Files
            .createTempDirectory("graft_q193").toString + "/state"
          import s.implicits._
          graft.operators.Drift.writeCounts(
            Seq.empty[(String, Long, Long)].toDF("source", "v", "c"),
            t, "source", "v", "c")
          (0L to 2L).foreach { i =>
            graft.operators.Drift.mergeIntoCounts(s, t,
              docs(s, d).filter(pmod(col("doc_id"), lit(3L)) === i)
                .select(col("source"), col("n_chars").as("v")))
          }
          t
        }
        val (state, g, v, c) = graft.operators.Drift.readCounts(s, path)
        graft.operators.Drift.quantilesFromCounts(state, g, v, c, q = 10)
          .orderBy("source", "quantile")
      },
      Some("""WITH r AS (SELECT source, n_chars AS v,
            row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
            count(*) OVER (PARTITION BY source) AS gn
          FROM documents),
        d AS (SELECT unnest(generate_series(1, 9)) AS dec),
        j AS (SELECT r.source, d.dec, r.v
          FROM r JOIN d ON 10 * r.rn >= d.dec * r.gn)
        SELECT source, CAST(dec AS INTEGER) AS quantile,
          CAST(min(v) AS BIGINT) AS value
        FROM j GROUP BY 1, 2 ORDER BY source, quantile""")),

    // q223: KS drift on the REBINNED state — the documented overflow
    // mitigation exercised at the driver gate: when n_src·n_all (or
    // ·range(v) for W1) approaches 2⁶³, the panel pre-buckets values;
    // Drift.rebinCounts coarsens the persisted state to 100-char bins
    // (bin-floor representatives, still a valid count state) and the
    // whole FromCounts machinery runs on it unchanged. The oracle
    // buckets the raw documents the same way — the hash-match is the
    // rebin ≡ bucket-at-source equivalence at data. Shares the q193
    // state; grid-sized past the shared build.
    QueryDef("q223_ks_rebinned",
      (s, d) => {
        val path = driftStateCache(s, d) {
          val t = java.nio.file.Files
            .createTempDirectory("graft_q193").toString + "/state"
          import s.implicits._
          graft.operators.Drift.writeCounts(
            Seq.empty[(String, Long, Long)].toDF("source", "v", "c"),
            t, "source", "v", "c")
          (0L to 2L).foreach { i =>
            graft.operators.Drift.mergeIntoCounts(s, t,
              docs(s, d).filter(pmod(col("doc_id"), lit(3L)) === i)
                .select(col("source"), col("n_chars").as("v")))
          }
          t
        }
        val (state, g, v, c) = graft.operators.Drift.readCounts(s, path)
        graft.operators.Drift.ksFromCounts(
            graft.operators.Drift.rebinCounts(state, g, v, c, width = 100L),
            g, v, c)
          .withColumnRenamed("n_grp", "n_src")
          .orderBy("source")
      },
      Some("""WITH dc AS (SELECT source, (n_chars // 100) * 100 v
            FROM documents),
          srcs AS (SELECT source, count(*) ns FROM dc GROUP BY 1),
          na AS (SELECT count(*) ng FROM dc),
          per AS (SELECT source, v, count(*) c FROM dc GROUP BY 1, 2),
          grid AS (SELECT srcs.source, vals.v FROM srcs
                   CROSS JOIN (SELECT DISTINCT v FROM dc) vals),
          scum AS (SELECT g.source, g.v,
              sum(coalesce(per.c, 0)) OVER (PARTITION BY g.source
                ORDER BY g.v ROWS UNBOUNDED PRECEDING) cs
            FROM grid g LEFT JOIN per
              ON per.source = g.source AND per.v = g.v),
          gcum AS (SELECT v, sum(count(*)) OVER (ORDER BY v
                ROWS UNBOUNDED PRECEDING) cg
            FROM dc GROUP BY v)
        SELECT s.source AS source,
          CAST(max(abs(s.cs * na.ng - gcum.cg * srcs.ns)) AS BIGINT) ks_num,
          CAST(max(srcs.ns) AS BIGINT) n_src, CAST(max(na.ng) AS BIGINT) n_all
        FROM scum s JOIN gcum USING (v)
          JOIN srcs ON s.source = srcs.source CROSS JOIN na
        GROUP BY s.source ORDER BY s.source""")),

    // q220: rank-biased overlap between the corpus halves' token
    // rankings (Webber, Moffat & Zobel, TOIS 2010) — the single-number
    // companion to q185's per-depth table: RBO = (1−p)·Σ_d p^(d−1)·
    // (overlap@d / d) weights shallow depths geometrically, the
    // indefinite-ranking similarity standard. Shipped EXACT at p = ½
    // truncated at depth 16 (tail < 2⁻¹⁶, the q185 head budget):
    // RBO@16 = Σ_{d≤16} 2⁻ᵈ·ov_d/d = rbo_num / rbo_den with integer
    // rbo_num = Σ ov_d·(720720/d)·2^(16−d) and rbo_den = 720720·2¹⁶
    // (720720 = lcm(1..16), so every term is integral — the ln-free /
    // float-free stance applied to a geometric series). Reuses the
    // q185 headRanked builder (one tokenize + count shuffle, top-16
    // heap-pruned per half); everything after rides ≤ 32 rows.
    QueryDef("q220_rbo",
      (s, d) => {
        val ranked = graft.operators.Checkpoints.cut(headRanked(s, d))
        val ra = ranked.filter(col("fh"))
          .select(col("t"), col("r").as("ra"))
        val rb = ranked.filter(!col("fh"))
          .select(col("t"), col("r").as("rb"))
        val depths = array((1L to 16L).map(lit): _*)
        graft.operators.Checkpoints.sealAndRelease(
          ra.join(rb, "t")
            .select(explode(depths).as("dd"), col("ra"), col("rb"))
            .groupBy("dd")
            .agg(sum(when(col("ra") <= col("dd") && col("rb") <= col("dd"),
              1L).otherwise(0L)).as("ov"))
            // integer div + shift, never Column./ — exact by construction
            .agg(coalesce(sum(col("ov") *
                expr("(720720L div dd) * shiftleft(1L, cast(16 - dd as int))")),
              lit(0L)).as("rbo_num"))
            .select(col("rbo_num"),
              lit(720720L * 65536L).as("rbo_den")),
          ranked)
      },
      Some(s"""WITH n AS (SELECT count(*) nd FROM documents),
          tf AS (SELECT (doc_id * 2 < n.nd) fh, tok t, count(*) f FROM (
              SELECT doc_id, unnest($OToks) tok FROM documents) CROSS JOIN n
            GROUP BY 1, 2),
          rk AS (SELECT fh, t, row_number() OVER (
              PARTITION BY fh ORDER BY f DESC, t) r FROM tf),
          ra AS (SELECT t, r ra FROM rk WHERE fh AND r <= 16),
          rb AS (SELECT t, r rb FROM rk WHERE NOT fh AND r <= 16),
          ds AS (SELECT unnest(generate_series(1, 16)) dd),
          ov AS (SELECT ds.dd, sum(CASE WHEN j.ra <= ds.dd
                AND j.rb <= ds.dd THEN 1 ELSE 0 END) ov
            FROM ds CROSS JOIN (SELECT ra.ra, rb.rb FROM ra
              JOIN rb ON ra.t = rb.t) j
            GROUP BY 1)
        SELECT CAST(coalesce(sum(ov * (720720 // dd)
            * (CAST(1 AS BIGINT) << CAST(16 - dd AS INT))), 0) AS BIGINT)
            rbo_num,
          CAST(720720 AS BIGINT) * 65536 rbo_den
        FROM ov""")),

    // q225: lag-k autocorrelation of daily volume per event type — the
    // periodicity signal next to q186's trend (Mann–Kendall answers "is
    // volume trending"; lag-7 autocorrelation answers "is it weekly" —
    // the seasonality a drift panel would otherwise misread as drift).
    // Series = the DENSE per-type daily count grid (missing days are
    // real zero observations — a sparse grid would silently splice
    // weekends out of the lag alignment); for each lag k ∈ {1, 2, 7}
    // the sample Pearson ships as the exact integer triple over the
    // n−k aligned pairs (x_t, x_{t+k}): ac_num = n'·Σxy − Σx·Σy,
    // den_x = n'·Σx² − (Σx)², den_y = n'·Σy² − (Σy)²; r_k =
    // ac_num/√(den_x·den_y) at the consumer. Shape: the corpus
    // collapses to the (type, day) grid in one count shuffle; the dense
    // grid, the ×3 lag explode, and the (type, day+k) equi-join are all
    // day-grid-sized. Overflow: n'·Σx² ≤ days·(days·max_c²) — a decade
    // of daily counts under ~10⁶/day stays < 2⁶³.
    QueryDef("q225_autocorrelation",
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
              .cast("long").as("dd"))
          .agg(count(lit(1)).as("c"))
        // CUT: the dense grid feeds both join sides — without it each
        // re-runs the corpus count shuffle; the frame is day-grid-sized
        // (the collapsed-frame staging line)
        val dense = graft.operators.Checkpoints.cut(
          daily.groupBy("event_type")
            .agg(min("dd").as("lo"), max("dd").as("hi"))
            .select(col("event_type"),
              explode(sequence(col("lo"), col("hi"))).as("dd"))
            .join(daily, Seq("event_type", "dd"), "left")
            .select(col("event_type"), col("dd"),
              coalesce(col("c"), lit(0L)).as("c")))
        val a = dense
          .select(col("event_type"), col("dd"), col("c").as("x"))
          .withColumn("lag", explode(array(lit(1), lit(2), lit(7))))
        val b = dense.select(col("event_type"), col("dd").as("db"),
          col("c").as("y"))
        graft.operators.Checkpoints.sealAndRelease(
          a.alias("l").join(b.alias("r"),
              col("l.event_type") === col("r.event_type") &&
                col("db") === col("dd") + col("lag"))
            .groupBy(col("l.event_type").as("event_type"), col("lag"))
            .agg(count(lit(1)).as("n_pairs"),
              sum("x").as("sx"), sum("y").as("sy"),
              sum(col("x") * col("y")).as("sxy"),
              sum(col("x") * col("x")).as("sxx"),
              sum(col("y") * col("y")).as("syy"))
            .select(col("event_type"), col("lag"), col("n_pairs"),
              (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
                .as("ac_num"),
              (col("n_pairs") * col("sxx") - col("sx") * col("sx"))
                .as("den_x"),
              (col("n_pairs") * col("syy") - col("sy") * col("sy"))
                .as("den_y"))
            .orderBy("event_type", "lag"),
          dense)
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd,
            count(*) c FROM events GROUP BY 1, 2),
          span AS (SELECT event_type, min(dd) lo, max(dd) hi
            FROM daily GROUP BY 1),
          days AS (SELECT event_type, unnest(generate_series(lo, hi)) dd
            FROM span),
          dense AS (SELECT days.event_type, days.dd, coalesce(daily.c, 0) c
            FROM days LEFT JOIN daily
              ON daily.event_type = days.event_type AND daily.dd = days.dd),
          lags AS (SELECT unnest([1, 2, 7]) lag),
          pr AS (SELECT a.event_type, l.lag, a.c x, b.c y
            FROM dense a CROSS JOIN lags l
            JOIN dense b ON b.event_type = a.event_type
              AND b.dd = a.dd + l.lag)
        SELECT event_type, CAST(lag AS INTEGER) lag,
          CAST(count(*) AS BIGINT) n_pairs,
          CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) ac_num,
          CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) den_x,
          CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) den_y
        FROM pr GROUP BY 1, 2 ORDER BY event_type, lag""")),

    // q226: per-label centroid drift FROM THE PERSISTED VECTOR-SUM
    // STATE — the semantic leg of the at-rest lifecycle (q193/q221/q222
    // prove it for length drift; this closes the r16 gap where q197
    // recomputed both half-centroids from raw embeddings every check):
    // each half's per-(label, dim) micro-unit component sums live in a
    // Drift vecsum state fed by three vec_id-sliced staged-swap merges,
    // and the check is a (labels × dims)-sized read. The cosine needs NO
    // rounding-at-read at all: the n and 10⁶ factors cancel, so
    // cos(c̄_then, c̄_now) = Σ sa·sb / (√Σsa²·√Σsb²) directly on the
    // exact integer micro-sums — products ride DECIMAL(38,0) (Spark) /
    // HUGEINT (DuckDB), the one double division happens on identical
    // exact integers both sides. Merge order can't flicker anything:
    // the state is additive in longs. Oracle states from raw embeddings
    // — the hash-match is the resume-without-rescan proof for the
    // semantic leg.
    QueryDef("q226_centroid_at_rest",
      (s, d) => {
        val (pThen, pNow) = vecStateCache(s, d) {
          import s.implicits._
          val base = java.nio.file.Files
            .createTempDirectory("graft_q226").toString
          val nv = emb(s, d).count()
          def build(thenHalf: Boolean): String = {
            val path = s"$base/${if (thenHalf) "then" else "now"}"
            // seed types match the embeddings table (label is int32 —
            // a wider seed would widen every merge's join key)
            graft.operators.Drift.writeVecSums(
              Seq.empty[(Int, Int, Long, Long)]
                .toDF("label", "dim", "s", "n"),
              path, "label", "dim", "s", "n")
            val half = emb(s, d).filter(
              if (thenHalf) col("vec_id") * 2 < nv
              else col("vec_id") * 2 >= nv)
            (0L to 2L).foreach { i =>
              graft.operators.Drift.mergeIntoVecSums(s, path,
                half.filter(pmod(col("vec_id"), lit(3L)) === i),
                "label", "embedding")
            }
            path
          }
          (build(thenHalf = true), build(thenHalf = false))
        }
        val (stA, ga, da, sa, na) =
          graft.operators.Drift.readVecSums(s, pThen)
        val (stB, gb, db, sb, nb) =
          graft.operators.Drift.readVecSums(s, pNow)
        val a = stA.select(col(ga).as("label"), col(da).as("dim"),
          col(sa).cast("decimal(20,0)").as("sa"), col(na).as("na"))
        val b = stB.select(col(gb).as("label"), col(db).as("dim"),
          col(sb).cast("decimal(20,0)").as("sb"), col(nb).as("nb"))
        a.join(b, Seq("label", "dim"))
          .groupBy("label")
          .agg(sum(col("sa") * col("sb")).as("num"),
            sum(col("sa") * col("sa")).as("na2"),
            sum(col("sb") * col("sb")).as("nb2"),
            max("na").as("n_then"), max("nb").as("n_now"))
          .select(col("label"),
            round(col("num").cast("double") /
              (sqrt(col("na2").cast("double")) *
                sqrt(col("nb2").cast("double"))), 6).as("cos_drift"),
            col("n_then"), col("n_now"))
          .orderBy("label")
      },
      Some("""WITH n AS (SELECT count(*) nv FROM embeddings),
          h AS (SELECT label, (vec_id * 2 < n.nv) fh, embedding
            FROM embeddings CROSS JOIN n),
          e AS (SELECT label, fh, i,
              CAST(round(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) m
            FROM h, (SELECT unnest(generate_series(1, 64)) i) ii),
          st AS (SELECT label, fh, i, sum(m) s, count(*) cnt
            FROM e GROUP BY 1, 2, 3),
          j AS (SELECT a.label,
              sum(a.s::HUGEINT * b.s::HUGEINT) num,
              sum(a.s::HUGEINT * a.s::HUGEINT) na2,
              sum(b.s::HUGEINT * b.s::HUGEINT) nb2
            FROM st a JOIN st b ON a.label = b.label AND a.i = b.i
              AND a.fh AND NOT b.fh
            GROUP BY 1),
          cnt AS (SELECT label,
              max(CASE WHEN fh THEN cnt END) n_then,
              max(CASE WHEN NOT fh THEN cnt END) n_now
            FROM st WHERE i = 1 GROUP BY 1)
        SELECT j.label AS label,
          round(num::DOUBLE / (sqrt(na2::DOUBLE) * sqrt(nb2::DOUBLE)), 6)
            cos_drift,
          CAST(n_then AS BIGINT) n_then, CAST(n_now AS BIGINT) n_now
        FROM j JOIN cnt ON j.label = cnt.label ORDER BY j.label""")),

    // q227: the PER-SOURCE operating-point table — q211 grouped ("is
    // the length filter calibrated on crawl-3 as well as wiki", the
    // per-slice read a corpus-global PR table averages away: a
    // threshold that is precision-0.9 globally can be precision-0.3 on
    // one source). Same signal as q178/q211 (n_chars predicting
    // lang = 'en'); one exact integer (source, threshold, TP, FP, FN,
    // TN) row per value observed IN that source. Scale shape: one
    // (source, value) class-histogram shuffle; the cumulative windows
    // are PARTITIONED grid windows now — the per-group form is
    // strictly better-behaved than the global one.
    QueryDef("q227_pr_by_source",
      (s, d) => graft.operators.Eval.confusionByThresholdPerGroup(
        docs(s, d).select(col("source"),
          (col("lang") === lit("en")).as("pos"), col("n_chars").as("v")),
        "source", "pos", "v").orderBy("source", "threshold"),
      Some("""WITH h AS (SELECT source, n_chars v,
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) np,
            sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) nn
          FROM documents GROUP BY 1, 2),
          c AS (SELECT source, v,
              coalesce(sum(np) OVER (PARTITION BY source ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) npb,
              coalesce(sum(nn) OVER (PARTITION BY source ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) nnb,
              sum(np) OVER (PARTITION BY source) n_pos,
              sum(nn) OVER (PARTITION BY source) n_neg
            FROM h)
        SELECT source, v AS threshold, CAST(n_pos - npb AS BIGINT) tp,
          CAST(n_neg - nnb AS BIGINT) fp, CAST(npb AS BIGINT) fn,
          CAST(nnb AS BIGINT) tn
        FROM c ORDER BY source, threshold""")),

    // q229: CUSUM change-point trajectory of daily volume per event type
    // (Page, Biometrika 1954) — the LEVEL-SHIFT signal completing the
    // time-series triptych: q186 answers "is it trending", q225 "is it
    // periodic", CUSUM "did the level JUMP, and when" (a deploy that
    // doubles click volume shows a cusum_up ramp from the change day;
    // the slow drift Mann–Kendall sees barely moves it). Recursions
    // S⁺_t = max(0, S⁺_{t−1} + (x_t − k)) and S⁻_t = max(0, S⁻_{t−1} +
    // (k − x_t)) are window-expressible through the prefix identity
    // S⁺_t = P_t − min(0, min_{i≤t} P_i), S⁻_t = max(0, max_{i≤t} P_i)
    // − P_t with P the running sum of (x − k) — so the plan is two
    // cumulative windows, not a per-row recursion. Reference k = each
    // type's mean daily count floored (tot div n_days — integer, exact).
    // Series = the same DENSE day grid as q225 (missing days are real
    // zero observations). Shape: corpus → (type, day) grid in one count
    // shuffle; the cut dense grid feeds the k aggregate and the
    // trajectory; every window is partitioned by type over day rows.
    QueryDef("q229_cusum",
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
              .cast("long").as("dd"))
          .agg(count(lit(1)).as("c"))
        // CUT: the dense grid feeds the per-type reference aggregate AND
        // the trajectory join (day-grid-sized, the staging line)
        val dense = graft.operators.Checkpoints.cut(
          daily.groupBy("event_type")
            .agg(min("dd").as("lo"), max("dd").as("hi"))
            .select(col("event_type"),
              explode(sequence(col("lo"), col("hi"))).as("dd"))
            .join(daily, Seq("event_type", "dd"), "left")
            .select(col("event_type"), col("dd"),
              coalesce(col("c"), lit(0L)).as("c")))
        val ref = dense.groupBy("event_type")
          .agg(sum("c").as("ct"), count(lit(1)).as("nd"))
          .select(col("event_type"), expr("ct div nd").as("k"))
        val w = Window.partitionBy("event_type").orderBy("dd")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        graft.operators.Checkpoints.sealAndRelease(
          dense.join(broadcast(ref), "event_type")
            .withColumn("p", sum(col("c") - col("k")).over(w))
            .withColumn("pmin", min("p").over(w))
            .withColumn("pmax", max("p").over(w))
            .select(col("event_type"), col("dd"), col("c").as("x"),
              col("k").as("k_ref"),
              (col("p") - least(lit(0L), col("pmin"))).as("cusum_up"),
              (greatest(lit(0L), col("pmax")) - col("p")).as("cusum_lo"))
            .orderBy("event_type", "dd"),
          dense)
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd,
            count(*) c FROM events GROUP BY 1, 2),
          span AS (SELECT event_type, min(dd) lo, max(dd) hi
            FROM daily GROUP BY 1),
          days AS (SELECT event_type, unnest(generate_series(lo, hi)) dd
            FROM span),
          dense AS (SELECT days.event_type, days.dd, coalesce(daily.c, 0) c
            FROM days LEFT JOIN daily
              ON daily.event_type = days.event_type AND daily.dd = days.dd),
          ref AS (SELECT event_type, sum(c) // count(*) k
            FROM dense GROUP BY 1),
          p AS (SELECT d.event_type, d.dd, d.c, r.k,
              sum(d.c - r.k) OVER (PARTITION BY d.event_type ORDER BY d.dd
                ROWS UNBOUNDED PRECEDING) p
            FROM dense d JOIN ref r ON r.event_type = d.event_type),
          m AS (SELECT *,
              min(p) OVER (PARTITION BY event_type ORDER BY dd
                ROWS UNBOUNDED PRECEDING) pmin,
              max(p) OVER (PARTITION BY event_type ORDER BY dd
                ROWS UNBOUNDED PRECEDING) pmax FROM p)
        SELECT event_type, CAST(dd AS BIGINT) dd, CAST(c AS BIGINT) x,
          CAST(k AS BIGINT) k_ref,
          CAST(p - least(0, pmin) AS BIGINT) cusum_up,
          CAST(greatest(0, pmax) - p AS BIGINT) cusum_lo
        FROM m ORDER BY event_type, dd""")),

    // q242: Theil–Sen robust slope of daily volume per event type
    // (Theil 1950 / Sen JASA 1968) — the MAGNITUDE completing the trend
    // family: q186's Mann–Kendall answers "is it trending" (a sign
    // statistic), Theil–Sen answers "how fast" with the median of all
    // pairwise slopes — 29% outlier breakdown where OLS is wrecked by
    // one spike day. Exact: each pairwise slope ships as the integer
    // rational (Δcount, Δdays); the median element is selected by the
    // total order (num/den as ONE IEEE division, then num, then den) —
    // identical doubles in any engine, deterministic ties; the lower
    // median at rank (n+1) div 2 (the q175 convention). Shape: the same
    // cut dense day grid as q229; the pair join and rank window ride the
    // per-type day²/2 pair grid — day-grid-squared-sized, never
    // event-sized (30 days = 435 pairs; even a decade is ~6.7M rows).
    QueryDef("q242_theil_sen",
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
              .cast("long").as("dd"))
          .agg(count(lit(1)).as("c"))
        val dense = graft.operators.Checkpoints.cut(
          daily.groupBy("event_type")
            .agg(min("dd").as("lo"), max("dd").as("hi"))
            .select(col("event_type"),
              explode(sequence(col("lo"), col("hi"))).as("dd"))
            .join(daily, Seq("event_type", "dd"), "left")
            .select(col("event_type"), col("dd"),
              coalesce(col("c"), lit(0L)).as("c")))
        val a = dense.select(col("event_type"), col("dd").as("d1"),
          col("c").as("c1"))
        val b = dense.select(col("event_type"), col("dd").as("d2"),
          col("c").as("c2"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("ratio"), col("num"), col("den"))
        graft.operators.Checkpoints.sealAndRelease(
          a.join(b, Seq("event_type")).filter(col("d2") > col("d1"))
            .select(col("event_type"),
              (col("c2") - col("c1")).as("num"),
              (col("d2") - col("d1")).as("den"))
            .withColumn("ratio",
              col("num").cast("double") / col("den").cast("double"))
            .withColumn("rn", row_number().over(w))
            .withColumn("np",
              count(lit(1)).over(Window.partitionBy("event_type")))
            // div, not Column./ (double — an even pair count would make
            // the rank compare x.5 and silently drop the row)
            .filter(col("rn") === expr("(np + 1L) div 2L"))
            .select(col("event_type"), col("np").as("n_pairs"),
              col("num").as("slope_num"), col("den").as("slope_den"))
            .orderBy("event_type"),
          dense)
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd,
            count(*) c FROM events GROUP BY 1, 2),
          span AS (SELECT event_type, min(dd) lo, max(dd) hi
            FROM daily GROUP BY 1),
          days AS (SELECT event_type, unnest(generate_series(lo, hi)) dd
            FROM span),
          dense AS (SELECT days.event_type, days.dd, coalesce(daily.c, 0) c
            FROM days LEFT JOIN daily
              ON daily.event_type = days.event_type AND daily.dd = days.dd),
          p AS (SELECT a.event_type, b.c - a.c num, b.dd - a.dd den
            FROM dense a JOIN dense b
              ON b.event_type = a.event_type AND b.dd > a.dd),
          r AS (SELECT event_type, num, den,
              row_number() OVER (PARTITION BY event_type
                ORDER BY num::DOUBLE / den::DOUBLE, num, den) rn,
              count(*) OVER (PARTITION BY event_type) np
            FROM p)
        SELECT event_type, CAST(np AS BIGINT) n_pairs,
          CAST(num AS BIGINT) slope_num, CAST(den AS BIGINT) slope_den
        FROM r WHERE rn = (np + 1) // 2 ORDER BY event_type""")),

    // q230: per-source AUC — q178 grouped, the ranking-number companion
    // to q227's per-source operating points ("does length rank
    // English-ness WITHIN each source, or only via between-source
    // composition" — Simpson's reversal is invisible to the global AUC).
    // Same signal (n_chars predicting lang = 'en'); one (source, value)
    // class-histogram shuffle, the tie-corrected 2U accumulates over the
    // PARTITIONED per-source value grid.
    QueryDef("q230_auc_by_source",
      (s, d) => graft.operators.Eval.aucHistogramPerGroup(
        docs(s, d).select(col("source"),
          (col("lang") === lit("en")).as("pos"), col("n_chars").as("v")),
        "source", "pos", "v").orderBy("source"),
      Some("""WITH h AS (SELECT source, n_chars v,
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) np,
            sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) nn
          FROM documents GROUP BY 1, 2),
          c AS (SELECT source, np, nn,
              coalesce(sum(nn) OVER (PARTITION BY source ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) nnb
            FROM h)
        SELECT source, CAST(sum(np * (2 * nnb + nn)) AS BIGINT) auc_num2,
          CAST(sum(np) AS BIGINT) n_pos, CAST(sum(nn) AS BIGINT) n_neg
        FROM c GROUP BY source ORDER BY source""")),

    // q236: exact integer second-moment (Gram) matrix of the embedding
    // corpus — the one-pass statistic under PCA / ZCA-whitening /
    // Mahalanobis outlier scoring (covariance = one consumer subtraction
    // given q44's centroid): per upper-triangle (i, j), Σ m_i·m_j with m
    // the q226 micro-unit grid (half-away-from-zero 1e6 rounding), so
    // the 2080 cells are engine-exact integers. Shape: ONE map-side-
    // combined aggregator pass — each partition folds its rows into a
    // d(d+1)/2-long triangle buffer, the shuffle carries one triangle
    // per partition, never rows (the q197 CentroidAggregator posture
    // widened to second moments); the explode is grid-sized (2080 rows).
    QueryDef("q236_embedding_gram",
      (s, d) => {
        val ga = udaf(graft.functions.GramAggregator,
          org.apache.spark.sql.catalyst.encoders
            .ExpressionEncoder[Seq[Float]]())
        emb(s, d).filter(col("embedding").isNotNull)
          .agg(ga(col("embedding")).as("g"))
          .select(explode(col("g._1")).as("c"), col("g._2").as("nv"))
          .select(col("c._1").as("dim_i"), col("c._2").as("dim_j"),
            col("c._3").as("gram_micro2"), col("nv").as("n_vecs"))
          .orderBy("dim_i", "dim_j")
      },
      Some("""WITH e AS (SELECT list_transform(embedding,
            x -> CAST(round(x::DOUBLE * 1000000.0) AS BIGINT)) m
          FROM embeddings WHERE embedding IS NOT NULL),
        ij AS (SELECT CAST(a.i AS INTEGER) i, CAST(b.j AS INTEGER) j
          FROM (SELECT unnest(generate_series(1, 64)) i) a,
            (SELECT unnest(generate_series(1, 64)) j) b
          WHERE b.j >= a.i)
        SELECT ij.i AS dim_i, ij.j AS dim_j,
          CAST(sum(e.m[ij.i]::HUGEINT * e.m[ij.j]::HUGEINT) AS BIGINT)
            gram_micro2,
          (SELECT count(*) FROM e)::BIGINT n_vecs
        FROM e CROSS JOIN ij GROUP BY 1, 2 ORDER BY 1, 2""")),

    // q237: two-sample Cramér–von Mises between the corpus halves — the
    // MEAN-squared companion completing q199's between-states panel
    // (KS = the single worst ECDF gap, so a broad 1%-everywhere shift
    // that never spikes is its classic blind spot; CvM integrates every
    // gap weighted by pooled mass, so it scores). Same count
    // construction and envelope as q199 (one cut per-(source, half)
    // count shuffle, grid-sized after); the squared summand ACCUMULATES
    // in DECIMAL/HUGEINT (exact both engines) and SHIPS as BIGINT — the
    // q177/q195 portability stance (the r17 driver gate proved a
    // DECIMAL(38,0) output column hash-red even when multiset-equal):
    // cvm_num ~10³–10⁵ at the gate scales, worst case safe to ~5k per
    // half, null-not-wrap past that, rebinCounts pre-bucket beyond.
    QueryDef("q237_cvm_between_halves",
      (s, d) => {
        val nd = docs(s, d).agg(count(lit(1)).as("nd"))
        val counts = graft.operators.Checkpoints.cut(
          docs(s, d).crossJoin(broadcast(nd))
            .select(col("source"), (col("doc_id") * 2 < col("nd")).as("fh"),
              col("n_chars").as("v"))
            .groupBy("source", "fh", "v").agg(count(lit(1)).as("c")))
        val a = counts.filter(col("fh")).select("source", "v", "c")
        val b = counts.filter(!col("fh")).select("source", "v", "c")
        graft.operators.Checkpoints.sealAndRelease(
          graft.operators.Drift.cvmBetweenCounts(a, b, "source", "v", "c")
            .select(col("source"), col("cvm_num"),
              col("n_a").as("n_then"), col("n_b").as("n_now"))
            .orderBy("source"),
          counts)
      },
      Some("""WITH n AS (SELECT count(*) nd FROM documents),
          b AS (SELECT source, (doc_id * 2 < n.nd) fh, n_chars v
            FROM documents CROSS JOIN n),
          pa AS (SELECT source, v, count(*) ca FROM b WHERE fh GROUP BY 1, 2),
          pb AS (SELECT source, v, count(*) cb FROM b WHERE NOT fh
            GROUP BY 1, 2),
          m AS (SELECT coalesce(pa.source, pb.source) source,
              coalesce(pa.v, pb.v) v, coalesce(ca, 0) ca, coalesce(cb, 0) cb
            FROM pa FULL JOIN pb ON pa.source = pb.source AND pa.v = pb.v),
          cum AS (SELECT source, ca, cb,
              sum(ca) OVER (PARTITION BY source ORDER BY v
                ROWS UNBOUNDED PRECEDING) sa,
              sum(cb) OVER (PARTITION BY source ORDER BY v
                ROWS UNBOUNDED PRECEDING) sb,
              sum(ca) OVER (PARTITION BY source) na,
              sum(cb) OVER (PARTITION BY source) nb
            FROM m)
        SELECT source,
          CAST(sum((sa * nb - sb * na)::HUGEINT * (sa * nb - sb * na)
            * (ca + cb)) AS BIGINT) cvm_num,
          CAST(max(na) AS BIGINT) n_then, CAST(max(nb) AS BIGINT) n_now
        FROM cum GROUP BY source ORDER BY source""")),

    // q243: Mann–Whitney U between the corpus halves per source — the
    // classic two-sample LOCATION test joining the between-states panel
    // (KS/CvM ask "same distribution?"; U asks the more actionable
    // "did documents get LONGER?": U/(n_then·n_now) is the probability
    // a then-doc outranks a now-doc, rank-biserial effect size
    // 2U/(n·m) − 1 one consumer division away). Pure composition: the
    // grouped tie-corrected 2U machinery IS aucHistogramPerGroup with
    // then-half membership as the label — one class-histogram shuffle,
    // partitioned grid windows.
    QueryDef("q243_mannwhitney_between_halves",
      (s, d) => {
        val nd = docs(s, d).agg(count(lit(1)).as("nd"))
        graft.operators.Eval.aucHistogramPerGroup(
            docs(s, d).crossJoin(broadcast(nd))
              .select(col("source"), (col("doc_id") * 2 < col("nd")).as("pos"),
                col("n_chars").as("v")),
            "source", "pos", "v")
          .select(col("source"), col("auc_num2").as("u2"),
            col("n_pos").as("n_then"), col("n_neg").as("n_now"))
          .orderBy("source")
      },
      Some("""WITH n AS (SELECT count(*) nd FROM documents),
          h AS (SELECT source, n_chars v,
              sum(CASE WHEN doc_id * 2 < n.nd THEN 1 ELSE 0 END) np,
              sum(CASE WHEN doc_id * 2 < n.nd THEN 0 ELSE 1 END) nn
            FROM documents CROSS JOIN n GROUP BY 1, 2),
          c AS (SELECT source, np, nn,
              coalesce(sum(nn) OVER (PARTITION BY source ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) nnb
            FROM h)
        SELECT source, CAST(sum(np * (2 * nnb + nn)) AS BIGINT) u2,
          CAST(sum(np) AS BIGINT) n_then, CAST(sum(nn) AS BIGINT) n_now
        FROM c GROUP BY source ORDER BY source""")),

    // q244: time-weighted average value per (event type, day) — the ops
    // metric a plain mean gets wrong when observations are irregular (a
    // value held for six hours weighs 6×10⁴ more than one held a
    // second): each event's value holds until the NEXT event of the
    // same type that day, the day's last observation carries weight 0
    // (its holding period is unobserved — not imputed to midnight).
    // Exact: value on the CENTS grid (×100 — the micro grid put the
    // numerator at ~4.7e18 already at sf0.01, genuinely inside int64
    // wrap range, and the r17 driver gate rejects a DECIMAL output
    // column outright), weights integral microseconds, twap =
    // num/(100·den) at the consumer. Bound: one cent-value held a full
    // day is vc·8.64e10, so a day's numerator stays under 2⁶³ while
    // max|value| < ~1e6 — four decades of headroom at the gate, and the
    // decimal-accumulate + cast-to-long goes NULL (loud) not wrapped if
    // a pathological value ever passes it; coarsen the grid again (or
    // gap to millis) past that. Shape: the
    // lead window partitions by (type, day) — bounded slices, never a
    // whole type in one task (the per-type form would put 100 TB of one
    // event type in five partitions); output is day-grid-sized.
    QueryDef("q244_twap",
      (s, d) => {
        val dd = datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long")
        val w = Window.partitionBy(col("event_type"), col("dd"))
          .orderBy(col("ts"), col("event_id"))
        graft.operators.Checkpoints.sealAndRelease(
          ev(s, d).select(col("event_type"), dd.as("dd"), col("ts"),
              col("event_id"),
              round(col("value") * lit(100)).cast("long").as("vc"))
            .withColumn("gap", coalesce(
              unix_micros(lead(col("ts"), 1).over(w)) -
                unix_micros(col("ts")), lit(0L)))
            .groupBy("event_type", "dd")
            .agg(sum(col("vc").cast("decimal(38,0)") *
                col("gap").cast("decimal(38,0)"))
                .cast("long").as("twap_num"),
              sum("gap").as("twap_den"), count(lit(1)).as("n_events"))
            .orderBy("event_type", "dd"))
      },
      Some("""WITH e AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd,
            ts, event_id,
            CAST(round(value * 100.0) AS BIGINT) vc
          FROM events),
          g AS (SELECT event_type, dd, vc,
              coalesce(epoch_us(lead(ts) OVER (PARTITION BY event_type, dd
                ORDER BY ts, event_id)) - epoch_us(ts), 0) gap
            FROM e)
        SELECT event_type, CAST(dd AS BIGINT) dd,
          CAST(sum(vc::HUGEINT * gap) AS BIGINT) twap_num,
          CAST(sum(gap) AS BIGINT) twap_den,
          CAST(count(*) AS BIGINT) n_events
        FROM g GROUP BY 1, 2 ORDER BY 1, 2""")),

    // q245: vocabulary-richness panel per source — Chao1 species-richness
    // (Chao, Scand. J. Stat. 1984; the bias-corrected 1987 form
    // V + F1(F1−1)/(2(F2+1)), always defined) estimates how many types a
    // source's vocabulary REALLY has from the singleton/doubleton
    // frequencies-of-frequencies, and F1/N is Good–Turing's unseen mass
    // (Good, Biometrika 1953) — "what fraction of this source's next
    // tokens will be words we've never seen": the coverage read behind
    // deciding whether a source is mined out. Next to q183's Heap's-law
    // growth curve — that one fits a trend, this one estimates the
    // asymptote. All integers: the estimator ships as
    // chao1_num/chao1_den; p0 = f1/n_tokens at the consumer. Shape: one
    // token-instance explode + (source, type) count shuffle; everything
    // after rides the Heap's-law type table.
    QueryDef("q245_vocab_richness",
      (s, d) => {
        val counts = docs(s, d)
          .select(col("source"),
            explode(TextFns.tokens(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        counts.groupBy("source")
          .agg(sum("c").as("n_tokens"), count(lit(1)).as("v_types"),
            sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
            sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
          .select(col("source"), col("n_tokens"), col("v_types"),
            col("f1"), col("f2"),
            (col("v_types") * lit(2L) * (col("f2") + 1L) +
              col("f1") * (col("f1") - 1L)).as("chao1_num"),
            (lit(2L) * (col("f2") + 1L)).as("chao1_den"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT source, unnest($OToks) w FROM documents),
          c AS (SELECT source, w, count(*) c FROM t GROUP BY 1, 2),
          a AS (SELECT source, CAST(sum(c) AS BIGINT) n_tokens,
              CAST(count(*) AS BIGINT) v_types,
              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) f1,
              CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) f2
            FROM c GROUP BY 1)
        SELECT source, n_tokens, v_types, f1, f2,
          CAST(v_types * 2 * (f2 + 1) + f1 * (f1 - 1) AS BIGINT) chao1_num,
          CAST(2 * (f2 + 1) AS BIGINT) chao1_den
        FROM a ORDER BY source""")),

    // q246: inter-arrival-time deciles per event type — the latency-
    // distribution read next to q244's TWAP (a mean gap hides the
    // bimodal burst-then-silence shape bursty streams actually have;
    // q188's Fano factor says "bursty", the decile table says HOW).
    // Gaps come from the same BOUNDED (type, day) lead windows as q244
    // (cross-day gaps excluded — overnight silence is not an
    // inter-arrival observation); the decile table is the q175 grouped
    // two-phase machinery, so no per-type corpus window anywhere.
    QueryDef("q246_interarrival_deciles",
      (s, d) => {
        val dd = datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long")
        val w = Window.partitionBy(col("event_type"), col("dd"))
          .orderBy(col("ts"), col("event_id"))
        // CUT the gaps frame (r22): the grouped two-phase rank reads its
        // input three times (lazy quantile probe, per-bucket offsets,
        // the ranking pass), and here that input is an events scan + a
        // per-(type, day) lead window — the VERDICT r21 q246 watch item
        // was exactly this chain executing 3×. Pinned, it runs once.
        val gaps = graft.operators.Checkpoints.cut(ev(s, d)
          .select(col("event_type"), dd.as("dd"), col("ts"), col("event_id"))
          .withColumn("gap",
            unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
          .filter(col("gap").isNotNull)
          .select(col("event_id"), col("event_type"), col("gap")))
        graft.operators.Sampling.exactQuantilesPerGroup(
            gaps, "event_id", "event_type", "gap", q = 10)
          .select(col("grp").as("event_type"), col("quantile"),
            col("value").as("gap_us"))
          .orderBy("event_type", "quantile")
      },
      Some("""WITH g AS (SELECT event_type, event_id,
            epoch_us(lead(ts) OVER (PARTITION BY event_type,
              date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              ORDER BY ts, event_id)) - epoch_us(ts) gap
          FROM events),
          r AS (SELECT event_type, gap v,
              row_number() OVER (PARTITION BY event_type
                ORDER BY gap, event_id) rn,
              count(*) OVER (PARTITION BY event_type) gn
            FROM g WHERE gap IS NOT NULL),
          d AS (SELECT unnest(generate_series(1, 9)) AS dec),
          j AS (SELECT r.event_type, d.dec, r.v
            FROM r JOIN d ON 10 * r.rn >= d.dec * r.gn)
        SELECT event_type, CAST(dec AS INTEGER) quantile,
          CAST(min(v) AS BIGINT) gap_us
        FROM j GROUP BY 1, 2 ORDER BY 1, 2""")),

    // q248: PER-SOURCE calibration table — q182 grouped, completing the
    // grouped-eval trio (AUC-by-source q230, PR-by-source q227,
    // calibration-by-source here): a classifier calibrated on the pooled
    // corpus can be badly over-confident on one source (the slice where
    // its hashed features alias differently), and the pooled reliability
    // diagram averages that away. Same deterministic hashed-feature
    // linear score and heuristic label as q129/q182; per (source,
    // score-bin) the exact integer census. One instance-explode score
    // shuffle; the bin table is sources × occupied-bins sized.
    QueryDef("q248_calibration_by_source",
      (s, d) => {
        // r21: one corpus scan, label below the explode, broadcast weight
        // lookup, hash-aggregatable per-doc agg — see classifierScoreFrame
        classifierScoreFrame(s, d, withSource = true)
          .withColumn("bin",
            floor(col("score") / lit(2000.0)).cast("long"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("b"), 1L).otherwise(0L)).as("n_pos"),
            min("score").as("min_score"), max("score").as("max_score"),
            sum("score").as("sum_score"))
          .orderBy("source", "bin")
      },
      Some(s"""WITH x AS (SELECT doc_id, source, $OToks t FROM documents),
          f AS (SELECT doc_id, unnest(t ||
                  [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) feat
                FROM x),
          sc AS (SELECT doc_id, sum(
                  ('0x' || substr(md5('w:' || CAST(
                    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096
                  AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS score
                FROM f GROUP BY doc_id),
          lab AS (SELECT doc_id, source,
                  (4000 * len(list_distinct(t))
                   + 3000 * (len(t) - len(list_filter(t, q -> q IN ('the','a'))))
                   + 30 * least(len(t), 100) * len(t)) >= 6200 * len(t) AS b
                FROM x),
          j AS (SELECT lab.source, CAST(floor(sc.score / 2000.0) AS BIGINT) bin,
                  sc.score, lab.b
                FROM sc JOIN lab USING (doc_id))
        SELECT source, bin, CAST(count(*) AS BIGINT) n_docs,
          CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) n_pos,
          CAST(min(score) AS BIGINT) min_score,
          CAST(max(score) AS BIGINT) max_score,
          CAST(sum(score) AS BIGINT) sum_score
        FROM j GROUP BY 1, 2 ORDER BY source, bin""")),

    // q251: day-of-week seasonality index per event type — the
    // PERIODICITY-PROFILE read next to q225's lag-7 autocorrelation:
    // q225 says "there is a weekly cycle", this table says WHICH days
    // carry it (index > 1 = overrepresented dow), the signal monitoring
    // panels need to avoid reading weekend troughs as drift. dow =
    // day-number mod 7 with day 0 = 1970-01-01 (a Thursday) — pure
    // integer arithmetic, no library dow convention to disagree on.
    // Denominators come from each type's DENSE calendar span (a dow with
    // zero events still contributes its days), the q229 zero-observation
    // stance. All integer: the index ships as exact num/den plus its
    // micro quotient. One corpus count shuffle; everything after is
    // day-grid-sized.
    QueryDef("q251_dow_seasonality",
      (s, d) => {
        // cut: the day-grid-sized count table feeds span and cdow — one
        // corpus scan, not two (the collapsed-frame staging line)
        val daily = graft.operators.Checkpoints.cut(ev(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
              .cast("long").as("dd"))
          .agg(count(lit(1)).as("c")))
        val span = daily.groupBy("event_type")
          .agg(min("dd").as("lo"), max("dd").as("hi"), sum("c").as("c_t"))
        val dows = span
          .select(col("event_type"), col("c_t"),
            (col("hi") - col("lo") + 1L).as("d_t"),
            explode(sequence(col("lo"), col("hi"))).as("dd"))
          .groupBy(col("event_type"), col("c_t"), col("d_t"),
            pmod(col("dd"), lit(7L)).as("dow"))
          .agg(count(lit(1)).as("d_td"))
        val cdow = daily
          .groupBy(col("event_type"), pmod(col("dd"), lit(7L)).as("dow"))
          .agg(sum("c").as("c_td"))
        val res = dows.join(cdow, Seq("event_type", "dow"), "left")
          .select(col("event_type"), col("dow"),
            coalesce(col("c_td"), lit(0L)).as("c_td"), col("d_td"),
            col("c_t"), col("d_t"))
          .withColumn("idx_micro",
            expr("c_td * d_t * 1000000 div (d_td * c_t)"))
          .orderBy("event_type", "dow")
        graft.operators.Checkpoints.sealAndRelease(res, daily)
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd,
            count(*) c FROM events GROUP BY 1, 2),
          span AS (SELECT event_type, min(dd) lo, max(dd) hi,
              CAST(sum(c) AS BIGINT) c_t FROM daily GROUP BY 1),
          dows AS (SELECT event_type, c_t, hi - lo + 1 d_t, dd % 7 dow,
              CAST(count(*) AS BIGINT) d_td
            FROM (SELECT event_type, c_t, lo, hi,
                unnest(generate_series(lo, hi)) dd FROM span)
            GROUP BY 1, 2, 3, 4),
          cdow AS (SELECT event_type, dd % 7 dow, CAST(sum(c) AS BIGINT) c_td
            FROM daily GROUP BY 1, 2)
        SELECT dows.event_type, CAST(dows.dow AS BIGINT) dow,
          coalesce(cdow.c_td, 0) c_td, d_td, c_t, CAST(d_t AS BIGINT) d_t,
          CAST(coalesce(cdow.c_td, 0) * d_t * 1000000 // (d_td * c_t)
            AS BIGINT) idx_micro
        FROM dows LEFT JOIN cdow
          ON cdow.event_type = dows.event_type AND cdow.dow = dows.dow
        ORDER BY 1, 2""")),

    // q252: single change-point per event type by binary segmentation —
    // the POINT estimate next to q229's CUSUM trajectories (CUSUM says
    // "a level shift is accumulating", this says WHERE): over the dense
    // (type, day) grid, the split k maximizing the between-segment
    // variance reduction, score(k) = (s₁n₂ − s₂n₁)²/(n₁n₂·n·σ̂²)-
    // monotone ⇔ maximizing (s₁n₂ − s₂n₁)²/(n₁n₂) — the standard CUSUM-
    // statistic square. The difference d = s₁n₂ − s₂n₁ is EXACT int64;
    // both engines then form round(d²/(n₁n₂), 6) from identical integers
    // (same IEEE multiply + divide), so the argmax and its (score DESC,
    // day ASC) tiebreak replay bit-for-bit. Two cumulative windows per
    // type over day-grid rows; the corpus pays one count shuffle.
    QueryDef("q252_changepoint",
      (s, d) => {
        // cut: the count table feeds the span agg and the dense join —
        // one corpus scan (the collapsed-frame staging line)
        val daily = graft.operators.Checkpoints.cut(ev(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
              .cast("long").as("dd"))
          .agg(count(lit(1)).as("c")))
        val dense = daily.groupBy("event_type")
          .agg(min("dd").as("lo"), max("dd").as("hi"))
          .select(col("event_type"),
            explode(sequence(col("lo"), col("hi"))).as("dd"))
          .join(daily, Seq("event_type", "dd"), "left")
          .select(col("event_type"), col("dd"),
            coalesce(col("c"), lit(0L)).as("c"))
        val wOrd = Window.partitionBy("event_type").orderBy("dd")
        val wAll = Window.partitionBy("event_type")
        val scored = dense
          .withColumn("s1", sum("c").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n1", row_number().over(wOrd).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("st", sum("c").over(wAll))
          .filter(col("n1") < col("n"))
          .withColumn("n2", col("n") - col("n1"))
          .withColumn("s2", col("st") - col("s1"))
          .withColumn("dv",
            (col("s1") * col("n2") - col("s2") * col("n1")).cast("double"))
          .withColumn("score",
            round(col("dv") * col("dv") / (col("n1") * col("n2")), 6))
        val res = scored
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type")
              .orderBy(col("score").desc, col("dd"))))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("dd").as("split_dd"),
            col("n1"), col("n2"), col("s1"), col("s2"), col("score"))
          .orderBy("event_type")
        graft.operators.Checkpoints.sealAndRelease(res, daily)
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd,
            count(*) c FROM events GROUP BY 1, 2),
          span AS (SELECT event_type, min(dd) lo, max(dd) hi
            FROM daily GROUP BY 1),
          dense AS (SELECT s.event_type, s.dd, coalesce(daily.c, 0) c
            FROM (SELECT event_type, unnest(generate_series(lo, hi)) dd
                  FROM span) s
            LEFT JOIN daily
              ON daily.event_type = s.event_type AND daily.dd = s.dd),
          w AS (SELECT event_type, dd,
              CAST(sum(c) OVER (PARTITION BY event_type ORDER BY dd
                ROWS UNBOUNDED PRECEDING) AS BIGINT) s1,
              CAST(row_number() OVER (PARTITION BY event_type ORDER BY dd)
                AS BIGINT) n1,
              CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) n,
              CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) st
            FROM dense),
          sc AS (SELECT event_type, dd, n1, n - n1 n2, s1, st - s1 s2,
              round(CAST(s1 * (n - n1) - (st - s1) * n1 AS DOUBLE)
                * CAST(s1 * (n - n1) - (st - s1) * n1 AS DOUBLE)
                / (n1 * (n - n1)), 6) score
            FROM w WHERE n1 < n)
        SELECT event_type, dd split_dd, n1, n2, s1, s2, score FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY score DESC, dd) rn FROM sc) t
        WHERE rn = 1 ORDER BY event_type""")),

    // q254: rolling robust outliers — per (type, day), the trailing
    // 7-day median and MAD of daily volume, flagging |c − med| > 3·MAD.
    // The ROLLING form of q159's static per-source MAD gate: a monitor
    // that adapts to level shifts within a week instead of comparing
    // against an all-time distribution. Exactly integral throughout: a
    // 7-value window has an odd count, so both medians are order
    // statistics (no interpolated halves to carry), and the flag is
    // pure int64 comparison. The 7-day window is DECOMPOSED to an
    // equi-join (each day explodes to the 7 target days it serves —
    // the q219 bucket stance, no non-equi day join anywhere); the
    // oracle states the DIRECT `BETWEEN` form, so the hash-match is
    // the decomposition-changes-nothing proof. Grid-sized past the one
    // corpus count shuffle; only full 7-day windows emit.
    QueryDef("q254_rolling_robust_outliers",
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
              .cast("long").as("dd"))
          .agg(count(lit(1)).as("c"))
        val dense = graft.operators.Checkpoints.cut(
          daily.groupBy("event_type")
            .agg(min("dd").as("lo"), max("dd").as("hi"))
            .select(col("event_type"),
              explode(sequence(col("lo"), col("hi"))).as("dd"))
            .join(daily, Seq("event_type", "dd"), "left")
            .select(col("event_type"), col("dd"),
              coalesce(col("c"), lit(0L)).as("c")))
        // each source day serves targets dd+0..dd+6 → trailing window
        // via pure equi-join on (type, target day)
        val contrib = graft.operators.Checkpoints.cut(
          dense.withColumn("o", explode(sequence(lit(0L), lit(6L))))
            .select(col("event_type"), (col("dd") + col("o")).as("dt"),
              col("c").as("cj")))
        val med = contrib.groupBy("event_type", "dt")
          .agg(count(lit(1)).as("nw"),
            expr("CAST(median(cj) AS BIGINT)").as("med"))
          .filter(col("nw") === 7)
        val mad = contrib.join(med, Seq("event_type", "dt"))
          .withColumn("dev", abs(col("cj") - col("med")))
          .groupBy("event_type", "dt", "med")
          .agg(expr("CAST(median(dev) AS BIGINT)").as("mad"))
        val res = mad
          .join(dense.select(col("event_type"), col("dd").as("dt"),
            col("c")), Seq("event_type", "dt"))
          .select(col("event_type"), col("dt").as("dd"), col("c"),
            col("med"), col("mad"),
            (abs(col("c") - col("med")) > lit(3L) * col("mad"))
              .as("is_out"))
          .orderBy("event_type", "dd")
        graft.operators.Checkpoints.sealAndRelease(res, dense, contrib)
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd,
            count(*) c FROM events GROUP BY 1, 2),
          span AS (SELECT event_type, min(dd) lo, max(dd) hi
            FROM daily GROUP BY 1),
          dense AS (SELECT s.event_type, s.dd, coalesce(daily.c, 0) c
            FROM (SELECT event_type, unnest(generate_series(lo, hi)) dd
                  FROM span) s
            LEFT JOIN daily
              ON daily.event_type = s.event_type AND daily.dd = s.dd),
          w AS (SELECT t.event_type, t.dd, src.c cj
            FROM dense t JOIN dense src
              ON src.event_type = t.event_type
              AND src.dd BETWEEN t.dd - 6 AND t.dd),
          m AS (SELECT event_type, dd, count(*) nw,
              CAST(median(cj) AS BIGINT) med
            FROM w GROUP BY 1, 2),
          mv AS (SELECT event_type, dd, med FROM m WHERE nw = 7),
          md AS (SELECT w.event_type, w.dd, mv.med,
              CAST(median(abs(w.cj - mv.med)) AS BIGINT) mad
            FROM w JOIN mv ON mv.event_type = w.event_type
              AND mv.dd = w.dd
            GROUP BY 1, 2, 3)
        SELECT md.event_type, md.dd, dn.c, md.med, md.mad,
          abs(dn.c - md.med) > 3 * md.mad is_out
        FROM md JOIN dense dn
          ON dn.event_type = md.event_type AND dn.dd = md.dd
        ORDER BY 1, 2""")),

    // q261: deterministic Poisson bootstrap — the distributed form of
    // "how sure are we about this corpus mean": 100 resamples where each
    // doc's multiplicity is drawn Poisson(1) from a per-(resample, doc)
    // md5 value against the fixed cumulative thresholds ⌊10⁶·F(k)⌋ =
    // 367879/735758/919698/981011/996340 (the classical Poisson
    // bootstrap — Chamandy et al., "Estimating Uncertainty for Massive
    // Data Streams", the only bootstrap that needs no global n and no
    // coordination, hence THE 100 TB resampling scheme). Output = the
    // full bootstrap distribution of the mean-n_chars statistic as
    // exact integers (the CI is any percentile read of these 100 rows).
    // Map-side ×100 explode, one (resample) agg — no shuffle of docs.
    QueryDef("q261_bootstrap_ci",
      (s, d) => {
        val u = TextFns.hash32(concat(lit("boot:"), col("b").cast("string"),
          lit(":"), col("doc_id").cast("string"))) % lit(1000000L)
        val m = when(col("u") < 367879L, 0L)
          .when(col("u") < 735758L, 1L)
          .when(col("u") < 919698L, 2L)
          .when(col("u") < 981011L, 3L)
          .when(col("u") < 996340L, 4L)
          .otherwise(5L)
        docs(s, d).select(col("doc_id"), col("n_chars"))
          .withColumn("b", explode(sequence(lit(0L), lit(99L))))
          .withColumn("u", u)
          .withColumn("m", m)
          .filter(col("m") > 0L)
          .groupBy("b")
          .agg(sum("m").as("n_eff"),
            sum(col("m") * col("n_chars")).as("sum_val"))
          .withColumn("mean_micro", expr("sum_val * 1000000 div n_eff"))
          .orderBy("b")
      },
      Some("""WITH x AS (SELECT doc_id, n_chars, unnest(generate_series(0, 99)) b
          FROM documents),
        h AS (SELECT b, n_chars,
            ('0x' || substr(md5('boot:' || CAST(b AS VARCHAR) || ':'
              || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 u
          FROM x),
        mm AS (SELECT b, n_chars,
            CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
              WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
              WHEN u < 996340 THEN 4 ELSE 5 END m
          FROM h)
        SELECT b, CAST(sum(m) AS BIGINT) n_eff,
          CAST(sum(m * n_chars) AS BIGINT) sum_val,
          CAST(sum(m * n_chars) * 1000000 // sum(m) AS BIGINT) mean_micro
        FROM mm WHERE m > 0 GROUP BY b ORDER BY b""")),

    // q262: A/B experiment readout as the exact 2×2 χ² — users hash-split
    // into variants (the q75 stance: a user keeps their arm forever),
    // outcome = "more purchases than errors" (every synthetic user has
    // every event type, so a ≥1 definition saturates). The readout ships
    // the four cells, n, the exact determinant dv = ad − bc, and the
    // FOUR MARGINALS (each ≤ n, exact int64) in place of their n⁴/16
    // product (ADVICE r17); χ² itself rides doubles with a pinned op
    // order (see inline notes). One user-grain aggregate (corpus → users
    // is the only shuffle); the readout is one row.
    QueryDef("q262_ab_readout",
      (s, d) => {
        val users = ev(s, d)
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
            sum(when(col("event_type") === "error", 1L).otherwise(0L)))
            .cast("long").as("conv"))
          .withColumn("arm",
            when(TextFns.hash32(concat(lit("arm:"),
              col("user_id").cast("string"))) % 2L === 0L, "A").otherwise("B"))
        val cells = users.groupBy("arm")
          .agg(count(lit(1)).as("n"), sum("conv").as("c"))
        cells.select(
            sum(when(col("arm") === "A", col("c"))).as("a_conv"),
            sum(when(col("arm") === "A", col("n") - col("c"))).as("a_not"),
            sum(when(col("arm") === "B", col("c"))).as("b_conv"),
            sum(when(col("arm") === "B", col("n") - col("c"))).as("b_not"))
          .select(col("a_conv"), col("a_not"), col("b_conv"), col("b_not"),
            (col("a_conv") + col("a_not") + col("b_conv") + col("b_not"))
              .as("n_users"),
            (col("a_conv") * col("b_not") - col("a_not") * col("b_conv"))
              .as("dv"),
            // the four MARGINALS ship exact (each ≤ n_users) instead of
            // their int64 product — (ra·rb·ca·cb) ~ n⁴/16 wraps silently
            // past ~110k users (ADVICE r17); any consumer wanting the
            // denominator multiplies in its own width. dv itself is the
            // one remaining product: |dv| ≤ n²/4, exact to n ≈ 6×10⁹.
            (col("a_conv") + col("a_not")).as("m_a"),
            (col("b_conv") + col("b_not")).as("m_b"),
            (col("a_conv") + col("b_conv")).as("m_conv"),
            (col("a_not") + col("b_not")).as("m_not"))
          // n·dv² overflows int64 two orders of magnitude before the
          // denominator does, so the statistic itself rides doubles with
          // a pinned op order — numerator n·dv·dv and denominator
          // ((ma·mb)·mc)·md both left-assoc from the same exact longs,
          // identical IEEE sequences both engines
          .withColumn("chi2_r6", round(col("n_users").cast("double") *
            col("dv") * col("dv") /
            (col("m_a").cast("double") * col("m_b") * col("m_conv") *
              col("m_not")), 6))
      },
      Some("""WITH u AS (SELECT user_id,
            CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              > sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END conv,
            CASE WHEN ('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
              % 2 = 0 THEN 'A' ELSE 'B' END arm
          FROM events GROUP BY user_id),
        cells AS (SELECT
            CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) a_conv,
            CAST(sum(CASE WHEN arm = 'A' THEN 1 - conv ELSE 0 END) AS BIGINT) a_not,
            CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) b_conv,
            CAST(sum(CASE WHEN arm = 'B' THEN 1 - conv ELSE 0 END) AS BIGINT) b_not
          FROM u)
        SELECT a_conv, a_not, b_conv, b_not,
          a_conv + a_not + b_conv + b_not AS n_users,
          a_conv * b_not - a_not * b_conv AS dv,
          a_conv + a_not AS m_a, b_conv + b_not AS m_b,
          a_conv + b_conv AS m_conv, a_not + b_not AS m_not,
          round(CAST(a_conv + a_not + b_conv + b_not AS DOUBLE)
            * (a_conv * b_not - a_not * b_conv)
            * (a_conv * b_not - a_not * b_conv)
            / (CAST(a_conv + a_not AS DOUBLE) * (b_conv + b_not)
               * (a_conv + b_conv) * (a_not + b_not)), 6) AS chi2_r6
        FROM cells""")),

    // q265: vocabulary coverage curve — "how many types cover 50 / 90 /
    // 99 / 99.9 % of all tokens": the truncation read behind every
    // vocab-size decision (a tokenizer or feature hasher keeps the head;
    // this table says exactly where the head ends). Types rank by
    // (count DESC, token); each threshold reports the FIRST rank whose
    // cumulative share crosses it, all integer (1000·cum vs t·total —
    // no division). The rank window rides the vocabulary-sized count
    // table (Heap's-law bounded — the q179 stance), never the corpus.
    QueryDef("q265_coverage_curve",
      (s, d) => {
        val c = docs(s, d)
          .select(explode(TextFns.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val win = Window.orderBy(col("c").desc, col("w"))
        c.withColumn("rnk", row_number().over(win).cast("long"))
          .withColumn("cum", sum("c").over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tot", sum("c").over(
            Window.partitionBy(lit(1))))
          .withColumn("t",
            explode(array(lit(500L), lit(900L), lit(990L), lit(999L))))
          .filter(lit(1000L) * col("cum") >= col("t") * col("tot") &&
            lit(1000L) * (col("cum") - col("c")) < col("t") * col("tot"))
          .select(col("t").as("threshold_pm"), col("rnk").as("n_types"),
            col("w").as("boundary_token"), col("cum").as("cum_tokens"),
            col("tot").as("total_tokens"))
          .orderBy("threshold_pm")
      },
      Some(s"""WITH t AS (SELECT unnest($OToks) w FROM documents),
        c AS (SELECT w, count(*) c FROM t GROUP BY 1),
        r AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) rnk,
            sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) cum,
            sum(c) OVER () tot FROM c),
        th AS (SELECT unnest([500, 900, 990, 999]) t)
        SELECT CAST(th.t AS BIGINT) threshold_pm, CAST(rnk AS BIGINT) n_types,
          w boundary_token, CAST(cum AS BIGINT) cum_tokens,
          CAST(tot AS BIGINT) total_tokens
        FROM r JOIN th ON 1000 * cum >= th.t * tot
          AND 1000 * (cum - c) < th.t * tot
        ORDER BY threshold_pm""")),

    // q267: cross-correlation of daily volumes between event-type PAIRS
    // at lags −7..7 — the lead-lag read q225's AUTOcorrelation can't
    // give: "do error spikes LEAD purchase drops, and by how many
    // days?" — the incident-correlation question monitoring actually
    // asks. Same dense day grid, both series joined at each lag over
    // the SHARED day span; integer Pearson numerator/denominator pairs
    // (the q225 stance, no float anywhere). Grid-sized: pairs × 15 lag
    // rows past the one count shuffle.
    QueryDef("q267_cross_correlation",
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
              .cast("long").as("dd"))
          .agg(count(lit(1)).as("c"))
        val dense = graft.operators.Checkpoints.cut(
          daily.groupBy("event_type")
            .agg(min("dd").as("lo"), max("dd").as("hi"))
            .select(col("event_type"),
              explode(sequence(col("lo"), col("hi"))).as("dd"))
            .join(daily, Seq("event_type", "dd"), "left")
            .select(col("event_type"), col("dd"),
              coalesce(col("c"), lit(0L)).as("c")))
        val a = dense
          .select(col("event_type").as("ta"), col("dd"), col("c").as("x"))
          .withColumn("lag", explode(sequence(lit(-7L), lit(7L))))
        val b = dense.select(col("event_type").as("tb"),
          col("dd").as("db"), col("c").as("y"))
        val res = a.join(b,
            col("ta") < col("tb") && col("db") === col("dd") + col("lag"))
          .groupBy(col("ta"), col("tb"), col("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("ta"), col("tb"), col("lag"), col("n_pairs"),
            (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
              .as("cc_num"),
            (col("n_pairs") * col("sxx") - col("sx") * col("sx"))
              .as("den_x"),
            (col("n_pairs") * col("syy") - col("sy") * col("sy"))
              .as("den_y"))
          .orderBy("ta", "tb", "lag")
        graft.operators.Checkpoints.sealAndRelease(res, dense)
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) dd,
            count(*) c FROM events GROUP BY 1, 2),
          span AS (SELECT event_type, min(dd) lo, max(dd) hi
            FROM daily GROUP BY 1),
          dense AS (SELECT s.event_type, s.dd, coalesce(daily.c, 0) c
            FROM (SELECT event_type, unnest(generate_series(lo, hi)) dd
                  FROM span) s
            LEFT JOIN daily
              ON daily.event_type = s.event_type AND daily.dd = s.dd),
          lags AS (SELECT unnest(generate_series(-7, 7)) lag),
          pr AS (SELECT a.event_type ta, b.event_type tb, l.lag,
              a.c x, b.c y
            FROM dense a CROSS JOIN lags l
            JOIN dense b ON a.event_type < b.event_type
              AND b.dd = a.dd + l.lag)
        SELECT ta, tb, CAST(lag AS BIGINT) lag,
          CAST(count(*) AS BIGINT) n_pairs,
          CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) cc_num,
          CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) den_x,
          CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) den_y
        FROM pr GROUP BY 1, 2, 3 ORDER BY ta, tb, lag""")),

    // q277: mixture diversity — the Hill number of order 2 over source
    // token shares, "how many EFFECTIVE sources is this corpus really
    // drawing from": D₂ = 1/Σp² = tot²/Σn², the log-free diversity
    // index (the q179/q174 Simpson stance — Shannon needs ln, D₂
    // doesn't), with its per-source dominance table. A 20-source corpus
    // where one source holds 80 % of tokens has D₂ ≈ 1.5 — the single
    // number a mixture dashboard tracks. Σn² ships exact int64; the
    // effective count is one pinned double division chain (tot·tot/Σn²,
    // left-assoc both engines) since tot² outgrows int64 two orders of
    // magnitude before Σn² does.
    QueryDef("q277_mixture_diversity",
      (s, d) => {
        val srcN = docs(s, d)
          .select(col("source"), size(TextFns.tokens(col("text")))
            .cast("long").as("nt"))
          .groupBy("source").agg(sum("nt").as("n"))
        srcN.agg(count(lit(1)).as("n_sources"),
            sum("n").as("tot"), sum(col("n") * col("n")).as("sum_sq"),
            max("n").as("max_n"))
          .withColumn("d2_r6",
            round(col("tot").cast("double") * col("tot") / col("sum_sq"), 6))
          .withColumn("dominance_micro", expr("max_n * 1000000 div tot"))
      },
      Some(s"""WITH sn AS (SELECT source, CAST(sum(len($OToks)) AS BIGINT) n
          FROM documents GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) n_sources,
          CAST(sum(n) AS BIGINT) tot,
          CAST(sum(n * n) AS BIGINT) sum_sq,
          CAST(max(n) AS BIGINT) max_n,
          round(CAST(sum(n) AS DOUBLE) * sum(n) / sum(n * n), 6) d2_r6,
          CAST(max(n) * 1000000 // sum(n) AS BIGINT) dominance_micro
        FROM sn"""))
,

    // q285: Brier-score census for the Murphy decomposition — the
    // PROPER-scoring-rule rung of the eval family (q178/q230 rank,
    // q227/q211 threshold, q182/q248 calibrate; Brier scores the
    // PROBABILITIES themselves, Brier 1950, and Murphy 1973 splits it
    // into reliability − resolution + uncertainty): the q182 classifier
    // score squashed to a probability on the MILLI grid (p = clamp(500
    // + score div 40, 0, 1000) — integer ops only; milli, not micro, so
    // the squared sums stay int64 to ~9×10¹² docs, the 100 TB bound),
    // then per probability-bin the exact census every Murphy term is a
    // consumer division away from: n, positives, Σp, Σp² (within-bin
    // variance — the generalized-decomposition term binning hides), and
    // the exact Brier numerator Σ(p − 1000·y)². Same scan envelope as
    // q182 (instance explode + single-column label pass).
    QueryDef("q285_brier_census",
      (s, d) => {
        // r21: one corpus scan, label below the explode, broadcast weight
        // lookup, hash-aggregatable per-doc agg — see classifierScoreFrame
        classifierScoreFrame(s, d, withSource = false)
          .withColumn("p", least(greatest(
            lit(500L) + expr("score div 40L"), lit(0L)), lit(1000L)))
          .withColumn("y", when(col("b"), 1000L).otherwise(0L))
          .withColumn("bin", least(expr("p div 50L"), lit(19L)))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("b"), 1L).otherwise(0L)).as("n_pos"),
            sum("p").as("sum_p"),
            sum(col("p") * col("p")).as("sum_p2"),
            sum((col("p") - col("y")) * (col("p") - col("y")))
              .as("brier_num"))
          .orderBy("bin")
      },
      Some(s"""WITH x AS (SELECT doc_id, $OToks t FROM documents),
          f AS (SELECT doc_id, unnest(t ||
                  [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) feat
                FROM x),
          sc AS (SELECT doc_id, sum(
                  ('0x' || substr(md5('w:' || CAST(
                    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096
                  AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS score
                FROM f GROUP BY doc_id),
          lab AS (SELECT doc_id,
                  (4000 * len(list_distinct(t))
                   + 3000 * (len(t) - len(list_filter(t, q -> q IN ('the','a'))))
                   + 30 * least(len(t), 100) * len(t)) >= 6200 * len(t) AS b
                FROM x),
          j AS (SELECT least(greatest(500 + sc.score // 40, 0), 1000) p,
                  CASE WHEN lab.b THEN 1000 ELSE 0 END y, lab.b
                FROM sc JOIN lab USING (doc_id))
        SELECT CAST(least(p // 50, 19) AS BIGINT) bin,
          CAST(count(*) AS BIGINT) n_docs,
          CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) n_pos,
          CAST(sum(p) AS BIGINT) sum_p,
          CAST(sum(p * p) AS BIGINT) sum_p2,
          CAST(sum((p - y) * (p - y)) AS BIGINT) brier_num
        FROM j GROUP BY 1 ORDER BY 1""")),

    // q286: Kendall τ-b between document length and token count, per
    // source — the RANK-association companion to q207's Spearman:
    // Spearman correlates the ranks (one squared-distance pass), τ-b
    // counts CONCORDANT vs DISCORDANT pairs with the tie corrections —
    // the statistic behind "do these two quality signals order the
    // corpus the same way", more robust to the handful of wild pairs a
    // rank-difference square amplifies. All-integer: (nc, ndis, ties_x,
    // ties_y, ties_xy, n) per source; τ-b = (nc − ndis)/√((n₀−tx)(n₀−ty))
    // is the consumer's one sqrt. Shape: the pair enumeration is an
    // equi-join ON SOURCE (never a corpus cross) — per-source-quadratic
    // like the q249 eval-slice contract, the right tool ONLY at
    // eval-slice cardinality. THE CORPUS-SCALE PATH IS q297
    // ([[graft.operators.Concordance.kendallCensus]], proven ≡ this
    // census at the driver gate — the q37→q126 delegation stance): this
    // all-pairs form stays registered as the READABLE DEFINITION and
    // the eval-slice tool; corpus callers route to kendallCensus, whose
    // ⌈log₂ n⌉ window levels replace the quadratic join (SCALING.md
    // q286/q297 rows).
    QueryDef("q286_kendall_tau",
      (s, d) => {
        val base = docs(s, d).select(col("source"), col("doc_id"),
          col("n_chars").as("x"),
          size(TextFns.tokens(col("text"))).cast("long").as("y"))
        val pairs = base.as("a").join(base.as("b"),
            col("a.source") === col("b.source") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.source").as("source"),
            ((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")))
              .as("prod"),
            (col("a.x") === col("b.x")).as("tx"),
            (col("a.y") === col("b.y")).as("ty"))
        pairs.groupBy("source")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("prod") > 0L, 1L).otherwise(0L)).as("nc"),
            sum(when(col("prod") < 0L, 1L).otherwise(0L)).as("ndis"),
            sum(when(col("tx") && !col("ty"), 1L).otherwise(0L)).as("ties_x"),
            sum(when(col("ty") && !col("tx"), 1L).otherwise(0L)).as("ties_y"),
            sum(when(col("tx") && col("ty"), 1L).otherwise(0L)).as("ties_xy"))
          .orderBy("source")
      },
      Some(s"""WITH base AS (SELECT source, doc_id, n_chars x,
            CAST(len($OToks) AS BIGINT) y FROM documents)
        SELECT a.source AS source, CAST(count(*) AS BIGINT) n_pairs,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) nc,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END)
            AS BIGINT) ndis,
          CAST(sum(CASE WHEN a.x = b.x AND a.y != b.y THEN 1 ELSE 0 END)
            AS BIGINT) ties_x,
          CAST(sum(CASE WHEN a.y = b.y AND a.x != b.x THEN 1 ELSE 0 END)
            AS BIGINT) ties_y,
          CAST(sum(CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END)
            AS BIGINT) ties_xy
        FROM base a JOIN base b
          ON a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY 1 ORDER BY 1""")),

    // q306: MANN–KENDALL trend test on the daily event series per type —
    // the nonparametric "is activity trending?" significance companion
    // to q186's OLS slope and q242's Theil–Sen estimator (Mann 1945,
    // Kendall's S = C − D over (day, count) pairs; the test the trend
    // family reports next to its slope). Pure REUSE of the q297
    // machinery: one day-grain aggregate feeds
    // [[graft.operators.Concordance.kendallCensus]] with x = day index
    // (unique per group ⇒ ties_x = ties_xy = 0 structurally), y = daily
    // count; S ships exact int64 alongside the full census so the
    // consumer has the tie-corrected variance terms. Oracle: the
    // all-pairs SQL over the (tiny) day grid — the gate again proves
    // the O(n log n) path against the quadratic definition.
    QueryDef("q306_mann_kendall_trend",
      (s, d) => graft.operators.Concordance.kendallCensus(
          ev(s, d).groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1995-01-01").cast("date"))
                .cast("long").as("x"))
            .agg(count(lit(1)).as("y"))
            .withColumn("id", col("x")),
          "event_type", "id", "x", "y")
        .withColumn("s_stat", col("nc") - col("ndis"))
        .orderBy("event_type"),
      Some("""WITH daily AS (SELECT event_type,
            CAST(datediff('day', DATE '1995-01-01', CAST(ts AS DATE))
              AS BIGINT) x,
            CAST(count(*) AS BIGINT) y
          FROM events GROUP BY 1, 2)
        SELECT a.event_type AS event_type, CAST(count(*) AS BIGINT) n_pairs,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) nc,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END)
            AS BIGINT) ndis,
          CAST(sum(CASE WHEN a.x = b.x AND a.y != b.y THEN 1 ELSE 0 END)
            AS BIGINT) ties_x,
          CAST(sum(CASE WHEN a.y = b.y AND a.x != b.x THEN 1 ELSE 0 END)
            AS BIGINT) ties_y,
          CAST(sum(CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END)
            AS BIGINT) ties_xy,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END)
            - sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END)
            AS BIGINT) s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.x < b.x
        GROUP BY 1 ORDER BY 1""")),

    // q307: KUIPER hour-of-day drift between the user halves per event
    // type — the CYCLIC-axis leg of the between-halves panel (q177 KS /
    // q237 CvM / q243 U on linear axes): V = D⁺ + D⁻ is invariant to
    // where the 24-hour cycle is cut, so a diurnal shift scores the same
    // whether it straddles midnight or noon — the statistic a daily-cycle
    // monitor wants (Kuiper 1960). Exact integer numerators over the
    // ≤24-value grid via [[graft.operators.Drift.kuiperBetweenCounts]];
    // one (type, half, hour) count shuffle is the only corpus-sized work.
    QueryDef("q307_kuiper_hour_drift",
      (s, d) => {
        val counts = graft.operators.Checkpoints.cut(
          ev(s, d).select(col("event_type"),
              (col("user_id") % 2 === 0).as("fh"),
              hour(col("ts")).cast("long").as("v"))
            .groupBy("event_type", "fh", "v").agg(count(lit(1)).as("c")))
        val a = counts.filter(col("fh")).select("event_type", "v", "c")
        val b = counts.filter(!col("fh")).select("event_type", "v", "c")
        graft.operators.Checkpoints.sealAndRelease(
          graft.operators.Drift
            .kuiperBetweenCounts(a, b, "event_type", "v", "c")
            .orderBy("event_type"),
          counts)
      },
      Some("""WITH base AS (SELECT event_type, (user_id % 2 = 0) fh,
            CAST(hour(ts) AS BIGINT) v FROM events),
          pa AS (SELECT event_type, v, count(*) ca FROM base WHERE fh
            GROUP BY 1, 2),
          pb AS (SELECT event_type, v, count(*) cb FROM base WHERE NOT fh
            GROUP BY 1, 2),
          m AS (SELECT coalesce(pa.event_type, pb.event_type) event_type,
              coalesce(pa.v, pb.v) v, coalesce(ca, 0) ca, coalesce(cb, 0) cb
            FROM pa FULL JOIN pb
              ON pa.event_type = pb.event_type AND pa.v = pb.v),
          cum AS (SELECT event_type,
              sum(ca) OVER (PARTITION BY event_type ORDER BY v
                ROWS UNBOUNDED PRECEDING) sa,
              sum(cb) OVER (PARTITION BY event_type ORDER BY v
                ROWS UNBOUNDED PRECEDING) sb,
              sum(ca) OVER (PARTITION BY event_type) na,
              sum(cb) OVER (PARTITION BY event_type) nb
            FROM m)
        SELECT event_type,
          CAST(max(sa * nb - sb * na) + max(sb * na - sa * nb) AS BIGINT)
            kuiper_num,
          CAST(max(sa * nb - sb * na) AS BIGINT) d_plus,
          CAST(max(sb * na - sa * nb) AS BIGINT) d_minus,
          CAST(max(na) AS BIGINT) n_a, CAST(max(nb) AS BIGINT) n_b
        FROM cum GROUP BY 1 ORDER BY 1""")),

    // q309: Kendall CO-MOVEMENT matrix between event types — the
    // rank-based companion to q267's lagged cross-correlation: for every
    // type pair, the τ-b census of their day-aligned daily volumes ("do
    // errors rise on the days purchases rise?" asked robustly — τ sees
    // monotone co-movement, not linear scale). Day-inner-join alignment
    // (both types active); the census rides the q297 O(n log n)
    // machinery with x = type-a count, y = type-b count, id = day.
    // Output one row per unordered pair, all seven census terms exact
    // int64; the oracle replays the all-pairs definition per pair.
    QueryDef("q309_kendall_comovement",
      (s, d) => {
        val daily = ev(s, d).groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1995-01-01").cast("date"))
              .cast("long").as("day"))
          .agg(count(lit(1)).as("y"))
        val paired = daily.as("a").join(daily.as("b"),
            col("a.day") === col("b.day") &&
              col("a.event_type") < col("b.event_type"))
          .select(concat(col("a.event_type"), lit(">"), col("b.event_type"))
              .as("pair"),
            col("a.day").as("id"), col("a.y").as("x"), col("b.y").as("y"))
        graft.operators.Concordance
          .kendallCensus(paired, "pair", "id", "x", "y")
          .orderBy("pair")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(datediff('day', DATE '1995-01-01', CAST(ts AS DATE))
              AS BIGINT) d,
            CAST(count(*) AS BIGINT) y FROM events GROUP BY 1, 2),
          paired AS (SELECT a.event_type || '>' || b.event_type pair,
              a.d d, a.y x, b.y y
            FROM daily a JOIN daily b
              ON a.d = b.d AND a.event_type < b.event_type)
        SELECT a.pair AS pair, CAST(count(*) AS BIGINT) n_pairs,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) nc,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END)
            AS BIGINT) ndis,
          CAST(sum(CASE WHEN a.x = b.x AND a.y != b.y THEN 1 ELSE 0 END)
            AS BIGINT) ties_x,
          CAST(sum(CASE WHEN a.y = b.y AND a.x != b.x THEN 1 ELSE 0 END)
            AS BIGINT) ties_y,
          CAST(sum(CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END)
            AS BIGINT) ties_xy
        FROM paired a JOIN paired b
          ON a.pair = b.pair AND a.d < b.d
        GROUP BY 1 ORDER BY 1""")),

    // q297: q286's Kendall τ-b census at CORPUS scale — the O(n log n)
    // inversion-count path (r18 directive #5). q286's per-source pair
    // self-join is quadratic in the group (honest under its eval-slice
    // contract); this is the same seven-column census with ndis counted
    // as merge-sort inversions of the y-sequence in (x, y) order
    // (Knight, JASA 1966) via ⌈log₂ n⌉ binary-doubling window levels,
    // and the tie terms from three value-grain aggregates — see
    // [[graft.operators.Concordance.kendallCensus]]. Identical output ⇒
    // the ORACLE IS q286's all-pairs SQL, so the driver gate itself
    // proves O(n log n) ≡ O(n²) on the real corpus (KendallSpec pins the
    // equivalence plus brute-force tie edge cases; SCALING.md carries
    // the 10× near-linear growth row).
    QueryDef("q297_kendall_tau_nlogn",
      (s, d) => graft.operators.Concordance.kendallCensus(
          docs(s, d).select(col("source"), col("doc_id"),
            col("n_chars").as("x"),
            size(TextFns.tokens(col("text"))).cast("long").as("y")),
          "source", "doc_id", "x", "y")
        .orderBy("source"),
      Some(s"""WITH base AS (SELECT source, doc_id, n_chars x,
            CAST(len($OToks) AS BIGINT) y FROM documents)
        SELECT a.source AS source, CAST(count(*) AS BIGINT) n_pairs,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) nc,
          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END)
            AS BIGINT) ndis,
          CAST(sum(CASE WHEN a.x = b.x AND a.y != b.y THEN 1 ELSE 0 END)
            AS BIGINT) ties_x,
          CAST(sum(CASE WHEN a.y = b.y AND a.x != b.x THEN 1 ELSE 0 END)
            AS BIGINT) ties_y,
          CAST(sum(CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END)
            AS BIGINT) ties_xy
        FROM base a JOIN base b
          ON a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY 1 ORDER BY 1""")),

    // q311: Spearman ρ with TEXTBOOK average-rank ties, exact integers
    // (r19 directive #5) — the more common reporting statistic now that
    // Kendall is exact at scale (q297): q207 ships id-tie-broken ranks
    // (documented deviation); this ships the average-rank census the
    // textbooks define, with the .5s cleared by 2×-scaling the ranks
    // (d2x4_sum = 4·Σd²) plus the per-axis tie terms Σ(c³−c), so the
    // consumer's tie-corrected ρ = (Sx + Sy − d2x4/4)/(2√(Sx·Sy)) with
    // 12·Sx = n³−n−tie_x is exact to its one sqrt — see
    // [[graft.operators.Eval.spearmanAvgRankPerGroup]]. Cheaper than
    // Kendall: one groupedTwoPhaseRank per axis + a value-grain
    // aggregate joined back on (source, value) — no merge levels, no
    // pair join. Same (n_chars, token count) axes as q286/q297, so the
    // three rank-association reads are directly comparable.
    QueryDef("q311_spearman_avg_rank",
      (s, d) => graft.operators.Eval.spearmanAvgRankPerGroup(
          docs(s, d).select(col("doc_id"), col("source"), col("n_chars"),
            size(TextFns.tokens(col("text"))).cast("long").as("ytok")),
          "doc_id", "source", "n_chars", "ytok")
        .orderBy("source"),
      Some(s"""WITH b AS (SELECT doc_id, source, n_chars x,
            CAST(len($OToks) AS BIGINT) y FROM documents),
          rx AS (SELECT doc_id, source, x, row_number() OVER
              (PARTITION BY source ORDER BY x, doc_id) rn FROM b),
          ax AS (SELECT source, x, min(rn) + max(rn) r2, count(*) c
            FROM rx GROUP BY 1, 2),
          px AS (SELECT rx.doc_id, rx.source, ax.r2 FROM rx
            JOIN ax ON rx.source = ax.source AND rx.x = ax.x),
          ry AS (SELECT doc_id, source, y, row_number() OVER
              (PARTITION BY source ORDER BY y, doc_id) rn FROM b),
          ay AS (SELECT source, y, min(rn) + max(rn) r2, count(*) c
            FROM ry GROUP BY 1, 2),
          py AS (SELECT ry.doc_id, ry.source, ay.r2 FROM ry
            JOIN ay ON ry.source = ay.source AND ry.y = ay.y),
          tx AS (SELECT source, sum(c*c*c - c) t FROM ax GROUP BY 1),
          ty AS (SELECT source, sum(c*c*c - c) t FROM ay GROUP BY 1),
          dd AS (SELECT px.source, count(*) n,
              sum((px.r2 - py.r2) * (px.r2 - py.r2)) d2
            FROM px JOIN py ON px.doc_id = py.doc_id GROUP BY 1)
        SELECT dd.source AS source, CAST(n AS BIGINT) n,
          CAST(d2 AS BIGINT) d2x4_sum, CAST(tx.t AS BIGINT) tie_x,
          CAST(ty.t AS BIGINT) tie_y
        FROM dd JOIN tx ON dd.source = tx.source
          JOIN ty ON dd.source = ty.source
        ORDER BY source"""))
  )
}
