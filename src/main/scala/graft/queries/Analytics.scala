package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Analytics closure beyond the §2b relational core: reshaping
  * (pivot/unpivot), order statistics, moment aggregates, argmin/argmax,
  * value windows, time-series gap-fill + forward-fill, funnel and cohort
  * analysis, and edit-distance fuzzy matching. All built-ins, all
  * oracle-backed, determinism rules as everywhere (total order, rounded
  * floats, unique tie-breaks).
  */
object Analytics {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  // q161's backfilled table and q162's schema-evolved table, each built
  // ONCE per (session, sf dir) under /tmp — the q147/q103 at-rest-artifact
  // lifecycle: the registered query is then a pure read of table state.
  private val backfillCache = new SessionMemo[String]
  private val evolveCache = new SessionMemo[String]
  private val jdbcCache = new SessionMemo[(String, java.util.Properties)]

  // Top-100 token co-occurrence edges shared by the graph-stats trio
  // (q176 k-core, q187 assortativity, q189 coreness ladder) — the q77
  // memoized-artifact pattern: the per-doc token self-join + count
  // shuffle is the only corpus-sized stage any of them has, so it runs
  // ONCE per (session, sf dir). The memoized value is the COLLECTED
  // top-100 edge list (bounded by construction — a TakeOrdered-to-driver
  // of 100 rows, not a corpus collect), both because the SessionMemo
  // contract forbids caching a Dataset and because a 100-row
  // LocalRelation is the better artifact anyway: no pinned storage
  // blocks, and every consumer join against it broadcasts for free.
  private val coocCache = new SessionMemo[Seq[(String, String)]]

  private[graft] def coocEdges(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val edges = coocCache(s, d) {
      val tok = graft.queries.TextShared.docs(s, d)
        .select(col("doc_id"),
          explode(array_distinct(graft.functions.TextFns.tokens(
            col("text")))).as("w"))
      tok.as("l").join(tok.as("r"),
          col("l.doc_id") === col("r.doc_id") && col("l.w") < col("r.w"))
        .groupBy(col("l.w").as("wa"), col("r.w").as("wb"))
        .agg(count(lit(1)).as("c"))
        // global top-100 by the (c DESC, wa, wb) total order via
        // orderBy.limit = TakeOrdered (per-partition heaps + a 100-row
        // driver merge), replacing the r14 unpartitioned rank window
        .orderBy(col("c").desc, col("wa"), col("wb")).limit(100)
        .select("wa", "wb")
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    }
    import s.implicits._
    edges.toDF("wa", "wb")
  }

  // q210/q218 shared LPA partition over the coocEdges graph — the same
  // memoized-collected-artifact pattern as coocCache: the 8 propagation
  // rounds run ONCE per (session, sf dir), the value is the ≤|V|-row
  // label list (bounded by the top-100 edge cut), and both consumers
  // read it as a LocalRelation (q210 ships it; q218 scores it).
  private val lpaCache = new SessionMemo[Seq[(String, String)]]

  private[graft] def communityLabels(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val rows = lpaCache(s, d) {
      graft.operators.Components
        .labelPropagation(coocEdges(s, d), "wa", "wb", rounds = 8)
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    }
    import s.implicits._
    rows.toDF("id", "community")
  }

  // CacheHygieneSpec probe: does any session-scoped memo still key `s`?
  private[graft] def memoHolds(s: SparkSession): Boolean =
    backfillCache.holds(s) || evolveCache.holds(s) ||
      jdbcCache.holds(s) || coocCache.holds(s) || lpaCache.holds(s)

  // q190/q194 shared basket construction: 30-minute sessions (the q133
  // sessionization), each basket = a session's DISTINCT event types —
  // the user-level basket would be degenerate, every active user
  // touching all 5 types. CUT: both consumers read the frame several
  // times (supports, basket count, pair self-join), and without the cut
  // each read re-runs the corpus sessionization window.
  private def sessionItems(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    graft.operators.Checkpoints.cut(
      graft.operators.Sessionize.assign(ev(s, d), "user_id", "ts",
          "event_id", gapMicros = 1800000000L)
        .select(col("user_id"), col("sess"), col("event_type").as("it"))
        .distinct())

  val defs: Seq[QueryDef] = Seq(

    // q60: pivot (wide counts per status). Explicit value list keeps the
    // output schema static — at scale an implicit pivot would need a
    // distinct-scan planning pass.
    QueryDef("q60_pivot",
      (s, d) => ord(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
          count(*) FILTER (o_orderstatus = 'F') AS n_f,
          count(*) FILTER (o_orderstatus = 'O') AS n_o,
          count(*) FILTER (o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // q61: unpivot (melt) — the inverse reshaping, metric rows from a wide
    // aggregate.
    QueryDef("q61_unpivot",
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
        .unpivot(Array(col("l_returnflag")), "metric", "value")
        .orderBy("l_returnflag", "metric"),
      Some("""WITH w AS (
          SELECT l_returnflag, round(sum(l_quantity),2) sum_qty,
                 round(sum(l_extendedprice),2) sum_price,
                 count(*)::DOUBLE n_rows
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w
        ORDER BY l_returnflag, metric""")),

    // q62: exact percentiles (order statistics + linear interpolation —
    // deterministic, unlike approx sketches; the exact path is the oracle
    // for percentile_approx at scale).
    QueryDef("q62_percentiles",
      (s, d) => ord(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("p"))
        .select(col("o_orderpriority"),
          round(element_at(col("p"), 1), 4).as("p25"),
          round(element_at(col("p"), 2), 4).as("p50"),
          round(element_at(col("p"), 3), 4).as("p75"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
          round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
          round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
          round(quantile_cont(o_totalprice, 0.75), 4) AS p75
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // q63: moment aggregates — stddev and correlation (normalized moments
    // round stably; raw variance would amplify float-order noise past the
    // rounding boundary).
    QueryDef("q63_stats_agg",
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(stddev_samp(l_extendedprice), 2) AS sd_price,
          round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // q64: argmin/argmax — richest and poorest customer per segment in one
    // aggregation pass (no window, no join; acctbal is unique per segment
    // in this data so the argmax is well-defined).
    QueryDef("q64_minby_maxby",
      (s, d) => cust(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(
          max_by(col("c_custkey"), col("c_acctbal")).as("richest"),
          round(max(col("c_acctbal")), 2).as("max_bal"),
          min_by(col("c_custkey"), col("c_acctbal")).as("poorest"),
          round(min(col("c_acctbal")), 2).as("min_bal"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment,
          arg_max(c_custkey, c_acctbal) AS richest, round(max(c_acctbal),2) AS max_bal,
          arg_min(c_custkey, c_acctbal) AS poorest, round(min(c_acctbal),2) AS min_bal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // q65: time-series gap-fill + forward fill: hourly spine via sequence()
    // (generated, never collected), left join the hourly rollup, carry the
    // last observed sum forward — the standard resample/ffill for
    // sensor-style data. The fill is TWO-PHASE (the q101 bucket-carry
    // pattern): the spine buckets by calendar day (order-preserving);
    // phase 1 reduces each bucket to its last observation and runs the
    // carry window over the tiny per-bucket frame (#days rows, broadcast
    // back); phase 2 fills within buckets partition-parallel. No
    // unpartitioned window ever sees the spine — an unbounded time range
    // cannot collapse the fill onto one core.
    QueryDef("q65_timeseries_gapfill",
      (s, d) => {
        val hourly = ev(s, d).filter(col("user_id") < 20)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        val bounds = ev(s, d).filter(col("user_id") < 20)
          .agg(date_trunc("hour", min(col("ts"))).as("lo"),
            date_trunc("hour", max(col("ts"))).as("hi"))
        val spine = bounds.select(
          explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
        val joined = spine.join(hourly, Seq("h"), "left")
          .withColumn("b", date_trunc("day", col("h")))
        // phase 1: per-bucket last observation (max over (h, value) structs
        // of observed hours), then the running carry across PRECEDING
        // buckets — the only unpartitioned window, over #days rows
        val wB = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
        val carries = joined.groupBy("b")
          .agg(max(when(col("sum_value").isNotNull,
            struct(col("h"), col("sum_value")))).as("s"))
          .withColumn("carry", last(col("s.sum_value"), ignoreNulls = true).over(wB))
          .select("b", "carry")
        // phase 2: within-bucket fill, partition-parallel; bucket-leading
        // gaps take the carried value
        val wIn = Window.partitionBy("b").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined.join(broadcast(carries), Seq("b"))
          .select(col("h").as("hour"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(last(col("sum_value"), ignoreNulls = true).over(wIn),
              col("carry")).as("filled_sum"))
          .orderBy("hour")
      },
      Some("""WITH e AS (SELECT * FROM events WHERE user_id < 20),
        hourly AS (
          SELECT date_trunc('hour', ts) h, count(*) n, round(sum(value),2) sum_value
          FROM e GROUP BY 1),
        spine AS (
          SELECT unnest(generate_series(
            (SELECT date_trunc('hour', min(ts)) FROM e),
            (SELECT date_trunc('hour', max(ts)) FROM e),
            INTERVAL 1 HOUR)) h)
        SELECT CAST(spine.h AS TIMESTAMP) AS hour,
          coalesce(hourly.n, 0) AS n,
          last_value(hourly.sum_value IGNORE NULLS) OVER (
            ORDER BY spine.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
        FROM spine LEFT JOIN hourly ON spine.h = hourly.h
        ORDER BY hour""")),

    // q66: funnel — ordered stage progression per user (first view, first
    // click after it, first purchase after that), one row per stage with
    // user counts. Joins are per-user aggregates (small), never event×event.
    QueryDef("q66_funnel",
      (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("v_ts"))
        val c = e.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") >= col("v_ts"))
          .groupBy("user_id").agg(min("ts").as("c_ts"))
        val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") >= col("c_ts"))
          .groupBy("user_id").agg(min("ts").as("p_ts"))
        val counts = v.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_view"))
          .unionByName(c.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click")))
          .unionByName(p.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase")))
        counts.select("stage", "n").orderBy("stage")
      },
      Some("""WITH v AS (SELECT user_id, min(ts) v_ts FROM events WHERE event_type='view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) c_ts FROM events e JOIN v ON e.user_id=v.user_id
              WHERE e.event_type='click' AND e.ts >= v.v_ts GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) p_ts FROM events e JOIN c ON e.user_id=c.user_id
              WHERE e.event_type='purchase' AND e.ts >= c.c_ts GROUP BY 1)
        SELECT '1_view' AS stage, count(*) AS n FROM v
        UNION ALL SELECT '2_click', count(*) FROM c
        UNION ALL SELECT '3_purchase', count(*) FROM p
        ORDER BY stage""")),

    // q67: cohort retention — users bucketed by first-activity week,
    // counted per week offset. Two hash aggregations and a broadcast join
    // of the per-user cohort table.
    QueryDef("q67_cohort_retention",
      (s, d) => {
        val e = ev(s, d).select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        val cohort = e.groupBy("user_id").agg(min("w").as("cohort_week"))
        e.join(broadcast(cohort), "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("w"), col("cohort_week")) / 7).cast("int").as("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH e AS (SELECT user_id, date_trunc('week', ts) w FROM events),
        cohort AS (SELECT user_id, min(w) cohort_week FROM e GROUP BY 1)
        SELECT CAST(cohort.cohort_week AS TIMESTAMP) AS cohort_week,
          CAST(date_diff('day', cohort.cohort_week, e.w) / 7 AS INTEGER) AS week_offset,
          count(DISTINCT e.user_id) AS n_users
        FROM e JOIN cohort ON e.user_id = cohort.user_id
        GROUP BY 1, 2 ORDER BY cohort_week, week_offset""")),

    // q157: fixed-point PageRank over the behavioral transition graph —
    // edges = (event_type → next event_type) per user session stream
    // (lead over (user_id, ts)), weights = transition counts; 3 power-
    // iteration rounds at d=0.85 rank event types by flow centrality.
    // ALL arithmetic is integer micro-rank (contribution = (r div outW)·w,
    // dangling mass D div N, update via div 100): float power iteration
    // sums in engine- and partitioning-specific order, so a hash gate
    // would flicker in the last ulp — fixed-point is bit-identical
    // anywhere, which is why the oracle can replay all three rounds as
    // chained CTEs. Scale: one src-shuffle join + one dst-shuffle sum per
    // round over an edge frame persisted across rounds; the derivation
    // scan (lag/lead per user) is the only pass over the raw events.
    QueryDef("q157_pagerank",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev(s, d)
          .select(col("user_id"), col("event_type").as("src"),
            lead(col("event_type"), 1).over(w).as("dst"))
          .filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.Components
          .pageRank(edges, "src", "dst", Some("w"), iters = 3)
          .select(col("id").as("event_type"), col("rank").as("rank_micro"))
          .orderBy("event_type")
      },
      Some("""WITH tr AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events),
        e AS (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL
          GROUP BY 1, 2),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*) AS n FROM nodes),
        ow AS (SELECT src AS id, sum(w) AS outw FROM e GROUP BY 1),
        base AS (SELECT nodes.id, ow.outw FROM nodes LEFT JOIN ow USING (id)),
        r0 AS (SELECT id, outw, 1000000::BIGINT AS rank FROM base),
        d1 AS (SELECT (coalesce(sum(rank), 0)) // (SELECT n FROM nn) AS pnd
          FROM r0 WHERE outw IS NULL),
        c1 AS (SELECT e.dst AS id, sum((r.rank // r.outw) * e.w) AS insum
          FROM e JOIN r0 r ON e.src = r.id GROUP BY 1),
        r1 AS (SELECT b.id, b.outw, 150000 +
            (85 * (coalesce(c1.insum, 0) + (SELECT pnd FROM d1))) // 100 AS rank
          FROM base b LEFT JOIN c1 ON b.id = c1.id),
        d2 AS (SELECT (coalesce(sum(rank), 0)) // (SELECT n FROM nn) AS pnd
          FROM r1 WHERE outw IS NULL),
        c2 AS (SELECT e.dst AS id, sum((r.rank // r.outw) * e.w) AS insum
          FROM e JOIN r1 r ON e.src = r.id GROUP BY 1),
        r2 AS (SELECT b.id, b.outw, 150000 +
            (85 * (coalesce(c2.insum, 0) + (SELECT pnd FROM d2))) // 100 AS rank
          FROM base b LEFT JOIN c2 ON b.id = c2.id),
        d3 AS (SELECT (coalesce(sum(rank), 0)) // (SELECT n FROM nn) AS pnd
          FROM r2 WHERE outw IS NULL),
        c3 AS (SELECT e.dst AS id, sum((r.rank // r.outw) * e.w) AS insum
          FROM e JOIN r2 r ON e.src = r.id GROUP BY 1),
        r3 AS (SELECT b.id, b.outw, 150000 +
            (85 * (coalesce(c3.insum, 0) + (SELECT pnd FROM d3))) // 100 AS rank
          FROM base b LEFT JOIN c3 ON b.id = c3.id)
        SELECT id AS event_type, CAST(rank AS BIGINT) AS rank_micro FROM r3
        ORDER BY event_type""")),

    // q167: personalized PageRank (topic-sensitive teleport, Haveliwala
    // WWW '02) — rank every event type by proximity to the CONVERSION
    // events ('view','purchase' as the seed set): teleport and dangling
    // mass land only on the seeds, so rank mass flows outward from them
    // along observed transitions — the crawl-frontier/domain-trust
    // scoring primitive, here on the behavioral graph. Same integer
    // fixed point as q157 (per-seed teleport and every update truncated
    // identically on both sides), so the oracle replays all three rounds
    // as chained CTEs, seed flag and all.
    QueryDef("q167_personalized_pagerank",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev(s, d)
          .select(col("user_id"), col("event_type").as("src"),
            lead(col("event_type"), 1).over(w).as("dst"))
          .filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        // the seed set is EXTERNAL input (a trusted-domain list, a
        // conversion-event list) — a literal frame, never a corpus scan;
        // seeds absent from the graph drop out inside the operator
        val seeds = {
          import s.implicits._
          Seq("view", "purchase").toDF("seed")
        }
        graft.operators.Components
          .personalizedPageRank(edges, "src", "dst", Some("w"),
            seeds, "seed", iters = 3)
          .select(col("id").as("event_type"), col("rank").as("rank_micro"))
          .orderBy("event_type")
      },
      Some("""WITH tr AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events),
        e AS (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL
          GROUP BY 1, 2),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*) AS n FROM nodes),
        ow AS (SELECT src AS id, sum(w) AS outw FROM e GROUP BY 1),
        sd AS (SELECT id FROM nodes WHERE id IN ('view', 'purchase')),
        sc AS (SELECT count(*) AS s FROM sd),
        tp AS (SELECT (15 * 1000000 * (SELECT n FROM nn))
            // (100 * (SELECT s FROM sc)) AS t),
        base AS (SELECT nodes.id, ow.outw,
            nodes.id IN (SELECT id FROM sd) AS is_seed
          FROM nodes LEFT JOIN ow USING (id)),
        r0 AS (SELECT id, outw, is_seed, 1000000::BIGINT AS rank FROM base),
        d1 AS (SELECT coalesce(sum(rank), 0) AS dsum FROM r0 WHERE outw IS NULL),
        c1 AS (SELECT e.dst AS id, sum((r.rank // r.outw) * e.w) AS insum
          FROM e JOIN r0 r ON e.src = r.id GROUP BY 1),
        r1 AS (SELECT b.id, b.outw, b.is_seed,
            (CASE WHEN b.is_seed THEN (SELECT t FROM tp) ELSE 0 END) +
            (85 * (coalesce(c1.insum, 0) +
              CASE WHEN b.is_seed
                THEN (SELECT dsum FROM d1) // (SELECT s FROM sc)
                ELSE 0 END)) // 100 AS rank
          FROM base b LEFT JOIN c1 ON b.id = c1.id),
        d2 AS (SELECT coalesce(sum(rank), 0) AS dsum FROM r1 WHERE outw IS NULL),
        c2 AS (SELECT e.dst AS id, sum((r.rank // r.outw) * e.w) AS insum
          FROM e JOIN r1 r ON e.src = r.id GROUP BY 1),
        r2 AS (SELECT b.id, b.outw, b.is_seed,
            (CASE WHEN b.is_seed THEN (SELECT t FROM tp) ELSE 0 END) +
            (85 * (coalesce(c2.insum, 0) +
              CASE WHEN b.is_seed
                THEN (SELECT dsum FROM d2) // (SELECT s FROM sc)
                ELSE 0 END)) // 100 AS rank
          FROM base b LEFT JOIN c2 ON b.id = c2.id),
        d3 AS (SELECT coalesce(sum(rank), 0) AS dsum FROM r2 WHERE outw IS NULL),
        c3 AS (SELECT e.dst AS id, sum((r.rank // r.outw) * e.w) AS insum
          FROM e JOIN r2 r ON e.src = r.id GROUP BY 1),
        r3 AS (SELECT b.id, b.outw, b.is_seed,
            (CASE WHEN b.is_seed THEN (SELECT t FROM tp) ELSE 0 END) +
            (85 * (coalesce(c3.insum, 0) +
              CASE WHEN b.is_seed
                THEN (SELECT dsum FROM d3) // (SELECT s FROM sc)
                ELSE 0 END)) // 100 AS rank
          FROM base b LEFT JOIN c3 ON b.id = c3.id)
        SELECT id AS event_type, CAST(rank AS BIGINT) AS rank_micro FROM r3
        ORDER BY event_type""")),

    // q169: per-node triangle counts via degree-ordered orientation
    // (compact-forward) over the undirected transition graph — each
    // triangle found exactly once as a wedge at its (degree, id)-minimum
    // vertex closed by one equi-join; a celebrity hub generates no
    // wedges at itself because all its edges orient INTO it, which is
    // what bounds the wedge join at O(m^1.5) instead of Σdeg². Output
    // includes degree, so triangles/(d·(d−1)/2) is the local clustering
    // coefficient.
    QueryDef("q169_triangles",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev(s, d)
          .select(col("event_type").as("src"),
            lead(col("event_type"), 1).over(w).as("dst"))
          .filter(col("dst").isNotNull)
        graft.operators.Components.triangleCounts(edges, "src", "dst")
          .select(col("id").as("event_type"), col("degree"),
            col("triangles"))
          .orderBy("event_type")
      },
      Some("""WITH tr AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events),
        ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM tr WHERE dst IS NOT NULL AND src <> dst),
        dg AS (SELECT id, count(*) AS d FROM (
            SELECT a AS id FROM ue UNION ALL SELECT b FROM ue) GROUP BY 1),
        oe AS (SELECT
            CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b)
              THEN ue.a ELSE ue.b END AS u,
            CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b)
              THEN ue.b ELSE ue.a END AS v,
            CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b)
              THEN db.d ELSE da.d END AS dv
          FROM ue JOIN dg da ON ue.a = da.id JOIN dg db ON ue.b = db.id),
        wdg AS (SELECT e1.u, e1.v AS x, e2.v AS y
          FROM oe e1 JOIN oe e2 ON e1.u = e2.u
            AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))),
        t AS (SELECT wdg.u, wdg.x, wdg.y
          FROM wdg JOIN oe ON oe.u = wdg.x AND oe.v = wdg.y),
        pn AS (SELECT id, count(*) AS triangles FROM (
            SELECT u AS id FROM t
            UNION ALL SELECT x FROM t
            UNION ALL SELECT y FROM t) GROUP BY 1)
        SELECT dg.id AS event_type, CAST(dg.d AS BIGINT) AS degree,
          CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles
        FROM dg LEFT JOIN pn USING (id) ORDER BY event_type""")),

    // q170: one-row graph profile card (the q155 dataset-profile idea for
    // the graph family): node/edge counts, degree stats, wedge count,
    // exact triangle total and the GLOBAL clustering coefficient
    // 3·triangles/wedges in integer micro-units — the one-glance "is this
    // graph hub-dominated or clustered" summary a pipeline logs per day.
    // Composes q169's exact triangle machinery; every ratio is integer
    // div so the oracle replays bit-for-bit.
    QueryDef("q170_graph_profile",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev(s, d)
          .select(col("event_type").as("src"),
            lead(col("event_type"), 1).over(w).as("dst"))
          .filter(col("dst").isNotNull)
        graft.operators.Components.triangleCounts(edges, "src", "dst")
          .agg(count(lit(1)).as("nn"), sum("degree").as("sd"),
            max("degree").as("md"),
            sum(expr("degree * (degree - 1) div 2")).as("wedges"),
            sum("triangles").as("st"))
          .select(col("nn").as("n_nodes"),
            expr("sd div 2").as("n_edges"),
            col("md").as("max_degree"),
            expr("(sd * 1000) div nn").as("avg_degree_milli"),
            col("wedges"),
            expr("st div 3").as("n_triangles"),
            when(col("wedges") > 0, expr("(1000000 * st) div wedges"))
              .otherwise(lit(0L)).as("clustering_micro"))
      },
      Some("""WITH tr AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events),
        ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM tr WHERE dst IS NOT NULL AND src <> dst),
        dg AS (SELECT id, count(*) AS d FROM (
            SELECT a AS id FROM ue UNION ALL SELECT b FROM ue) GROUP BY 1),
        oe AS (SELECT
            CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b)
              THEN ue.a ELSE ue.b END AS u,
            CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b)
              THEN ue.b ELSE ue.a END AS v,
            CASE WHEN da.d < db.d OR (da.d = db.d AND ue.a < ue.b)
              THEN db.d ELSE da.d END AS dv
          FROM ue JOIN dg da ON ue.a = da.id JOIN dg db ON ue.b = db.id),
        wdg AS (SELECT e1.u, e1.v AS x, e2.v AS y
          FROM oe e1 JOIN oe e2 ON e1.u = e2.u
            AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))),
        t AS (SELECT wdg.u, wdg.x, wdg.y
          FROM wdg JOIN oe ON oe.u = wdg.x AND oe.v = wdg.y),
        pn AS (SELECT id, count(*) AS triangles FROM (
            SELECT u AS id FROM t
            UNION ALL SELECT x FROM t
            UNION ALL SELECT y FROM t) GROUP BY 1),
        sel AS (SELECT dg.id, dg.d, coalesce(pn.triangles, 0) AS tc
          FROM dg LEFT JOIN pn USING (id))
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
          CAST(sum(d) // 2 AS BIGINT) AS n_edges,
          CAST(max(d) AS BIGINT) AS max_degree,
          CAST((sum(d) * 1000) // count(*) AS BIGINT) AS avg_degree_milli,
          CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges,
          CAST(sum(tc) // 3 AS BIGINT) AS n_triangles,
          CAST(CASE WHEN sum(d * (d - 1) // 2) > 0
            THEN (1000000 * sum(tc)) // sum(d * (d - 1) // 2)
            ELSE 0 END AS BIGINT) AS clustering_micro
        FROM sel""")),

    // q160: point-in-time-correct feature aggregation — the feature-store
    // primitive (Feast/Tecton "point-in-time join"): per purchase (the
    // label row), aggregate the user's view/click stream over the
    // strictly-available window (ts−1h, ts] — temporal leakage safety,
    // the time-axis sibling of q150's near-dup-safe split. Never an
    // inequality join: both sides bucket epoch time by the lookback, the
    // label side explodes ×2, and the window predicate filters an
    // ordinary (user, bucket) equi-join (q21's band construction pointed
    // at the training-example shape). Labels with no in-window events
    // come back through a LEFT join: counts coalesce to 0, the sum stays
    // NULL (absence is information).
    QueryDef("q160_point_in_time_features",
      (s, d) => {
        val e = ev(s, d)
        val labels = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val feats = e.filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        graft.operators.Features.pointInTime(labels, feats, "user_id",
            "event_id", "ts", "ts", 3600L,
            Seq(count(when(col("event_type") === "view", 1)).as("nv"),
              count(when(col("event_type") === "click", 1)).as("nc"),
              round(sum(when(col("event_type") === "click", col("value"))), 2)
                .as("click_value_1h")))
          .select(col("event_id"), col("user_id"),
            col("label_ts").as("ts"),
            coalesce(col("nv"), lit(0L)).as("n_views_1h"),
            coalesce(col("nc"), lit(0L)).as("n_clicks_1h"),
            col("click_value_1h"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
        f AS (SELECT user_id, ts, event_type, value FROM events
          WHERE event_type IN ('view', 'click'))
        SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
          count(CASE WHEN f.event_type = 'view' THEN 1 END) AS n_views_1h,
          count(CASE WHEN f.event_type = 'click' THEN 1 END) AS n_clicks_1h,
          round(sum(CASE WHEN f.event_type = 'click' THEN f.value END), 2)
            AS click_value_1h
        FROM p LEFT JOIN f ON p.user_id = f.user_id
          AND f.ts <= p.ts AND f.ts > p.ts - INTERVAL 1 HOUR
        GROUP BY p.event_id, p.user_id, p.ts
        ORDER BY p.event_id""")),

    // q161: dynamic-partition backfill END-TO-END — the maintenance
    // lifecycle as driver-checked table state: orders lands partitioned
    // by status, then a corrected 'P' batch (totalprice + 1000) backfills
    // ONLY its partition via partitionOverwriteMode=dynamic; the query
    // reads the table after repair. The oracle states the repaired table
    // directly, so a backfill that leaked into sibling partitions (or
    // static-mode truncation of them) hash-fails immediately.
    QueryDef("q161_partition_backfill",
      (s, d) => {
        val dir = backfillCache(s, d) {
          val t = java.nio.file.Files
            .createTempDirectory("graft_q161").toString + "/orders"
          val base = ord(s, d).select(col("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"))
          base.write.partitionBy("o_orderstatus").parquet(t)
          val fix = base.filter(col("o_orderstatus") === "P")
            .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          graft.sources.Maintenance.backfillPartitions(
            fix, t, Seq("o_orderstatus"))
          t
        }
        s.read.parquet(dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice"), 2).as("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
          round(CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 1000.0
            ELSE o_totalprice END, 2) AS o_totalprice
        FROM orders ORDER BY o_orderkey""")),

    // q162: schema-drift-tolerant read as driver-checked state — two
    // batches of the same table written under EVOLVING schemas (batch 2
    // adds `lang`), read back through mergeSchema: pre-evolution rows
    // surface the new column as NULL. The oracle states exactly that
    // NULL-backfill contract from the source table.
    QueryDef("q162_schema_evolution",
      (s, d) => {
        val dir = evolveCache(s, d) {
          val t = java.nio.file.Files
            .createTempDirectory("graft_q162").toString + "/docs"
          val docs = Tables.documents(s, d)
          docs.filter(col("doc_id") % 2 === 0)
            .select(col("doc_id"), col("n_chars"))
            .write.parquet(s"$t/b=1")
          docs.filter(col("doc_id") % 2 === 1)
            .select(col("doc_id"), col("n_chars"), col("lang"))
            .write.parquet(s"$t/b=2")
          t
        }
        graft.sources.Maintenance.readEvolved(s, dir)
          .select(col("doc_id"), col("n_chars"), col("lang"),
            col("b").cast("int").as("b"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars,
          CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
          CAST(CASE WHEN doc_id % 2 = 1 THEN 2 ELSE 1 END AS INTEGER) AS b
        FROM documents ORDER BY doc_id""")),

    // q163: in-place JDBC upsert END-TO-END — the reference's core
    // operator (db_ops.py:29-100) as driver-checked database state: a
    // 5%-of-orders slice INSERTs into embedded Derby through the standard
    // MERGE dialect, the corrected 'P' batch (totalprice + 1000) UPSERTs
    // over it (the WHEN MATCHED path), and the query reads the table
    // back over JDBC. The oracle states the repaired slice directly —
    // the same last-writer-wins contract q161 proves for the parquet
    // partition path, here proven for executed SQL MERGE. coalesce(1):
    // embedded Derby's MERGE plan cache is not safe under concurrent
    // preparers (the IngestBench note); a server database takes the
    // per-partition parallel form unchanged.
    QueryDef("q163_jdbc_upsert_roundtrip",
      (s, d) => {
        val (url, props) = jdbcCache(s, d) {
          val u = s"jdbc:derby:memory:graftq163_${System.nanoTime()};create=true"
          val p = new java.util.Properties()
          p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          val conn = java.sql.DriverManager.getConnection(u)
          try conn.createStatement().execute(
            "CREATE TABLE orders_sink (o_orderkey BIGINT NOT NULL, " +
              "o_orderstatus VARCHAR(8), o_totalprice DOUBLE, " +
              "PRIMARY KEY (o_orderkey))")
          finally conn.close()
          val base = ord(s, d).filter(col("o_orderkey") % 20 === 0)
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"))
          graft.sources.JdbcUpsert.upsertInPlace(
            base.coalesce(1), u, "orders_sink", p, "o_orderkey")
          val fix = base.filter(col("o_orderstatus") === "P")
            .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          graft.sources.JdbcUpsert.upsertInPlace(
            fix.coalesce(1), u, "orders_sink", p, "o_orderkey")
          (u, p)
        }
        s.read.jdbc(url, "orders_sink", props)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice"), 2).as("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
          round(CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 1000.0
            ELSE o_totalprice END, 2) AS o_totalprice
        FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""")),

    // q165: hierarchical traversal (bounded BFS with depths) — the
    // recursive-CTE capability Spark SQL lacks, as iterative frontier
    // expansion: the part table induces a BOM-style hierarchy (parent =
    // p_partkey div 2, the binary-heap derivation — every part chains up
    // to part 1), and the query explodes the tree from the root with
    // min-hop depths. The oracle IS DuckDB's native WITH RECURSIVE over
    // the same derivation, so the hash-match proves frontier/anti-join
    // BFS ≡ recursive-CTE least fixpoint.
    QueryDef("q165_bfs_hierarchy",
      (s, d) => {
        val part = Tables.part(s, d)
        val edges = part.filter(col("p_partkey") >= 2)
          .select(expr("p_partkey div 2").as("parent"),
            col("p_partkey").as("child"))
        val roots = s.range(1, 2).select(col("id").as("root"))
        // hop bound DERIVED from the data, never hard-coded: the heap
        // derivation puts key k at depth floor(log2 k), so the deepest
        // reachable node sits at exactly floor(log2(max key)) — a larger
        // SF widens the bound automatically instead of silently
        // truncating the traversal against the UNBOUNDED recursive-CTE
        // oracle. One scalar agg of driver traffic. r14: the heap is a
        // single-parent TREE, so depths come from treeDepths' binary
        // lifting — ~2·log₂(depth) node-sized joins instead of
        // bfsDepths' depth-many frontier rounds, which at 18 levels were
        // pure scheduling floor (~3 jobs × 18 hops); the general-graph
        // frontier BFS remains the operator for non-forest edges and is
        // spec-pinned equal on this heap.
        val maxKey = part
          .agg(coalesce(max(col("p_partkey").cast("long")), lit(1L)).as("m"))
          .first().getLong(0)
        val hops = 63 - java.lang.Long.numberOfLeadingZeros(math.max(maxKey, 1L))
        graft.operators.Components
          .treeDepths(edges, "parent", "child", roots, "root", hops)
          .select(col("id").as("p_partkey"), col("depth"))
          .orderBy("p_partkey")
      },
      Some("""WITH RECURSIVE r AS (
          SELECT CAST(1 AS BIGINT) AS p_partkey, 0 AS depth
          UNION ALL
          SELECT p.p_partkey, r.depth + 1
          FROM part p JOIN r ON p.p_partkey // 2 = r.p_partkey
          WHERE p.p_partkey >= 2)
        SELECT p_partkey, CAST(depth AS INTEGER) AS depth FROM r
        ORDER BY p_partkey""")),

    // q171: bounded-hop weighted shortest paths (frontier Bellman–Ford)
    // over the q165 part heap with synthetic integer edge costs
    // ((child % 7) + 1): min-total-cost within ≤ 6 hops from the root —
    // the weighted generalization of q165's BFS, against DuckDB's NATIVE
    // hop-guarded recursive CTE as the oracle, so the hash-match proves
    // frontier-relax ≡ bounded-recursion least cost. The fixed horizon
    // is the SEMANTICS here (cost within six levels), not a truncation
    // hack — deeper nodes are meant to be absent on both sides.
    QueryDef("q171_shortest_paths",
      (s, d) => {
        val part = Tables.part(s, d)
        val edges = part.filter(col("p_partkey") >= 2)
          .select(expr("p_partkey div 2").as("parent"),
            col("p_partkey").as("child"),
            (col("p_partkey") % 7 + 1).cast("long").as("cost"))
        val roots = s.range(1, 2).select(col("id").as("root"))
        graft.operators.Components
          .shortestPathsBounded(edges, "parent", "child", Some("cost"),
            roots, "root", maxHops = 6)
          .select(col("id").as("p_partkey"), col("dist"))
          .orderBy("p_partkey")
      },
      Some("""WITH RECURSIVE r AS (
          SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist,
            0 AS hops
          UNION ALL
          SELECT p.p_partkey, r.dist + (p.p_partkey % 7) + 1, r.hops + 1
          FROM part p JOIN r ON p.p_partkey // 2 = r.id
          WHERE p.p_partkey >= 2 AND r.hops < 6)
        SELECT id AS p_partkey, CAST(min(dist) AS BIGINT) AS dist
        FROM r GROUP BY 1 ORDER BY 1""")),

    // q166: HITS hub/authority centrality over the same behavioral
    // event-type transition graph as q157 — the mutual-reinforcement
    // score pair (Kleinberg '99) next to PageRank's random surfer:
    // auth(v) = Σ w·hub(u) over in-edges, hub(u) = Σ w·auth(v) over
    // out-edges with the just-updated auths, each side rescaled per
    // round to total mass N·10⁶ by integer division. Same determinism
    // contract as q157: integer fixed point end-to-end (float
    // normalization would flicker in the last ulp across engines), the
    // rescale divisor rides as a broadcast 1-row aggregate, the result
    // is eagerly cut, and the fixed 2-round job graph is replayed by the
    // oracle as chained CTEs. Scale: two edge equi-joins + two
    // map-side-combined sums + two node-sized left joins per round.
    QueryDef("q166_hits",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev(s, d)
          .select(col("user_id"), col("event_type").as("src"),
            lead(col("event_type"), 1).over(w).as("dst"))
          .filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.Components
          .hits(edges, "src", "dst", Some("w"), iters = 2)
          .select(col("id").as("event_type"), col("auth").as("auth_micro"),
            col("hub").as("hub_micro"))
          .orderBy("event_type")
      },
      Some("""WITH tr AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events),
        e AS (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL
          GROUP BY 1, 2),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT id, 1000000::BIGINT AS a, 1000000::BIGINT AS h FROM nodes),
        a1r AS (SELECT e.dst AS id, sum(e.w * r0.h) AS raw
          FROM e JOIN r0 ON e.src = r0.id GROUP BY 1),
        ad1 AS (SELECT greatest((SELECT coalesce(sum(raw), 0) FROM a1r)
            // ((SELECT n FROM nn) * 1000000), 1) AS dvr),
        a1 AS (SELECT nodes.id, coalesce(raw, 0) // (SELECT dvr FROM ad1) AS a
          FROM nodes LEFT JOIN a1r USING (id)),
        h1r AS (SELECT e.src AS id, sum(e.w * a1.a) AS raw
          FROM e JOIN a1 ON e.dst = a1.id GROUP BY 1),
        hd1 AS (SELECT greatest((SELECT coalesce(sum(raw), 0) FROM h1r)
            // ((SELECT n FROM nn) * 1000000), 1) AS dvr),
        h1 AS (SELECT nodes.id, coalesce(raw, 0) // (SELECT dvr FROM hd1) AS h
          FROM nodes LEFT JOIN h1r USING (id)),
        a2r AS (SELECT e.dst AS id, sum(e.w * h1.h) AS raw
          FROM e JOIN h1 ON e.src = h1.id GROUP BY 1),
        ad2 AS (SELECT greatest((SELECT coalesce(sum(raw), 0) FROM a2r)
            // ((SELECT n FROM nn) * 1000000), 1) AS dvr),
        a2 AS (SELECT nodes.id, coalesce(raw, 0) // (SELECT dvr FROM ad2) AS a
          FROM nodes LEFT JOIN a2r USING (id)),
        h2r AS (SELECT e.src AS id, sum(e.w * a2.a) AS raw
          FROM e JOIN a2 ON e.dst = a2.id GROUP BY 1),
        hd2 AS (SELECT greatest((SELECT coalesce(sum(raw), 0) FROM h2r)
            // ((SELECT n FROM nn) * 1000000), 1) AS dvr),
        h2 AS (SELECT nodes.id, coalesce(raw, 0) // (SELECT dvr FROM hd2) AS h
          FROM nodes LEFT JOIN h2r USING (id))
        SELECT a2.id AS event_type, CAST(a2.a AS BIGINT) AS auth_micro,
          CAST(h2.h AS BIGINT) AS hub_micro
        FROM a2 JOIN h2 ON a2.id = h2.id ORDER BY event_type""")),

    // q68: edit-distance fuzzy matching — integer Levenshtein is exactly
    // portable. Bounded pair set (first 40 parts); at scale this runs
    // behind a cheap length/prefix blocking filter.
    QueryDef("q68_levenshtein",
      (s, d) => {
        val p = Tables.part(s, d).filter(col("p_partkey") <= 40)
          .select(col("p_partkey").as("pk"), col("p_name").as("name"))
        val q = p.select(col("pk").as("pk2"), col("name").as("name2"))
        p.join(q, col("pk") < col("pk2"))
          .withColumn("dist", levenshtein(col("name"), col("name2")))
          .filter(col("dist") <= 15)
          .select(col("pk"), col("pk2"), col("dist"))
          .orderBy("pk", "pk2")
      },
      Some("""SELECT a.p_partkey AS pk, b.p_partkey AS pk2,
          CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        WHERE a.p_partkey <= 40 AND b.p_partkey <= 40
          AND levenshtein(a.p_name, b.p_name) <= 15
        ORDER BY pk, pk2""")),

    // q69: value windows — ntile, percent_rank, cume_dist, first/nth value
    // over a unique total order.
    QueryDef("q69_value_windows",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cust(s, d).filter(col("c_custkey") <= 200)
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"),
            first(col("c_custkey")).over(wf).as("top_cust"),
            nth_value(col("c_custkey"), 2).over(wf).as("second_cust"))
          .orderBy("c_mktsegment", "pct_rank")
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
          CAST(ntile(4) OVER w AS INTEGER) AS quartile,
          round(percent_rank() OVER w, 6) AS pct_rank,
          round(cume_dist() OVER w, 6) AS cume,
          first_value(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_cust,
          nth_value(c_custkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_cust
        FROM customer WHERE c_custkey <= 200
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_mktsegment, pct_rank""")),

    // q70: salted two-phase aggregation — identical result to the direct
    // agg (decomposable aggregates; l_quantity sums are exact on the value
    // grid), but each of the 3 hot keys fans out over 16 reducers first.
    // The skew pattern for low-cardinality keys where every key is hot.
    QueryDef("q70_salted_agg",
      (s, d) => graft.operators.Skew
        .saltedCountSum(li(s, d), Seq("l_returnflag"), "l_quantity", 16)
        .select(col("l_returnflag"), col("n"),
          round(col("sum_l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // q79: salted skew JOIN — lineitem salted per row, supplier replicated
    // per salt bucket, join key (suppkey, salt). Result-identical to the
    // plain join (the oracle IS the plain join), so the whole salting
    // mechanism is correctness-gated. The pattern for a skewed probe side
    // against a build side too large to broadcast.
    QueryDef("q79_salted_join",
      (s, d) => {
        val big = li(s, d).withColumnRenamed("l_suppkey", "suppkey")
        val small = Tables.supplier(s, d).withColumnRenamed("s_suppkey", "suppkey")
        graft.operators.Skew.saltedJoin(big, small, "suppkey", 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"))
          .orderBy("s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n_items,
          round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // q71: approximate percentile sketch next to its exact oracle-of-record
    // (sketch values are engine-specific ⇒ rows-only driver check; the
    // exact column doubles as an in-row accuracy reference).
    QueryDef("q71_approx_percentile",
      (s, d) => ord(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("approx_percentile(o_totalprice, 0.5, 1000)"), 2).as("p50_approx"),
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50_exact"))
        .orderBy("o_orderpriority"),
      None),

    // q72: null-safe equality (`<=>` / IS NOT DISTINCT FROM) over a
    // constructed nullable column — NULL <=> NULL is true, NULL = NULL is
    // NULL; both buckets counted to pin the three-valued-logic behavior.
    QueryDef("q72_nullsafe_eq",
      (s, d) => li(s, d)
        .withColumn("d", when(col("l_discount") >= 0.05, col("l_discount")))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("d") <=> lit(null), 1L).otherwise(0L)).as("n_null_eq"),
          sum(when(col("d") <=> 0.05, 1L).otherwise(0L)).as("n_at_5pct"),
          sum(when(col("d") === lit(null), 1L).otherwise(0L)).as("n_plain_eq_null"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
          CAST(sum(CASE WHEN (CASE WHEN l_discount >= 0.05 THEN l_discount END) IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_eq,
          CAST(sum(CASE WHEN (CASE WHEN l_discount >= 0.05 THEN l_discount END) IS NOT DISTINCT FROM 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_5pct,
          CAST(sum(CASE WHEN ((CASE WHEN l_discount >= 0.05 THEN l_discount END) = NULL) THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq_null
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // q81: interval range frame — trailing-1h running stats per user over
    // event time. rangeBetween needs a numeric order key: unix_micros
    // keeps full timestamp precision (a seconds cast would disagree with
    // the oracle's native-timestamp RANGE on sub-second boundaries).
    // Window sums of 2-decimal data stay on the 0.01 grid → 2-dp round is
    // order-noise-immune.
    QueryDef("q81_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000000L, 0L)
        ev(s, d).filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"),
            count(lit(1)).over(w).as("n_prev_1h"),
            round(sum("value").over(w), 2).as("sum_prev_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts,
          count(*) OVER w AS n_prev_1h,
          round(sum(value) OVER w, 2) AS sum_prev_1h
        FROM events WHERE event_type = 'click'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // q82: correlated EXISTS subquery through the SQL front-end — Catalyst
    // decorrelates it to a left-semi join (same physical shape as q06),
    // exercising the rewrite rather than the pre-joined API form.
    QueryDef("q82_exists_subquery",
      (s, d) => {
        ord(s, d).createOrReplaceTempView("graft_q82_orders")
        li(s, d).createOrReplaceTempView("graft_q82_lineitem")
        s.sql("""SELECT o_orderpriority, count(1) AS n_orders
          FROM graft_q82_orders o
          WHERE EXISTS (SELECT 1 FROM graft_q82_lineitem l
                        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // q83: SCD2 dimension build — changelog → validity intervals. The
    // warehouse generalization of the reference's keyed upsert (U1–U3
    // overwrite; SCD2 keeps history): collapse consecutive equal states
    // per key (lag), then close each interval with the next change's
    // timestamp (lead over the collapsed set); open intervals are current.
    // Two window passes over one (key, time) sort — one shuffle.
    QueryDef("q83_scd2",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val changes = ord(s, d).filter(col("o_custkey") <= 300)
          .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
          .filter(col("prev_status").isNull ||
            col("prev_status") =!= col("o_orderstatus"))
        val w2 = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        changes
          .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w2))
          .select(col("o_custkey").as("custkey"),
            col("o_orderstatus").as("status"),
            col("o_orderdate").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.cast("int").as("is_current"))
          .orderBy("custkey", "valid_from", "status")
      },
      Some("""WITH h AS (
          SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                 lag(o_orderstatus) OVER w AS prev_status
          FROM orders WHERE o_custkey <= 300
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
         c AS (
          SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
          FROM h WHERE prev_status IS NULL OR prev_status <> o_orderstatus)
        SELECT o_custkey AS custkey, o_orderstatus AS status,
          o_orderdate AS valid_from, lead(o_orderdate) OVER w2 AS valid_to,
          CAST(lead(o_orderdate) OVER w2 IS NULL AS INTEGER) AS is_current
        FROM c WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY custkey, valid_from, status""")),

    // q91: SCD2 lookup THROUGH the native as-of join — enrich each event
    // with the dimension state valid at its timestamp. Because validity
    // intervals tile time per key, "latest valid_from <= ts" (as-of) IS
    // interval containment — no non-equi range join. Same-date changes
    // collapse to the last (by orderkey), matching the oracle's
    // empty-interval exclusion; as-of ties are otherwise unspecified.
    QueryDef("q91_scd2_lookup",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wDedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
          .orderBy(col("o_orderkey").desc)
        val dim = ord(s, d).filter(col("o_custkey") <= 300)
          .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
          .filter(col("prev_status").isNull ||
            col("prev_status") =!= col("o_orderstatus"))
          .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
          .select(col("o_custkey").as("custkey"),
            col("o_orderstatus").as("status"),
            // parquet NTZ → session-UTC instant, matching the events ts type
            col("o_orderdate").cast("timestamp").as("valid_from"))
        val facts = ev(s, d).select(col("user_id"), col("ts"))
        graft.plans.AsOfJoinNative(facts, dim,
            Seq("user_id"), Seq("custkey"), "ts", "valid_from")
          .filter(col("status").isNotNull)
          .groupBy("status")
          .agg(count(lit(1)).as("n_events"),
            countDistinct("user_id").as("n_users"))
          .orderBy("status")
      },
      Some("""WITH h AS (
          SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                 lag(o_orderstatus) OVER w AS prev_status
          FROM orders WHERE o_custkey <= 300
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
         c AS (
          SELECT o_custkey, o_orderstatus, o_orderdate FROM h
          WHERE prev_status IS NULL OR prev_status <> o_orderstatus),
         iv AS (
          SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
                 lead(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate) AS valid_to
          FROM c)
        SELECT o_orderstatus AS status, count(*) AS n_events,
          CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e JOIN iv
          ON e.user_id = iv.o_custkey AND iv.valid_from <= e.ts
         AND (iv.valid_to IS NULL OR e.ts < iv.valid_to)
        GROUP BY 1 ORDER BY 1""")),

    // q92: deterministic offset pagination — the reference's startAt /
    // maxResults page semantics (S2, issue_processor.py:114-167) as a
    // query surface: total order, then page 3 of size 100. At scale
    // prefer keyset pagination (WHERE key > last_seen) — OFFSET still
    // sorts/skips the prefix; this exercises the API form (offset+limit
    // plans as a single GlobalLimit, no full materialization).
    QueryDef("q92_paged_scan",
      (s, d) => ord(s, d)
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
        .offset(200).limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 100 OFFSET 200""")),

    // q93: ordered distinct string aggregation (LISTAGG/STRING_AGG) — the
    // sorted-set form (concat_ws ∘ array_sort ∘ collect_set) is the
    // deterministic one: collect_set order is partition-dependent, so the
    // sort is what makes the result stable and oracle-comparable.
    QueryDef("q93_string_agg",
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(concat_ws(",", array_sort(collect_set(col("l_linestatus"))))
          .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
          count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // q84: dynamic-bound equi-width histogram — two-pass: a broadcast
    // (min, max) aggregate, then one map-side bucket assignment + hash
    // agg. Bucket edges are identical doubles in both engines (exact
    // 2-decimal inputs, one division each); floor() on both sides because
    // DuckDB's int CAST rounds where Spark's truncates.
    QueryDef("q84_histogram",
      (s, d) => {
        val b = ord(s, d).agg(min("o_totalprice").as("mn"),
          max("o_totalprice").as("mx"))
        ord(s, d).crossJoin(broadcast(b))
          .withColumn("bucket",
            least(floor((col("o_totalprice") - col("mn")) /
              ((col("mx") - col("mn")) / 10)), lit(9L)).cast("int"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), round(min("mn"), 2).as("lo"),
            round(max("mx"), 2).as("hi"))
          .orderBy("bucket")
      },
      Some("""WITH b AS (SELECT min(o_totalprice) mn, max(o_totalprice) mx FROM orders),
         x AS (SELECT least(floor((o_totalprice - mn) / ((mx - mn) / 10)), 9) AS bucket,
                      mn, mx FROM orders, b)
        SELECT CAST(bucket AS INTEGER) bucket, count(*) AS n,
          round(min(mn),2) lo, round(max(mx),2) hi
        FROM x GROUP BY bucket ORDER BY bucket""")),

    // q86: snapshot diff — classify an incoming batch against the current
    // table with ONE full-outer join on the key: inserts (right-only),
    // unchanged (left-only), updates (both, any column differs), noops.
    // The incremental-ingest planning step in front of the keyed upsert
    // (q23); update prices use +1.0 (exact on the 2-decimal grid), never
    // re-rounded products, so the equality test is float-portable.
    QueryDef("q86_snapshot_diff",
      (s, d) => {
        val o = ord(s, d)
        val cur = o.select(col("o_orderkey").as("ckey"),
          col("o_totalprice").as("cprice"), col("o_orderstatus").as("cstatus"))
        val upd = o.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("ukey"),
            (col("o_totalprice") + 1.0).as("uprice"), lit("U").as("ustatus"))
          .unionByName(o.filter(col("o_orderkey") % 11 === 0)
            .select((col("o_orderkey") + 1000000000L).as("ukey"),
              lit(1.0).as("uprice"), lit("N").as("ustatus")))
        cur.join(upd, col("ckey") === col("ukey"), "full_outer")
          .withColumn("op",
            when(col("ckey").isNull, "insert")
              .when(col("ukey").isNull, "unchanged")
              .when(col("cprice") =!= col("uprice") ||
                col("cstatus") =!= col("ustatus"), "update")
              .otherwise("noop"))
          .groupBy("op")
          .agg(count(lit(1)).as("n"),
            min(coalesce(col("ckey"), col("ukey"))).as("min_key"),
            max(coalesce(col("ckey"), col("ukey"))).as("max_key"))
          .orderBy("op")
      },
      Some("""WITH cur AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
         upd AS (
           SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'U' AS o_orderstatus
           FROM orders WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey + 1000000000, 1.0, 'N' FROM orders WHERE o_orderkey % 11 = 0),
         d AS (
           SELECT coalesce(c.o_orderkey, u.o_orderkey) AS okey,
             CASE WHEN c.o_orderkey IS NULL THEN 'insert'
                  WHEN u.o_orderkey IS NULL THEN 'unchanged'
                  WHEN c.o_totalprice <> u.o_totalprice
                    OR c.o_orderstatus <> u.o_orderstatus THEN 'update'
                  ELSE 'noop' END AS op
           FROM cur c FULL OUTER JOIN upd u ON c.o_orderkey = u.o_orderkey)
        SELECT op, count(*) AS n, CAST(min(okey) AS BIGINT) AS min_key,
          CAST(max(okey) AS BIGINT) AS max_key
        FROM d GROUP BY op ORDER BY op""")),

    // q88: incremental aggregate maintenance — fold two event batches into
    // a keyed count/sum state (operators.IncrementalAgg) instead of
    // re-scanning history; the oracle IS the full recompute, so the
    // associative-merge path is correctness-gated end-to-end. Sum of
    // 2-decimal values → 2-dp round is grid-immune.
    QueryDef("q88_incremental_agg",
      (s, d) => {
        val e = ev(s, d)
        val cut = to_timestamp(lit("2024-01-15 00:00:00"))
        val keys = Seq("event_type")
        val state1 = graft.operators.IncrementalAgg
          .partial(e.filter(col("ts") < cut), keys, "value")
        val merged = graft.operators.IncrementalAgg.merge(
          state1,
          graft.operators.IncrementalAgg
            .partial(e.filter(col("ts") >= cut), keys, "value"),
          keys)
        merged.select(col("event_type"), col("n"),
          round(col("s"), 2).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // q89: VARIANT ingestion (Spark 4) — parse_json to the binary variant
    // encoding once, then typed variant_get extraction. The third JSON
    // path beside q19 (string get_json_object) and q73 (from_json struct):
    // at scale VARIANT amortizes parsing across many extractions and
    // shreds columnar; the variant stays internal (plain types out).
    QueryDef("q89_variant",
      (s, d) => ev(s, d)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", variant_get(col("v"), "$.k", "int"))
        .filter(col("k").isNotNull)
        .groupBy((col("k") % 7).as("k_mod"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k_mod"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 AS k_mod,
          count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events WHERE props IS NOT NULL
        GROUP BY 1 ORDER BY k_mod""")),

    // q73: from_json — full-struct parse of the props JSON column (q19
    // covers path extraction; this is the schema'd parse the reference's
    // input model implies, SURVEY §1).
    QueryDef("q73_from_json",
      (s, d) => ev(s, d)
        .withColumn("p", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .filter(col("p").isNotNull)
        .groupBy((col("p.k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k_mod"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
          count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events WHERE props IS NOT NULL
        GROUP BY 1 ORDER BY k_mod""")),

    // q133: ordered turn/trajectory assembly — the conversation-building
    // step of an SFT/agent-trace pipeline: sessionize each user's event
    // stream (30-min idle gap), then assemble the ORDERED per-session
    // transcript plus sequence-validation signals (adjacent-type
    // alternation count, error presence). Ordering inside groups is the
    // hard part distributed: collect_list is partition-order-dependent, so
    // the transcript sorts (ts, event_id) structs post-collect —
    // deterministic under ties — and the gap test compares unix_micros
    // (integer µs, bit-portable; a timestamp subtraction in double would
    // not be). Session numbering is the classic two-window lag→flag→
    // running-sum, partitioned by user — the sessionization shuffle is the
    // only exchange, and the per-user window is the op's semantics (q53's
    // session_window covers the agg-only form; this materializes the
    // sequence itself).
    QueryDef("q133_turn_assembly",
      (s, d) => {
        val e = graft.operators.Sessionize.assign(ev(s, d), "user_id",
          "ts", "event_id", gapMicros = 1800000000L, outCol = "session_no")
        val g = e.groupBy("user_id", "session_no")
          .agg(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
          .withColumn("types", transform(col("evs"), x => x.getField("event_type")))
        g.select(col("user_id"),
            col("session_no").cast("int").as("session_no"),
            size(col("types")).as("n_turns"),
            size(filter(
              zip_with(slice(col("types"), lit(1), size(col("types")) - 1),
                slice(col("types"), lit(2), size(col("types")) - 1),
                (a, b) => a =!= b), x => x)).as("n_alt"),
            concat_ws(">", col("types")).as("transcript"),
            array_contains(col("types"), "error").as("has_error"))
          .orderBy("user_id", "session_no")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 > 1800000000
                 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
            THEN 1 ELSE 0 END brk
          FROM events),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sess
              FROM e),
        g AS (SELECT user_id, sess,
                list(event_type ORDER BY ts, event_id) tl
              FROM s GROUP BY 1, 2)
        SELECT user_id, CAST(sess AS INTEGER) session_no,
          CAST(len(tl) AS INTEGER) n_turns,
          CAST(len(list_filter(generate_series(1, len(tl)-1),
                 i -> tl[i] != tl[i+1])) AS INTEGER) n_alt,
          array_to_string(tl, '>') transcript,
          list_contains(tl, 'error') has_error
        FROM g ORDER BY user_id, session_no""")),

    // q176: k-core of the token co-occurrence graph — the density-community
    // primitive (Seidman's k-core; bulk-synchronous Batagelj–Zaveršnik
    // peeling in Components.kCore): nodes are tokens, edges are the
    // top-100 co-occurring (distinct-per-doc) token pairs by count — a
    // RANK-based cut, so the graph is non-degenerate at every corpus
    // size where an absolute-share threshold empties as the corpus
    // diversifies (a 65%-of-docs cut held 79 edges at sf0.01 and ZERO at
    // sf0.1) — and the 7-core is the "always-together vocabulary
    // nucleus" a template/boilerplate detector keys on. Fixed 4 peel
    // rounds (the pageRank fixed-iters contract: ≥ the graph's peel
    // depth at every testdata sf — depths 1/3/2 — extra rounds exact
    // no-ops; kCoreUntil is the production convergence mode, equivalence
    // spec-pinned). Shape: one per-doc token self-join (co-occurrence
    // shuffle, the only corpus-sized exchange), one top-100 window on
    // the vocab²-bounded pair table (Heap's-law small — NOT corpus
    // data), then edge-frame-sized peel rounds — each a map-side-
    // combined degree agg + two semi-joins. The edge frame is the
    // memoized coocEdges artifact (computed once per session/dir,
    // shared with q187/q189 — the q77 pair-index lifecycle).
    QueryDef("q176_kcore",
      (s, d) => graft.operators.Components
        .kCore(coocEdges(s, d), "wa", "wb", k = 7, rounds = 4)
        .select(col("id").as("token"), col("core_degree"))
        .orderBy("token"),
      Some(s"""WITH x AS (SELECT doc_id, list_distinct(${TextShared.OToks}) t
            FROM documents),
          tok AS (SELECT doc_id, unnest(t) w FROM x),
          pr AS (SELECT a.w wa, b.w wb, count(*) c FROM tok a
                 JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2),
          rk AS (SELECT wa, wb, row_number() OVER (
              ORDER BY c DESC, wa, wb) r FROM pr),
          e0 AS MATERIALIZED (SELECT wa a, wb b FROM rk WHERE r <= 100),
          d1 AS MATERIALIZED (SELECT id, count(*) dg FROM (
              SELECT a id FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
          e1 AS MATERIALIZED (SELECT a, b FROM e0
                 WHERE a IN (SELECT id FROM d1 WHERE dg >= 7)
                   AND b IN (SELECT id FROM d1 WHERE dg >= 7)),
          d2 AS MATERIALIZED (SELECT id, count(*) dg FROM (
              SELECT a id FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
          e2 AS MATERIALIZED (SELECT a, b FROM e1
                 WHERE a IN (SELECT id FROM d2 WHERE dg >= 7)
                   AND b IN (SELECT id FROM d2 WHERE dg >= 7)),
          d3 AS MATERIALIZED (SELECT id, count(*) dg FROM (
              SELECT a id FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1),
          e3 AS MATERIALIZED (SELECT a, b FROM e2
                 WHERE a IN (SELECT id FROM d3 WHERE dg >= 7)
                   AND b IN (SELECT id FROM d3 WHERE dg >= 7)),
          d4 AS MATERIALIZED (SELECT id, count(*) dg FROM (
              SELECT a id FROM e3 UNION ALL SELECT b FROM e3) GROUP BY 1),
          e4 AS MATERIALIZED (SELECT a, b FROM e3
                 WHERE a IN (SELECT id FROM d4 WHERE dg >= 7)
                   AND b IN (SELECT id FROM d4 WHERE dg >= 7)),
          df AS (SELECT id, count(*) core_degree FROM (
              SELECT a id FROM e4 UNION ALL SELECT b FROM e4) GROUP BY 1)
        SELECT id AS token, CAST(core_degree AS BIGINT) AS core_degree
        FROM df WHERE core_degree >= 7 ORDER BY token""")),

    // q187: degree assortativity of the q176 token co-occurrence graph —
    // Newman's "do hubs link to hubs" coefficient, the one-number
    // hub-structure signal next to q170's clustering (computed on the
    // co-occurrence graph, NOT the event-transition graph: that one is a
    // complete K5 at the testdata, all degrees equal, variance 0 — r
    // undefined by construction). Pearson correlation of endpoint
    // degrees over edges, integer-exact via the both-orientations edge
    // list (M = 2m rows, so Σx = Σy and the two variance terms
    // coincide): r = r_num/r_den with r_num = M·Σxy − (Σx)²,
    // r_den = M·Σx² − (Σx)² — both BIGINT, the consumer divides.
    // Degrees come from one hash agg on the ≤100-edge frame; everything
    // past the one co-occurrence count shuffle is vocabulary-sized.
    // Overflow: M·Σxy ≤ M²·maxdeg² — fine to ~10⁹ edges × 10³ degree;
    // shard-combine or DECIMAL(38,0) past that.
    QueryDef("q187_assortativity",
      (s, d) => {
        val ue = coocEdges(s, d)
          .select(col("wa").as("a"), col("wb").as("b"))
        val deg = ue.select(col("a").as("id"))
          .union(ue.select(col("b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("dg"))
        val both = ue.select(col("a"), col("b"))
          .union(ue.select(col("b").as("a"), col("a").as("b")))
        both
          .join(deg.select(col("id").as("a"), col("dg").as("x")), "a")
          .join(deg.select(col("id").as("b"), col("dg").as("y")), "b")
          .agg(count(lit(1)).as("m2"), sum(col("x") * col("y")).as("sxy"),
            sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
          .select(expr("m2 div 2").as("n_edges"),
            (col("m2") * col("sxy") - col("sx") * col("sx")).as("r_num"),
            (col("m2") * col("sxx") - col("sx") * col("sx")).as("r_den"))
      },
      Some(s"""WITH x AS (SELECT doc_id, list_distinct(${TextShared.OToks}) t
            FROM documents),
          tok AS (SELECT doc_id, unnest(t) w FROM x),
          pr AS (SELECT a.w wa, b.w wb, count(*) c FROM tok a
                 JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2),
          rk AS (SELECT wa, wb, row_number() OVER (
              ORDER BY c DESC, wa, wb) r FROM pr),
          ue AS (SELECT wa a, wb b FROM rk WHERE r <= 100),
          dg AS (SELECT id, count(*) d FROM (
              SELECT a id FROM ue UNION ALL SELECT b FROM ue) GROUP BY 1),
          bo AS (SELECT a, b FROM ue UNION ALL SELECT b, a FROM ue),
          j AS (SELECT da.d x, db.d y FROM bo
            JOIN dg da ON bo.a = da.id JOIN dg db ON bo.b = db.id),
          agg AS (SELECT count(*) m2, sum(x * y) sxy, sum(x) sx,
              sum(x * x) sxx FROM j)
        SELECT CAST(m2 // 2 AS BIGINT) n_edges,
          CAST(m2 * sxy - sx * sx AS BIGINT) r_num,
          CAST(m2 * sxx - sx * sx AS BIGINT) r_den
        FROM agg""")),

    // q190: session-basket association rules — market-basket analysis
    // over q133's 30-minute sessions (baskets = a session's DISTINCT
    // event types; the user-level basket would be degenerate, every
    // active user touching all 5 types): for every ordered type pair
    // a→b the support counts (sessions with both / with a / with b /
    // total), from which confidence = s_ab/s_a and lift =
    // s_ab·n/(s_a·s_b) are one consumer division each — all-integer,
    // no float. Shape: one sessionization window (user-keyed), one
    // distinct, one session-item self-join whose blowup is bounded by
    // items-per-basket² (≤ 25 here; itemset mining at large
    // vocabularies would move to FP-Growth-style conditional bases),
    // and |types|²-row aggregates.
    QueryDef("q190_assoc_rules",
      (s, d) => {
        val items = sessionItems(s, d)
        val n = items.select("user_id", "sess").distinct()
          .agg(count(lit(1)).as("n_sessions"))
        val sup = items.groupBy("it").agg(count(lit(1)).as("s"))
        val both = items.as("x").join(items.as("y"),
            col("x.user_id") === col("y.user_id") &&
              col("x.sess") === col("y.sess") &&
              col("x.it") =!= col("y.it"))
          .groupBy(col("x.it").as("a"), col("y.it").as("b"))
          .agg(count(lit(1)).as("s_ab"))
        both
          .join(broadcast(sup.select(col("it").as("a"), col("s").as("s_a"))), "a")
          .join(broadcast(sup.select(col("it").as("b"), col("s").as("s_b"))), "b")
          .crossJoin(broadcast(n))
          .select(col("a"), col("b"), col("s_ab"), col("s_a"), col("s_b"),
            col("n_sessions"))
          .orderBy("a", "b")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 > 1800000000
                 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
            THEN 1 ELSE 0 END brk
          FROM events),
        sn AS (SELECT user_id, event_type,
               sum(brk) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sess
             FROM e),
        items AS (SELECT DISTINCT user_id, sess, event_type it FROM sn),
        n AS (SELECT count(*) n_sessions FROM
          (SELECT DISTINCT user_id, sess FROM items)),
        sup AS (SELECT it, count(*) s FROM items GROUP BY 1),
        bo AS (SELECT x.it a, y.it b, count(*) s_ab FROM items x
          JOIN items y ON x.user_id = y.user_id AND x.sess = y.sess
            AND x.it <> y.it
          GROUP BY 1, 2)
        SELECT a, b, CAST(s_ab AS BIGINT) s_ab,
          CAST(sa.s AS BIGINT) s_a, CAST(sb.s AS BIGINT) s_b,
          CAST(n.n_sessions AS BIGINT) n_sessions
        FROM bo JOIN sup sa ON bo.a = sa.it JOIN sup sb ON bo.b = sb.it
        CROSS JOIN n ORDER BY a, b""")),

    // q191: top common 3-step behavior paths — the path-mining read on
    // the event stream (which trigram journeys dominate): two leads
    // over the per-user (ts, event_id) order, one count agg on the
    // |types|³-bounded trigram table, top-10 by (count DESC, path) via
    // TakeOrdered (never a global sort — the q154 stance).
    // q241: CONCURRENT-SESSION co-activity matrix — which user pairs are
    // active at the same time: gap-sessionize (the one q53/q190/q201
    // definition), collapse each session to its [first, last] closed
    // interval, and count cross-user overlapping session pairs + total
    // overlap per user pair. The interval×interval self-join is the
    // two-sided generalization of q219's one-sided band: Intervals
    // decomposes it into a bucket equi-join (1-hour grid ≈ session
    // scale) with the exact overlap filter behind it — the oracle runs
    // the DIRECT non-equi form, so the hash-match is again the
    // decomposition-changes-nothing proof. Same-user pairs are excluded
    // by construction (gap sessions of one user cannot overlap).
    QueryDef("q241_concurrent_sessions",
      (s, d) => {
        val sess = graft.operators.Sessionize.assign(
          ev(s, d).select("user_id", "ts", "event_id"),
          "user_id", "ts", "event_id", 1800000000L)
        val iv = sess.groupBy(col("user_id"), col("sess"))
          .agg(min(unix_micros(col("ts"))).as("s_us"),
            max(unix_micros(col("ts"))).as("e_us"))
          .select(col("user_id"),
            (col("user_id") * 100000L + col("sess")).as("iid"),
            col("s_us"), col("e_us"))
        graft.operators.Intervals.overlapPairsAcrossGroups(
            iv, "user_id", "iid", "s_us", "e_us", 3600000000L)
          .groupBy(col("g_a").as("user_a"), col("g_b").as("user_b"))
          .agg(count(lit(1)).as("n_pairs"),
            sum("overlap_us").as("overlap_us"))
          .orderBy("user_a", "user_b")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id FROM events),
          l AS (SELECT user_id, ts, event_id,
              CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END brk
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          s AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) sess
            FROM l),
          iv AS (SELECT user_id, min(epoch_us(ts)) st, max(epoch_us(ts)) en
            FROM s GROUP BY user_id, sess),
          p AS (SELECT a.user_id ua, b.user_id ub,
              least(a.en, b.en) - greatest(a.st, b.st) ov
            FROM iv a JOIN iv b ON a.user_id < b.user_id
              AND a.st <= b.en AND b.st <= a.en)
        SELECT ua AS user_a, ub AS user_b,
          CAST(count(*) AS BIGINT) n_pairs, CAST(sum(ov) AS BIGINT) overlap_us
        FROM p GROUP BY 1, 2 ORDER BY 1, 2""")),

    // q247: top-20 co-active user pairs — the BOUNDED production form of
    // q241's co-activity matrix (a full pair matrix is quadratic in
    // concurrently-active users; the monitoring read is "who are the
    // most-co-active pairs", which is a TakeOrdered over the aggregate —
    // per-partition 20-row heaps + a driver merge, never a global sort).
    // Total order (overlap_us DESC, user_a, user_b) pins ties.
    QueryDef("q247_top_coactive_pairs",
      (s, d) => {
        val sess = graft.operators.Sessionize.assign(
          ev(s, d).select("user_id", "ts", "event_id"),
          "user_id", "ts", "event_id", 1800000000L)
        val iv = sess.groupBy(col("user_id"), col("sess"))
          .agg(min(unix_micros(col("ts"))).as("s_us"),
            max(unix_micros(col("ts"))).as("e_us"))
          .select(col("user_id"),
            (col("user_id") * 100000L + col("sess")).as("iid"),
            col("s_us"), col("e_us"))
        graft.operators.Intervals.overlapPairsAcrossGroups(
            iv, "user_id", "iid", "s_us", "e_us", 3600000000L)
          .groupBy(col("g_a").as("user_a"), col("g_b").as("user_b"))
          .agg(count(lit(1)).as("n_pairs"),
            sum("overlap_us").as("overlap_us"))
          .orderBy(col("overlap_us").desc, col("user_a"), col("user_b"))
          .limit(20)
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id FROM events),
          l AS (SELECT user_id, ts, event_id,
              CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END brk
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          s AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) sess
            FROM l),
          iv AS (SELECT user_id, min(epoch_us(ts)) st, max(epoch_us(ts)) en
            FROM s GROUP BY user_id, sess),
          p AS (SELECT a.user_id ua, b.user_id ub,
              least(a.en, b.en) - greatest(a.st, b.st) ov
            FROM iv a JOIN iv b ON a.user_id < b.user_id
              AND a.st <= b.en AND b.st <= a.en)
        SELECT ua AS user_a, ub AS user_b,
          CAST(count(*) AS BIGINT) n_pairs, CAST(sum(ov) AS BIGINT) overlap_us
        FROM p GROUP BY 1, 2
        ORDER BY overlap_us DESC, user_a, user_b LIMIT 20""")),

    QueryDef("q191_path_trigrams",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev(s, d)
          .select(col("event_type").as("a"),
            lead(col("event_type"), 1).over(w).as("b"),
            lead(col("event_type"), 2).over(w).as("c"))
          .filter(col("b").isNotNull && col("c").isNotNull)
          .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("a"), col("b"), col("c"))
          .limit(10)
      },
      Some("""WITH t AS (SELECT event_type a,
            lead(event_type, 1) OVER w b, lead(event_type, 2) OVER w c
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT a, b, c, CAST(count(*) AS BIGINT) n FROM t
        WHERE b IS NOT NULL AND c IS NOT NULL
        GROUP BY 1, 2, 3 ORDER BY n DESC, a, b, c LIMIT 10""")),

    // q189: dyadic coreness ladder over the q176 co-occurrence graph —
    // each token labeled with the deepest rung of the k ∈ {2, 4, 6}
    // core hierarchy it survives (coreness rounded down to the ladder,
    // the family's dyadic-probe stance: q179 ranks, q185 depths, here
    // density rungs). Components.coreLevels peels ASCENDING and
    // continues each rung from the previous rung's surviving edge frame
    // (k-cores nest), so the full edge set is collapsed and peeled
    // once; the oracle replays each rung from scratch — equal at
    // convergence by the nesting theorem. Round budgets MATCH on
    // purpose: both sides run exactly 4 peel rounds per rung, so the
    // results are equal round-for-round at ANY data — convergence or
    // not — instead of only when every rung's peel depth happens to be
    // ≤ the smaller budget (it is 1 at current testdata sfs, but a
    // deeper shell cascade at a new scale factor must not silently
    // diverge). Past convergence every extra round is an exact no-op
    // on either side, so the cost is scheduling floor on a ≤100-edge
    // graph, not data.
    QueryDef("q189_core_levels",
      (s, d) => graft.operators.Components
        .coreLevels(coocEdges(s, d), "wa", "wb", ks = Seq(2, 4, 6),
          rounds = 4)
        .select(col("id").as("token"), col("core_level"))
        .orderBy("token"),
      Some(s"""WITH x AS (SELECT doc_id, list_distinct(${TextShared.OToks}) t
            FROM documents),
          tok AS (SELECT doc_id, unnest(t) w FROM x),
          pr AS (SELECT a.w wa, b.w wb, count(*) c FROM tok a
                 JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2),
          rk AS (SELECT wa, wb, row_number() OVER (
              ORDER BY c DESC, wa, wb) r FROM pr),
          e0 AS MATERIALIZED (SELECT wa a, wb b FROM rk WHERE r <= 100),
          ${Seq(2, 4, 6).map { k =>
            // AS MATERIALIZED: DuckDB inlines plain CTEs, and a 12-level
            // peel chain referencing its predecessor 4× would otherwise
            // expand exponentially at plan time
            (1 to 4).map { i =>
              val prev = if (i == 1) "e0" else s"k${k}e${i - 1}"
              s"""k${k}d$i AS MATERIALIZED (SELECT id, count(*) dg FROM (
              SELECT a id FROM $prev UNION ALL SELECT b FROM $prev) GROUP BY 1),
          k${k}e$i AS MATERIALIZED (SELECT a, b FROM $prev
                 WHERE a IN (SELECT id FROM k${k}d$i WHERE dg >= $k)
                   AND b IN (SELECT id FROM k${k}d$i WHERE dg >= $k))"""
            }.mkString(",\n          ") +
              s""",
          k${k}m AS (SELECT id, $k lvl FROM (SELECT id, count(*) dg FROM (
              SELECT a id FROM k${k}e4 UNION ALL SELECT b FROM k${k}e4)
              GROUP BY 1) WHERE dg >= $k)"""
          }.mkString(",\n          ")}
        SELECT id AS token, CAST(max(lvl) AS BIGINT) AS core_level
        FROM (SELECT * FROM k2m UNION ALL SELECT * FROM k4m
              UNION ALL SELECT * FROM k6m)
        GROUP BY id ORDER BY token""")),

    // q235: 4-truss of the token co-occurrence graph — the EDGE-grained
    // density rung completing the cohesion ladder (q169 triangles count,
    // q176/q189 k-core peels nodes by degree, k-truss peels EDGES by
    // triangle support): every surviving edge lies in ≥ 2 triangles of
    // the surviving subgraph, so a hub star that passes a degree peel
    // scores zero here — truss communities are the triangle-cemented
    // cores topic phrases live in. Fixed 6 peel rounds over the memoized
    // coocEdges artifact (fixed point well inside the budget at every
    // testdata sf, pinned in ComponentsSpec rounds-6 ≡ rounds-8, the
    // q216 stop-budget discipline); each round is the q169 wedge join on
    // the shrinking ≤100-edge frame. Oracle unrolls all six
    // support/peel rounds as chained CTEs.
    QueryDef("q235_ktruss",
      (s, d) => graft.operators.Components
        .kTruss(coocEdges(s, d), "wa", "wb", k = 4, rounds = 6)
        .select(col("a").as("token_a"), col("b").as("token_b"),
          col("support"))
        .orderBy("token_a", "token_b"),
      Some(s"""WITH x AS (SELECT doc_id, list_distinct(${TextShared.OToks}) t
            FROM documents),
          tok AS (SELECT doc_id, unnest(t) w FROM x),
          pr AS (SELECT a.w wa, b.w wb, count(*) c FROM tok a
                 JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2),
          rk AS (SELECT wa, wb, row_number() OVER (
              ORDER BY c DESC, wa, wb) r FROM pr),
          e0 AS MATERIALIZED (SELECT wa a, wb b FROM rk WHERE r <= 100),
          ${(1 to 6).map { i =>
            val prev = s"e${i - 1}"
            // AS MATERIALIZED for the same reason as q189: a six-level
            // chain referencing its predecessor three times would expand
            // exponentially if inlined
            s"""bo$i AS MATERIALIZED (SELECT a u, b v FROM $prev
                 UNION ALL SELECT b, a FROM $prev),
          sp$i AS MATERIALIZED (SELECT p.u a, q.u b, count(*) sup
              FROM bo$i p JOIN bo$i q ON p.v = q.v AND p.u < q.u
              GROUP BY 1, 2),
          e$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
              JOIN sp$i s2 ON s2.a = e.a AND s2.b = e.b AND s2.sup >= 2)"""
          }.mkString(",\n          ")},
          bof AS (SELECT a u, b v FROM e6 UNION ALL SELECT b, a FROM e6),
          spf AS (SELECT p.u a, q.u b, count(*) sup FROM bof p JOIN bof q
              ON p.v = q.v AND p.u < q.u GROUP BY 1, 2)
        SELECT e.a AS token_a, e.b AS token_b,
          CAST(coalesce(s2.sup, 0) AS BIGINT) AS support
        FROM e6 e LEFT JOIN spf s2 ON s2.a = e.a AND s2.b = e.b
        ORDER BY token_a, token_b""")),

    // q194: frequent session pairs at ≥1/300 relative support — q190's
    // documented large-vocabulary path made real: Itemsets.frequentPairs
    // prunes infrequent items BEFORE any pair is generated (FP-Growth's
    // anti-monotone conditional-base construction, 2-itemset
    // specialization; the PFP sharding is the pair-count shuffle), where
    // q190 self-joins every item instance. The oracle deliberately mines
    // the UNPRUNED pair table and filters at the end — the two are
    // provably equal (s_a ≥ s_ab ≥ floor: both members of any frequent
    // pair are frequent, so the prune removes no surviving count), and
    // the hash-match IS that equivalence proof at data. Canonical a < b
    // rows (itemsets, not rules — q190 keeps the ordered-rule view);
    // relative support is the integer predicate 300·s ≥ n, never a float
    // and never an absolute count (which silently empties or explodes
    // when sf changes — the q176 lesson).
    QueryDef("q194_frequent_pairs",
      (s, d) => graft.operators.Itemsets
        .frequentPairs(sessionItems(s, d), Seq("user_id", "sess"), "it",
          minSupNum = 1L, minSupDen = 300L)
        .withColumnRenamed("n_baskets", "n_sessions")
        .orderBy("a", "b"),
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 > 1800000000
                 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
            THEN 1 ELSE 0 END brk
          FROM events),
        sn AS (SELECT user_id, event_type,
               sum(brk) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sess
             FROM e),
        items AS (SELECT DISTINCT user_id, sess, event_type it FROM sn),
        n AS (SELECT count(*) n_sessions FROM
          (SELECT DISTINCT user_id, sess FROM items)),
        sup AS (SELECT it, count(*) s FROM items GROUP BY 1),
        bo AS (SELECT x.it a, y.it b, count(*) s_ab FROM items x
          JOIN items y ON x.user_id = y.user_id AND x.sess = y.sess
            AND x.it < y.it
          GROUP BY 1, 2)
        SELECT a, b, CAST(s_ab AS BIGINT) s_ab,
          CAST(sa.s AS BIGINT) s_a, CAST(sb.s AS BIGINT) s_b,
          CAST(n.n_sessions AS BIGINT) n_sessions
        FROM bo JOIN sup sa ON bo.a = sa.it JOIN sup sb ON bo.b = sb.it
        CROSS JOIN n
        WHERE s_ab * 300 >= n.n_sessions
        ORDER BY a, b""")),

    // q200: frequent session TRIPLES — the depth-3 rung of q194's
    // anti-monotone ladder, mined Apriori-style (L2 frequent pairs →
    // broadcast C3 candidates whose every pair subset is frequent →
    // candidate-restricted 3-way count), while the oracle brute-forces
    // the full 3-way join and filters last — the hash-match IS the
    // anti-monotonicity proof at data, exactly the q194 contract one
    // rung up. Floor 1/10000 relative (triples over a 5-type vocabulary
    // are inherently rare — support 1–14 across the testdata sfs; the
    // floor is the operator's parameter, the construction is what
    // scales: at a real vocabulary C3 is what keeps the 3-way join off
    // the Zipf tail).
    QueryDef("q200_frequent_triples",
      (s, d) => graft.operators.Itemsets
        .frequentTriples(sessionItems(s, d), Seq("user_id", "sess"), "it",
          minSupNum = 1L, minSupDen = 10000L)
        .withColumnRenamed("n_baskets", "n_sessions")
        .orderBy("a", "b", "c"),
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 > 1800000000
                 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
            THEN 1 ELSE 0 END brk
          FROM events),
        sn AS (SELECT user_id, event_type,
               sum(brk) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sess
             FROM e),
        items AS (SELECT DISTINCT user_id, sess, event_type it FROM sn),
        n AS (SELECT count(*) n_sessions FROM
          (SELECT DISTINCT user_id, sess FROM items)),
        tr AS (SELECT x.it a, y.it b, z.it c, count(*) s_abc FROM items x
          JOIN items y ON x.user_id = y.user_id AND x.sess = y.sess
            AND x.it < y.it
          JOIN items z ON x.user_id = z.user_id AND x.sess = z.sess
            AND y.it < z.it
          GROUP BY 1, 2, 3)
        SELECT a, b, c, CAST(s_abc AS BIGINT) s_abc,
          CAST(n.n_sessions AS BIGINT) n_sessions
        FROM tr CROSS JOIN n
        WHERE s_abc * 10000 >= n.n_sessions
        ORDER BY a, b, c""")),

    // q201: sequential-pattern pairs — per DIRECTED type pair (a → b),
    // the number of 30-minute sessions where some occurrence of `a`
    // strictly precedes some occurrence of `b` (the 2-sequence of
    // SPADE/PrefixSpan, "exists before" semantics with arbitrary gap —
    // q190 is the unordered itemset view, q191 the contiguous-trigram
    // view; the s_seq(a→b) vs s_seq(b→a) asymmetry is the funnel
    // direction signal). Scale shape: "∃ i < j" collapses to ONE
    // per-(session, type) min/max-rank aggregate — min_rank(a) <
    // max_rank(b) ⟺ an `a` precedes a `b` — so the corpus pays the
    // sessionization window + one agg shuffle, and the pair join rides
    // the (sessions × types) frame with |types|²-bounded output, never
    // event instances.
    QueryDef("q201_sequence_pairs",
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        // per-user rank is session-comparable: sessions are contiguous
        // in each user's (ts, event_id) order
        val ranked = graft.operators.Checkpoints.cut(
          graft.operators.Sessionize.assign(ev(s, d), "user_id", "ts",
            "event_id", gapMicros = 1800000000L)
          .withColumn("rn", row_number().over(wOrd).cast("long"))
          .groupBy(col("user_id"), col("sess"), col("event_type").as("it"))
          .agg(min("rn").as("mn"), max("rn").as("mx")))
        val n = ranked.select("user_id", "sess").distinct()
          .agg(count(lit(1)).as("n_sessions"))
        ranked.as("x").join(ranked.as("y"),
            col("x.user_id") === col("y.user_id") &&
              col("x.sess") === col("y.sess") &&
              col("x.it") =!= col("y.it") && col("x.mn") < col("y.mx"))
          .groupBy(col("x.it").as("a"), col("y.it").as("b"))
          .agg(count(lit(1)).as("s_seq"))
          .crossJoin(broadcast(n))
          .orderBy("a", "b")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 > 1800000000
                 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
            THEN 1 ELSE 0 END brk
          FROM events),
        sn AS (SELECT user_id, event_type,
               sum(brk) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sess,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) rn
             FROM e),
        agg AS (SELECT user_id, sess, event_type it, min(rn) mn, max(rn) mx
          FROM sn GROUP BY 1, 2, 3),
        n AS (SELECT count(*) n_sessions FROM
          (SELECT DISTINCT user_id, sess FROM agg)),
        pr AS (SELECT x.it a, y.it b, count(*) s_seq FROM agg x
          JOIN agg y ON x.user_id = y.user_id AND x.sess = y.sess
            AND x.it <> y.it AND x.mn < y.mx
          GROUP BY 1, 2)
        SELECT a, b, CAST(s_seq AS BIGINT) s_seq,
          CAST(n.n_sessions AS BIGINT) n_sessions
        FROM pr CROSS JOIN n ORDER BY a, b""")),

    // q204: k-anonymity audit over the quasi-identifier triple (lang,
    // source, 500-char length bucket) — the privacy gate a dataset
    // release runs BEFORE shipping: any combination shared by fewer
    // than k=5 documents re-identifies (the Sweeney k-anonymity
    // criterion); the report lists every violating combination with its
    // group size so the release process can suppress or generalize
    // those cells. One hash-agg on the quasi-identifier key + a literal
    // filter — the corpus pays one count shuffle; bucket by n_chars
    // div 500 (nonnegative, so truncating div and flooring // agree).
    QueryDef("q204_k_anonymity",
      (s, d) => graft.Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 500").as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") < 5)
        .orderBy("lang", "source", "len_bucket"),
      Some("""SELECT lang, source, CAST(n_chars // 500 AS BIGINT) len_bucket,
          CAST(count(*) AS BIGINT) n_docs
        FROM documents GROUP BY 1, 2, 3 HAVING count(*) < 5
        ORDER BY lang, source, len_bucket""")),

    // q205: common-neighbors link prediction over the q176 co-occurrence
    // graph — the top-20 NON-adjacent token pairs most likely to
    // co-occur next (Liben-Nowell–Kleinberg: common-neighbor count is
    // the strongest simple predictor), with both degrees so
    // preferential-attachment deg_a·deg_b is one consumer multiply;
    // integer-exact where Adamic–Adar's 1/log(deg) would be float- and
    // library-dependent. Reads the memoized coocEdges artifact (the
    // corpus-sized stage runs once per session/dir); the wedge self-join
    // is Σ deg² on a ≤100-edge frame, top-20 via orderBy.limit =
    // TakeOrdered under the (cn DESC, deg_prod DESC, a, b) total order.
    QueryDef("q205_link_prediction",
      (s, d) => graft.operators.Components
        .commonNeighborCandidates(coocEdges(s, d), "wa", "wb")
        .select(col("wa").as("a"), col("wb").as("b"), col("cn"),
          (col("deg_a") * col("deg_b")).as("deg_prod"))
        .orderBy(col("cn").desc, col("deg_prod").desc, col("a"), col("b"))
        .limit(20),
      Some(s"""WITH x AS (SELECT doc_id, list_distinct(${TextShared.OToks}) t
            FROM documents),
          tok AS (SELECT doc_id, unnest(t) w FROM x),
          pr AS (SELECT a.w wa, b.w wb, count(*) c FROM tok a
                 JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2),
          rk AS (SELECT wa, wb, row_number() OVER (
              ORDER BY c DESC, wa, wb) r FROM pr),
          e0 AS (SELECT wa, wb FROM rk WHERE r <= 100),
          bo AS (SELECT wa s, wb d FROM e0 UNION ALL SELECT wb, wa FROM e0),
          deg AS (SELECT s id, count(*) dg FROM bo GROUP BY 1),
          cn AS (SELECT l.s x, r.s y, count(*) cn FROM bo l
            JOIN bo r ON l.d = r.d AND l.s < r.s GROUP BY 1, 2),
          ne AS (SELECT cn.* FROM cn LEFT JOIN e0
              ON cn.x = e0.wa AND cn.y = e0.wb
            WHERE e0.wa IS NULL)
        SELECT ne.x a, ne.y b, CAST(ne.cn AS BIGINT) cn,
          CAST(da.dg * db.dg AS BIGINT) deg_prod
        FROM ne JOIN deg da ON ne.x = da.id JOIN deg db ON ne.y = db.id
        ORDER BY cn DESC, deg_prod DESC, a, b LIMIT 20""")),

    // q284: resource-allocation link prediction (Zhou–Lü–Zhang 2009)
    // over the q205 co-occurrence graph — the degree-penalized
    // refinement of q205's raw common-neighbor count: a shared HUB is
    // weak evidence (its resource splits deg ways), a shared low-degree
    // neighbor is strong, RA = Σ 1/deg(w) over shared neighbors. RA is
    // the member of the local-index family that stays INTEGER-exact
    // (⌊1e6/deg⌋ per wedge — Adamic–Adar's 1/log(deg) would not survive
    // a cross-engine float contract). Reads the memoized ≤100-edge cooc
    // frame; at 100 TB the wedge enumeration + node-degree equi-join is
    // the q169 triangle envelope on a cut edge frame. Top-20 by RA.
    QueryDef("q284_resource_allocation",
      (s, d) => graft.operators.Components
        .resourceAllocationCandidates(coocEdges(s, d), "wa", "wb")
        .select(col("wa").as("a"), col("wb").as("b"), col("cn"),
          col("ra_micro"))
        .orderBy(col("ra_micro").desc, col("a"), col("b"))
        .limit(20),
      Some(s"""WITH x AS (SELECT doc_id, list_distinct(${TextShared.OToks}) t
            FROM documents),
          tok AS (SELECT doc_id, unnest(t) w FROM x),
          pr AS (SELECT a.w wa, b.w wb, count(*) c FROM tok a
                 JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2),
          rk AS (SELECT wa, wb, row_number() OVER (
              ORDER BY c DESC, wa, wb) r FROM pr),
          e0 AS (SELECT wa, wb FROM rk WHERE r <= 100),
          bo AS (SELECT wa s, wb d FROM e0 UNION ALL SELECT wb, wa FROM e0),
          deg AS (SELECT s id, count(*) dg FROM bo GROUP BY 1),
          wg AS (SELECT l.s x, r.s y, l.d w FROM bo l
            JOIN bo r ON l.d = r.d AND l.s < r.s),
          ra AS (SELECT x, y, count(*) cn,
              sum(1000000 // deg.dg) ra_micro
            FROM wg JOIN deg ON wg.w = deg.id GROUP BY 1, 2),
          ne AS (SELECT ra.* FROM ra LEFT JOIN e0
              ON ra.x = e0.wa AND ra.y = e0.wb
            WHERE e0.wa IS NULL)
        SELECT x a, y b, CAST(cn AS BIGINT) cn,
          CAST(ra_micro AS BIGINT) ra_micro
        FROM ne ORDER BY ra_micro DESC, a, b LIMIT 20""")),

    // q210: label-propagation community detection over the q176 token
    // co-occurrence graph — the partition-into-topical-groups primitive
    // next to the density filter (k-core), the centralities (PageRank/
    // HITS) and link prediction (q205): deterministic semi-synchronous
    // LPA (Raghavan 2007; parity 2-coloring + (count DESC, label ASC)
    // min-struct adoption — see Components.labelPropagation) at FIXED
    // rounds = 8, observed convergence + margin on every testdata sf
    // (the corpus graphs stabilize by round 6; extra rounds are exact
    // no-ops at the fixed point — the q157/q176 contract, and
    // ComponentsSpec pins rounds=8 ≡ rounds=10 at data). The dense
    // top-100 graph collapsing to one or two communities IS the
    // signal: its hubs co-occur everywhere (no topical split at this
    // cut); a sparser per-source cut is where the split appears.
    // Reads the memoized coocEdges LocalRelation; every round is hash
    // joins + combinable aggs on the ≤100-edge frame — the oracle
    // unrolls all 8 rounds as chained CTEs.
    QueryDef("q210_communities",
      (s, d) => communityLabels(s, d)
        .select(col("id").as("token"), col("community"))
        .orderBy("token"),
      Some(lpaOracleSql(8))),

    // q213: sequential-pattern TRIPLES a → b → c (distinct types, gaps
    // allowed) per session — the 3-step funnel signal q191's contiguous
    // trigrams can't see and q201's pair collapse can't express: the
    // pair trick (min_rank(a) < max_rank(b)) is insufficient for
    // 3-chains because the MIDDLE element needs an occurrence strictly
    // BETWEEN the anchors. The relational form: mnb = the smallest
    // b-occurrence rank strictly greater than min_rank(a) (one
    // per-(session, a, b) min-agg over b occurrences — the earliest b
    // that can close a's side; any later b only shrinks the room for
    // c), and the chain exists iff mnb < max_rank(c). One extra
    // per-session equi-join against occurrences vs q201, still
    // event-bounded: occurrences per session × types, never a 3-way
    // event self-join. Ships s_seq (sessions containing the chain) +
    // n_sessions; confidence is a consumer division.
    QueryDef("q213_sequence_triples",
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        // per-user rank is session-comparable (q201); occurrences AND
        // their per-(session, type) min/max collapse both read the
        // sessionization window output — cut each exactly once
        val occ = graft.operators.Checkpoints.cut(
          graft.operators.Sessionize.assign(ev(s, d), "user_id", "ts",
            "event_id", gapMicros = 1800000000L)
          .withColumn("rn", row_number().over(wOrd).cast("long"))
          .select(col("user_id"), col("sess"),
            col("event_type").as("it"), col("rn")))
        val agg = graft.operators.Checkpoints.cut(
          occ.groupBy(col("user_id"), col("sess"), col("it"))
            .agg(min("rn").as("mn"), max("rn").as("mx")))
        val n = agg.select("user_id", "sess").distinct()
          .agg(count(lit(1)).as("n_sessions"))
        val ab = agg.as("x").join(occ.as("o"),
            col("x.user_id") === col("o.user_id") &&
              col("x.sess") === col("o.sess") &&
              col("o.it") =!= col("x.it") && col("o.rn") > col("x.mn"))
          .groupBy(col("x.user_id").as("uid"), col("x.sess").as("sid"),
            col("x.it").as("a"), col("o.it").as("b"))
          .agg(min(col("o.rn")).as("mnb"))
        val res = ab.join(agg.as("z"),
            col("uid") === col("z.user_id") && col("sid") === col("z.sess") &&
              col("z.it") =!= col("a") && col("z.it") =!= col("b") &&
              col("mnb") < col("z.mx"))
          .groupBy(col("a"), col("b"), col("z.it").as("c"))
          .agg(count(lit(1)).as("s_seq"))
          .crossJoin(broadcast(n))
          .orderBy("a", "b", "c")
        graft.operators.Checkpoints.sealAndRelease(res, occ, agg)
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 > 1800000000
                 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
            THEN 1 ELSE 0 END brk
          FROM events),
        sn AS MATERIALIZED (SELECT user_id, event_type,
               sum(brk) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sess,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) rn
             FROM e),
        agg AS MATERIALIZED (SELECT user_id, sess, event_type it,
            min(rn) mn, max(rn) mx
          FROM sn GROUP BY 1, 2, 3),
        n AS (SELECT count(*) n_sessions FROM
          (SELECT DISTINCT user_id, sess FROM agg)),
        ab AS (SELECT x.user_id, x.sess, x.it a, o.event_type b,
            min(o.rn) mnb
          FROM agg x JOIN sn o ON x.user_id = o.user_id
            AND x.sess = o.sess AND o.event_type <> x.it AND o.rn > x.mn
          GROUP BY 1, 2, 3, 4),
        tri AS (SELECT ab.a, ab.b, z.it c, count(*) s_seq
          FROM ab JOIN agg z ON ab.user_id = z.user_id
            AND ab.sess = z.sess AND z.it <> ab.a AND z.it <> ab.b
            AND ab.mnb < z.mx
          GROUP BY 1, 2, 3)
        SELECT a, b, c, CAST(s_seq AS BIGINT) s_seq,
          CAST(n.n_sessions AS BIGINT) n_sessions
        FROM tri CROSS JOIN n ORDER BY a, b, c""")),

    // q214: l-diversity audit — the companion gate to q204's
    // k-anonymity (Machanavajjhala et al., ICDE 2006): a group can be
    // large enough (k-anonymous) yet still leak if its SENSITIVE
    // attribute is uniform — everyone in the (source, length-bucket)
    // cell shares one language, so re-identification within the cell
    // reveals it. Per quasi-identifier group (source, 500-char bucket —
    // q204's key MINUS lang, which moves from quasi-identifier to the
    // sensitive column), report groups whose distinct-language count
    // falls below l = 3, with size and diversity so the release process
    // can suppress or generalize. One hash-agg (count + countDistinct
    // under one shuffle) + a literal filter — the q204 scale shape.
    QueryDef("q214_l_diversity",
      (s, d) => graft.Tables.documents(s, d)
        .groupBy(col("source"), expr("n_chars div 500").as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"))
        .filter(col("n_langs") < 3)
        .orderBy("source", "len_bucket"),
      Some("""SELECT source, CAST(n_chars // 500 AS BIGINT) len_bucket,
          CAST(count(*) AS BIGINT) n_docs,
          CAST(count(DISTINCT lang) AS BIGINT) n_langs
        FROM documents GROUP BY 1, 2 HAVING count(DISTINCT lang) < 3
        ORDER BY source, len_bucket""")),

    // q216: CONVERGENCE-MODE PageRank through the driver gate — q157
    // runs the fixed-iters demo; production monitors run
    // pageRankUntil(budget) and this registers that path: the q157
    // transition graph solved to an L1 budget of 25000 micro-units
    // (2.5% of one unit of rank mass), with the stopped-round count in
    // the output — the consumer's proof of how much work convergence
    // took. The budget is chosen where the stop round is INVARIANT
    // across every testdata sf (round-1 deltas sit ≥ 1.4× ABOVE 25000,
    // round-2 deltas ≥ 1.5× BELOW, measured at sf0.001/0.01/0.1), so
    // the oracle is the q157 CTE chain unrolled to exactly 2 rounds
    // with the literal 2 — and ComponentsSpec pins stopped_round == 2
    // AND pageRankUntil ≡ pageRank(iters = 2) at every sf, so a
    // testdata regeneration that moved the boundary fails loudly in
    // the spec, not silently in the hash.
    QueryDef("q216_pagerank_until",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev(s, d)
          .select(col("user_id"), col("event_type").as("src"),
            lead(col("event_type"), 1).over(w).as("dst"))
          .filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val (ranks, rounds) = graft.operators.Components
          .pageRankUntil(edges, "src", "dst", Some("w"),
            deltaL1 = 25000L, maxIters = 60)
        ranks.select(col("id").as("event_type"),
            col("rank").as("rank_micro"),
            lit(rounds.toLong).as("stopped_round"))
          .orderBy("event_type")
      },
      Some("""WITH tr AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events),
        e AS (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL
          GROUP BY 1, 2),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*) AS n FROM nodes),
        ow AS (SELECT src AS id, sum(w) AS outw FROM e GROUP BY 1),
        base AS (SELECT nodes.id, ow.outw FROM nodes LEFT JOIN ow USING (id)),
        r0 AS (SELECT id, outw, 1000000::BIGINT AS rank FROM base),
        d1 AS (SELECT (coalesce(sum(rank), 0)) // (SELECT n FROM nn) AS pnd
          FROM r0 WHERE outw IS NULL),
        c1 AS (SELECT e.dst AS id, sum((r.rank // r.outw) * e.w) AS insum
          FROM e JOIN r0 r ON e.src = r.id GROUP BY 1),
        r1 AS (SELECT b.id, b.outw, 150000 +
            (85 * (coalesce(c1.insum, 0) + (SELECT pnd FROM d1))) // 100 AS rank
          FROM base b LEFT JOIN c1 ON b.id = c1.id),
        d2 AS (SELECT (coalesce(sum(rank), 0)) // (SELECT n FROM nn) AS pnd
          FROM r1 WHERE outw IS NULL),
        c2 AS (SELECT e.dst AS id, sum((r.rank // r.outw) * e.w) AS insum
          FROM e JOIN r1 r ON e.src = r.id GROUP BY 1),
        r2 AS (SELECT b.id, b.outw, 150000 +
            (85 * (coalesce(c2.insum, 0) + (SELECT pnd FROM d2))) // 100 AS rank
          FROM base b LEFT JOIN c2 ON b.id = c2.id)
        SELECT id AS event_type, CAST(rank AS BIGINT) AS rank_micro,
          CAST(2 AS BIGINT) AS stopped_round
        FROM r2 ORDER BY event_type""")),

    // q217: t-closeness audit — the third rung of the release-privacy
    // ladder (Li, Li & Venkatasubramanian, ICDE 2007): q204 asks "is
    // the cell big enough", q214 "is its sensitive attribute varied
    // enough" — t-closeness asks "does the cell's sensitive
    // DISTRIBUTION stay close to the table's": a cell can hold 3
    // languages yet be 95% one of them while the corpus is uniform,
    // and membership alone then shifts an attacker's prior. Per
    // quasi-identifier cell (source, 500-char bucket) the total-
    // variation distance between the cell's lang distribution and the
    // corpus's, in the q192 integer stance: tv_num = Σ_lang
    // |c_cell·n_all − c_lang·n_cell|, t = tv_num/(2·n_cell·n_all) at
    // the consumer (TV is the standard categorical EMD instance).
    // Zero cells ride the cells × langs grid — a language the cell
    // never emits is exactly the evidence t-closeness exists to see.
    // One count shuffle; everything after is grid-sized.
    QueryDef("q217_t_closeness",
      (s, d) => {
        // CUT: all three marginals and the pool total derive from the
        // per-(cell, lang) count table — stage it once (dimension-sized)
        // instead of four corpus scans; the ksFromCounts staging policy
        val cells = graft.operators.Checkpoints.cut(
          graft.Tables.documents(s, d)
            .select(col("source"), expr("n_chars div 500").as("len_bucket"),
              col("lang"))
            .groupBy("source", "len_bucket", "lang")
            .agg(count(lit(1)).as("c")))
        val grps = cells.groupBy("source", "len_bucket")
          .agg(sum("c").as("n_cell"))
        val langs = cells.groupBy("lang").agg(sum("c").as("cl"))
        val na = cells.agg(sum("c").as("n_all"))
        graft.operators.Checkpoints.sealAndRelease(
          grps.crossJoin(langs)
            .join(cells, Seq("source", "len_bucket", "lang"), "left")
            .crossJoin(broadcast(na))
            .groupBy(col("source"), col("len_bucket"))
            .agg(sum(abs(coalesce(col("c"), lit(0L)) * col("n_all") -
                col("cl") * col("n_cell"))).as("tv_num"),
              max("n_cell").as("n_cell"), max("n_all").as("n_all"))
            .orderBy("source", "len_bucket"),
          cells)
      },
      Some("""WITH b AS (SELECT source, n_chars // 500 len_bucket, lang
            FROM documents),
          cells AS (SELECT source, len_bucket, lang, count(*) c FROM b
            GROUP BY 1, 2, 3),
          grps AS (SELECT source, len_bucket, count(*) n_cell FROM b
            GROUP BY 1, 2),
          langs AS (SELECT lang, count(*) cl FROM b GROUP BY 1),
          na AS (SELECT count(*) n_all FROM b),
          grid AS (SELECT g.source, g.len_bucket, g.n_cell, l.lang, l.cl
            FROM grps g CROSS JOIN langs l)
        SELECT g.source AS source, CAST(g.len_bucket AS BIGINT) len_bucket,
          CAST(sum(abs(coalesce(cells.c, 0) * na.n_all
            - g.cl * g.n_cell)) AS BIGINT) tv_num,
          CAST(max(g.n_cell) AS BIGINT) n_cell,
          CAST(max(na.n_all) AS BIGINT) n_all
        FROM grid g LEFT JOIN cells ON g.source = cells.source
          AND g.len_bucket = cells.len_bucket AND g.lang = cells.lang
          CROSS JOIN na
        GROUP BY 1, 2 ORDER BY source, len_bucket""")),

    // q218: Newman modularity of the q210 partition — the quality score
    // that makes community detection actionable ("did LPA find real
    // structure or noise"; Newman & Girvan 2004): Q = Σ_c (e_c/m −
    // (d_c/2m)²) over communities, shipped in the integer stance as
    // per-community rows with q_cell = 4·m·e_c − d_c² so Q =
    // Σ q_cell / (4m²) is one consumer division (positive q_cell sum =
    // more intra-community mass than the degree-preserving random
    // graph). Reads BOTH memoized artifacts — the coocEdges frame and
    // the LPA label list (computed once per session/dir, shared with
    // q210) — so the marginal cost is edge-frame-sized joins + aggs;
    // at web scale e_c/d_c are one edge shuffle + one node shuffle
    // against the label table. Σ d_c = 2m and Σ e_c ≤ m are the
    // ComponentsSpec accounting laws.
    QueryDef("q218_modularity",
      (s, d) => graft.operators.Components
        .modularityCells(coocEdges(s, d), "wa", "wb",
          communityLabels(s, d), "id", "community")
        .orderBy("community"),
      Some(s"""WITH ${lpaCtes(8)},
          m AS (SELECT count(*) m_edges FROM e0),
          degs AS (SELECT id, count(*) dg FROM (
              SELECT wa id FROM e0 UNION ALL SELECT wb FROM e0) GROUP BY 1),
          intra AS (SELECT la.lbl community, count(*) intra_edges FROM e0
            JOIN l8 la ON e0.wa = la.id JOIN l8 lb ON e0.wb = lb.id
            WHERE la.lbl = lb.lbl GROUP BY 1),
          ds AS (SELECT l.lbl community, count(*) n_nodes, sum(d.dg) degree_sum
            FROM degs d JOIN l8 l ON d.id = l.id GROUP BY 1)
        SELECT ds.community AS community, CAST(n_nodes AS BIGINT) n_nodes,
          CAST(degree_sum AS BIGINT) degree_sum,
          CAST(coalesce(intra.intra_edges, 0) AS BIGINT) intra_edges,
          CAST(m.m_edges AS BIGINT) m_edges,
          CAST(4 * m.m_edges * coalesce(intra.intra_edges, 0)
            - degree_sum * degree_sum AS BIGINT) q_cell
        FROM ds LEFT JOIN intra ON ds.community = intra.community
          CROSS JOIN m ORDER BY community""")),

    // q219: attribution-window pairs — "of all `a` events, how many saw
    // a `b` from the same user within 10 minutes": the conversion-
    // attribution read the session family can't give (q201/q213 are
    // session-scoped with ARBITRARY gaps; attribution is TIME-scoped
    // and crosses session boundaries if the clock allows). Per directed
    // type pair: n_attr = a-occurrences with ≥1 qualifying b in
    // (t_a, t_a + W], n_a = all a-occurrences; rate = consumer
    // division. Scale shape is the q160 band-join pattern: a-side
    // explodes to ITS time bucket and the next (0 < Δ ≤ W confines b
    // to those two W-sized buckets), the join is EQUI on (user,
    // bucket) — never a per-user cross of occurrence lists — and the
    // exact window filter runs post-join; the DISTINCT on (a-occ,
    // b-type) collapses multiple qualifying b's to the exists bit.
    QueryDef("q219_attribution_window",
      (s, d) => {
        val W = 600000000L
        // occ feeds three consumers (aSide, bSide, na) — cut the narrow
        // 4-column frame once so the events corpus is scanned once, the
        // q213 staging discipline (ADVICE r16)
        val occ = graft.operators.Checkpoints.cut(
          ev(s, d).select(col("user_id"), col("event_id"),
            col("event_type").as("it"), unix_micros(col("ts")).as("us")))
        val aSide = occ
          .select(col("user_id"), col("event_id").as("aid"),
            col("it").as("a"), col("us").as("ta"))
          .withColumn("bk", explode(array(expr(s"ta div ${W}L"),
            expr(s"ta div ${W}L + 1L"))))
        val bSide = occ
          .select(col("user_id"), col("it").as("b"), col("us").as("tb"))
          .withColumn("bk", expr(s"tb div ${W}L"))
        val attr = aSide.join(bSide, Seq("user_id", "bk"))
          .filter(col("b") =!= col("a") && col("tb") > col("ta") &&
            col("tb") <= col("ta") + W)
          .select("aid", "a", "b").distinct()
          .groupBy("a", "b").agg(count(lit(1)).as("n_attr"))
        val na = occ.groupBy(col("it").as("a"))
          .agg(count(lit(1)).as("n_a"))
        val res = attr.join(na, "a")
          .select(col("a"), col("b"), col("n_attr"), col("n_a"))
          .orderBy("a", "b")
        graft.operators.Checkpoints.sealAndRelease(res, occ)
      },
      Some("""WITH occ AS (SELECT user_id, event_id, event_type it,
            epoch_us(ts) us FROM events),
          hits AS (SELECT DISTINCT a.event_id aid, a.it a, b.it b
            FROM occ a JOIN occ b ON a.user_id = b.user_id
              AND b.it <> a.it AND b.us > a.us
              AND b.us <= a.us + 600000000),
          at AS (SELECT a, b, count(*) n_attr FROM hits GROUP BY 1, 2),
          na AS (SELECT it a, count(*) n_a FROM occ GROUP BY 1)
        SELECT at.a AS a, at.b AS b, CAST(n_attr AS BIGINT) n_attr,
          CAST(na.n_a AS BIGINT) n_a
        FROM at JOIN na USING (a) ORDER BY a, b""")),

    // q253: z-order layout extents — the registered driver gate for the
    // ZOrder Morton machinery (layout itself is spec'd in ZOrderSpec;
    // this hash-pins the interleave arithmetic): quantize (o_custkey,
    // order-day) to 16 bits each off one broadcast bounds row, Morton-
    // interleave (the same mask/shift spreading Delta's OPTIMIZE ZORDER
    // uses, pure codegen'd bit ops), cut z-space into 16 fixed-width
    // ranges — each range is what one output file would hold — and
    // report each range's (x, y) bounding rectangle. The payoff is the
    // extent column: every bucket covers a COMPACT rectangle of both
    // dimensions (Σ extents ≪ 16 × full grid), so parquet min/max
    // footer stats prune scans filtered on EITHER key; a single-column
    // sort would leave the other dimension's extent at full width.
    QueryDef("q253_zorder_extents",
      (s, d) => {
        val dd = datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).cast("long")
        val b = ord(s, d).agg(min("o_custkey").as("cmn"),
          max("o_custkey").as("cmx"), min(dd).as("dmn"), max(dd).as("dmx"))
        ord(s, d).select(col("o_custkey"), dd.as("dd"))
          .crossJoin(broadcast(b))
          .withColumn("x16",
            expr("(o_custkey - cmn) * 65536 div (cmx - cmn + 1)"))
          .withColumn("y16", expr("(dd - dmn) * 65536 div (dmx - dmn + 1)"))
          .withColumn("z",
            graft.functions.ZOrder.interleave(col("x16"), col("y16")))
          .withColumn("bucket", expr("z div 268435456"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            min("x16").as("x_lo"), max("x16").as("x_hi"),
            min("y16").as("y_lo"), max("y16").as("y_hi"))
          .withColumn("extent", (col("x_hi") - col("x_lo") + 1L) *
            (col("y_hi") - col("y_lo") + 1L))
          .orderBy("bucket")
      },
      Some("""WITH b AS (SELECT min(o_custkey) cmn, max(o_custkey) cmx,
            min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) dmn,
            max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) dmx
          FROM orders),
        q AS (SELECT
            (o_custkey - cmn) * 65536 // (cmx - cmn + 1) x16,
            (date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) - dmn)
              * 65536 // (dmx - dmn + 1) y16
          FROM orders, b),
        s1 AS (SELECT x16, y16, ((x16 | (x16 << 8)) & 16711935) bx,
            ((y16 | (y16 << 8)) & 16711935) byy FROM q),
        s2 AS (SELECT x16, y16, ((bx | (bx << 4)) & 252645135) cx,
            ((byy | (byy << 4)) & 252645135) cy FROM s1),
        s3 AS (SELECT x16, y16, ((cx | (cx << 2)) & 858993459) dx,
            ((cy | (cy << 2)) & 858993459) dy FROM s2),
        s4 AS (SELECT x16, y16, ((dx | (dx << 1)) & 1431655765) ex,
            ((dy | (dy << 1)) & 1431655765) ey FROM s3),
        z AS (SELECT x16, y16, (ex | (ey * 2)) // 268435456 bucket FROM s4)
        SELECT bucket, CAST(count(*) AS BIGINT) n,
          min(x16) x_lo, max(x16) x_hi, min(y16) y_lo, max(y16) y_hi,
          CAST((max(x16) - min(x16) + 1) * (max(y16) - min(y16) + 1)
            AS BIGINT) extent
        FROM z GROUP BY bucket ORDER BY bucket""")),

    // q259: Laplace-smoothed Markov transition matrix over per-user
    // event streams — the row-stochastic NORMALIZED form of q201's raw
    // adjacency counts, on the FULL V×V state grid including zero-count
    // cells (the matrix a next-event predictor or anomaly scorer
    // actually consumes; an unsmoothed sparse table assigns impossible
    // transitions probability zero and breaks every log-likelihood).
    // p(next|prev) = (c + 1)/(row_total + V), shipped as the exact
    // integer micro quotient — num/den int64, no float anywhere. The
    // corpus pays one lead-window transition derivation (the q157/q169
    // shared envelope); the grid is dimension²-sized.
    QueryDef("q259_markov_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val tr = ev(s, d)
          .select(col("event_type").as("prev"),
            lead(col("event_type"), 1).over(w).as("next"))
          .filter(col("next").isNotNull)
        val cnt = tr.groupBy("prev", "next").agg(count(lit(1)).as("c"))
        val types = ev(s, d).select(col("event_type").as("t")).distinct()
        val v = types.agg(count(lit(1)).as("v"))
        val grid = types.select(col("t").as("prev"))
          .crossJoin(types.select(col("t").as("next")))
        val rowTot = cnt.groupBy("prev").agg(sum("c").as("row_total"))
        grid
          .join(cnt, Seq("prev", "next"), "left")
          .join(rowTot, Seq("prev"), "left")
          .crossJoin(broadcast(v))
          .select(col("prev"), col("next"),
            coalesce(col("c"), lit(0L)).as("c"),
            coalesce(col("row_total"), lit(0L)).as("row_total"), col("v"))
          .withColumn("p_micro",
            expr("(c + 1) * 1000000 div (row_total + v)"))
          .orderBy("prev", "next")
      },
      Some("""WITH tr AS (SELECT event_type prev,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) nxt
          FROM events),
        cnt AS (SELECT prev, nxt, count(*) c FROM tr
          WHERE nxt IS NOT NULL GROUP BY 1, 2),
        ty AS (SELECT DISTINCT event_type t FROM events),
        vv AS (SELECT CAST(count(*) AS BIGINT) v FROM ty),
        grid AS (SELECT a.t prev, b.t nxt FROM ty a CROSS JOIN ty b),
        rt AS (SELECT prev, CAST(sum(c) AS BIGINT) row_total
          FROM cnt GROUP BY 1)
        SELECT grid.prev, grid.nxt AS next,
          CAST(coalesce(cnt.c, 0) AS BIGINT) c,
          coalesce(rt.row_total, 0) row_total, vv.v,
          CAST((coalesce(cnt.c, 0) + 1) * 1000000
            // (coalesce(rt.row_total, 0) + vv.v) AS BIGINT) p_micro
        FROM grid
        LEFT JOIN cnt ON cnt.prev = grid.prev AND cnt.nxt = grid.nxt
        LEFT JOIN rt ON rt.prev = grid.prev
        CROSS JOIN vv
        ORDER BY 1, 2""")),

    // q263: TextRank keyword extraction (Mihalcea & Tarau, EMNLP '04) —
    // PageRank over the TOKEN co-occurrence graph instead of the event
    // graph: a token matters not because it's frequent (q32 counts that)
    // but because it co-occurs with other well-connected tokens; the
    // classic unsupervised keyword ranker, here as pure composition of
    // the memoized coocEdges artifact (shared with q210/q176/q189/q235)
    // and the q157 integer PageRank machinery. Undirected graph = both
    // edge directions, unweighted; no dangling nodes, so the oracle's
    // three unrolled rounds carry a zero dangling term by construction.
    QueryDef("q263_textrank_keywords",
      (s, d) => {
        val e = coocEdges(s, d)
        val edges = e.select(col("wa").as("src"), col("wb").as("dst"))
          .union(e.select(col("wb").as("src"), col("wa").as("dst")))
        graft.operators.Components
          .pageRank(edges, "src", "dst", None, iters = 3)
          .select(col("id").as("token"), col("rank").as("rank_micro"))
          .orderBy(col("rank_micro").desc, col("token"))
      },
      Some(textRankOracleSql)),

    // q264: deterministic negative-edge sampling — the TRAINING
    // companion to q205's link prediction (q205 scores non-edges by
    // common neighbors; an embedding trainer also needs NEGATIVES, and
    // sampling them with rand() makes every epoch irreproducible): per
    // anchor node, the 2 hash-least non-neighbors, md5-ranked so the
    // same corpus always yields the same negative set. The candidate
    // grid is graph-vocabulary-sized (bounded by the top-100-edge cooc
    // artifact — the documented dimension-grid stance); at web scale
    // negatives come from hashed candidate shards, same determinism.
    QueryDef("q264_negative_sampling",
      (s, d) => {
        val e = coocEdges(s, d)
        val nodes = e.select(col("wa").as("x"))
          .union(e.select(col("wb").as("x"))).distinct()
        val adj = e.select(col("wa").as("a"), col("wb").as("b"))
          .union(e.select(col("wb").as("a"), col("wa").as("b")))
        val h = graft.functions.TextFns.hash32(
          concat(lit("neg:"), col("a"), lit(":"), col("b")))
        nodes.select(col("x").as("a"))
          .crossJoin(nodes.select(col("x").as("b")))
          .filter(col("a") =!= col("b"))
          .join(adj, Seq("a", "b"), "left_anti")
          .withColumn("h", h)
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("a").orderBy(col("h"), col("b"))))
          .filter(col("rnk") <= 2)
          .select(col("a").as("anchor"), col("b").as("negative"),
            col("rnk").cast("long").as("rnk"), col("h"))
          .orderBy("anchor", "rnk")
      },
      Some(s"""WITH $coocCtes,
        nodes AS (SELECT DISTINCT s x FROM bo),
        cand AS (SELECT a.x a, b.x b FROM nodes a JOIN nodes b
            ON a.x <> b.x
          WHERE NOT EXISTS (SELECT 1 FROM bo
            WHERE bo.s = a.x AND bo.d = b.x)),
        hv AS (SELECT a, b,
            ('0x' || substr(md5('neg:' || a || ':' || b), 1, 8))::BIGINT h
          FROM cand),
        r AS (SELECT a, b, h, row_number() OVER (PARTITION BY a
            ORDER BY h, b) rnk FROM hv)
        SELECT a anchor, b negative, CAST(rnk AS BIGINT) rnk, h
        FROM r WHERE rnk <= 2 ORDER BY anchor, rnk""")),

    // q274: RFM segmentation — the classic behavioral-scoring triple
    // (Recency = days since last event, Frequency = event count,
    // Monetary = exact cents) with each dimension cut into quintiles by
    // the GROUPED TWO-PHASE RANK (via Sampling.topFractionPerGroup on a
    // constant group — no global single-partition ntile window, the
    // q148 machinery), so the segmentation scales to billions of users.
    // Quintile = ⌊5·gpos/gn⌋ + 1 with the (value, id) total order; the
    // 3-digit segment code rq·100+fq·10+mq is the standard RFM cell.
    QueryDef("q274_rfm_segments",
      (s, d) => {
        val maxDd = ev(s, d).agg(max(datediff(to_date(col("ts")),
          to_date(lit("1970-01-01"))).cast("long")).as("gmax"))
        val users = graft.operators.Checkpoints.cut(
          ev(s, d).groupBy("user_id")
            .agg(max(datediff(to_date(col("ts")),
                to_date(lit("1970-01-01"))).cast("long")).as("umax"),
              count(lit(1)).as("f"),
              sum(round(col("value") * 100).cast("long")).as("m_cents"))
            .crossJoin(broadcast(maxDd))
            .select(col("user_id"), (col("gmax") - col("umax")).as("r_days"),
              col("f"), col("m_cents"))
            .withColumn("g", lit("all")))
        def quint(scoreCol: String, out: String) =
          graft.operators.Sampling.topFractionPerGroup(
              users, "user_id", "g", scoreCol, 1000)
            .select(col("id").as("user_id"),
              (expr("5 * gpos div gn") + 1L).as(out))
        val res = users.select("user_id", "r_days", "f", "m_cents")
          .join(quint("r_days", "rq"), "user_id")
          .join(quint("f", "fq"), "user_id")
          .join(quint("m_cents", "mq"), "user_id")
          .withColumn("segment",
            col("rq") * 100L + col("fq") * 10L + col("mq"))
          .orderBy("user_id")
        graft.operators.Checkpoints.sealAndRelease(res, users)
      },
      Some("""WITH u AS (SELECT user_id,
            max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) umax,
            CAST(count(*) AS BIGINT) f,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) m_cents
          FROM events GROUP BY 1),
        g AS (SELECT max(umax) gmax, count(*) n FROM u),
        b AS (SELECT user_id, gmax - umax r_days, f, m_cents, n FROM u, g),
        r AS (SELECT *,
            (row_number() OVER (ORDER BY r_days, user_id) - 1) * 5 // n + 1 rq,
            (row_number() OVER (ORDER BY f, user_id) - 1) * 5 // n + 1 fq,
            (row_number() OVER (ORDER BY m_cents, user_id) - 1) * 5 // n + 1 mq
          FROM b)
        SELECT user_id, CAST(r_days AS BIGINT) r_days, f, m_cents,
          CAST(rq AS BIGINT) rq, CAST(fq AS BIGINT) fq,
          CAST(mq AS BIGINT) mq,
          CAST(rq * 100 + fq * 10 + mq AS BIGINT) segment
        FROM r ORDER BY user_id""")),

    // q275: interval-coverage per user — the UNION-length measure over
    // gap-merged activity intervals ("how much wall-clock was this user
    // actually active"): sessions from the shared Sessionize definition
    // (strict 30-min gap), per user the session count, the summed
    // active span Σ(end − start), the total first→last span, and the
    // active share in exact permille (NULL for single-event users whose
    // span is zero — a share of nothing is not 0 or 1). The classic
    // interval-union aggregate, one user-keyed exchange.
    QueryDef("q275_interval_coverage",
      (s, d) => {
        val sess = graft.operators.Sessionize.assign(
          ev(s, d).select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", "event_id", 1800000000L)
        val per = sess
          .select(col("user_id"), col("sess"),
            unix_micros(col("ts")).as("us"))
          .groupBy("user_id", "sess")
          .agg(min("us").as("st"), max("us").as("en"))
        per.groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("en") - col("st")).as("active_us"),
            (max("en") - min("st")).as("span_us"))
          .withColumn("active_pm",
            when(col("span_us") > 0L,
              expr("active_us * 1000 div span_us")))
          .orderBy("user_id")
      },
      Some("""WITH x AS (SELECT user_id, epoch_us(ts) us,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        g AS (SELECT user_id, us, sum(brk) OVER (PARTITION BY user_id
            ORDER BY us ROWS UNBOUNDED PRECEDING) sess FROM x),
        p AS (SELECT user_id, sess, min(us) st, max(us) en
          FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) n_sessions,
          CAST(sum(en - st) AS BIGINT) active_us,
          CAST(max(en) - min(st) AS BIGINT) span_us,
          CASE WHEN max(en) - min(st) > 0 THEN
            CAST(sum(en - st) * 1000 // (max(en) - min(st)) AS BIGINT)
          END active_pm
        FROM p GROUP BY user_id ORDER BY user_id""")),

    // q276: user survival curve — for each horizon k (days), the share
    // of users whose observed lifespan (last day − first day) reaches
    // k: the pooled Kaplan-Meier-read behind q67's per-cohort retention
    // triangle (no censoring model needed on a closed corpus — the
    // lifespan is fully observed). Exact integer num/den per horizon;
    // user-grid-sized arithmetic past one corpus aggregate.
    QueryDef("q276_survival_curve",
      (s, d) => {
        val dd = datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long")
        // cut: the user-grid lifespan frame feeds the total agg and the
        // horizon explode — one corpus scan (the staging line)
        val life = graft.operators.Checkpoints.cut(
          ev(s, d).groupBy("user_id").agg((max(dd) - min(dd)).as("ld")))
        val tot = life.agg(count(lit(1)).as("n_total"))
        val res = life.withColumn("k", explode(sequence(lit(0L), lit(30L))))
          .filter(col("ld") >= col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_alive"))
          .crossJoin(broadcast(tot))
          .withColumn("survival_micro",
            expr("n_alive * 1000000 div n_total"))
          .orderBy("k")
        graft.operators.Checkpoints.sealAndRelease(res, life)
      },
      Some("""WITH u AS (SELECT user_id,
            max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
              - min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) ld
          FROM events GROUP BY 1),
        t AS (SELECT CAST(count(*) AS BIGINT) n_total FROM u),
        k AS (SELECT unnest(generate_series(0, 30)) k)
        SELECT CAST(k.k AS BIGINT) k,
          CAST(count(*) AS BIGINT) n_alive, t.n_total,
          CAST(count(*) * 1000000 // t.n_total AS BIGINT) survival_micro
        FROM k JOIN u ON u.ld >= k.k CROSS JOIN t
        GROUP BY k.k, t.n_total ORDER BY k"""))
  )

  // q210/q218's shared oracle preamble: the coocEdges CTEs + `n` LPA
  // rounds unrolled as chained CTEs, each round the grouped
  // neighbor-label count, the (count DESC, label ASC) winner via
  // row_number, and the parity-gated adoption — op-for-op the lpaRound
  // dataflow. Yields CTE text ending at l$n (id, lbl); callers append
  // their own SELECT.
  private def lpaCtes(n: Int): String = {
    val rounds = (0 until n).map { r =>
      s"""b$r AS (SELECT s, l FROM (
            SELECT bo.s, lb.lbl l, row_number() OVER (PARTITION BY bo.s
                ORDER BY count(*) DESC, lb.lbl) rn
              FROM bo JOIN l$r lb ON bo.d = lb.id GROUP BY bo.s, lb.lbl)
            WHERE rn = 1),
          l${r + 1} AS MATERIALIZED (SELECT
              n.id, CASE WHEN len(n.id) % 2 = ${r % 2} AND b.l IS NOT NULL
                THEN b.l ELSE n.lbl END lbl
            FROM l$r n LEFT JOIN b$r b ON n.id = b.s)"""
    }.mkString(",\n          ")
    s"""$coocCtes,
          l0 AS MATERIALIZED (SELECT DISTINCT s id, s lbl FROM bo),
          $rounds"""
  }

  // The memoized coocEdges artifact as DuckDB CTEs (`e0` = the top-100
  // undirected pairs, `bo` = both directions) — shared by the LPA oracle
  // preamble and q263's TextRank oracle.
  private def coocCtes: String =
    s"""x AS (SELECT doc_id, list_distinct(${TextShared.OToks}) t
            FROM documents),
          tok AS (SELECT doc_id, unnest(t) w FROM x),
          pr AS (SELECT a.w wa, b.w wb, count(*) c FROM tok a
                 JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2),
          rk AS (SELECT wa, wb, row_number() OVER (
              ORDER BY c DESC, wa, wb) r FROM pr),
          e0 AS MATERIALIZED (SELECT wa, wb FROM rk WHERE r <= 100),
          bo AS MATERIALIZED (SELECT wa s, wb d FROM e0
            UNION ALL SELECT wb, wa FROM e0)"""

  private def lpaOracleSql(n: Int): String =
    s"""WITH ${lpaCtes(n)}
        SELECT id AS token, lbl AS community FROM l$n ORDER BY token"""

  // q263's oracle: the cooc preamble + three unrolled integer PageRank
  // rounds (the q157 arithmetic — 150000 + 85·insum // 100 — with no
  // dangling term: an undirected graph has no dangling nodes, so the
  // operator's dangling mass is exactly zero every round).
  private def textRankOracleSql: String = {
    val rounds = (1 to 3).map { r =>
      s"""c$r AS (SELECT e.dst id, sum(rr.rank // rr.outw) insum
            FROM e JOIN r${r - 1} rr ON e.src = rr.id GROUP BY 1),
          r$r AS (SELECT b.id, b.outw,
              150000 + (85 * coalesce(c$r.insum, 0)) // 100 rank
            FROM base b LEFT JOIN c$r ON b.id = c$r.id)"""
    }.mkString(",\n        ")
    s"""WITH $coocCtes,
        e AS (SELECT s src, d dst FROM bo),
        nodes AS (SELECT DISTINCT src id FROM e),
        ow AS (SELECT src id, count(*) outw FROM e GROUP BY 1),
        base AS (SELECT nodes.id, ow.outw FROM nodes JOIN ow USING (id)),
        r0 AS (SELECT id, outw, 1000000::BIGINT rank FROM base),
        $rounds
        SELECT id AS token, CAST(rank AS BIGINT) rank_micro FROM r3
        ORDER BY rank_micro DESC, token"""
  }
}
