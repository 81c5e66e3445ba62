package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Upsert}

/** Relational closure of the reference's data model (SURVEY.md §2b):
  * scans, projection/filter, every join shape, aggregation incl.
  * rollup/cube/grouping-sets, window functions, sort/top-k, set ops,
  * scalar string/date/JSON functions, banded range join, as-of join,
  * keyed upsert (the reference's U1–U3 semantics).
  *
  * Scale notes are per-query; the common rules: filters/projections stay
  * declarative so Catalyst pushes them into the parquet scan; dimension
  * joins are explicitly `broadcast()`; fact-fact joins shuffle once on the
  * join key and rely on AQE for skew; no `.collect()` anywhere.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)
  private def reg(s: SparkSession, d: String) = Tables.region(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q01: full-scan hash aggregate (TPC-H Q1 shape). Partial (map-side)
    // aggregation is automatic for sum/avg/count; at 100 TB this is one
    // scan + one 6-group shuffle — optimal.
    QueryDef("q01_agg_pricing",
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity),2) AS sum_qty,
        round(sum(l_extendedprice),2) AS sum_base_price,
        round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        round(avg(l_quantity),4) AS avg_qty,
        round(avg(l_discount),4) AS avg_disc,
        count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // q02: selective filter + narrow projection. Both the two predicates and
    // the 4-column ReadSchema reach the parquet reader (PushedFilters).
    QueryDef("q02_filter_pushdown",
      (s, d) => li(s, d)
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 5.0)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 5.0
        ORDER BY l_orderkey, l_linenumber""")),

    // q03: star join — orders (fact) against customer/nation/region dims.
    // nation+region are broadcast explicitly; customer is small here but
    // grows with SF, so it's left to AQE (broadcast at 15k rows, shuffle at
    // 100 TB where it no longer fits).
    QueryDef("q03_star_join_broadcast",
      (s, d) => ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("r_name"),
      Some("""SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
        FROM orders JOIN customer ON o_custkey=c_custkey
        JOIN nation ON c_nationkey=n_nationkey
        JOIN region ON n_regionkey=r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // q04: fact-fact join (lineitem ⨝ orders): single shuffle each side on
    // the orderkey, sort-merge at scale, AQE may demote to shuffled-hash.
    QueryDef("q04_factfact_join",
      (s, d) => li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
        round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // q05: left outer join preserving customers without orders.
    QueryDef("q05_left_join",
      (s, d) => cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_orders"),
          round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("revenue"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust,
        count(o_orderkey) AS n_orders,
        round(sum(coalesce(o_totalprice,0)),2) AS revenue
        FROM customer LEFT JOIN orders ON c_custkey=o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // q06: left-semi (EXISTS) — customers with at least one big order,
    // rolled up to nation. Semi join only ships the key column.
    QueryDef("q06_semi_join",
      (s, d) => cust(s, d)
        .join(ord(s, d).filter(col("o_totalprice") > 400000.0).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("n_name"),
      Some("""SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey=n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice > 400000.0)
        GROUP BY n_name ORDER BY n_name""")),

    // q07: left-anti (NOT EXISTS) — customers who never placed a >400k order.
    QueryDef("q07_anti_join",
      (s, d) => cust(s, d)
        .join(ord(s, d).filter(col("o_totalprice") > 400000.0).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal),2) AS total_bal
        FROM customer WHERE NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice > 400000.0)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // q08: ranking window — top-3 customers per market segment. row_number
    // (not rank) + unique tie-break keys ⇒ deterministic.
    QueryDef("q08_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        cust(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
          .orderBy("c_mktsegment", "rn")
      },
      Some("""SELECT c_mktsegment, CAST(rn AS INTEGER) AS rn, c_custkey, c_acctbal FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer) t
        WHERE rn <= 3 ORDER BY c_mktsegment, rn""")),

    // q09: running-total frame (rowsBetween unbounded..current) over a
    // total order; restricted to 5 suppliers to keep output bounded.
    QueryDef("q09_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li(s, d).filter(col("l_suppkey") <= 5)
          .withColumn("running_rev", round(sum(col("l_extendedprice")).over(w), 2))
          .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "running_rev")
          .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
          round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_rev
        FROM lineitem WHERE l_suppkey <= 5
        ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""")),

    // q10: analytic lag — days since the customer's previous order.
    QueryDef("q10_window_lag",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        ord(s, d).filter(col("o_custkey") <= 100)
          .withColumn("days_since_prev",
            datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
          .select("o_custkey", "o_orderkey", "o_orderdate", "days_since_prev")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
          CAST(date_diff('day',
            CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
            CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
        FROM orders WHERE o_custkey <= 100
        ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // q11: ROLLUP region→nation; NULL grouping levels made explicit so the
    // sort order is engine-independent.
    QueryDef("q11_rollup",
      (s, d) => cust(s, d)
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"), col("total_bal"))
        .orderBy("region", "nation"),
      Some("""SELECT coalesce(r_name,'ALL') AS region, coalesce(n_name,'ALL') AS nation,
          count(*) AS n_cust, round(sum(c_acctbal),2) AS total_bal
        FROM customer JOIN nation ON c_nationkey=n_nationkey
        JOIN region ON n_regionkey=r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region, nation""")),

    // q12: CUBE over the two lineitem status flags.
    QueryDef("q12_cube",
      (s, d) => li(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT coalesce(l_returnflag,'ALL') AS returnflag,
          coalesce(l_linestatus,'ALL') AS linestatus,
          round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    // q13: exact distinct aggregation (expand-based in Spark; the shuffle
    // key widens to include the distinct column — fine, it's the plan you
    // want at scale vs a two-pass self-join).
    // sum (not avg) for the price metric: 2-decimal grid data keeps the
    // true sum on-grid, immune to summation-order noise; avg over a group
    // whose size is 2^a·5^b (e.g. 320 at sf0.001) terminates exactly on
    // the rounding boundary and 1-ulp order noise flips it.
    QueryDef("q13_count_distinct",
      (s, d) => ord(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
          count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // q14: global top-k — Spark's sort+limit runs as a per-partition top-k
    // then a single-reducer merge of k·partitions rows (TakeOrderedAndProject),
    // so it never globally sorts 100 TB.
    QueryDef("q14_global_topk",
      (s, d) => li(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(50),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 50""")),

    // q15: INTERSECT — customers that placed both an 'F' and an 'O' order.
    QueryDef("q15_intersect",
      (s, d) => {
        val o = ord(s, d)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
          .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
          .orderBy("custkey")
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus='F'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus='O'
        ORDER BY custkey""")),

    // q16: EXCEPT — customers with 'O' orders but no 'F' orders.
    QueryDef("q16_except",
      (s, d) => {
        val o = ord(s, d)
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
          .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
          .orderBy("custkey")
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus='O'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus='F'
        ORDER BY custkey""")),

    // q17: scalar string functions (all codegen'd built-ins, no UDFs).
    QueryDef("q17_string_funcs",
      (s, d) => Tables.part(s, d)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, lower(p_name) AS name_lc,
          regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
          string_split(p_name, ' ')[1] AS first_word,
          concat_ws('|', p_brand, p_type) AS brand_type,
          CAST(length(p_name) AS INTEGER) AS name_len
        FROM part ORDER BY p_partkey""")),

    // q18: date functions — monthly order rollup.
    QueryDef("q18_date_funcs",
      (s, d) => ord(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
        .withColumn("yr", year(col("month")))
        .withColumn("qtr", quarter(col("month")))
        .select("month", "yr", "qtr", "n_orders", "revenue")
        .orderBy("month"),
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
          CAST(year(date_trunc('month', o_orderdate)) AS INTEGER) AS yr,
          CAST(quarter(date_trunc('month', o_orderdate)) AS INTEGER) AS qtr,
          count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
        FROM orders GROUP BY date_trunc('month', o_orderdate)
        ORDER BY month""")),

    // q19: JSON extraction from events.props (the reference's nested-JSON
    // input model, S1/P2, applied to a string column).
    // sum (not avg): input is a 2-decimal grid, so the true sum is on-grid
    // and 2-dp rounding is immune to float-order noise; avg leaves the grid
    // and power-of-two group sizes land exactly on the rounding boundary.
    QueryDef("q19_json_funcs",
      (s, d) => ev(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k"),
      Some("""SELECT CAST(json_extract_string(props,'$.k') AS INTEGER) AS k,
          count(*) AS n, round(sum("value"),2) AS sum_value
        FROM events GROUP BY 1 ORDER BY k""")),

    // q20: CASE bucketing + multi-key aggregate.
    QueryDef("q20_case_buckets",
      (s, d) => cust(s, d)
        .withColumn("bal_bucket",
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high"))
        .groupBy(col("c_mktsegment"), col("bal_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment", "bal_bucket"),
      Some("""SELECT c_mktsegment,
          CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_bucket,
          count(*) AS n
        FROM customer GROUP BY 1, 2 ORDER BY c_mktsegment, bal_bucket""")),

    // q21: banded range join — click within 60s after a view, same user.
    // Spark-first: instead of a theta join (O(n·m) compare), bucket event
    // time to 60s cells and equi-join on (user, bucket) with the click
    // exploded into its cell and the previous one; the range predicate then
    // filters exactly. Scales linearly; the naive inequality join would not.
    QueryDef("q21_band_join",
      (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("event_type"),
          col("ts").cast("double").as("tsec"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("tsec").as("v_tsec"),
            floor(col("tsec") / 60).as("bkt"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsec").as("c_tsec"),
            explode(array(floor(col("tsec") / 60), floor(col("tsec") / 60) - 1)).as("bkt"))
        views.join(clicks, Seq("user_id", "bkt"))
          .filter(col("c_tsec") >= col("v_tsec") && col("c_tsec") <= col("v_tsec") + 60.0)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      Some("""SELECT v.user_id AS user_id, count(*) AS n_pairs
        FROM events v JOIN events c
          ON c.user_id = v.user_id
         AND v.event_type='view' AND c.event_type='click'
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 60 SECOND
        GROUP BY v.user_id ORDER BY 1""")),

    // q22: as-of join — for each purchase, the most recent signup at or
    // before it (same user). Union+window formulation: one shuffle, no
    // cross product (operators.AsOfJoin).
    QueryDef("q22_asof_join",
      (s, d) => {
        val e = ev(s, d)
        val withAsof = AsOfJoin.lastValueAsOf(
          e.filter(col("event_type").isin("purchase", "signup")),
          isRight = col("event_type") === "signup",
          valueCol = col("ts"),
          partition = Seq(col("user_id")),
          ts = col("ts"),
          tieBreak = col("event_id"))
        withAsof.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("_graft_asof").as("last_signup_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id, p.ts, max(s.ts) AS last_signup_ts
        FROM events p LEFT JOIN events s
          ON s.user_id = p.user_id AND s.event_type='signup' AND s.ts <= p.ts
        WHERE p.event_type='purchase'
        GROUP BY p.event_id, p.user_id, p.ts
        ORDER BY p.event_id""")),

    // q80: the SAME as-of semantics through the native custom operator
    // (graft.plans: AsOfJoinPlan + AsOfJoinStrategy + AsOfJoinExec —
    // SURVEY §2b preference (c), the full Catalyst extension stack), gated
    // on q22's oracle. Sort-merge cost model: one exchange per side, one
    // (key, time) sort each, O(1)-state forward merge.
    QueryDef("q80_asof_native",
      (s, d) => {
        val e = ev(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val signups = e.filter(col("event_type") === "signup")
          .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
        graft.plans.AsOfJoinNative(purchases, signups,
          Seq("user_id"), Seq("s_user_id"), "ts", "signup_ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("signup_ts").as("last_signup_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id, p.ts, max(s.ts) AS last_signup_ts
        FROM events p LEFT JOIN events s
          ON s.user_id = p.user_id AND s.event_type='signup' AND s.ts <= p.ts
        WHERE p.event_type='purchase'
        GROUP BY p.event_id, p.user_id, p.ts
        ORDER BY p.event_id""")),

    // q23: keyed upsert (reference U1–U3): derived update batch replaces
    // every 7th order; merged via operators.Upsert (single shuffle window
    // merge), then aggregated.
    QueryDef("q23_upsert",
      (s, d) => {
        val base = ord(s, d)
        // ×2 is exact in binary floating point — no per-row rounding, which
        // would diverge between Spark (BigDecimal HALF_UP on the shortest
        // decimal repr) and C-family engines (scaled std::round).
        val updates = base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", col("o_totalprice") * 2.0)
        Upsert(base, updates, Seq("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH merged AS (
          SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice*2.0 ELSE o_totalprice END AS o_totalprice
          FROM orders)
        SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice),2) AS total
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // q26: supplier-side join slice (completes table coverage): revenue by
    // supplier nation. supplier is mid-sized — left to AQE to pick
    // broadcast here vs shuffle at scale; nation is always broadcast.
    QueryDef("q26_supplier_join",
      (s, d) => li(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy("n_name"),
      Some("""SELECT n_name, count(*) AS n_items,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // q24: approximate distinct (HLL++). Sketch values differ across
    // engines by design → rows-only driver check, no SQL oracle.
    QueryDef("q24_approx_distinct",
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag"),
      None),

    // q116: hierarchical HLL sketch ROLLUP (DataSketches hll_sketch_agg /
    // hll_union_agg / hll_sketch_estimate) — the pre-aggregated-sketch
    // pattern a 100 TB warehouse lives on: fine-grain (nation-level)
    // sketches are built ONCE in one shuffle and stored as mergeable
    // binary state; every coarser rollup (region, global) is a cheap
    // union over sketch bytes, never a re-scan of the fact table.
    // HLL register state is max-based ⇒ order-independent and
    // merge-associative, so union-of-sketches ≡ sketch-of-union exactly
    // (SketchToleranceSpec pins that identity and the ±2% accuracy);
    // estimates are approximate ⇒ driver rows-only, like q24/q71.
    QueryDef("q116_hll_rollup",
      (s, d) => {
        val perNation = cust(s, d)
          .groupBy(col("c_nationkey"))
          .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"),
            countDistinct(col("c_custkey")).as("exact"))
        perNation
          .join(broadcast(nat(s, d).select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg(s, d).select(col("r_regionkey"), col("r_name"))),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_customers"),
            sum(col("exact")).as("exact_customers"))
          .orderBy("r_name")
      },
      None),

    // q25: GROUPING SETS via the SQL front-end (distinct region / nation /
    // grand-total levels in one pass over the join).
    QueryDef("q25_grouping_sets",
      (s, d) => {
        cust(s, d).createOrReplaceTempView("graft_q25_customer")
        nat(s, d).createOrReplaceTempView("graft_q25_nation")
        reg(s, d).createOrReplaceTempView("graft_q25_region")
        s.sql("""SELECT coalesce(r_name,'ALL') AS region, coalesce(n_name,'ALL') AS nation,
            count(1) AS n_cust, round(sum(c_acctbal),2) AS total_bal
          FROM graft_q25_customer JOIN graft_q25_nation ON c_nationkey=n_nationkey
          JOIN graft_q25_region ON n_regionkey=r_regionkey
          GROUP BY GROUPING SETS ((r_name),(n_name),())
          ORDER BY region, nation""")
      },
      Some("""SELECT coalesce(r_name,'ALL') AS region, coalesce(n_name,'ALL') AS nation,
          count(*) AS n_cust, round(sum(c_acctbal),2) AS total_bal
        FROM customer JOIN nation ON c_nationkey=n_nationkey
        JOIN region ON n_regionkey=r_regionkey
        GROUP BY GROUPING SETS ((r_name),(n_name),())
        ORDER BY region, nation""")),

    // q117: collation-aware grouping (Spark 4 collations GA): group
    // case-insensitively via COLLATE UTF8_LCASE — the engine-level
    // answer to mixed-case feeds, replacing the lower()-everywhere
    // workaround. The group representative is min(original) — a
    // deterministic byte-order choice both engines share — so the result
    // hash-matches even though the collated grouping key itself has no
    // canonical display form. Mixed case is planted by partkey parity.
    QueryDef("q117_collated_group",
      (s, d) => {
        val b = when(pmod(col("p_partkey"), lit(2)) === 0,
          upper(col("p_brand"))).otherwise(lower(col("p_brand")))
        Tables.part(s, d).select(b.as("b"))
          .groupBy(expr("collate(b, 'UTF8_LCASE')").as("bc"))
          .agg(min("b").as("brand_repr"), count(lit(1)).as("n"))
          .select(col("brand_repr"), col("n"))
          .orderBy("brand_repr")
      },
      Some("""WITH x AS (SELECT CASE WHEN p_partkey % 2 = 0
            THEN upper(p_brand) ELSE lower(p_brand) END b FROM part)
        SELECT min(b) AS brand_repr, count(*) AS n
        FROM x GROUP BY lower(b) ORDER BY brand_repr""")),

    // ------------------------------------------------------------------
    // q118-q120: TPC-H composition showcases (Q3/Q5/Q10 adapted to the
    // testdata's trimmed columns) — multi-join + filter + agg + top-k
    // plans Catalyst must get right end-to-end: dim filters push into
    // scans, small sides broadcast, the top-k is TakeOrderedAndProject.
    // Revenue uses the INTEGER-EXACT cents idiom: round(price·100) and
    // round(discount·100) recover the 2-decimal source grid exactly, so
    // Σ cents·(100−disc) is a long — order-independent, engine-portable —
    // and the one final /10000.0 division is IEEE-identical in both
    // engines. No float-sum-order or round-half hazard anywhere, and the
    // top-k ranks on the integer.

    // q118: TPC-H Q3 — shipping-priority top 10 (BUILDING segment,
    // orders before / shipments after the cutoff).
    QueryDef("q118_tpch_q3",
      (s, d) => cust(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(ord(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01"))
        .join(li(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > lit("1998-01-01"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_micro"))
        .orderBy(col("rev_micro").desc, col("l_orderkey")).limit(10)
        .select(col("l_orderkey"),
          (col("rev_micro") / lit(10000.0)).as("revenue"), col("o_orderdate")),
      Some("""SELECT l_orderkey,
          sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0::DOUBLE
            AS revenue,
          CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))) DESC, l_orderkey
        LIMIT 10""")),

    // q119: TPC-H Q5 — local-supplier volume (ASIA, 1996): six-table
    // join where customer and supplier must share a nation.
    QueryDef("q119_tpch_q5",
      (s, d) => cust(s, d)
        .join(ord(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .join(li(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_micro"))
        .select(col("n_name"), (col("rev_micro") / lit(10000.0)).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
      Some("""SELECT n_name,
          sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0::DOUBLE
            AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // q120: TPC-H Q10 — returned-item top customers (one quarter of
    // returns, top 20 by lost revenue).
    QueryDef("q120_tpch_q10",
      (s, d) => cust(s, d)
        .join(ord(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
        .join(li(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_micro"))
        .orderBy(col("rev_micro").desc, col("c_custkey")).limit(20)
        .select(col("c_custkey"), col("c_name"),
          (col("rev_micro") / lit(10000.0)).as("revenue"),
          col("c_acctbal"), col("n_name")),
      Some("""SELECT c_custkey, c_name,
          sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0::DOUBLE
            AS revenue,
          c_acctbal, n_name
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))) DESC, c_custkey
        LIMIT 20""")),

    // q269: TPC-H Q18 (large-volume customers) — the classic
    // HAVING-subquery shape the first three TPC-H picks (Q3/Q5/Q10)
    // don't cover: a grouped-aggregate filter (orders whose total
    // quantity > 180) SEMI-joins back into a 3-table join and
    // re-aggregates. Plan shape: the HAVING aggregate is one lineitem
    // shuffle whose qualifying keys semi-join the fact side (Spark
    // rewrites IN (subquery) to LeftSemi), the customer dim broadcasts,
    // and the top-100 is TakeOrderedAndProject, never a global sort.
    // Quantities are integral doubles, so sums are exact.
    QueryDef("q269_tpch_q18",
      (s, d) => {
        val big = li(s, d).groupBy("l_orderkey")
          .agg(sum("l_quantity").as("qty"))
          .filter(col("qty") > 180.0)
          .select(col("l_orderkey").as("bk"))
        ord(s, d).join(big, col("o_orderkey") === col("bk"), "left_semi")
          .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"))
          .agg(sum("l_quantity").cast("long").as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
          CAST(o_orderdate AS TIMESTAMP) o_orderdate, o_totalprice,
          CAST(sum(l_quantity) AS BIGINT) total_qty
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
          GROUP BY 1 HAVING sum(l_quantity) > 180)
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // q273: TPC-H Q4 shape (order-priority checking) — the correlated
    // EXISTS the Q-pick set still lacked: a date-ranged order slice
    // keeps only orders with at least one LATE lineitem (shipped > 30
    // days after order date — the schema has no commit/receipt dates,
    // so lateness stands in for Q4's commit<receipt predicate; the
    // plan shape is identical), then counts by priority. Spark plans
    // the EXISTS as a LeftSemi with the date filters pushed to both
    // scans.
    QueryDef("q273_tpch_q4",
      (s, d) => {
        val o = ord(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        val late = li(s, d).select(col("l_orderkey"), col("l_shipdate"))
        o.join(late, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY 1 ORDER BY 1""")),

    // q279: TPC-H Q12 shape (shipping-mode priority split) — the
    // conditional-aggregation join: lineitem ⋈ orders with the
    // high/low-priority CASE folded into the aggregate (the schema has
    // no shipmode, so l_returnflag plays the grouping role; the plan
    // shape — one fact join, per-group conditional counts, date range
    // pushed to the lineitem scan — is Q12's). One shuffle join, the
    // orders side projected to two columns.
    QueryDef("q279_tpch_q12",
      (s, d) => {
        val l = li(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select("l_orderkey", "l_returnflag")
        l.join(ord(s, d).select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
              1L).otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
              1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) high_line_count,
          CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1 ORDER BY 1""")),

    // q280: TPC-H Q17 shape (small-quantity-order revenue) — the
    // correlated SCALAR-subquery decorrelation, the one classic
    // optimizer shape the Q-pick set (Q3/Q5/Q10/Q18/Q4/Q12) still
    // lacked: "lineitems of this brand whose quantity is below 20% of
    // THE PART's average quantity". Written as the literal correlated
    // scalar subquery so Catalyst's RewriteCorrelatedScalarSubquery is
    // what's under test: the per-row subplan must decorrelate to ONE
    // per-part avg aggregate equi-joined back to the fact — the plan a
    // 100 TB run survives on (a per-row re-aggregation of lineitem per
    // probe row would be quadratic); PlanGuardSpec pins exactly that.
    // Determinism: quantities are integral doubles ≤ 50 with per-part
    // counts ≪ 2⁵³, so sum/count/0.2× are the identical IEEE ops both
    // engines; revenue rides the cents idiom, avg_yearly = cents/700.0
    // is the single consumer division (Q17's /7.0 on whole prices).
    QueryDef("q280_tpch_q17",
      (s, d) => {
        li(s, d).createOrReplaceTempView("graft_q280_lineitem")
        Tables.part(s, d).createOrReplaceTempView("graft_q280_part")
        s.sql("""SELECT
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) sum_cents,
            count(1) n_lines,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS DOUBLE) / CAST(700 AS DOUBLE) avg_yearly
          FROM graft_q280_lineitem l JOIN graft_q280_part p
            ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#1'
            AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
              FROM graft_q280_lineitem l2
              WHERE l2.l_partkey = p.p_partkey)""")
      },
      Some("""SELECT
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            sum_cents,
          CAST(count(*) AS BIGINT) n_lines,
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
            / CAST(700 AS DOUBLE) avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""")),

    // q283: TPC-H Q22 shape (global sales opportunity) — the remaining
    // classic subquery combination: an UNCORRELATED scalar subquery (the
    // global positive-balance average — must plan as ONE 1-row aggregate
    // evaluated once and reused as a literal, never re-run per row) AND
    // a NOT EXISTS (customers with no RECENT orders — must plan as a
    // LeftAnti with the date filter pushed to the orders scan, the q273
    // EXISTS shape's complement; Q22's "no orders in 7 years" becomes
    // "none since 2001-01-01" on this data's 1995–2001 axis — the churn
    // read). c_nationkey plays Q22's phone-country-code grouping role. Determinism: balances ride the
    // cents idiom; the threshold avg = sum/count of exact longs is one
    // identical IEEE division both engines, and the long-vs-double
    // compare promotes exactly (cents ≪ 2⁵³).
    QueryDef("q283_tpch_q22",
      (s, d) => {
        cust(s, d).createOrReplaceTempView("graft_q283_customer")
        ord(s, d).createOrReplaceTempView("graft_q283_orders")
        s.sql("""SELECT c_nationkey, count(1) numcust,
            CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
              totacctbal_cents
          FROM graft_q283_customer c
          WHERE CAST(round(c_acctbal * 100) AS BIGINT) > (
              SELECT avg(CAST(round(c2.c_acctbal * 100) AS BIGINT))
              FROM graft_q283_customer c2 WHERE c2.c_acctbal > CAST(0 AS DOUBLE))
            AND NOT EXISTS (SELECT 1 FROM graft_q283_orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2001-01-01')
          GROUP BY c_nationkey ORDER BY c_nationkey""")
      },
      Some("""SELECT CAST(c_nationkey AS INTEGER) c_nationkey,
          CAST(count(*) AS BIGINT) numcust,
          CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
            totacctbal_cents
        FROM customer c
        WHERE CAST(round(c_acctbal * 100) AS BIGINT) > (
            SELECT avg(CAST(round(c2.c_acctbal * 100) AS BIGINT))
            FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // q287: TPC-H Q21 shape (suppliers who kept orders waiting) — the
    // DOUBLE-correlated subquery: the same derived fact frame probed by
    // an EXISTS (the order is multi-supplier) AND a NOT EXISTS (no
    // OTHER supplier was late) with opposite polarities, each carrying
    // a non-equi conjunct (suppkey <>) beside the orderkey equality.
    // Catalyst must decorrelate BOTH into a LeftSemi + LeftAnti chain
    // on the orderkey — the only shape that survives scale (a per-row
    // probe of the fact frame would be quadratic). Lateness is
    // l_shipdate > o_orderdate + 60 days (the schema has no
    // commit/receipt dates — the q273 stand-in); the top-25 rides
    // (numwait DESC, s_name), a total order.
    QueryDef("q287_tpch_q21",
      (s, d) => {
        li(s, d).createOrReplaceTempView("graft_q287_lineitem")
        ord(s, d).createOrReplaceTempView("graft_q287_orders")
        Tables.supplier(s, d).createOrReplaceTempView("graft_q287_supplier")
        s.sql("""WITH lx AS (SELECT l_orderkey, l_suppkey,
              (l_shipdate > o_orderdate + INTERVAL 60 DAYS) late
            FROM graft_q287_lineitem JOIN graft_q287_orders
              ON l_orderkey = o_orderkey)
          SELECT s_name, count(1) numwait
          FROM graft_q287_supplier, lx l1
          WHERE l1.l_suppkey = s_suppkey AND l1.late
            AND EXISTS (SELECT 1 FROM lx l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lx l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
          GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25""")
      },
      Some("""WITH lx AS (SELECT l_orderkey, l_suppkey,
            (l_shipdate > o_orderdate + INTERVAL 60 DAY) late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT s_name, CAST(count(*) AS BIGINT) numwait
        FROM supplier, lx l1
        WHERE l1.l_suppkey = s_suppkey AND l1.late
          AND EXISTS (SELECT 1 FROM lx l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lx l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25""")),

    // q290: TPC-H Q13 shape (customer distribution) — the ON-clause-
    // filter outer join: the order predicate lives in the JOIN
    // CONDITION, not the WHERE, so customers with no qualifying orders
    // survive as c_count = 0 — the classic shape that separates
    // engineers who know outer-join semantics from those who filter
    // after and silently drop the zero bucket (326 customers at
    // sf0.01). Two aggregations: per-customer count, then the
    // count-of-counts histogram — Q13's custdist. One outer shuffle
    // join + two tiny aggs; the date predicate prunes the orders scan.
    QueryDef("q290_tpch_q13",
      (s, d) => cust(s, d)
        .join(ord(s, d),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp"),
          "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""WITH co AS (SELECT c_custkey, count(o_orderkey) c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey
              AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY 1)
        SELECT CAST(c_count AS BIGINT) c_count,
          CAST(count(*) AS BIGINT) custdist
        FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    // q292: TPC-H Q15 shape (top supplier) — the aggregate-of-aggregate
    // scalar equality: a derived revenue view referenced TWICE, once as
    // the join side and once under max() — suppliers achieving exactly
    // the maximum quarterly revenue. The plan question it pins: the
    // uncorrelated max is one 1-row aggregate over the SAME derived
    // frame (never a per-row re-aggregation), and the view's date range
    // pushes to both lineitem reads. Cents idiom ⇒ the equality compare
    // is exact integers (Q15's own definition needs exact equality —
    // float revenue would make "= max" nondeterministic).
    QueryDef("q292_tpch_q15",
      (s, d) => {
        li(s, d).createOrReplaceTempView("graft_q292_lineitem")
        Tables.supplier(s, d).createOrReplaceTempView("graft_q292_supplier")
        s.sql("""WITH rev AS (SELECT l_suppkey,
              sum(CAST(round(l_extendedprice * 100) AS BIGINT)) total_cents
            FROM graft_q292_lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
          SELECT s_suppkey, s_name, total_cents
          FROM graft_q292_supplier JOIN rev ON s_suppkey = l_suppkey
          WHERE total_cents = (SELECT max(total_cents) FROM rev)
          ORDER BY s_suppkey""")
      },
      Some("""WITH rev AS (SELECT l_suppkey,
            sum(CAST(round(l_extendedprice * 100) AS BIGINT)) total_cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_cents AS BIGINT) total_cents
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_cents = (SELECT max(total_cents) FROM rev)
        ORDER BY s_suppkey""")),

    // q293: TPC-H Q16 shape (parts/supplier relationship) — the NOT IN
    // subquery: NULL-AWARE anti-join semantics (a single NULL in the
    // subquery would empty the result — the classic NOT IN footgun;
    // Spark plans it as a null-aware anti join, never a plain LeftAnti),
    // an IN-list predicate that must push to the part scan, and a
    // count(DISTINCT) re-aggregation. The excluded set is the
    // negative-balance suppliers (the schema has no complaints column);
    // lineitem plays partsupp's association role.
    QueryDef("q293_tpch_q16",
      (s, d) => {
        li(s, d).createOrReplaceTempView("graft_q293_lineitem")
        Tables.part(s, d).createOrReplaceTempView("graft_q293_part")
        Tables.supplier(s, d).createOrReplaceTempView("graft_q293_supplier")
        s.sql("""SELECT p_brand, p_size, count(DISTINCT l_suppkey) supplier_cnt
          FROM graft_q293_lineitem JOIN graft_q293_part
            ON p_partkey = l_partkey
          WHERE p_size IN (1, 5, 9, 13)
            AND l_suppkey NOT IN (SELECT s_suppkey FROM graft_q293_supplier
              WHERE s_acctbal < CAST(0 AS DOUBLE))
          GROUP BY p_brand, p_size
          ORDER BY supplier_cnt DESC, p_brand, p_size""")
      },
      Some("""SELECT p_brand, CAST(p_size AS INTEGER) p_size,
          CAST(count(DISTINCT l_suppkey) AS BIGINT) supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size IN (1, 5, 9, 13)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
            WHERE s_acctbal < 0)
        GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size""")),

    // q294: TPC-H Q19 shape (discounted revenue) — the DISJUNCTIVE join
    // predicate: an OR of three conjunctive (brand-set, size-range,
    // quantity-range) arms over lineitem ⋈ part. What it pins: the
    // optimizer must EXTRACT the common p_partkey = l_partkey equality
    // out of the disjunction and plan an equi-join (hash machinery)
    // with the OR as a post-join filter — a naive planner that treats
    // the whole predicate as the join condition falls into a
    // nested-loop, the classic Q19 failure; additionally each arm's
    // part-side conjuncts union into a pushable part-scan filter.
    // Revenue on the cents grid.
    QueryDef("q294_tpch_q19",
      (s, d) => li(s, d)
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_size").between(1, 20) &&
            col("l_quantity").between(1.0, 20.0)) ||
          (col("p_brand").isin("Brand#11", "Brand#12") &&
            col("p_size").between(1, 30) &&
            col("l_quantity").between(15.0, 35.0)) ||
          (col("p_brand").isin("Brand#21", "Brand#22") &&
            col("p_size").between(1, 40) &&
            col("l_quantity").between(30.0, 50.0)))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("revenue_cents"),
          count(lit(1)).as("n_lines")),
      Some("""SELECT
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            revenue_cents,
          CAST(count(*) AS BIGINT) n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
            AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 1 AND 20)
          OR (p_brand IN ('Brand#11', 'Brand#12')
            AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 15 AND 35)
          OR (p_brand IN ('Brand#21', 'Brand#22')
            AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 30 AND 50)""")),

    // q296: TPC-H Q20 shape (potential part promotion) — the last classic
    // decorrelation the sweep lacked: a CORRELATED SCALAR SUBQUERY nested
    // INSIDE an IN-subquery, two levels deep. Q20's partsupp surrogate on
    // this schema is the per-(part, supplier) all-time shipped total (the
    // data has no availqty column); the demand side is the pair's 1996
    // shipments, correlated on BOTH keys exactly as Q20 correlates on
    // (ps_partkey, ps_suppkey). "Surplus" = stocked more than 3× what
    // 1996 demanded — mult tuned so membership is genuinely selective on
    // this data (63 of the 257 LIKE-matched parts; 0.5 saturates because
    // all-time ⊇ the year). Output at the PART grain so the hash is
    // sensitive to the inner threshold, not swamped by the 66-chances-
    // per-supplier saturation of the supplier grain. BOTH levels must
    // decorrelate — the scalar to ONE per-pair grouped aggregate equi-
    // joined back (never a per-probe-row re-aggregation of lineitem:
    // quadratic at 100 TB), the IN to a LeftSemi — PlanGuardSpec pins
    // both and the no-BNLJ/no-cartesian floor. Determinism: quantity
    // sums are integral doubles ≪ 2⁵³ (exact), 3.0× is one IEEE multiply
    // both engines agree on, and a pair with no 1996 rows yields a NULL
    // scalar → excluded identically by both engines' NULL comparison.
    QueryDef("q296_tpch_q20",
      (s, d) => {
        li(s, d).createOrReplaceTempView("graft_q296_lineitem")
        Tables.part(s, d).createOrReplaceTempView("graft_q296_part")
        s.sql("""SELECT p.p_partkey, p.p_name
          FROM graft_q296_part p
          WHERE p.p_name LIKE 'red%' AND p.p_partkey IN (
            SELECT ps.pk FROM (
              SELECT l_partkey pk, l_suppkey sk, sum(l_quantity) avail
              FROM graft_q296_lineitem GROUP BY 1, 2) ps
            WHERE ps.avail > (
              SELECT 3.0 * sum(l.l_quantity) FROM graft_q296_lineitem l
              WHERE l.l_partkey = ps.pk AND l.l_suppkey = ps.sk
                AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l.l_shipdate < TIMESTAMP '1997-01-01'))
          ORDER BY p.p_partkey""")
      },
      Some("""WITH ps AS (SELECT l_partkey pk, l_suppkey sk,
            sum(l_quantity) avail FROM lineitem GROUP BY 1, 2)
        SELECT p_partkey, p_name FROM part p
        WHERE p.p_name LIKE 'red%' AND p.p_partkey IN (
          SELECT pk FROM ps
          WHERE avail > (SELECT 3.0 * sum(l.l_quantity) FROM lineitem l
            WHERE l.l_partkey = ps.pk AND l.l_suppkey = ps.sk
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'))
        ORDER BY p_partkey""")),

    // q300: TPC-H Q7 shape (volume shipping) — the symmetric-pair
    // DISJUNCTION over two aliases of the same dimension: trade volume
    // between two geographies in both directions, grouped by the ordered
    // (exporter, importer, year) triple. Q7's nation pair is empty at
    // sf0.001 on this data, so the pair is REGIONS (identical optimizer
    // shape: two broadcast copies of the nation⋈region dim, the
    // disjunction a post-join filter that must NOT break the five equi
    // joins — PlanGuard pins no-BNLJ). Revenue rides the exact micro
    // idiom (cents × (100−disc_pct), int64).
    QueryDef("q300_tpch_q7",
      (s, d) => {
        val supN = broadcast(nat(s, d).join(reg(s, d),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("sn_key"), col("r_name").as("supp_region")))
        val cusN = broadcast(nat(s, d).join(reg(s, d),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key"), col("r_name").as("cust_region")))
        li(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(ord(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(cust(s, d), col("c_custkey") === col("o_custkey"))
          .join(supN, col("sn_key") === col("s_nationkey"))
          .join(cusN, col("cn_key") === col("c_nationkey"))
          .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
            (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
          .groupBy(col("supp_region"), col("cust_region"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("revenue_micro"))
          .orderBy("supp_region", "cust_region", "l_year")
      },
      Some("""SELECT r1.r_name supp_region, r2.r_name cust_region,
          CAST(year(l_shipdate) AS BIGINT) l_year,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
            * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
            revenue_micro
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
            OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // q301: TPC-H Q8 shape (national market share) — the conditional-
    // numerator / total-denominator RATIO of sums per year: one
    // seven-table join stream feeds BOTH sides of the share (a CASE'd
    // partial + the total partial in the same hash aggregation — never
    // two scans). Numerator and denominator ship as exact int64 micro;
    // the share is the single raw division (the q31 float stance).
    QueryDef("q301_tpch_q8",
      (s, d) => {
        val custRegion = broadcast(nat(s, d).join(reg(s, d),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "AMERICA")
          .select(col("n_nationkey").as("cn_key")))
        val supN = broadcast(nat(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
        li(s, d)
          .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
            .select("p_partkey"), col("p_partkey") === col("l_partkey"))
          .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(ord(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("o_orderkey") === col("l_orderkey"))
          .join(cust(s, d), col("c_custkey") === col("o_custkey"))
          .join(custRegion, col("cn_key") === col("c_nationkey"))
          .join(supN, col("sn_key") === col("s_nationkey"))
          .withColumn("v", round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(when(col("supp_nation") === "NATION_3", col("v"))
              .otherwise(0L)).as("mkt_num_micro"),
            sum(col("v")).as("mkt_den_micro"))
          .withColumn("mkt_share",
            col("mkt_num_micro").cast("double") /
              col("mkt_den_micro").cast("double"))
          .orderBy("o_year")
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) o_year,
          CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
              THEN CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))
              ELSE 0 END) AS BIGINT) mkt_num_micro,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
            * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
            mkt_den_micro,
          CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
              THEN CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))
              ELSE 0 END) AS DOUBLE)
            / CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
            mkt_share
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY 1""")),

    // q302: TPC-H Q9 shape (product-type profit) — revenue minus cost
    // over a name-LIKE part family, by (supplier nation, order year).
    // This schema has no partsupp, so unit cost is the part's retail
    // price (the same join topology: the cost column rides the part
    // dim into the fact aggregate). profit = rev_micro −
    // retail_cents·100·qty, every term exact int64; l_quantity is an
    // integral double ⇒ the long cast is exact.
    QueryDef("q302_tpch_q9",
      (s, d) => li(s, d)
        .join(Tables.part(s, d).filter(col("p_name").like("%blue%"))
          .select("p_partkey", "p_retailprice"),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(ord(s, d).select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nat(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")) -
            round(col("p_retailprice") * 100).cast("long") * lit(100L) *
              col("l_quantity").cast("long"))
          .as("profit_micro"))
        .orderBy(col("nation"), col("o_year").desc),
      Some("""SELECT n_name nation, CAST(year(o_orderdate) AS BIGINT) o_year,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))
            - CAST(round(p_retailprice*100) AS BIGINT) * 100
              * CAST(l_quantity AS BIGINT)) AS BIGINT) profit_micro
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%blue%'
        GROUP BY 1, 2 ORDER BY 1, 2 DESC""")),

    // q303: TPC-H Q11 shape (important stock values) — GROUP BY …
    // HAVING sum(·) > fraction × (UNCORRELATED scalar total of the same
    // frame): the scalar must plan as ONE one-shot aggregate reused as a
    // literal against the grouped result, never a per-group re-scan
    // (PlanGuard pins no-BNLJ / no surviving subquery). Value surrogate
    // for the missing partsupp: per-part revenue cents from suppliers in
    // one region. Q11's literal fraction (0.0001/SF) is SF-dependent; the
    // SCALE-FREE restatement is 1.5× the per-part average — threshold
    // (3·total) div (2·n_parts), one integer-exact one-shot scalar
    // (exact while 3·total < 2⁶³ ≈ $3×10¹⁶ regional revenue), selective
    // at every SF (14 / 331 / 2930 rows at sf0.001/0.01/0.1).
    QueryDef("q303_tpch_q11",
      (s, d) => {
        li(s, d).createOrReplaceTempView("graft_q303_lineitem")
        Tables.supplier(s, d).createOrReplaceTempView("graft_q303_supplier")
        nat(s, d).createOrReplaceTempView("graft_q303_nation")
        reg(s, d).createOrReplaceTempView("graft_q303_region")
        s.sql("""WITH val AS (SELECT l_partkey,
              CAST(round(l_extendedprice * 100) AS BIGINT) v
            FROM graft_q303_lineitem
            JOIN graft_q303_supplier ON s_suppkey = l_suppkey
            JOIN graft_q303_nation ON s_nationkey = n_nationkey
            JOIN graft_q303_region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE')
          SELECT l_partkey, CAST(sum(v) AS BIGINT) value_cents
          FROM val GROUP BY l_partkey
          HAVING sum(v) > (SELECT (3 * sum(v)) div (2 * count(DISTINCT l_partkey))
            FROM val)
          ORDER BY value_cents DESC, l_partkey""")
      },
      Some("""WITH val AS (SELECT l_partkey,
            CAST(round(l_extendedprice * 100) AS BIGINT) v
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE')
        SELECT l_partkey, CAST(sum(v) AS BIGINT) value_cents
        FROM val GROUP BY l_partkey
        HAVING sum(v) > (SELECT (3 * sum(v)) // (2 * count(DISTINCT l_partkey))
          FROM val)
        ORDER BY value_cents DESC, l_partkey""")),

    // q304: TPC-H Q14 shape (promotion effect) — the two-sided
    // conditional share over one month: promo revenue and total revenue
    // out of the SAME aggregation (one scan, one 1-row result), the
    // percentage a single pinned-order float op chain
    // (100·num exact int64 ⇒ one rounding at the division).
    QueryDef("q304_tpch_q14",
      (s, d) => li(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(Tables.part(s, d).select("p_partkey", "p_type"),
          col("p_partkey") === col("l_partkey"))
        .withColumn("v", round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .agg(sum(when(col("p_type") === "PROMO", col("v")).otherwise(0L))
            .as("promo_micro"),
          sum(col("v")).as("total_micro"))
        .withColumn("promo_pct",
          (lit(100.0) * col("promo_micro")) / col("total_micro")),
      Some("""SELECT
          CAST(sum(CASE WHEN p_type = 'PROMO'
            THEN CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))
            ELSE 0 END) AS BIGINT) promo_micro,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
            * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
            total_micro,
          (100.0 * sum(CASE WHEN p_type = 'PROMO'
            THEN CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))
            ELSE 0 END))
            / sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))) promo_pct
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'""")),

    // q305: TPC-H Q2 shape (minimum-cost supplier) — the correlated
    // scalar MIN with EQUALITY probe: for each qualifying part, the
    // suppliers (in one region) whose offer equals the regional minimum
    // for THAT part. partsupp surrogate: per-(part, supplier) minimum
    // line price in cents (exact int64, so the min and the equality are
    // exact in both engines; ties at the min all qualify, as in Q2).
    // The correlated min must decorrelate to ONE per-part aggregate
    // equi-joined back (PlanGuard pins it) — the q280 law with MIN in
    // place of AVG and an equality in place of an inequality.
    QueryDef("q305_tpch_q2",
      (s, d) => {
        li(s, d).createOrReplaceTempView("graft_q305_lineitem")
        Tables.part(s, d).createOrReplaceTempView("graft_q305_part")
        Tables.supplier(s, d).createOrReplaceTempView("graft_q305_supplier")
        nat(s, d).createOrReplaceTempView("graft_q305_nation")
        reg(s, d).createOrReplaceTempView("graft_q305_region")
        s.sql("""WITH ps AS (SELECT l_partkey pk, l_suppkey sk,
              min(CAST(round(l_extendedprice * 100) AS BIGINT)) offer_cents
            FROM graft_q305_lineitem GROUP BY 1, 2)
          SELECT p_partkey, s_name, n_name, offer_cents
          FROM graft_q305_part
          JOIN ps ON pk = p_partkey
          JOIN graft_q305_supplier ON s_suppkey = sk
          JOIN graft_q305_nation ON s_nationkey = n_nationkey
          JOIN graft_q305_region ON n_regionkey = r_regionkey
          WHERE p_size <= 10 AND p_type = 'SMALL' AND r_name = 'EUROPE'
            AND offer_cents = (SELECT min(ps2.offer_cents) FROM ps ps2
              JOIN graft_q305_supplier s2 ON s2.s_suppkey = ps2.sk
              JOIN graft_q305_nation n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN graft_q305_region r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE ps2.pk = p_partkey AND r2.r_name = 'EUROPE')
          ORDER BY p_partkey, s_name""")
      },
      Some("""WITH ps AS (SELECT l_partkey pk, l_suppkey sk,
            min(CAST(round(l_extendedprice * 100) AS BIGINT)) offer_cents
          FROM lineitem GROUP BY 1, 2)
        SELECT p_partkey, s_name, n_name, offer_cents
        FROM part JOIN ps ON pk = p_partkey
        JOIN supplier ON s_suppkey = sk
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size <= 10 AND p_type = 'SMALL' AND r_name = 'EUROPE'
          AND offer_cents = (SELECT min(ps2.offer_cents) FROM ps ps2
            JOIN supplier s2 ON s2.s_suppkey = ps2.sk
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
            WHERE ps2.pk = p_partkey AND r2.r_name = 'EUROPE')
        ORDER BY p_partkey, s_name""")),

    // q271: join-skew profiler — the PRE-join planning read behind
    // q79's salting: per fact join key, the exact hot-key census (max
    // per-key multiplicity, the key that holds it, and the skew ratio
    // max·n_keys / n_rows as an integer pair). A 100 TB join planner
    // reads this table to decide salt factors BEFORE the first OOM;
    // one count shuffle per profiled key, outputs are 1 row each.
    QueryDef("q271_join_skew_profiler",
      (s, d) => {
        def profile(df: org.apache.spark.sql.DataFrame, tbl: String,
            keyCol: String) = {
          val c = df.groupBy(col(keyCol).cast("long").as("k"))
            .agg(count(lit(1)).as("c"))
          c.agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
              max("c").as("max_c"),
              max(struct(col("c").as("c"), (col("k") * -1L).as("nk")))
                .as("mx"))
            .select(lit(tbl).as("tbl"), lit(keyCol).as("key_col"),
              col("n_rows"), col("n_keys"), col("max_c"),
              (col("mx.nk") * -1L).as("hottest_key"),
              (col("max_c") * col("n_keys")).as("skew_num"),
              col("n_rows").as("skew_den"))
        }
        Seq(profile(li(s, d), "lineitem", "l_orderkey"),
          profile(ord(s, d), "orders", "o_custkey"),
          profile(ev(s, d), "events", "user_id"))
          .reduce(_ unionByName _)
          .orderBy("tbl", "key_col")
      },
      Some("""WITH ec AS (SELECT user_id k, count(*) c FROM events GROUP BY 1),
          lc AS (SELECT l_orderkey k, count(*) c FROM lineitem GROUP BY 1),
          oc AS (SELECT o_custkey k, count(*) c FROM orders GROUP BY 1)
        SELECT * FROM (
          SELECT 'events' tbl, 'user_id' key_col,
            CAST(sum(c) AS BIGINT) n_rows, CAST(count(*) AS BIGINT) n_keys,
            CAST(max(c) AS BIGINT) max_c,
            CAST((SELECT k FROM ec ORDER BY c DESC, k LIMIT 1) AS BIGINT)
              hottest_key,
            CAST(max(c) * count(*) AS BIGINT) skew_num,
            CAST(sum(c) AS BIGINT) skew_den
          FROM ec
          UNION ALL
          SELECT 'lineitem', 'l_orderkey',
            CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
            CAST(max(c) AS BIGINT),
            CAST((SELECT k FROM lc ORDER BY c DESC, k LIMIT 1) AS BIGINT),
            CAST(max(c) * count(*) AS BIGINT), CAST(sum(c) AS BIGINT)
          FROM lc
          UNION ALL
          SELECT 'orders', 'o_custkey',
            CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
            CAST(max(c) AS BIGINT),
            CAST((SELECT k FROM oc ORDER BY c DESC, k LIMIT 1) AS BIGINT),
            CAST(max(c) * count(*) AS BIGINT), CAST(sum(c) AS BIGINT)
          FROM oc)
        ORDER BY tbl, key_col"""))
  )
}
