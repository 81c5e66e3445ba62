package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStream

/** q257's session state machine, top-level (no outer capture) so
  * StreamingSpec can drive it across REAL micro-batches — the
  * out-of-order-merge law needs two genuine batches, which the q257
  * file-source harness can't split. One ValueState tuple per live user:
  * (session_start, last_ts, n, cents), all µs/cents integers. Emits a
  * (user, start, n, cents) row the moment a ≥30-min event-time gap
  * closes a session; the open session stays in state (emit-on-close).
  * The merge keeps the high-water mark MONOTONE — last := max(last, us),
  * start := min(start, us) — so a row arriving out of order across
  * micro-batches can never rewind the gap clock and let a following
  * on-time row falsely split a session the batch oracle keeps whole
  * (ADVICE r17). Disorder tolerance is one open session deep: a row
  * arriving a full Gap before the open session's start still merges
  * into it — re-splitting history would need the closed-session log,
  * which emit-on-close has already shipped downstream.
  */
private[graft] class SessionProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long), (Long, Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  private val Gap = 1800000000L // 30 min in µs
  @transient private var st: ValueState[(Long, Long, Long, Long)] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long)]("sess",
      org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)],
      TTLConfig.NONE)
  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    var cur = if (st.exists()) Option(st.get()) else None
    sorted.foreach { case (_, us, cents) =>
      cur match {
        case Some((st0, last, n, cs)) if us - last >= Gap =>
          out += ((key, st0, n, cs))
          cur = Some((us, us, 1L, cents))
        case Some((st0, last, n, cs)) =>
          cur = Some((math.min(st0, us), math.max(last, us),
            n + 1L, cs + cents))
        case None =>
          cur = Some((us, us, 1L, cents))
      }
    }
    cur.foreach(st.update)
    out.iterator
  }
}

/** q288's per-user Misra–Gries processor, top-level (no outer capture):
  * the batch sketch's O(k) summary object IS the streaming state —
  * deserialize, fold the batch's values in, serialize back, emit the
  * tracked set. Per-key state stays ≤ k entries no matter how many rows
  * stream through. Registered at k ≥ the value-domain cardinality, where
  * MG provably never evicts and the estimates ARE the exact counts (the
  * q110 collision-free-CMS stance — the gate proves the state machinery
  * exact where exactness is decidable; the eviction regime is spec'd
  * against the MG bound in StreamingSpec, which no SQL oracle can
  * replay).
  */
private[graft] class MgProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String), (Long, String, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var st: ValueState[Array[Byte]] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Array[Byte]]("mg",
      org.apache.spark.sql.Encoders.BINARY, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, String, Long)] = {
    val s = if (st.exists()) graft.functions.MGSummary.deserialize(st.get())
      else new graft.functions.MGSummary(k)
    rows.foreach(r => s.update(r._2))
    st.update(s.serialized)
    s.sorted.iterator.map { case (tok, c) => (key, tok, c) }
  }
}

/** Streaming slice (SURVEY.md §2b): tumbling / sliding / session windows,
  * watermarks, and stateful dedup over the `events` stream. Finite input ⇒
  * final state is hash-comparable to a batch SQL oracle on the same
  * parquet.
  *
  * Mode choices, deliberately: tumbling/sliding aggregates run in
  * `complete` mode so every window is emitted regardless of where the
  * watermark lands at end-of-input (append mode would withhold the trailing
  * windows — correct streaming behavior, but not oracle-comparable).
  * Watermarks are still declared — they are what bounds state at scale.
  * Dedup runs in `append`: `dropDuplicatesWithinWatermark` emits first-seen
  * rows immediately, so end-state equals batch DISTINCT.
  */
object StreamingOps {

  // one persisted events-grain drift state per (session, sf dir) — the
  // q193 memo pattern at the EVENTS grain, built by a REAL streaming
  // query (foreachBatch) rather than batch slices
  private val eventsDriftStateCache = new SessionMemo[String]

  // q312's streamed-in winnow index, built ONCE per (session, sf dir) —
  // the q282 lifecycle stance for the dedup-index leg
  private val streamWinnowIndexCache = new SessionMemo[String]

  val defs: Seq[QueryDef] = Seq(

    // q50: tumbling 1-hour windows × event_type, count + sum. State is one
    // row per (window, type); watermark evicts windows > 1 h late at scale.
    QueryDef("q50_stream_tumbling",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
        val agg = e.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        EventStream.runToTable(s, agg, "complete", d)
          .select(col("window.start").as("window_start"), col("event_type"),
            col("n"), round(col("sv"), 2).as("sum_value"))
          .orderBy("window_start", "event_type")
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
          event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // q51: sliding windows (2 h length, 1 h slide) — each event lands in
    // exactly two windows; oracle replicates via an explicit offset unnest.
    QueryDef("q51_stream_sliding",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
        val agg = e.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "2 hours", "1 hour"))
          // sum (not avg): the input grid is 2-decimal, so the true sum sits
          // ON the 0.01 grid and 2-dp rounding is immune to float-order
          // noise; avg leaves the grid and flips at the half-boundary.
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        EventStream.runToTable(s, agg, "complete", d)
          .select(col("window.start").as("window_start"), col("n"), col("sum_value"))
          .orderBy("window_start")
      },
      Some("""SELECT CAST(date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS TIMESTAMP) AS window_start,
          count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events, (SELECT unnest([0, 1]) o) t
        GROUP BY 1 ORDER BY window_start""")),

    // q52: stateful streaming dedup — first occurrence per (user, type)
    // within the watermark horizon, then a batch rollup of the deduped
    // stream. State TTL = the 1 h watermark delay (the scale-correct
    // bounded-state API vs. unbounded dropDuplicates).
    QueryDef("q52_stream_dedup",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
        val dd = e.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select("user_id", "event_type")
        EventStream.runToTable(s, dd, "append", d)
          .groupBy("event_type")
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // q53: session windows (30-min gap) per user — batch session_window
    // (same operator Structured Streaming uses; streaming emission timing
    // is asserted separately in StreamingSpec). Oracle: gaps-and-islands.
    QueryDef("q53_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("session_window.start").as("session_start"), col("user_id"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
      Some("""WITH x AS (
          SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        g AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) grp
          FROM x)
        SELECT CAST(min(ts) AS TIMESTAMP) AS session_start, user_id,
          count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM g GROUP BY user_id, grp ORDER BY user_id, session_start""")),

    // q54: stream-static join — the streaming enrich pattern: each
    // micro-batch joins against the (broadcast) static dimension, then a
    // running aggregate. At scale the dim is re-broadcast per batch, never
    // shuffled with the stream.
    QueryDef("q54_stream_static_join",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
        val dims = Tables.customer(s, d)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        val agg = e.join(broadcast(dims), Seq("user_id"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        EventStream.runToTable(s, agg, "complete", d)
          .select(col("c_mktsegment"), col("n"), round(col("sv"), 2).as("sum_value"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // q55: stream-stream interval join — view→purchase attribution within
    // 30 min per user. Both sides carry watermarks and the join condition
    // bounds event time on BOTH ends, so each side's state evicts once the
    // other side's watermark passes view_ts + 30 min: bounded state, the
    // only shuffle is the symmetric hash join's user_id exchange. Append
    // mode (inner interval joins emit exactly once).
    QueryDef("q55_stream_stream_join",
      (s, d) => {
        val views = EventStream.readEvents(s, d)
          .filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"))
          .withWatermark("view_ts", "1 hour")
        val purchases = EventStream.readEvents(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
            col("value"))
          .withWatermark("purchase_ts", "1 hour")
        val joined = views.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") > col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
        EventStream.runToTable(s, joined, "append", d)
          .select(col("user_id"), col("view_ts"), col("purchase_ts"),
            round(col("value"), 2).as("value"))
          .orderBy("user_id", "view_ts", "purchase_ts")
      },
      Some("""SELECT a.user_id, CAST(a.ts AS TIMESTAMP) AS view_ts,
          CAST(b.ts AS TIMESTAMP) AS purchase_ts, round(b.value, 2) AS value
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_type = 'view'
         AND b.event_type = 'purchase'
         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        ORDER BY 1, 2, 3""")),

    // q139: stream-stream FULL OUTER interval join — q55's attribution
    // join with BOTH sides' unmatched rows emitted: views that never
    // converted AND purchases with no preceding view, null-padded, each
    // emitted only once the watermark closes its window (early emission
    // would be wrong — a late arrival could still match). The oracle
    // replays the emission rule with ONE GLOBAL watermark w =
    // least(max view_ts, max purchase_ts) − 1 h — exactly Spark's
    // multipleWatermarkPolicy=min default, which takes the MINIMUM across
    // the two input streams (per-side watermarks would diverge from the
    // stream on a corpus whose two event types end far apart): a
    // view-only row emits once view_ts + 30 min < w (no purchase in its
    // forward window can still arrive), a purchase-only row once
    // purchase_ts <= w — the asymmetry falls straight out of the interval
    // bounds: a purchase at t matches views in [t-30min, t), and views
    // with event time >= w may still arrive, so purchase state must be
    // held a full span longer than the naive w - 30 min (pinned
    // empirically at sf0.01: the last emitted purchase-only row sits
    // inside (w-30min, w], and nothing beyond w emits on either side) —
    // trailing rows whose window w never closed are withheld by stream
    // and oracle alike (same cutoff discipline as q121). State stays
    // bounded by the same eviction that drives the outer emissions.
    QueryDef("q139_stream_full_outer_join",
      (s, d) => {
        val views = EventStream.readEvents(s, d)
          .filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"))
          .withWatermark("view_ts", "1 hour")
        val purchases = EventStream.readEvents(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
            col("value"))
          .withWatermark("purchase_ts", "1 hour")
        val joined = views.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") > col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
          "full_outer")
        EventStream.runToTable(s, joined, "append", d)
          .select(col("user_id"), col("view_ts"), col("p_user_id"),
            col("purchase_ts"), round(col("value"), 2).as("value"))
          .orderBy("user_id", "view_ts", "p_user_id", "purchase_ts")
      },
      Some("""WITH v AS (
          SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
        p AS (
          SELECT user_id AS p_user_id, ts AS purchase_ts, value
          FROM events WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(view_ts) FROM v),
            (SELECT max(purchase_ts) FROM p)) - INTERVAL 1 HOUR AS w)
        SELECT v.user_id, CAST(v.view_ts AS TIMESTAMP) AS view_ts,
            p.p_user_id, CAST(p.purchase_ts AS TIMESTAMP) AS purchase_ts,
            round(p.value, 2) AS value
          FROM v JOIN p ON v.user_id = p.p_user_id
           AND p.purchase_ts > v.view_ts
           AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
        UNION ALL
        SELECT v.user_id, CAST(v.view_ts AS TIMESTAMP), NULL, NULL, NULL
          FROM v
          WHERE NOT EXISTS (SELECT 1 FROM p
              WHERE v.user_id = p.p_user_id
                AND p.purchase_ts > v.view_ts
                AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE)
            AND v.view_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
        UNION ALL
        SELECT NULL, NULL, p.p_user_id, CAST(p.purchase_ts AS TIMESTAMP),
            round(p.value, 2)
          FROM p
          WHERE NOT EXISTS (SELECT 1 FROM v
              WHERE v.user_id = p.p_user_id
                AND p.purchase_ts > v.view_ts
                AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE)
            AND p.purchase_ts <= (SELECT w FROM wm)
        ORDER BY 1, 2, 3, 4""")),

    // q240: stream-stream LEFT OUTER interval join — the third and last
    // outer mode through the gate (q55 inner, q139 full outer; the
    // left-outer semantics were spec-only until now): every view emits —
    // matched on purchase arrival, null-padded once the watermark closes
    // its 30-minute forward window — while unmatched purchases stay
    // silent (the asymmetry IS the mode). Same state/eviction envelope
    // as q139: purchase state held one interval span past the naive
    // cutoff; trailing views whose window never closed are withheld by
    // stream and oracle alike (the q121 cutoff discipline, view branch
    // pinned identically to q139's view-only arm).
    QueryDef("q240_stream_left_outer_join",
      (s, d) => {
        val views = EventStream.readEvents(s, d)
          .filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"))
          .withWatermark("view_ts", "1 hour")
        val purchases = EventStream.readEvents(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
            col("value"))
          .withWatermark("purchase_ts", "1 hour")
        val joined = views.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") > col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
        EventStream.runToTable(s, joined, "append", d)
          .select(col("user_id"), col("view_ts"), col("p_user_id"),
            col("purchase_ts"), round(col("value"), 2).as("value"))
          .orderBy("user_id", "view_ts", "p_user_id", "purchase_ts")
      },
      Some("""WITH v AS (
          SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
        p AS (
          SELECT user_id AS p_user_id, ts AS purchase_ts, value
          FROM events WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(view_ts) FROM v),
            (SELECT max(purchase_ts) FROM p)) - INTERVAL 1 HOUR AS w)
        SELECT v.user_id, CAST(v.view_ts AS TIMESTAMP) AS view_ts,
            p.p_user_id, CAST(p.purchase_ts AS TIMESTAMP) AS purchase_ts,
            round(p.value, 2) AS value
          FROM v JOIN p ON v.user_id = p.p_user_id
           AND p.purchase_ts > v.view_ts
           AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
        UNION ALL
        SELECT v.user_id, CAST(v.view_ts AS TIMESTAMP), NULL, NULL, NULL
          FROM v
          WHERE NOT EXISTS (SELECT 1 FROM p
              WHERE v.user_id = p.p_user_id
                AND p.purchase_ts > v.view_ts
                AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE)
            AND v.view_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
        ORDER BY 1, 2, 3, 4""")),

    // q121: CHAINED stateful aggregations (Spark 3.5+/4 multi-stateful) —
    // per-(window, event_type) sums re-aggregated per window in the SAME
    // query: the hierarchical metrics rollup without a foreachBatch seam.
    // Chaining REQUIRES append mode, so unlike q50/q51 the trailing
    // windows the final watermark (max ts − 1 h) has not closed are
    // correctly withheld — the oracle applies the same cutoff. State at
    // scale: one row per (window, type) at level 1, one per window at
    // level 2, both watermark-evicted.
    QueryDef("q121_stream_chained_agg",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
        val lvl1 = e.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(sum("value").as("type_sum"))
        val lvl2 = lvl1.groupBy(col("window"))
          .agg(count(lit(1)).as("n_types"), sum("type_sum").as("sv"))
        EventStream.runToTable(s, lvl2, "append", d)
          .select(col("window.start").as("window_start"), col("n_types"),
            round(col("sv"), 2).as("sum_value"))
          .orderBy("window_start")
      },
      Some("""WITH m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events),
          w AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) ws,
                  event_type, value FROM events)
        SELECT ws AS window_start,
          CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
          round(sum(value), 2) AS sum_value
        FROM w, m WHERE ws + INTERVAL 1 HOUR <= wm
        GROUP BY ws ORDER BY ws""")),

    // q257: CUSTOM stateful sessionization via transformWithState (the
    // Spark 4 arbitrary-state API) — the registered gate for the state
    // machinery StreamingSpec exercises in isolation: per user, a
    // ValueState (session_start, last_ts, n, cents) walks each batch's
    // rows in event-time order and EMITS a session the moment a ≥30-min
    // gap closes it — the streaming-correct emit-on-close contract, so
    // each user's final (still-open) session is deliberately withheld,
    // exactly as q121's append mode withholds unclosed windows. The
    // oracle applies the same cutoff (every island except each user's
    // last). Values ride as exact integer cents (round(value·100) per
    // row — identical per-row doubles both engines), so in-state sums
    // are order-free exact. State at scale: ONE small tuple per live
    // user on RocksDB, evicted content moving to output — the unbounded
    // dropDuplicates problem does not exist here.
    QueryDef("q257_stream_stateful_sessions",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        val prev = s.conf.getOption(
          "spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val ds = EventStream.readEvents(s, d)
            .select(col("user_id").cast("long"),
              unix_micros(col("ts")),
              round(col("value") * 100).cast("long"))
            .as[(Long, Long, Long)]
          val sess = ds.groupByKey(_._1)
            .transformWithState(new SessionProcessor,
              TimeMode.None(), OutputMode.Update())
            .toDF("user_id", "start_us", "n_events", "cents")
          EventStream.runToTable(s, sess, "update", d)
            .orderBy("user_id", "start_us")
        } finally prev match {
          case Some(v) =>
            s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None =>
            s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      },
      Some("""WITH x AS (SELECT user_id, ts,
            CAST(round(value * 100) AS BIGINT) cents,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) grp FROM x),
        s AS (SELECT user_id, grp, epoch_us(min(ts)) start_us,
            CAST(count(*) AS BIGINT) n_events, CAST(sum(cents) AS BIGINT) cents
          FROM g GROUP BY user_id, grp),
        f AS (SELECT *, max(grp) OVER (PARTITION BY user_id) mg FROM s)
        SELECT user_id, start_us, n_events, cents FROM f
        WHERE grp < mg ORDER BY user_id, start_us""")),

    // q260: watermark-lateness audit — the table that answers "what
    // watermark delay drops how many events" BEFORE a streaming deploy
    // picks `withWatermark` (too tight silently drops data, too loose
    // holds state): each event's lateness = max event time among
    // strictly earlier ARRIVALS minus its own event time. The testdata
    // arrives in perfect event-time order, so arrival is simulated with
    // the standard bounded-ingest-delay model — arrival = ts + a
    // deterministic md5 delay < 120 s per event (engine-portable, the
    // q75 hash stance). The running max over arrival order is a
    // TWO-PHASE distributed prefix max (the q101 packing machinery —
    // no global single-partition window); the oracle states the direct
    // global-window form, so the hash-match is the decomposition proof.
    QueryDef("q260_lateness_audit",
      (s, d) => {
        val e = Tables.events(s, d).select(col("event_id"),
          unix_micros(col("ts")).as("us"))
          .withColumn("arr", col("us") +
            graft.functions.TextFns.hash32(
              concat(lit("arr:"), col("event_id").cast("string")))
              % lit(120000000L))
        graft.operators.Profile.latenessBands(e, "arr", "us", "event_id")
      },
      Some("""WITH x AS (SELECT event_id, epoch_us(ts) us,
            epoch_us(ts) +
              ('0x' || substr(md5('arr:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                % 120000000 arr
          FROM events),
        l AS (SELECT coalesce(greatest(0,
            max(us) OVER (ORDER BY arr, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - us), 0) lat
          FROM x),
        b AS (SELECT CASE WHEN lat = 0 THEN '0_in_order'
            WHEN lat <= 10000000 THEN '1_le_10s'
            WHEN lat <= 30000000 THEN '2_le_30s'
            WHEN lat <= 60000000 THEN '3_le_60s'
            WHEN lat <= 120000000 THEN '4_le_2m'
            ELSE '5_gt_2m' END band, lat FROM l)
        SELECT band, CAST(count(*) AS BIGINT) n_events,
          CAST(max(lat) AS BIGINT) max_lateness_us
        FROM b GROUP BY band ORDER BY band""")),

    // q282: the streaming drift panel END-TO-END at the events grain —
    // the production monitor composed whole: ONE foreachBatch over the
    // events STREAM merges per-(type, value-cents) observations into the
    // persisted additive count state (Drift.mergeIntoCounts' staged
    // swap per micro-batch), and the panel — per-type PSI bucket table
    // (8 pooled-quantile buckets) with the KS numerator joined on — is
    // computed from the PERSISTED state only. q193/q221 prove the
    // write/merge/swap/read path at the documents grain with batch
    // slices; this is the same lifecycle driven by a real streaming
    // query (the q228 pattern for the drift family). The state is
    // additive, so the oracle states the whole panel directly from the
    // raw events table — a lost micro-batch, torn swap, or column drift
    // hash-fails here. At 100 TB: state is grid-sized (types ×
    // distinct cents values; rebinCounts pre-buckets a continuous value
    // stream), each micro-batch merge reads state + batch, never
    // history; the panel read is grid-sized arithmetic.
    QueryDef("q282_stream_drift_panel",
      (s, d) => {
        val path = eventsDriftStateCache(s, d) {
          val t = java.nio.file.Files
            .createTempDirectory("graft_q282").toString + "/state"
          import s.implicits._
          graft.operators.Drift.writeCounts(
            Seq.empty[(String, Long, Long)].toDF("event_type", "v", "c"),
            t, "event_type", "v", "c")
          val obs = EventStream.readEvents(s, d)
            .select(col("event_type"),
              round(col("value") * 100).cast("long").as("v"))
          val q = obs.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              graft.operators.Drift.mergeIntoCounts(s, t, batch); ()
            }
            .option("checkpointLocation",
              s"${EventStream.checkpointRoot}/q282-${System.nanoTime()}")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          t
        }
        val (state, g, v, c) = graft.operators.Drift.readCounts(s, path)
        val psi = graft.operators.Drift
          .psiBucketsFromCounts(state, g, v, c, buckets = 8)
          .withColumnRenamed("c_grp", "c_type")
          .withColumnRenamed("n_grp", "n_type")
        val ks = graft.operators.Drift.ksFromCounts(state, g, v, c)
          .select(col("event_type"), col("ks_num"))
        psi.join(ks, "event_type")
          .select(col("event_type"), col("bucket"), col("c_type"),
            col("c_pool"), col("n_type"), col("n_pool"), col("ks_num"))
          .orderBy("event_type", "bucket")
      },
      Some("""WITH dc AS (SELECT event_type g,
            CAST(round(value * 100) AS BIGINT) v FROM events
            WHERE value IS NOT NULL),
          grps AS (SELECT g, count(*) ns FROM dc GROUP BY 1),
          na AS (SELECT count(*) ng FROM dc),
          per AS (SELECT g, v, count(*) c FROM dc GROUP BY 1, 2),
          gv AS (SELECT v, count(*) cv FROM dc GROUP BY 1),
          grid AS (SELECT grps.g, gv.v FROM grps CROSS JOIN gv),
          scum AS (SELECT grid.g, grid.v,
              sum(coalesce(per.c, 0)) OVER (PARTITION BY grid.g
                ORDER BY grid.v ROWS UNBOUNDED PRECEDING) cs
            FROM grid LEFT JOIN per
              ON per.g = grid.g AND per.v = grid.v),
          gcum AS (SELECT v, sum(cv) OVER (ORDER BY v
              ROWS UNBOUNDED PRECEDING) cg FROM gv),
          ks AS (SELECT s.g,
              max(abs(s.cs * na.ng - gcum.cg * grps.ns)) ks_num
            FROM scum s JOIN gcum USING (v)
              JOIN grps ON s.g = grps.g CROSS JOIN na
            GROUP BY s.g),
          vb AS (SELECT v, cv,
              (coalesce(sum(cv) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 8)
                // na.ng bkt
            FROM gv CROSS JOIN na),
          pb AS (SELECT bkt, sum(cv) c_pool FROM vb GROUP BY 1),
          sb AS (SELECT per.g, vb.bkt, sum(per.c) c_type FROM per
            JOIN vb USING (v) GROUP BY 1, 2),
          pgrid AS (SELECT grps.g, grps.ns, pb.bkt, pb.c_pool
            FROM grps CROSS JOIN pb)
        SELECT pg.g event_type, CAST(pg.bkt AS BIGINT) bucket,
          CAST(coalesce(sb.c_type, 0) AS BIGINT) c_type,
          CAST(pg.c_pool AS BIGINT) c_pool,
          CAST(pg.ns AS BIGINT) n_type, CAST(na.ng AS BIGINT) n_pool,
          CAST(ks.ks_num AS BIGINT) ks_num
        FROM pgrid pg LEFT JOIN sb ON pg.g = sb.g AND pg.bkt = sb.bkt
          JOIN ks ON pg.g = ks.g CROSS JOIN na
        ORDER BY event_type, bucket""")),

    // q310: WINDOWED streaming Misra–Gries — the per-window rolling-
    // vocabulary monitor: the custom HeavyHitters TypedImperativeAggregate
    // (q102's batch sketch) inside a streaming tumbling-window
    // aggregation, in the provably-exact regime (k = 8 ≥ the 5-type
    // domain ⇒ no eviction ⇒ tracked estimates ARE the exact per-window
    // counts — the q288 stance at the WINDOW grain). What this gate
    // proves that q102/q288 don't: the sketch's serialize/partial-merge
    // path under streaming window state (merges across micro-batches and
    // shuffle partials), not just batch combine or per-key ValueState.
    // State at scale: one O(k) buffer per OPEN window — but only under
    // append/update output, where the watermark finalizes and evicts a
    // window once it closes. This gate runs in COMPLETE mode (a finite
    // AvailableNow replay: append would never emit the windows past the
    // last batch's watermark), and complete mode retains ALL window
    // state for the run's lifetime — fine for a bounded replay, wrong
    // for an unbounded deployment, which must use append/update to get
    // the O(open windows) bound (ADVICE r19).
    QueryDef("q310_stream_windowed_heavy_hitters",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
        val agg = e.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day"))
          .agg(graft.functions.HeavyHitters
            .sketch(s, col("event_type"), 8).as("hh"))
        EventStream.runToTable(s, agg, "complete", d)
          .select(col("window.start").as("win_start"),
            explode(col("hh")).as("e"))
          .select(col("win_start"), col("e._1").as("event_type"),
            col("e._2").as("cnt"))
          .orderBy("win_start", "event_type")
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) win_start,
          event_type, CAST(count(*) AS BIGINT) cnt
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // q288: streaming Misra–Gries per-user activity profile through the
    // driver gate, in the sketch's PROVABLY-EXACT regime: k = 8 ≥ the
    // 5-type event domain, so no counter ever decrements and the
    // tracked estimates ARE the exact per-(user, type) counts — the
    // oracle is the plain GROUP BY (the q110 stance: hash-pin the
    // sketch machinery where sketch ≡ exact is decidable; the eviction
    // regime rides StreamingSpec's MG-bound test, unreplayable by SQL).
    // What the gate proves: the MGSummary serialize/update/emit cycle
    // over RocksDB ValueState drops, double-counts, and reorders
    // nothing. State at scale: ≤ k entries per live user — the bounded
    // per-source rolling vocabulary every unbounded stream needs.
    QueryDef("q288_stream_heavy_hitters_exact",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        val prev = s.conf.getOption(
          "spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val ds = EventStream.readEvents(s, d)
            .select(col("user_id").cast("long"), col("event_type"))
            .as[(Long, String)]
          val hh = ds.groupByKey(_._1)
            .transformWithState(new MgProcessor(8),
              TimeMode.None(), OutputMode.Update())
            .toDF("user_id", "event_type", "cnt")
          // the update-mode memory sink APPENDS each micro-batch's
          // emissions: a multi-batch execution (any maxFilesPerTrigger)
          // would leave the earlier, smaller snapshots as stale rows.
          // MG counts in the no-evict regime are monotone per key, so
          // max(cnt) per (user, type) IS the final tracked estimate —
          // the collapse makes the result batch-count-equal under ANY
          // micro-batch split, not just AvailableNow-in-one (ADVICE r18).
          EventStream.runToTable(s, hh, "update", d)
            .groupBy("user_id", "event_type")
            .agg(max("cnt").as("cnt"))
            .orderBy("user_id", "event_type")
        } finally prev match {
          case Some(v) =>
            s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None =>
            s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      },
      Some("""SELECT user_id, event_type, CAST(count(*) AS BIGINT) cnt
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // q312: STREAMING INGEST → AT-REST DEDUP INDEX, end-to-end (r19
    // directive #4) — closes the gap between the streaming surface and
    // the at-rest index story: q282 proved foreachBatch → persisted
    // additive state for drift COUNTS; this drives the winnow fingerprint
    // index (q298's artifact) the same way. The standing corpus
    // (doc_id % 5 != 0) is staged as a MULTI-FILE directory and read as a
    // file STREAM with maxFilesPerTrigger = 1, so the index is built by
    // N > 1 real micro-batch appends (each fingerprints only itself —
    // appendToWinnowIndex), seeded from an EMPTY build that pins only
    // (k, w) into the index identity. The registered read probes the
    // batch slice (%5 = 0) against the at-rest posting set. The oracle
    // replays the WHOLE corpus inline (q298's exact winnow SQL, same
    // split) — a lost micro-batch, a double-applied batch, or a torn
    // append = missed/phantom duplicates = hash fail. The result set is
    // partitioning-independent: each doc lands in exactly one micro-batch
    // and fingerprints only itself, so the union of per-batch posting
    // sets IS the one-shot set. StreamingSpec drives the same lifecycle
    // with a batch counter and asserts ≥ 2 micro-batches really ran. At
    // 100 TB each micro-batch pays O(batch) fingerprinting, the standing
    // index is never re-read by ingest, and compactWinnowIndex (directive
    // #3) bounds the accumulated file count.
    QueryDef("q312_stream_winnow_ingest",
      (s, d) => {
        val path = streamWinnowIndexCache(s, d) {
          val base = java.nio.file.Files
            .createTempDirectory("graft_q312").toString
          val idx = s"$base/index"
          val corpus = Tables.documents(s, d)
            .filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
          graft.operators.Dedup.buildWinnowIndex(
            corpus.limit(0), "doc_id", "text", 3, 4, idx)
          // stage the corpus as 3 files ⇒ 3 AvailableNow micro-batches
          corpus.repartition(3).write.parquet(s"$base/ingest")
          val q = s.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$base/ingest")
            .writeStream
            // batchId-keyed idempotence (ADVICE r20): foreachBatch is
            // at-least-once, and appendToWinnowIndex is not idempotent —
            // a replayed micro-batch would append duplicate (id, fp) rows
            // and inflate n_shared. A per-batch applied marker (created
            // AFTER the append commits) makes replays no-ops; the one
            // remaining window (crash between append and marker) is the
            // standard marker-pattern caveat — a production sink closes
            // it with a transactional table format. Local File API: the
            // index lives in a local temp dir here; a cluster deploy
            // would use the Hadoop FileSystem for the markers.
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
              val marker = new java.io.File(s"$idx/applied/$batchId")
              if (!marker.exists()) {
                graft.operators.Dedup.appendToWinnowIndex(s, idx, b,
                  "doc_id", "text")
                marker.mkdirs()
              }
              ()
            }
            .option("checkpointLocation",
              s"${EventStream.checkpointRoot}/q312-${System.nanoTime()}")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          idx
        }
        graft.operators.Dedup.winnowIndexedMatches(s, path,
            Tables.documents(s, d).filter(col("doc_id") % 5 === 0),
            "doc_id", "text", 2)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH toks AS (SELECT doc_id,
            ${graft.queries.TextShared.OToks} t FROM documents),
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
        ORDER BY 1, 2"""))
  )
}
