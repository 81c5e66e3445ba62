package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming semantics on controlled MemoryStream input:
  * watermark late-data drop (the behavior q50–q52 declare but complete
  * mode doesn't surface) and session-window merging.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops events later than the delay in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: two on-time events; advances watermark to 10:30-0:10=10:20
    mem.addData((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:30:00"), "a"))
    q.processAllAvailable()
    // batch 2: late event inside the closed 10:00 window → dropped
    mem.addData((ts("2024-01-01 10:01:00"), "late"))
    q.processAllAvailable()
    // batch 3: push watermark far ahead so every surviving window emits
    mem.addData((ts("2024-01-01 12:00:00"), "a"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_test")
      .select(col("window.start").as("w"), col("k"), col("count"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains((ts("2024-01-01 10:00:00"), "a", 1L)))
    assert(!rows.exists(_._2 == "late"), "late event must be dropped by the watermark")
  }

  test("streaming session window merges events within gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
    val q = agg.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:20:00"), 1L), // one session
      (ts("2024-01-01 11:30:00"), 1L))                                  // gap > 30m → new session
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 15:00:00"), 99L)) // advance watermark to flush
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_test")
      .select(col("session_window.start"), col("user_id"), col("count"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.contains((ts("2024-01-01 10:00:00"), 1L, 2L)))
    assert(rows.contains((ts("2024-01-01 11:30:00"), 1L, 1L)))
  }

  test("streaming content-fingerprint dedup drops re-sent documents across batches") {
    // in-flight dedup of a document stream (re-crawls, retries, replays):
    // per-row normalized-content fingerprint + dropDuplicatesWithinWatermark
    // — one stateful op, state bounded by the watermark horizon
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val deduped = mem.toDF().toDF("ts", "doc_id", "text")
      .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
    val q = deduped.writeStream.format("memory").queryName("fp_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
      (ts("2024-01-01 10:01:00"), 2L, "jumps over the dog"))
    q.processAllAvailable()
    // batch 2: doc 3 re-sends doc 1's content (modulo case/whitespace,
    // which the normalization folds) + one genuinely new doc
    mem.addData(
      (ts("2024-01-01 10:10:00"), 3L, "The  quick   BROWN fox"),
      (ts("2024-01-01 10:11:00"), 4L, "fresh content here"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("fp_dedup").select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 2L, 4L), "re-sent content must be dropped in-flight")
  }

  test("flatMapGroupsWithState: custom per-key state across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    // running (count, sum) per user, emitted on every update
    val updated = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          val batch = rows.toSeq
          val next = (c0 + batch.size, s0 + batch.map(_._2).sum)
          state.update(next)
          Iterator((user, next._1, next._2))
      }
      .toDF("user_id", "n", "total")
    val q = updated.writeStream.format("memory").queryName("fmgws_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
    q.processAllAvailable()
    mem.addData((1L, 2.0)) // state must carry over: count 3, sum 17
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("fmgws_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((1L, 2L, 15.0)), "batch-1 emission for user 1")
    assert(rows.contains((2L, 1L, 1.0)))
    assert(rows.contains((1L, 3L, 17.0)), "state carried across batches")
  }

  test("stream-stream interval join with watermarks (view ⋈ click within 10 min)") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val v = views.toDF().toDF("v_ts", "user_id").withWatermark("v_ts", "10 minutes")
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val joined = v.join(c,
      expr("user_id = c_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    views.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:30:00"), 2L))
    clicks.addData(
      (ts("2024-01-01 10:05:00"), 1L),  // within window -> joins
      (ts("2024-01-01 10:20:00"), 1L),  // outside 10 min -> dropped
      (ts("2024-01-01 10:31:00"), 2L))  // within window -> joins
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_test")
      .collect().map(r => (r.getLong(1), r.getTimestamp(2))).toSet
    assert(rows === Set((1L, ts("2024-01-01 10:05:00")), (2L, ts("2024-01-01 10:31:00"))))
  }

  test("stream-stream LEFT OUTER interval join: unmatched rows emit null-padded after watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val v = views.toDF().toDF("v_ts", "user_id").withWatermark("v_ts", "10 minutes")
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val joined = v.join(c,
      expr("user_id = c_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 10 minutes"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssoj_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    views.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:00"), 2L))
    clicks.addData((ts("2024-01-01 10:05:00"), 1L))
    q.processAllAvailable()
    // user 2 is unmatched, but its join window only closes once the
    // watermark passes v_ts + 10 min interval + 10 min delay — it must
    // NOT emit early (emitting an outer row that a late click could still
    // match would be wrong)
    assert(spark.table("ssoj_test").filter("c_ts IS NULL").count() === 0,
      "unmatched row must not emit before the watermark closes its window")
    // far-future activity advances both watermarks; the next batch after
    // the advance evicts user 2's state and emits the null-padded row
    views.addData((ts("2024-01-01 12:00:00"), 9L))
    clicks.addData((ts("2024-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    views.addData((ts("2024-01-01 12:01:00"), 9L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssoj_test").collect()
      .map(r => (r.getLong(1), Option(r.getTimestamp(2)))).toSet
    assert(rows.contains((1L, Some(ts("2024-01-01 10:05:00")))), "matched row emits once")
    assert(rows.contains((2L, None)),
      "unmatched row emits null-padded after its window closes")
  }

  test("stream-stream FULL OUTER interval join: both sides' unmatched rows emit at watermark close") {
    // the last join-emission mode: inner emits on match, and EACH side's
    // unmatched rows emit null-padded once the watermark closes their
    // window — a view with no click AND a click with no view both survive
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val v = views.toDF().toDF("v_ts", "user_id").withWatermark("v_ts", "10 minutes")
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val joined = v.join(c,
      expr("user_id = c_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 10 minutes"),
      "full_outer")
    val q = joined.writeStream.format("memory").queryName("ssfoj_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    views.addData(
      (ts("2024-01-01 10:00:00"), 1L),  // matches user 1's click
      (ts("2024-01-01 10:00:00"), 2L))  // view-only -> left-unmatched
    clicks.addData(
      (ts("2024-01-01 10:05:00"), 1L),  // within window -> inner match
      (ts("2024-01-01 10:05:00"), 3L))  // click-only -> right-unmatched
    q.processAllAvailable()
    // neither unmatched side may emit before the watermark closes its
    // window — a late arrival could still complete either of them
    assert(spark.table("ssfoj_test")
      .filter("v_ts IS NULL OR c_ts IS NULL").count() === 0,
      "no outer row may emit before the watermark closes its window")
    // far-future activity on both streams advances both watermarks; the
    // batch after the advance evicts state and emits BOTH outer rows
    views.addData((ts("2024-01-01 12:00:00"), 9L))
    clicks.addData((ts("2024-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    views.addData((ts("2024-01-01 12:01:00"), 9L))
    clicks.addData((ts("2024-01-01 12:01:00"), 9L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssfoj_test")
      .filter("user_id = 1 OR user_id = 2 OR c_user = 3 OR user_id IS NULL")
      .collect()
      .map(r => (Option(r.getTimestamp(0)).map(_ => r.getLong(1)),
        Option(r.getTimestamp(2)).map(_ => r.getLong(3)))).toSet
    assert(rows === Set(
      (Some(1L), Some(1L)),  // inner match emitted on arrival
      (Some(2L), None),      // view-only: left outer after close
      (None, Some(3L))),     // click-only: right outer after close
      "full outer must emit the match plus BOTH sides' unmatched rows")
  }

  test("AvailableNow + checkpoint resumes where the last run stopped (ref S2 incremental)") {
    // the Spark-native form of the reference's resumable pagination
    // (issue_processor.py startAt bookkeeping): each run processes exactly
    // the files the checkpoint hasn't seen
    val root = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val data = new java.io.File(root, "in"); data.mkdirs()
    val ckpt = s"$root/ckpt"
    def addFile(name: String, ids: Seq[Long]): Unit = {
      val tmp = s"$root/stage_$name"
      ids.toDF("id").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(data, s"$name.parquet").toPath)
    }
    def runOnce(): Set[Long] = {
      val seen = scala.collection.mutable.Set.empty[Long]
      val q = spark.readStream.schema("id LONG").parquet(data.getPath)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= df.select("id").as[Long].collect(); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      seen.toSet
    }
    addFile("b1", Seq(1L, 2L, 3L))
    assert(runOnce() === Set(1L, 2L, 3L))
    addFile("b2", Seq(4L, 5L))
    assert(runOnce() === Set(4L, 5L), "second run must see ONLY the new file")
    assert(runOnce() === Set.empty, "no new files -> no reprocessing")
  }

  test("transformWithState (Spark 4 API): per-key running count via ValueState on RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    // the new arbitrary-state API requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      class CountProcessor extends StatefulProcessor[String, (String, Long), (String, Long)] {
        @transient private var count: ValueState[Long] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          count = getHandle.getValueState[Long]("count",
            org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
        override def handleInputRows(key: String, rows: Iterator[(String, Long)],
            timerValues: TimerValues): Iterator[(String, Long)] = {
          val n = (if (count.exists()) count.get() else 0L) + rows.size
          count.update(n)
          Iterator.single((key, n))
        }
      }
      val in = MemoryStream[(String, Long)]
      val out = in.toDS().groupByKey(_._1)
        .transformWithState(new CountProcessor,
          TimeMode.None(), OutputMode.Update())
      val q = out.toDF("k", "n").writeStream.format("memory")
        .queryName("tws_test").outputMode("update")
        .trigger(Trigger.ProcessingTime(0)).start()
      in.addData(("a", 1L), ("a", 2L), ("b", 3L))
      q.processAllAvailable()
      in.addData(("a", 4L))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws_test").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(last === Map("a" -> 3L, "b" -> 1L),
        "state must carry the running count across micro-batches")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("chained stateful aggregations: window-over-window re-aggregation in append mode") {
    implicit val sqlCtx = spark.sqlContext
    // two stateful operators in ONE query (Spark 3.5+/4): per-(window,
    // user) sums feed a second aggregation keyed on the same event-time
    // window column; both levels hold state and append emits only once
    // the watermark closes the window at BOTH levels. The hierarchical
    // rollup (device → user → window) every metrics pipeline wants
    // without a foreachBatch seam.
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val e = mem.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "10 minutes")
    val perUser = e.groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(sum("value").as("user_sum"))
    val perWindow = perUser.groupBy(col("window"))
      .agg(count(lit(1)).as("n_users"), sum("user_sum").as("total"))
    val q = perWindow
      .select(col("window.start").as("ws"), col("n_users"), col("total"))
      .writeStream.format("memory").queryName("chain_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((ts("2024-01-01 10:01:00"), 1L, 2.0),
      (ts("2024-01-01 10:02:00"), 2L, 3.0),
      (ts("2024-01-01 10:03:00"), 1L, 5.0))
    q.processAllAvailable()
    assert(spark.table("chain_test").count() === 0,
      "append emits nothing before the watermark closes the window")
    mem.addData((ts("2024-01-01 11:00:00"), 9L, 1.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 11:01:00"), 9L, 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("chain_test").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows === Set((ts("2024-01-01 10:00:00"), 2L, 10.0)),
      "the closed 10:00 window rolls up 2 users totalling 10.0; open windows stay held")
  }

  test("streaming Misra-Gries heavy hitters: MGSummary rides transformWithState state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    import graft.functions.MGSummary
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the batch sketch's O(k) summary object IS the streaming state:
      // serialize/deserialize around each micro-batch, update in place,
      // emit the current tracked set. Per-key state stays k entries no
      // matter how many tokens stream through — the property that makes
      // a per-source rolling vocabulary tractable on an unbounded stream.
      class HHProcessor(k: Int)
          extends StatefulProcessor[String, (String, String), (String, String, Long)] {
        @transient private var st: ValueState[Array[Byte]] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          st = getHandle.getValueState[Array[Byte]]("mg",
            org.apache.spark.sql.Encoders.BINARY, TTLConfig.NONE)
        override def handleInputRows(key: String, rows: Iterator[(String, String)],
            timerValues: TimerValues): Iterator[(String, String, Long)] = {
          val s = if (st.exists()) MGSummary.deserialize(st.get()) else new MGSummary(k)
          rows.foreach(r => s.update(r._2))
          st.update(s.serialized)
          s.sorted.iterator.map { case (tok, c) => (key, tok, c) }
        }
      }
      val in = MemoryStream[(String, String)]
      val out = in.toDS().groupByKey(_._1)
        .transformWithState(new HHProcessor(3), TimeMode.None(), OutputMode.Update())
      val q = out.toDF("grp", "tok", "est").writeStream.format("memory")
        .queryName("shh_test").outputMode("update")
        .trigger(Trigger.ProcessingTime(0)).start()
      // batch 1: 6x hot + 4 distinct cold in group g; separate group h
      in.addData(Seq.fill(6)(("g", "hot")) ++
        Seq(("g", "c1"), ("g", "c2"), ("g", "c3"), ("g", "c4"), ("h", "x")): _*)
      q.processAllAvailable()
      val batch1 = spark.table("shh_test").as[(String, String, Long)].collect()
      // batch 2: more hot + more cold — state must carry across batches
      in.addData(Seq.fill(4)(("g", "hot")) ++ Seq(("g", "c5"), ("g", "c6")): _*)
      q.processAllAvailable()
      q.stop()
      val all = spark.table("shh_test").as[(String, String, Long)].collect()
      // update-mode memory sink appends per batch: isolate batch 2's
      // emissions as the multiset difference — the FINAL estimate, not
      // the max across batches (MG counters can legally decrease, so a
      // max would mask a broken state carry-over)
      val b1 = batch1.groupBy(identity).view.mapValues(_.length).toMap
      val batch2 = all.groupBy(identity).toSeq.flatMap { case (row, occ) =>
        Seq.fill(occ.length - b1.getOrElse(row, 0))(row) }
      val finalHot = batch2.filter(r => r._1 == "g" && r._2 == "hot").map(_._3)
      // MG guarantee over the full 16-token g-stream with k=3:
      // est >= true - n/(k+1) = 10 - 4 = 6; and never over-counts
      assert(finalHot.nonEmpty, "batch 2 must re-emit the tracked hot token")
      assert(finalHot.forall(e => e >= 6L && e <= 10L),
        s"final hot estimate $finalHot violates the Misra-Gries bound")
      assert(all.exists(r => r._1 == "h" && r._2 == "x" && r._3 == 1L),
        "per-key state: group h tracks its own summary")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("foreachBatch streaming upsert: incremental ingest converges to keyed table state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_sink").toString + "/t"
    val mem = MemoryStream[(Int, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val incoming = batch.dropDuplicates("k")
        val merged =
          if (new java.io.File(dir).exists())
            graft.operators.Upsert(spark.read.parquet(dir), incoming, Seq("k"))
          else incoming
        // rewrite table state (a real lake format would MERGE in place)
        val staged = merged.cache()
        staged.count()
        staged.write.mode("overwrite").parquet(dir)
        staged.unpersist()
        ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()

    mem.addData((1, "a"), (2, "b"))
    q.processAllAvailable()
    mem.addData((2, "B2"), (3, "c")) // update + insert, reference U1 semantics
    q.processAllAvailable()
    q.stop()

    val state = spark.read.parquet(dir).as[(Int, String)].collect().toMap
    assert(state === Map(1 -> "a", 2 -> "B2", 3 -> "c"))
  }

  test("streaming index freshness: foreachBatch appends embeddings to the saved IVF index") {
    // the serving composition: the ANN index stays fresh as vectors
    // stream in — each micro-batch runs the appendToIvfIndex path (encode
    // ONLY the batch against the frozen centroids), and a probe after the
    // stream sees exactly what a bulk rebuild over the union would serve
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = graft.operators.Similarity.kmeansCentroids(
      emb, "vec_id", "embedding", 8, 1)
    val streamed = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString
    val bulk = java.nio.file.Files.createTempDirectory("graft_ivf_bulk").toString
    graft.operators.Similarity.buildIvfIndex(
      emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", cents, streamed)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.Similarity.appendToIvfIndex(
          spark, streamed, batch, "vec_id", "embedding")
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    // two "days" of arrivals
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val (day1, day2) = rest.partition(_._1 % 3 == 1)
    mem.addData(day1.toSeq); q.processAllAvailable()
    mem.addData(day2.toSeq); q.processAllAvailable()
    q.stop()
    graft.operators.Similarity.buildIvfIndex(
      emb, "vec_id", "embedding", cents, bulk)
    def probe(path: String) = graft.operators.Similarity.ivfTopKIndexed(
        spark, path, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 10, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(probe(streamed) === probe(bulk),
      "stream-appended index must probe exactly like a bulk rebuild")
  }

  test("streaming index freshness: foreachBatch appends codes to the saved IVF-PQ index") {
    // same serving composition for the codes-at-rest index: each
    // micro-batch encodes ONLY its vectors against the FROZEN coarse
    // centroids + codebook (appendToPqIndex), so the probe after the
    // stream equals a bulk rebuild over the union under the same model —
    // one index generation, retraining stays an offline decision
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val coarse = graft.operators.Similarity.kmeansCentroids(
      emb, "vec_id", "embedding", 8, 1)
    val cb = graft.operators.Similarity.pqTrain(
      emb, "vec_id", "embedding", 8, 64, 1)
    val streamed = java.nio.file.Files.createTempDirectory("graft_pq_stream").toString
    val bulk = java.nio.file.Files.createTempDirectory("graft_pq_sbulk").toString
    graft.operators.Similarity.buildPqIndex(
      emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
      coarse, cb, streamed)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.Similarity.appendToPqIndex(
          spark, streamed, batch, "vec_id", "embedding")
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val (day1, day2) = rest.partition(_._1 % 3 == 1)
    mem.addData(day1.toSeq); q.processAllAvailable()
    mem.addData(day2.toSeq); q.processAllAvailable()
    q.stop()
    graft.operators.Similarity.buildPqIndex(
      emb, "vec_id", "embedding", coarse, cb, bulk)
    def probe(path: String) = graft.operators.Similarity.ivfPqTopKIndexed(
        spark, path, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 10, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(probe(streamed) === probe(bulk),
      "stream-appended PQ index must probe exactly like a bulk rebuild")
  }

  test("streaming index freshness: foreachBatch appends documents to the saved LSH index") {
    // the third index kind gets the same serving composition as IVF and
    // IVF-PQ: the near-dup index stays fresh as documents stream in (each
    // micro-batch signs ONLY itself with the index's stored parameters),
    // and a probe after the stream sees exactly what a bulk rebuild over
    // the union would serve
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val streamed = java.nio.file.Files.createTempDirectory("graft_lsh_stream").toString
    val bulk = java.nio.file.Files.createTempDirectory("graft_lsh_bulk").toString
    graft.operators.Dedup.buildLshIndex(
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", 3, streamed)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.Dedup.appendToLshIndex(
          spark, streamed, batch, "doc_id", "text")
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    val rest = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (day1, day2) = rest.partition(_._1 % 3 == 1)
    mem.addData(day1.toSeq); q.processAllAvailable()
    mem.addData(day2.toSeq); q.processAllAvailable()
    q.stop()
    graft.operators.Dedup.buildLshIndex(docs, "doc_id", "text", 3, bulk)
    val probeBatch = docs.filter(col("doc_id") < 50)
    def probe(path: String) = graft.operators.Dedup.lshIndexedPairs(
        spark, path, probeBatch, "doc_id", "text", 0.6)
      .collect().map(_.toSeq).toSet
    assert(probe(streamed) === probe(bulk),
      "stream-appended LSH index must probe exactly like a bulk rebuild")
  }

  test("streaming graph freshness: foreachBatch merges edge micro-batches into live labels") {
    // the graph family's index-freshness story, mirroring the LSH/IVF/PQ
    // lifecycle above: component labels are the at-rest state, each
    // micro-batch of NEW near-dup edges relabels only the touched
    // components (incrementalComponents' quotient solve is batch-sized),
    // and the final labels equal a batch re-solve over every edge seen
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 13L), (11L, 12L),
      (3L, 10L), (20L, 21L), (21L, 1L), (30L, 31L))
    val (day0, rest) = edges.splitAt(3)
    var labels = graft.operators.Components
      .connectedComponents(day0.toDF("s", "d"), "s", "d")
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("s", "d").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = graft.operators.Checkpoints.cut(
          graft.operators.Components
            .incrementalComponents(labels, batch, "s", "d"))
        graft.operators.Checkpoints.release(labels)
        labels = next
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    val (day1, day2) = rest.splitAt(3)
    mem.addData(day1); q.processAllAvailable()
    mem.addData(day2); q.processAllAvailable()
    q.stop()
    val streamed = labels.as[(Long, Long)].collect().toMap
    val batchSolve = graft.operators.Components
      .connectedComponents(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(streamed === batchSolve,
      "stream-merged labels must equal the batch re-solve over all edges")
  }

  test("streaming centrality freshness: per-batch warm-start re-rank tracks the batch solve") {
    // completes the graph family's lifecycle symmetry: components have
    // incremental relabeling (above), the centrality pair now re-ranks
    // per micro-batch SEEDED from the previous ranks — a near-converged
    // seed meets the convergence budget in a round or two instead of a
    // cold power run, which is what makes per-batch re-ranking affordable
    // at scale (the edge corpus is at rest; only the rank iteration count
    // shrinks)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a micro-batch is a SMALL fraction of the resident graph (the
    // warm-start premise — a batch that rewires a fifth of the edges is
    // a cold-start problem, and on such a graph a stale seed can even
    // lose to the uniform init): ~120 resident multi-edges over 17
    // nodes, day1/day2 deltas of 6 and 4 edges
    val allEdges = (1L to 120L).map(i =>
      (s"v${i % 17}", s"v${(i * 5) % 17}", 1L + i % 3))
    val (day0, rest) = allEdges.splitAt(110)
    var edgesAtRest = graft.operators.Checkpoints.cut(day0.toDF("s", "d", "w"))
    var (ranks, _) = graft.operators.Components.pageRankUntil(
      edgesAtRest, "s", "d", Some("w"), deltaL1 = 17L, maxIters = 200)
    var lastWarmRounds = Int.MaxValue
    val mem = MemoryStream[(String, String, Long)]
    val q = mem.toDF().toDF("s", "d", "w").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val grown = graft.operators.Checkpoints.cut(
          edgesAtRest.unionByName(batch))
        graft.operators.Checkpoints.release(edgesAtRest)
        edgesAtRest = grown
        val (next, r) = graft.operators.Components.pageRankUntil(
          edgesAtRest, "s", "d", Some("w"), deltaL1 = 17L, maxIters = 200,
          seed = Some(ranks))
        graft.operators.Checkpoints.release(ranks)
        ranks = next
        lastWarmRounds = r
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    val (day1, day2) = rest.splitAt(6)
    mem.addData(day1); q.processAllAvailable()
    mem.addData(day2); q.processAllAvailable()
    q.stop()
    val streamed = ranks.as[(String, Long)].collect().toMap
    val (cold, coldRounds) = graft.operators.Components.pageRankUntil(
      allEdges.toDF("s", "d", "w"), "s", "d", Some("w"), deltaL1 = 17L,
      maxIters = 200)
    val coldMap = cold.as[(String, Long)].collect().toMap
    assert(streamed.keySet === coldMap.keySet)
    // both runs stopped inside the same L1 budget of the same integer
    // fixed-point map; truncation leaves a persistent few-unit cycle, so
    // the contract is budget-scale closeness, not bit equality
    val l1 = coldMap.keysIterator
      .map(k => math.abs(streamed(k) - coldMap(k))).sum
    assert(l1 <= 10 * 17L,
      s"warm-start stream must land within budget-scale of the cold solve, L1=$l1")
    assert(lastWarmRounds < coldRounds,
      s"freshness win: warm start ran $lastWarmRounds rounds vs cold $coldRounds")
  }

  test("streaming drift monitor: additive count state tracks the batch KS exactly") {
    // the stats family's freshness story: the KS monitor's at-rest state
    // is the per-(source, value) count table — ADDITIVE, so a micro-batch
    // merge is one full-outer sum (Drift.mergeCounts, grid-sized) and
    // each day's drift check (Drift.ksFromCounts) never rescans history.
    // After streaming the corpus in three batches, the statistic must be
    // BIT-identical to the batch q177 computed over everything at once.
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"))
      .as[(String, Long)].collect()
    var state = graft.operators.Checkpoints.cut(
      Seq.empty[(String, Long, Long)].toDF("source", "v", "c"))
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("source", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = graft.operators.Checkpoints.cut(
          graft.operators.Drift.mergeCounts(state, batch, "source", "v", "c"))
        graft.operators.Checkpoints.release(state)
        state = next
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    rows.grouped((rows.length + 2) / 3)
      .foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = graft.operators.Drift
      .ksFromCounts(state, "source", "v", "c")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q177_ks_drift")(spark, dir)
      .withColumnRenamed("n_src", "n_grp")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch,
      "stream-merged count state must reproduce the batch KS bit-for-bit")
    // the TV metric reads the SAME state — one merged table serves the
    // whole drift panel
    val streamedTv = graft.operators.Drift
      .tvFromCounts(state, "source", "v", "c")
      .collect().map(_.toSeq).toSet
    val batchTv = SparkEntry.queries("q192_tv_drift")(spark, dir)
      .withColumnRenamed("n_src", "n_grp")
      .collect().map(_.toSeq).toSet
    assert(streamedTv === batchTv,
      "the TV panel over the streamed state must equal the batch q192")
    // ...and the W1 leg, same state again
    val streamedW1 = graft.operators.Drift
      .w1FromCounts(state, "source", "v", "c")
      .collect().map(_.toSeq).toSet
    val batchW1 = SparkEntry.queries("q195_w1_drift")(spark, dir)
      .withColumnRenamed("n_src", "n_grp")
      .collect().map(_.toSeq).toSet
    assert(streamedW1 === batchW1,
      "the W1 panel over the streamed state must equal the batch q195")
  }

  test("q257 stateful sessions = q53's sessions minus each user's open trailing one") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tws").toString
    val base = 1704067200L
    // u1: three sessions (two closed by successors, one trailing);
    // u2: one session only — emit-on-close must emit NOTHING for u2
    val rows = Seq(
      (1L, base, 1L, 0.25), (2L, base + 60, 1L, 0.50),       // u1 s1
      (3L, base + 7200, 1L, 1.00), (4L, base + 7260, 1L, 0.75), // u1 s2
      (5L, base + 14400, 1L, 0.10),                           // u1 s3 (open)
      (6L, base + 100, 2L, 9.99), (7L, base + 200, 2L, 0.01)  // u2 (open)
    ).map { case (id, t, u, v) =>
      (id, t * 1000000000L, u, "click", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q257_stream_stateful_sessions")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, base * 1000000L, 2L, 75L),
      (1L, (base + 7200) * 1000000L, 2L, 175L)),
      "u1's two CLOSED sessions, exact cents; u2 and the open session withheld")
    // cross-check against q53's complete session inventory on real data:
    // q257 = q53 minus each user's LAST session (the open one)
    val full = SparkEntry.queries("q53_session_window")(
        spark, "/root/testdata/sf0.001")
      .select(col("user_id"), unix_micros(col("session_start")).as("us"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = full.groupBy(_._1).values.flatMap { ss =>
      ss.sortBy(_._2).dropRight(1)
    }.toSet
    val real = SparkEntry.queries("q257_stream_stateful_sessions")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(real === expected,
      "streamed closed sessions must equal batch sessions minus trailing")
  }

  test("q257 sessionizer: out-of-order row across micro-batches cannot rewind the gap clock") {
    implicit val sqlCtx = spark.sqlContext
    // ADVICE r17: the merge must keep the high-water mark monotone.
    // Batch 1 closes at us=100 s; batch 2 delivers a LATE row at 50 s
    // followed by an on-time row at 1850 s. A rewound last (:= 50 s)
    // would make 1850 − 50 = 1800 s ≥ Gap and falsely split; the
    // monotone merge keeps last = 100 s, 1850 − 100 < Gap, one session.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Long, Long)] // (user, us, cents)
      val out = in.toDS().groupByKey(_._1)
        .transformWithState(new graft.queries.SessionProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user_id", "start_us", "n_events", "cents")
        .writeStream.format("memory").queryName("sess_ooo_test")
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      val S = 1000000L // 1 s in µs
      in.addData((1L, 0L, 10L), (1L, 100L * S, 10L))
      q.processAllAvailable()
      in.addData((1L, 50L * S, 10L), (1L, 1850L * S, 10L))
      q.processAllAvailable()
      assert(spark.table("sess_ooo_test").count() === 0,
        "no session may close: the late row merges, the gap clock holds")
      in.addData((1L, 3650L * S, 10L)) // 1850 s + Gap → closes the session
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("sess_ooo_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq === Seq((1L, 0L, 4L, 40L)),
        "ONE whole session of all four rows, started at the true minimum")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
