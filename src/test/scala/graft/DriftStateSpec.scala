package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

/** The drift count state AT REST: write → micro-batch merges through the
  * staged-swap files → read must reproduce the all-in-memory panel
  * bit-for-bit (the StreamingSpec three-batch case, routed through the
  * filesystem instead of foreachBatch frames), and the metadata contract
  * must fail loudly on paths that hold no state.
  */
class DriftStateSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmpState(): String = java.nio.file.Files
    .createTempDirectory("graft_driftstate").toString + "/state"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("write -> merge two micro-batches -> read == the in-memory merge, bit-for-bit") {
    val path = tmpState()
    val obs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("v"))
    val parts = (0 to 2).map(i =>
      obs.filter(pmod(col("doc_id"), lit(3)) === i).select("source", "v"))

    // at-rest path: batch 0 seeds the written state, batches 1 and 2
    // land through mergeIntoCounts' staged swap
    Drift.writeCounts(
      parts(0).groupBy("source", "v").agg(count(lit(1)).as("c")),
      path, "source", "v", "c")
    Drift.mergeIntoCounts(spark, path, parts(1))
    Drift.mergeIntoCounts(spark, path, parts(2))
    val (state, g, v, c) = Drift.readCounts(spark, path)
    assert((g, v, c) === (("source", "v", "c")),
      "readCounts must return the recorded column names")

    // in-memory reference: same three batches through mergeCounts frames
    var mem = Seq.empty[(String, Long, Long)].toDF("source", "v", "c")
    parts.foreach(p => mem = Drift.mergeCounts(mem, p, "source", "v", "c"))

    assert(rows(state) === rows(mem),
      "the published count table must equal the in-memory merge")
    assert(rows(Drift.ksFromCounts(state, g, v, c)) ===
      rows(Drift.ksFromCounts(mem, "source", "v", "c")),
      "KS over the at-rest state must be bit-equal to the in-memory path")
    assert(rows(Drift.tvFromCounts(state, g, v, c)) ===
      rows(Drift.tvFromCounts(mem, "source", "v", "c")),
      "TV over the at-rest state must be bit-equal to the in-memory path")

    // and the additive-state law the whole lifecycle rests on: the
    // batched merge equals counting everything at once
    val allAtOnce = obs.select("source", "v")
      .groupBy("source", "v").agg(count(lit(1)).as("c"))
    assert(rows(state) === rows(allAtOnce),
      "replaying the corpus in batches must reproduce the one-shot counts")
  }

  test("streaming foreachBatch merges into the AT-REST state: the monitor end-to-end through files") {
    // the full restart-safe monitor shape: a stream lands micro-batches
    // into the PERSISTED state (writeCounts seed + mergeIntoCounts per
    // batch), and the panel read back from the published files equals
    // the all-at-once batch queries bit-for-bit — StreamingSpec proves
    // the in-memory merge, this proves it through the filesystem, where
    // a real monitor's restarts actually resume.
    implicit val sqlCtx = spark.sqlContext
    val path = tmpState()
    graft.operators.Drift.writeCounts(
      Seq.empty[(String, Long, Long)].toDF("source", "v", "c"),
      path, "source", "v", "c")
    val data = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    val mem = org.apache.spark.sql.execution.streaming
      .runtime.MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("source", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.Drift.mergeIntoCounts(spark, path, batch); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    data.grouped((data.length + 2) / 3)
      .foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
    q.stop()
    val (state, g, v, c) = graft.operators.Drift.readCounts(spark, path)
    assert(rows(graft.operators.Drift.ksFromCounts(state, g, v, c)) ===
      rows(SparkEntry.queries("q177_ks_drift")(spark, dir)
        .withColumnRenamed("n_src", "n_grp")),
      "KS from the streamed at-rest state must equal the batch q177")
    assert(rows(graft.operators.Drift.w1FromCounts(state, g, v, c)) ===
      rows(SparkEntry.queries("q195_w1_drift")(spark, dir)
        .withColumnRenamed("n_src", "n_grp")),
      "W1 from the streamed at-rest state must equal the batch q195")
    assert(rows(graft.operators.Drift
        .psiBucketsFromCounts(state, g, v, c, buckets = 8)
        .withColumnRenamed("c_grp", "c_src")
        .withColumnRenamed("n_grp", "n_src")) ===
      rows(SparkEntry.queries("q215_psi_buckets")(spark, dir)),
      "PSI from the streamed at-rest state must equal the batch q215")
  }

  test("two persisted states compared with the BetweenCounts panel == the in-memory q199 legs") {
    // the full today-vs-yesterday monitor: yesterday's corpus half and
    // today's live at separate persisted states; the panel reads both
    // back and must equal the all-in-memory between-halves computation
    // (q199's construction) leg for leg
    val obs = Tables.documents(spark, dir)
    val n = obs.count()
    val thenHalf = obs.filter(col("doc_id") * 2 < n)
      .select(col("source"), col("n_chars").as("v"))
    val nowHalf = obs.filter(col("doc_id") * 2 >= n)
      .select(col("source"), col("n_chars").as("v"))
    def persist(half: org.apache.spark.sql.DataFrame): (
        org.apache.spark.sql.DataFrame, String, String, String) = {
      val p = tmpState()
      Drift.writeCounts(half.groupBy("source", "v")
        .agg(count(lit(1)).as("c")), p, "source", "v", "c")
      Drift.readCounts(spark, p)
    }
    val (sa, g, v, c) = persist(thenHalf)
    val (sb, _, _, _) = persist(nowHalf)
    val memA = thenHalf.groupBy("source", "v").agg(count(lit(1)).as("c"))
    val memB = nowHalf.groupBy("source", "v").agg(count(lit(1)).as("c"))
    for ((name, op) <- Seq[(String,
        (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
          => org.apache.spark.sql.DataFrame)](
        "ks" -> ((a, b) => Drift.ksBetweenCounts(a, b, g, v, c)),
        "tv" -> ((a, b) => Drift.tvBetweenCounts(a, b, g, v, c)),
        "w1" -> ((a, b) => Drift.w1BetweenCounts(a, b, g, v, c)),
        "chi2" -> ((a, b) => Drift.chi2BetweenCounts(a, b, g, v, c)))) {
      assert(rows(op(sa, sb)) === rows(op(memA, memB)),
        s"$name over two at-rest states must equal the in-memory panel")
    }
  }

  test("readCounts fails with a domain message where no state exists") {
    val e = intercept[IllegalArgumentException] {
      Drift.readCounts(spark, tmpState() + "_nowhere")
    }
    assert(e.getMessage.contains("no drift count state"),
      s"wanted the domain message, got: ${e.getMessage}")
  }

  test("a crashed merge's staging debris never corrupts the next merge") {
    val path = tmpState()
    import spark.implicits._
    val seed = Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("g", "v")
    Drift.writeCounts(seed.groupBy("g", "v").agg(count(lit(1)).as("c")),
      path, "g", "v", "c")
    // simulate a crash that left a half-written staging dir behind
    val debris = new org.apache.hadoop.fs.Path(s"$path/counts_staging")
    val fs = debris.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(debris)
    val out = fs.create(new org.apache.hadoop.fs.Path(debris, "junk"), true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    val merged = Drift.mergeIntoCounts(spark, path,
      Seq(("a", 1L), ("c", 5L)).toDF("g", "v"))
    assert(rows(merged) === Set(Seq("a", 1L, 2L), Seq("a", 2L, 1L),
      Seq("b", 1L, 1L), Seq("c", 5L, 1L)))
  }

  test("a crash BETWEEN the two renames recovers on the next read, onto the NEW state") {
    // the one window where no live counts dir exists: rename(live,
    // retired) succeeded, rename(staging, live) never ran. By then the
    // staged table was completely written, so readCounts must publish
    // it — losing neither the state nor the batch that was mid-merge.
    val path = tmpState()
    import spark.implicits._
    Drift.writeCounts(Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
      .groupBy("g", "v").agg(count(lit(1)).as("c")), path, "g", "v", "c")
    val after = Drift.mergeIntoCounts(spark, path,
      Seq(("a", 1L), ("c", 3L)).toDF("g", "v")).collect().map(_.toSeq).toSet
    // reconstruct the crash window from the healthy post-merge state:
    // live becomes the staged (new) table, retired holds the old one
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/counts")
    fs.rename(live, new org.apache.hadoop.fs.Path(s"$path/counts_staging"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/counts_retired"))
    val (state, g, v, c) = Drift.readCounts(spark, path)
    assert((g, v, c) === (("g", "v", "c")))
    assert(rows(state) === after,
      "recovery must publish the complete staged state, not fail or roll back")
    assert(fs.exists(live) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$path/counts_staging")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$path/counts_retired")),
      "recovery must leave exactly the published layout")
    // and the defensive last resort: live AND staging both gone, only
    // retired left — restore the old state rather than fail
    fs.rename(live, new org.apache.hadoop.fs.Path(s"$path/counts_retired"))
    val (state2, _, _, _) = Drift.readCounts(spark, path)
    assert(rows(state2) === after,
      "retired-only layout must restore rather than fail")
  }

  test("vec state: batched merges == one-shot sums, in ANY merge order") {
    // the semantic leg's additive-state law: micro-unit sums merged in
    // vec_id-sliced batches through the staged swap must equal the
    // all-at-once vecMicroSums — and because the state is exact integer
    // arithmetic, REVERSING the batch order must reproduce the identical
    // table (the float-sum order-flicker this design exists to prevent)
    val obs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val parts = (0 to 2).map(i =>
      obs.filter(pmod(col("vec_id"), lit(3)) === i)
        .select("label", "embedding"))
    def build(order: Seq[Int]): Set[Seq[Any]] = {
      val path = tmpState()
      Drift.writeVecSums(
        Seq.empty[(Int, Int, Long, Long)].toDF("label", "dim", "s", "n"),
        path, "label", "dim", "s", "n")
      order.foreach(i =>
        Drift.mergeIntoVecSums(spark, path, parts(i), "label", "embedding"))
      val (state, g, dm, sm, n) = Drift.readVecSums(spark, path)
      assert((g, dm, sm, n) === (("label", "dim", "s", "n")),
        "readVecSums must return the recorded column names")
      rows(state)
    }
    val forward = build(Seq(0, 1, 2))
    val oneShot = rows(
      Drift.vecMicroSums(obs.select("label", "embedding"),
        "label", "embedding"))
    assert(forward === oneShot,
      "replaying the corpus in batches must reproduce the one-shot sums")
    assert(build(Seq(2, 0, 1)) === forward,
      "merge order must not change a single row of the integer state")
  }

  test("vec state: kind and existence contracts fail loudly, not misread") {
    val p1 = tmpState()
    val e1 = intercept[IllegalArgumentException] {
      Drift.readVecSums(spark, p1 + "_nowhere")
    }
    assert(e1.getMessage.contains("no vector-sum state"))
    // a count state is NOT readable as a vec state (and vice versa):
    // the recorded kind gates the read before any schema guessing
    Drift.writeCounts(Seq(("a", 1L, 1L)).toDF("g", "v", "c"),
      p1, "g", "v", "c")
    val e2 = intercept[IllegalArgumentException] {
      Drift.readVecSums(spark, p1)
    }
    assert(e2.getMessage.contains("kind 'drift'"))
    val p2 = tmpState()
    Drift.writeVecSums(
      Seq.empty[(Int, Int, Long, Long)].toDF("label", "dim", "s", "n"),
      p2, "label", "dim", "s", "n")
    val e3 = intercept[IllegalArgumentException] {
      Drift.readCounts(spark, p2)
    }
    assert(e3.getMessage.contains("kind 'vecsum'"))
  }
}
