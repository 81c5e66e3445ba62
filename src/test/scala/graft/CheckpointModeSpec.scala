package graft

import java.io.File

import graft.operators.{Checkpoints, Components, Dedup}

/** The one-config checkpoint mode switch: `graft.checkpoint.dir` unset →
  * executor-local localCheckpoint (default); set → reliable checkpoint()
  * into the directory. Both modes must return identical results; reliable
  * mode must actually write files, and iterative loops must delete
  * superseded rounds' files as they advance.
  */
class CheckpointModeSpec extends SparkSpec {
  import spark.implicits._

  private def uuidDirs(root: File): Array[File] =
    Option(root.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)

  test("reliable mode: identical results, files appear, superseded rounds cleaned") {
    // a diameter-3 path (forces several propagation rounds) plus a second
    // component
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("s", "d")
    val byDefault = Components.connectedComponents(edges, "s", "d")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(byDefault === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))

    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    spark.conf.set(Checkpoints.DirConf, root.toString)
    try {
      val reliable = Components.connectedComponents(edges, "s", "d")
      assert(reliable.as[(Long, Long)].collect().sorted.toSeq === byDefault,
        "reliable-checkpoint mode must not change results")
      val remaining = uuidDirs(root)
      assert(remaining.nonEmpty, "reliable mode must write checkpoint files")
      // the loop cut once per round and released every superseded round:
      // only the final labels frame's files may remain
      assert(remaining.length === 1,
        s"superseded rounds must be deleted, found ${remaining.length} dirs")
      assert(remaining.forall(d => d.listFiles().nonEmpty),
        "the surviving cut must hold actual checkpoint data")
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
    }
  }

  test("one-shot operators release staging cuts; the sealed result is swept on GC") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt3").toFile
    spark.conf.set(Checkpoints.DirConf, root.toString)
    try {
      // run in a narrower scope so the result frame is unreachable after
      // return — only its collected rows survive
      def run(): Int =
        graft.operators.Similarity.cosinePairsLsh(emb, "vec_id", "embedding",
          0.45, maxBackgroundRetention = 1.0).collect().length
      assert(run() === 7)
      // end-of-operator: the staging cut (the norm'd projection read three
      // times) was released; only the sealed RESULT's directory remains
      assert(uuidDirs(root).length === 1,
        s"staging dirs must be released at operator end, found ${uuidDirs(root).length}")
      // the result is now unreachable: the weak backstop deletes its
      // directory once the JVM collects the checkpointed RDD
      var tries = 0
      while (uuidDirs(root).nonEmpty && tries < 40) {
        System.gc()
        Checkpoints.sweep()
        Thread.sleep(50)
        tries += 1
      }
      assert(uuidDirs(root).isEmpty,
        "an unreachable sealed cut must be swept (weak-keyed registry)")
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
    }
  }

  test("local mode: a released cut read by a still-lazy consumer recomputes, never corrupts") {
    import org.apache.spark.sql.functions.{col, sum}
    // The r11 failure shape: an operator returns a LAZY plan over its
    // staging cuts and the session frees those blocks before the consumer
    // acts. With localCheckpoint cuts (r11) the truncated lineage makes
    // the consumer fail or flake — this test FAILS on that pattern. With
    // persist-based cuts the physical lineage is intact: the read
    // recomputes and is bit-identical.
    val cut = Checkpoints.cut(
      spark.range(0L, 1000L, 1L, 4).selectExpr("id", "id * id as sq"))
    val lazyConsumer = cut.filter(col("sq") % 7 === 0)
      .groupBy((col("id") % 3).as("g")).agg(sum("sq").as("s"))
    val expected = lazyConsumer.collect().map(_.toSeq).toSet
    Checkpoints.release(cut) // blocks gone NOW — r11 could never recover them
    assert(lazyConsumer.collect().map(_.toSeq).toSet === expected,
      "a consumer outliving a released cut must recompute identical rows")
  }

  test("local-mode cut/release cycle emits no truncated-lineage warnings") {
    // the r11 bench tail carried "RDD ... was locally checkpointed, its
    // lineage has been truncated and cannot be recomputed after
    // unpersisting" on every released round — the smoking gun the verdict
    // flagged. Capture Spark's log4j2 stream around a full iterative
    // solve (multi-round propagation + releases) and assert silence.
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "graft-warn-probe", null,
      org.apache.logging.log4j.core.layout.PatternLayout.createDefaultLayout(),
      false, Array.empty) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("cannot be recomputed after unpersisting")) seen.add(m)
      }
    }
    appender.start()
    val root = ctx.getConfiguration
      .getLoggerConfig(org.apache.logging.log4j.LogManager.ROOT_LOGGER_NAME)
    root.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try {
      val edges = (1L to 40L).map(i => (i + 1, i)).toDF("s", "d")
      Components.connectedComponents(edges, "s", "d").collect()
      Components.pageRank(
        Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L)).toDF("s", "d", "w"),
        "s", "d", Some("w"), iters = 6).collect()
      assert(seen.isEmpty,
        s"released cuts must be recomputable — got:\n${seen.toArray.mkString("\n")}")
    } finally {
      root.removeAppender("graft-warn-probe")
      ctx.updateLoggers()
      appender.stop()
    }
  }

  test("periodic truncation bounds physical lineage depth; untruncated chains grow") {
    import org.apache.spark.sql.functions.col
    // kept-forever physical lineage is its own unbounded resource: each
    // persist-cut strongly references every prior round's RDDs, so
    // driver memory and per-job DAG traversal grow O(rounds) and very
    // deep chains risk StackOverflowError in stage construction. Every
    // Nth cut (TruncateEveryConf) also severs physical lineage.
    def chain(n: Int): org.apache.spark.rdd.RDD[_] = {
      var df = spark.range(0L, 50L, 1L, 2).toDF("v")
      (1 to n).foreach { _ =>
        df = Checkpoints.cut(df.select((col("v") + 1).as("v")))
      }
      df.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
    }
    def depth(r: org.apache.spark.rdd.RDD[_]): Int =
      1 + (if (r.dependencies.isEmpty) 0
           else r.dependencies.map(d => depth(d.rdd)).max)
    spark.conf.set(Checkpoints.TruncateEveryConf, "0")
    val unbounded =
      try depth(chain(8))
      finally spark.conf.unset(Checkpoints.TruncateEveryConf)
    spark.conf.set(Checkpoints.TruncateEveryConf, "1")
    val bounded =
      try depth(chain(8))
      finally spark.conf.unset(Checkpoints.TruncateEveryConf)
    assert(unbounded > 8, s"untruncated 8-cut chain must grow, got $unbounded")
    assert(bounded <= 4,
      s"every-cut truncation must keep physical depth constant, got $bounded")
  }

  test("malformed truncateEvery conf fails with a clear message, not a raw NumberFormatException") {
    spark.conf.set(Checkpoints.TruncateEveryConf, "sixteen")
    val e =
      try intercept[IllegalArgumentException] {
        Checkpoints.cut(spark.range(5).toDF("v"))
      } finally spark.conf.unset(Checkpoints.TruncateEveryConf)
    assert(e.getMessage.contains(Checkpoints.TruncateEveryConf))
    assert(e.getMessage.contains("sixteen"))
  }

  test("releases across truncation points stay correct (no unrecoverable unpersist)") {
    import org.apache.spark.sql.functions.{col, sum}
    // a truncated cut's blocks cannot be recomputed, so release() must
    // skip unpersisting them while downstream frames could still
    // recompute through them — the ContextCleaner reclaims them later
    spark.conf.set(Checkpoints.TruncateEveryConf, "2")
    try {
      var df = spark.range(0L, 50L, 1L, 2).toDF("v")
      val staged = collection.mutable.Buffer[org.apache.spark.sql.DataFrame]()
      (1 to 6).foreach { _ =>
        df = Checkpoints.cut(df.select((col("v") + 1).as("v")))
        staged += df
      }
      staged.init.foreach(Checkpoints.release)
      assert(df.agg(sum("v")).first().getLong(0) ===
        (0L until 50L).map(_ + 6L).sum,
        "chain across released truncation points must read identical values")
    } finally {
      spark.conf.unset(Checkpoints.TruncateEveryConf)
    }
  }

  test("staged (non-iterative) operators are mode-identical too") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "an entirely different document about spark checkpoint modes")
    ).toDF("doc_id", "text")
    val byDefault = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.6)
      .collect().toSet
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt2").toFile
    spark.conf.set(Checkpoints.DirConf, root.toString)
    try {
      val reliable = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.6)
      assert(reliable.collect().toSet === byDefault)
      // one fused (id, hs, sig) cut since r21's docSignatures fuse, live
      assert(uuidDirs(root).length === 1)
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
    }
  }
}
