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
      // two cuts (hashed shingles, signatures), neither superseded → both live
      assert(uuidDirs(root).length === 2)
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
    }
  }
}
