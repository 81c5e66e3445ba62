package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Lineage cuts for the iterative/staged operator family
  * ([[Components]], [[Dedup.minHashLsh]]/[[Dedup.ngramJaccard]],
  * [[Similarity.kmeansCentroids]]/[[Similarity.cosinePairsLsh]]), switched
  * by ONE runtime config:
  *
  *   - `graft.checkpoint.dir` unset (default): `localCheckpoint()` —
  *     executor-local blocks, no I/O setup; right for single-node and
  *     short-lived sessions. Caveat: the blocks are unreplicated and die
  *     with their executor, and the truncated lineage cannot recompute
  *     them — an executor loss mid-operator fails the job.
  *   - `graft.checkpoint.dir = <path>`: reliable `checkpoint()` into that
  *     directory (HDFS/object store on a cluster) — survives executor loss
  *     and dynamic-allocation decommission; the cluster posture.
  *
  * Each reliable cut goes to its own subdirectory (Spark stamps a fresh
  * UUID per `setCheckpointDir` call) and is recorded so iterative loops can
  * [[release]] superseded rounds as they advance — a long k-means or
  * star-contraction run holds at most one round of checkpoint files per
  * live frame instead of accumulating all of them. CheckpointModeSpec
  * asserts both modes return identical results and that released rounds'
  * files are actually deleted.
  */
object Checkpoints {

  /** Runtime conf key; set it via `spark.conf.set(DirConf, path)`. */
  val DirConf = "graft.checkpoint.dir"

  // Dataset does not override equals/hashCode, so this keys by identity —
  // exactly the "this particular cut frame" semantics release() needs.
  private val cutDirs = TrieMap.empty[DataFrame, String]

  /** Cut `df`'s lineage and materialize it, mode per [[DirConf]]. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(root) =>
        val sc = spark.sparkContext
        sc.setCheckpointDir(root) // Spark appends a fresh UUID subdir
        val dir = sc.getCheckpointDir.get
        val out = df.checkpoint()
        cutDirs.put(out, dir)
        out
      case None => df.localCheckpoint()
    }
  }

  /** Delete the checkpoint files behind a superseded [[cut]] frame (no-op
    * in localCheckpoint mode, or for frames not produced by [[cut]]). Only
    * call once nothing live reads `df` — iterative loops call it on round
    * n−1 after round n is materialized.
    */
  def release(df: DataFrame): Unit =
    cutDirs.remove(df).foreach { dir =>
      val p = new Path(dir)
      p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
}
