package graft.operators

import java.lang.ref.{ReferenceQueue, WeakReference}

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Lineage cuts for the iterative/staged operator family
  * ([[Components]], [[Dedup.minHashLsh]]/[[Dedup.ngramJaccard]],
  * [[Similarity.kmeansCentroids]]/[[Similarity.cosinePairsLsh]]), switched
  * by ONE runtime config:
  *
  *   - `graft.checkpoint.dir` unset (default): a PERSIST-BASED cut —
  *     the frame is materialized into a persisted InternalRow RDD and
  *     wrapped in a fresh LogicalRDD ([[org.apache.spark.sql.graftshim
  *     .GraftSqlShim.persistCut]]). The logical plan is truncated (plan
  *     growth stops) but the physical lineage survives, so blocks lost to
  *     eviction, executor loss, or an eager [[release]] are recomputed
  *     from the original plan — never unrecoverable, never the
  *     truncated-lineage WARN. (r11 used `localCheckpoint()`, whose
  *     blocks die unrecoverably with their executor or an unpersist —
  *     the q157 hash-flake came from exactly that.) ONE exception:
  *     under a LOCAL master, every Nth cut ([[TruncateEveryConf]],
  *     default 16 local-only) also severs physical lineage to bound
  *     chain depth — those truncation points are NOT recomputable, which
  *     is safe single-JVM (no executor loss; [[release]] never
  *     unpersists them). On a non-local master the truncation default is
  *     OFF, so every cluster-mode persist-cut keeps full recoverability
  *     unless the user opts in explicitly.
  *   - `graft.checkpoint.dir = <path>`: reliable `checkpoint()` into that
  *     directory (HDFS/object store on a cluster) — survives executor loss
  *     and dynamic-allocation decommission; the cluster posture.
  *
  * Each reliable cut goes to its own subdirectory (Spark stamps a fresh
  * UUID per `setCheckpointDir` call). Directory lifecycle, two layers:
  *
  *   - EXPLICIT: iterative loops [[release]] superseded rounds as they
  *     advance, and one-shot operators [[sealAndRelease]] their staging
  *     cuts once the result is sealed — a long k-means run or a long-lived
  *     service holds at most the live frames' files, never an accumulating
  *     history.
  *   - WEAK BACKSTOP: every reliable cut is also registered under a WEAK
  *     key — the checkpointed RDD that every consumer plan references — so
  *     when the last frame reading a cut is garbage-collected, the next
  *     [[cut]]/[[release]]/[[sweep]] deletes its directory. Frames nobody
  *     can read anymore never pin files.
  *
  * CheckpointModeSpec asserts both modes return identical results, that
  * released rounds' files are actually deleted, and the one-shot
  * staging-release contract.
  */
object Checkpoints {

  /** Runtime conf key; set it via `spark.conf.set(DirConf, path)`. */
  val DirConf = "graft.checkpoint.dir"

  /** Local (persist-cut) mode: every Nth cut ALSO severs physical
    * lineage (`localCheckpoint`) so chain depth stays bounded — a
    * many-round loop otherwise accumulates O(rounds) RDD objects whose
    * per-job DAG traversal grows linearly and whose serialized closures
    * can overflow the stack at depth. Between truncation points every
    * cut stays fully recomputable; the truncation points themselves are
    * never unpersisted by [[release]] (their blocks cannot be
    * recomputed — the ContextCleaner reclaims them once no live frame
    * references them). `0` disables truncation.
    *
    * DEFAULT: 16 under a local master (single JVM — blocks can only be
    * lost by explicit unpersist, which [[release]] refuses for
    * truncation points), 0 (OFF) otherwise — on a cluster without
    * [[DirConf]], a truncation point's blocks die with their executor
    * and the job fails unrecoverably, so truncation there is strictly
    * opt-in. Cut counting is PER SESSION, so which cut becomes a
    * truncation point is reproducible run-to-run regardless of what
    * other sessions in the JVM are doing.
    */
  val TruncateEveryConf = "graft.checkpoint.truncateEvery"
  private val DefaultTruncateEvery = 16
  private val cutCounts = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.atomic.AtomicLong])
  // truncation-point RDDs (weakly held — entries die with the RDD):
  // release() must never unpersist one, they have no recompute path
  private val truncatedCuts = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, java.lang.Boolean])

  // The registry key is the checkpoint's RDD: every logical-plan copy of
  // the cut frame (including analyzer newInstance() copies on self-joins)
  // shares that RDD by reference, so the entry stays strongly reachable
  // exactly as long as SOME live frame can still read the files. Keying the
  // Dataset wrapper instead would free the key the moment the operator
  // returns, while the returned result still lazily reads the files.
  private final class Entry(key: AnyRef, val dir: String,
      val conf: Configuration) extends WeakReference[AnyRef](key, refQueue)
  private val refQueue = new ReferenceQueue[AnyRef]
  private val entries = TrieMap.empty[Entry, Unit]

  private def keyOf(df: DataFrame): AnyRef =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => other
    }

  /** [[cut]] plus the materialized row count: the eager materialization
    * counts in both modes anyway (persistCut's rdd.count; a reliable
    * checkpoint's count is a cheap scan of just-written files), so
    * size-dispatching callers (Packing.gridCumsums) learn the
    * cardinality without scheduling a second job.
    */
  def cutWithCount(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(_) =>
        val out = cut(df)
        (out, out.count())
      case None => persistModeCut(df)
    }
  }

  // the shared persist-mode (no DirConf) cut: truncation cadence per
  // TruncateEveryConf, materialized count returned for size dispatch
  private def persistModeCut(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession
    val every = spark.conf.getOption(TruncateEveryConf) match {
      case Some(v) =>
        try v.trim.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$TruncateEveryConf must be an integer (0 disables " +
              s"periodic lineage truncation); got '$v'")
        }
      case None =>
        // local-only default: see TruncateEveryConf scaladoc
        if (spark.sparkContext.isLocal) DefaultTruncateEvery else 0
    }
    val counter = cutCounts.computeIfAbsent(spark,
      _ => new java.util.concurrent.atomic.AtomicLong)
    val truncate = every > 0 && counter.incrementAndGet() % every == 0
    val (out, n) = org.apache.spark.sql.graftshim.GraftSqlShim.persistCutCounted(
      df, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK, truncate)
    if (truncate) truncatedCuts.put(keyOf(out), java.lang.Boolean.TRUE)
    (out, n)
  }

  /** Cut `df`'s lineage and materialize it, mode per [[DirConf]]. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(root) =>
        val sc = spark.sparkContext
        sc.setCheckpointDir(root) // Spark appends a fresh UUID subdir
        val out = df.checkpoint()
        // record the RDD's OWN checkpoint directory (".../rdd-N"), never a
        // re-read of the context-global getCheckpointDir: two concurrent
        // cuts race on that single SparkContext field, and recording the
        // other thread's UUID dir would make release()/sweep() of one
        // frame delete the other's still-live files. The rdd-scoped dir is
        // exact — deleting it can only ever touch this cut's own blocks.
        val dir = keyOf(out) match {
          case rdd: org.apache.spark.rdd.RDD[_] if rdd.getCheckpointFile.isDefined =>
            rdd.getCheckpointFile.get
          case _ => sc.getCheckpointDir.get // fallback; pre-r7 behavior
        }
        entries.put(new Entry(keyOf(out), dir, sc.hadoopConfiguration), ())
        sweep()
        out
      case None => persistModeCut(df)._1
    }
  }

  /** Free the storage behind a superseded [[cut]] frame. Reliable mode:
    * delete its checkpoint directory. Local mode: unpersist its blocks
    * NOW instead of waiting for the GC-driven context cleaner — a
    * many-round iterative loop (k-means, BPE's merge rounds, star
    * contraction) otherwise piles up hundreds of block sets and squeezes
    * live frames out of the store. Persist-based cuts keep their physical
    * lineage, so even a mistaken release is recomputable (slow, never
    * wrong); still, call it only once nothing live reads `df` —
    * iterative loops call it on round n−1 after round n is materialized;
    * one-shot operators via [[sealAndRelease]] after the result frame is
    * sealed.
    */
  def release(df: DataFrame): Unit = {
    val key = keyOf(df)
    entries.keys.find(e => e.get eq key) match {
      case Some(e) => if (entries.remove(e).isDefined) delete(e)
      case None => key match {
        // truncation-point cuts (periodic localCheckpoint, see
        // TruncateEveryConf) have NO recompute path — unpersisting one
        // while a live downstream frame could still recompute through it
        // is exactly the r11 flake. Leave them to the ContextCleaner.
        case rdd: org.apache.spark.rdd.RDD[_]
            if !truncatedCuts.containsKey(rdd) =>
          rdd.unpersist(blocking = false)
        case _ =>
      }
    }
    sweep()
  }

  /** One-shot operators' end-of-life: in reliable mode, seal `result`
    * behind its own cut (materializing it) and eagerly release the
    * `staging` cuts it was derived from — without the seal, the lazy
    * result would still read the staging files, and a long-lived service
    * accumulates one directory per operator call for its session lifetime.
    * In local (persist-cut) mode this is a NO-OP: there are no
    * directories to leak, the result deliberately stays lazy (plan-shape
    * assertions and zero extra materialization), and that laziness is
    * SAFE because staging cuts keep physical lineage — a consumer acting
    * after the context cleaner reclaimed staging blocks recomputes them
    * instead of failing (the localCheckpoint-era flake). Exception: a
    * staging cut that landed on a periodic truncation point
    * ([[TruncateEveryConf]]) has no recompute path — acceptable because
    * truncation defaults on only under a local master, where blocks
    * outlive every consumer.
    */
  def sealAndRelease(result: DataFrame, staging: DataFrame*): DataFrame =
    result.sparkSession.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(_) =>
        val out = cut(result)
        staging.foreach(release)
        out
      case None => result
    }

  /** Delete directories of cut frames no longer reachable from any live
    * plan (the weak backstop). Runs piggybacked on every [[cut]]/
    * [[release]]; public so tests and long-lived services can force it.
    */
  def sweep(): Unit = {
    var r = refQueue.poll()
    while (r != null) {
      r match {
        case e: Entry => if (entries.remove(e).isDefined) delete(e)
        case _ =>
      }
      r = refQueue.poll()
    }
  }

  private def delete(e: Entry): Unit = {
    val p = new Path(e.dir)
    val fs = p.getFileSystem(e.conf)
    fs.delete(p, true)
    // rdd-scoped dirs live inside the UUID dir Spark stamped per
    // setCheckpointDir call; try removing that parent once it is empty
    // (non-recursive delete refuses non-empty dirs, so a concurrent cut
    // still living there is safe). Fallback entries record the UUID dir
    // itself — skip, its parent is the user's configured root.
    if (p.getName.startsWith("rdd-"))
      try { fs.delete(p.getParent, false); () }
      catch { case _: java.io.IOException => }
  }
}
