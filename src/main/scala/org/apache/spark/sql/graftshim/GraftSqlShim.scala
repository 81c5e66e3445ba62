package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the engine needs: turning a hand-built
  * [[LogicalPlan]] into a DataFrame. `Dataset.ofRows` is package-private to
  * `org.apache.spark.sql`, so this object lives in a subpackage of it — the
  * standard pattern for third-party Catalyst extensions that contribute
  * whole logical operators (custom plan + strategy) rather than just
  * expressions. Nothing else from the internal API is re-exported.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Test-only: what an extensions installer registered (the build* fields
    * of SparkSessionExtensions are private[sql]).
    */
  def installedRules(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[Any] =
    ext.buildOptimizerRules(spark)
  def installedStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[Any] =
    ext.buildPlannerStrategies(spark)

  /** Test-only: whether the session's cache manager holds any entries —
    * the cache-hygiene probe (CacheManager is private[sql]).
    */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Local-mode lineage cut: materialize `df` into a persisted
    * InternalRow RDD and wrap it in a fresh [[LogicalRDD]]. The LOGICAL
    * plan is truncated — iterative plan growth stops, exactly as with
    * `localCheckpoint` — but the PHYSICAL RDD keeps its full lineage, so
    * a block that is evicted under memory pressure or unpersisted by a
    * release is RECOMPUTED from the original plan instead of being
    * unrecoverable. (`Dataset.localCheckpoint`, the pre-r12 local cut,
    * truncates both: its blocks die with eviction/unpersist — Spark flags
    * every such unpersist with the truncated-lineage WARN, and a lazy
    * consumer that outlives the blocks fails or flakes. The q157 lesson.)
    * Same materialization work as an eager localCheckpoint: one
    * execution, row-copied, persisted at `level`.
    *
    * `truncate = true` additionally severs the PHYSICAL lineage
    * (`localCheckpoint`, disk-included storage level): kept-forever
    * physical chains are their own unbounded resource — each round's
    * persisted RDD strongly references every prior round's RDD objects,
    * so driver memory and per-job DAG traversal grow O(rounds) and very
    * deep chains (hundreds of BPE merges, long k-means runs) risk
    * StackOverflowError during stage construction. A truncated cut's
    * blocks are NOT recomputable, so callers must never unpersist one
    * that a live downstream frame might recompute through —
    * [[graft.operators.Checkpoints.release]] skips them and leaves
    * reclamation to the ContextCleaner (which only fires once no plan
    * can reference the RDD anyway). [[graft.operators.Checkpoints.cut]]
    * interleaves truncating cuts every N persist cuts, bounding lineage
    * depth at N rounds while keeping recomputability between truncation
    * points.
    */
  def persistCut(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel,
      truncate: Boolean = false): DataFrame =
    persistCutCounted(df, level, truncate)._1

  /** [[persistCut]] plus the materialized row count — the eager
    * materialization counts anyway, so size-dispatching callers
    * ([[graft.operators.Checkpoints.cutWithCount]]) get the cardinality
    * without a second job.
    */
  def persistCutCounted(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel,
      truncate: Boolean = false): (DataFrame, Long) = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    if (truncate) rdd.localCheckpoint()
    val n = rdd.count()
    (classic.Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD
        .fromDataset(rdd, ds, isStreaming = false)), n)
  }
}
