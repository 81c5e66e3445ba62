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
}
