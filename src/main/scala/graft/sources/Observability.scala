package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality counters — `Dataset.observe` (CollectMetrics)
  * riding the INGEST action itself: row counts, per-column null counts and
  * named rule violations are aggregated inside the same physical plan that
  * writes the data, so quality accounting costs ZERO extra passes. At
  * 100 TB the alternative — `df.count()` + a few `filter(...).count()`
  * probes after the write — re-reads the table once per metric; this reads
  * it never. The reference logs per-batch record counts from its fetch
  * loop (`dags/jira/issues/issue_processor.py:144-167`); this is that
  * observability surface rebuilt as plan-level metrics.
  *
  * Usage: `val (out, fetch) = Observability.withQualityCounters(df, ...)`;
  * run any ONE action on `out` (a parquet write, a count), then `fetch()`
  * returns the metric map. Fetch before an action, or a second fetch for a
  * second action, is a caller error surfaced by the underlying Observation
  * contract (one observation per action).
  */
object Observability {

  /** Attach counters: total rows, `null_<col>` per watched column, and one
    * counter per named violation predicate (rows where the predicate is
    * TRUE). Returns the instrumented frame (same rows — observe is a
    * pass-through node) and a fetch closure yielding the counts after an
    * action has run.
    */
  def withQualityCounters(df: DataFrame, nullCols: Seq[String],
      violations: Map[String, Column] = Map.empty)
      : (DataFrame, () => Map[String, Long]) = {
    val obs = Observation()
    val metrics =
      count(lit(1)).as("rows") +:
        (nullCols.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")) ++
          violations.toSeq.sortBy(_._1).map { case (name, pred) =>
            sum(when(pred, 1L).otherwise(0L)).as(s"violation_$name") })
    val out = df.observe(obs, metrics.head, metrics.tail: _*)
    (out, () => obs.getAsJava.asScala.toMap.map {
      case (k, v) => k -> (if (v == null) 0L else v.asInstanceOf[Number].longValue)
    })
  }
}
