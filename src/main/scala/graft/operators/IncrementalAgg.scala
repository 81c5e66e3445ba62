package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern for
  * decomposable aggregates: keep a keyed state table of partials
  * (count, sum), fold each new batch in WITHOUT re-scanning history.
  * The reference re-reads and re-upserts whole entities daily
  * (`dags/jira/db_ops.py:29-43`); at 100 TB the history scan is the cost
  * that matters, and count/sum/min/max (avg = sum/count downstream)
  * merge associatively so each refresh touches only the new batch plus
  * the |keys|-sized state.
  *
  * Scale shape: partial-aggregate the batch (map-side combine), then one
  * (|keys| + |batch keys|)-row shuffle to merge with state. State stays
  * one row per key — re-partition or bucket it on the key so the merge
  * co-locates.
  */
object IncrementalAgg {

  /** Partial state of `valueCol` grouped by `keys`: (keys..., n, s). */
  def partial(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))

  /** Merge an existing state with a new batch's partials. Associative and
    * commutative: merge(merge(a,b),c) == merge(a, merge(b,c)).
    */
  def merge(state: DataFrame, batchPartial: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(batchPartial)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
}
