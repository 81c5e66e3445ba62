package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation — explicit salting, for when a handful of hot keys
  * overwhelm single reducers and AQE's skew-join split doesn't apply (e.g.
  * low-cardinality aggregations where ALL keys are hot).
  *
  * Two-phase decomposed aggregation: phase 1 groups by (keys, salt) so each
  * hot key fans out over `buckets` reducers; phase 2 merges the partials.
  * Identical result to the direct aggregation for any decomposable
  * aggregate (count/sum/min/max — avg as sum/count downstream); the cost is
  * one extra (tiny: |keys|·buckets rows) shuffle.
  *
  * The salt is `pmod(crc32(monotonically_increasing_id()), buckets)` —
  * deterministic *per run* is not required since the salt never reaches the
  * result; only partial-sum grouping changes.
  */
object Skew {

  /** Salted count+sum per key group. Output: keys, n, sum_<valueCol>. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_graft_salt",
      pmod(crc32(monotonically_increasing_id().cast("string")), lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "_graft_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as(s"sum_$valueCol"))
  }
}
