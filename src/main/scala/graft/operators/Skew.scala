package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation — explicit salting. The reference's data is naturally
  * skewed this way: issue/worklog volume concentrates on a few active
  * projects and accounts (`dags/fetch_jira_tempo_worklogs.py:82-91` keys
  * worklogs by issue_id/author_id). Explicit salting is for when hot keys
  * overwhelm single reducers and AQE's skew-join split doesn't apply
  * (e.g. low-cardinality aggregations where ALL keys are hot — the
  * few-hot-keys runtime path is AQE's, see AqeSkewJoinSpec).
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

  /** Salted equi-join for a skewed big side against a small-but-not-
    * broadcastable build side: each big-side row gets a salt in
    * [0, buckets), the small side is replicated once per salt value, and
    * the join key becomes (key, salt) — a hot key's rows now spread over
    * `buckets` reducers instead of one. Result-identical to
    * `big.join(small, key)` for any salt assignment, so the salt uses a
    * row-unique hash (spreads evenly even when ALL rows share one key).
    * Cost: small side shuffles buckets× — pick buckets ≈ the skew factor,
    * not the cluster width. When the small side fits in memory prefer
    * `broadcast()`; when only a few keys are hot prefer AQE's skew split
    * (this helper is for the ALL-keys-hot / giant-build-side corner).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_graft_salt",
      pmod(crc32(monotonically_increasing_id().cast("string")), lit(buckets)))
    val replicated = small.withColumn("_graft_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(replicated, Seq(key, "_graft_salt")).drop("_graft_salt")
  }
}
