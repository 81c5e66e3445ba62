package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: both sides pre-bucketed on the join key make
  * the join exchange-free — the 100 TB answer for a fact-fact join that
  * repeats every run (bucket once at ingest, never shuffle again). The
  * reference re-upserts the same keyed tables daily
  * (`dags/jira/db_ops.py:29-43`), exactly the access pattern bucketing
  * amortizes.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize so AQE finalizes the plan
    // unwrap AdaptiveSparkPlanExec: its TreeNode children list is empty
    // (the live plan hangs off executedPlan), so a collect() on the outer
    // plan silently sees nothing; shuffle stages then wrap their exchange
    // the same way, so count via the rendered final plan instead
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    "Exchange (hash|range)partitioning".r.findAllIn(plan).size
  }

  test("join of two tables bucketed on the key runs with zero exchanges") {
    // disable BOTH broadcast thresholds: AQE re-plans small shuffle joins
    // to broadcast at runtime through its own adaptive threshold
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1L to 1000L).map(k => (k % 50, k, k * 2.0))
        .toDF("key", "seq", "amount")
      val dims = (0L until 50L).map(k => (k, s"dim_$k")).toDF("key", "name")
      facts.write.mode("overwrite").bucketBy(8, "key").sortBy("key")
        .saveAsTable("b_facts")
      dims.write.mode("overwrite").bucketBy(8, "key").sortBy("key")
        .saveAsTable("b_dims")

      val joined = spark.table("b_facts").join(spark.table("b_dims"), "key")
      assert(shuffles(joined) === 0,
        s"bucketed join must not exchange:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() === 1000)

      // control: the same tables saved UNbucketed shuffle both sides
      // (parquet-backed — Seq.toDF local relations would constant-fold)
      facts.write.mode("overwrite").saveAsTable("p_facts")
      dims.write.mode("overwrite").saveAsTable("p_dims")
      val plain = spark.table("p_facts").join(spark.table("p_dims"), "key")
      assert(shuffles(plain) === 2, "control: unbucketed join shuffles both sides")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      Seq("b_facts", "b_dims", "p_facts", "p_dims")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("bucketed groupBy on the bucket key aggregates without an exchange") {
    try {
      (1L to 1000L).map(k => (k % 50, k * 1.5)).toDF("key", "v")
        .write.mode("overwrite").bucketBy(8, "key").saveAsTable("b_agg")
      val agg = spark.table("b_agg").groupBy("key").agg(sum("v"))
      assert(shuffles(agg) === 0,
        s"bucketed agg must not exchange:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() === 50)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_agg")
    }
  }
}
