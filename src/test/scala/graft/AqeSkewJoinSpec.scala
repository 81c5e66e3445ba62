package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join split: the runtime half of the engine's skew story
  * (operators.Skew salts when EVERY key is hot; AQE splits when a FEW
  * are). Thresholds are scaled down so the mechanism fires on test-sized
  * data exactly as it would on a 256MB-partition warehouse skew.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("skewed shuffle join partitions are split at runtime (skew=true)") {
    val dir = Files.createTempDirectory("graft_skew").toString
    // 100k rows, 95% on one key -> one reducer partition dwarfs the rest
    (1 to 100000).map { i =>
      val k = if (i % 20 != 0) 0L else (i % 50).toLong
      (k, s"payload_$i" * 4)
    }.toDF("k", "payload").write.parquet(s"$dir/big")
    (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
      .write.parquet(s"$dir/dim")

    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.shuffle.partitions" -> "8")
    confs.keys.foreach(k => spark.conf.set(k, confs(k)))
    try {
      val q = spark.read.parquet(s"$dir/big")
        .join(spark.read.parquet(s"$dir/dim"), "k")
      // collect() drives q.queryExecution ITSELF to completion — foreach
      // and count() execute separate QueryExecutions (rddQueryExecution /
      // a new agg Dataset) and would leave this plan un-finalized. A
      // global agg above the join would also make AQE decline the split
      // (extra shuffle, not forced by default).
      val n = q.collect().length
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$plan")
      assert(n === 100000)
    } finally confs.keys.foreach(spark.conf.unset)
  }
}
