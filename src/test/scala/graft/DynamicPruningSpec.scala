package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dynamic partition pruning: a selective dim-side filter prunes fact
  * partitions at RUNTIME through the join — the mechanism that turns
  * "scan 100 TB of dates" into "scan the three dates the dim selected"
  * without any static predicate on the fact table.
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("dim filter reaches the fact scan as a dynamic pruning filter") {
    // the benefit estimator compares estimated pruned bytes against the
    // subquery cost — meaningless on a KB-sized test table, so pin the
    // fallback ratio high enough that the planner behaves as it would at
    // warehouse scale
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000")
    val dir = Files.createTempDirectory("graft_dpp").toString + "/orders"
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.partitionBy("o_orderstatus").parquet(dir)
    val facts = spark.read.parquet(dir)
    // dim must be parquet-backed: a Seq.toDF LocalRelation constant-folds
    // its filter away before the PartitionPruning rule looks for a
    // selective predicate on the build side
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString + "/dim"
    // the filter must be one of DPP's likely-selective shapes: a bare
    // boolean attribute is not; EqualTo(attr, literal) on an int is
    Seq(("F", 1), ("O", 0), ("P", 0))
      .toDF("status", "flag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val q = facts.join(dim, facts("o_orderstatus") === dim("status"))
      .filter($"flag" === 1)
      .agg(count(lit(1)).as("n"))
    val n = q.as[Long].head()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery in the fact scan:\n$plan")
    assert(n === Tables.orders(spark, "/root/testdata/sf0.001")
      .filter($"o_orderstatus" === "F").count())
    spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
  }
}
