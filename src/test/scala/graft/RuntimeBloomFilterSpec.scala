package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (semi-join reduction): a selective
  * filter on one shuffle-join side injects a bloom filter that prunes the
  * OTHER side's rows before the exchange — at 100 TB this is the lever
  * that keeps a fact-fact join from shuffling the unfiltered side's
  * terabytes when the filtered side only matches a sliver. The optimizer
  * gates on estimated scan bytes (10 GB application-side by default), so
  * the spec pins the thresholds to test-data scale and asserts the
  * `bloom_filter_might_contain` predicate lands in the optimized plan.
  */
class RuntimeBloomFilterSpec extends SparkSpec {

  test("selective join side injects a bloom filter into the big side's scan stage") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test tables are KB-sized: the 10 GB application-side gate and the
      // creation-side row estimate never fire at this scale — pin them
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: bloom reduction targets shuffle exchanges,
      // and a broadcast of the small side would bypass the mechanism
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sf = "/root/testdata/sf0.001"
      val lineitem = Tables.lineitem(spark, sf)
      val orders = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val q = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
          optimized.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the lineitem side, plan was:\n$optimized")
      // and it must not change the answer
      val withBloom = q.collect().toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
        .collect().toSeq
      assert(withBloom === without, "bloom pruning must be result-invariant")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
