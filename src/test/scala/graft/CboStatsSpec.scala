package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer statistics: ANALYZE TABLE wiring over catalog
  * tables. At 100 TB the optimizer's join order / broadcast decisions are
  * only as good as its cardinality estimates — this pins that collected
  * stats (row counts, column NDVs) actually reach the logical plan, and
  * that CBO + join reordering accept them.
  */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE TABLE feeds row counts and column NDVs into plan stats") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity")
    // a stale managed-table location survives a crashed run; clear both
    // the catalog entry and the directory before recreating
    spark.sql("DROP TABLE IF EXISTS cbo_li")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "cbo_li")
    if (loc.isDirectory) {
      loc.listFiles().foreach(_.delete()); loc.delete()
    }
    li.write.mode("overwrite").saveAsTable("cbo_li")
    val n = li.count()

    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      // rowCount reaches the plan only under CBO (size-only estimation
      // otherwise), and only once ANALYZE has run
      spark.sql("ANALYZE TABLE cbo_li COMPUTE STATISTICS")
      val stats = spark.table("cbo_li").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong === n),
        s"rowCount must equal the actual $n after ANALYZE: ${stats.rowCount}")

      spark.sql("ANALYZE TABLE cbo_li COMPUTE STATISTICS FOR COLUMNS l_orderkey")
      val colStats = spark.table("cbo_li").queryExecution.optimizedPlan
        .stats.attributeStats
      val ndv = colStats.collectFirst {
        case (attr, s) if attr.name == "l_orderkey" => s.distinctCount
      }.flatten
      val exact = spark.table("cbo_li").select(countDistinct(col("l_orderkey")))
        .head.getLong(0)
      assert(ndv.isDefined, "column stats must surface in the plan under CBO")
      // NDV is HLL-estimated; generous bound still catches absent/garbage stats
      assert(math.abs(ndv.get.toLong - exact) <= exact / 5,
        s"NDV ${ndv.get} far from exact $exact")
      // and a multi-join over analyzed tables still plans fine with
      // reordering on (smoke: CBO stats don't break planning)
      spark.table("cbo_li").as("a")
        .join(spark.table("cbo_li").as("b"), "l_orderkey")
        .groupBy().count().collect()
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }
}
