package graft

/** Accuracy contracts for the two sketch queries the driver can only
  * rows-check (no cross-engine oracle exists for engine-specific sketch
  * internals): HLL++ approximate distinct and the approx-percentile
  * sketch, each asserted within ±5% of the exact value computed in the
  * same row.
  */
class SketchToleranceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q24: HLL++ approx distinct within 5% of exact per group") {
    val rows = SparkEntry.queries("q24_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_parts")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_parts")).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"group ${r.get(0)}: approx $approx vs exact $exact " +
          "(rsd 0.02 should keep HLL++ well inside 5%)")
    }
  }

  test("q116: HLL sketch rollup — union-of-sketches ≡ sketch-of-union, within 2% of exact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q116_hll_rollup")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getLong(r.fieldIndex("est_customers")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_customers")).toDouble
      assert(math.abs(est - exact) / exact <= 0.02,
        s"region ${r.get(0)}: union estimate $est vs exact $exact")
    }
    // the identity the pre-aggregated-sketch pattern rests on: merging
    // the stored nation sketches gives the SAME estimate as sketching
    // the region's customers directly (HLL registers are max-based —
    // order-independent, merge-associative)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val direct = cust
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("c_custkey"), lit(12)))
        .as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val unioned = cust
      .groupBy("c_nationkey")
      .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(unioned === direct,
      "union-of-sketches must equal sketch-of-union exactly")
  }

  test("q71: approx percentile within 5% of exact per group") {
    val rows = SparkEntry.queries("q71_approx_percentile")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getDouble(r.fieldIndex("p50_approx"))
      val exact = r.getDouble(r.fieldIndex("p50_exact"))
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"group ${r.get(0)}: approx p50 $approx vs exact $exact")
    }
  }
}
