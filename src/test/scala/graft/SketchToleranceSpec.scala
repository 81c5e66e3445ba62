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
