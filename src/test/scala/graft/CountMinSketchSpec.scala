package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch as the mergeable point-frequency summary (Cormode &
  * Muthukrishnan 2005), via Spark's codegen'd `count_min_sketch` aggregate:
  * the complement to the Misra–Gries top-k sketch (q102) — MG answers "who
  * is heavy", CMS answers "how often is X" for ANY x with ε·N additive
  * error. Everything here is deterministic: fixed seed, fixed corpus.
  */
class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish corpus: tok_k appears ⌈2000/k⌉ times, 200 distinct keys
  private lazy val corpus = (1 to 200).flatMap { k =>
    Seq.fill(2000 / k)(s"tok$k")
  }
  private lazy val df = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "tok")
    .repartition(8)

  private def sketchOf(d: org.apache.spark.sql.DataFrame): CountMinSketch = {
    val bytes = d.agg(
      count_min_sketch(col("tok"), lit(0.005d), lit(0.9999d), lit(42)).as("s"))
      .head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  test("point estimates are never under and within eps*N over") {
    val cms = sketchOf(df)
    val exact = df.groupBy("tok").count().as[(String, Long)].collect().toMap
    val n = corpus.size
    val bound = math.ceil(0.005 * n).toLong
    exact.foreach { case (tok, c) =>
      val est = cms.estimateCount(tok)
      assert(est >= c, s"CMS must never undercount ($tok: $est < $c)")
      assert(est <= c + bound,
        s"estimate for $tok exceeds the eps*N overcount bound: $est > $c + $bound")
    }
    // a never-inserted key estimates within the same additive bound of zero
    assert(cms.estimateCount("never-seen") <= bound)
  }

  test("sketches merge losslessly: split-and-merge equals one-shot") {
    val whole = sketchOf(df)
    val left = sketchOf(df.filter(col("id") % 2 === 0))
    val right = sketchOf(df.filter(col("id") % 2 === 1))
    left.mergeInPlace(right)
    // CMS merge is cell-wise addition — estimates must agree EXACTLY with
    // the single-pass sketch (this is what makes the map-side partials of
    // the distributed aggregate semantically free)
    (1 to 200).foreach { k =>
      assert(left.estimateCount(s"tok$k") === whole.estimateCount(s"tok$k"))
    }
  }

  test("per-group sketches via groupBy carry independent error budgets") {
    val grouped = df.withColumn("grp", col("id") % 4)
      .groupBy("grp")
      .agg(count_min_sketch(col("tok"), lit(0.005d), lit(0.9999d), lit(42)).as("s"))
      .collect()
      .map(r => r.getLong(0) -> CountMinSketch.readFrom(
        new ByteArrayInputStream(r.getAs[Array[Byte]](1)))).toMap
    assert(grouped.size === 4)
    val exactByGrp = df.withColumn("grp", col("id") % 4)
      .groupBy("grp", "tok").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    exactByGrp.foreach { case ((g, tok), c) =>
      val est = grouped(g).estimateCount(tok)
      assert(est >= c && est <= c + math.ceil(0.005 * corpus.size).toLong)
    }
  }

  test("CmsEstimate probes the sketch plan-side, matching driver-side estimates") {
    import spark.implicits._
    val sk = df.agg(
      count_min_sketch(col("tok"), lit(0.005d), lit(0.9999d), lit(42)).as("s"))
    val probes = (1 to 50).map(k => s"tok$k") :+ "never-seen"
    val est = probes.toDF("token")
      .crossJoin(broadcast(sk))
      .select(col("token"),
        graft.functions.SketchExpressions.cmsEstimate(
          spark, col("s"), col("token")).as("est"))
      .as[(String, Long)].collect().toMap
    val driverSide = sketchOf(df)
    probes.foreach { p =>
      assert(est(p) === driverSide.estimateCount(p),
        s"plan-side estimate for $p diverges from CountMinSketch.estimateCount")
    }
    // and no collect hides in the plan: the probe is a broadcast join over
    // the one-row aggregate
    val plan = probes.toDF("token").crossJoin(broadcast(sk))
      .select(graft.functions.SketchExpressions.cmsEstimate(
        spark, col("s"), col("token"))).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      s"expected broadcast probe plan:\n$plan")
  }
}
