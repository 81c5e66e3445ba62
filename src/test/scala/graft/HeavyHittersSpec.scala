package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, MGSummary, TextFns}

/** Misra–Gries sketch: exactness below the counter budget (any
  * partitioning), the n/(k+1) undercount guarantee in the eviction
  * regime, merge validity, and serialization round-trip (the
  * TypedImperativeAggregate shuffle path).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact below the counter budget, independent of partitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select(explode(TextFns.tokens(col("text"))).as("tok"))
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size <= 64, "corpus must sit below the counter budget for this test")
    for (parts <- Seq(1, 7, 32)) {
      val sketch = toks.repartition(parts)
        .agg(HeavyHitters.sketch(spark, col("tok"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e._1"), col("e._2"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sketch === exact, s"no-eviction sketch must be exact at $parts partitions")
    }
  }

  test("eviction regime: every item with freq > n/(k+1) surfaces, estimates undercount <= n/(k+1)") {
    // 3 hot items (300 each) in a sea of 600 distinct singletons; k = 8
    // n = 1500, n/(k+1) ≈ 166 < 300 → all hot items MUST survive
    val items = (1 to 3).flatMap(h => Seq.fill(300)(s"hot$h")) ++
      (1 to 600).map(i => s"cold$i")
    val k = 8
    for (parts <- Seq(1, 13)) {
      val out = items.toDF("tok").repartition(parts)
        .agg(HeavyHitters.sketch(spark, col("tok"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e._1"), col("e._2"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size <= k)
      for (h <- 1 to 3) {
        val est = out.getOrElse(s"hot$h", 0L)
        assert(est > 0, s"hot$h must survive at $parts partitions")
        assert(est <= 300 && 300 - est <= items.size / (k + 1),
          s"hot$h estimate $est outside the MG undercount bound")
      }
    }
  }

  test("grouped usage: per-language sketches match per-language exact counts") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select(col("lang"),
      explode(TextFns.tokens(col("text"))).as("tok"))
    val exact = toks.groupBy("lang", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val grouped = toks.groupBy("lang")
      .agg(HeavyHitters.sketch(spark, col("tok"), 64).as("hh"))
      .select(col("lang"), explode(col("hh")).as("e"))
      .select(col("lang"), col("e._1"), col("e._2"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(grouped === exact, "below the budget each group's sketch is exact")
  }

  test("merge keeps at most k counters and the total-count invariant") {
    val a = new MGSummary(4)
    ('a' to 'j').foreach(c => a.update(c.toString))
    val b = new MGSummary(4)
    Seq("x", "x", "x", "y", "z", "w", "v").foreach(b.update)
    a.mergeIn(b)
    assert(a.sorted.size <= 4)
    assert(a.total === 17L)
    assert(a.sorted.forall(_._2 > 0))
  }

  test("serialization round-trips the summary exactly (the shuffle path)") {
    val s = new MGSummary(6)
    Seq("p", "p", "p", "q", "q", "r", "s", "t", "u", "v", "w").foreach(s.update)
    val back = MGSummary.deserialize(s.serialized)
    assert(back.k === s.k)
    assert(back.total === s.total)
    assert(back.sorted === s.sorted)
  }
}
