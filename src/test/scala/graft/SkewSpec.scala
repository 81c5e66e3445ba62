package graft

import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, Skew}

/** Skew mitigation and incremental-aggregation operators: both must be
  * RESULT-IDENTICAL to their direct formulations for any salt/batch split —
  * asserted here on randomized data beyond the oracle-gated queries.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  // heavily skewed: 80% of rows share one key
  private val rows = (1 to 2000).map { i =>
    val k = if (rng.nextInt(10) < 8) "hot" else s"k${rng.nextInt(5)}"
    (k, rng.nextInt(100).toDouble)
  }
  private lazy val df = rows.toDF("k", "v")

  test("saltedCountSum equals the direct aggregation for any bucket count") {
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .as[(String, Long, Double)].collect().toSet
    Seq(1, 4, 33).foreach { buckets =>
      val salted = Skew.saltedCountSum(df, Seq("k"), "v", buckets)
        .as[(String, Long, Double)].collect().toSet
      assert(salted === direct, s"buckets=$buckets")
    }
  }

  test("saltedJoin equals the plain join, including hot-key row multiplicity") {
    val dim = Seq(("hot", 100L), ("k0", 0L), ("k1", 1L), ("k9", 9L))
      .toDF("k", "dim_v")
    val plain = df.join(dim, Seq("k"))
      .select("k", "v", "dim_v").as[(String, Double, Long)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(df, dim, "k", 8)
      .select("k", "v", "dim_v").as[(String, Double, Long)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(salted === plain, "multiset equality: no dropped or duplicated rows")
  }

  test("IncrementalAgg merge is associative and equals the full recompute") {
    val Seq(b1, b2, b3) = Seq(0, 1, 2).map(i =>
      rows.zipWithIndex.filter(_._2 % 3 == i).map(_._1).toDF("k", "v"))
    val p = (b: org.apache.spark.sql.DataFrame) =>
      IncrementalAgg.partial(b, Seq("k"), "v")
    val leftFold = IncrementalAgg.merge(
      IncrementalAgg.merge(p(b1), p(b2), Seq("k")), p(b3), Seq("k"))
    val rightFold = IncrementalAgg.merge(
      p(b1), IncrementalAgg.merge(p(b2), p(b3), Seq("k")), Seq("k"))
    val full = p(df)
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("n"), round(col("s"), 6).as("s"))
        .as[(String, Long, Double)].collect().toSet
    assert(norm(leftFold) === norm(full))
    assert(norm(rightFold) === norm(full))
  }
}
