package graft

import org.apache.spark.sql.functions._

import graft.plans.DotProductRewrite

/** Extension surface: the auto-vectorization optimizer rule rewrites the
  * declarative HOF dot-product into the codegen'd FloatDotProduct with
  * identical results, and a plain scala `udf()` (the remaining §2b UDF
  * surface) agrees with the native path.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  // parquet-backed frame: a LocalRelation would be constant-folded by
  // ConvertToLocalRelation before extraOptimizations run
  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .limit(5)
    .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))

  test("DotProductRewrite turns the HOF pattern into FloatDotProduct, same result") {
    val expected = emb.select(hofDot.as("d")).as[Double].collect().toSeq

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val after = emb.select(hofDot.as("d"))
      val optimized = after.queryExecution.optimizedPlan.toString.toLowerCase
      assert(optimized.contains("floatdotproduct"),
        s"rule did not fire; optimized plan:\n$optimized")
      assert(after.as[Double].collect().toSeq === expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("rule leaves non-matching aggregates alone (non-float arrays)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val ints = Tables.lineitem(spark, "/root/testdata/sf0.001").limit(3)
        .select(array(col("l_orderkey"), col("l_partkey")).as("a"),
          array(col("l_partkey"), col("l_orderkey")).as("b"))
        .select(aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!ints.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("floatdotproduct"))
      assert(ints.count() === 3)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("GraftExtensions installer registers rules, strategy, and functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val rules = GraftSqlShim.installedRules(ext, spark)
    assert(rules.contains(graft.plans.DotProductRewrite))
    assert(rules.contains(graft.plans.AsOfJoinPruning))
    assert(GraftSqlShim.installedStrategies(ext, spark)
      .contains(graft.plans.AsOfJoinStrategy))
  }

  test("scala udf() registration path agrees with the native expression") {
    val cosUdf = udf((a: Seq[Float], b: Seq[Float]) => {
      var acc = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    })
    val df = Seq((Array(0.5f, -1f), Array(2f, 3f))).toDF("a", "b")
    val viaUdf = df.select(cosUdf(col("a"), col("b"))).as[Double].head()
    val viaNative = df.select(
      graft.functions.VectorExpressions.dot(spark, col("a"), col("b"))).as[Double].head()
    assert(viaUdf === viaNative)
  }
}
