package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet+JSON: ORC (columnar-
  * alternative, built-in) and CSV (schema'd, header) round-trip
  * the same relational data — the format layer is orthogonal to the engine.
  */
class FormatsSpec extends SparkSpec {

  test("orc round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/nation"
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    nation.write.format("orc").save(dir)
    val back = spark.read.format("orc").load(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("csv round-trip with explicit schema and header") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/region"
    val region = Tables.region(spark, "/root/testdata/sf0.001")
    region.write.option("header", "true").csv(dir)
    val back = spark.read
      .schema(region.schema)
      .option("header", "true")
      .csv(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ===
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("partitioned orc supports partition pruning like parquet") {
    val dir = Files.createTempDirectory("graft_orc2").toString + "/orders"
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    orders.write.format("orc").partitionBy("o_orderstatus").save(dir)
    val q = spark.read.format("orc").load(dir)
      .filter(col("o_orderstatus") === "F")
    assert(q.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(q.count() === orders.filter(col("o_orderstatus") === "F").count())
  }

  test("schema evolution: mergeSchema unifies old and new parquet batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    // day 1: v1 schema; day 2 adds a column (the reference's MAPPING gains
    // a field — old pages keep working)
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "name", "score", "batch"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows === Map(1L -> None, 2L -> Some(9.5)),
      "old rows surface the new column as null")
  }
}
