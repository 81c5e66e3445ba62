package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Observability

/** In-flight quality counters: metrics ride the write action itself —
  * exact counts, no second scan of the data.
  */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("a"), 10L), (2L, None, -5L), (3L, Some("c"), 3L),
    (4L, None, 0L), (5L, Some("e"), 120L)
  ).map { case (id, t, v) => (id, t.orNull, v) }.toDF("id", "text", "v")

  test("counters ride a parquet write: rows, nulls, violations exact") {
    val (out, fetch) = Observability.withQualityCounters(rows,
      nullCols = Seq("text"),
      violations = Map(
        "negative_v" -> (col("v") < 0),
        "v_over_100" -> (col("v") > 100)))
    val dir = Files.createTempDirectory("graft_obs").toString + "/t"
    out.write.parquet(dir) // the ONLY action — metrics must come from it
    val m = fetch()
    assert(m === Map("rows" -> 5L, "null_text" -> 2L,
      "violation_negative_v" -> 1L, "violation_v_over_100" -> 1L))
    // and the instrumented frame wrote its rows untouched
    assert(spark.read.parquet(dir).count() === 5)
  }

  test("observe is a pass-through: plan rows and values unchanged") {
    val (out, _) = Observability.withQualityCounters(rows, Seq("text"))
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === (1L to 5L))
  }

  test("empty frame: counters are zero, not absent") {
    val (out, fetch) = Observability.withQualityCounters(rows.limit(0),
      nullCols = Seq("text"), violations = Map("neg" -> (col("v") < 0)))
    assert(out.count() === 0)
    val m = fetch()
    assert(m("rows") === 0L && m("null_text") === 0L &&
      m("violation_neg") === 0L)
  }
}
