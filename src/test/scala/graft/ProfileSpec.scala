package graft

import graft.operators.Profile

/** Profile-card invariants: exact values incl. null accounting on a
  * constructed frame, the fixed card shape on empty input (counts 0,
  * extrema NULL — the card never loses rows), and the single-scan plan.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, Option("en"), Option(10L)),
    (2L, Option.empty[String], Option(20L)),
    (3L, Option("fr"), Option.empty[Long]),
    (4L, Option("en"), Option(5L))
  ).toDF("id", "lang", "n")

  test("card values are exact, including null accounting") {
    val card = Profile.card(frame, dims = Seq("lang"), measures = Seq("n"))
      .as[(String, Option[Double])].collect().toMap
    assert(card === Map(
      "n_rows" -> Some(4.0),
      "lang_distinct" -> Some(2.0), "lang_nulls" -> Some(1.0),
      "n_min" -> Some(5.0), "n_max" -> Some(20.0), "n_sum" -> Some(35.0),
      "n_nulls" -> Some(1.0)))
  }

  test("empty input keeps the full card: zero counts, NULL extrema") {
    val empty = Seq.empty[(Long, Option[String], Option[Long])]
      .toDF("id", "lang", "n")
    val card = Profile.card(empty, Seq("lang"), Seq("n"))
      .as[(String, Option[Double])].collect().toMap
    assert(card.keySet === Set("n_rows", "lang_distinct", "lang_nulls",
      "n_min", "n_max", "n_sum", "n_nulls"))
    assert(card("n_rows") === Some(0.0))
    assert(card("lang_distinct") === Some(0.0))
    assert(card("n_min") === None && card("n_max") === None
      && card("n_sum") === None)
  }

  test("the whole card is one aggregation over one scan") {
    val plan = Profile.card(frame, Seq("lang"), Seq("n"))
      .queryExecution.executedPlan.toString
    // one scan feeds everything: no join, no union of per-metric scans
    assert(!plan.contains("Join") && !plan.contains("Union"),
      s"card must not multiply scans:\n$plan")
  }

  test("latenessBands: hand-computed lateness; bucket count cannot change the answer") {
    import spark.implicits._
    // arrival order (arr): e1(us=100), e3(us=300), e2(us=250 → late by
    // 50), e4(us=360), e5(us=200 → late by 160)
    val rows = Seq(
      (1L, 100L, 1000L), (3L, 300L, 2000L), (2L, 250L, 3000L),
      (4L, 360L, 4000L), (5L, 200L, 5000L)
    ).toDF("event_id", "us", "arr")
    def run(buckets: Int) = Profile.latenessBands(
        rows.repartition(3), "arr", "us", "event_id", buckets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run(4)
    // 3 in-order (e1, e3, e4), 2 late (50 µs and 160 µs — both ≤ 10 s)
    assert(got === Seq(("0_in_order", 3L, 0L), ("1_le_10s", 2L, 160L)))
    assert(run(1) === got && run(8) === got,
      "the two-phase decomposition is bucket-count invariant")
  }
}
