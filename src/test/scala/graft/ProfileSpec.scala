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
}
