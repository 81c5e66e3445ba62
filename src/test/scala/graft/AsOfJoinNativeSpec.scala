package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoinNative

/** Native as-of join (custom LogicalPlan + Strategy + SparkPlan): semantics
  * against hand-checked cases and the composed union+window formulation,
  * plan shape, and self-join attribute hygiene.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    // (key, qt, px)
    ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 5L, 12.0), ("A", 9L, 13.0),
    ("B", 4L, 50.0)
  ).toDF("qkey", "qt", "px")

  private val trades = Seq(
    // (key, tt, qty)
    ("A", 0L, 1L), // before any quote -> null
    ("A", 5L, 2L), // tie: quote at 5 counts (<=); latest of the two (12.0)
    ("A", 7L, 3L), // between 5 and 9 -> 12.0
    ("A", 99L, 4L), // after all -> 13.0
    ("B", 3L, 5L), // before B's only quote -> null
    ("C", 1L, 6L) // key with no quotes at all -> null
  ).toDF("tkey", "tt", "qty")

  private def asof = AsOfJoinNative(
    trades, quotes, Seq("tkey"), Seq("qkey"), "tt", "qt")

  test("latest quote at-or-before each trade; unmatched rows keep nulls") {
    val got = asof
      .select($"tkey", $"tt", $"qty", $"px")
      .as[(String, Long, Long, Option[Double])].collect().toSet
    assert(got === Set(
      ("A", 0L, 1L, None),
      ("A", 5L, 2L, Some(12.0)),
      ("A", 7L, 3L, Some(12.0)),
      ("A", 99L, 4L, Some(13.0)),
      ("B", 3L, 5L, None),
      ("C", 1L, 6L, None)))
  }

  test("plans as AsOfJoinExec with one exchange per side") {
    val plan = asof.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("AsOfJoin"), s"expected native exec in:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2)
    assert(!plan.contains("NestedLoop"))
  }

  test("self-join of one source frame matches the composed formulation (q22 shape)") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = e.filter($"event_type" === "signup")
      .select($"user_id".as("s_user_id"), $"ts".as("signup_ts"))
    val native = AsOfJoinNative(purchases, signups,
      Seq("user_id"), Seq("s_user_id"), "ts", "signup_ts")
      .select($"event_id", $"user_id", $"ts", $"signup_ts".as("last_signup_ts"))

    val composed = {
      val withAsof = graft.operators.AsOfJoin.lastValueAsOf(
        e.filter($"event_type".isin("purchase", "signup")),
        isRight = $"event_type" === "signup",
        valueCol = $"ts",
        partition = Seq($"user_id"),
        ts = $"ts",
        tieBreak = $"event_id")
      withAsof.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"_graft_asof".as("last_signup_ts"))
    }
    assert(native.collect().toSet === composed.collect().toSet)
    assert(native.count() === purchases.count(), "left-outer: every left row survives")
  }

  test("pruning rule pushes projections into the scans through the custom node") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    // events carries 6 columns incl. a props json blob; the final select
    // needs 3 — without AsOfJoinPruning both scans read everything
    val left = e.filter($"event_type" === "purchase")
    val right = e.filter($"event_type" === "signup")
      .select($"user_id".as("r_user_id"), $"ts".as("r_ts"), $"props".as("r_props"),
        $"value".as("r_value"))
    val out = AsOfJoinNative(left, right, Seq("user_id"), Seq("r_user_id"), "ts", "r_ts")
      .select($"event_id", $"user_id", $"r_ts")
    val scans = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(out.queryExecution.executedPlan.toString)
      .map(_.group(1)).toList
    assert(scans.nonEmpty)
    assert(!scans.exists(_.contains("props")),
      s"props must be pruned from every scan, got: $scans")
    assert(out.count() > 0)
  }

  test("matches a driver-side reference on random inputs (property)") {
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { round =>
      // right rows unique per (key, time): the operator's tie order among
      // equal (key, rightTime) rows is unspecified by design
      val rights = rng.shuffle(
        (for (k <- 0L to 3L; t <- 0L to 20L) yield (k, t))
          .filter(_ => rng.nextBoolean()).toVector)
        .map { case (k, t) => (k, t, k * 1000 + t) }
      val lefts = (1 to 40).map(i =>
        (rng.nextInt(5).toLong, rng.nextInt(22).toLong, i.toLong))
      val expected = lefts.map { case (k, t, id) =>
        val m = rights.filter(r => r._1 == k && r._2 <= t)
        (id, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toSet
      val got = AsOfJoinNative(
        lefts.toDF("lk", "lt", "lid"), rights.toDF("rk", "rt", "rv"),
        Seq("lk"), Seq("rk"), "lt", "rt")
        .select($"lid", $"rv").as[(Long, Option[Long])].collect().toSet
      assert(got === expected, s"round $round: rights=$rights lefts=$lefts")
    }
  }
}
