package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Features

/** Point-in-time feature aggregation: leakage safety (future events never
  * visible), exact window boundaries, cross-bucket matches, absent-event
  * labels, and equivalence with the naive inequality join.
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("window is (label-w, label]: boundaries exact, future events excluded") {
    // label at t=7200; lookback 3600 ⇒ window (3600, 7200]
    val labels = Seq((10L, 1L, ts(7200))).toDF("lid", "user", "lts")
    val events = Seq(
      (1L, ts(3600), 1.0),  // exactly label−w: EXCLUDED (strict >)
      (1L, ts(3601), 2.0),  // first in-window second
      (1L, ts(7200), 4.0),  // exactly label ts: included
      (1L, ts(7201), 8.0),  // future: leakage, must never count
      (2L, ts(7000), 99.0)  // other user
    ).toDF("user", "ets", "v")
    val out = Features.pointInTime(labels, events, "user", "lid", "lts",
        "ets", 3600L, Seq(count(lit(1)).as("n"), sum("v").as("sv")))
      .select("lid", "n", "sv").as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((10L, 2L, 6.0)))
  }

  test("cross-bucket match: an event late in the previous bucket is found") {
    // label t=7205 (bucket 2 at w=3600); event t=7195 sits in bucket 1
    val labels = Seq((1L, 5L, ts(7205))).toDF("lid", "user", "lts")
    val events = Seq((5L, ts(7195), 1.0)).toDF("user", "ets", "v")
    val out = Features.pointInTime(labels, events, "user", "lid", "lts",
        "ets", 3600L, Seq(count(lit(1)).as("n")))
      .select("n").as[Long].collect()
    assert(out.toSeq === Seq(1L))
  }

  test("labels with no in-window events survive with null aggregates") {
    val labels = Seq((1L, 5L, ts(7200)), (2L, 6L, ts(7200)))
      .toDF("lid", "user", "lts")
    val events = Seq((5L, ts(7000), 3.0)).toDF("user", "ets", "v")
    val out = Features.pointInTime(labels, events, "user", "lid", "lts",
        "ets", 3600L, Seq(count(lit(1)).as("n")))
      .select("lid", "n").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out === Map(1L -> Some(1L), 2L -> None),
      "absent-event label rides the left join, not silently dropped")
  }

  test("equals the naive inequality join on the real event stream") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val labels = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("lid"), col("user_id"), col("ts").as("lts"))
    val feats = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("ets"), col("value"))
    val banded = Features.pointInTime(labels, feats, "user_id", "lid",
        "lts", "ets", 3600L, Seq(count(lit(1)).as("n")))
      .select(col("lid"), coalesce(col("n"), lit(0L)).as("n"))
      .as[(Long, Long)].collect().toMap
    val naive = labels.as("l").join(feats.as("f"),
        col("l.user_id") === col("f.user_id") &&
          col("f.ets") <= col("l.lts") &&
          col("f.ets") > col("l.lts") - expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("l.lid")).agg(count(col("f.ets")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(banded === naive && banded.nonEmpty)
  }
}
