package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics: most recent right value with ts <= left ts, per
  * key; inclusive at equality; NULL when no prior right row exists.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("carries the latest right value at or before each left row") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, 1L, ts("2024-01-01 11:00:00"), "purchase"), // asof -> 10:00
      (3L, 1L, ts("2024-01-01 12:00:00"), "signup"),
      (4L, 1L, ts("2024-01-01 12:00:00"), "purchase"), // tie: right sorts first -> 12:00
      (5L, 2L, ts("2024-01-01 09:00:00"), "purchase"), // no prior signup -> null
      (6L, 2L, ts("2024-01-01 09:30:00"), "signup")
    ).toDF("event_id", "user_id", "ts", "event_type")

    val out = AsOfJoin.lastValueAsOf(df,
      isRight = col("event_type") === "signup",
      valueCol = col("ts"),
      partition = Seq(col("user_id")),
      ts = col("ts"),
      tieBreak = col("event_id"))
      .filter(col("event_type") === "purchase")
      .orderBy("event_id")
      .select(col("event_id"), col("_graft_asof"))
      .collect()

    assert(out(0).getTimestamp(1) === ts("2024-01-01 10:00:00"))
    assert(out(1).getTimestamp(1) === ts("2024-01-01 12:00:00"),
      "right row at the exact left timestamp must be visible (<= semantics)")
    assert(out(2).isNullAt(1), "no signup before first purchase of user 2")
  }
}
