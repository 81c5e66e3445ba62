package graft

/** q133 turn assembly: hand-checked sessionization (30-min idle gap),
  * ordered-transcript determinism under timestamp ties (event_id breaks
  * them), and the alternation/error validation signals.
  */
class TurnAssemblySpec extends SparkSpec {
  import spark.implicits._

  // fixtures sit on a real epoch base: the NANOS loader range-probes every
  // value against plausible epoch-ns bounds (Tables.normalizeEventTs), so
  // a 1970-relative synthetic timestamp is — by design — a loud failure
  private val base = 1704067200L // 2024-01-01T00:00:00Z, seconds

  test("q133: gap splits sessions, ties order by event_id, signals hand-check") {
    val dir = java.nio.file.Files.createTempDirectory("graft_turns").toString
    def ns(sec: Long) = (base + sec) * 1000000000L
    // user 1: three events inside one session (two with TIED timestamps,
    // event_id must break the tie), then a 2000 s gap opens session 2;
    // user 2: one lone event
    Seq(
      (10L, ns(0), 1L, "view", 1.0, """{"k": 1}"""),
      (12L, ns(5), 1L, "error", 1.0, """{"k": 1}"""),
      (11L, ns(5), 1L, "click", 1.0, """{"k": 1}"""),
      (13L, ns(2005), 1L, "view", 1.0, """{"k": 1}"""),
      (14L, ns(7), 2L, "click", 1.0, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q133_turn_assembly")(spark, dir)
      .select("user_id", "session_no", "n_turns", "n_alt", "transcript",
        "has_error")
      .as[(Long, Int, Int, Int, String, Boolean)].collect().toSeq
    assert(out === Seq(
      // ts tie at 5 s: event_id 11 (click) precedes 12 (error)
      (1L, 1, 3, 2, "view>click>error", true),
      (1L, 2, 1, 0, "view", false),
      (2L, 1, 1, 0, "click", false)))
  }

  test("q133: an exactly-30-minute gap does NOT split; 30 min + 1 us does") {
    val dir = java.nio.file.Files.createTempDirectory("graft_turns_edge").toString
    val b = base * 1000000000L
    Seq(
      (1L, b, 1L, "view", 1.0, "{}"),
      (2L, b + 1800L * 1000000000L, 1L, "click", 1.0, "{}"),
      (3L, b + (3600L * 1000000000L) + 1000L, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q133_turn_assembly")(spark, dir)
      .select("session_no", "transcript").as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "view>click"), (2, "view")))
  }
}
