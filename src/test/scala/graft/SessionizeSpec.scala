package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

/** The gap-sessionization operator's boundary semantics — shared by the
  * whole behavioral family (q133/q190/q194/q201), so the contract is
  * pinned once here: strict-gap breaks, exactly-gap continues, ties
  * ordered by the tie column, per-user independence, 1-based numbering.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000)

  private def assign(rows: Seq[(Long, Long, Long)]): Map[(Long, Long), Long] =
    Sessionize.assign(
        rows.map { case (u, t, id) => (u, ts(t * 1000000L), id) }
          .toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", gapMicros = 30L * 1000000L)
      .select(col("user_id"), col("event_id"), col("sess"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("strict gap breaks, exactly-gap continues, numbering is 1-based") {
    // user 1: events at t=0, 30 (gap == 30s → SAME session), 61 (gap 31 → new)
    val got = assign(Seq((1L, 0L, 1L), (1L, 30L, 2L), (1L, 61L, 3L)))
    assert(got((1L, 1L)) === 1L)
    assert(got((1L, 2L)) === 1L, "a pause of exactly the gap continues")
    assert(got((1L, 3L)) === 2L, "a pause strictly past the gap breaks")
  }

  test("equal timestamps order by the tie column and never break") {
    val got = assign(Seq((1L, 100L, 7L), (1L, 100L, 3L), (1L, 100L, 5L)))
    assert(got.values.toSet === Set(1L), "zero gaps are one session")
  }

  test("users sessionize independently") {
    val got = assign(Seq((1L, 0L, 1L), (2L, 0L, 2L), (1L, 1000L, 3L),
      (2L, 10L, 4L)))
    assert(got((1L, 1L)) === 1L && got((1L, 3L)) === 2L)
    assert(got((2L, 2L)) === 1L && got((2L, 4L)) === 1L,
      "another user's events never influence the gap")
  }

  test("input columns pass through and the helper column does not leak") {
    val out = Sessionize.assign(
      Seq((1L, ts(0L), 1L, "x")).toDF("user_id", "ts", "event_id", "payload"),
      "user_id", "ts", "event_id", gapMicros = 1L)
    assert(out.columns.toSeq ===
      Seq("user_id", "ts", "event_id", "payload", "sess"))
  }

  test("a nonpositive gap is rejected") {
    intercept[IllegalArgumentException] {
      Sessionize.assign(Seq((1L, ts(0L), 1L)).toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", gapMicros = 0L)
    }
  }
}
