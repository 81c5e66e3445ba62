package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization as a first-class operator — the construction
  * behind the behavioral family (q133 turn assembly, q190/q194 session
  * baskets, q201 sequence pairs), factored so every consumer shares one
  * definition of "session". Spark's `session_window` covers the
  * aggregate-only form; this materializes the ASSIGNMENT on the event
  * rows, which is what sequence mining, basket construction, and
  * within-session order statistics actually need.
  */
object Sessionize {

  /** Add `outCol` = 1-based session ordinal per `userCol`: a new session
    * starts at the user's first event or after a gap STRICTLY greater
    * than `gapMicros` in (`tsCol`, `tieCol`) order (an exactly-gap-long
    * pause continues the session). The classic lag → break-flag →
    * running-sum pair of windows; both ride the SAME user-keyed
    * partition order, so the sessionization costs exactly one exchange —
    * the per-user window is the operator's semantics, and user_id
    * partitioning spreads it (the q180 stance).
    */
  def assign(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapMicros: Long,
      outCol: String = "sess"): DataFrame = {
    require(gapMicros > 0, "a session gap is positive")
    val wOrd = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val gap = us - lag(us, 1).over(wOrd)
    events
      .withColumn("_graft_brk",
        when(gap.isNull || gap > lit(gapMicros), 1L).otherwise(0L))
      .withColumn(outCol,
        sum("_graft_brk").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_graft_brk")
  }
}
