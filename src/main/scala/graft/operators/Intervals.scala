package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap joins decomposed into bucket equi-joins — the
  * two-sided generalization of the q160/q219 band pattern: a naive
  * interval self-join is a non-equi theta join (a cartesian per key in
  * any engine's fallback plan); bucketing each interval onto a
  * fixed-width time grid turns it into an equi-join on the bucket with
  * an exact overlap filter behind it, and the decomposition provably
  * changes nothing (every overlapping pair shares at least one bucket
  * that both intervals touch). Candidate volume is bounded by
  * Σ_bucket (intervals touching it)² — pick `bucketMicros` near the
  * median interval length so intervals touch O(1) buckets and buckets
  * hold local density, not the corpus.
  */
object Intervals {

  /** All CROSS-GROUP overlapping interval pairs of one interval table:
    * rows (g_a < g_b — same-group pairs are excluded by construction;
    * for gap-sessionized intervals they cannot overlap anyway) where the
    * CLOSED intervals [s_a, e_a] and [s_b, e_b] intersect (touching
    * endpoints count, overlap 0). Start/end are integral microseconds
    * (or any integral axis); rows with NULL or inverted bounds are
    * dropped at the door.
    *
    * Shape: the cut interval frame explodes to the `bucketMicros`-grid
    * buckets it touches (floor div — sign-safe via pmod-free nonneg
    * contract: epoch micros are nonnegative), the self-join is EQUI on
    * the bucket with the group inequality and exact overlap filter
    * behind it, and the multi-bucket duplicates collapse with one
    * distinct on the pair row. No cartesian, no BNLJ — plan-guarded.
    *
    * Output: (g_a, id_a, g_b, id_b, overlap_us), one row per
    * overlapping pair; `overlap_us` = min(e)−max(s) ≥ 0 exact.
    */
  def overlapPairsAcrossGroups(df: DataFrame, groupCol: String,
      idCol: String, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "need a positive bucket width")
    val base = Checkpoints.cut(df
      .select(col(groupCol).as("g"), col(idCol).as("id"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .filter(col("s").isNotNull && col("e").isNotNull &&
        col("s") <= col("e")))
    val bucketed = base.withColumn("b",
      explode(sequence(expr(s"s div ${bucketMicros}L"),
        expr(s"e div ${bucketMicros}L"))))
    val out = bucketed.as("x").join(bucketed.as("y"),
        col("x.b") === col("y.b") && col("x.g") < col("y.g"))
      .filter(col("x.s") <= col("y.e") && col("y.s") <= col("x.e"))
      .select(col("x.g").as("g_a"), col("x.id").as("id_a"),
        col("y.g").as("g_b"), col("y.id").as("id_b"),
        (least(col("x.e"), col("y.e")) -
          greatest(col("x.s"), col("y.s"))).as("overlap_us"))
      .distinct()
    Checkpoints.sealAndRelease(out, base)
  }
}
