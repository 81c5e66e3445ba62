package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for file
  * skipping. Sorting a table by one column gives perfect min/max pruning
  * on that column and none on any other; interleaving the bits of two
  * sort keys makes every output file cover a small RECTANGLE of the
  * (a, b) space, so parquet footer min/max stats prune scans filtered on
  * EITHER dimension. This is the layout step behind Delta/Iceberg
  * `ZORDER BY`, built here from pure codegen'd column ops (shift/mask
  * bit spreading — no UDF).
  *
  * The reference's query axes are exactly this shape: worklogs filtered
  * sometimes by `issue_id`, sometimes by `author_id`
  * (`dags/fetch_jira_tempo_worklogs.py:82-91`) — one sort order cannot
  * serve both.
  */
object ZOrder {

  /** Bit-spread a 16-bit value into the even bit positions of 32 bits. */
  private def spread(x: Column): Column = {
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(m1)
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(m2)
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(m3)
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(m4)
  }

  /** 32-bit Morton code of two 16-bit inputs (a in even bits, b in odd).
    * Inputs outside [0, 65535] are masked — quantize first.
    */
  def interleave(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Quantize any numeric column to [0, 2^16) given its (min, max) — the
    * caller supplies bounds (one agg pass, or known domain).
    */
  def quantize(c: Column, min: Double, max: Double): Column = {
    val w = math.max(max - min, Double.MinPositiveValue)
    least(floor((c.cast("double") - lit(min)) / lit(w) * 65536.0), lit(65535.0))
      .cast("long")
  }

  /** Lay out `df` z-ordered on (a, b) into `nFiles` range-partitioned
    * files: each file then covers a compact rectangle of the key space
    * and parquet min/max stats prune on both dimensions.
    */
  def layout(df: DataFrame, a: Column, b: Column, nFiles: Int): DataFrame = {
    val z = interleave(a, b)
    df.withColumn("_graft_z", z)
      .repartitionByRange(nFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
  }
}
