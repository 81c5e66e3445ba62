package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` UDAF: weighted arithmetic mean. The UDAF extension
  * point from SURVEY.md §2b (UDF surface) — e.g. the reference's
  * billable-ratio (`billable_seconds / time_spent_seconds`,
  * `dags/fetch_jira_tempo_worklogs.py:84-85`) aggregated per author, or a
  * quantity-weighted discount over lineitem.
  *
  * Distributed correctness: the buffer (Σwx, Σw) is associative +
  * commutative, so Spark runs it as partial (map-side) + final merge — one
  * shuffle of two doubles per group, same cost profile as built-in avg.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)   // in = (value, weight)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
