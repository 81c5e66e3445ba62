package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the centroid (elementwise mean) of a
  * float-vector column in one pass — the vector-UDAF extension point from
  * SURVEY.md §2b (cluster centers for IVF training, label prototypes,
  * embedding drift monitoring).
  *
  * Buffer = (elementwise double sums, count): associative + commutative, so
  * Spark executes partial (map-side) sums + a final merge — the shuffle
  * carries one vector per partition per group, never the rows.
  */
object CentroidAggregator
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val sums = if (b._1.length == 0) new Array[Double](v.length) else b._1
      var i = 0
      val n = math.min(sums.length, v.length)
      while (i < n) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.length == 0) b
    else if (b._1.length == 0) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
