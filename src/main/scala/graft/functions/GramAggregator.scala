package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer second-moment (Gram) matrix of a float-vector column —
  * the one-pass foundation under PCA, ZCA-whitening and Mahalanobis
  * outlier scoring of an embedding corpus (covariance is one consumer
  * subtraction away given the q44 centroid): G[i][j] = Σ_vec m_i·m_j over
  * the upper triangle i ≤ j, where m = half-away-from-zero
  * round(1e6 · x) — the same micro-unit grid as the drift vector-sum
  * state, so any engine replays the integers bit-for-bit.
  *
  * Buffer = (upper-triangle long sums, count): associative + commutative,
  * so Spark executes map-side partial Grams and merges d(d+1)/2-long
  * buffers — the shuffle carries one triangle per partition, never rows.
  * Overflow headroom: |m| ≤ ~2²¹ for unit-scale embeddings, so each
  * product is ≤ 2⁴² and ~2²⁰ rows fit a long buffer cell; past that,
  * shard the input and merge the per-shard triangles in DECIMAL (the
  * rebinCounts-style mitigation, documented not hidden).
  *
  * Output: (cells = Seq of (i, j, Σ m_i·m_j) with 1-based i ≤ j, n rows).
  * Null vectors are dropped at the door (no components to observe — the
  * vecMicroSums contract); ragged widths clamp to the shorter vector.
  */
object GramAggregator
    extends Aggregator[Seq[Float], (Array[Long], Long),
      (Seq[(Int, Int, Long)], Long)] {

  private def micro(x: Double): Long = {
    val y = x * 1e6
    if (y >= 0) math.floor(y + 0.5).toLong else math.ceil(y - 0.5).toLong
  }

  override def zero: (Array[Long], Long) = (Array.empty[Long], 0L)

  override def reduce(b: (Array[Long], Long),
      v: Seq[Float]): (Array[Long], Long) = {
    if (v == null) b
    else {
      val d = v.length
      val need = d * (d + 1) / 2
      val cells = if (b._1.length == 0) new Array[Long](need) else b._1
      val m = new Array[Long](d)
      var i = 0
      while (i < d) { m(i) = micro(v(i).toDouble); i += 1 }
      var idx = 0
      i = 0
      while (i < d && idx < cells.length) {
        var j = i
        while (j < d && idx < cells.length) {
          cells(idx) += m(i) * m(j)
          idx += 1; j += 1
        }
        i += 1
      }
      (cells, b._2 + 1)
    }
  }

  override def merge(a: (Array[Long], Long),
      b: (Array[Long], Long)): (Array[Long], Long) =
    if (a._1.length == 0) b
    else if (b._1.length == 0) a
    else {
      var i = 0
      val n = math.min(a._1.length, b._1.length)
      while (i < n) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Long], Long)): (Seq[(Int, Int, Long)], Long) = {
    if (r._2 == 0) return (Seq.empty, 0L)
    // d from the triangle length: len = d(d+1)/2
    val d = ((math.sqrt(8.0 * r._1.length + 1) - 1) / 2).round.toInt
    val out = Seq.newBuilder[(Int, Int, Long)]
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { out += ((i + 1, j + 1, r._1(idx))); idx += 1; j += 1 }
      i += 1
    }
    (out.result(), r._2)
  }

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Array[Long], Long)]()
  override def outputEncoder: Encoder[(Seq[(Int, Int, Long)], Long)] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Seq[(Int, Int, Long)], Long)]()
}
