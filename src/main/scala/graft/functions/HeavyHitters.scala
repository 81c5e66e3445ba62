package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters state: at most k counters + total items seen. */
case class MGState(counters: Map[String, Long], n: Long)

/** Misra–Gries heavy-hitters sketch as a typed Aggregator — the mergeable-
  * summary formulation (Agarwal et al., PODS'12): `reduce` is the classic
  * k-counter decrement step, `merge` sums two summaries and subtracts the
  * (k+1)-th largest count so the result stays a valid k-summary. Guarantee:
  * every estimate undercounts by at most n/(k+1), so any item with true
  * frequency > n/(k+1) is present in the sketch — found in one pass with
  * O(k) state per partition, where the exact top-k (q32) pays a full
  * (token → count) shuffle. The 100 TB shape: partials merge map-side and
  * only k-entry summaries cross the wire.
  *
  * Determinism note: when the distinct-item count never exceeds k, no
  * decrement ever fires anywhere (partials included) and the sketch is
  * EXACT regardless of partitioning/merge order — the basis for q102's
  * hash-matched oracle on the bounded-vocabulary corpus; the eviction
  * regime's guarantee is spec-asserted on synthetic data.
  */
case class HeavyHitters(k: Int)
    extends Aggregator[String, MGState, Seq[(String, Long)]] {
  require(k > 0, "k must be positive")

  override def zero: MGState = MGState(Map.empty, 0L)

  override def reduce(s: MGState, tok: String): MGState = {
    val c = s.counters
    val next =
      if (c.contains(tok)) c.updated(tok, c(tok) + 1)
      else if (c.size < k) c.updated(tok, 1L)
      else c.flatMap { case (t, v) => if (v > 1) Some(t -> (v - 1)) else None }
    MGState(next, s.n + 1)
  }

  override def merge(a: MGState, b: MGState): MGState = {
    val sum = (a.counters.keySet ++ b.counters.keySet).iterator
      .map(t => t -> (a.counters.getOrElse(t, 0L) + b.counters.getOrElse(t, 0L)))
      .toMap
    val trimmed =
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything; ≤0 drops out
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
        sum.flatMap { case (t, v) => if (v - cut > 0) Some(t -> (v - cut)) else None }
      }
    MGState(trimmed, a.n + b.n)
  }

  override def finish(s: MGState): Seq[(String, Long)] =
    s.counters.toSeq.sortBy { case (t, v) => (-v, t) }

  override def bufferEncoder: Encoder[MGState] = ExpressionEncoder[MGState]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
