package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters state, offset-encoded for O(1) eviction:
  * a counter's TRUE estimate is `stored − base` (entries with stored ≤
  * base are dead and ignored). The classic decrement-all step is then just
  * `base += 1` — no per-row map rebuild. `histo` counts live tokens per
  * stored value so the number of counters dying at a base bump is O(1) to
  * know; `live` is the current live-counter count. Dead entries are swept
  * when the map reaches 2k (amortized O(1) per row).
  */
case class MGState(counters: Map[String, Long], histo: Map[Long, Int],
    live: Int, base: Long, n: Long)

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
  * Eviction is amortized O(1) per row via the [[MGState]] offset encoding:
  * on a 100 TB token stream the non-tracked-arrival path is the COMMON
  * case, and the previous immutable-Map rebuild paid O(k) allocation + GC
  * per such row. The decrement depth per step is exactly 1 (a base bump),
  * so the n/(k+1) bound is untouched — HeavyHittersSpec pins it.
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

  override def zero: MGState = MGState(Map.empty, Map.empty, 0, 0L, 0L)

  /** Live (token → estimate) view of a state. */
  private def effective(s: MGState): Map[String, Long] =
    s.counters.collect { case (t, v) if v > s.base => t -> (v - s.base) }

  private def bumpHisto(h: Map[Long, Int], from: Long, to: Long): Map[Long, Int] = {
    val dec = h.get(from) match {
      case Some(1) => h - from
      case Some(c) => h.updated(from, c - 1)
      case None => h
    }
    dec.updated(to, dec.getOrElse(to, 0) + 1)
  }

  override def reduce(s: MGState, tok: String): MGState = {
    val stored = s.counters.getOrElse(tok, Long.MinValue)
    if (stored > s.base) {
      // tracked: +1, move its histogram bucket
      MGState(s.counters.updated(tok, stored + 1),
        bumpHisto(s.histo, stored, stored + 1), s.live, s.base, s.n + 1)
    } else if (s.live < k) {
      // room: insert at effective 1 (overwriting a dead entry is fine —
      // its histogram bucket was dropped when base passed it)
      val c1 = s.counters.updated(tok, s.base + 1)
      val h1 = s.histo.updated(s.base + 1, s.histo.getOrElse(s.base + 1, 0) + 1)
      // sweep dead entries once the map doubles: amortized O(1) per row
      if (c1.size >= 2 * k) {
        val liveOnly = c1.filter { case (_, v) => v > s.base }
        MGState(liveOnly, h1, s.live + 1, s.base, s.n + 1)
      } else MGState(c1, h1, s.live + 1, s.base, s.n + 1)
    } else {
      // full + non-tracked: decrement ALL live counters by one = bump the
      // base; counters stored at the new base die (histo says how many)
      val b = s.base + 1
      MGState(s.counters, s.histo - b,
        s.live - s.histo.getOrElse(b, 0), b, s.n + 1)
    }
  }

  override def merge(a: MGState, b: MGState): MGState = {
    val ea = effective(a)
    val eb = effective(b)
    val sum = (ea.keySet ++ eb.keySet).iterator
      .map(t => t -> (ea.getOrElse(t, 0L) + eb.getOrElse(t, 0L)))
      .toMap
    val trimmed =
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything; ≤0 drops out
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
        sum.flatMap { case (t, v) => if (v - cut > 0) Some(t -> (v - cut)) else None }
      }
    val histo = trimmed.groupBy(_._2).map { case (v, ts) => v -> ts.size }
    MGState(trimmed, histo, trimmed.size, 0L, a.n + b.n)
  }

  override def finish(s: MGState): Seq[(String, Long)] =
    effective(s).toSeq.sortBy { case (t, v) => (-v, t) }

  override def bufferEncoder: Encoder[MGState] = ExpressionEncoder[MGState]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
