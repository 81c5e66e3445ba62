package graft.queries

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for once-per-(session, sf dir) query artifacts
  * (backfilled tables, Derby databases, collected edge lists, persisted
  * drift states). The OUTER map WEAKLY keys the SparkSession (the
  * Checkpoints.cutCounts pattern) so a stopped/dereferenced session's
  * entries — and whatever they pin — become collectable instead of
  * living for the JVM (a long-lived multi-session service otherwise
  * leaks one entry per retired session). The inner per-session map uses
  * ConcurrentHashMap.computeIfAbsent, NOT TrieMap.getOrElseUpdate: the
  * builders are side-effecting (temp-dir writes, a Derby database +
  * MERGEs), and getOrElseUpdate can run a racing builder twice and leak
  * the loser's state — computeIfAbsent locks the key and runs it once.
  *
  * CONTRACT: the cached value must NOT reference the SparkSession
  * (paths, JDBC coords, collected rows — never a Dataset, whose
  * QueryExecution strongly refs the session and would pin the weak key
  * forever, the documented WeakHashMap self-reference trap).
  */
private[graft] final class SessionMemo[V] {
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, V]])

  def apply(s: SparkSession, d: String)(build: => V): V =
    bySession.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, V])
      .computeIfAbsent(d, _ => build)

  /** Test probe (CacheHygieneSpec): is this session still a live key? */
  private[graft] def holds(s: SparkSession): Boolean =
    bySession.containsKey(s)

  /** Test probe: live (non-expunged) session keys. `size()` expunges
    * entries whose weak key was collected.
    */
  private[graft] def liveSessions: Int = bySession.size
}
