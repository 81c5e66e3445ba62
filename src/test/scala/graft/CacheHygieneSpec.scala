package graft

import org.apache.spark.sql.graftshim.GraftSqlShim

import graft.operators.{Dedup, Similarity}

/** Cache hygiene: the dedup/similarity family materializes its staged
  * intermediates via localCheckpoint, so a long-lived session (the 100 TB
  * service posture) never accumulates cache-manager entries from one-shot
  * operator calls — blocks are reclaimed by the context cleaner once the
  * results are dereferenced, with no manual unpersist contract on callers.
  */
class CacheHygieneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dedup/similarity operators leave no cache-manager entries behind") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    spark.catalog.clearCache()
    assert(GraftSqlShim.cacheIsEmpty(spark))

    assert(Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.6).count() >= 0)
    assert(GraftSqlShim.cacheIsEmpty(spark), "minHashLsh leaked a cache entry")

    assert(Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.6).count() >= 0)
    assert(GraftSqlShim.cacheIsEmpty(spark), "ngramJaccard leaked a cache entry")

    assert(Similarity.cosinePairsLsh(emb, "vec_id", "embedding", 0.85,
      bands = 12, rows = 6).count() >= 0)
    assert(GraftSqlShim.cacheIsEmpty(spark), "cosinePairsLsh leaked a cache entry")

    // the delegated (anti-regime) path is clean too
    assert(Similarity.cosinePairsLsh(emb, "vec_id", "embedding", 0.45).count() >= 0)
    assert(GraftSqlShim.cacheIsEmpty(spark), "delegated cosinePairsLsh leaked a cache entry")
  }

  test("session memos weakly key the session: a dropped session's entry is expunged") {
    // the query-layer memos (cooc edges, backfill/evolve dirs, Derby
    // coords) key a WeakHashMap on the SparkSession and cache only
    // session-free values (String / Properties / collected rows — the
    // type parameter enforces it; a cached Dataset would strongly ref
    // its session and pin the weak key forever), so a retired session
    // in a long-lived multi-session service is reclaimable, memo entry
    // and all. Probed with a session that ran NO Spark jobs: a session
    // that executed an AQE query is ADDITIONALLY pinned by Spark's own
    // shared QueryStageCreator pool (its daemon threads inherit the
    // active-session thread-local at creation — observed: a bare
    // groupBy/collect on a new session pins it with zero graft code on
    // the path), which is outside the memo's contract: the memo must
    // add no pin of its own.
    val memo = new graft.queries.SessionMemo[String]
    var s2: org.apache.spark.sql.SparkSession = spark.newSession()
    assert(memo(s2, "dir") { "artifact" } === "artifact")
    assert(memo(s2, "dir") { fail("builder must run once"); "" } === "artifact")
    assert(memo.holds(s2), "the memo must hold the live session")
    val ref = new java.lang.ref.WeakReference[AnyRef](s2)
    s2 = null
    var tries = 0
    while (ref.get != null && tries < 100) {
      System.gc(); Thread.sleep(50); tries += 1
    }
    assert(ref.get == null,
      "a dereferenced job-free session must become collectable — the memo " +
        "key is weak and the cached value holds no session reference")
    assert(memo.liveSessions === 0,
      "the collected session's map entry must be expunged")
  }

  test("real memo values are session-free and shared per (session, dir)") {
    // the compile-time half of the contract, exercised at data: q176's
    // cooc memo populates for this session and serves q187/q189 from
    // the same collected edge list (one corpus-sized self-join per
    // session/dir, not per query)
    val sf = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("q176_kcore")(spark, sf).collect().nonEmpty)
    assert(graft.queries.Analytics.memoHolds(spark),
      "the cooc memo must key this session after a graph query")
  }
}
