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
}
