package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Filtered vector search (predicate pushed INTO the index scan) and MMR
  * diversity re-ranking — the two retrieval-side passes between raw ANN and
  * a consumer.
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }

  test("filtered probe == assign-after-filter inline path; filter reaches the index scan") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_meta").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, path,
      metaCols = Seq("label"))

    // label-matching queries make the two paths exactly comparable: both
    // search the label==1 corpus, so filter-then-assign (inline) must equal
    // assign-then-filter (indexed pred) row for row — per-vector bucket
    // assignment is independent of the rest of the corpus.
    val batch = emb.filter(col("label") === 1 && col("vec_id") < 30)
    val filtered = Similarity.ivfTopKIndexed(spark, path, batch,
      "vec_id", "embedding", 10, 4, pred = col("label") === 1)
    val inline = Similarity.ivfTopKWith(emb.filter(col("label") === 1),
      "vec_id", "embedding", col("vec_id") < 30, 10, 4, cents)
    assert(rows(filtered) === rows(inline))

    // every returned neighbor satisfies the predicate
    val lab = emb.select(col("vec_id").as("neighbor_id"), col("label"))
    assert(filtered.join(lab, "neighbor_id")
      .filter(col("label") =!= 1).count() === 0L)

    // the predicate is pushed into the bucket-table parquet scan
    val plan = finalPlan(filtered)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(label,1)"),
      s"label filter must reach the index FileScan:\n$plan")
  }

  test("post-filtering an unfiltered top-k under-returns; filtered search does not") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_meta2").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, path,
      metaCols = Seq("label"))
    val batch = emb.filter(col("vec_id") < 10)

    val k = 10
    val filtered = Similarity.ivfTopKIndexed(spark, path, batch,
      "vec_id", "embedding", k, 4, pred = col("label") === 1)
    val postFiltered = Similarity.ivfTopKIndexed(spark, path, batch,
        "vec_id", "embedding", k, 4)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .filter(col("label") === 1)

    // ~10% of the corpus is label 1, so an unfiltered top-10 post-filtered
    // keeps ~1 row; the filtered search ranks WITHIN the matching set and
    // must return strictly more matches per query (and never fewer).
    val f = filtered.groupBy("query_id").count()
      .select(col("query_id"), col("count").as("fc"))
    val p = postFiltered.groupBy("query_id").count()
      .select(col("query_id"), col("count").as("pc"))
    val joined = f.join(p, Seq("query_id"), "left")
      .withColumn("pc", coalesce(col("pc"), lit(0L)))
    assert(joined.filter(col("fc") < col("pc")).count() === 0L,
      "filtered search can never return fewer matches than post-filtering")
    assert(joined.filter(col("fc") > col("pc")).count() > 0L,
      "filtered search must out-return post-filtering somewhere")
    assert(postFiltered.groupBy("query_id").count()
      .agg(min("count")).head().getLong(0) < k,
      "post-filtering under-returns: some query drops below k")
  }

  test("MMR: lambda trades relevance for diversity on a hand-checkable corpus") {
    // unit-norm 2d corpus: id1 dead-on the query, id2 close to id1, id3
    // distinct. Pure relevance ranks (1, 2, 3); with the diversity term
    // dominating (lambda 0.4), id3's distance from id1 beats id2's rel.
    val vecs = Seq(
      (0L, Array(1f, 0f)),       // query
      (1L, Array(1f, 0f)),       // rel 1.0
      (2L, Array(0.96f, 0.28f)), // rel 0.96, cos(1,2) = 0.96
      (3L, Array(0.6f, 0.8f))    // rel 0.6,  cos(1,3) = 0.6, cos(2,3) = 0.8
    ).toDF("vec_id", "embedding")

    val mmr = Similarity.mmrRerank(vecs, "vec_id", "embedding",
        col("vec_id") === 0L, k = 3, poolSize = 3, lambda = 0.4)
      .orderBy("rank")
      .select("neighbor_id", "score").as[(Long, Double)].collect()
    assert(mmr.map(_._1).toSeq === Seq(1L, 3L, 2L))
    // rank-1 score is lambda * rel; later scores include the repulsion term
    assert(math.abs(mmr(0)._2 - 0.4) < 1e-9)
    assert(math.abs(mmr(1)._2 - (0.4 * 0.6 - 0.6 * 0.6)) < 1e-6)
    assert(math.abs(mmr(2)._2 - (0.4 * 0.96 - 0.6 * 0.96)) < 1e-6)
  }

  test("zero vector in the corpus: cosine is 0, not an ANSI divide-by-zero") {
    // under Spark 4 ANSI mode a bare dot/(|a||b|) would kill the whole scan
    // on ONE malformed embedding; the guarded cosine scores it 0 (no
    // direction, no signal) and every vector op keeps running
    val vecs = Seq(
      (0L, Array(1f, 0f)),  // query
      (1L, Array(1f, 0f)),
      (2L, Array(0.6f, 0.8f)),
      (3L, Array(0f, 0f))   // zero vector: |v| = 0
    ).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        col("vec_id") === 0L, 3)
      .orderBy("rank").select("neighbor_id", "cos")
      .as[(Long, Double)].collect()
    assert(brute.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(brute.last._2 === 0.0, "zero vector scores cosine 0 everywhere")
    // MMR at k == poolSize: no stranding, and cos-0 means maximally
    // diverse — at lambda 0.5 the zero vector legitimately outranks the
    // near-duplicate of rank 1
    val mmr = Similarity.mmrRerank(vecs, "vec_id", "embedding",
        col("vec_id") === 0L, k = 3, poolSize = 3, lambda = 0.5)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(mmr === Seq(1L, 3L, 2L))
  }

  test("append to a metadata index carries the metadata; filtered probe sees appended rows") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_meta3").toString
    val old = emb.filter(col("vec_id") % 2 === 0)
    val fresh = emb.filter(col("vec_id") % 2 =!= 0)
    Similarity.buildIvfIndex(old, "vec_id", "embedding", cents, path,
      metaCols = Seq("label"))
    Similarity.appendToIvfIndex(spark, path, fresh, "vec_id", "embedding")

    val batch = emb.filter(col("label") === 1 && col("vec_id") < 30)
    val probed = Similarity.ivfTopKIndexed(spark, path, batch,
      "vec_id", "embedding", 10, 4, pred = col("label") === 1)
    // identical to a from-scratch metadata build over the union
    val full = java.nio.file.Files.createTempDirectory("graft_ivf_meta4").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, full,
      metaCols = Seq("label"))
    val direct = Similarity.ivfTopKIndexed(spark, full, batch,
      "vec_id", "embedding", 10, 4, pred = col("label") === 1)
    assert(rows(probed) === rows(direct))
    // and appended (odd-id) label-1 neighbors actually surface
    assert(probed.filter(col("neighbor_id") % 2 =!= 0).count() > 0L,
      "appended rows must be findable through the filter")
  }

  test("MMR composes with an indexed-ANN pool: lambda = 1 reproduces the pool's ranking") {
    // the documented composition (ANN candidate generation → exact MMR
    // re-rank): pool from the saved IVF index, not brute force
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_mmr").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, path)
    val pool = Similarity.ivfTopKIndexed(spark, path,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", 25, 4)
    val mmr = Similarity.mmrRerank(emb, "vec_id", "embedding", pool,
        k = 10, lambda = 1.0)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    // λ=1 MMR over the pool == the pool's own top-10 by (cos desc, id)
    val expect = pool.filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    assert(mmr.except(expect).count() === 0L &&
      expect.except(mmr).count() === 0L)
    // and with diversity on, selection still draws only from the pool
    val div = Similarity.mmrRerank(emb, "vec_id", "embedding", pool,
      k = 10, lambda = 0.3)
    assert(div.join(pool.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id"), "left_anti").count() === 0L,
      "MMR must never select outside its candidate pool")
  }

  test("MMR at lambda = 1 is exactly the relevance ranking") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val mmr = Similarity.mmrRerank(emb, "vec_id", "embedding",
        col("vec_id") < 5, k = 10, poolSize = 25, lambda = 1.0)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("vec_id") < 5, 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    assert(mmr.except(brute).count() === 0L && brute.except(mmr).count() === 0L)
  }
}
