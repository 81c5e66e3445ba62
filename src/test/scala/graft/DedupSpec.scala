package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operator semantics on a controlled corpus: exact survivor choice,
  * LSH finding planted near-dups without false negatives at high
  * similarity, SimHash distance properties.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffle exchange plans"),
    (4L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK TODAY"), // case-dup of 1
    (5L, "another unrelated document mentioning joins aggregates and windows only once")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest-id survivor per normalized fingerprint") {
    val out = Dedup.exact(docs, lower(col("text")), "doc_id")
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 5L), "4 is a case-duplicate of 1 and must drop")
  }

  test("minhash LSH finds the planted near-dup pair and verifies with exact jaccard") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)),
      "case-folded duplicate must collide after lowercase tokenization")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH pairs equal exact inverted-index pairs on this corpus (recall check)") {
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "jaccard").collect().toSet
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "jaccard").collect().toSet
    assert(lsh === exact)
  }

  test("band self-join carries ids only — shingle arrays do not ride the explode") {
    val out = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.5)
    val joins = out.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "band")) => j
    }
    assert(joins.nonEmpty, "expected a band-key equi-self-join in the plan")
    joins.foreach { j =>
      assert(!(j.left.output ++ j.right.output).exists(_.name == "hs"),
        "band-join inputs must not carry the hashed-shingle array — " +
          "that is a bands× shuffle amplification of the widest column")
    }
  }

  test("contamination finds the train docs overlapping the probe set") {
    val out = Dedup.contamination(
        docs.filter(col("doc_id") =!= 1L), // train: 2,3,4,5
        docs.filter(col("doc_id") === 1L), // probe: 1
        "doc_id", "text", 3, 3)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    // 2 and 4 share nearly all 3-grams with 1; 3 and 5 share none
    assert(out === Set((2L, 1L), (4L, 1L)))
  }

  test("identical docs have identical simhash; near-dups are close, unrelated far") {
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(4L), "case-insensitive tokens ⇒ equal sketches")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      "near-dup must be closer than unrelated doc")
  }

  test("simHashPairs banding finds every pair within the hamming budget") {
    val viaBanding = Dedup.simHashPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bruteForce = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3
    } yield (a, b)).toSet
    assert(viaBanding === bruteForce, "pigeonhole banding must have perfect recall")
  }
}
