package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Packing

/** ScalaCheck properties for the two-phase rank machinery behind
  * q114/q115 (and q101's bucket scheme): on ARBITRARY id sets — negative,
  * sparse, adversarially clustered, empty — the distributed rank must
  * equal the global in-JVM reference computed with the same md5-derived
  * hash. Trial counts are modest (each trial runs real Spark jobs), but
  * the generators roam the id shapes the quantile bucketing exists to
  * survive.
  */
class RankPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  /** In-JVM replica of TextFns.hash32: first 8 md5 hex chars, base 16. */
  private def md5h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private val genIds: Gen[List[Long]] = for {
    n <- Gen.choose(0, 50)
    ids <- Gen.listOfN(n, Gen.frequency(
      4 -> Gen.choose(-1000000L, 1000000L), // signed, sparse
      4 -> Gen.choose(0L, 20L),             // dense cluster
      1 -> Gen.const(999999999999L)))       // far outlier
  } yield ids.distinct

  test("deterministicShuffle == global (h, id) rank for arbitrary id sets") {
    check("shuffle rank", Prop.forAll(genIds, Gen.choose(1, 16),
      Gen.oneOf("s1", "seed", "zz")) { (ids, buckets, seed) =>
      val docs = ids.map(i => (i, "w")).toDF("doc_id", "text")
      val got = Packing.deterministicShuffle(docs, "doc_id", seed, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toList
      val expected = ids.map(i => (i, md5h32(s"$seed:$i")))
        .sortBy(t => (t._2, t._1)).zipWithIndex
        .map { case ((id, h), p) => (id, h, p.toLong) }
        .sortBy(_._1)
      got == expected
    })
  }

  test("lengthBatches == global (len, id) batch accounting for arbitrary corpora") {
    val genDocs: Gen[List[(Long, Int)]] = for {
      ids <- genIds
      lens <- Gen.listOfN(ids.size, Gen.choose(0, 25))
    } yield ids.zip(lens)
    check("length batches", Prop.forAll(genDocs, Gen.choose(1, 7),
      Gen.choose(1, 16)) { (docsSpec, batchSize, buckets) =>
      val docs = docsSpec.map { case (i, k) => (i, Seq.fill(k)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Packing.lengthBatches(docs, "doc_id", "text", batchSize, buckets)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .sortBy(_._1).toList
      val expected = docsSpec.map { case (i, k) => (i, k.toLong) }
        .sortBy(t => (t._2, t._1)).zipWithIndex
        .groupBy { case (_, p) => p.toLong / batchSize }
        .map { case (b, members) =>
          val lens = members.map(_._1._2)
          (b, members.size.toLong, lens.min, lens.max, lens.sum,
            members.size * lens.max - lens.sum)
        }.toList.sortBy(_._1)
      got == expected
    })
  }

  test("curriculumOrder == global (stage, h, id) rank for arbitrary corpora") {
    val genDocs: Gen[List[(Long, Int)]] = for {
      ids <- genIds
      lens <- Gen.listOfN(ids.size, Gen.choose(0, 25))
    } yield ids.zip(lens)
    check("curriculum rank", Prop.forAll(genDocs, Gen.choose(1, 6),
      Gen.choose(1, 16), Gen.oneOf("c1", "seed", "zz")) {
      (docsSpec, stages, buckets, seed) =>
      val docs = docsSpec.map { case (i, k) => (i, Seq.fill(k)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Packing.curriculumOrder(docs, "doc_id", "text", stages, seed, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toList
      val n = docsSpec.size
      val expected = docsSpec.map { case (i, k) => (i, k.toLong) }
        .sortBy(t => (t._2, t._1)).zipWithIndex
        .map { case ((id, len), dr) =>
          (id, len, dr.toLong * stages / n, md5h32(s"$seed:$id")) }
        .sortBy { case (id, _, stage, h) => (stage, h, id) }.zipWithIndex
        .map { case ((id, len, stage, h), p) => (id, len, stage, h, p.toLong) }
        .sortBy(_._1)
      got == expected
    })
  }
}
