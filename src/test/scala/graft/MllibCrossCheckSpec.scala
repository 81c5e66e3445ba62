package graft

import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Independent cross-validation: the hand-rolled MinHash-LSH near-dup path
  * against Spark MLlib's MinHashLSH on the real documents table — two
  * unrelated implementations must agree on the high-similarity pairs.
  */
class MllibCrossCheckSpec extends SparkSpec {
  import spark.implicits._

  test("graft LSH pairs ⊇ mllib MinHashLSH pairs at jaccard >= 0.6 (sf0.001 docs)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")

    val ours = Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // mllib path: shingle sets -> sparse binary vectors -> approxSimilarityJoin
    val shingled = docs.select(col("doc_id"),
      array_distinct(expr(
        "transform(sequence(1, size(split(lower(text), '\\\\s+')) - 2)," +
          " i -> concat_ws(' ', slice(split(lower(text), '\\\\s+'), i, 3)))")).as("sh"))
      .filter(size(col("sh")) >= 1)
    val dim = 1 << 20
    val toVec = udf((sh: Seq[String]) => {
      val idx = sh.map(s => math.floorMod(s.hashCode, dim)).distinct.sorted.toArray
      Vectors.sparse(dim, idx, Array.fill(idx.length)(1.0))
    })
    val vecs = shingled.select(col("doc_id"), toVec(col("sh")).as("features"))
    val model = new MinHashLSH().setNumHashTables(12).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(vecs)
    val mllibPairs = model.approxSimilarityJoin(vecs, vecs, 0.4, "jaccardDist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .as[(Long, Long)].collect().toSet

    assert(mllibPairs.nonEmpty, "mllib should find the planted near-dups")
    val missed = mllibPairs -- ours
    assert(missed.isEmpty,
      s"pairs mllib found that graft LSH missed: $missed")
  }
}
