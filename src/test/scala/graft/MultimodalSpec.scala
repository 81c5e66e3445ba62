package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: binary payload round-trip, frame sampling shape,
  * and the batched (mapPartitions) stub decoder's schema + determinism.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a" * 100), (2L, "the quick brown fox"), (3L, "xy"))
    .toDF("doc_id", "text")

  test("asMedia produces the typed media schema with UTF-8 payload bytes") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName === "binary")
    val r = m.filter(col("media_id") === 2L).head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "the quick brown fox")
  }

  test("sampleFrames yields k frames with in-range offsets, short payloads included") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    val f = Multimodal.sampleFrames(m, 4, 32)
    assert(f.count() === 12) // 3 docs x 4 frames
    val offsets = f.filter(col("media_id") === 1L).orderBy("frame_idx")
      .select("offset").as[Int].collect().toSeq
    assert(offsets === Seq(1, 23, 46, 69), "evenly spaced over 100-32 bytes")
    // short payload: all frames start at 1 and truncate
    val short = f.filter(col("media_id") === 3L).select("offset").as[Int].collect()
    assert(short.forall(_ === 1))
  }

  test("extractFeatures: batched decode keeps schema, determinism, and L1 normalization") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(m)
    assert(feats.schema === Multimodal.featureSchema)
    val row = feats.filter(col("media_id") === 1L).head
    assert(row.getInt(1) === 100)
    val v = row.getSeq[Float](2)
    assert(v.length === 8)
    assert(math.abs(v.sum - 1.0f) < 1e-5, "bucket histogram must sum to 1")
    // deterministic across runs
    val again = Multimodal.extractFeatures(m).filter(col("media_id") === 1L).head.getSeq[Float](2)
    assert(v === again)
  }

  test("resize bounds payloads to targetBytes, passes short ones through") {
    val m = Multimodal.asMedia(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
    val sizes = Multimodal.resize(m, 16)
      .select(col("media_id"), col("n_bytes"), length(col("payload")).as("len"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      assert(r.getInt(1) <= 16, s"media ${r.getLong(0)} resized to ${r.getInt(1)}")
      assert(r.getInt(1) === r.getInt(2), "n_bytes must describe the payload")
    }
    // deterministic: same first byte as source (stride sampling keeps byte 0)
    val src = m.filter(col("media_id") === 0L).head.getAs[Array[Byte]]("payload")
    val out = Multimodal.resize(m, 16).filter(col("media_id") === 0L)
      .head.getAs[Array[Byte]]("payload")
    assert(out.head === src.head)
  }
}
