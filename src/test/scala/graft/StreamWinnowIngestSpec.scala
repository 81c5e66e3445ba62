package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup

/** q312's streaming-ingest → at-rest index lifecycle, instrumented: the
  * registered query caches the built index, so THIS spec drives the same
  * foreachBatch append pipeline with a batch counter and proves (a)
  * maxFilesPerTrigger really split the ingest into ≥ 2 micro-batches and
  * (b) the streamed-in index probes identically to a one-shot build —
  * the "no lost / double-applied micro-batch" law at the spec level
  * (the driver gate proves it against the raw-corpus oracle).
  */
class StreamWinnowIngestSpec extends SparkSpec {

  test("streamed appends over >=2 micro-batches ≡ one-shot build") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    val probe = docs.filter(col("doc_id") % 5 === 0)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q312_spec").toString
    val idx = s"$base/index"
    Dedup.buildWinnowIndex(corpus.limit(0), "doc_id", "text", 3, 4, idx)
    corpus.repartition(3).write.parquet(s"$base/ingest")
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/ingest")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) nBatches.incrementAndGet()
        Dedup.appendToWinnowIndex(spark, idx, b, "doc_id", "text"); ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(nBatches.get() >= 2,
      s"maxFilesPerTrigger=1 over 3 files must yield >=2 micro-batches, " +
        s"got ${nBatches.get()}")
    val streamed = Dedup.winnowIndexedMatches(spark, idx, probe,
      "doc_id", "text", 2).collect().map(_.toSeq).toSet
    val oneShot = s"$base/oneshot"
    Dedup.buildWinnowIndex(corpus, "doc_id", "text", 3, 4, oneShot)
    val expected = Dedup.winnowIndexedMatches(spark, oneShot, probe,
      "doc_id", "text", 2).collect().map(_.toSeq).toSet
    assert(streamed === expected)
    assert(streamed.nonEmpty, "the corpus plants cross-slice overlaps")
  }
}
