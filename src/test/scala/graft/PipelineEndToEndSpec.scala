package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing}
import graft.sources.TableSink

/** The whole pre-training prep path composed from public API, the way a
  * user of the engine would run it: dedup → quality gate → chunk → pack →
  * shard export with manifest. Asserts the row/token accounting is
  * consistent across every stage boundary — the invariant a real pipeline
  * monitors.
  */
class PipelineEndToEndSpec extends SparkSpec {

  test("dedup → gate → chunk → pack → export: counts reconcile at every stage") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")

    // 1. exact dedup (lowest-id survivor per normalized text)
    val deduped = Dedup.exact(docs, lower(col("text")), "doc_id")
    val nDeduped = deduped.count()
    assert(nDeduped > 0 && nDeduped <= docs.count())

    // 2. quality gate: drop sub-16-token docs
    val gated = deduped.filter(size(split(col("text"), "\\s+")) >= 16)
    val nGated = gated.count()
    assert(nGated > 0 && nGated <= nDeduped)

    // 3. chunk to 32-token windows (stride 24)
    val chunks = Packing.chunk(gated, "doc_id", "text", 32, 8)
    val nChunks = chunks.count()
    assert(nChunks >= nGated, "every gated doc emits at least one chunk")
    assert(chunks.agg(max("n_tokens")).head.getInt(0) <= 32)

    // 4. pack the gated corpus into 512-token sequences; tokens conserve
    val packed = Packing.packSequences(gated, "doc_id", "text", 512)
    val packedTokens = packed.agg(sum("n_tokens")).head.getLong(0)
    val sourceTokens = gated
      .select(size(graft.functions.TextFns.tokens(col("text"))).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(packedTokens === sourceTokens,
      "packing must account every token exactly once")
    assert(packed.agg(sum("n_docs")).head.getLong(0) === nGated)

    // 5. export chunks as bounded JSONL shards; manifest totals reconcile
    val dir = Files.createTempDirectory("graft_e2e").toString + "/chunks"
    val (shards, total) = TableSink.exportJsonl(chunks, dir, 200)
    assert(total === nChunks, "the manifest must account every chunk")
    assert(shards >= (nChunks + 199) / 200)
    assert(spark.read.json(dir).count() === nChunks)
  }
}
