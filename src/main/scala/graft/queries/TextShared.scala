package graft.queries

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Helpers shared by the four LLM-data-pipeline query families
  * ([[TextDedupOps]], [[TextSimOps]], [[TextScoreOps]], [[TextPrepOps]] —
  * one object per family seam, split from the original single TextOps).
  *
  * Oracle portability rule (applies to every family): every hash the
  * oracle must reproduce is md5-derived (TextFns.hash32), every float is
  * computed float→double per element and summed left-to-right, and every
  * output is totally ordered. Floats are either grid-immune rounded sums
  * or RAW single-division doubles (bit-identical across engines —
  * rounding a ratio whose denominator is 2^a·5^b-smooth flips at
  * half-boundaries, see q31). DuckDB SQL mirrors the computation
  * op-for-op.
  */
private[queries] object TextShared {

  def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // DuckDB-side token pipeline shared by several oracles.
  val OToks =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  // DuckDB-side distinct word 3-grams over token list t.
  val OShingles =
    """list_distinct([array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)])"""
}
