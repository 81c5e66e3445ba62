package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * operators. Everything here is built from codegen'd Spark built-ins (no
  * UDFs), and every hash is *engine-portable*: derived from `md5` hex so the
  * DuckDB oracle can recompute bit-identical values.
  *
  * Reference lineage: the reference's only text handling is array
  * serialization (`'//'.join`, `dags/jira/jira_base_processor.py:98-100`);
  * the tokenize/shingle/fingerprint surface generalizes it for the
  * LLM-pipeline closure (north star, /root/repo/BASELINE.json).
  */
object TextFns {

  /** Mersenne prime 2^31-1: modulus for the MinHash permutation family.
    * Keeps a_j*h + b_j < 2^62, overflow-free in signed 64-bit arithmetic.
    */
  val MinHashP: Long = 2147483647L

  /** Independent (a_j, b_j) per permutation, fixed seed. They MUST NOT be
    * proportional across j: an earlier linear family (a_j = c·j, b_j = d·j)
    * made every h_j(x) = j·(c·x+d) mod P — one permutation rescaled — which
    * correlated all band rows and silently destroyed LSH recall (caught by
    * the MLlib cross-check on real near-dup pairs, not by unit tests).
    */
  private val MaxPerms = 64
  private[graft] val PermConsts: IndexedSeq[(Long, Long)] = {
    val r = new scala.util.Random(2654435761L)
    IndexedSeq.fill(MaxPerms)(
      (1L + r.nextLong(MinHashP - 1), r.nextLong(MinHashP)))
  }

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Distinct word n-grams ("shingles") of the token array; empty array for
    * docs shorter than n tokens (sequence() would otherwise run backwards).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Portable 32-bit hash: first 8 hex chars of md5, parsed base-16.
    * DuckDB equivalent: `('0x' || substr(md5(s), 1, 8))::BIGINT`.
    */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Portable 60-bit hash (15 hex chars of md5) — join-key compression for
    * the shingle inverted index: collision-free on corpora many orders of
    * magnitude beyond the test scale (P(collision) ≈ n²/2⁶¹), and verified
    * injective on the actual corpora at build time.
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** MinHash signature (array of `perms` minima) over a shingle array.
    * h_j(x) = (a_j * (x mod P) + b_j) mod P with per-j constants from
    * [[PermConsts]].
    *
    * NB: callers on a hot path should materialize the hashed-shingle array
    * first and use [[minHashSignatureFromHashes]] — referencing the md5
    * hash expression inside `perms` lambda bodies re-evaluates it per
    * permutation (HOFs are interpreted, no CSE).
    */
  def minHashSignature(shingleArr: Column, perms: Int): Column =
    minHashSignatureFromHashes(transform(shingleArr, s => hash32(s) % MinHashP), perms)

  /** Signature from pre-hashed shingles (each already reduced mod P). */
  def minHashSignatureFromHashes(hashedArr: Column, perms: Int): Column = {
    require(perms <= MaxPerms, s"at most $MaxPerms permutations")
    array((0 until perms).map { j =>
      val (a, b) = PermConsts(j)
      array_min(transform(hashedArr, h => (lit(a) * h + lit(b)) % MinHashP))
    }: _*)
  }

  /** LSH band keys for a MinHash signature: md5 over each band's
    * comma-joined rows. Docs sharing any band key are near-dup candidates.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        md5(concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))).as("key")))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }
}
