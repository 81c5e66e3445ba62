package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic text-augmentation operators — the epoch-variation step
  * of a training pipeline (each epoch sees a differently-perturbed copy
  * of the corpus) done WITHOUT randomness: every decision is a hash of
  * (salt, doc, position, token), so any engine replays the exact same
  * augmented corpus (the oracle does), a resumed job regenerates
  * identical batches, and changing the salt — e.g. the epoch number —
  * yields an independent mask. Map-side only: no shuffle, the corpus is
  * perturbed in the scan stage.
  */
object Augment {

  /** Token dropout at exact rate `dropNum`/`dropDen`: token at position
    * p of document `idCol` is DROPPED iff hash32(salt:id:p:token) mod
    * dropDen < dropNum. Adds `aug_tokens` (the surviving tokens, order
    * preserved). Position is part of the key, so repeated tokens drop
    * independently; the id is part of the key, so identical texts in
    * different documents get different masks.
    */
  def tokenDropout(df: DataFrame, idCol: String, textCol: String,
      dropNum: Long, dropDen: Long, salt: String = ""): DataFrame = {
    require(dropDen > 0 && dropNum >= 0 && dropNum <= dropDen,
      "drop rate is a fraction num/den with 0 <= num <= den")
    // NULL text reads as the empty document (null would otherwise
    // propagate through zip_with/filter into a null aug_tokens)
    val t = coalesce(TextFns.tokens(col(textCol)),
      array().cast("array<string>"))
    val pos: Column = when(size(t) > 0, sequence(lit(1), size(t)))
      .otherwise(array().cast("array<int>"))
    val marked = zip_with(t, pos, (tok, p) =>
      when(pmod(TextFns.hash32(concat(lit(salt), lit(":"),
          col(idCol).cast("string"), lit(":"), p.cast("string"),
          lit(":"), tok)), lit(dropDen)) >= lit(dropNum), tok))
    df.withColumn("aug_tokens", filter(marked, x => x.isNotNull))
  }

  /** T5-style SPAN CORRUPTION, deterministic: the corpus splits into
    * `blockSize`-token blocks; block k of a document masks with
    * probability 1/`maskDenom` (hash-decided), and a masked block hides
    * ONE contiguous span of 1–3 tokens at a hash-decided offset. The
    * input sequence replaces each span with its `<extra_id_N>` sentinel
    * (N = the span's ordinal within the document); the target sequence
    * is sentinel + hidden tokens per span, in order — T5's denoising
    * objective (Raffel et al., JMLR 2020), with spans confined to
    * blocks so every masking decision is INDEPENDENT per block and the
    * whole op is relational: one token explode, one per-(doc, block)
    * hash-agg, a doc-partitioned running count for sentinel ordinals
    * (per-doc windows spread by doc — the q180 stance), and two ordered
    * re-collects. No sequential per-document fold, no quadratic
    * position×block scan.
    *
    * Determinism contract as [[tokenDropout]]: every decision hashes
    * (salt, id, block), so engines/epochs/restarts replay exactly.
    * Output: `idCol`, `n_tokens`, `n_spans`, `n_masked`,
    * `input_tokens`, `target_tokens` — and interleaving them
    * reconstructs the original token sequence (AugmentSpec's
    * round-trip law).
    */
  def spanCorruption(df: DataFrame, idCol: String, textCol: String,
      salt: String = "", blockSize: Int = 8,
      maskDenom: Int = 4): DataFrame = {
    require(blockSize >= 3 && maskDenom >= 1,
      "blocks must fit a max-length span; maskDenom >= 1")
    import org.apache.spark.sql.expressions.Window
    def h(tag: String, k: Column) = TextFns.hash32(concat(
      lit(salt), lit(":"), col(idCol).cast("string"),
      lit(s":$tag:"), k.cast("string")))
    val tok2 = df.select(col(idCol),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("p0", "tok")))
    val wDoc = Window.partitionBy(idCol).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = tok2
      .groupBy(col(idCol), (col("p0") / lit(blockSize)).cast("long").as("b"))
      .agg(count(lit(1)).as("bl"))
      .withColumn("masked", pmod(h("b", col("b")), lit(maskDenom.toLong)) === 0)
      .withColumn("lc", when(col("masked"),
        least(lit(1L) + pmod(h("l", col("b")), lit(3L)), col("bl"))))
      .withColumn("o", when(col("masked"),
        pmod(h("o", col("b")), col("bl") - col("lc") + 1)))
      .withColumn("sent", when(col("masked"),
        sum(when(col("masked"), 1L).otherwise(0L)).over(wDoc) - 1))
    val sentinel = concat(lit("<extra_id_"), col("sent").cast("string"),
      lit(">"))
    val j = tok2
      .withColumn("b", (col("p0") / lit(blockSize)).cast("long"))
      .withColumn("w", pmod(col("p0"), lit(blockSize.toLong)))
      .join(blocks, Seq(idCol, "b"))
      .withColumn("inspan", col("masked") && col("w") >= col("o") &&
        col("w") < col("o") + col("lc"))
      .withColumn("isstart", col("masked") && col("w") === col("o"))
    def collectOrdered(rows: DataFrame, outCol: String) = rows
      .groupBy(idCol)
      .agg(transform(sort_array(collect_list(struct(col("p0"), col("sub"),
        col("v")))), x => x.getField("v")).as(outCol))
    val inp = collectOrdered(j.filter(!col("inspan") || col("isstart"))
      .select(col(idCol), col("p0"), lit(0).as("sub"),
        when(col("isstart"), sentinel).otherwise(col("tok")).as("v")),
      "input_tokens")
    val tgt = collectOrdered(
      j.filter(col("isstart")).select(col(idCol), col("p0"),
          lit(0).as("sub"), sentinel.as("v"))
        .unionByName(j.filter(col("inspan")).select(col(idCol), col("p0"),
          lit(1).as("sub"), col("tok").as("v"))),
      "target_tokens")
    val stats = j.groupBy(idCol)
      .agg(sum(when(col("inspan"), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("isstart"), 1L).otherwise(0L)).as("n_spans"))
    val empty = array().cast("array<string>")
    // size(tokens(NULL)) is NULL — a null-text doc is an empty one
    df.select(col(idCol),
        coalesce(size(TextFns.tokens(col(textCol))).cast("long"), lit(0L))
          .as("n_tokens"))
      .join(stats, Seq(idCol), "left")
      .join(inp, Seq(idCol), "left")
      .join(tgt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("input_tokens"), empty).as("input_tokens"),
        coalesce(col("target_tokens"), empty).as("target_tokens"))
  }
}
