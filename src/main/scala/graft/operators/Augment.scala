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
    val t = TextFns.tokens(col(textCol))
    val pos: Column = when(size(t) > 0, sequence(lit(1), size(t)))
      .otherwise(array().cast("array<int>"))
    val marked = zip_with(t, pos, (tok, p) =>
      when(pmod(TextFns.hash32(concat(lit(salt), lit(":"),
          col(idCol).cast("string"), lit(":"), p.cast("string"),
          lit(":"), tok)), lit(dropDen)) >= lit(dropNum), tok))
    df.withColumn("aug_tokens", filter(marked, x => x.isNotNull))
  }
}
