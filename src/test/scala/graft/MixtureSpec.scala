package graft

import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** Temperature-resampling invariants: √-weight budget arithmetic on known
  * masses, dominance flattening (the reason α-sampling exists), budget
  * admission order, bucket-count independence of the two-phase cumsum, and
  * the empty-input contract.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, src: String, n: Int) =
    (id, src, (1 to n).map(i => s"w$i").mkString(" "))

  test("budgets follow floor-sqrt weights and integer division exactly") {
    // masses: a=10000 (w=100), b=100 (w=10), c=99 (w=9): B = (10199*1)/2 = 5099
    // budgets: a = 5099*100/119 = 4284, b = 428, c = 385
    val docs = (
      (0L until 100L).map(i => doc(i, "a", 100)) ++
        (100L until 110L).map(i => doc(i, "b", 10)) ++
        Seq(doc(110L, "c", 99))).toDF("doc_id", "source", "text")
    val out = Mixture.temperatureSampleSummary(
        docs, "doc_id", "source", "text", 1, 2)
      .orderBy("grp").collect()
    val budgets = out.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(budgets === Map("a" -> 4284L, "b" -> 428L, "c" -> 385L))
    // admission in id order under the budget: a keeps 42 docs (4200 <= 4284),
    // b keeps all 10 (100 <= 428), c's single 99-token doc fits 385
    val kept = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept("a") === ((42L, 4200L)))
    assert(kept("b") === ((10L, 100L)))
    assert(kept("c") === ((1L, 99L)))
  }

  test("alpha=0.5 flattens dominance: the giant source's share shrinks") {
    // source "big" holds 99% of tokens but gets sqrt-proportional budget:
    // w_big/w_small = sqrt(99) ≈ 10, not 99
    val docs = (
      (0L until 990L).map(i => doc(i, "big", 10)) ++
        (990L until 1000L).map(i => doc(i, "small", 10))).toDF("doc_id", "source", "text")
    val out = Mixture.temperatureSampleSummary(
        docs, "doc_id", "source", "text", 1, 2).collect()
    val b = out.map(r => r.getString(0) -> r.getLong(3)).toMap
    val ratio = b("big").toDouble / b("small")
    assert(ratio > 8 && ratio < 12,
      s"sqrt flattening should give ~10x budget ratio for a 99x mass ratio, got $ratio")
  }

  test("admission is in id order and respects the budget boundary") {
    val docs = (0L until 20L).map(i => doc(i, "s", 50)).toDF("doc_id", "source", "text")
    // mass 1000, w=31, B=(1000*3)/10=300, budget=(31*300)/31=300 -> 6 docs
    val kept = Mixture.temperatureSample(docs, "doc_id", "source", "text", 3, 10)
      .orderBy("id").collect()
    assert(kept.map(_.getLong(0)).toSeq === (0L until 6L).toSeq,
      "exactly the 6 lowest ids fit the 300-token budget")
    assert(kept.last.getLong(3) === 300L, "cumulative sum hits the boundary exactly")
  }

  test("bucket-count independence (two-phase cumsum is an implementation detail)") {
    val docs = (
      (0L until 50L).map(i => doc(i, "x", 7)) ++
        (5000L until 5050L).map(i => doc(i, "y", 13))).toDF("doc_id", "source", "text")
    val r1 = Mixture.temperatureSample(docs, "doc_id", "source", "text", 3, 10, buckets = 1)
      .orderBy("id").collect().toSeq
    val r32 = Mixture.temperatureSample(docs, "doc_id", "source", "text", 3, 10, buckets = 32)
      .orderBy("id").collect().toSeq
    assert(r1 === r32)
  }

  test("empty input yields an empty frame with the output schema") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    val out = Mixture.temperatureSample(docs, "doc_id", "source", "text", 3, 10)
    assert(out.columns.toSeq ===
      Seq("id", "grp", "n_toks", "cum_toks", "budget_toks"))
    assert(out.count() === 0)
  }

  test("epochMix: full epochs + remainder admission, hand-computed") {
    // masses: a=100 (10 docs x 10), b=100. weights a=3, b=2, wsum=5.
    // B = (200*2) div 1 = 400. target_a = (3*400) div 5 = 240 -> full 2,
    // rem 40 -> first 4 docs +1. target_b = 160 -> full 1, rem 60 ->
    // first 6 docs +1.
    val docs = (
      (0L until 10L).map(i => doc(i, "a", 10)) ++
        (10L until 20L).map(i => doc(i, "b", 10))).toDF("doc_id", "source", "text")
    val out = Mixture.epochMix(docs, "doc_id", "source", "text",
        Seq("a" -> 3L, "b" -> 2L), 2, 1, maxEpochs = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.length === 20)
    assert(out.take(4).forall { case (_, fe, rep) => fe === 2L && rep === 3L })
    assert(out.slice(4, 10).forall { case (_, fe, rep) => fe === 2L && rep === 2L })
    assert(out.slice(10, 16).forall { case (_, fe, rep) => fe === 1L && rep === 2L })
    assert(out.slice(16, 20).forall { case (_, fe, rep) => fe === 1L && rep === 1L })
    // total replicated tokens never exceed the per-group targets
    assert(out.take(10).map(_._3 * 10).sum <= 240L)
    assert(out.drop(10).map(_._3 * 10).sum <= 160L)
  }

  test("epochMix caps at maxEpochs and zeroes the remainder at the cap") {
    // one tiny high-weight group: target far above maxEpochs * mass
    val docs = (
      (0L until 2L).map(i => doc(i, "tiny", 5)) ++
        (10L until 110L).map(i => doc(i, "big", 10))).toDF("doc_id", "source", "text")
    val out = Mixture.epochMix(docs, "doc_id", "source", "text",
        Seq("tiny" -> 99L, "big" -> 1L), 1, 1, maxEpochs = 3)
      .where(col("grp") === "tiny").collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    // every tiny doc: exactly 3 full epochs, NO remainder admission
    assert(out.forall(_ === ((3L, 3L))))
  }

  test("epochMix: unweighted groups are emitted with repeats 0") {
    val docs = (
      (0L until 5L).map(i => doc(i, "w", 10)) ++
        (10L until 15L).map(i => doc(i, "nw", 10))).toDF("doc_id", "source", "text")
    val out = Mixture.epochMix(docs, "doc_id", "source", "text",
        Seq("w" -> 1L), 1, 1, maxEpochs = 3)
    val nw = out.where(col("grp") === "nw")
      .select("repeats").as[Long].collect()
    assert(nw.length === 5 && nw.forall(_ === 0L),
      "unweighted group present with zero repeats")
    // the whole budget lands on the weighted group
    assert(out.where(col("grp") === "w").count() === 5)
  }

  test("epochMix bucket-count independence and empty input") {
    val docs = (
      (0L until 50L).map(i => doc(i, "x", 7)) ++
        (5000L until 5050L).map(i => doc(i, "y", 13))).toDF("doc_id", "source", "text")
    val w = Seq("x" -> 2L, "y" -> 1L)
    val r1 = Mixture.epochMix(docs, "doc_id", "source", "text", w, 3, 2, 4,
      buckets = 1).orderBy("id").collect().toSeq
    val r32 = Mixture.epochMix(docs, "doc_id", "source", "text", w, 3, 2, 4,
      buckets = 32).orderBy("id").collect().toSeq
    assert(r1 === r32)
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    val out = Mixture.epochMix(empty, "doc_id", "source", "text", w, 1, 1, 3)
    assert(out.columns.toSeq ===
      Seq("id", "grp", "n_toks", "full_epochs", "repeats"))
    assert(out.count() === 0)
  }
}
