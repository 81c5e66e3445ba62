package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.TextFns

/** Text primitive properties. ScalaCheck is driven directly (no
  * scalatestplus bridge in the offline cache): a Prop must pass its default
  * 100 generated cases.
  */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  test("shingles: n-token doc yields n-2 trigrams (pre-distinct); short docs yield none") {
    val df = Seq("one two three four five", "one two").toDF("text")
      .select(TextFns.shingles(TextFns.tokens(col("text")), 3).as("sh"))
    val out = df.select(size(col("sh"))).as[Int].collect().toSeq
    assert(out === Seq(3, 0))
  }

  test("hash32 is within unsigned 32-bit range and stable") {
    val df = Seq("alpha", "beta", "alpha").toDF("s")
      .select(TextFns.hash32(col("s")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs.forall(h => h >= 0L && h <= 0xffffffffL))
    assert(hs(0) === hs(2))
  }

  test("jaccard: identical arrays → 1, disjoint → 0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b"))).toDF("x", "y")
      .select(TextFns.jaccard(col("x"), col("y")).as("j"))
    assert(df.as[Double].collect().toSeq === Seq(1.0, 0.0))
  }

  test("property: equal texts give equal minhash signatures, every slot in [0, P)") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val textGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    check(Prop.forAll(textGen) { text =>
      val df = Seq(text, text).toDF("text")
        .select(TextFns.minHashSignature(
          TextFns.shingles(TextFns.tokens(col("text")), 3), 16).as("sig"))
      val sigs = df.as[Seq[Long]].collect()
      sigs(0) == sigs(1) && sigs(0).forall(v => v >= 0 && v < TextFns.MinHashP)
    })
  }

  test("property: '//' array join/split round-trip (P3 semantics)") {
    val gen = Gen.listOf(Gen.posNum[Int])
    check(Prop.forAll(gen) { xs =>
      val df = Seq(Tuple1(xs.map(_.toString))).toDF("arr")
        .select(array_join(col("arr"), "//").as("s"))
      val joined = df.as[String].head()
      val back = if (joined.isEmpty) Nil else joined.split("//").toList
      back == xs.map(_.toString)
    })
  }

  test("property: upsert idempotence on generated batches") {
    val rowGen = Gen.listOfN(10, Gen.zip(Gen.choose(1, 5), Gen.alphaStr))
    check(Prop.forAll(rowGen, rowGen) { (baseRows, updRows) =>
      val base = baseRows.toDF("k", "v")
      val upd = updRows.distinctBy(_._1).toDF("k", "v")
      val once = graft.operators.Upsert(base, upd, Seq("k"))
        .orderBy("k", "v").collect().toSeq
      val twice = graft.operators.Upsert(
        graft.operators.Upsert(base, upd, Seq("k")), upd, Seq("k"))
        .orderBy("k", "v").collect().toSeq
      once == twice
    })
  }

  test("property: upsert result has unique keys and contains every update row") {
    val rowGen = Gen.listOfN(12, Gen.zip(Gen.choose(1, 6), Gen.alphaStr))
    check(Prop.forAll(rowGen, rowGen) { (baseRows, updRows) =>
      val base = baseRows.toDF("k", "v")
      val upd = updRows.distinctBy(_._1).toDF("k", "v")
      val out = graft.operators.Upsert(base, upd, Seq("k"))
        .as[(Int, String)].collect().toSeq
      val uniqueKeys = out.map(_._1).distinct.size == out.size
      val updatesWin = updRows.distinctBy(_._1).forall(out.contains)
      uniqueKeys && updatesWin
    })
  }

  test("property: flatten(nest(x)) == x on generated flat rows (SURVEY §5.3)") {
    import graft.etl.Flatten
    import graft.etl.Flatten.{Leaf, Obj}
    val cell = Gen.alphaNumStr.map(_.take(8))
    val rowGen = Gen.listOfN(5, Gen.zip(cell, Gen.zip(cell, cell)))
    check(Prop.forAll(rowGen) { rows =>
      whenever(rows.nonEmpty) {
        // nest: (a, (b, c)) -> {top: a, fields: {inner: {b, c}}}
        val nested = rows.map { case (a, (b, c)) => (a, b, c) }
          .toDF("a", "b", "c")
          .select(col("a"),
            struct(struct(col("b"), col("c")).as("inner")).as("fields"))
        val flat = Flatten(nested, Obj(
          "a" -> Leaf("a"),
          "fields" -> Obj("inner" -> Obj("b" -> Leaf("b"), "c" -> Leaf("c")))))
        val got = flat.select(col("a"), col("fields_inner_b"), col("fields_inner_c"))
          .as[(String, String, String)].collect().toSeq.sorted
        got == rows.map { case (a, (b, c)) => (a, b, c) }.sorted
      }
    })
  }

  private def whenever(b: Boolean)(body: => Boolean): Boolean = !b || body
}
