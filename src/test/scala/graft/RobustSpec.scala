package graft

import graft.operators.Robust

/** Hampel / 3-MAD robust outlier semantics: exact lower medians, integer
  * flags, degenerate MAD=0 groups, agreement with a driver-side reference.
  */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def ref(rows: Seq[(Long, String, Long)],
      k: Int): Map[Long, (Long, Long, Boolean)] =
    rows.groupBy(_._2).flatMap { case (_, xs) =>
      def lowerMedian(vs: Seq[Long]): Long = vs.sorted.apply((vs.size - 1) / 2)
      val med = lowerMedian(xs.map(_._3))
      val mad = lowerMedian(xs.map(t => math.abs(t._3 - med)))
      xs.map(t => t._1 -> ((med, mad, math.abs(t._3 - med) > k * mad)))
    }

  test("hand-checked group: median, MAD and flags are the Hampel values") {
    // values 10,12,14,16,100: lower median 14, |v-14| = 4,2,0,2,86,
    // MAD = lower median of (0,2,2,4,86) = 2; only 100 exceeds 14 ± 6
    val rows = Seq((1L, "a", 10L), (2L, "a", 12L), (3L, "a", 14L),
      (4L, "a", 16L), (5L, "a", 100L))
    val out = Robust.madOutliers(rows.toDF("id", "g", "v"), "id", "g", "v", 3)
      .select("id", "med", "mad", "outlier")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    out.foreach { case (_, med, mad, _) => assert(med === 14L && mad === 2L) }
    assert(out.map(t => t._1 -> t._4).toMap ===
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> true))
  }

  test("MAD = 0 degenerate group: every off-majority row is flagged") {
    val rows = Seq((1L, "b", 7L), (2L, "b", 7L), (3L, "b", 7L),
      (4L, "b", 8L), (5L, "b", 6L))
    val out = Robust.madOutliers(rows.toDF("id", "g", "v"), "id", "g", "v", 3)
      .select("id", "mad", "outlier").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(out.forall(_._2 == 0L))
    assert(out.map(_._3).toSeq === Seq(false, false, false, true, true))
  }

  test("matches the driver-side reference across skewed multi-group input") {
    // group sizes 1, 2, and 200 (skewed), values with planted spikes
    val rows = (1L to 200L).map(i => (i, "big", 50L + i % 11)) ++
      Seq((500L, "big", 100000L), (501L, "one", 42L),
        (600L, "two", 5L), (601L, "two", 9L))
    val out = Robust.madOutliers(rows.toDF("id", "g", "v"), "id", "g", "v", 3)
      .select("id", "med", "mad", "outlier")
      .as[(Long, Long, Long, Boolean)].collect()
    val expect = ref(rows, 3)
    assert(out.length === rows.size)
    out.foreach { case (id, med, mad, o) =>
      assert((med, mad, o) === expect(id), s"row $id") }
  }

  test("empty input returns an empty frame with the output schema") {
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "g", "v")
    val out = Robust.madOutliers(empty, "id", "g", "v", 3)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("id", "grp", "v", "med", "mad", "outlier"))
  }

  test("trimmedSumPerGroup == the naive sorted-slice sum across skewed groups") {
    // one big skewed group, one tiny group the trim empties, one
    // exact-boundary group — the rank-arithmetic edge set
    val rows = (1L to 100L).map(i => (i, "big", if (i > 95) 100000L else i)) ++
      Seq((200L, "tiny", 7L)) ++
      (300L until 340L).map(i => (i, "forty", i % 11))
    val got = Robust.trimmedSumPerGroup(rows.toDF("id", "grp", "v"),
        "id", "grp", "v", 1L, 20L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    for ((g, xs) <- rows.groupBy(_._2)) {
      val sorted = xs.sortBy(t => (t._3, t._1)).map(_._3)
      val k = (sorted.size / 20).toInt
      val kept = sorted.slice(k, sorted.size - k)
      val (nTot, nKept, sumKept) = got(g)
      assert(nTot === sorted.size.toLong, s"group $g")
      assert(nKept === kept.size.toLong, s"group $g")
      assert(sumKept === (if (kept.isEmpty) None else Some(kept.sum)),
        s"group $g")
    }
    // the big group's blob must be fully trimmed: mean without it
    val bigKept = got("big")._3.get.toDouble / got("big")._2
    assert(bigKept < 100, s"trimmed mean must shed the 100000 blob: $bigKept")
    // invalid fractions rejected
    intercept[IllegalArgumentException] {
      Robust.trimmedSumPerGroup(rows.toDF("id", "grp", "v"),
        "id", "grp", "v", 1L, 2L)
    }
  }
}
