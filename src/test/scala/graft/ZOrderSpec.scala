package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Morton interleave correctness and the layout property that matters:
  * z-ordered files cover compact rectangles of BOTH dimensions, where a
  * single-column sort leaves the other dimension unpruned.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    (0 until 16).foreach { i =>
      z |= ((a >> i) & 1).toLong << (2 * i)
      z |= ((b >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("interleave matches the bitwise reference") {
    val rng = new scala.util.Random(3)
    val cases = Seq((0, 0), (65535, 65535), (1, 0), (0, 1)) ++
      (1 to 40).map(_ => (rng.nextInt(65536), rng.nextInt(65536)))
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got === cases.map { case (a, b) => mortonRef(a, b) })
  }

  test("z-order layout bounds BOTH dimensions per file; linear sort only one") {
    // 64x64 grid scaled to 16-bit domain
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a * 1024, b * 1024))
      .toDF("a", "b")

    def perFileSpread(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("a") - min("a"), max("b") - min("b")).head
        (r.getInt(0).toDouble, r.getInt(1).toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }

    val zDir = Files.createTempDirectory("graft_z").toString + "/z"
    ZOrder.layout(grid, col("a"), col("b"), 16).write.parquet(zDir)
    val aDir = Files.createTempDirectory("graft_z").toString + "/a"
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(aDir)

    val (zA, zB) = perFileSpread(zDir)
    val (lA, lB) = perFileSpread(aDir)
    val full = 63 * 1024.0
    assert(lB > 0.9 * full, "control: a-sorted files span nearly all of b")
    assert(zA < full / 2 && zB < full / 2,
      s"z-order must bound both dims (a-spread=$zA, b-spread=$zB)")
    assert(zB < lB / 2, "z-order prunes b where the linear sort cannot")
    assert(spark.read.parquet(zDir).count() === 64 * 64)
  }

  test("q253 buckets are exact 16384-wide quadrants of BOTH dimensions") {
    // bucket = top 4 Morton bits = (y₁₅ x₁₅ y₁₄ x₁₄): each bucket fixes
    // both keys' top 2 bits, so its extent can never exceed the
    // 16384×16384 quadrant — the file-skipping guarantee the registered
    // query reports as evidence.
    val rows = SparkEntry.queries("q253_zorder_extents")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, n) = (r.getLong(0), r.getLong(1))
      assert(b >= 0 && b < 16 && n > 0)
      assert(r.getLong(3) - r.getLong(2) < 16384L,
        s"bucket $b x-extent escapes its quadrant")
      assert(r.getLong(5) - r.getLong(4) < 16384L,
        s"bucket $b y-extent escapes its quadrant")
      assert(r.getLong(6) <= 16384L * 16384L)
    }
  }
}
