package graft

import java.nio.file.Files

import graft.sources.Maintenance

/** Versioned snapshots (time travel) and small-file compaction on plain
  * parquet directories.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("versioned writes publish monotonically; readers pin or take latest") {
    val dir = Files.createTempDirectory("graft_ver").toString + "/t"
    val v1 = Maintenance.writeVersion((1L to 10L).toDF("id"), dir)
    val v2 = Maintenance.writeVersion((1L to 25L).toDF("id"), dir)
    assert((v1, v2) === (1L, 2L))
    assert(Maintenance.readVersion(spark, dir).count() === 25)
    assert(Maintenance.readVersion(spark, dir, Some(1L)).count() === 10,
      "old snapshot stays readable after new writes")
    assert(Maintenance.latestVersion(dir) === Some(2L))
    intercept[IllegalArgumentException] {
      Maintenance.readVersion(spark, dir, Some(99L))
    }
  }

  test("compaction merges small files into a new version, same rows") {
    val dir = Files.createTempDirectory("graft_cmp").toString + "/t"
    // 16 tiny files
    Maintenance.writeVersion(
      spark.range(10000).repartition(16).toDF("id"), dir)
    val (v, before, after) = Maintenance.compact(spark, dir, targetBytes = 1L << 20)
    assert(before === 16)
    assert(after < before, s"expected fewer files, got $after")
    assert(Maintenance.readVersion(spark, dir, Some(v)).count() === 10000)
    // the pre-compaction snapshot is untouched
    assert(Maintenance.readVersion(spark, dir, Some(1L)).count() === 10000)
  }
}
