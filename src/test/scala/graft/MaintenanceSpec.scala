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

  test("dynamic backfill overwrites only the touched partitions, in place") {
    val dir = Files.createTempDirectory("graft_bf").toString + "/t"
    val days = Seq((1L, "d1", "orig"), (2L, "d1", "orig"),
      (3L, "d2", "bad"), (4L, "d2", "bad"), (5L, "d3", "orig"))
      .toDF("id", "day", "payload")
    days.write.partitionBy("day").parquet(dir)
    def filesOf(day: String) =
      new java.io.File(s"$dir/day=$day").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    val (d1Before, d3Before) = (filesOf("d1").toSeq, filesOf("d3").toSeq)
    // corrected day-2 batch: different rows, one extra record
    val fix = Seq((30L, "d2", "fixed"), (31L, "d2", "fixed"),
      (32L, "d2", "fixed")).toDF("id", "day", "payload")
    val touched = Maintenance.backfillPartitions(fix, dir, Seq("day"))
    assert(touched.map(_.getString(0)).toSeq === Seq("d2"))
    val after = spark.read.parquet(dir)
    assert(after.filter($"day" === "d2").select("payload").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("fixed"))
    assert(after.filter($"day" === "d2").count() === 3)
    // untouched partitions: same rows AND the same physical files
    assert(after.filter($"day" =!= "d2").count() === 3)
    assert(filesOf("d1").toSeq === d1Before && filesOf("d3").toSeq === d3Before,
      "backfill must not rewrite sibling partitions' files")
  }

  test("static overwrite would drop the whole table — the mode matters") {
    val dir = Files.createTempDirectory("graft_bfs").toString + "/t"
    Seq((1L, "d1"), (2L, "d2")).toDF("id", "day")
      .write.partitionBy("day").parquet(dir)
    Seq((9L, "d2")).toDF("id", "day").write
      .option("partitionOverwriteMode", "static")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("day").parquet(dir)
    assert(spark.read.parquet(dir).count() === 1,
      "static mode truncates every partition first — the hazard dynamic avoids")
  }

  test("mergeSchema read surfaces evolved columns with NULL backfill") {
    val dir = Files.createTempDirectory("graft_ev").toString + "/t"
    Seq((1L, "a")).toDF("id", "text").write.parquet(s"$dir/day=d1")
    Seq((2L, "b", 0.9)).toDF("id", "text", "quality")
      .write.parquet(s"$dir/day=d2")
    val merged = Maintenance.readEvolved(spark, dir)
    assert(merged.columns.toSet === Set("id", "text", "quality", "day"))
    val rows = merged.select("id", "quality").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows === Map(1L -> None, 2L -> Some(0.9)),
      "pre-evolution rows read the new column as NULL")
    // the default first-footer read would MISS the evolved column half the
    // time (file order dependent) — mergeSchema is the correctness surface
  }
}
