package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet+JSON: ORC (columnar-
  * alternative, built-in) and CSV (schema'd, header) round-trip
  * the same relational data — the format layer is orthogonal to the engine.
  */
class FormatsSpec extends SparkSpec {

  test("JSONL export: size-bounded shards, manifest completeness, lossless round-trip") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")
    val n = docs.count()
    val (shards, total) = graft.sources.TableSink.exportJsonl(docs, dir, 100)
    assert(total === n, "manifest total must equal the source row count")
    assert(shards >= n / 100, s"500 rows at <=100/shard needs >= 5 shards, got $shards")
    // every shard honors the bound (the manifest's own max confirms it)
    val m = spark.read.json(s"$dir/_MANIFEST").head()
    assert(m.getAs[Long]("max_shard_rows") <= 100)
    // underscore-prefixed manifest is invisible to the reader; data round-trips
    val back = spark.read.json(dir)
    assert(back.count() === n)
    assert(back.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq ===
      docs.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq)
  }

  test("compressed JSONL export: gzip shards, manifest codec + uncompressed bytes reconcile") {
    val dir = Files.createTempDirectory("graft_jsonl_gz").toString + "/docs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")
    val n = docs.count()
    val (shards, total) = graft.sources.TableSink.exportJsonl(docs, dir, 100,
      compression = "gzip")
    assert(total === n)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".gz"))
    assert(files.length.toLong === shards, "every shard must be a .gz file")
    val m = spark.read.json(s"$dir/_MANIFEST").head()
    assert(m.getAs[String]("codec") === "gzip")
    assert(m.getAs[Long]("uncompressed_bytes") > files.map(_.length()).sum,
      "uncompressed manifest bytes must exceed the compressed on-disk bytes")
    // per-shard entries reconcile with the summary and carry the codec
    val entries = spark.read.json(s"$dir/_MANIFEST")
      .select(explode(col("shards")).as("s"))
      .select("s.file", "s.codec", "s.rows", "s.uncompressed_bytes")
      .collect()
    assert(entries.length.toLong === shards)
    assert(entries.map(_.getAs[Long]("rows")).sum === total)
    assert(entries.forall(_.getAs[String]("codec") === "gzip"))
    // compressed shards still round-trip transparently
    val back = spark.read.json(dir)
    assert(back.count() === n)
  }

  test("exportJsonl on an empty frame writes an explicit zero-row manifest") {
    val dir = Files.createTempDirectory("graft_jsonl_empty").toString + "/docs"
    val empty = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text").filter(lit(false))
    val (shards, total) = graft.sources.TableSink.exportJsonl(empty, dir, 100)
    assert(shards === 0L && total === 0L)
    val m = spark.read.json(s"$dir/_MANIFEST").head()
    assert(m.getAs[Long]("n_shards") === 0L)
    assert(m.getAs[Long]("total_rows") === 0L)
    assert(m.getAs[Long]("uncompressed_bytes") === 0L)
  }

  test("gzipped JSONL ingests transparently but is UNSPLITTABLE - one partition per file") {
    // web-scraped corpora arrive as .jsonl.gz; Spark reads the codec
    // transparently, but gzip cannot split: each file is one task however
    // large. The 100 TB consequence: shard the COMPRESSED corpus at write
    // time (many ~100 MB-1 GB files), or pay single-task scans per file.
    val dir = Files.createTempDirectory("graft_gz").toString
    val f = new java.io.File(dir, "part-0.json.gz")
    val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
    (0 until 1000).foreach(i => out.write(s"""{"id": $i, "t": "doc $i"}\n""".getBytes("UTF-8")))
    out.close()
    val df = spark.read.json(dir + "/part-0.json.gz")
    assert(df.count() === 1000, "gzip codec must decode transparently")
    assert(df.rdd.getNumPartitions === 1,
      "a gzip file is one partition - the unsplittability every ingest plan must budget for")
    // the same data as N plain files scans with N-way parallelism
    // the same data as plain files scans in parallel (Spark bin-packs
    // tiny files by size, so "parallel" here means more than gzip's 1)
    val plainDir = Files.createTempDirectory("graft_plain").toString + "/out"
    df.repartition(4).write.json(plainDir)
    assert(spark.read.json(plainDir).rdd.getNumPartitions > 1)
  }

  test("_metadata hidden columns expose file lineage without schema pollution") {
    // per-file provenance (which shard did this row come from, when was it
    // written) is free at scan time via the reserved _metadata struct —
    // the lineage/debugging hook a 100 TB table audit reaches for first,
    // with zero storage cost and zero presence in the declared schema
    val dir = Files.createTempDirectory("graft_meta").toString + "/t"
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang").repartition(3).write.parquet(dir)
    val df = spark.read.parquet(dir)
    assert(!df.columns.contains("_metadata"), "hidden unless selected")
    val withMeta = df.select(col("doc_id"),
      col("_metadata.file_path").as("fp"),
      col("_metadata.file_size").as("fs"))
    val files = withMeta.select("fp").distinct().collect().map(_.getString(0))
    assert(files.length === 3, "one lineage path per written file")
    assert(files.forall(f => f.contains(dir) && f.contains("part-")),
      s"paths must point at the scanned files under $dir: ${files.toSeq}")
    assert(withMeta.filter(col("fs") <= 0).count() === 0, "real file sizes")
  }

  test("orc round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/nation"
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    nation.write.format("orc").save(dir)
    val back = spark.read.format("orc").load(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("csv round-trip with explicit schema and header") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/region"
    val region = Tables.region(spark, "/root/testdata/sf0.001")
    region.write.option("header", "true").csv(dir)
    val back = spark.read
      .schema(region.schema)
      .option("header", "true")
      .csv(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ===
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("partitioned orc supports partition pruning like parquet") {
    val dir = Files.createTempDirectory("graft_orc2").toString + "/orders"
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    orders.write.format("orc").partitionBy("o_orderstatus").save(dir)
    val q = spark.read.format("orc").load(dir)
      .filter(col("o_orderstatus") === "F")
    assert(q.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(q.count() === orders.filter(col("o_orderstatus") === "F").count())
  }

  test("schema evolution: mergeSchema unifies old and new parquet batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    // day 1: v1 schema; day 2 adds a column (the reference's MAPPING gains
    // a field — old pages keep working)
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "name", "score", "batch"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows === Map(1L -> None, 2L -> Some(9.5)),
      "old rows surface the new column as null")
  }
}
