package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev convenience: extra args restrict the dump to the named queries
    // (the driver always calls with exactly two args → full dump)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Written BEFORE the query loop so a mid-run crash can't lose it, and
    // under BOTH key spellings — the round-2 driver keyed its compare by
    // the output file name ("<name>.parquet"), so a bare-name-only map
    // made every lookup miss (all 63 queries came back "no_oracle").
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Explicit run-mode signal for check.py (ADVICE r19): the old >=90%-
    // present heuristic misclassified a full run where >10% of queries
    // crashed as a "subset run" and downgraded missing dumps to a note —
    // the gate got quieter as breakage got worse. Now the dump SAYS
    // whether it was full or subset, and check.py fails on ANY missing
    // dump in a full run. Written before the query loop so a mid-run
    // crash can't lose it.
    val manifest =
      if (only.isEmpty) """{"mode": "full"}"""
      else s"""{"mode": "subset", "requested": ${
        only.toSeq.sorted.map(q).mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_manifest.json"), manifest)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      // driver contract: result lands at outDir/<name>.parquet
      val dfOpt = try Some(fn(spark, sfDir)) catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        None
      }
      dfOpt.foreach { df =>
        // r17 lesson (q237/q244): the driver's hash discriminates on the
        // int128/decimal VALUE REPRESENTATION itself — a DECIMAL(38,0)
        // output column hash-mismatches even when multiset-equal to the
        // oracle. Refuse to dump one: every registered query ships
        // BIGINT/INT/DOUBLE/VARCHAR/DATE/TIMESTAMP/BOOLEAN/BINARY/ARRAY.
        // OUTSIDE the catch-all (ADVICE r18): a decimal-shipping query
        // must CRASH the dump — swallowed, it would merely vanish from
        // check.py's dump enumeration and the gate would grade one
        // query fewer instead of failing the contract violation.
        val dec = df.schema.fields.filter(
          _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
        require(dec.isEmpty, s"[$name] decimal-typed output column(s) " +
          s"${dec.map(_.name).mkString(",")} — the driver hash rejects " +
          "decimal representations (r17 q237/q244); ship BIGINT")
        try df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
