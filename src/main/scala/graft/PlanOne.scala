package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for the named queries into
  * per-query files — the before/after plan evidence for optimization
  * rounds. Run:
  *   sbt "runMain graft.PlanOne <sfDir> <outDir> <suffix> <query> [query...]"
  * writes `<outDir>/<query>_<suffix>.txt` for each query.
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qs @ _*) = args.toSeq.toArray
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    qs.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
