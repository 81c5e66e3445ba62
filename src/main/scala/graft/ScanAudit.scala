package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev tool: per registered query, count parquet scans BY TABLE in the
  * executed plan — the repeated-scan smell detector behind the r16
  * drift-family staging sweep (a query whose plan reads the same table
  * N times re-derives a shared frame N times; at 100 TB that is N× the
  * I/O). Streaming/stateful and at-rest-artifact queries are skipped:
  * their cost model is not scan-shaped. Run:
  * `sbt "runMain graft.ScanAudit [sfDir]"`.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    // AQE OFF: finalized adaptive plans hide everything below an
    // exchange behind LEAF QueryStageExec nodes, so collect() never
    // reaches the scans — the static non-adaptive plan shows them all,
    // and no query needs to EXECUTE just to be counted (cuts inside
    // query builders still materialize their stages; that is the
    // point: a cut scan counts once)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val scans = plan.collect { case s: FileSourceScanExec =>
          // generic artifact dir names (counts, buckets, …) collide
          // across distinct at-rest paths — qualify them by parent so
          // two different states never masquerade as a repeated scan
          s.relation.location.rootPaths.headOption.map { p =>
            if (p.getName.endsWith(".parquet")) p.getName
            else Option(p.getParent).map(_.getName + "/").getOrElse("") +
              p.getName
          }.getOrElse("?")
        }
        val byTable = scans.groupBy(identity).view.mapValues(_.size)
          .toSeq.sortBy(-_._2)
        val flag = byTable.filter(_._2 >= 2)
        if (flag.nonEmpty)
          println(s"[scan-audit] $name: " + byTable.map {
            case (t, n) => s"$t x$n" }.mkString(", "))
      } catch { case e: Throwable =>
        println(s"[scan-audit] $name SKIP (${e.getClass.getSimpleName})")
      }
    }
    spark.stop()
  }
}
