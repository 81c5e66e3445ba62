package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness (not part of the driver contract): time named
  * queries warm (2 runs each) at a given SF dir, optionally print the
  * formatted plan. Usage: runMain graft.Profile <sfDir> <q1,q2,...> [plan]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val showPlan = args.length > 2 && args(2) == "plan"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job breakdown: where does a multi-job query spend its time?
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val jobSites =
          new java.util.concurrent.ConcurrentHashMap[Int, String]
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStarts.put(js.jobId, System.nanoTime())
          jobSites.put(js.jobId,
            Option(js.properties).map(p =>
              Option(p.getProperty("callSite.short")).getOrElse("?"))
              .getOrElse("?"))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStarts.remove(je.jobId)
          val site = Option(jobSites.remove(je.jobId)).getOrElse("?")
          if (t0 != 0L)
            println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
      })
    Tables.region(spark, sfDir).groupBy("r_name").count().count()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (showPlan) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        println(s"[profile] $n run$i begin")
        val c = fn(spark, sfDir).count()
        println(f"[profile] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c")
      }
    }
    spark.stop()
  }
}
