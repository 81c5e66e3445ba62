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
    Tables.region(spark, sfDir).groupBy("r_name").count().count()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (showPlan) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"[profile] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c")
      }
    }
    spark.stop()
  }
}
