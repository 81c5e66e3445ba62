package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual named queries (3 runs each) against a data
  * dir. Run: sbt "runMain graft.TimeOne <sfDir> <query> [query...]".
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = args.head
    for (q <- args.tail) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"== $q rows=${ts.head._2} times=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
