package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev experiment harness (not part of the driver contract). */
object Scratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.EventStream

    // warm
    Tables.region(spark, d).groupBy("r_name").count().count()
    spark.range(1000000).selectExpr("sum(id)").count()

    def joinQ(): Long = {
      val views = EventStream.readEvents(spark, d)
        .filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"))
        .withWatermark("view_ts", "1 hour")
      val purchases = EventStream.readEvents(spark, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
          col("value"))
        .withWatermark("purchase_ts", "1 hour")
      val joined = views.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      EventStream.runToTable(spark, joined, "append").count()
    }

    def aggQ(): Long = {
      val e = EventStream.readEvents(spark, d)
      val agg = e.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      EventStream.runToTable(spark, agg, "complete").count()
    }

    // floor: stream read, no stateful op, append passthrough
    def passQ(): Long = {
      val e = EventStream.readEvents(spark, d)
        .select(col("user_id"), col("ts"))
      EventStream.runToTable(spark, e, "append").count()
    }

    t("pass 1")(passQ()); t("pass 2")(passQ())
    t("agg 1")(aggQ()); t("agg 2")(aggQ())
    t("join 1")(joinQ()); t("join 2")(joinQ())

    // fewer state partitions
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    t("join sp=2 a")(joinQ()); t("join sp=2 b")(joinQ())
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    // RocksDB
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    t("join rocksdb a")(joinQ()); t("join rocksdb b")(joinQ())
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    spark.stop()
  }
}
