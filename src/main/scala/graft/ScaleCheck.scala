package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Dev tool: replicate sf0.1 inputs 10x (shifted keys) into /tmp and time
  * the heavy operators, to observe scaling behavior beyond the driver's
  * largest SF. Run: sbt "runMain graft.ScaleCheck".
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts stays raw INT64
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft_sf1"
    val k = 10
    def replicate(name: String, keyCols: Seq[String], offset: Long): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val copies = (0 until k).map { i =>
        keyCols.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i * offset)))
      }
      copies.reduce(_ unionByName _).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
    }
    replicate("lineitem", Seq("l_orderkey"), 100000000L)
    replicate("orders", Seq("o_orderkey"), 100000000L)
    replicate("documents", Seq("doc_id"), 1000000L)
    replicate("embeddings", Seq("vec_id"), 1000000L)
    replicate("events", Seq("event_id", "user_id"), 10000000L)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    for (q <- Seq("q01_agg_pricing", "q04_factfact_join", "q30_dedup_exact",
        "q34_ngram_jaccard", "q35_minhash_lsh", "q36_simhash_pairs",
        "q37_embedding_topk", "q39_embedding_pairs", "q53_session_window",
        "q55_stream_stream_join", "q77_dup_clusters", "q78_tfidf",
        "q79_salted_join", "q80_asof_native", "q86_snapshot_diff",
        "q90_prep_pipeline", "q91_scd2_lookup")) {
      time(q)(SparkEntry.queries(q)(spark, dst).count())
    }
    // recall check at scale: the LSH path must reproduce the exact path
    val exact = SparkEntry.queries("q34_ngram_jaccard")(spark, dst).collect().toSet
    val lsh = SparkEntry.queries("q35_minhash_lsh")(spark, dst).collect().toSet
    println(s"== lsh==exact at 10x: ${exact == lsh} (${exact.size} pairs)")
    spark.stop()
  }
}
