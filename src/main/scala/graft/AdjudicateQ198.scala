package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Dev tool for the r16→r17 q198 adjudication (VERDICT r16 §next-round
  * #1): measures the three q198 plan shapes that existed this round —
  * the r15 type-table anti-join, the rejected r16 staging cut, and the
  * shipped r16 join-free presence fold — under EXACTLY the Bench
  * session (same master/shuffle width/warmup/min-of-2), one shape per
  * fresh JVM so session position can't contaminate the comparison.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.AdjudicateQ198 <fold|antijoin|cut>"
  */
object AdjudicateQ198 {

  private def bigramsOf(t: org.apache.spark.sql.Column) =
    when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** The shipped r16 shape: one explode, presence bits folded in a
    * combinable max-agg, |types|-sized rollup, zero joins. */
  def fold(s: SparkSession, d: String): DataFrame = {
    val bigrams = bigramsOf(TextFns.tokens(col("text")))
    val nd = docs(s, d).agg(count(lit(1)).as("nd"))
    docs(s, d).crossJoin(broadcast(nd))
      .select(col("source"), (col("doc_id") * 2 < col("nd")).as("fh"),
        explode(bigrams).as("bg"))
      .groupBy("source", "bg")
      .agg(max(col("fh")).as("has_then"), max(!col("fh")).as("has_now"))
      .groupBy("source")
      .agg(sum(when(col("has_now"), 1L).otherwise(0L)).as("n_now_types"),
        sum(when(col("has_now") && !col("has_then"), 1L).otherwise(0L))
          .as("n_novel_types"))
      .filter(col("n_now_types") > 0)
      .orderBy("source")
  }

  /** The r15 shape: distinct (source, half, bigram) type table read
    * three times (both anti-join sides + the now totals). */
  def antijoin(s: SparkSession, d: String): DataFrame = {
    val bigrams = bigramsOf(TextFns.tokens(col("text")))
    val nd = docs(s, d).agg(count(lit(1)).as("nd"))
    val bg = docs(s, d).crossJoin(broadcast(nd))
      .select(col("source"), (col("doc_id") * 2 < col("nd")).as("fh"),
        explode(bigrams).as("bg"))
      .distinct()
    val thenB = bg.filter(col("fh")).select(col("source"), col("bg"))
    val nowB = bg.filter(!col("fh")).select(col("source"), col("bg"))
    val novel = nowB.join(thenB, Seq("source", "bg"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_novel_types"))
    nowB.groupBy("source").agg(count(lit(1)).as("n_now_types"))
      .join(novel, Seq("source"), "left")
      .select(col("source"), col("n_now_types"),
        coalesce(col("n_novel_types"), lit(0L)).as("n_novel_types"))
      .orderBy("source")
  }

  /** The rejected mid-r16 shape: the same anti-join fed by a staged
    * (Checkpoints.cut) type table so the explode runs once. */
  def cutShape(s: SparkSession, d: String): DataFrame = {
    val bigrams = bigramsOf(TextFns.tokens(col("text")))
    val nd = docs(s, d).agg(count(lit(1)).as("nd"))
    val bg = graft.operators.Checkpoints.cut(
      docs(s, d).crossJoin(broadcast(nd))
        .select(col("source"), (col("doc_id") * 2 < col("nd")).as("fh"),
          explode(bigrams).as("bg"))
        .distinct())
    val thenB = bg.filter(col("fh")).select(col("source"), col("bg"))
    val nowB = bg.filter(!col("fh")).select(col("source"), col("bg"))
    val novel = nowB.join(thenB, Seq("source", "bg"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_novel_types"))
    graft.operators.Checkpoints.sealAndRelease(
      nowB.groupBy("source").agg(count(lit(1)).as("n_now_types"))
        .join(novel, Seq("source"), "left")
        .select(col("source"), col("n_now_types"),
          coalesce(col("n_novel_types"), lit(0L)).as("n_novel_types"))
        .orderBy("source"),
      bg)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench's exact warmup (codegen + parquet + shuffle JIT, Jira corpus)
    Tables.region(spark, sfDir).groupBy("r_name").count().count()
    spark.range(1000000).selectExpr("sum(id)").count()
    graft.etl.JiraCorpus.issues(spark, sfDir).count()
    val shapes = Map[String, (SparkSession, String) => DataFrame](
      "fold" -> fold, "antijoin" -> antijoin, "cut" -> cutShape)
    for (name <- args) {
      val fn = shapes.getOrElse(name,
        sys.error(s"unknown shape '$name' (fold|antijoin|cut)"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"== q198[$name] rows=${times.head._2} " +
        f"times=${times.map(t => f"${t._1}%.2f").mkString(",")} " +
        f"min=${times.map(_._1).min}%.2f")
    }
    spark.stop()
  }
}
