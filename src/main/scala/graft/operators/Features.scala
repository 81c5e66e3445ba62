package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time-correct feature aggregation — the feature-store primitive
  * (Feast/Tecton's "point-in-time join"): for every LABEL row, aggregate a
  * separate EVENT stream over the lookback window (label_ts − lookback,
  * label_ts], so a training example can only ever see features computed
  * from data available at its own timestamp. This is the temporal
  * leakage-safety rule — the time-axis sibling of q150's near-dup-safe
  * split (content axis) — and the reason naive "join then filter by date"
  * feature pipelines leak: an as-of join ([[AsOfJoin]]) picks ONE prior
  * row, while training features are usually WINDOW AGGREGATES of many.
  *
  * Scale posture: never an inequality join. Both sides bucket their epoch
  * time by the lookback width; a label in bucket b can only match events
  * in buckets {b−1, b}, so the LABEL side (the small side — training
  * examples, not traffic) explodes ×2 and the join is a plain (key,
  * bucket) equi-join with the exact window predicate as a post-filter —
  * q21's band-join construction pointed at the feature-store shape. The
  * aggregation groups by label identity with map-side combine, and labels
  * with no events in window come back through a LEFT join (counts 0, sums
  * NULL — absence is information).
  *
  * Output: one row per label — (labelIdCol, keyCol, label_ts) ++ aggs.
  */
object Features {

  def pointInTime(labels: DataFrame, events: DataFrame, keyCol: String,
      labelIdCol: String, labelTsCol: String, eventTsCol: String,
      lookbackSec: Long, aggs: Seq[Column]): DataFrame = {
    require(lookbackSec > 0, "need a positive lookback window")
    require(aggs.nonEmpty, "need at least one feature aggregate")
    val w = lookbackSec * 1000000L
    val l = labels.select(col(keyCol).as("k"),
        col(labelIdCol).as("label_id"), col(labelTsCol).as("label_ts"),
        unix_micros(col(labelTsCol)).as("lus"))
      .withColumn("bkt",
        explode(array(expr("lus div " + w), expr("lus div " + w) - 1)))
    val e = events
      .withColumn("eus", unix_micros(col(eventTsCol)))
      .withColumn("k", col(keyCol))
      .withColumn("bkt", expr("eus div " + w))
    val feat = l.join(e.drop(eventTsCol), Seq("k", "bkt"))
      .filter(col("eus") <= col("lus") && col("eus") > col("lus") - w)
      .groupBy(col("label_id"), col("k"), col("label_ts"))
      .agg(aggs.head, aggs.tail: _*)
    labels.select(col(labelIdCol).as("label_id"), col(keyCol).as("k"),
        col(labelTsCol).as("label_ts"))
      .join(feat, Seq("label_id", "k", "label_ts"), "left")
      .withColumnRenamed("k", keyCol)
      .withColumnRenamed("label_id", labelIdCol)
  }
}
