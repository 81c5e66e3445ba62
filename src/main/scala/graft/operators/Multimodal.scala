package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batched per-partition "decode" (stubbed — no image/audio codecs
  * in this environment), deterministic byte-range frame sampling, and
  * content addressing. The Spark-side mechanics — schema, batching,
  * partition-parallel decode, codegen'd byte slicing — are real and tested;
  * only the codec call is a deterministic fake, clearly marked below.
  *
  * 100 TB posture: media bytes never shuffle — every op here is map-side;
  * decode parallelism is partition-parallelism (size input splits so one
  * batch of frames fits executor memory); downstream joins/aggs carry only
  * the extracted features + `content_hash`, never the blob.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata, the at-rest shape for a
    * media lake table (payload column would be parquet binary, metadata
    * queryable/partitionable).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a text column as a synthetic media payload (UTF-8 bytes) — gives
    * the binary pipeline a deterministic corpus in this codec-free env.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      (length(col(textCol)) % 640 + 32).cast("int").as("width"),
      (length(col(textCol)) % 480 + 32).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Deterministic frame sampling: k evenly-spaced fixed-length byte ranges
    * of the payload (the video-frame / audio-window analog). Pure column
    * ops — substring on binary is codegen'd; no data leaves the scan stage.
    */
  def sampleFrames(media: DataFrame, k: Int, frameBytes: Int): DataFrame = {
    val n = length(col("payload"))
    media
      .select(col("media_id"), col("payload"),
        posexplode(sequence(lit(0), lit(k - 1))).as(Seq("pos", "i")))
      .withColumn("offset",
        (col("i") * greatest(n - frameBytes, lit(0)) / lit(math.max(k - 1, 1))).cast("int") + 1)
      .select(col("media_id"), col("pos").cast("int").as("frame_idx"), col("offset"),
        substring(col("payload"), col("offset"), lit(frameBytes)).as("frame"))
  }

  /** Schema returned by the batched decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Batched per-partition feature extraction — the Scala analog of a
    * Pandas-UDF `mapInPandas` decode: one iterator per partition, codec
    * state amortized across the batch, rows streamed (never collected).
    *
    * STUB: `decodeBytes` is where a real codec (JPEG decode → CNN features,
    * PCM → fbank, …) would run; here it derives a deterministic 8-float
    * vector from byte statistics so tests are reproducible.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      // per-partition init would open the codec once here
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, bytes.length, decodeBytes(bytes))
      }
    }(enc)
  }

  /** Resize/downsample — the image-resize / audio-resample analog over the
    * opaque payload: a deterministic stride subsample of the byte stream
    * to at most `targetBytes`. Same mapPartitions batch shape as
    * [[extractFeatures]] (codec state amortized per partition, streamed).
    *
    * STUB: a real implementation decodes, resamples (bilinear / sinc), and
    * re-encodes; the Spark-side contract — schema, batching, deterministic
    * output size — is what this exercises.
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("payload", org.apache.spark.sql.types.BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val out =
          if (bytes.length <= targetBytes) bytes
          else {
            // ceil-stride keeps the result within targetBytes
            val stride = (bytes.length + targetBytes - 1) / targetBytes
            Array.tabulate((bytes.length + stride - 1) / stride)(i => bytes(i * stride))
          }
        Row(id, out.length, out)
      }
    }(enc)
  }

  /** STUB codec — deterministic byte-statistics "embedding", NOT a real
    * decoder. Replace with the actual media library call in production.
    */
  private def decodeBytes(bytes: Array[Byte]): Array[Float] = {
    val buckets = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      buckets((bytes(i) & 0xff) % 8) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 8) { buckets(j) /= bytes.length.toFloat; j += 1 }
    }
    buckets
  }
}
