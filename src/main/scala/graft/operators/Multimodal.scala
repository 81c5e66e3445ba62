package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batched per-partition decode, deterministic byte-range frame
  * sampling, and content addressing. The raster path is a REAL codec —
  * [[PpmCodec]] parses/encodes binary PPM (P6) with exact pixel arithmetic
  * and nearest-neighbor resize; no image libraries exist in this
  * environment, so PPM (uncompressed, self-contained) is the honest decode
  * target, and [[extractFeatures]]/[[resize]] remain the byte-generic
  * plumbing for formats whose codecs would be external libraries.
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
    * For raster payloads the REAL decoder is [[decodePpm]]/[[ppmStats]];
    * this generic path derives a deterministic 8-float byte-histogram
    * feature, the fallback for formats whose codecs (JPEG, PCM, …) are
    * external libraries absent here.
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
    * For raster payloads the REAL resize is [[resizePpm]] (decode →
    * nearest-neighbor → re-encode); this byte-stride path remains for
    * opaque formats.
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

  /** Deterministic synthetic raster corpus: one `w`×`h` P6 image per input
    * row, channel (x, y, c) = hash32(id:x:y:c) mod 256 where hash32 is the
    * oracle-portable md5-prefix hash (first 8 hex chars as an integer) — so
    * a SQL engine can recompute any pixel without the codec. mapPartitions
    * with the digest instance amortized per partition, the same batch shape
    * a real encoder uses.
    */
  def syntheticPpm(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hash32(s: String): Long = {
        md.reset()
        val d = md.digest(s.getBytes("UTF-8"))
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      it.map { r =>
        val id = r.getLong(0)
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              px((y * w + x) * 3 + c) = (hash32(s"$id:$x:$y:$c") % 256).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        Row(id, "image/ppm", PpmCodec.encode(PpmCodec.Image(w, h, px)), w, h)
      }
    }(enc)
  }

  /** Deterministic synthetic audio corpus: one mono PCM16 RIFF/WAVE payload
    * per input row, sample(i) = hash32(id:i) mod 65536 − 32768 where hash32
    * is the oracle-portable md5-prefix hash — so a SQL engine can recompute
    * any sample without the codec, mirroring [[syntheticPpm]]'s design.
    * mapPartitions with the digest amortized per partition.
    */
  def syntheticWav(df: DataFrame, idCol: String, nSamples: Int,
      sampleRate: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType),
      StructField("duration_ms", LongType))))
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hash32(s: String): Long = {
        md.reset()
        val d = md.digest(s.getBytes("UTF-8"))
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      it.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(nSamples)(i =>
          (hash32(s"$id:$i") % 65536 - 32768).toShort)
        Row(id, "audio/wav",
          WavCodec.encode(WavCodec.Audio(sampleRate, samples)),
          nSamples.toLong * 1000 / sampleRate)
      }
    }(enc)
  }

  /** Real audio resample: decode → nearest-neighbor to `dstRate` →
    * re-encode RIFF/WAVE — the audio mirror of [[resizePpm]]. Map-side;
    * samples never shuffle.
    */
  def wavResample(media: DataFrame, dstRate: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("payload", BinaryType),
      StructField("duration_ms", LongType))))
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val out = WavCodec.resampleNearest(
          WavCodec.decode(r.getAs[Array[Byte]](1)), dstRate)
        Row(r.getLong(0), "audio/wav", WavCodec.encode(out),
          out.samples.length.toLong * 1000 / dstRate)
      }
    }(enc)
  }

  /** Real audio decode + frame features: parse each RIFF/WAVE payload
    * (header + chunk walk in [[WavCodec.decode]]), then integer L1 energy
    * and zero-crossing count per `frameLen`-sample frame — integer-exact in
    * any order, hence oracle-safe. Map-side; samples never shuffle.
    */
  def wavFrameFeatures(media: DataFrame, frameLen: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("l1", LongType),
      StructField("zc", LongType))))
    media.select("media_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val audio = WavCodec.decode(r.getAs[Array[Byte]](1))
        WavCodec.frameFeatures(audio, frameLen).map {
          case (f, l1, zc) => Row(id, f, l1, zc)
        }
      }
    }(enc)
  }

  /** Real decode: parse each P6 payload into (dims, raw pixel bytes).
    * Malformed payloads throw — compose with a quarantine filter upstream
    * when the lake is untrusted.
    */
  def decodePpm(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", BinaryType))))
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val img = PpmCodec.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), img.width, img.height, img.pixels)
      }
    }(enc)
  }

  /** Real raster resize: decode → nearest-neighbor to (dstW, dstH) →
    * re-encode P6. Map-side; pixels never shuffle.
    */
  def resizePpm(media: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val out = PpmCodec.resizeNearest(
          PpmCodec.decode(r.getAs[Array[Byte]](1)), dstW, dstH)
        Row(r.getLong(0), "image/ppm", PpmCodec.encode(out), dstW, dstH)
      }
    }(enc)
  }

  /** Per-image integer raster stats over decoded pixels: dims + channel-sum
    * "luminance mass" (integer-exact in any order ⇒ oracle-safe).
    */
  def ppmStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("w", IntegerType),
      StructField("h", IntegerType),
      StructField("lum", LongType))))
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val img = PpmCodec.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), img.width, img.height, PpmCodec.channelSum(img))
      }
    }(enc)
  }

  /** Perceptual difference-hash (dHash) over decoded rasters: decode →
    * nearest-neighbor resample to a (gridW+1)×gridH grid → integer
    * grayscale `(r+g+b) div 3` → one bit per grid cell, `bit(x,y) =
    * gray(x+1,y) > gray(x,y)` at index `y·gridW + x`. Near-duplicate
    * images (re-encodes, small edits, minor noise) land within a few bits
    * of hamming distance; the standard image-dedup fingerprint.
    *
    * The 64 bits ship as two unsigned 32-bit halves `(h_hi, h_lo)` — no
    * sign-bit games, and a SQL engine can recompute both halves of a
    * synthetic image's hash from the pixel formula (q107's oracle). All
    * map-side: pixels never shuffle, one row out per image.
    */
  def dhash(media: DataFrame, gridW: Int = 8, gridH: Int = 8): DataFrame = {
    require(gridW * gridH == 64, "dHash is a 64-bit fingerprint: gridW*gridH == 64")
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("h_hi", LongType),
      StructField("h_lo", LongType))))
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val g = PpmCodec.resizeNearest(
          PpmCodec.decode(r.getAs[Array[Byte]](1)), gridW + 1, gridH)
        def gray(x: Int, y: Int): Int = {
          val s = (y * (gridW + 1) + x) * 3
          ((g.pixels(s) & 0xff) + (g.pixels(s + 1) & 0xff) +
            (g.pixels(s + 2) & 0xff)) / 3
        }
        var hash = 0L
        var y = 0
        while (y < gridH) {
          var x = 0
          while (x < gridW) {
            if (gray(x + 1, y) > gray(x, y))
              hash |= 1L << (y * gridW + x)
            x += 1
          }
          y += 1
        }
        Row(r.getLong(0), hash >>> 32, hash & 0xffffffffL)
      }
    }(enc)
  }

  /** Image near-duplicate pairs by dHash hamming distance ≤ `maxHamming`,
    * candidates by pigeonhole banding over the 64-bit hash (maxHamming+1
    * blocks: any pair within budget agrees on ≥1 whole block — perfect
    * recall, equi-join candidate generation, no all-pairs compare). The
    * image twin of [[Dedup.simHashPairs]].
    */
  def dhashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7, "need 0 <= maxHamming <= 7")
    val nBlocks = maxHamming + 1
    val blockBits = 64 / nBlocks
    val full = hashes.select(col("media_id").as("id"),
      (shiftleft(col("h_hi"), 32).bitwiseOR(col("h_lo"))).as("dh"))
    val blocks = full.select(col("id"), col("dh"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"))
      .withColumn("bval",
        call_function("shiftrightunsigned", col("dh"), col("blk") * blockBits)
          .bitwiseAND(if (blockBits == 64) lit(-1L)
            else lit((1L << blockBits) - 1)))
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.dh").bitwiseXOR(col("y.dh"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Byte-statistics embedding for opaque (non-PPM) payloads — a real
    * byte-level feature, kept for formats whose decoders are external
    * libraries; the raster path above decodes for real.
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
