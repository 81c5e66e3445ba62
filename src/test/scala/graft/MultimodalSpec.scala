package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, PpmCodec, WavCodec}

/** Multimodal plumbing: binary payload round-trip, frame sampling shape,
  * the batched (mapPartitions) byte-feature path, and the REAL raster
  * codec — PPM encode/decode/resize asserted pixel-exact on known images.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a" * 100), (2L, "the quick brown fox"), (3L, "xy"))
    .toDF("doc_id", "text")

  test("asMedia produces the typed media schema with UTF-8 payload bytes") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName === "binary")
    val r = m.filter(col("media_id") === 2L).head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "the quick brown fox")
  }

  test("sampleFrames yields k frames with in-range offsets, short payloads included") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    val f = Multimodal.sampleFrames(m, 4, 32)
    assert(f.count() === 12) // 3 docs x 4 frames
    val offsets = f.filter(col("media_id") === 1L).orderBy("frame_idx")
      .select("offset").as[Int].collect().toSeq
    assert(offsets === Seq(1, 23, 46, 69), "evenly spaced over 100-32 bytes")
    // short payload: all frames start at 1 and truncate
    val short = f.filter(col("media_id") === 3L).select("offset").as[Int].collect()
    assert(short.forall(_ === 1))
  }

  test("extractFeatures: batched decode keeps schema, determinism, and L1 normalization") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(m)
    assert(feats.schema === Multimodal.featureSchema)
    val row = feats.filter(col("media_id") === 1L).head
    assert(row.getInt(1) === 100)
    val v = row.getSeq[Float](2)
    assert(v.length === 8)
    assert(math.abs(v.sum - 1.0f) < 1e-5, "bucket histogram must sum to 1")
    // deterministic across runs
    val again = Multimodal.extractFeatures(m).filter(col("media_id") === 1L).head.getSeq[Float](2)
    assert(v === again)
  }

  test("resize bounds payloads to targetBytes, passes short ones through") {
    val m = Multimodal.asMedia(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
    val sizes = Multimodal.resize(m, 16)
      .select(col("media_id"), col("n_bytes"), length(col("payload")).as("len"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      assert(r.getInt(1) <= 16, s"media ${r.getLong(0)} resized to ${r.getInt(1)}")
      assert(r.getInt(1) === r.getInt(2), "n_bytes must describe the payload")
    }
    // deterministic: same first byte as source (stride sampling keeps byte 0)
    val src = m.filter(col("media_id") === 0L).head.getAs[Array[Byte]]("payload")
    val out = Multimodal.resize(m, 16).filter(col("media_id") === 0L)
      .head.getAs[Array[Byte]]("payload")
    assert(out.head === src.head)
  }

  test("PPM codec round-trips pixels exactly and parses comments") {
    val px = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 37 % 256).toByte)
    val img = PpmCodec.Image(2, 2, px)
    val decoded = PpmCodec.decode(PpmCodec.encode(img))
    assert(decoded.width === 2 && decoded.height === 2)
    assert(decoded.pixels.toSeq === px.toSeq)
    // header variant with comments and extra whitespace
    val weird = "P6 #c1\n# full comment line\n 2\t2 #dims\n255\n".getBytes("US-ASCII") ++ px
    val d2 = PpmCodec.decode(weird)
    assert(d2.width === 2 && d2.pixels.toSeq === px.toSeq)
  }

  test("PPM decode rejects malformed payloads") {
    intercept[IllegalArgumentException](PpmCodec.decode("P5\n1 1\n255\n.".getBytes))
    intercept[IllegalArgumentException](PpmCodec.decode("P6\n2 2\n255\nxy".getBytes)) // short pixels
    intercept[IllegalArgumentException](PpmCodec.decode("P6\n2 2\n65535\n".getBytes ++ new Array[Byte](12)))
  }

  test("nearest-neighbor resize picks exactly the floor-mapped source pixels") {
    // 4x4 image whose pixel (x,y) has R=16x+y, G=0, B=255-R
    val px = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val r = 16 * x + y
      px((y * 4 + x) * 3) = r.toByte
      px((y * 4 + x) * 3 + 2) = (255 - r).toByte
    }
    val half = PpmCodec.resizeNearest(PpmCodec.Image(4, 4, px), 2, 2)
    // dst (x,y) ← src (2x, 2y): R values 0, 32, 2, 34
    val rs = (0 until 4).map(i => half.pixels(i * 3) & 0xff)
    assert(rs === Seq(0, 32, 2, 34))
    val one = PpmCodec.resizeNearest(PpmCodec.Image(4, 4, px), 1, 1)
    assert((one.pixels(0) & 0xff) === 0, "1x1 resize keeps src (0,0)")
    // upscale duplicates source pixels (floor map)
    val up = PpmCodec.resizeNearest(PpmCodec.Image(2, 2, half.pixels), 4, 4)
    assert((up.pixels(0) & 0xff) === 0 && (up.pixels(3) & 0xff) === 0,
      "dst (0,0) and (1,0) both map to src (0,0)")
  }

  test("WAV codec round-trips samples exactly, incl. negative and boundary values") {
    val samples = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 12345, -12345)
    val a = WavCodec.Audio(8000, samples)
    val back = WavCodec.decode(WavCodec.encode(a))
    assert(back.sampleRate === 8000)
    assert(back.samples.toSeq === samples.toSeq)
  }

  test("WAV decode skips unknown chunks (incl. odd-size word alignment)") {
    val a = WavCodec.Audio(44100, Array[Short](7, -7, 300))
    val enc = WavCodec.encode(a)
    // splice a 3-byte (odd → padded) unknown chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) // payload + pad
    val spliced = enc.take(fmtEnd) ++ junk ++ enc.drop(fmtEnd)
    val back = WavCodec.decode(spliced)
    assert(back.sampleRate === 44100)
    assert(back.samples.toSeq === Seq[Short](7, -7, 300))
  }

  test("WAV decode rejects malformed payloads") {
    intercept[IllegalArgumentException](WavCodec.decode("RIFX....WAVE".getBytes ++ new Array[Byte](40)))
    // truncated data chunk: claims 8 bytes, carries 2
    val a = WavCodec.encode(WavCodec.Audio(8000, Array[Short](1, 2, 3, 4)))
    intercept[IllegalArgumentException](WavCodec.decode(a.dropRight(6)))
    // stereo and non-PCM rejected
    val stereo = a.clone(); stereo(22) = 2 // channels field in fmt chunk
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
    val ulaw = a.clone(); ulaw(20) = 7 // audioFormat field
    intercept[IllegalArgumentException](WavCodec.decode(ulaw))
  }

  test("frameFeatures: integer L1 + zero crossings, trailing partial frame kept") {
    val a = WavCodec.Audio(8000, Array[Short](5, -3, 2, -2, 4, -9))
    val f = WavCodec.frameFeatures(a, 4)
    // frame 0: |5|+|3|+|2|+|2|=12, crossings at 1,2,3 → 3
    // frame 1 (partial): |4|+|9|=13, crossing at idx 5 within frame → 1
    assert(f === Seq((0, 12L, 3L), (1, 13L, 1L)))
  }

  test("synthetic WAV pipeline: encode → decode → frame features match the generating formula") {
    val media = Multimodal.syntheticWav(docs, "doc_id", 64, 8000)
    def hash32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val expected = Array.tabulate(64)(i => (hash32(s"2:$i") % 65536 - 32768).toShort)
    val dec = WavCodec.decode(
      media.filter(col("media_id") === 2L).head.getAs[Array[Byte]]("payload"))
    assert(dec.samples.toSeq === expected.toSeq)
    val feats = Multimodal.wavFrameFeatures(media, 16)
      .filter(col("media_id") === 2L).orderBy("frame_idx").collect()
    assert(feats.length === 4)
    val manual = WavCodec.frameFeatures(WavCodec.Audio(8000, expected), 16)
    feats.zip(manual).foreach { case (row, (f, l1, zc)) =>
      assert(row.getInt(1) === f && row.getLong(2) === l1 && row.getLong(3) === zc)
    }
    // resample stage: 8 kHz → 4 kHz keeps exactly the even-index samples
    val res = WavCodec.decode(Multimodal.wavResample(media, 4000)
      .filter(col("media_id") === 2L).head.getAs[Array[Byte]]("payload"))
    assert(res.sampleRate === 4000)
    assert(res.samples.toSeq === (0 until 32).map(i => expected(2 * i)))
  }

  test("synthetic PPM pipeline: encode → decode → resize matches the generating formula") {
    val media = Multimodal.syntheticPpm(docs, "doc_id", 8, 6)
    val dec = Multimodal.decodePpm(media).filter(col("media_id") === 1L).head
    assert(dec.getInt(1) === 8 && dec.getInt(2) === 6)
    val pixels = dec.getAs[Array[Byte]]("pixels")
    def hash32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    for (y <- Seq(0, 3, 5); x <- Seq(0, 4, 7); c <- 0 until 3)
      assert((pixels(((y * 8) + x) * 3 + c) & 0xff) === (hash32(s"1:$x:$y:$c") % 256).toInt,
        s"pixel ($x,$y,$c) must match the md5 formula")
    // resized stats equal the formula applied at strided coordinates
    val stats = Multimodal.ppmStats(Multimodal.resizePpm(media, 4, 3))
      .filter(col("media_id") === 1L).head
    val expect = (for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3)
      yield hash32(s"1:${x * 2}:${y * 2}:$c") % 256).sum
    assert(stats.getLong(3) === expect)
  }

  // controlled raster corpus for the dHash cases: a horizontal gradient
  // (strictly increasing gray, wide margins), a lightly-noised copy of it
  // (the near-duplicate a re-encode or lossy pass produces), and the
  // reversed gradient (structurally opposite)
  private def gradientImage(w: Int, h: Int, reverse: Boolean, noise: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val base = if (reverse) (w - 1 - x) * 20 else x * 20
      val v = math.min(255, base + (if ((x + y + c) % 5 == 0) noise else 0))
      px((y * w + x) * 3 + c) = v.toByte
    }
    px
  }

  test("dhash: identical images collide, near-dups are close, reversed gradients far") {
    val imgs = Seq(
      (1L, gradientImage(16, 12, reverse = false, noise = 0)),
      (2L, gradientImage(16, 12, reverse = false, noise = 1)), // near-dup of 1
      (3L, gradientImage(16, 12, reverse = true, noise = 0)),  // opposite structure
      (4L, gradientImage(16, 12, reverse = false, noise = 0))  // exact dup of 1
    ).map { case (id, px) =>
      (id, "image/ppm", PpmCodec.encode(PpmCodec.Image(16, 12, px)), 16, 12)
    }.toDF("media_id", "kind", "payload", "width", "height")
    val h = Multimodal.dhash(imgs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) << 32) | r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) === h(4L), "bit-identical images must collide")
    assert(ham(h(1L), h(2L)) <= 3, "±1 channel noise on wide-margin gradients stays within budget")
    assert(ham(h(1L), h(3L)) > 20, "reversed gradient flips most comparison bits")
    // a gradient increasing in x has every comparison bit set
    assert(h(1L) === -1L, "strictly increasing gray ⇒ all 64 dHash bits set")
  }

  test("dhashPairs pigeonhole banding has perfect recall vs brute force") {
    val imgs = (0L until 12L).map { i =>
      val px = gradientImage(16, 12, reverse = i % 3 == 2, noise = (i % 4).toInt)
      (i, "image/ppm", PpmCodec.encode(PpmCodec.Image(16, 12, px)), 16, 12)
    }.toDF("media_id", "kind", "payload", "width", "height")
    val hashes = Multimodal.dhash(imgs)
    val viaBanding = Multimodal.dhashPairs(hashes, 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val h = hashes.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) << 32) | r.getLong(2))).toMap
    val brute = (for {
      a <- h.keys; b <- h.keys if a < b
      if java.lang.Long.bitCount(h(a) ^ h(b)) <= 3
    } yield (a, b)).toSet
    assert(viaBanding === brute, "banding must find every pair within the hamming budget")
    assert(brute.nonEmpty, "corpus must actually contain near-dup pairs for this test to bite")
  }
}
