package graft.operators

/** Self-contained RIFF/WAVE PCM16 mono codec — the audio analog of
  * [[PpmCodec]], pure byte arithmetic, no audio libraries. Makes the
  * audio decode path REAL: header parse (RIFF/WAVE magic, fmt chunk with
  * PCM format tag, data chunk discovery with unknown-chunk skipping),
  * little-endian 16-bit sample extraction, and frame-level integer
  * features are exact, testable operations.
  *
  * Layout per the RIFF spec: "RIFF" + u32 size + "WAVE", then chunks of
  * ("id", u32 size, payload); the "fmt " chunk carries (audioFormat=1 PCM,
  * channels, sampleRate, byteRate, blockAlign, bitsPerSample=16); the
  * "data" chunk carries the samples.
  */
object WavCodec {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Encode mono PCM16 as a RIFF/WAVE payload. */
  def encode(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))                 // PCM
    out.write(le16(1))                 // mono
    out.write(le32(a.sampleRate))
    out.write(le32(a.sampleRate * 2))  // byte rate
    out.write(le16(2))                 // block align
    out.write(le16(16))                // bits per sample
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    a.samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Decode a RIFF/WAVE PCM16 mono payload; skips unknown chunks. Throws
    * IllegalArgumentException on malformed input.
    */
  def decode(bytes: Array[Byte]): Audio = {
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    require(bytes.length >= 44 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
      "not a RIFF/WAVE payload")
    var pos = 12
    var rate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = ascii(pos, 4)
      val size = u32(pos + 4).toInt
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"truncated chunk '$id' at byte $pos")
      id match {
        case "fmt " =>
          require(u16(pos + 8) == 1, "only PCM (format 1) supported")
          require(u16(pos + 10) == 1, "only mono supported")
          require(u16(pos + 22) == 16, "only 16-bit samples supported")
          rate = u32(pos + 12).toInt
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = u16(pos + 8 + i * 2).toShort; i += 1 }
        case _ => () // unknown chunk: skip
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(rate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    Audio(rate, samples)
  }

  /** Nearest-neighbor resample to `dstRate` — the audio analog of
    * [[PpmCodec.resizeNearest]]'s floor map: output sample `i` is input
    * sample `⌊i·srcRate/dstRate⌋`, output length `⌊n·dstRate/srcRate⌋`
    * (an exact-rate identity round-trips bit-for-bit). Integer arithmetic
    * only — deterministic and oracle-safe.
    */
  def resampleNearest(a: Audio, dstRate: Int): Audio = {
    require(dstRate > 0, "dstRate must be positive")
    if (dstRate == a.sampleRate) a
    else {
      val n = ((a.samples.length.toLong * dstRate) / a.sampleRate).toInt
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = a.samples(((i.toLong * a.sampleRate) / dstRate).toInt)
        i += 1
      }
      Audio(dstRate, out)
    }
  }

  /** Integer frame features over `frameLen`-sample windows: per frame, the
    * sum of absolute sample values (L1 energy) and the zero-crossing
    * count — both integer-exact in any order, so safe for the
    * cross-engine oracle. The trailing partial frame is kept.
    */
  def frameFeatures(a: Audio, frameLen: Int): Seq[(Int, Long, Long)] = {
    require(frameLen > 0, "frameLen must be positive")
    (0 until a.samples.length by frameLen).map { start =>
      val end = math.min(start + frameLen, a.samples.length)
      var l1 = 0L
      var zc = 0L
      var i = start
      while (i < end) {
        l1 += math.abs(a.samples(i).toLong)
        if (i > start && (a.samples(i) < 0) != (a.samples(i - 1) < 0)) zc += 1
        i += 1
      }
      (start / frameLen, l1, zc)
    }
  }
}
