package graft.operators

/** Self-contained binary PPM (P6, maxval 255) raster codec — pure byte
  * arithmetic, no image libraries. This makes the multimodal decode path
  * REAL in a codec-free environment: header parse, pixel extraction,
  * nearest-neighbor resize, and re-encode are all exact, testable
  * operations rather than shape-only stubs. Format per the Netpbm spec:
  * "P6" magic, whitespace-separated width/height/maxval with `#` comments
  * allowed between tokens, a single whitespace byte, then width·height·3
  * raw RGB bytes.
  *
  * Decoded pixels are row-major RGB-interleaved: channel c of pixel (x, y)
  * is at index (y·width + x)·3 + c.
  */
object PpmCodec {

  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  /** Encode RGB-interleaved pixels as a P6 payload. */
  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Decode a P6 payload. Throws IllegalArgumentException on malformed
    * input (wrong magic, non-numeric dims, maxval != 255, short pixel
    * data) — the caller decides whether to quarantine or fail.
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM payload")
    var pos = 2

    def skipSpaceAndComments(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val b = bytes(pos)
        if (b == ' ' || b == '\t' || b == '\n' || b == '\r') pos += 1
        else if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else in = false
      }
    }

    def readInt(): Int = {
      skipSpaceAndComments()
      val start = pos
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        pos += 1
      }
      require(pos > start, s"expected integer at byte $start of PPM header")
      v
    }

    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(maxval == 255, s"only maxval 255 supported, got $maxval")
    // exactly one whitespace byte separates the header from pixel data
    require(pos < bytes.length, "truncated PPM: no pixel data")
    pos += 1
    val need = w * h * 3
    require(bytes.length - pos >= need,
      s"truncated PPM: need $need pixel bytes, have ${bytes.length - pos}")
    val px = new Array[Byte](need)
    System.arraycopy(bytes, pos, px, 0, need)
    Image(w, h, px)
  }

  /** Nearest-neighbor resize: destination pixel (x, y) copies source pixel
    * (x·srcW / dstW, y·srcH / dstH) — integer floor, the standard
    * subsampling map, exactly reproducible in SQL for the oracle.
    */
  def resizeNearest(img: Image, dstW: Int, dstH: Int): Image = {
    require(dstW > 0 && dstH > 0, "target dims must be positive")
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = y * img.height / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * img.width / dstW
        val s = (sy * img.width + sx) * 3
        val d = (y * dstW + x) * 3
        out(d) = img.pixels(s)
        out(d + 1) = img.pixels(s + 1)
        out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    Image(dstW, dstH, out)
  }

  /** Sum of all channel bytes (unsigned) — the integer "luminance mass" of
    * the raster; integer-exact in any summation order, so safe for the
    * cross-engine oracle.
    */
  def channelSum(img: Image): Long = {
    var acc = 0L
    var i = 0
    while (i < img.pixels.length) { acc += img.pixels(i) & 0xff; i += 1 }
    acc
  }
}
