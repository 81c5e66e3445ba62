package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PpmCodec, WavCodec}

/** Property tests for the raster and audio codecs, driving ScalaCheck's
  * `Test.check` directly (scalatestplus is not in the offline cache):
  * encode∘decode identity on random payloads, resize dimension contracts
  * against the floor map, and frame-feature conservation laws.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  private val genImage: Gen[PpmCodec.Image] = for {
    w <- Gen.choose(1, 16)
    h <- Gen.choose(1, 16)
    px <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield PpmCodec.Image(w, h, px)

  test("PPM encode then decode is the identity on random images") {
    check("ppm round-trip", Prop.forAll(genImage) { img =>
      val back = PpmCodec.decode(PpmCodec.encode(img))
      back.width == img.width && back.height == img.height &&
        back.pixels.toSeq == img.pixels.toSeq
    })
  }

  test("PPM resizeNearest: exact dims and every pixel from the floor map") {
    val gen = for {
      img <- genImage
      dw <- Gen.choose(1, 20)
      dh <- Gen.choose(1, 20)
    } yield (img, dw, dh)
    check("ppm resize", Prop.forAll(gen) { case (img, dw, dh) =>
      val out = PpmCodec.resizeNearest(img, dw, dh)
      out.width == dw && out.height == dh &&
        out.pixels.length == dw * dh * 3 &&
        (0 until dh).forall { y =>
          val sy = y * img.height / dh
          (0 until dw).forall { x =>
            val sx = x * img.width / dw
            (0 until 3).forall { c =>
              out.pixels((y * dw + x) * 3 + c) ==
                img.pixels((sy * img.width + sx) * 3 + c)
            }
          }
        }
    })
  }

  private val genAudio: Gen[WavCodec.Audio] = for {
    rate <- Gen.choose(1, 192000)
    samples <- Gen.containerOf[Array, Short](
      Gen.choose(Short.MinValue, Short.MaxValue))
  } yield WavCodec.Audio(rate, samples)

  test("WAV encode then decode is the identity on random PCM16 audio") {
    check("wav round-trip", Prop.forAll(genAudio) { a =>
      val back = WavCodec.decode(WavCodec.encode(a))
      back.sampleRate == a.sampleRate && back.samples.toSeq == a.samples.toSeq
    })
  }

  test("WAV resampleNearest: floor-map contract, length, and identity at equal rates") {
    val gen = for {
      a <- genAudio
      if a.sampleRate <= 96000
      dst <- Gen.choose(1, 96000)
    } yield (a, dst)
    check("wav resample", Prop.forAll(gen) { case (a, dst) =>
      val out = WavCodec.resampleNearest(a, dst)
      val expectLen = ((a.samples.length.toLong * dst) / a.sampleRate).toInt
      out.sampleRate == dst && out.samples.length == expectLen &&
        out.samples.indices.forall(i =>
          out.samples(i) == a.samples(((i.toLong * a.sampleRate) / dst).toInt))
    })
    check("wav resample identity", Prop.forAll(genAudio) { a =>
      WavCodec.resampleNearest(a, a.sampleRate).samples.toSeq == a.samples.toSeq
    })
  }

  test("WAV frameFeatures conservation: frame count, total L1, crossing bounds") {
    val gen = for {
      a <- genAudio
      frameLen <- Gen.choose(1, 32)
    } yield (a, frameLen)
    check("wav frame features", Prop.forAll(gen) { case (a, frameLen) =>
      val f = WavCodec.frameFeatures(a, frameLen)
      val expectFrames =
        if (a.samples.isEmpty) 0 else (a.samples.length + frameLen - 1) / frameLen
      f.length == expectFrames &&
        f.map(_._1) == (0 until expectFrames) &&
        // L1 energy is conserved across the frame partition
        f.map(_._2).sum == a.samples.map(s => math.abs(s.toLong)).sum &&
        // a frame of n samples has at most n-1 sign crossings
        f.forall { case (_, l1, zc) => l1 >= 0 && zc >= 0 && zc <= frameLen - 1 }
    })
  }
}
