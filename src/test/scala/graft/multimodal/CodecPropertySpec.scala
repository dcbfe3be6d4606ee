package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck round-trip properties for the three JDK-backed codecs: for
  * ARBITRARY shapes and contents, encode → decode must reproduce every
  * pixel/sample/frame exactly (the palettes and PCM widths were chosen to
  * make the containers lossless). Edge shapes — 1×1 rasters, single-frame
  * "videos", one-sample clips, extreme amplitudes — are exactly where
  * container codecs break (the interlace bug this suite's GIF cases would
  * have caught ships in the JDK's own default write path).
  */
class CodecPropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val shapeGen = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 40)
    seed <- Gen.chooseNum(0, Int.MaxValue)
  } yield (w, h, seed)

  test("PNG round trip is pixel-exact for arbitrary shapes and contents") {
    for ((w, h, seed) <- samples(shapeGen, 40)) {
      def rgb(x: Int, y: Int): Int = {
        val v = x * 2654435761L + y * 40503L + seed
        (v & 0xffffff).toInt
      }
      val img = Codecs.decodeImage(Codecs.encodePng(w, h, rgb)).get
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) == rgb(x, y), s"($w,$h,$seed) at ($x,$y)")
    }
  }

  test("WAV round trip is sample-exact for arbitrary lengths and amplitudes") {
    val gen = for {
      n <- Gen.chooseNum(1, 400)
      rate <- Gen.oneOf(8000, 16000, 44100)
      seed <- Gen.chooseNum(0, Int.MaxValue)
    } yield (n, rate, seed)
    for ((n, rate, seed) <- samples(gen, 40)) {
      val xs = Array.tabulate(n)(i =>
        ((i * 48271L + seed) % 65536L - 32768L).toShort)
      val (gotRate, decoded) = Codecs.decodeWavPcm16(Codecs.encodeWavPcm16(rate, xs)).get
      assert(gotRate == rate)
      assert(decoded.toSeq == xs.toSeq, s"($n,$rate,$seed)")
    }
  }

  test("animated-GIF round trip is frame- and pixel-exact for arbitrary shapes") {
    val gen = for {
      (w, h, seed) <- shapeGen
      frames <- Gen.chooseNum(1, 6)
    } yield (w, h, frames, seed)
    for ((w, h, frames, seed) <- samples(gen, 25)) {
      def gray(f: Int, x: Int, y: Int): Int =
        (((f * 131L + x * 31L + y * 17L + seed) % 256L).toInt + 256) % 256
      val decoded = Codecs.decodeGifFrames(
        Codecs.encodeGifAnimated(w, h, frames, gray)).get
      assert(decoded.length == frames, s"($w,$h,$frames,$seed)")
      for (f <- 0 until frames; y <- 0 until h; x <- 0 until w)
        assert((decoded(f).getRGB(x, y) & 0xff) == gray(f, x, y),
          s"($w,$h,$frames,$seed) frame $f at ($x,$y)")
    }
  }
}
