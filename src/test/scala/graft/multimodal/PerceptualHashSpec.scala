package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM invariants of the dHash fingerprint — the properties q83's
  * contract oracle rests on: bit-identical under grid-aligned resize and
  * lossless re-encode, far apart for distinct content.
  */
class PerceptualHashSpec extends AnyFunSuite {

  private def gray(id: Long)(cx: Int, cy: Int): Int = {
    val l = PerceptualHash.cellPattern(id, cx, cy)
    (l << 16) | (l << 8) | l
  }

  private def fp(bytes: Array[Byte]): Long =
    PerceptualHash.dHash(Codecs.decodeImage(bytes).get)

  private val ids = Seq(0L, 1L, 7L, 42L, 999L, 123457L)

  test("dHash is bit-identical under grid-aligned resize (36x32, 72x64, 45x40)") {
    for (id <- ids) {
      val g = gray(id) _
      val h36 = fp(Codecs.encodePng(36, 32, (x, y) => g(x / 4, y / 4)))
      val h72 = fp(Codecs.encodePng(72, 64, (x, y) => g(x / 8, y / 8)))
      val h45 = fp(Codecs.encodePng(45, 40, (x, y) => g(x / 5, y / 5)))
      assert(h36 == h72 && h36 == h45, s"resize changed dHash for id=$id")
    }
  }

  test("dHash is bit-identical under lossless re-encode (PNG vs BMP)") {
    for (id <- ids) {
      val g = gray(id) _
      val png = fp(Codecs.encodePng(36, 32, (x, y) => g(x / 4, y / 4)))
      val bmp = fp(Codecs.encodeBmp(36, 32, (x, y) => g(x / 4, y / 4)))
      assert(png == bmp, s"container changed dHash for id=$id")
    }
  }

  test("distinct content lands far outside the Hamming-3 ball") {
    val hashes = ids.map(id =>
      fp(Codecs.encodePng(36, 32, (x, y) => gray(id)(x / 4, y / 4))))
    for (Seq(a, b) <- hashes.combinations(2)) {
      val d = java.lang.Long.bitCount(a ^ b)
      assert(d > 3, s"accidental near-pair at distance $d")
    }
  }

  test("images smaller than the 9x8 grid still hash without crashing") {
    val tiny = fp(Codecs.encodePng(3, 2, (x, y) => gray(5L)(x, y)))
    assert(tiny == fp(Codecs.encodePng(3, 2, (x, y) => gray(5L)(x, y))))
  }

  // ---- audioHash: the q84 invariants ----

  private def clip(id: Long): Array[Short] = Array.tabulate(520) { i =>
    val a = ((PerceptualHash.cellPattern(id, i / 8, 0) << 5) |
      (PerceptualHash.cellPattern(id, i / 8, 1) & 31)) + 100
    (if (i % 2 == 0) a else -a).toShort
  }

  private def afp(rate: Int, samples: Array[Short]): Long = {
    val (_, decoded) = Codecs.decodeWavPcm16(Codecs.encodeWavPcm16(rate, samples)).get
    PerceptualHash.audioHash(decoded)
  }

  test("audioHash is bit-identical under exact volume scaling and slice-aligned upsample") {
    for (id <- ids) {
      val base = afp(16000, clip(id))
      val loud = afp(16000, clip(id).map(s => (s * 2).toShort))
      val up = afp(32000, clip(id).flatMap(s => Array(s, s)))
      assert(base == loud, s"volume scaling changed audioHash for id=$id")
      assert(base == up, s"upsampling changed audioHash for id=$id")
    }
  }

  test("distinct clips land far outside the Hamming-3 ball") {
    val hashes = ids.map(id => afp(16000, clip(id)))
    for (Seq(a, b) <- hashes.combinations(2)) {
      val d = java.lang.Long.bitCount(a ^ b)
      assert(d > 3, s"accidental audio near-pair at distance $d")
    }
  }

  test("empty and sub-slice clips hash without crashing") {
    assert(PerceptualHash.audioHash(Array.empty[Short]) == 0L)
    PerceptualHash.audioHash(Array[Short](5, -3, 2)): Unit
  }

  // ---- videoHash: the q85 invariants ----

  private def vfp(w: Int, h: Int, cell: Int, id: Long, frameIds: Seq[Int]): Long = {
    val gif = Codecs.encodeGifAnimated(w, h, frameIds.size, (f, x, y) =>
      PerceptualHash.cellPattern(id * 131 + frameIds(f), x / cell, y / cell))
    PerceptualHash.videoHash(Codecs.decodeGifFrames(gif).get.toSeq)
  }

  test("videoHash is bit-identical under per-frame resize and slow motion") {
    for (id <- ids) {
      val base = vfp(36, 32, 4, id, 0 until 4)
      val resized = vfp(72, 64, 8, id, 0 until 4)
      val slowmo = vfp(36, 32, 4, id, (0 until 4).flatMap(f => Seq(f, f)))
      assert(base == resized, s"resize changed videoHash for id=$id")
      assert(base == slowmo, s"slow motion changed videoHash for id=$id")
    }
  }

  test("distinct frame sequences land far outside the Hamming-3 ball") {
    val hashes = ids.map(id => vfp(36, 32, 4, id, 0 until 4))
    for (Seq(a, b) <- hashes.combinations(2)) {
      val d = java.lang.Long.bitCount(a ^ b)
      assert(d > 3, s"accidental video near-pair at distance $d")
    }
  }

  test("empty frame sequence hashes to zero without crashing") {
    assert(PerceptualHash.videoHash(Seq.empty) == 0L)
  }
}
