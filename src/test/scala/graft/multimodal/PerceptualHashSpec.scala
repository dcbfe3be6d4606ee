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
}
