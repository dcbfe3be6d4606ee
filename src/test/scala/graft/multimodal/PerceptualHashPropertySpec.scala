package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck generalization of PerceptualHashSpec: the invariance claims
  * hold for ARBITRARY content, not just the avalanche-pattern family the
  * q83/q84/q85 corpora use — any 9×8 cell grid, any slice-amplitude
  * profile, any frame stack. Deterministically seeded draws, same style
  * as [[CodecPropertySpec]].
  */
class PerceptualHashPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val cellGrid: Gen[Vector[Vector[Int]]] =
    Gen.containerOfN[Vector, Vector[Int]](8,
      Gen.containerOfN[Vector, Int](9, Gen.choose(0, 255)))

  private def gray(grid: Vector[Vector[Int]], cell: Int)(x: Int, y: Int): Int = {
    val l = grid(y / cell)(x / cell)
    (l << 16) | (l << 8) | l
  }

  private def dHashAt(grid: Vector[Vector[Int]], cell: Int): Long =
    PerceptualHash.dHash(
      Codecs.decodeImage(Codecs.encodePng(9 * cell, 8 * cell, gray(grid, cell))).get)

  test("dHash: any cell grid hashes identically at every grid-aligned render size") {
    for {
      grid <- samples(cellGrid, 20)
      scale <- Seq(2, 3, 5)
    } assert(dHashAt(grid, 4) == dHashAt(grid, scale * 2),
      s"scale $scale changed dHash")
  }

  test("dHash: PNG and BMP containers of the same raster hash identically") {
    for (grid <- samples(cellGrid, 20)) {
      val p = PerceptualHash.dHash(
        Codecs.decodeImage(Codecs.encodePng(36, 32, gray(grid, 4))).get)
      val b = PerceptualHash.dHash(
        Codecs.decodeImage(Codecs.encodeBmp(36, 32, gray(grid, 4))).get)
      assert(p == b)
    }
  }

  private val sliceAmps: Gen[Vector[Int]] =
    Gen.containerOfN[Vector, Int](65, Gen.choose(0, 12000))

  test("audioHash: exact volume scaling and sample duplication preserve the hash") {
    for {
      amps <- samples(sliceAmps, 30)
      dup <- Seq(2, 3)
    } {
      val base = Array.tabulate(65 * 8) { i =>
        val a = amps(i / 8)
        (if (i % 2 == 0) a else -a).toShort
      }
      val h = PerceptualHash.audioHash(base)
      assert(h == PerceptualHash.audioHash(base.map(s => (s * 2).toShort)),
        "volume scaling changed audioHash")
      assert(h == PerceptualHash.audioHash(base.flatMap(s => Array.fill(dup)(s))),
        s"${dup}x duplication changed audioHash")
    }
  }

  test("videoHash: per-frame upscale and uniform frame duplication preserve the hash") {
    for {
      grids <- samples(Gen.listOfN(3, cellGrid), 15)
      dup <- Seq(2, 3)
    } {
      def frames(cell: Int, stack: Seq[Vector[Vector[Int]]]) = stack.map { g =>
        Codecs.decodeImage(Codecs.encodePng(9 * cell, 8 * cell, gray(g, cell))).get
      }
      val h = PerceptualHash.videoHash(frames(4, grids))
      assert(h == PerceptualHash.videoHash(frames(8, grids)),
        "per-frame upscale changed videoHash")
      assert(h == PerceptualHash.videoHash(frames(4, grids.flatMap(Seq.fill(dup)(_)))),
        s"${dup}x frame duplication changed videoHash")
    }
  }
}
