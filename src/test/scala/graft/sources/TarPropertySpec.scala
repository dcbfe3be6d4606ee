package graft.sources

import java.io.ByteArrayOutputStream

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.sources.TarShards.TarCodec

/** Generative properties for the pure ustar codec — the fixed cases in
  * TarShardsSpec pin known edges; these fuzz member counts, name shapes,
  * and payload sizes across seeded ScalaCheck samples (pure functions:
  * hundreds of cases, no Spark jobs).
  */
class TarPropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val memberGen: Gen[(String, Array[Byte])] = for {
    name <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(80))
    ext <- Gen.oneOf("txt", "bin", "json")
    size <- Gen.frequency(
      (3, Gen.chooseNum(0, 64)),
      (2, Gen.chooseNum(450, 600)),   // straddle the 512 block edge
      (1, Gen.chooseNum(1000, 1600)))
    seed <- Gen.chooseNum(0, 1 << 20)
  } yield (s"$name.$ext",
    Array.tabulate[Byte](size)(i => ((i * 31 + seed) % 251).toByte))

  test("parse ∘ write is the identity for arbitrary member lists") {
    val archives = samples(Gen.listOfN(7, memberGen), 60)
    archives.foreach { members =>
      // names must be unique within one archive for a faithful compare
      val uniq = members.groupBy(_._1).map(_._2.head).toSeq
      val out = new ByteArrayOutputStream()
      uniq.foreach { case (n, b) => TarCodec.writeMember(out, n, b) }
      TarCodec.writeTrailer(out)
      val back = TarCodec.parse(out.toByteArray).toSeq
      assert(back.map(_._1) == uniq.map(_._1))
      back.zip(uniq).foreach { case ((_, a), (_, b)) =>
        assert(java.util.Arrays.equals(a, b))
      }
      // framing invariant: every offset is block-aligned
      assert(out.toByteArray.length % 512 == 0)
    }
  }

  test("scanStats agrees with a full parse on arbitrary archives") {
    val archives = samples(Gen.listOfN(5, memberGen), 40)
    archives.foreach { members =>
      val uniq = members.groupBy(_._1).map(_._2.head).toSeq
      val out = new ByteArrayOutputStream()
      uniq.foreach { case (n, b) => TarCodec.writeMember(out, n, b) }
      TarCodec.writeTrailer(out)
      val parsed = TarCodec.parse(out.toByteArray).toSeq
      val (n, payload) = TarCodec.scanStats(
        new java.io.ByteArrayInputStream(out.toByteArray))
      assert(n == parsed.length)
      assert(payload == parsed.map(_._2.length.toLong).sum)
    }
  }

  test("single-bit corruption anywhere in a header is detected") {
    val out = new ByteArrayOutputStream()
    TarCodec.writeMember(out, "a.txt", Array.tabulate[Byte](100)(_.toByte))
    TarCodec.writeTrailer(out)
    val clean = out.toByteArray
    // flip one bit in each interesting header region: name, size, magic
    for (pos <- Seq(3, 60, 127, 258)) {
      val bad = clean.clone()
      bad(pos) = (bad(pos) ^ 0x08).toByte
      val r = try { TarCodec.parse(bad).toSeq; "parsed" }
      catch { case _: IllegalArgumentException => "rejected" }
      assert(r == "rejected", s"bit flip at $pos went undetected")
    }
  }
}
