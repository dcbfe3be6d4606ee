package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential for [[AhoCorasick]]: counts must equal the
  * naive leftmost-greedy non-overlapping indexOf scan (the `replace()`
  * contract) for EVERY pattern, on tiny-alphabet inputs where patterns
  * overlap each other, themselves, and the text densely — prefixes of
  * each other, suffixes found only through output links, self-
  * overlapping repeats. Pure-JVM kernel, so hundreds of seeded cases
  * are cheap (the PropertySpec discipline).
  */
class AhoCorasickPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val caseGen: Gen[(String, Seq[String])] = for {
    alpha <- Gen.oneOf("ab", "abc")
    textLen <- Gen.choose(0, 80)
    text <- Gen.listOfN(textLen, Gen.oneOf(alpha.toSeq)).map(_.mkString)
    nPats <- Gen.choose(1, 8)
    pats <- Gen.listOfN(nPats, for {
      l <- Gen.choose(1, 6)
      p <- Gen.listOfN(l, Gen.oneOf(alpha.toSeq))
    } yield p.mkString)
  } yield (text, pats.distinct)

  private def naive(text: String, p: String): Long = {
    var n = 0L
    var i = text.indexOf(p)
    while (i >= 0) { n += 1; i = text.indexOf(p, i + p.length) }
    n
  }

  test("counts equal the leftmost-greedy indexOf scan on random dense-overlap cases") {
    for (((text, pats), ci) <- samples(caseGen, 300).zipWithIndex) {
      val ac = new AhoCorasick(
        pats.indices.map(_.toLong).toArray, pats.map(_.getBytes(UTF_8)).toArray)
      val arr = ac.scan(UTF8String.fromString(text))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        r.getLong(0) -> r.getLong(1)
      }.toMap
      val want = pats.indices
        .map(i => i.toLong -> naive(text, pats(i))).filter(_._2 > 0).toMap
      assert(got == want,
        s"case #$ci diverged: text='$text' pats=$pats got=$got want=$want")
    }
  }
}
