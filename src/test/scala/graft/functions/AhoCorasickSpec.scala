package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level pins for [[AhoCorasick]] that the DataFrame-level
  * BlocklistSpec cannot see: the executor-global DFA cache (one build
  * per JVM per pattern list — the property that keeps 20 MB automata
  * from rebuilding on every task) and dictionary-scale construction.
  */
class AhoCorasickSpec extends AnyFunSuite {

  private def counts(ac: AhoCorasick, text: String): Map[Long, Long] = {
    val arr = ac.scan(UTF8String.fromString(text))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      r.getLong(0) -> r.getLong(1)
    }.toMap
  }

  /** leftmost-greedy non-overlapping count — the replace() contract */
  private def naive(text: String, p: String): Long = {
    var n = 0L
    var i = text.indexOf(p)
    while (i >= 0) { n += 1; i = text.indexOf(p, i + p.length) }
    n
  }

  test("identical pattern lists share ONE compiled DFA per JVM; different lists do not") {
    // deliberately implausible patterns: this test plants a FAKE build
    // under their cache key, which must never shadow a real blocklist's
    val pats = Array("__acspec_cache_probe_1", "__acspec_cache_probe_2",
      "__acspec_cache_probe_12").map(_.getBytes(UTF_8))
    var builds = 0
    def build() = { builds += 1; (Array(1), Array(Array(2))) }
    val a = AhoCorasick.compile(pats.map(_.clone), () => build())
    val b = AhoCorasick.compile(pats.map(_.clone), () => build())
    assert(builds <= 1, "second compile of the same list must hit the cache")
    assert(a eq b, "cache must return the same arrays, not a rebuild")
    // order is part of the key (out-lists index into the caller's array)
    val c = AhoCorasick.compile(pats.reverse, () => build())
    assert(!(c eq a))
  }

  test("dictionary-scale build: 10k patterns, counts equal the naive scan") {
    // 10k distinct patterns; a handful are planted in the probe text
    val pats = (0 until 10000).map(i => s"phrase${i}marker").toArray
    val ac = new AhoCorasick(
      pats.indices.map(_.toLong).toArray, pats.map(_.getBytes(UTF_8)))
    val text = "x phrase17marker y phrase17marker phrase9999marker " +
      "phrase123marke " + // near-miss: one char short
      (1 to 50).map(i => s"filler$i").mkString(" ")
    val got = counts(ac, text)
    val want = pats.indices
      .map(i => i.toLong -> naive(text, pats(i))).filter(_._2 > 0).toMap
    assert(got == want)
    assert(got(17L) == 2L && got(9999L) == 1L && !got.contains(123L))
  }

  test("overlapping dictionary: longer pattern does not mask shorter, counts independent per pid") {
    val pats = Array("ab", "abab", "baba")
    val ac = new AhoCorasick(Array(1L, 2L, 3L), pats.map(_.getBytes(UTF_8)))
    val text = "abababab"
    val got = counts(ac, text)
    assert(got == Map(1L -> naive(text, "ab"),
      2L -> naive(text, "abab"), 3L -> naive(text, "baba")))
  }
}
