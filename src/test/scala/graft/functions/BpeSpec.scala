package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextAnalysis

/** Hand-computed contracts for the greedy merge-table BPE expression
  * (rank order, leftmost tie-break, chained merges, overlap resolution,
  * code-point symbols, whitespace edges).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def encode(text: String, merges: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(TextAnalysis.bpeTokens(col("t"), merges).as("bpe"))
      .as[Seq[String]].head()

  test("merges chain to full words in rank order") {
    // a+b -> ab (0), ab+c -> abc (1)
    assert(encode("abc", Seq("a b", "ab c")) == Seq("abc"))
    // lower rank wins regardless of position: with b+c (0) before a+b (1),
    // "abc" merges (b,c) first -> [a, bc]; (a,bc) not in table
    assert(encode("abc", Seq("b c", "a b")) == Seq("a", "bc"))
  }

  test("leftmost occurrence wins on equal rank (self-overlap resolves left-first)") {
    assert(encode("aaa", Seq("a a")) == Seq("aa", "a"))
    assert(encode("aaaa", Seq("a a")) == Seq("aa", "aa"))
  }

  test("merged symbols participate in later merges") {
    // abab: (a,b)@0 -> [ab,a,b] -> [ab,ab] -> (ab,ab)@1 -> [abab]
    assert(encode("abab", Seq("a b", "ab ab")) == Seq("abab"))
  }

  test("words tokenize independently; empty words vanish") {
    assert(encode("ab  ab", Seq("a b")) == Seq("ab", "ab"))
    assert(encode("  ", Seq("a b")) == Seq.empty)
    assert(encode("", Seq("a b")) == Seq.empty)
  }

  test("supplementary-plane code points are single symbols") {
    val clef = new String(Character.toChars(0x1D11E)) // U+1D11E, 2 chars
    assert(encode(clef + clef, Seq(s"$clef $clef")) == Seq(clef + clef))
    assert(encode(clef + "x", Seq.empty) == Seq(clef, "x"))
  }

  test("corpus merge table produces the expected subwords") {
    val m = graft.text.TextQueries.bpeMerges
    assert(encode("the stream join", m) == Seq("the", "stream", "join"))
    assert(encode("data batch key agg", m) == Seq("data", "batch", "key", "agg"))
    // partial merges on words the table only half-covers
    assert(encode("window", m) == Seq("w", "in", "d", "ow"))
  }

  test("duplicate merge entries fail loudly") {
    val e = intercept[Exception] {
      encode("ab", Seq("a b", "a b"))
    }
    assert(e.getMessage.contains("duplicate merge"))
  }
}
