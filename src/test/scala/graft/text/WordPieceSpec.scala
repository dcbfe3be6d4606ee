package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def tok(text: String, vocab: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(WordPiece.tokens(col("t"), vocab).as("p"))
      .head.getSeq[String](0)

  test("greedy longest match consumes the longest piece at each cursor") {
    val v = Seq("a", "b", "c", "ab", "abc", "bc")
    assert(tok("abcab", v) == Seq("abc", "ab"))
    assert(tok("cba", v) == Seq("c", "b", "a"))
    // greedy is not optimal: "abc" wins over "a"+"bc" even if tied elsewhere
    assert(tok("abc", v) == Seq("abc"))
  }

  test("words split on spaces; unknown characters emit themselves") {
    val v = Seq("a", "ab")
    assert(tok("ab a", v) == Seq("ab", "a"))
    assert(tok("ax", v) == Seq("a", "x")) // x outside the vocab
    assert(tok("", v) == Seq.empty)
  }

  test("trainVocab: all corpus chars present, top multi-pieces by weight then piece") {
    val d = Seq("aa ab", "aa", "zq").toDF("text")
    val vocab = WordPiece.trainVocab(d, "text", topMulti = 2, maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // chars: a (aa×2 contributes 4, ab contributes 1 → 5), b=1, z=1, q=1
    assert(vocab("a") == 5L && vocab("b") == 1L && vocab("z") == 1L && vocab("q") == 1L)
    // multi candidates: aa(2), ab(1), zq(1) — top 2 with piece tiebreak: aa, ab
    assert(vocab.contains("aa") && vocab.contains("ab") && !vocab.contains("zq"))
  }

  test("round trip: concatenated pieces rebuild each word") {
    val d = Seq("spark merge window table", "window spark spark").toDF("text")
    val vocab = WordPiece.trainVocab(d, "text").select("piece")
      .collect().map(_.getString(0)).toSeq
    val ok = d.select(col("text"),
        concat_ws(" ", WordPiece.tokens(col("text"), vocab)).as("nospace"))
      .collect()
      .forall(r => r.getString(1).replace(" ", "") == r.getString(0).replace(" ", ""))
    assert(ok)
  }
}
