package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // corpus: bigrams (a,b)×2, (a,c)×1; prefix C(a·)=3, T(a)=2 followers;
  // tokens a,b,a,b,a,c → N=6; vocab {a,b,c} → V=3; unigram floor
  // P₁(w) = (C(w)+1)/9: P₁(b) = 3/9, P₁(c) = 2/9
  private val corpus = Seq(
    (1L, "a b"), (2L, "a b"), (3L, "a c")
  ).toDF("doc_id", "text")

  test("hand-computed Witten-Bell interpolated scores") {
    val model = LmScore.train(corpus, "doc_id", "text")
    assert(model.vocabSize == 3L)
    assert(model.nTokens == 6L)
    val scores = LmScore.score(corpus, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // P(b|a) = (2 + 2·(3/9)) / (3+2) = (8/3)/5 = 8/15
    // P(c|a) = (1 + 2·(2/9)) / (3+2) = (13/9)/5 = 13/45
    assert(scores(1L)._1 == 1L)
    assert(math.abs(scores(1L)._2 - math.log(8.0 / 15.0)) < 1e-5)
    assert(scores(1L) == scores(2L))
    assert(math.abs(scores(3L)._2 - math.log(13.0 / 45.0)) < 1e-5)
  }

  test("promiscuous history lends more back-off mass than a faithful one") {
    // The Witten-Bell property the add-one estimator lacked: after "x"
    // (always followed by the SAME word, T=1) an unseen continuation is
    // less expected than after "y" (three different followers, T=3),
    // even with equal prefix counts C(x·) = C(y·) = 3.
    val c = Seq(
      (1L, "x m x m x m"),
      (2L, "y p y q y r")
    ).toDF("doc_id", "text")
    val model = LmScore.train(c, "doc_id", "text")
    val probe = Seq((10L, "x zz"), (11L, "y zz")).toDF("doc_id", "text")
    val out = LmScore.score(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(11L) > out(10L),
      s"unseen continuation must be MORE probable after the many-follower history: $out")
  }

  test("a custom tokenizer changes only the token unit, not the estimator") {
    // dash-split "a-b" must score exactly like space-split "a b"
    val dashCorpus = Seq((1L, "a-b"), (2L, "a-b"), (3L, "a-c")).toDF("doc_id", "text")
    val dashTok: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      split(_, "-")
    val mSpace = LmScore.train(corpus, "doc_id", "text")
    val mDash = LmScore.train(dashCorpus, "doc_id", "text", dashTok)
    val a = LmScore.score(corpus, mSpace, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = LmScore.score(dashCorpus, mDash, "doc_id", "text", dashTok)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("hand-computed interpolated Kneser-Ney scores") {
    // bigram types: (a,b) c12=2, (a,c) c12=1 → n1=1, n2=1, T=2
    // D = 1/(1+2·1) = 1/3; prefixes: C(a·)=3, T(a)=2
    // continuations: ct(b)=ct(c)=1; V=3 → Pc(b)=Pc(c)=(1+1)/(2+3)=2/5
    val model = LmScore.trainKn(corpus, "doc_id", "text")
    assert(model.nBigramTypes == 2L)
    assert(model.vocabSize == 3L)
    assert(math.abs(model.discount - 1.0 / 3.0) < 1e-12)
    val out = LmScore.scoreKn(corpus, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // P(b|a) = (max(2−1/3,0) + (1/3)·2·(2/5)) / 3 = (5/3 + 4/15)/3 = 29/45
    // P(c|a) = (max(1−1/3,0) + 4/15) / 3 = (2/3 + 4/15)/3 = 14/45
    assert(out(1L)._1 == 1L)
    assert(math.abs(out(1L)._2 - math.log(29.0 / 45.0)) < 1e-5)
    assert(out(1L) == out(2L))
    assert(math.abs(out(3L)._2 - math.log(14.0 / 45.0)) < 1e-5)
  }

  test("Kneser-Ney: continuation counts are type-based, not frequency-based") {
    // "san francisco" repeated: francisco is FREQUENT (cu=3) but only
    // ever follows san (ct=1); "the" follows three different histories
    // (ct=3) with the same total frequency. After an unseen history,
    // KN must prefer the promiscuous continuation; a frequency-backed
    // estimator (WB's unigram) prefers neither or the frequent one.
    val c = Seq(
      (1L, "san francisco san francisco san francisco"),
      (2L, "a the b the c the")
    ).toDF("doc_id", "text")
    val model = LmScore.trainKn(c, "doc_id", "text")
    val probe = Seq((10L, "zz francisco"), (11L, "zz the")).toDF("doc_id", "text")
    val out = LmScore.scoreKn(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(11L) > out(10L),
      s"many-history continuation must beat the one-history one after an unseen history: $out")
  }

  test("corpus-like text outranks novel text; sub-bigram docs are absent") {
    val model = LmScore.train(corpus, "doc_id", "text")
    val probe = Seq(
      (10L, "a b"),      // trained bigram
      (11L, "z q"),      // never-seen history: full unigram back-off
      (12L, "a")         // sub-bigram: no evidence
    ).toDF("doc_id", "text")
    val out = LmScore.score(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(10L, 11L))
    // unseen-history back-off: P = P₁(q) = (0+1)/9
    assert(math.abs(out(11L) - math.log(1.0 / 9.0)) < 1e-5)
    assert(out(10L) > out(11L), s"fluent text must outrank novel text: $out")
  }
}
