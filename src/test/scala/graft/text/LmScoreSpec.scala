package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // corpus: bigrams (a,b)×2, (a,c)×1; prefix C(a·)=3; vocab {a,b,c} = 3
  private val corpus = Seq(
    (1L, "a b"), (2L, "a b"), (3L, "a c")
  ).toDF("doc_id", "text")

  test("hand-computed add-one bigram scores") {
    val model = LmScore.train(corpus, "doc_id", "text")
    assert(model.vocabSize == 3L)
    val scores = LmScore.score(corpus, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // P(b|a) = (2+1)/(3+3) = 0.5; P(c|a) = (1+1)/(3+3) = 1/3
    assert(scores(1L)._1 == 1L)
    assert(math.abs(scores(1L)._2 - math.log(0.5)) < 1e-5)
    assert(scores(1L) == scores(2L))
    assert(math.abs(scores(3L)._2 - math.log(1.0 / 3.0)) < 1e-5)
  }

  test("corpus-like text outranks novel text; sub-bigram docs are absent") {
    val model = LmScore.train(corpus, "doc_id", "text")
    val probe = Seq(
      (10L, "a b"),      // trained bigram
      (11L, "z q"),      // never-seen bigram
      (12L, "a")         // sub-bigram: no evidence
    ).toDF("doc_id", "text")
    val out = LmScore.score(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(10L, 11L))
    assert(out(10L) > out(11L), s"fluent text must outrank novel text: $out")
  }
}
