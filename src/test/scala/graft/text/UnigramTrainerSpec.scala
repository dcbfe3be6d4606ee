package graft.text

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class UnigramTrainerSpec extends SparkSpec {

  private def corpus(rows: Seq[String], partitions: Int = 2): DataFrame = {
    import spark.implicits._
    rows.toDF("text").repartition(partitions)
  }

  // The textbook merge corpus: "est" is the dominant multi-char unit.
  private val textbook = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest")

  private def charAlphabet(rows: Seq[String]): Set[String] =
    rows.flatMap(_.replaceAll("\\s", "").toSeq.map(_.toString)).toSet

  test("vocabulary reaches the target and keeps the whole alphabet") {
    val alphabet = charAlphabet(textbook)
    val cfg = UnigramTrainer.Config(maxPieceLen = 4, minCount = 1,
      maxCandidates = 512, target = alphabet.size + 4, pruneFrac = 0.3)
    val vocab = UnigramTrainer.train(corpus(textbook), "text", cfg)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // usage output lists pieces actually used; the alphabet chars that
    // survive as pieces-in-use must all come from the corpus
    assert(vocab.map(_._1).forall(p => p.forall(c => alphabet(c.toString))))
    assert(vocab.length <= cfg.target)
    assert(vocab.forall(_._2 > 0))
  }

  test("usage accounting is exact: piece-length-weighted usage covers the corpus") {
    val cfg = UnigramTrainer.Config(maxPieceLen = 4, minCount = 1,
      maxCandidates = 512, target = 20, pruneFrac = 0.3)
    val vocab = UnigramTrainer.train(corpus(textbook), "text", cfg)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val coveredChars = vocab.map { case (p, u) => p.length.toLong * u }.sum
    val corpusChars = textbook.map(_.replaceAll("\\s", "").length.toLong).sum
    assert(coveredChars == corpusChars)
  }

  test("a frequent multi-char unit survives pruning") {
    val cfg = UnigramTrainer.Config(maxPieceLen = 4, minCount = 1,
      maxCandidates = 512, target = charAlphabet(textbook).size + 4,
      pruneFrac = 0.3)
    val vocab = UnigramTrainer.train(corpus(textbook), "text", cfg)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(vocab.keys.exists(_.length > 1), s"no multi-char piece in ${vocab.keys}")
    // "est" appears in 9 of 16 words (newest ×6, widest ×3) — the
    // highest-value unit; it (or a superstring) must survive
    assert(vocab.keys.exists(p => p.contains("est")), s"est-family absent: ${vocab.keys}")
  }

  test("deterministic across partition counts") {
    val cfg = UnigramTrainer.Config(maxPieceLen = 4, minCount = 1,
      maxCandidates = 256, target = 24, pruneFrac = 0.25)
    val a = UnigramTrainer.train(corpus(textbook, 1), "text", cfg)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = UnigramTrainer.train(corpus(textbook, 7), "text", cfg)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("an unreachable target fails loudly instead of looping or under-delivering") {
    val e = intercept[IllegalArgumentException](
      UnigramTrainer.train(corpus(textbook), "text",
        UnigramTrainer.Config(maxPieceLen = 4, minCount = 1,
          maxCandidates = 64, target = 2, maxRounds = 3)).collect())
    assert(e.getMessage.contains("stalled"))
  }
}
