package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Planted separable corpus: positives carry "good" markers, negatives
  // "bad" ones, shared filler in both.
  private def planted = (0 until 200).map { i =>
    if (i % 2 == 0) (i.toLong, s"alpha beta good$i quality fine text", 1)
    else (i.toLong, s"alpha beta spam junk noise$i text", 0)
  }.toDF("id", "text", "label")

  test("loss decreases monotonically and classes separate on planted data") {
    val m = QualityClassifier.train(planted, "text", "label", dim = 64, iters = 30, lr = 0.1)
    info(s"losses: ${m.lossHistory.take(5).map(l => f"$l%.5f").mkString(", ")} … " +
      f"${m.lossHistory.last}%.5f")
    m.lossHistory.zip(m.lossHistory.tail).zipWithIndex.foreach { case ((a, b), i) =>
      assert(b < a, f"loss rose at step $i: $a%.8f -> $b%.8f")
    }
    val scored = planted.select(col("label"), m.score(col("text")).as("z"))
      .groupBy("label").agg(avg("z").as("mz"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(scored(1) > scored(0), s"positives must outscore negatives: $scored")
  }

  test("real-corpus training (q94 configuration) keeps the loss monotone") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"),
        array_contains(split(col("text"), " "), "spark").cast("int").as("label"))
    val m = QualityClassifier.train(d, "text", "label", dim = 64, iters = 30, lr = 0.02)
    info(s"losses: ${m.lossHistory.take(6).map(l => f"$l%.5f").mkString(", ")} … " +
      f"${m.lossHistory.last}%.5f")
    val rises = m.lossHistory.zip(m.lossHistory.tail).count { case (a, b) => b >= a }
    assert(rises == 0, s"$rises non-decreasing steps")
  }

  test("hash parity cases: single supplementary code point stays in range") {
    val clef = new String(Character.toChars(0x1D11E))
    val h = graft.functions.HashedLogit.hashToken(clef, 64)
    assert(h == 0x1D11E % 64)
    assert(graft.functions.HashedLogit.hashToken("ab", 64) == ('a' * 31 + 'b') % 64)
  }

  test("training on an empty frame fails loudly") {
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(planted.where(lit(false)), "text", "label")
    }
    assert(e.getMessage.contains("empty"))
  }
}
