package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // The classic BPE example corpus: low x5, lower x2, newest x6, widest x3.
  // Weighted pair counts, step 0: (e,s) 9, (s,t) 9, (w,e) 8, (l,o) 7,
  // (o,w) 7, (e,w) 6, (n,e) 6, ... -> tie at 9 breaks lexicographically:
  // (e,s) first. Step 1: es+t -> (es,t) 9 wins. Step 2: (l,o) 7 vs
  // (o,w) 7 -> (l,o). Step 3: (lo,w) 7.
  private val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).map(w => Tuple1(w)).toDF("text")

  test("learns the textbook merges in order with exact weighted counts") {
    val l = BpeTrainer.train(corpus, "text", nMerges = 4)
    assert(l.merges == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("learned table feeds graft_bpe_tokens round-trip") {
    val l = BpeTrainer.train(corpus, "text", nMerges = 4)
    val toks = Seq("newest lowest low")
      .toDF("t")
      .select(TextAnalysis.bpeTokens(col("t"), l.mergeStrings).as("bpe"))
      .as[Seq[String]].head()
    assert(toks == Seq("n", "e", "w", "est", "low", "est", "low"))
  }

  test("chosen pair counts never increase; merge application handles overlap") {
    val l = BpeTrainer.train(corpus, "text", nMerges = 8)
    val counts = l.merges.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, counts)

    // adjacent occurrences all merge in one pass; self-overlap goes left-first
    val aa = (Seq.fill(3)("abab") ++ Seq.fill(2)("aaa")).map(Tuple1(_)).toDF("text")
    val l2 = BpeTrainer.train(aa, "text", nMerges = 1)
    // pairs: (a,b) 2x3=6, (b,a) 3, (a,a) 2x2=4 -> (a,b) wins
    assert(l2.merges == Seq(("a", "b", 6L)))
  }

  test("batched training is merge-for-merge identical to sequential") {
    // Small alphabet (base-4 digit strings from a deterministic integer
    // hash) forces dense pair-count ties, symbol conflicts, and
    // created-symbol collisions — every guard path in the batched
    // selector. batchCap=1 IS the classic sequential loop; any batch
    // size must reproduce its exact (pair, count) sequence.
    val words = (1 to 300)
      .map(i => java.lang.Integer.toString((i * 0x9E3779B9).abs & 0x7fffffff, 4))
      .map(Tuple1(_)).toDF("text")
    val sequential = BpeTrainer.train(words, "text", nMerges = 40, batchCap = 1)
    assert(sequential.merges.size == 40)
    for (cap <- Seq(3, 256)) {
      val batched = BpeTrainer.train(words, "text", nMerges = 40, batchCap = cap)
      assert(batched.merges == sequential.merges, s"batchCap=$cap diverged")
    }
    // and on the textbook corpus, where the first batch must shrink to a
    // single step (top two pairs tie at 9 and share a symbol)
    val seqText = BpeTrainer.train(corpus, "text", nMerges = 8, batchCap = 1)
    assert(BpeTrainer.train(corpus, "text", nMerges = 8).merges == seqText.merges)
  }

  test("runs out of pairs gracefully") {
    val tiny = Seq("ab ab", "ab").map(Tuple1(_)).toDF("text")
    val l = BpeTrainer.train(tiny, "text", nMerges = 10)
    // "ab" -> one merge (a,b) count 3 (word "ab" x3), then single-symbol words only
    assert(l.merges == Seq(("a", "b", 3L)))
  }
}
