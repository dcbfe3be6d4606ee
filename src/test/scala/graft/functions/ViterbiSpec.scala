package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.WordPiece

/** The Viterbi segmenter's contract: global optimality (brute-force
  * differential), strict wins over greedy longest-match, deterministic
  * tie-breaking, unknown-character fallback, and tokens/stats agreement.
  */
class ViterbiSpec extends SparkSpec {

  import spark.implicits._

  private def run(text: String, pieces: Seq[String], weights: Seq[Long]) = {
    val row = Seq(text).toDF("t")
      .select(
        WordPiece.viterbiTokens(col("t"), pieces, weights).as("toks"),
        WordPiece.viterbiStats(col("t"), pieces, weights).as("st"),
        WordPiece.tokens(col("t"), pieces).as("greedy"))
      .head()
    (row.getSeq[String](0), row.getStruct(1).getLong(0),
      row.getStruct(1).getLong(1), row.getSeq[String](2))
  }

  test("viterbi strictly beats greedy when longest-match strands the cursor") {
    val pieces = Seq("abc", "ab", "cde", "a", "b", "c", "d", "e")
    val weights = pieces.map(_ => 1L)
    val (toks, n, _, greedy) = run("abcde", pieces, weights)
    assert(greedy == Seq("abc", "d", "e")) // longest-match dead-ends
    assert(toks == Seq("ab", "cde") && n == 2L)
  }

  test("matches brute-force enumeration on every split of random words") {
    val pieces = Seq("ab", "ba", "aab", "bb", "a", "b")
    val weights = Seq(10L, 7L, 30L, 9L, 1L, 2L)
    val wmap = pieces.zip(weights).toMap
    def best(word: String): (Long, Long) = {
      // enumerate all 2^(n-1) segmentations
      val n = word.length
      var bestCnt = Long.MaxValue
      var bestSw = Long.MinValue
      for (mask <- 0 until (1 << (n - 1))) {
        val cuts = (0 until n - 1).filter(i => (mask & (1 << i)) != 0)
        val bounds = 0 +: cuts.map(_ + 1) :+ n
        val segs = bounds.sliding(2).map { case Seq(a, b) => word.substring(a, b) }.toSeq
        if (segs.forall(s => wmap.contains(s) || s.length == 1)) {
          val c = segs.length.toLong
          val v = segs.map(s => wmap.getOrElse(s, 0L)).sum
          if (c < bestCnt || (c == bestCnt && v > bestSw)) { bestCnt = c; bestSw = v }
        }
      }
      (bestCnt, bestSw)
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 40) {
      val word = (1 to (2 + rnd.nextInt(7))).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      val (toks, n, sw, _) = run(word, pieces, weights)
      val (bc, bs) = best(word)
      assert((n, sw) == (bc, bs), s"word=$word got ($n,$sw) want ($bc,$bs)")
      assert(toks.mkString == word, s"tokens must concatenate back to $word")
      assert(toks.length.toLong == n)
    }
  }

  test("unknown characters fall back to weight-0 singles") {
    val (toks, n, sw, _) = run("axb", Seq("ab", "a", "b"), Seq(5L, 1L, 1L))
    assert(toks == Seq("a", "x", "b") && n == 3L && sw == 2L)
  }

  test("tie on (count, weight) keeps the longest last piece") {
    // "abab": {"ab" w=3} vs {"aba","b"}... construct an exact tie:
    // pieces "ab"(2)+"ab"(2) vs "a"(1)+"bab"(3): both 2 pieces, weight 4
    val pieces = Seq("ab", "bab", "a", "b")
    val weights = Seq(2L, 3L, 1L, 0L)
    val (toks, n, sw, _) = run("abab", pieces, weights)
    assert(n == 2L && sw == 4L)
    // longest LAST piece wins the tie: "a" + "bab"
    assert(toks == Seq("a", "bab"), toks.toString)
  }

  test("multi-word text sums stats across words and stays in codegen") {
    val pieces = Seq("ab", "a", "b")
    val weights = Seq(5L, 1L, 1L)
    val (toks, n, sw, _) = run("ab a\tb", pieces, weights)
    assert(toks == Seq("ab", "a", "b") && n == 3L && sw == 7L)
    // codegen containment needs a real scan (a local relation folds to
    // LocalTableScan with no codegen stage at all)
    val plan = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(WordPiece.viterbiStats(col("text"), pieces, weights))
      .queryExecution.executedPlan.toString
    // the "*(1)" stage marker = the projection runs inside
    // WholeStageCodegen (executedPlan.toString prints the marker, not
    // the wrapper's class name)
    assert(plan.contains("*(1) Project [graft_viterbi_stats"), plan)
  }
}
