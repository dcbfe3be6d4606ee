package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency-seeded subword vocabulary + greedy longest-match
  * tokenization — the WordPiece-family pipeline beside [[BpeTrainer]]'s
  * merge-table path. The trainer here is the SEED step of the
  * WordPiece/Unigram recipes (substring frequencies weighted by word
  * counts), not the likelihood iteration: deliberately, because the
  * seed is already a usable subword vocabulary, every step is exactly
  * replayable relationally (the q152 oracle), and the likelihood loop's
  * fp-tie semantics are engine-dependent in a way a hash gate cannot
  * pin. Single characters always enter the vocabulary regardless of
  * rank, so greedy tokenization of corpus text never needs an unknown
  * token (characters outside the corpus fall back per
  * [[graft.functions.WordPieceTokenizer]]).
  *
  * Scale shape: one explode of bounded fan-out (≤ maxPieceLen positions
  * per character) into one partial-aggregated count — the same cost
  * class as shingling — then a bounded top-k. The apply step is a
  * per-row codegen kernel with the vocabulary as a reference object.
  */
object WordPiece {

  /** (piece, weight) vocabulary: every single character of the corpus
    * plus the `topMulti` heaviest multi-character substrings (length ≤
    * `maxPieceLen`), weight = total corpus occurrences (word frequency ×
    * positions). Deterministic: ties break on the piece string.
    */
  def trainVocab(
      docs: DataFrame,
      textCol: String,
      topMulti: Int = 30,
      maxPieceLen: Int = 6
  ): DataFrame = {
    require(topMulti > 0 && maxPieceLen > 1,
      s"need topMulti > 0 and maxPieceLen > 1, got $topMulti/$maxPieceLen")
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
    val weights = words
      .withColumn("i", explode(sequence(lit(1), length(col("word")))))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word")) - col("i") + lit(1)))))
      .select(expr("substring(word, i, l)").as("piece"), col("wc"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("weight"))
    val chars = weights.filter(length(col("piece")) === 1)
    val multi = weights.filter(length(col("piece")) > 1)
      .orderBy(col("weight").desc, col("piece")).limit(topMulti)
    chars.unionByName(multi)
  }

  /** Greedy longest-match tokenization column over a trained vocabulary
    * (collected once — bounded at topMulti + corpus alphabet size).
    */
  def tokens(text: Column, vocab: Seq[String]): Column =
    call_function("graft_wordpiece", text, typedlit(vocab))

  /** Optimal (Viterbi DP) segmentation over the same weighted vocabulary
    * — fewest pieces per word, ties to the heaviest total weight
    * ([[graft.functions.ViterbiSegmenter]]); never emits more pieces
    * than [[tokens]]'s greedy matcher.
    */
  def viterbiTokens(text: Column, pieces: Seq[String], weights: Seq[Long]): Column =
    call_function("graft_viterbi", text, typedlit(pieces), typedlit(weights))

  /** struct(n_tokens, sum_weight) of the optimal segmentation — the
    * hash-gateable objective values without path reconstruction.
    */
  def viterbiStats(text: Column, pieces: Seq[String], weights: Seq[Long]): Column =
    call_function("graft_viterbi_stats", text, typedlit(pieces), typedlit(weights))
}
