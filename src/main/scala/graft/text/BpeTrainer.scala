package graft.text

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge-table TRAINING — the artifact-producing half of
  * the subword story ([[graft.functions.BpeTokens]] is the consuming
  * half): learn the rank-ordered merge list from the corpus itself,
  * classic BPE (Sennrich et al. 2016, public algorithm): start from
  * code-point symbols, repeatedly take the adjacent symbol pair with the
  * highest word-frequency-weighted count and merge ALL its occurrences,
  * N times; the learned list feeds `graft_bpe_tokens` unchanged.
  *
  * Scale shape: training runs on the WORD-FREQUENCY DICT (distinct word,
  * count) — one corpus scan builds it, and every iteration afterwards
  * touches only the dict: one hash aggregation over exploded adjacent
  * pairs (weighted by word count) whose top-1 row — a single pair —
  * reaches the driver, then one narrow regexp_replace applies the merge
  * to the symbol strings. No iteration shuffles anything
  * corpus-proportional; the dict is localCheckpoint'ed per step to keep
  * the plan flat (N chained regex projections would otherwise stack).
  *
  * Determinism: ties on the weighted count break lexicographically on
  * (left, right). Merge application is leftmost-first non-overlapping —
  * the lookbehind/lookahead pattern leaves boundary spaces unconsumed,
  * so adjacent occurrences ("a b a b") all merge in one pass and
  * self-overlap ("a a a") resolves left-first, the same resolution
  * [[graft.functions.BpeTokenizer]] applies at inference.
  *
  * Guarantee the q97 contract leans on: the chosen pair count is
  * NON-INCREASING across steps — a merge can only create pairs (x, ab)
  * with weighted count ≤ count(ab) ≤ the chosen count(a, b), and
  * existing pairs only lose occurrences.
  */
object BpeTrainer {

  /** Learned merges in rank order, with each step's weighted pair count.
    * `mergeStrings` is the "left right" form [[graft.functions.BpeTokens]]
    * consumes.
    */
  final case class Learned(merges: Seq[(String, String, Long)]) {
    def mergeStrings: Seq[String] = merges.map { case (a, b, _) => s"$a $b" }
  }

  /** One merge applied corpus-wide on a space-joined symbol string:
    * leftmost-first, non-overlapping, all occurrences in one pass (the
    * zero-width boundary assertions keep shared spaces available to the
    * next match).
    */
  private[text] def mergePattern(a: String, b: String): String =
    "(?<=^| )" + Pattern.quote(a + " " + b) + "(?= |$)"

  def train(docs: DataFrame, textCol: String, nMerges: Int): Learned = {
    require(nMerges >= 0)
    // Word-frequency dict: symbols start as code points (an empty merge
    // table makes graft_bpe_tokens a pure code-point splitter — one
    // tokenizer, both halves), space-joined so a merge is a string
    // replace.
    var dict = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(
        array_join(
          call_function("graft_bpe_tokens", col("w"), typedlit(Seq.empty[String])),
          " ").as("syms"),
        col("cnt"))
      .localCheckpoint()

    val learned = Seq.newBuilder[(String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      // Weighted adjacent-pair counts over the dict. The < 2-symbol guard
      // runs BEFORE the transform (sequence(1, 0) counts DOWN — the
      // LmScore.bigramRows trap).
      val top = dict
        .select(split(col("syms"), " ").as("ts"), col("cnt"))
        .where(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(ts[i - 1] as a, ts[i] as b))")).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((a, b, pc))
        dict = dict
          .withColumn("syms", regexp_replace(col("syms"),
            lit(mergePattern(a, b)), lit(Matcher.quoteReplacement(a + b))))
          .localCheckpoint()
        step += 1
      }
    }
    Learned(learned.result())
  }
}
