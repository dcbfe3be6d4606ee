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
  * pairs (weighted by word count) whose top rows reach the driver, then
  * one narrow projection applies a BATCH of merges to the symbol
  * strings. No iteration shuffles anything corpus-proportional; the
  * dict is localCheckpoint'ed per batch to keep the plan flat.
  *
  * Batched-merge exactness (r9 verdict #2 — a 32k-vocab train must not
  * be 32k strictly serial driver round trips): per iteration the driver
  * takes the count-sorted pair list and accepts the maximal PREFIX whose
  * pairs are mutually symbol-disjoint, truncated to counts STRICTLY
  * above the first conflicting pair's count. That batch is provably the
  * exact sequence sequential BPE would pick:
  *   - symbol-disjoint merges cannot overlap positionally, so applying
  *     one leaves every other accepted pair's count unchanged (and an
  *     applied pair cannot reappear — no disjoint merge can create its
  *     adjacency);
  *   - a merge (a,b)→ab only creates pairs (x,ab)/(ab,y) whose weighted
  *     count is bounded by count(x,a)/count(b,y) — pairs SHARING a
  *     symbol with an accepted pair, which by the prefix construction
  *     all rank after it, so every created pair's count is ≤ the first
  *     conflict's count < every accepted count (strict truncation kills
  *     the lexicographic-tie hazard);
  *   - original pairs only ever lose occurrences, so nothing below the
  *     prefix can climb over it — PROVIDED no accepted concatenation
  *     a+b collides with a symbol string already in the table (then the
  *     merge would mint tokens equal to an existing symbol and pairs on
  *     that symbol could GAIN occurrences mid-batch, additively beating
  *     the bound). Initial symbols are single code points and every
  *     multi-point symbol is a concatenation this driver minted, so the
  *     prefix scan simply stops at any pair whose a+b is in the
  *     driver-tracked created-symbol set; with that guard, accepted
  *     replaces touch only fresh symbol strings and are
  *     order-independent.
  * When strict truncation empties the batch (top two pairs tie on count
  * and share a symbol), the top-1 pair alone is applied — the classic
  * sequential step, always exact. `BpeTrainerSpec` pins batched ≡
  * sequential (batchCap=1) merge-for-merge on the textbook corpus.
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

  /** Pairs accepted per driver round trip under the exactness rule
    * above. The cap bounds the chained-regex projection width (and the
    * lookahead collect, 4× this, stays a few thousand small rows); any
    * prefix truncation preserves exactness, so the cap is a latency
    * knob, not a semantics one.
    */
  private val DefaultBatchCap = 256

  def train(docs: DataFrame, textCol: String, nMerges: Int): Learned =
    train(docs, textCol, nMerges, DefaultBatchCap)

  /** @param batchCap max merges accepted per driver round trip;
    *                 `batchCap = 1` is exactly the classic sequential
    *                 loop (the spec's equivalence baseline).
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int, batchCap: Int): Learned = {
    require(nMerges >= 0)
    require(batchCap >= 1)
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
    // Every multi-code-point symbol the table can contain is a
    // concatenation minted by a previous accepted merge (initial symbols
    // are single code points); this set backs the collision guard above.
    val createdSymbols = scala.collection.mutable.HashSet.empty[String]
    var done = 0
    var exhausted = false
    while (done < nMerges && !exhausted) {
      // Weighted adjacent-pair counts over the dict, top `lookahead`
      // rows to the driver (the batch plus enough tail to locate the
      // first conflicting pair that bounds it). The < 2-symbol guard
      // runs BEFORE the transform (sequence(1, 0) counts DOWN — the
      // LmScore.bigramRows trap).
      val lookahead = math.max(batchCap * 4, 64)
      val rows = dict
        .select(split(col("syms"), " ").as("ts"), col("cnt"))
        .where(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(ts[i - 1] as a, ts[i] as b))")).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("a"), col("b"))
        .limit(lookahead)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (rows.isEmpty) exhausted = true
      else {
        // Maximal symbol-disjoint prefix, then strict-truncate to counts
        // above the bound on any merge-created pair: the first conflict
        // seen, or — when the collect was truncated before any conflict —
        // the last collected count (unseen pairs can only be ≤ it).
        val used = scala.collection.mutable.HashSet.empty[String]
        var i = 0
        var conflictAt = -1
        while (i < rows.length && conflictAt < 0) {
          val (a, b, _) = rows(i)
          if (used.contains(a) || used.contains(b) ||
            createdSymbols.contains(a + b) || used.contains(a + b)) conflictAt = i
          else { used += a; used += b; used += a + b; i += 1 }
        }
        val bound =
          if (conflictAt >= 0) rows(conflictAt)._3
          else if (rows.length >= lookahead) rows.last._3
          else -1L
        val prefix = rows.take(i).takeWhile(_._3 > bound)
        // An empty strict prefix (top pairs tie on count and share a
        // symbol) falls back to the always-exact sequential single step.
        val batch = (if (prefix.isEmpty) rows.take(1) else prefix)
          .take(math.min(batchCap, nMerges - done))
        learned ++= batch
        batch.foreach { case (a, b, _) => createdSymbols += a + b }
        // All accepted merges in ONE projection: symbol-disjointness
        // makes the chained replaces order-independent; rank order is
        // kept for determinism of the regex composition.
        val merged = batch.foldLeft(col("syms")) { case (c, (a, b, _)) =>
          regexp_replace(c, lit(mergePattern(a, b)), lit(Matcher.quoteReplacement(a + b)))
        }
        dict = dict.withColumn("syms", merged).localCheckpoint()
        done += batch.size
      }
    }
    Learned(learned.result())
  }
}
