package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the perplexity-filter stand-in a
  * pretraining pipeline runs to rank documents by fluency against a
  * reference corpus (the real thing swaps the estimator for KenLM; the
  * Spark dataflow — train counts, join-score, aggregate per doc — is
  * identical and is what this module makes distributed).
  *
  * Estimator: add-one-smoothed conditional bigram probability,
  * P(w₂|w₁) = (C(w₁w₂) + 1) / (C(w₁·) + V), where C(w₁·) is the
  * bigram-PREFIX count (Σ_w C(w₁w)) and V the corpus vocabulary size.
  * A document's score is the mean natural log-probability over its
  * bigrams — higher = more corpus-like; sub-bigram docs (< 2 tokens)
  * carry no evidence and are absent from the output.
  *
  * Scale shape: training is two hash aggregations over exploded bigrams
  * (corpus-proportional, as any LM estimation must be); scoring joins
  * each document's bigrams against the count tables on (w₁, w₂) — an
  * equi-join AQE can broadcast when the model is small and skew-split
  * when head bigrams are hot — then one per-doc aggregation. Nothing is
  * driver-side; the model is a DataFrame, buildable once and reusable
  * across scoring batches (the [[Model]] is a parameter, like the dedup
  * and ANN indexes).
  */
object LmScore {

  /** Trained model: bigram counts (w1, w2, c12), prefix counts (w1, c1),
    * and the vocabulary size used for smoothing.
    */
  final case class Model(bigrams: DataFrame, prefixes: DataFrame, vocabSize: Long)

  /** (doc_id-ish idCol, w1, w2) — one row per consecutive token pair.
    * Tokens are single-space splits, the same unit `dedup.Shingles` (and
    * its DuckDB `string_split` oracle twin) standardizes on — NOT the
    * \s+ analysis tokenizer. The text splits ONCE; the < 2-token filter
    * runs on the split column BEFORE the transform (sequence(1, 0)
    * counts DOWN in Spark and would fabricate reversed bigrams).
    */
  private def bigramRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i - 1] as w1, toks[i] as w2))")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Train on a reference corpus. */
  def train(corpus: DataFrame, idCol: String, textCol: String): Model = {
    val bg = bigramRows(corpus, idCol, textCol)
    val bigrams = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val prefixes = bigrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = corpus
      .select(explode(split(col(textCol), " ")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    Model(bigrams, prefixes, vocab)
  }

  /** Score documents against a trained model: (idCol, n_bigrams,
    * lm_score = mean ln P(w₂|w₁), 6-dp). Docs with < 2 tokens are absent.
    */
  def score(docs: DataFrame, model: Model, idCol: String, textCol: String): DataFrame =
    bigramRows(docs, idCol, textCol)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.prefixes, Seq("w1"), "left")
      .select(col(idCol),
        log((coalesce(col("c12"), lit(0L)) + lit(1)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + lit(model.vocabSize)).cast("double"))
          .as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 6).as("lm_score"))
}
