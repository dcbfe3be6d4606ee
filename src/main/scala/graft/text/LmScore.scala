package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the perplexity-filter stand-in a
  * pretraining pipeline runs to rank documents by fluency against a
  * reference corpus (the real thing swaps the estimator for KenLM; the
  * Spark dataflow — train counts, join-score, aggregate per doc — is
  * identical and is what this module makes distributed).
  *
  * Estimator: Witten-Bell INTERPOLATED bigram probability (r8; the r7
  * add-one estimator wasted probability mass uniformly over V and made
  * every unseen continuation equally likely regardless of how promiscuous
  * the history was):
  *
  *   P(w₂|w₁) = (C(w₁w₂) + T(w₁)·P₁(w₂)) / (C(w₁·) + T(w₁))
  *
  * where T(w₁) is the number of DISTINCT continuation types observed
  * after w₁ (the Witten-Bell "novel event" count: histories that were
  * followed by many different words lend more mass to their unigram
  * back-off), C(w₁·) the prefix count, and P₁ the add-one-floored unigram
  * distribution P₁(w) = (C(w)+1)/(N+V) (the floor keeps never-seen words
  * finite; N = corpus token count, V = vocabulary size). A history never
  * seen at all backs off fully: P(w₂|w₁) = P₁(w₂). A document's score is
  * the mean natural log-probability over its bigrams — higher = more
  * corpus-like; sub-bigram docs (< 2 tokens) carry no evidence and are
  * absent from the output.
  *
  * Scale shape: training is three hash aggregations over exploded
  * bigrams/tokens (corpus-proportional, as any LM estimation must be) —
  * bigram counts, prefix counts WITH continuation-type counts (one
  * groupBy computing both: t1 is just count(*) over the bigram-type
  * rows), unigram counts. Scoring joins each document's bigrams against
  * the three count tables on (w₁, w₂), (w₁) and (w₂) — equi-joins AQE
  * broadcasts when the model is small and skew-splits when head tokens
  * are hot — then one per-doc aggregation. Nothing is driver-side; the
  * model is a DataFrame triple, buildable once and reusable across
  * scoring batches (the [[Model]] is a parameter, like the dedup and ANN
  * indexes).
  */
object LmScore {

  /** Trained model: bigram counts (w1, w2, c12), prefix stats (w1,
    * c1 = Σ_w C(w1 w), t1 = |{w : C(w1 w) > 0}|), unigram counts (w, cu),
    * and the corpus token/vocabulary totals for the unigram floor.
    */
  final case class Model(
      bigrams: DataFrame,
      prefixes: DataFrame,
      unigrams: DataFrame,
      nTokens: Long,
      vocabSize: Long)

  /** The default token unit: single-space splits, the same unit
    * `dedup.Shingles` (and its DuckDB `string_split` oracle twin)
    * standardizes on — NOT the \s+ analysis tokenizer. Any
    * array<string>-producing column works as a replacement — q95 passes
    * the BPE subword tokenizer, turning the same estimator into a
    * subword-unit perplexity filter (what production LM filters budget
    * and score in) with zero dataflow change.
    */
  val spaceTokens: Column => Column = split(_, " ")

  /** (doc_id-ish idCol, w1, w2) — one row per consecutive token pair.
    * The text tokenizes ONCE; the < 2-token filter runs on the token
    * column BEFORE the transform (sequence(1, 0) counts DOWN in Spark
    * and would fabricate reversed bigrams).
    */
  private def bigramRows(
      docs: DataFrame, idCol: String, textCol: String,
      tokenizer: Column => Column): DataFrame =
    docs
      .select(col(idCol), tokenizer(col(textCol)).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i - 1] as w1, toks[i] as w2))")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Train on a reference corpus. */
  def train(
      corpus: DataFrame, idCol: String, textCol: String,
      tokenizer: Column => Column = spaceTokens): Model = {
    val bg = bigramRows(corpus, idCol, textCol, tokenizer)
    val bigrams = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    // One aggregation yields BOTH Witten-Bell prefix statistics: the
    // continuation-type count t1 is count(*) over bigram TYPES (not
    // tokens), which is exactly what grouping the distinct-pair count
    // table gives for free.
    val prefixes = bigrams.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("t1"))
    val unigrams = corpus
      .select(explode(tokenizer(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .localCheckpoint()
    val tot = unigrams.agg(sum(col("cu")), count(lit(1))).head()
    Model(bigrams, prefixes, unigrams, tot.getLong(0), tot.getLong(1))
  }

  /** Trigram model (r9 #7): trigram counts plus their Witten-Bell
    * prefix stats, stacked on the full bigram [[Model]] it backs off to.
    */
  final case class Model3(
      trigrams: DataFrame,
      prefixes12: DataFrame,
      base: Model)

  /** (idCol, w1, w2, w3) — one row per consecutive token triple; same
    * guard discipline as [[bigramRows]] (the ≥3 filter runs BEFORE the
    * descending-sequence trap).
    */
  private def trigramRows(
      docs: DataFrame, idCol: String, textCol: String,
      tokenizer: Column => Column): DataFrame =
    docs
      .select(col(idCol), tokenizer(col(textCol)).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col(idCol), explode(expr(
        "transform(sequence(2, size(toks) - 1), " +
          "i -> struct(toks[i - 2] as w1, toks[i - 1] as w2, toks[i] as w3))")).as("tg"))
      .select(col(idCol),
        col("tg.w1").as("w1"), col("tg.w2").as("w2"), col("tg.w3").as("w3"))

  /** Train the trigram estimator: one more hash aggregation over
    * exploded triples (c123) whose grouped re-aggregation yields the
    * order-2 Witten-Bell stats (c12p = Σ_w C(w₁w₂w), t12 = distinct
    * continuation types of the history pair), plus the full bigram model
    * for the recursive back-off. Same corpus-proportional shape as
    * [[train]] — nothing new shuffles more than the trigram type table.
    */
  def trainTrigram(
      corpus: DataFrame, idCol: String, textCol: String,
      tokenizer: Column => Column = spaceTokens): Model3 = {
    val tg = trigramRows(corpus, idCol, textCol, tokenizer)
    val trigrams = tg.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))
      .localCheckpoint()
    val prefixes12 = trigrams.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123")).as("c12p"), count(lit(1)).as("t12"))
    Model3(trigrams, prefixes12, train(corpus, idCol, textCol, tokenizer))
  }

  /** Trigram Witten-Bell scoring — the standard recursive interpolation
    * (the same estimator KenLM's WB mode computes, two orders deep):
    *
    *   P₃(w₃|w₁w₂) = (C(w₁w₂w₃) + T(w₁w₂)·P₂(w₃|w₂)) / (C(w₁w₂·) + T(w₁w₂))
    *
    * backing off to the bigram P₂ (itself backing off to the add-one
    * unigram floor); an unseen history pair uses P₂ outright, an unseen
    * w₂ history uses P₁. Five equi-joins against the model tables —
    * (w₁w₂w₃), (w₁w₂), (w₂w₃), (w₂), (w₃) — then one per-doc
    * aggregation; AQE broadcasts the model side when small, exactly the
    * q88 dataflow one order deeper. Docs with < 3 tokens are absent.
    * The arithmetic SHAPE is mirrored verbatim by the q111 DuckDB
    * oracle so doubles agree at the 6-dp rounding.
    *
    * @return (idCol, n_trigrams, lm_score = mean ln P₃, 6-dp)
    */
  def scoreTrigram(
      docs: DataFrame, model: Model3, idCol: String, textCol: String,
      tokenizer: Column => Column = spaceTokens): DataFrame = {
    val m = model.base
    val pu = (coalesce(col("cu"), lit(0L)) + lit(1)).cast("double") /
      lit((m.nTokens + m.vocabSize).toDouble)
    val p2 = when(col("c1").isNull, pu)
      .otherwise(
        (coalesce(col("c23"), lit(0L)).cast("double") + col("t1").cast("double") * pu) /
          (col("c1") + col("t1")).cast("double"))
    val p3 = when(col("c12p").isNull, p2)
      .otherwise(
        (coalesce(col("c123"), lit(0L)).cast("double") + col("t12").cast("double") * p2) /
          (col("c12p") + col("t12")).cast("double"))
    trigramRows(docs, idCol, textCol, tokenizer)
      .join(model.trigrams, Seq("w1", "w2", "w3"), "left")
      .join(model.prefixes12, Seq("w1", "w2"), "left")
      .join(m.bigrams.select(
        col("w1").as("w2"), col("w2").as("w3"), col("c12").as("c23")),
        Seq("w2", "w3"), "left")
      .join(m.prefixes.select(col("w1").as("w2"), col("c1"), col("t1")),
        Seq("w2"), "left")
      .join(m.unigrams.select(col("w").as("w3"), col("cu")), Seq("w3"), "left")
      .select(col(idCol), log(p3).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), round(avg(col("lp")), 6).as("lm_score"))
  }

  /** Interpolated Kneser-Ney bigram model (r10): the estimator real
    * perplexity filters actually ship (KenLM's default family). On top
    * of the [[Model]] count tables it needs two things Witten-Bell does
    * not: the CONTINUATION count ct(w) = |{w₁ : C(w₁w) > 0}| (how many
    * distinct histories w completes — "Francisco" is frequent but only
    * ever follows "San", so its continuation probability is tiny), and
    * the absolute discount D estimated from the bigram count-of-counts
    * by Ney's formula D = n₁/(n₁+2n₂).
    */
  final case class ModelKn(
      bigrams: DataFrame,       // (w1, w2, c12)
      prefixes: DataFrame,      // (w1, c1, t1)
      continuations: DataFrame, // (w2, ct)
      discount: Double,
      nBigramTypes: Long,
      vocabSize: Long)

  /** Train the interpolated-KN statistics: the same two hash
    * aggregations as [[train]] plus one more GROUPED RE-AGGREGATION of
    * the bigram-type table per side (continuations by w₂, count-of-
    * counts to a single row) — both type-table-proportional, strictly
    * cheaper than the token-proportional count pass. The two driver
    * scalars (D and the type total) are one `head()` each over one-row
    * aggregates.
    */
  def trainKn(
      corpus: DataFrame, idCol: String, textCol: String,
      tokenizer: Column => Column = spaceTokens): ModelKn = {
    val bg = bigramRows(corpus, idCol, textCol, tokenizer)
    val bigrams = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val prefixes = bigrams.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("t1"))
    val continuations = bigrams.groupBy(col("w2")).agg(count(lit(1)).as("ct"))
    val cc = bigrams.agg(
      sum(when(col("c12") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("c12") === 2, 1L).otherwise(0L)).as("n2"),
      count(lit(1)).as("tt")).head()
    val (n1, n2, tt) = (cc.getLong(0), cc.getLong(1), cc.getLong(2))
    // Ney discount; 0.5 when the corpus has no singleton/doubleton
    // evidence at all (degenerate tiny corpora — any constant in (0,1)
    // is admissible, the oracle mirrors the same guard).
    val d = if (n1 + 2 * n2 > 0) n1.toDouble / (n1 + 2 * n2).toDouble else 0.5
    val v = corpus.select(explode(tokenizer(col(textCol))).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    ModelKn(bigrams, prefixes, continuations, d, tt, v)
  }

  /** Interpolated Kneser-Ney scoring:
    *
    *   P(w₂|w₁) = (max(C(w₁w₂) − D, 0) + D·T(w₁)·Pc(w₂)) / C(w₁·)
    *   Pc(w)    = (ct(w) + 1) / (T + V)
    *
    * for a seen history; an unseen history backs off to Pc(w₂) outright.
    * Pc is the continuation distribution (add-one-floored over the T
    * bigram types + V vocabulary so never-seen words stay finite — the
    * same floor discipline as [[score]]'s unigram). The discounted mass
    * D·T(w₁) is exactly what the max(·−D, 0) subtraction frees — the
    * estimator normalizes up to the deliberate floor inflation (pure KN
    * with Pc = ct/T sums to 1 but scores OOV at ln 0). Dataflow is
    * identical to [[score]]: three model equi-joins, one per-doc
    * aggregation; the arithmetic SHAPE is mirrored by the q115 DuckDB
    * oracle so doubles agree at the 6-dp rounding.
    *
    * @return (idCol, n_bigrams, lm_score = mean ln P, 6-dp)
    */
  def scoreKn(
      docs: DataFrame, model: ModelKn, idCol: String, textCol: String,
      tokenizer: Column => Column = spaceTokens): DataFrame = {
    val pc = (coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
      lit((model.nBigramTypes + model.vocabSize).toDouble)
    val p = when(col("c1").isNull, pc)
      .otherwise(
        (greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(model.discount), lit(0.0)) +
          lit(model.discount) * col("t1").cast("double") * pc) /
          col("c1").cast("double"))
    bigramRows(docs, idCol, textCol, tokenizer)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.prefixes, Seq("w1"), "left")
      .join(model.continuations, Seq("w2"), "left")
      .select(col(idCol), log(p).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 6).as("lm_score"))
  }

  /** Score documents against a trained model: (idCol, n_bigrams,
    * lm_score = mean ln P(w₂|w₁), 6-dp). Docs with < 2 tokens are absent.
    */
  def score(
      docs: DataFrame, model: Model, idCol: String, textCol: String,
      tokenizer: Column => Column = spaceTokens): DataFrame = {
    // Unigram floor P₁(w₂) = (C(w₂)+1)/(N+V); the arithmetic SHAPE below
    // (cast points, operation order) is mirrored verbatim by the q88
    // DuckDB oracle so doubles agree to the 6-dp rounding.
    val pu = (coalesce(col("cu"), lit(0L)) + lit(1)).cast("double") /
      lit((model.nTokens + model.vocabSize).toDouble)
    bigramRows(docs, idCol, textCol, tokenizer)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.prefixes, Seq("w1"), "left")
      .join(model.unigrams.withColumnRenamed("w", "w2"), Seq("w2"), "left")
      .select(col(idCol),
        when(col("c1").isNull, log(pu))
          .otherwise(log(
            (coalesce(col("c12"), lit(0L)).cast("double") + col("t1").cast("double") * pu) /
              (col("c1") + col("t1")).cast("double")))
          .as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 6).as("lm_score"))
  }
}
