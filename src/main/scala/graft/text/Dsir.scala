package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * the standard recipe for skewing a raw crawl toward a high-quality
  * target distribution: fit simple n-gram language models to the TARGET
  * corpus and the RAW corpus, score every raw document by its
  * importance log-ratio Σ ln(p_target(f)/p_raw(f)) over the document's
  * features, and keep the top of the ranking. The paper hashes features
  * into 10k buckets as a memory optimization for a single machine; the
  * distributed formulation has no such constraint, so this module keeps
  * EXACT word-level unigram + bigram features — strictly more faithful,
  * and fully relational (every count, total, and ratio is recomputable
  * by the DuckDB oracle, which a hashed variant would not be).
  *
  * Scale shape: feature extraction explodes each corpus once
  * (token-proportional, as any estimator must be); the model is ONE
  * outer-merged count table (feature, ct, cr) — built by a single
  * full-outer groupBy-join over the two type tables — plus three scalar
  * totals from one-row aggregates. Scoring is one equi-join of exploded
  * doc features against the model (AQE broadcasts it when small) and a
  * per-doc aggregation. Selection is `TakeOrderedAndProject`
  * (O(n log k) heaps per partition, no global sort shuffle). Nothing is
  * driver-side except the three totals.
  */
object Dsir {

  /** Fitted importance model: `features` = (feat, ct, cr) — the count
    * of each feature type in the target and raw corpora (absent side
    * 0) — plus the corpus feature totals and the add-one vocabulary
    * (distinct feature types across BOTH corpora, so the two smoothed
    * distributions share one support).
    */
  final case class Model(
      features: DataFrame,
      nTarget: Long,
      nRaw: Long,
      vocabSize: Long)

  /** (idCol, feat) — one row per unigram and per space-joined bigram
    * occurrence. The same single-space token unit as [[LmScore]] /
    * `dedup.Shingles` (and their `string_split` oracle twins).
    */
  def featureRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("toks"))
    val uni = toks.select(col(idCol), explode(col("toks")).as("feat"))
    val bi = toks
      .where(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(toks[i - 1], ' ', toks[i]))")).as("feat"))
    uni.unionByName(bi)
  }

  /** Fit target + raw feature counts. One count aggregation per corpus,
    * one full-outer merge on the TYPE tables (never the token streams),
    * two one-row total reads.
    */
  def train(
      target: DataFrame, raw: DataFrame, idCol: String, textCol: String): Model = {
    def counts(corpus: DataFrame, out: String): DataFrame =
      featureRows(corpus, idCol, textCol)
        .groupBy(col("feat")).agg(count(lit(1)).as(out))
    val tc = counts(target, "ct")
    val rc = counts(raw, "cr")
    val merged = tc.join(rc, Seq("feat"), "full_outer")
      .select(col("feat"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .localCheckpoint()
    val tot = merged.agg(sum(col("ct")), sum(col("cr")), count(lit(1))).head()
    Model(merged, tot.getLong(0), tot.getLong(1), tot.getLong(2))
  }

  /** Score documents by the mean importance log-ratio
    *
    *   (1/n) Σ_f [ ln((ct(f)+1)/(N_t+V)) − ln((cr(f)+1)/(N_r+V)) ]
    *
    * over the document's features. The mean (not the paper's raw sum)
    * length-normalizes, so selection ranks by target-likeness rather
    * than by length × target-likeness — the same normalization every
    * scorer in this engine uses ([[LmScore]], `QualityClassifier`);
    * with `k` fixed the resampling view is unchanged. A feature absent
    * from BOTH corpora cannot occur (scored docs contribute their
    * features to whichever corpus they came from); absent-one-side
    * features get the add-one floor. Docs with no tokens are absent.
    *
    * @return (idCol, n_feats, dsir_score, 6-dp)
    */
  def score(
      docs: DataFrame, model: Model, idCol: String, textCol: String): DataFrame = {
    // Arithmetic SHAPE mirrored by the q116 oracle: both smoothed logs
    // subtracted per-feature, then averaged.
    val lp =
      log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
        lit((model.nTarget + model.vocabSize).toDouble)) -
        log((coalesce(col("cr"), lit(0L)) + lit(1)).cast("double") /
          lit((model.nRaw + model.vocabSize).toDouble))
    featureRows(docs, idCol, textCol)
      .join(model.features, Seq("feat"), "left")
      .select(col(idCol), lp.as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), round(avg(col("lp")), 6).as("dsir_score"))
  }

  /** Deterministic top-k selection by (score desc, id asc): the
    * resampling step at temperature → 0. Plans as TakeOrderedAndProject
    * — per-partition k-heaps plus one k-row driver merge, NOT a global
    * sort; safe at any corpus size for the k a training mixture uses.
    */
  def selectTopK(
      scored: DataFrame, idCol: String, scoreCol: String, k: Int): DataFrame =
    scored.orderBy(col(scoreCol).desc, col(idCol).asc).limit(k)
}
