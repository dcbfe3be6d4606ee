package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — flag corpus documents that share
  * any w-gram with a benchmark/test set. The standard pre-training hygiene
  * check: training text containing verbatim evaluation n-grams inflates
  * benchmark scores, so contaminated documents are quarantined before
  * training.
  *
  * Shape: the benchmark's distinct shingle hashes form a small build side
  * (|benchmark| ≪ |corpus| always holds for eval sets — thousands of docs
  * against a 100 TB corpus), broadcast to an equi-join against the
  * exploded corpus shingles. One narrow shingle pass per side, no shuffle
  * of corpus text, corpus-side cost linear in corpus shingles. If the
  * benchmark dictionary outgrows broadcast range, pass
  * `broadcastDictionary = false` and the same join runs shuffled on the
  * 64-bit hash — only the join strategy changes.
  *
  * Collision semantics at scale: matching on 64-bit shingle hashes can
  * only OVER-flag (a corpus shingle colliding with an unrelated benchmark
  * shingle quarantines a clean doc — expected false flags ≈ |corpus
  * shingles| × |bench shingles| / 2⁶⁴, double digits at 10¹² × 10⁹, and
  * conservative in the safe direction). It can never under-flag: equal
  * shingles always hash equally, so no contaminated doc escapes. This is
  * the opposite polarity of the identity joins (appendDedup, the ingest
  * exact stage), which is why those match on hash PAIRS and this one
  * deliberately stays single-hash-skinny.
  */
object Contamination {

  /** Corpus docs sharing ≥1 w-shingle with the benchmark: (id,
    * n_shared) where n_shared counts the distinct shared shingles.
    * Clean documents are absent from the result.
    *
    * `broadcastDictionary` hard-hints the broadcast build side — correct
    * for every real eval set. Disable it for a pathological dictionary
    * whose distinct shingles exceed executor broadcast capacity; the join
    * then falls back to Catalyst's shuffle strategy instead of OOMing.
    */
  def flagged(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 8,
      broadcastDictionary: Boolean = true
  ): DataFrame = {
    val benchShingles = benchmark
      .select(explode(Shingles.shingleSet(col(textCol), w)).as("sh"))
      .distinct()
    val buildSide = if (broadcastDictionary) broadcast(benchShingles) else benchShingles
    corpus
      .select(col(idCol).as("id"), explode(Shingles.shingleSet(col(textCol), w)).as("sh"))
      .join(buildSide, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared")) // corpus shingles pre-distinct per doc
  }

  /** Thresholded decontamination verdict — the RefinedWeb-style recipe:
    * a document is quarantined when the FRACTION of its distinct
    * w-shingles shared with the benchmark reaches `minOverlap`, not on
    * any single shared shingle (the [[flagged]] any-overlap rule
    * over-kills short boilerplate matches at corpus scale). Every corpus
    * document appears in the output, zero-overlap ones included — the
    * verdict is the filter a curation pipeline applies, so absent rows
    * would read as silently kept. Same broadcast-dictionary join as
    * [[flagged]] plus one narrow per-row shingle-set size; collision
    * polarity unchanged (hashes can only OVER-count sharing, so the
    * fraction only over-quarantines).
    */
  def overlapVerdict(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 8,
      minOverlap: Double = 0.05,
      broadcastDictionary: Boolean = true
  ): DataFrame = {
    require(minOverlap >= 0 && minOverlap <= 1, s"minOverlap $minOverlap outside [0,1]")
    val sizes = corpus.select(
      col(idCol).as("id"),
      size(Shingles.shingleSet(col(textCol), w)).cast("long").as("n_shingles"))
    sizes
      .join(flagged(corpus, benchmark, idCol, textCol, w, broadcastDictionary),
        Seq("id"), "left")
      .select(
        col("id"),
        col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_shingles") > 0,
          round(coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_shingles"), 6))
          .otherwise(lit(0.0)).as("overlap_frac"))
      .withColumn("contaminated",
        col("n_shingles") > 0 &&
          coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_shingles") >= minOverlap)
  }
}
