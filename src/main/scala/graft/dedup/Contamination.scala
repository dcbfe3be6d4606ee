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
}
