package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity over all document pairs that share at
  * least one shingle.
  *
  * This is the exact counterpart to [[MinHashDedup]]: explode each doc's
  * distinct shingle-hash set, self-join on shingle hash, count
  * intersections per pair, and derive |A∩B| / |A∪B|. Cost is
  * Σ_shingle df(shingle)² — fine below ~10M docs with a diverse shingle
  * vocabulary, quadratic on hot shingles. At 100 TB this is the
  * *verification* oracle for MinHash candidates, not the discovery path;
  * [[MinHashDedup.nearDuplicatePairs]] bounds the join to banded buckets.
  */
object NgramJaccard {

  /** Pairs (idA < idB) with exact Jaccard ≥ threshold over w-shingles. */
  def similarPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleWidth: Int = 3
  ): DataFrame = {
    val sets = docs
      .select(col(idCol).as("id"), Shingles.shingleSet(col(textCol), shingleWidth).as("shset"))
      .filter(size(col("shset")) > 0)
    val sizes = sets.select(col("id"), size(col("shset")).as("n"))
    val exploded = sets.select(col("id"), explode(col("shset")).as("sh"))

    // shuffle_hash hint: Catalyst's size estimate of the exploded frame
    // (docs × shingles rows) sits near the broadcast threshold, and a
    // broadcast build would evaluate the whole shingle pipeline
    // single-threaded on the driver — slower and GC-noisy. A shuffled
    // hash join on the 64-bit shingle key is the right plan at every
    // scale.
    val inter = exploded.as("a").hint("shuffle_hash")
      .join(exploded.as("b").hint("shuffle_hash"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))

    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
