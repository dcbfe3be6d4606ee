package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity over all document pairs that share at
  * least one shingle.
  *
  * This is the exact counterpart to [[MinHashDedup]]: the pairs that share
  * a shingle are discovered from inverted posting lists — group the
  * exploded (doc, shingle) rows by shingle, collect the sorted doc list,
  * and emit intra-list pairs. One shuffle on the 64-bit shingle hash and
  * ONE evaluation of the shingle pipeline, where a self-join on the
  * exploded frame would execute that pipeline twice and shuffle both
  * sides. Singleton shingles (document frequency 1) can witness no pair
  * and are dropped before any pair materializes — in a diverse corpus
  * that is most of the vocabulary.
  *
  * Set sizes travel inside the posting entries, so J ≥ t's size-ratio
  * necessary condition (min(|A|,|B|) ≥ t·max(|A|,|B|), since |A∩B| ≤ min
  * and |A∪B| ≥ max) prunes pairs BEFORE the per-pair count shuffle, and no
  * size-lookup join is needed afterwards.
  *
  * Cost remains Σ_shingle df(shingle)² over surviving shingles — fine
  * below ~10M docs with a diverse vocabulary, quadratic on hot shingles.
  * At 100 TB this is the *verification* oracle for MinHash candidates, not
  * the discovery path; [[MinHashDedup.nearDuplicatePairs]] bounds the join
  * to banded buckets.
  */
object NgramJaccard {

  /** Input-size ceiling (Catalyst sizeInBytes estimate) above which an
    * UNCAPPED `maxDf` is loudly warned about: past ~1 GiB of input text a
    * hot boilerplate shingle turns Σ df² quadratic, and the caller almost
    * certainly wanted the LSH discovery path ([[MinHashDedup]]) or an
    * explicit cap. An estimate — not an action — so the guard costs
    * nothing at 100 TB.
    */
  private[graft] val UncappedWarnBytes: BigInt = BigInt(1L << 30)

  /** The warning the guard would emit, or None. Split from the logging so
    * the behavior is spec-testable without capturing log output.
    */
  private[graft] def uncappedWarning(estimatedBytes: BigInt, maxDf: Int): Option[String] =
    if (maxDf == Int.MaxValue && estimatedBytes > UncappedWarnBytes)
      Some(s"NgramJaccard.similarPairs: no maxDf cap on an estimated " +
        s"$estimatedBytes-byte input — pair discovery is quadratic in hot-shingle " +
        "document frequency. Set maxDf (conservative: reported similarity only " +
        "drops) or use MinHashDedup.nearDuplicatePairs for discovery at scale.")
    else None

  /** Pairs (idA < idB) with exact Jaccard ≥ threshold over w-shingles.
    *
    * `maxDf` is the scale-safety valve for the Σ df² cost: shingles whose
    * document frequency exceeds it (boilerplate headers, common phrases)
    * are dropped from PAIR DISCOVERY AND COUNTING, bounding any single
    * posting list's pair fan-out at maxDf². With a cap the result is a
    * conservative approximation — n_common undercounts by the capped
    * shingles, so reported similarity can only be LOWER and no false
    * pairs appear; near-dup pairs still share plenty of rare shingles.
    * The default (no cap) keeps the operator exact, which is what the
    * oracle checks.
    */
  def similarPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleWidth: Int = 3,
      maxDf: Int = Int.MaxValue
  ): DataFrame = {
    // Guard reads plan stats (a driver-side optimize pass) — only worth
    // paying when the cap is actually absent.
    if (maxDf == Int.MaxValue)
      uncappedWarning(docs.queryExecution.optimizedPlan.stats.sizeInBytes, maxDf)
        .foreach(System.err.println)
    val items = docs
      .select(col(idCol).as("id"), Shingles.shingleSet(col(textCol), shingleWidth).as("shset"))
      .filter(size(col("shset")) > 0)
      .select(col("id"), size(col("shset")).as("n"), explode(col("shset")).as("sh"))

    // Inverted index: per shingle, the sorted (id, setsize) posting list.
    // array_sort on the struct orders by id (first field), so emitted
    // pairs are already oriented id_a < id_b.
    val postings = items
      .groupBy(col("sh"))
      .agg(array_sort(collect_list(struct(col("id"), col("n")))).as("ds"))
      .filter(size(col("ds")) > 1)
      .filter(size(col("ds")) <= maxDf)

    val pairs = postings
      .select(explode(Pairs.ordered(col("ds"))).as("p"))
      .select(
        col("p.a.id").as("id_a"), col("p.a.n").as("n_a"),
        col("p.b.id").as("id_b"), col("p.b.n").as("n_b"))
      // epsilon-guarded: t·max floating a hair above an exact integer
      // (t = 0.07, max = 100) must not drop a boundary pair the exact
      // jaccard filter below would keep; the guard only admits extra
      // candidates, which that filter removes.
      .filter(least(col("n_a"), col("n_b")) >=
        lit(threshold) * greatest(col("n_a"), col("n_b")) - lit(1e-9))

    pairs
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
