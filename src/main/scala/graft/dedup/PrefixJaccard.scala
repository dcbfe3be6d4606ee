package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT Jaccard-threshold self-join via prefix filtering (the
  * SSJoin/PPJoin family — Chaudhuri 2006, Bayardo 2007; public
  * literature): the scalable exact counterpart to both
  * [[NgramJaccard.similarPairs]] (exact, but pair discovery costs
  * Σ df² over EVERY shingle) and [[MinHashDedup]] (cheap discovery,
  * probabilistic recall).
  *
  * The prefix lemma: order every document's shingles by one global
  * total order (document frequency ascending, then hash — rarest
  * first), and keep only each set's first `|S| - ⌈t·|S|⌉ + 1` entries
  * (its "prefix"). If J(A,B) ≥ t, the overlap |A∩B| ≥ t·max(|A|,|B|)
  * is too large for A and B to disagree on their entire prefixes: any
  * two qualifying sets MUST share at least one prefix token. Pair
  * discovery therefore joins only on prefix tokens — and because the
  * global order puts each document's RAREST shingles in its prefix,
  * the posting lists that generate pairs are the short tail of the
  * frequency distribution, not the boilerplate head that makes the
  * all-shingle join quadratic. Discovery cost drops from Σ_all df² to
  * Σ_prefix df² with zero recall loss.
  *
  * Candidates then verify exactly: the size-ratio prune
  * (min ≥ t·max) rides the posting entries, surviving pairs
  * re-attach their full shingle-hash arrays (bounded per doc) and
  * compute |A∩B| via `array_intersect` — so the output is the same
  * frame [[NgramJaccard.similarPairs]] produces, deterministically,
  * which is exactly what DedupSpec and the q150 oracle pin.
  */
object PrefixJaccard {

  /** Pairs (idA < idB) with exact Jaccard ≥ threshold over w-shingles —
    * [[NgramJaccard.similarPairs]] semantics, prefix-filtered discovery.
    */
  def similarPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleWidth: Int = 3
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    // One evaluation of the shingle pipeline: the df aggregate, the
    // prefix ranking and both verify joins all read the materialized
    // blocks (the SimHash.nearPairs double-evaluation discipline).
    val sets = docs
      .select(col(idCol).as("id"),
        Shingles.shingleSet(col(textCol), shingleWidth).as("shset"))
      .filter(size(col("shset")) > 0)
      .withColumn("n", size(col("shset")))
      .localCheckpoint()

    val exploded = sets.select(col("id"), col("n"), explode(col("shset")).as("sh"))
    val dfreq = exploded.groupBy(col("sh")).agg(count(lit(1)).as("df"))

    // Each set's prefix under the global (df asc, hash asc) order. The
    // prefix length n - ceil(t·n) + 1 is the lemma's bound; row_number
    // (not rank) because the order is total — (df, sh) never ties
    // within one document's distinct shingles. The ceiling is
    // epsilon-guarded: a raw ceil(t·n) overshoots whenever t·n floats a
    // hair ABOVE an exact integer (t = 0.07, n = 100 → 7.0000000000000009
    // → ceil 8), shortening the prefix below the lemma's bound and
    // silently dropping qualifying pairs. The guard can only LENGTHEN
    // the prefix — extra candidates are removed by the exact verify, so
    // completeness is restored and no false pair can appear.
    val prefix = exploded.join(dfreq, "sh")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("sh"))))
      .filter(col("rn") <=
        col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)

    // Posting lists over PREFIX entries only — short by construction
    // (the global order routes every doc's rarest shingles here).
    val postings = prefix
      .groupBy(col("sh"))
      .agg(array_sort(collect_list(struct(col("id"), col("n")))).as("ds"))
      .filter(size(col("ds")) > 1)
    val candidates = postings
      .select(explode(Pairs.ordered(col("ds"))).as("p"))
      .select(
        col("p.a.id").as("id_a"), col("p.a.n").as("n_a"),
        col("p.b.id").as("id_b"), col("p.b.n").as("n_b"))
      // size-ratio necessary condition (|A∩B| ≤ min, |A∪B| ≥ max),
      // epsilon-guarded on the same fp-boundary argument as the prefix
      // length: t·max floating just above an exact integer must not
      // drop a pair the exact verify would keep.
      .filter(least(col("n_a"), col("n_b")) >=
        lit(threshold) * greatest(col("n_a"), col("n_b")) - lit(1e-9))
      .select(col("id_a"), col("id_b")).distinct()

    candidates
      .join(sets.select(col("id").as("id_a"), col("shset").as("sa"), col("n").as("na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shset").as("sb"), col("n").as("nb")), "id_b")
      .withColumn("n_common", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
