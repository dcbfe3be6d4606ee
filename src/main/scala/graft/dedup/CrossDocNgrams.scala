package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document duplicated n-gram accounting — the corpus-wide twin of
  * the within-document repetition filter (`TextAnalysis`, q47) and the
  * scalable Spark-native stand-in for suffix-array exact-substring dedup
  * (the RefinedWeb/Gopher recipe: score each document by how much of its
  * text is verbatim-shared with OTHER documents, then drop or trim the
  * worst). The reference engine has no corpus-global text operator at all
  * (its dedup is per-batch pandas `drop_duplicates`,
  * etl/src/transform/transformer.py:162) — this is north-star extension surface.
  *
  * Shape (three keyed shuffles, all on skinny rows, each map-side
  * combined):
  *   1. explode w-gram instances and collapse them per (doc, gram) —
  *      shuffle on the compound key carries each distinct (doc, gram)
  *      once, not each occurrence;
  *   2. per-gram document frequency = count over the collapsed frame
  *      (NOT countDistinct over raw instances — step 1 already made rows
  *      unique per doc, so a plain count partial-aggregates cleanly and a
  *      gram shared by a million documents collapses to one partial count
  *      per mapper, never a million-row hot key);
  *   3. equi-join the collapsed frame against the `df ≥ minDocs` gram
  *      set and re-aggregate per document. AQE's skew-join split covers a
  *      pathological gram that dominates the join side.
  *
  * Key width at scale: `hashKeys = true` shuffles xxhash64(gram) longs
  * instead of gram strings — fixed 8-byte keys, same polarity argument as
  * [[Contamination]]: a 64-bit collision can only OVER-count sharing
  * (two unrelated grams colliding inflates df), never under-count, so the
  * filter stays conservative in the safe direction. The string-keyed mode
  * exists so the DuckDB oracle can recompute the result EXACTLY;
  * `CrossDocNgramsSpec` pins hash-mode ≡ string-mode on the real
  * testdata, so the scale path is hash-gated too (via the equality), not
  * just argued.
  */
object CrossDocNgrams {

  /** Per-document stats: total w-gram instances, instances/distinct
    * grams shared with ≥ `minDocs` documents (the doc itself included in
    * the count — `minDocs = 2` means "appears in at least one OTHER
    * document"), and the shared fraction. Documents shorter than w
    * tokens report zeros.
    */
  def stats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 8,
      minDocs: Int = 2,
      hashKeys: Boolean = false
  ): DataFrame = {
    val grams = docs.select(
      col(idCol).as("id"),
      explode(Shingles.shingles(col(textCol), w)).as("g"))
    val keyed = grams.select(
      col("id"),
      (if (hashKeys) xxhash64(col("g")) else col("g")).as("k"))

    // (doc, gram) → occurrence count; the only shuffle that sees
    // per-document multiplicity.
    val perDocGram = keyed.groupBy("id", "k").agg(count(lit(1)).as("n_occ"))

    // Document frequency per gram over the already-collapsed frame.
    val shared = perDocGram
      .groupBy("k").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("k")

    val dupPerDoc = perDocGram
      .join(shared, "k")
      .groupBy("id")
      .agg(sum(col("n_occ")).as("n_dup_occ"), count(lit(1)).as("n_dup_distinct"))

    // Total instances per doc is a narrow scan-side computation — no
    // shuffle, and docs with zero shared grams stay present via the left
    // join.
    val totals = docs.select(
      col(idCol).as("id"),
      size(Shingles.shingles(col(textCol), w)).cast("long").as("n_grams"))

    totals
      .join(dupPerDoc, Seq("id"), "left")
      .select(
        col("id"),
        col("n_grams"),
        coalesce(col("n_dup_occ"), lit(0L)).as("n_dup_occ"),
        coalesce(col("n_dup_distinct"), lit(0L)).as("n_dup_distinct"),
        when(col("n_grams") > 0,
          round(coalesce(col("n_dup_occ"), lit(0L)).cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)).as("dup_frac"))
  }
}
