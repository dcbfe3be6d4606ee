package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Duplicated-span REMOVAL — the step [[stats]] only accounts for
    * (r9 verdict #3): produce a CLEANED corpus with every maximal run of
    * ≥ `minRun` consecutive shared w-grams cut out of the text, the
    * RefinedWeb/Gopher exact-substring trim generalizing the reference's
    * whole-row dedup (etl/src/transform/transformer.py:151-171) to
    * verbatim spans.
    *
    * Semantics (token-exact, oracle-recomputable): tokenize on single
    * spaces; the w-gram at 0-based position p covers tokens
    * [p, p+w-1]; a gram is "shared" when its document frequency is
    * ≥ `minDocs` (distinct docs, the doc itself included — identical
    * rule to [[stats]]); a maximal run of consecutive shared gram
    * positions [s..j] of length ≥ `minRun` removes tokens
    * [s, j+w-1]; the cleaned text is the surviving tokens re-joined by
    * single spaces. Overlapping covered intervals union naturally (the
    * removal test is per-token containment).
    *
    * Shape: the [[stats]] shuffles to find the shared-gram set, one
    * instance-level equi-join to recover shared POSITIONS, a
    * gaps-and-islands window PARTITIONED BY DOC (never global — the
    * partition is one document's gram positions, bounded by doc length),
    * and a per-doc interval array joined back to the token array where a
    * single codegen'd higher-order filter drops covered tokens. Nothing
    * in the plan holds more than one document's tokens at a time.
    *
    * `hashKeys` trades gram strings for xxhash64 longs in the shared-set
    * join, same conservative over-trim-only collision polarity as
    * [[stats]]; string mode exists so the q109 DuckDB oracle recomputes
    * the kept text character-exactly, and `CrossDocNgramsSpec` pins
    * hash ≡ string on the real testdata.
    *
    * @return (id, clean_text, n_tokens, n_removed)
    */
  def trim(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 8,
      minDocs: Int = 2,
      minRun: Int = 1,
      hashKeys: Boolean = false
  ): DataFrame = {
    require(minRun >= 1, s"minRun must be positive, got $minRun")
    val grams = docs.select(
      col(idCol).as("id"),
      posexplode(Shingles.shingles(col(textCol), w)).as(Seq("pos", "g")))
    val keyed = grams.select(
      col("id"), col("pos"),
      (if (hashKeys) xxhash64(col("g")) else col("g")).as("k"))

    // Shared-gram set over the per-doc-collapsed frame (stats' step 1+2:
    // a gram shared by a million docs partial-aggregates, never a
    // million-row hot key).
    val shared = keyed.select("id", "k").distinct()
      .groupBy("k").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("k")

    // Gaps-and-islands on shared positions, per doc: consecutive
    // positions share (pos - row_number), runs of ≥ minRun become
    // covered token intervals [s, s + len + w - 2].
    val ivs = keyed
      .join(shared, "k")
      .select("id", "pos")
      .withColumn("grp",
        col("pos") - row_number().over(Window.partitionBy(col("id")).orderBy(col("pos"))))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("pos")).as("s"), count(lit(1)).as("len"))
      .filter(col("len") >= minRun)
      .select(col("id"), col("s"), (col("s") + col("len") + lit(w - 2)).as("e"))
      .groupBy("id")
      .agg(collect_list(struct(col("s").cast("long").as("s"), col("e").as("e"))).as("ivs"))

    docs
      .select(col(idCol).as("id"), Shingles.tokens(col(textCol)).as("ts"))
      .join(ivs, Seq("id"), "left")
      .withColumn("kept", expr(
        """transform(
          |  filter(transform(ts, (t, i) -> struct(t as t, i as i)),
          |         x -> ivs is null or
          |              not exists(ivs, iv -> x.i >= iv.s and x.i <= iv.e)),
          |  x -> x.t)""".stripMargin))
      .select(
        col("id"),
        array_join(col("kept"), " ").as("clean_text"),
        size(col("ts")).cast("long").as("n_tokens"),
        (size(col("ts")) - size(col("kept"))).cast("long").as("n_removed"))
  }

  /** Whole-document variant of [[trim]]: DROP every document whose
    * shared fraction ([[stats]]' `dup_frac`, unrounded here) exceeds
    * `maxDupFrac`, keeping the text untouched — the cheap end of the
    * RefinedWeb recipe for documents that are mostly verbatim copies,
    * where trimming would leave incoherent fragments.
    *
    * @return surviving (id, text) rows
    */
  def dropWorst(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 8,
      minDocs: Int = 2,
      maxDupFrac: Double = 0.5,
      hashKeys: Boolean = false
  ): DataFrame = {
    val s = stats(docs, idCol, textCol, w, minDocs, hashKeys)
      .withColumn("frac",
        when(col("n_grams") > 0, col("n_dup_occ").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
      .filter(col("frac") <= maxDupFrac)
      .select(col("id"))
    docs.select(col(idCol).as("id"), col(textCol).as("text")).join(s, "id")
  }
}
