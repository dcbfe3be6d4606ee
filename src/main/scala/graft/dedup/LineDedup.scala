package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style line-level exact deduplication — sub-document dedup at
  * line granularity: hash every line of every document, find lines whose
  * corpus-wide occurrence count exceeds a bar, and rebuild each document
  * from its surviving lines in original order. The most commonly applied
  * boilerplate-removal pass in public pretraining pipelines (CCNet §3.1
  * removes duplicated lines before LM filtering; headers, cookie
  * banners, share buttons and copyright footers all die here), and the
  * line-granular complement of [[CrossDocNgrams]]' span trimming and the
  * document-level exact dedup (reference transformer.py:151-171 is the
  * whole-row special case).
  *
  * Scale shape: one explode (narrow), one partial+final count
  * aggregation on the line (map-side combine collapses a
  * corpus-ubiquitous line to one row per map partition BEFORE the
  * shuffle — a window `count() over (partition by line)` would instead
  * ship every occurrence of every hot line to one reducer), a left join
  * of lines against the usually-tiny over-the-bar set (AQE picks a
  * broadcast at runtime when it fits; skew-join splitting covers the
  * hot-line probe side when it does not), and one groupBy(id) rebuild.
  * Nothing driver-resident.
  */
object LineDedup {

  /** One row per (doc, line). NULL text is treated as the empty string
    * (one empty line) — `split(NULL)` is NULL and a bare posexplode
    * would silently DROP the whole document from the rebuilt output,
    * violating the one-row-per-input-document contract (ADVICE r11).
    * The synthesized line is flagged `__synth` so [[dedup]] can keep it
    * out of the corpus frequency counts: it is a placeholder keeping the
    * document alive, not a real line, and counting it would let a pile
    * of NULL documents push the `""` line over the bar and collapse
    * blank-line separators (`"a\n\nb"` → `"a\nb"`) corpus-wide
    * (ADVICE r12).
    */
  private def splitLines(docs: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    docs.select(
      col(idCol).as("__id"),
      col(textCol).isNull.as("__synth"),
      posexplode(split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))

  /** Rebuild each document without its over-represented lines.
    *
    * @param maxFreq a line is dropped from EVERY document when its total
    *   occurrence count across the corpus exceeds this bar
    * @param sep line separator (split AND rejoin)
    * @return one row per input document: `idCol`, `textCol` (kept lines
    *   joined with `sep`; empty string when every line dropped),
    *   `n_lines_kept`, `n_lines_dropped`
    */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      maxFreq: Long, sep: String = "\n"): DataFrame = {
    require(maxFreq >= 1, s"maxFreq must be >= 1, got $maxFreq")
    val lines = splitLines(docs, idCol, textCol, sep)
    // synthesized NULL-placeholder lines neither count toward a line's
    // corpus frequency nor get dropped by it (see splitLines)
    val over = lines.where(!col("__synth")).groupBy(col("__line"))
      .agg(count(lit(1)).as("__freq"))
      .where(col("__freq") > maxFreq)
      .select(col("__line"), lit(true).as("__drop"))
    val keep = col("__drop").isNull || col("__synth")
    lines.join(over, Seq("__line"), "left")
      .groupBy(col("__id"))
      .agg(
        // kept lines, original order: nulls (dropped) vanish from
        // collect_list, struct sort restores position order
        array_join(
          transform(
            array_sort(collect_list(
              when(keep, struct(col("__pos"), col("__line"))))),
            x => x.getField("__line")),
          sep).as(textCol),
        sum(when(keep, 1L).otherwise(0L)).as("n_lines_kept"),
        sum(when(!keep, 1L).otherwise(0L)).as("n_lines_dropped"))
      .withColumnRenamed("__id", idCol)
  }

  /** The other standard CCNet semantics: every line keeps exactly its
    * FIRST occurrence (smallest `(id, pos)` across the corpus — a total
    * deterministic order) and loses all later ones. Where [[dedup]]
    * removes over-represented boilerplate from every document,
    * `keepFirst` preserves corpus-wide line uniqueness — one copy of
    * each repeated paragraph survives, in the earliest document that
    * carried it.
    *
    * Scale shape: one explode, one min-aggregation on the line (partial
    * aggregation collapses hot lines map-side), one equi-join of
    * occurrences against their line's minimum — all keyed on the line,
    * AQE-skew-safe — and the same ordered rebuild.
    */
  def keepFirst(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = splitLines(docs, idCol, textCol, sep)
    val first = lines.groupBy(col("__line"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
    lines.join(first, Seq("__line"))
      .withColumn("__keep",
        col("__first.__id") === col("__id") && col("__first.__pos") === col("__pos"))
      .groupBy(col("__id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__keep"), struct(col("__pos"), col("__line"))))),
            x => x.getField("__line")),
          sep).as(textCol),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_lines_kept"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_lines_dropped"))
      .withColumnRenamed("__id", idCol)
  }
}
