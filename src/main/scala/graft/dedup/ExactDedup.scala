package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication beyond plain `dropDuplicates()`.
  *
  * `dropDuplicates()` (the reference's D1, transformer.py:151-171) keeps an
  * arbitrary survivor; `keepFirst` keeps a *deterministic* representative
  * per key and `duplicateGroups` reports what was collapsed. Both are a
  * single hash-partitioned shuffle on the key columns — the shuffle always
  * carries the full rows (the window needs them), so there is nothing to
  * save by shuffling a hash instead, and partitioning by the real columns
  * carries zero collision risk at any key cardinality.
  */
object ExactDedup {

  /** One representative row per distinct key, deterministically the row with
    * the smallest `tiebreak` value. Single hash-partitioned shuffle on
    * `keyCols`; the row_number window avoids a second self-join pass.
    */
  def keepFirst(
      df: DataFrame,
      keyCols: Seq[String],
      tiebreak: Seq[Column]
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Cross-source duplicate overlap matrix — the data-governance view of
    * exact duplication: for every unordered source pair, how many
    * distinct keys (texts) appear in BOTH. The corpus-safe plan is one
    * aggregation keyed on the key columns collecting each key's distinct
    * source SET — after a (key, source) distinct whose partial
    * aggregation dedups map-side — then pairs EXPLODE from each set
    * (bounded by the source count squared, never the corpus). The naive
    * alternative, a corpus self-join on the key, shuffles the corpus
    * twice and fans out quadratically on hot keys; this never joins at
    * all.
    *
    * @return (source_a, source_b, n_shared) with source_a < source_b,
    *         one row per pair sharing ≥1 key.
    */
  def sourceOverlap(
      df: DataFrame, keyCols: Seq[String], srcCol: String): DataFrame =
    df
      .select(keyCols.map(col) :+ col(srcCol).as("__src"): _*)
      .distinct()
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_set(col("__src"))).as("__srcs"))
      .filter(size(col("__srcs")) >= 2)
      .select(explode(expr(
        "flatten(transform(sequence(0, size(__srcs) - 2), i -> " +
          "transform(sequence(i + 1, size(__srcs) - 1), j -> " +
          "struct(__srcs[i] as source_a, __srcs[j] as source_b))))")).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))

  /** Duplicate-group report: one row per key that occurs more than once,
    * with the group size and the kept representative id. Pass the same
    * `tiebreak` given to [[keepFirst]] so kept_id names the row keepFirst
    * actually retains; the default (min id) matches keepFirst's default
    * only when the tiebreak is the id itself.
    */
  def duplicateGroups(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      tiebreak: Option[Seq[String]] = None
  ): DataFrame = {
    val keptId = tiebreak match {
      case Some(cols) => min_by(col(idCol), struct(cols.map(col): _*))
      case None       => min(col(idCol))
    }
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_copies"), keptId.as("kept_id"))
      .filter(col("n_copies") > 1)
  }
}
