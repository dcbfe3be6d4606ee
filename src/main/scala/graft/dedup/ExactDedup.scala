package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication, hash-first.
  *
  * `dropDuplicates()` (the reference's D1, transformer.py:151-171) shuffles
  * whole rows — at 100 TB that means shuffling the full payload (wide text /
  * binary columns) just to compare equality. The scale path shuffles a
  * 64-bit xxhash64 of the dedup key instead and resolves each group to one
  * deterministic representative.
  *
  * Collisions: xxhash64 over the key columns has ~2^-64 pairwise collision
  * probability; for exactness-critical runs `keepFirst` can key on the full
  * columns (`hashKey = false`) at the cost of shuffling them.
  */
object ExactDedup {

  /** One representative row per distinct key, deterministically the row with
    * the smallest `tiebreak` value. Single hash-partitioned shuffle; the
    * row_number window avoids a second self-join pass.
    */
  def keepFirst(
      df: DataFrame,
      keyCols: Seq[String],
      tiebreak: Seq[Column],
      hashKey: Boolean = true
  ): DataFrame = {
    val key: Seq[Column] =
      if (hashKey) Seq(xxhash64(keyCols.map(col): _*))
      else keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

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
