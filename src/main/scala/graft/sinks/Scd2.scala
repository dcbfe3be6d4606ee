package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 on top of [[TxTable]]: the table
  * holds the full attribute HISTORY of each business key as half-open
  * validity intervals — (key…, attrs…, `valid_from`, `valid_to`,
  * `is_current`) — and each batch snapshot applies as ONE transactional
  * MERGE commit:
  *
  *  - a key whose current attributes differ from the batch closes its
  *    open row (`valid_to` = batch id, `is_current` = false) and opens a
  *    new one at this batch;
  *  - a key new to the dimension opens its first row;
  *  - an unchanged key is untouched (its open row keeps the ORIGINAL
  *    `valid_from` — no churn writes);
  *  - a key absent from the batch is untouched (partial snapshots carry
  *    no delete semantics; use [[TxTable.delete]] for retirements).
  *
  * Validity is stamped with a caller-supplied monotone `batchId` rather
  * than wall clock so replays are deterministic (the engine-wide
  * reproducibility rule); callers wanting event time pass epoch micros.
  *
  * Scale shape: one `is_current` filter over the table, one keyed join
  * against the batch (broadcast when the batch is small, shuffle
  * otherwise — AQE's call), and the delta rides the existing
  * [[TxTable.merge]] optimistic-commit path keyed on (key…,
  * `valid_from`) — closed rows MATCH (their open version exists),
  * opened rows INSERT. History rows never rewrite.
  */
object Scd2 {

  private val metaCols = Seq("valid_from", "valid_to", "is_current")

  private def stamp(df: DataFrame, batchId: Long): DataFrame = df
    .withColumn("valid_from", lit(batchId))
    .withColumn("valid_to", lit(null).cast("long"))
    .withColumn("is_current", lit(true))

  /** Initialize the dimension from its first snapshot. */
  def init(spark: SparkSession, dir: String, snapshot: DataFrame, batchId: Long): Unit =
    TxTable.init(spark, dir, stamp(snapshot, batchId))

  /** Apply one batch snapshot; returns the underlying MERGE stats
    * (`updated` = closed-out rows, `inserted` = newly opened rows).
    */
  def merge(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      keyCols: Seq[String],
      batchId: Long
  ): TxTable.MergeStats = {
    require(keyCols.nonEmpty, "SCD2 needs at least one key column")
    val attrCols = batch.columns.toSeq.filterNot(keyCols.contains)
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attribute")
    require(!batch.columns.exists(metaCols.contains),
      s"batch must not carry the SCD2 bookkeeping columns $metaCols")
    val outCols = keyCols ++ attrCols ++ metaCols

    val cur = TxTable.read(spark, dir).filter(col("is_current"))
    val u = batch.select((keyCols ++ attrCols).map(col): _*)

    val joinCond: Column = keyCols
      .map(k => col(s"c.$k") === col(s"u.$k")).reduce(_ && _)
    val attrsDiffer: Column = attrCols
      .map(a => !(col(s"c.$a") <=> col(s"u.$a"))).reduce(_ || _)
    val changed = cur.as("c").join(u.as("u"), joinCond).filter(attrsDiffer)

    val closed = changed.select(col("c.*"))
      .withColumn("valid_to", lit(batchId))
      .withColumn("is_current", lit(false))
      .select(outCols.map(col): _*)
    val opened = stamp(changed.select(col("u.*")), batchId)
      .select(outCols.map(col): _*)
    val openedNew = stamp(u.join(cur, keyCols, "left_anti"), batchId)
      .select(outCols.map(col): _*)

    TxTable.merge(spark, dir, closed.unionByName(opened).unionByName(openedNew),
      keyCols :+ "valid_from")
  }

  /** Point-in-time (temporal) join: each fact row picks the dimension
    * version valid at its own as-of stamp — `valid_from ≤ asOf <
    * valid_to` on the half-open intervals [[merge]] maintains. A LEFT
    * join: facts dated before the key's first version (or keyed to an
    * unknown dimension key) keep null attributes rather than dropping.
    *
    * Scale shape: an equi-join on the business key with the interval
    * bounds as a residual predicate — never a cartesian; at most one
    * history row matches per fact (intervals are disjoint by
    * construction), so the join fans nothing out.
    */
  def asOf(
      facts: DataFrame,
      history: DataFrame,
      keyCols: Seq[String],
      asOfCol: String
  ): DataFrame = {
    val keyEq: Column = keyCols.map(k => facts(k) === history(k)).reduce(_ && _)
    val inInterval =
      history("valid_from") <= facts(asOfCol) &&
        (history("valid_to").isNull || facts(asOfCol) < history("valid_to"))
    val dimAttrs = history.columns.filterNot(keyCols.contains)
    facts.join(history, keyEq && inInterval, "left")
      .select(facts.columns.map(facts(_)) ++ dimAttrs.map(history(_)): _*)
  }
}
