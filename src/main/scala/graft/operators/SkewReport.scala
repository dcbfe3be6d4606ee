package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-distribution diagnostic for a planned shuffle — the "is this join
  * key safe to shuffle on" question answered BEFORE the job that would
  * discover it the hard way: per heavy key, its row count, its share of
  * the table, and the salt factor that would level it (the fan-out
  * [[SaltedJoin]] takes as input). At 100 TB a single hot key is the
  * difference between 32 even tasks and one straggler holding the stage;
  * this report is one partial-aggregated count per key plus a bounded
  * top-k — the cheapest possible look at that risk.
  *
  * `salt` is the integer ceiling of `n_key / (total / partitions)`: how
  * many even slices the key needs so none exceeds the average partition's
  * load. Keys at or below the average report 1 (no salting needed).
  */
object SkewReport {

  /** Top `topK` heaviest key groups of `df` under `keyCols`, with share
    * and recommended salt fan-out for a `partitions`-way shuffle.
    * Deterministic: count-descending, then the key columns ascending.
    */
  def topKeys(
      df: DataFrame,
      keyCols: Seq[String],
      topK: Int = 5,
      partitions: Int = 32
  ): DataFrame = {
    require(topK > 0 && partitions > 0, s"topK/partitions must be > 0")
    val keys: Seq[Column] = keyCols.map(col)
    val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("n"))
    // One-row totals frame joined in as a cross join (never an eager
    // action); integer ceil-div keeps `salt` exact — no fp rounding near
    // a boundary.
    val totals = counts.agg(sum(col("n")).as("__total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(totals)
      .withColumn("share", round(col("n") / col("__total").cast("double"), 6))
      .withColumn("salt",
        expr(s"(n * ${partitions}L + __total - 1) div __total"))
      .select(keys ++ Seq(col("n"), col("share"), col("n_keys"), col("salt")): _*)
      .orderBy(col("n").desc +: keys: _*)
      .limit(topK)
  }
}
