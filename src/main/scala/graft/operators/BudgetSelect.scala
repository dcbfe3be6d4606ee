package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — "take the best documents until the
  * budget is spent", the data-selection step a pretraining pipeline runs
  * after scoring (quality, LM score, dedup survival): rank by score,
  * accumulate cost (tokens) in rank order, keep every document whose
  * cumulative cost fits.
  *
  * The naive plan — `sum(cost) OVER (ORDER BY score)` — is a GLOBAL
  * window: Spark executes it as a single partition holding the whole
  * corpus, which is exactly what dies at 100 TB. This implementation is
  * the distributed two-pass prefix sum instead: range-repartition by
  * (score desc, id) and sort within partitions (a normal distributed
  * sort), collect ONLY the per-partition cost totals (one long per
  * partition) to the driver, broadcast their exclusive prefix as each
  * partition's starting offset, and emit every partition's qualifying
  * prefix independently. Cumulative costs are exact global values, no
  * task ever sees more than its partition, and the driver holds P longs.
  *
  * Costs must be non-negative (they are counts); that makes the global
  * cumulative sum monotone, so the per-partition `takeWhile` equals the
  * global "keep while cum ≤ budget" filter.
  */
object BudgetSelect {

  /** @return (id, score, cost, cum_cost) for every selected row —
    *         cum_cost is the exact global running total in
    *         (score desc, id) order.
    */
  def selectUnderBudget(
      items: DataFrame,
      idCol: String,
      scoreCol: String,
      costCol: String,
      budget: Long,
      partitions: Int = 0
  ): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative, got $budget")
    val spark = items.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    // localCheckpoint: the totals pass and the emit pass must see the
    // SAME rows in the SAME partitions (range boundaries are sampled, so
    // re-executing the upstream plan could re-draw them between passes).
    val ds = items
      .select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"),
        col(costCol).cast("long").as("cost"))
      .as[(Long, Double, Long)]
      .repartitionByRange(p, col("score").desc, col("id"))
      .sortWithinPartitions(col("score").desc, col("id"))
      .localCheckpoint()

    // One pass yields both the per-partition totals AND the minimum cost:
    // a negative cost breaks the monotonicity the takeWhile/short-circuit
    // logic rests on, so it must fail loudly, not select silently wrong.
    val stats = ds.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L
        var min = Long.MaxValue
        it.foreach { r => sum += r._3; if (r._3 < min) min = r._3 }
        Iterator.single((pid, sum, min))
      }
      .collect().sortBy(_._1)
    val minCost = stats.map(_._3).foldLeft(Long.MaxValue)(math.min)
    require(minCost == Long.MaxValue || minCost >= 0L,
      s"costs must be non-negative (cumulative selection needs a monotone " +
        s"prefix sum); found $minCost")
    val totals = stats.map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive prefix per partition

    val selected = ds.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = offsets(pid)
      if (running > budget) Iterator.empty
      else it.map { case (id, score, cost) =>
        running += cost
        (id, score, cost, running)
      }.takeWhile(_._4 <= budget)
    }
    spark.createDataFrame(selected).toDF("id", "score", "cost", "cum_cost")
  }
}
