package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Both passes must see the SAME rows in the SAME partitions (range
  * boundaries are sampled, so re-executing the upstream plan could
  * re-draw them between passes), so the sorted frame is materialized
  * once. Two modes (r8, mirroring Curation's durable stages):
  *
  *  - ephemeral (default): `localCheckpoint` — no extra I/O, but blocks
  *    live on executors, so one lost executor fails the job and storage
  *    is corpus-proportional in executor memory/disk.
  *  - durable (`checkpointDir` set): the range-sorted frame writes to
  *    `$checkpointDir/sorted` as parquet with an explicit partition-id
  *    column and both passes read that fault-tolerant materialization —
  *    the 100-TB mode. Partition identity survives the round trip in the
  *    `pid` COLUMN (file-split/coalesce on re-read may change physical
  *    partitioning, which is why spark_partition_id() is stamped BEFORE
  *    the write); per-partition cumulation then runs as a window
  *    partitioned by pid — every window partition is one original range
  *    partition, never the whole corpus.
  *
  * Costs must be non-negative (they are counts); that makes the global
  * cumulative sum monotone, so the per-partition `takeWhile` equals the
  * global "keep while cum ≤ budget" filter. A negative cost fails loudly
  * in both modes.
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
      partitions: Int = 0,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative, got $budget")
    val spark = items.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val base = items
      .select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"),
        col(costCol).cast("long").as("cost"))
      .repartitionByRange(p, col("score").desc, col("id"))
      .sortWithinPartitions(col("score").desc, col("id"))

    checkpointDir match {
      case None =>
        val ds = base.as[(Long, Double, Long)].localCheckpoint()

        // One pass yields both the per-partition totals AND the minimum
        // cost: a negative cost breaks the monotonicity the takeWhile/
        // short-circuit logic rests on, so it must fail loudly, not
        // select silently wrong.
        val stats = ds.rdd
          .mapPartitionsWithIndex { (pid, it) =>
            var sum = 0L
            var min = Long.MaxValue
            it.foreach { r => sum += r._3; if (r._3 < min) min = r._3 }
            Iterator.single((pid, sum, min))
          }
          .collect().sortBy(_._1)
        requireNonNegative(stats.map(_._3).foldLeft(Long.MaxValue)(math.min))
        val offsets = stats.map(_._2).scanLeft(0L)(_ + _) // exclusive prefix

        val selected = ds.rdd.mapPartitionsWithIndex { (pid, it) =>
          var running = offsets(pid)
          if (running > budget) Iterator.empty
          else it.map { case (id, score, cost) =>
            running += cost
            (id, score, cost, running)
          }.takeWhile(_._4 <= budget)
        }
        spark.createDataFrame(selected).toDF("id", "score", "cost", "cum_cost")

      case Some(dir) =>
        // Durable materialization: pid is a DATA column, so partition
        // identity is independent of how the parquet re-read splits or
        // coalesces files.
        val path = s"$dir/sorted"
        base.withColumn("pid", spark_partition_id())
          .write.mode("overwrite").parquet(path)
        val ds = spark.read.parquet(path)

        // Totals pass: ≤ p skinny agg rows reach the driver, same as the
        // ephemeral mapPartitions pass.
        val stats = ds.groupBy(col("pid"))
          .agg(sum(col("cost")).as("t"), min(col("cost")).as("m"))
          .collect()
        requireNonNegative(
          stats.foldLeft(Long.MaxValue)((acc, r) => math.min(acc, r.getLong(2))))
        val totals = Array.fill(p)(0L) // empty range partitions have no agg row
        stats.foreach(r => totals(r.getInt(0)) = r.getLong(1))
        val offsets = totals.scanLeft(0L)(_ + _)

        // Emit pass: cumulate WITHIN each original range partition (a
        // window over pid — bounded by the largest range partition, never
        // the corpus) and add the broadcast exclusive offset. Partitions
        // that start past the budget are pruned before the window, the
        // same short-circuit as the ephemeral Iterator.empty.
        val offs = offsets.zipWithIndex
          .map { case (o, pid) => (pid, o) }.toSeq.toDF("pid", "offset")
        val w = Window.partitionBy(col("pid"))
          .orderBy(col("score").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ds.join(broadcast(offs), Seq("pid"))
          .where(col("offset") <= budget)
          .withColumn("cum_cost", col("offset") + sum(col("cost")).over(w))
          .where(col("cum_cost") <= budget)
          .select(col("id"), col("score"), col("cost"), col("cum_cost"))
    }
  }

  /** Stratified budget selection — one independent budget PER GROUP
    * (per language, per source): within each group, rank by (score desc,
    * id) and keep rows while the group's cumulative cost fits its
    * budget. This is what a real pretraining mixture runs — "4B tokens
    * of German, 1B of Thai, best-first within each" — and the naive
    * plan, `sum(cost) OVER (PARTITION BY grp ORDER BY score DESC)`, has
    * the same 100-TB failure as the global one, just deferred: one
    * window partition = one whole language.
    *
    * Same two-pass prefix sum as [[selectUnderBudget]], with the group
    * leading the range key: range-repartition by (grp, score desc, id) —
    * so each group occupies a contiguous run of partitions and large
    * groups still SPLIT across many — then per-(partition, group)
    * subtotals (≤ P×G skinny rows to the driver; G is the group count,
    * bounded by the budget map the caller already holds), per-group
    * exclusive prefix in partition order, and one windowed emit pass
    * where every window partition is one (range-partition, group) slice,
    * never a whole group. Groups absent from `budgets` are dropped (no
    * budget = no quota). Both materialization modes of the parent:
    * ephemeral `localCheckpoint` or durable parquet under
    * `checkpointDir` (the pid-as-data-column discipline).
    *
    * @return (id, grp, score, cost, cum_cost) for every selected row —
    *         cum_cost is the exact per-group running total in
    *         (score desc, id) order.
    */
  def selectUnderBudgetPerGroup(
      items: DataFrame,
      idCol: String,
      grpCol: String,
      scoreCol: String,
      costCol: String,
      budgets: Map[String, Long],
      partitions: Int = 0,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(budgets.values.forall(_ >= 0L),
      s"budgets must be non-negative, got ${budgets.filter(_._2 < 0L)}")
    val spark = items.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val base = items
      .select(col(idCol).cast("long").as("id"),
        col(grpCol).cast("string").as("grp"),
        col(scoreCol).cast("double").as("score"),
        col(costCol).cast("long").as("cost"))
      .repartitionByRange(p, col("grp"), col("score").desc, col("id"))
      .sortWithinPartitions(col("grp"), col("score").desc, col("id"))
      .withColumn("pid", spark_partition_id())

    val ds = checkpointDir match {
      case None => base.localCheckpoint()
      case Some(dir) =>
        val path = s"$dir/grouped_sorted"
        base.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
    }

    // Totals pass: one skinny row per (partition, group) slice.
    val stats = ds.groupBy(col("pid"), col("grp"))
      .agg(sum(col("cost")).as("t"), min(col("cost")).as("m"))
      .collect()
    requireNonNegative(
      stats.foldLeft(Long.MaxValue)((acc, r) => math.min(acc, r.getLong(3))))

    // Per-group exclusive prefix across partitions in pid order: group
    // runs are contiguous under the range key, but correctness only
    // needs "all of the group's rows in earlier partitions", which pid
    // order gives regardless.
    val offsets = stats
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
      .iterator
      .flatMap { case (_, rows) =>
        val inPidOrder = rows.sortBy(_._1)
        val exclusive = inPidOrder.map(_._3).scanLeft(0L)(_ + _)
        inPidOrder.zip(exclusive).map { case ((pid, g, _), off) => (pid, g, off) }.toSeq
      }
      .toSeq.toDF("pid", "grp", "offset")

    val budgetDf = budgets.toSeq.toDF("grp", "budget")
    val w = Window.partitionBy(col("pid"), col("grp"))
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ds.join(broadcast(offsets), Seq("pid", "grp"))
      .join(broadcast(budgetDf), Seq("grp"))
      .where(col("offset") <= col("budget"))
      .withColumn("cum_cost", col("offset") + sum(col("cost")).over(w))
      .where(col("cum_cost") <= col("budget"))
      .select(col("id"), col("grp"), col("score"), col("cost"), col("cum_cost"))
  }

  private def requireNonNegative(minCost: Long): Unit =
    require(minCost == Long.MaxValue || minCost >= 0L,
      s"costs must be non-negative (cumulative selection needs a monotone " +
        s"prefix sum); found $minCost")
}
