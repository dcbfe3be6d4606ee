package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo's classic
  * merge/purge method): sort records by a blocking key and emit
  * candidate pairs whose positions fall within a window of size `w` —
  * the O(N·w) alternative to an O(N²) all-pairs comparison when records
  * likely to co-refer sort near each other (names, balances, addresses).
  * Complements the engine's other blocking schemes (LSH buckets,
  * pigeonhole segments, prefix filtering) with the one that needs no
  * token structure at all, only an ordering.
  *
  * Distribution: the global position comes from the same two-pass exact
  * rank as [[QuantileBucket]] (range-repartition + per-partition counts
  * broadcast as offsets — never a single-partition window), and the
  * windowed self-join is an equi-join on neighborhood blocks of size
  * `w-1`: each left row fans out to its own block and the next, so any
  * pair within distance `w-1` meets in exactly one block — two skinny
  * shuffles total, no OR-join (which would plan as a nested-loop
  * cartesian), no global window.
  */
object SortedNeighborhood {

  /** Candidate pairs `(id_a, id_b, dist)` with `1 <= dist <= window-1`,
    * positions taken in `(sortCols, idCol)` order. `carry` columns are
    * attached to both sides as `<col>_a` / `<col>_b` (carried through
    * the rank, not re-joined).
    */
  def pairs(
      items: DataFrame,
      idCol: String,
      sortCols: Seq[String],
      window: Int,
      carry: Seq[String] = Nil,
      partitions: Int = 0
  ): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val d = window - 1
    val spark = items.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism

    val keyed = items.select(
      (col(idCol).cast("long").as("id") +:
        struct(sortCols.map(col): _*).as("sk") +:
        carry.map(c => col(c).as(s"carry_$c"))): _*)
    // Materialize so the count pass and the rank pass see identical
    // range partitions (boundaries are sampled — see QuantileBucket).
    val sorted = keyed
      .repartitionByRange(p, col("sk"), col("id"))
      .sortWithinPartitions(col("sk"), col("id"))
      .localCheckpoint()
      .withColumn("pid", spark_partition_id())

    val counts = sorted.groupBy(col("pid")).count().collect()
    val perPartition = Array.fill(p)(0L)
    counts.foreach(r => perPartition(r.getInt(0)) = r.getLong(1))
    val offsets = perPartition.scanLeft(0L)(_ + _)
    val offsetsDf = offsets.zipWithIndex
      .map { case (off, pid) => (pid, off) }.toSeq.toDF("pid", "off")

    val ranked = sorted
      .join(broadcast(offsetsDf), "pid")
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col("pid")).orderBy(col("sk"), col("id")))
          .cast("long") + col("off"))
      .withColumn("blk", expr(s"(rank - 1) div $d"))

    def side(suffix: String, cols: Column*): DataFrame =
      ranked.select(
        (col("id").as(s"id$suffix") +: col("rank").as(s"rank$suffix") +:
          carry.map(c => col(s"carry_$c").as(s"${c}$suffix")) ++: cols): _*)

    val left = side("_a", explode(array(col("blk"), col("blk") + 1)).as("jk"))
    val right = side("_b", col("blk").as("jk"))
    left.join(right, "jk")
      .where(col("rank_b") > col("rank_a") && col("rank_b") - col("rank_a") <= d)
      .select(
        (col("id_a") +: col("id_b") +:
          (col("rank_b") - col("rank_a")).as("dist") +:
          carry.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b")))): _*)
  }
}
