package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: match left rows (key, t) to right rows
  * whose [start, end] interval (inclusive on both ends) contains t.
  *
  * Spark's planner turns a plain `l.t BETWEEN r.start AND r.end` theta
  * join into BroadcastNestedLoopJoin (fine for small right sides) or a
  * cartesian per key — quadratic per key and the classic interval-join
  * trap. The scale formulation here bins time into fixed-width buckets:
  * each interval replicates into every bucket it overlaps, each point
  * lands in one bucket, and the join becomes an equi-join on
  * (key, bucket) followed by the exact containment filter. Cost is
  * O(points + intervals·span/bin) — replication is bounded by choosing
  * `binWidth` near the typical interval length.
  */
object RangeJoin {

  /** @param points      left side with `keyCols` and `timeCol` (timestamp)
    * @param intervals   right side with `keyCols`, `startCol`, `endCol`
    * @param binWidthSec bucket width in seconds — tune to interval size
    *
    * Inclusive containment on both ends (t ∈ [start, end]). Output: all
    * point columns + all interval columns (names must not collide apart
    * from the keys).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      startCol: String,
      endCol: String,
      binWidthSec: Long = 3600L
  ): DataFrame = {
    val collisions = intervals.columns.toSeq.diff(keyCols)
      .intersect(points.columns.toSeq.diff(keyCols))
    require(collisions.isEmpty, s"column collisions between sides: $collisions")

    // Integral bin INDEX (unix_micros div width), so interval replication
    // steps one bin at a time — an epoch-valued bin would make sequence()
    // step per-second.
    val widthMicros = binWidthSec * 1000000L
    def binIdx(colName: String): Column =
      expr(s"unix_micros(`$colName`) div ${widthMicros}L")

    val binnedPoints = points.withColumn("__bin", binIdx(timeCol))
    // Replicate each interval into every bucket it overlaps.
    val binnedIntervals = intervals
      .withColumn("__bin", explode(sequence(binIdx(startCol), binIdx(endCol))))

    binnedPoints
      .join(binnedIntervals, keyCols :+ "__bin")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("__bin")
  }
}
