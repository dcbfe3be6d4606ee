package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data-skipping.
  *
  * Sorting by (a, b) clusters a perfectly and b not at all; sorting by
  * the bit-interleaved Z-value clusters both dimensions, so parquet
  * row-group min/max stats prune on EITHER predicate column. This is the
  * layout tool for large fact tables queried along several axes
  * (the Delta/Iceberg OPTIMIZE ZORDER BY recipe, as a plain repartition
  * +sort the engine can run on any table).
  *
  * Columns are first min-max normalized to `bits`-bit integers (one
  * tiny min/max aggregate, then pure per-row arithmetic — a rank-based
  * normalization would need a global-window sort, a single-partition
  * bottleneck at scale; linear scaling trades skew-robustness for a
  * fully parallel plan), then bit-interleaved.
  */
object ZOrder {

  /** Morton interleave of `bits`-bit normalized ranks (2-3 columns are
    * the practical sweet spot; >4 dilutes per-column clustering).
    */
  def zValue(normalized: Seq[Column], bits: Int): Column = {
    val dims = normalized.length
    // Java shiftleft masks the shift amount mod 64 — overflow would
    // silently scramble the interleave, not error.
    require(dims * bits <= 63, s"dims*bits = ${dims * bits} exceeds a long (max 63)")
    // bit j of column d lands at position j*dims + d.
    val pieces = for {
      d <- 0 until dims
      j <- 0 until bits
    } yield shiftleft(
      shiftright(normalized(d), j).bitwiseAND(lit(1L)), j * dims + d)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` clustered by the Z-value of `cols` (numeric or
    * timestamp) into `numFiles` range partitions — each output file then
    * covers a compact Z-range = a compact hyper-rectangle of the key
    * space, which is what row-group min/max pruning feeds on.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int, bits: Int = 12): DataFrame = {
    val maxVal = (1L << bits) - 1
    // One aggregate for all bounds (driver-side literals afterwards).
    val aggCols = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).head()

    val normalized = cols.map { c =>
      val lo = bounds.getAs[Double](s"min_$c")
      val hi = bounds.getAs[Double](s"max_$c")
      val span = if (hi > lo) hi - lo else 1.0
      // NULLs sort first (coordinate 0) — explicit, not an accident of
      // least() skipping nulls (which would co-locate them with the max).
      coalesce(
        least(lit(maxVal),
          floor((col(c).cast("double") - lit(lo)) / lit(span) * maxVal).cast("long")),
        lit(0L))
    }
    df.withColumn("__z", zValue(normalized, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
