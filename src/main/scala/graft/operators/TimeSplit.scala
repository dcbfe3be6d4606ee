package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Purged k-fold time-series cross-validation (López de Prado's purged
  * CV with embargo): the time axis splits into k contiguous value-range
  * folds; for fold i the fold's range is TEST, rows within `embargoUs`
  * of either range boundary are EMBARGOED (dropped from training — they
  * leak label information across the boundary through serial
  * correlation), and everything else is TRAIN. The temporal sibling of
  * the group-aware k-fold (q175): that one stops identity leakage, this
  * one stops adjacency leakage.
  *
  * Distribution: one two-scalar aggregate (min/max event time), then a
  * single projection with a k-way explode — every row's (fold, role)
  * assignments are pure integer arithmetic against broadcast-literal
  * bounds, no shuffle beyond what the caller aggregates downstream. The
  * k× fan-out is inherent to k-fold CV (each fold IS a dataset); rows
  * stay skinny.
  */
object TimeSplit {

  /** Input rows fanned out k×: original columns + `fold` (0-based) +
    * `role` ('train' | 'test' | 'embargo'). Fold ranges are half-open
    * integer-µs intervals `[t0 + span·i/k, t0 + span·(i+1)/k)` with the
    * last fold closed at max(ts).
    */
  def purgedFolds(df: DataFrame, tsCol: String, k: Int, embargoUs: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(embargoUs >= 0, s"embargo must be >= 0, got $embargoUs")
    val bounds = df.agg(
      min(unix_micros(col(tsCol))), max(unix_micros(col(tsCol)))).head()
    require(!bounds.isNullAt(0), "cannot split an empty frame")
    val t0 = bounds.getLong(0)
    val t1 = bounds.getLong(1)
    val span = t1 - t0
    df.withColumn("graft_us", unix_micros(col(tsCol)))
      .withColumn("fold", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("graft_lo", expr(s"${t0}L + (${span}L * fold) div $k"))
      .withColumn("graft_hi",
        expr(s"CASE WHEN fold = ${k - 1} THEN ${t1}L + 1 " +
          s"ELSE ${t0}L + (${span}L * (fold + 1)) div $k END"))
      .withColumn("role",
        when(col("graft_us") >= col("graft_lo") && col("graft_us") < col("graft_hi"),
          lit("test"))
          .when((col("graft_us") >= col("graft_lo") - embargoUs &&
            col("graft_us") < col("graft_lo")) ||
            (col("graft_us") >= col("graft_hi") &&
              col("graft_us") < col("graft_hi") + embargoUs),
            lit("embargo"))
          .otherwise(lit("train")))
      .drop("graft_us", "graft_lo", "graft_hi")
  }
}
