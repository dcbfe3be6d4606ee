package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row (key, t), attach the right row
  * with the greatest right-time ≤ t for the same key (the standard
  * time-series "latest snapshot at or before" join; kdb aj / DuckDB
  * ASOF JOIN semantics).
  *
  * Spark has no native as-of operator. The scalable formulation here is
  * union-and-sweep, not a range join: tag both sides, union them, and run
  * one `last_value(..., ignoreNulls)` window per right column ordered by
  * (time, side) within each key. That is a single hash-partitioned
  * shuffle + per-key sort — O((|L|+|R|) log) with no range explosion,
  * robust to arbitrarily dense right sides (a theta-join `l.t >= r.t`
  * would be quadratic per key and is exactly the plan to avoid at scale).
  *
  * Right rows sort before left rows at equal timestamps, so an exact-tie
  * snapshot IS visible to the left row (≤ semantics, matching ASOF JOIN).
  * Left rows with no prior right row keep nulls (left-outer semantics).
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       reference side ("snapshots")
    * @param keyCols     equi-join key column names (present on both sides)
    * @param leftTime    event-time column name on `left`
    * @param rightTime   event-time column name on `right`
    * @param rightValues right columns to carry (default: all non-key,
    *                    non-time columns); emitted with their own names,
    *                    plus `rightTime` as `asof_<rightTime>`
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String] = Seq.empty
  ): DataFrame = {
    val carry =
      if (rightValues.nonEmpty) rightValues
      else right.columns.toSeq.diff(keyCols :+ rightTime)
    val leftCols = left.columns.toSeq
    require(carry.intersect(leftCols).isEmpty,
      s"right value columns ${carry.intersect(leftCols)} collide with left columns; alias them first")
    val reserved = Seq("__t", "__side", "__r", s"asof_$rightTime")
    val clash = (leftCols ++ right.columns).distinct.intersect(reserved)
    require(clash.isEmpty, s"input columns $clash collide with as-of internals; rename them first")

    // Tagged union: side 0 = right (sorts first on time ties), side 1 = left.
    // The carried right columns travel inside ONE struct (non-null exactly
    // on right rows): filling column-by-column with last(_, ignoreNulls)
    // would skip legitimate NULLs inside a snapshot and stitch together
    // values from different snapshots.
    val rightStruct = struct(
      col(rightTime).as(s"asof_$rightTime") +: carry.map(col): _*)
    val rightStructType = right
      .select(rightStruct.as("__r")).schema("__r").dataType

    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"), rightStruct.as("__r")) ++
        leftCols.diff(keyCols).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(rightStructType).as("__r")) ++
        leftCols.diff(keyCols).map(col): _*)

    // Final hash term: two right rows on the same (key, time) would
    // otherwise be ordered arbitrarily per run — the pick among exact
    // duplicates stays arbitrary but becomes deterministic.
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), xxhash64(col("__r")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = last(col("__r"), ignoreNulls = true).over(w).as("__r")

    taggedRight.unionByName(taggedLeft)
      .select(
        keyCols.map(col) ++ Seq(col("__t"), col("__side")) ++
          leftCols.diff(keyCols).map(col) :+ filled: _*)
      .filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++ leftCols.diff(keyCols).map(col) ++
          (s"asof_$rightTime" +: carry).map(c => col("__r")(c).as(c)): _*)
  }

  /** Forward as-of join: for every left row (key, t), attach the right
    * row with the SMALLEST right-time ≥ t for the same key ("next
    * snapshot at or after" — the scheduling/SLA/next-touch direction
    * [[backward]] cannot express). Implemented by time-reversal duality:
    * forward on t is exactly backward on a negated µs axis (negation
    * flips ≤ into ≥, so exact-tie snapshots stay visible). Same
    * single-shuffle union-and-sweep cost model; the snapshot's real time
    * re-emits as `asof_<rightTime>`. Time columns must be
    * timestamp-typed (the negation goes through `unix_micros`).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String] = Seq.empty
  ): DataFrame = {
    val carry =
      if (rightValues.nonEmpty) rightValues
      else right.columns.toSeq.diff(keyCols :+ rightTime)
    val negL = left
      .withColumn("__fwd", -unix_micros(col(leftTime).cast("timestamp")))
    val negR = right
      .withColumn("__fwd", -unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("__fwd_rt", col(rightTime))
      .drop(rightTime)
    backward(negL, negR, keyCols, "__fwd", "__fwd", carry :+ "__fwd_rt")
      .withColumn(s"asof_$rightTime", col("__fwd_rt"))
      .drop("__fwd", "asof___fwd", "__fwd_rt")
  }
}
