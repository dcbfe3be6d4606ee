package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate view on a [[TxTable]]:
  * `group keys → (n_rows, Σ measures)` kept current by folding
  * insert-only delta batches into the stored partials — the 100 TB
  * contract is that an increment's cost is proportional to the DELTA
  * (one aggregation of the batch + a keyed merge touching only the
  * affected groups), never a rescan of the base table.
  *
  * Measures must be integer-typed (cast/quantize upstream — the q154
  * cents discipline): integer partial sums are associative, so the
  * incremental result is bit-identical to a full recompute regardless
  * of how history was batched. Double measures would drift by summation
  * order and the equivalence gate below would be a lie.
  *
  * Count/sum (and any other commutative-monoid measure a caller derives
  * from them, e.g. avg = sum/n at read time) refresh this way;
  * non-distributive aggregates (distinct counts, exact percentiles)
  * need sketches instead — see the HLL register pattern in gold/.
  */
object Mview {

  private def aggregated(df: DataFrame, keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    // Integral measures only — a silent cast of a double measure would
    // truncate per ROW and the "incremental ≡ full recompute" contract
    // would quietly hold between two equally-wrong answers. Quantize
    // upstream explicitly (round(x*100) cents etc.).
    import org.apache.spark.sql.types._
    val bad = sumCols.filterNot { c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    require(bad.isEmpty,
      s"measure columns must be integral (quantize upstream): $bad")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c).cast("long")).as(s"sum_$c")): _*)
  }

  /** Materialize the view over the initial base slice. */
  def init(spark: SparkSession, dir: String, base: DataFrame,
           keyCols: Seq[String], sumCols: Seq[String]): Unit =
    TxTable.init(spark, dir, aggregated(base, keyCols, sumCols))

  /** Fold one insert-only delta batch into the view (one transactional
    * MERGE touching only the batch's groups).
    */
  def increment(spark: SparkSession, dir: String, delta: DataFrame,
                keyCols: Seq[String], sumCols: Seq[String]): TxTable.MergeStats = {
    val d = aggregated(delta, keyCols, sumCols)
    val cur = TxTable.read(spark, dir)
    val measures = "n_rows" +: sumCols.map(c => s"sum_$c")
    val merged = d.as("d")
      .join(cur.as("c"), keyCols, "left")
      .select(keyCols.map(col) ++ measures.map(m =>
        (coalesce(col(s"c.$m"), lit(0L)) + col(s"d.$m")).as(m)): _*)
    TxTable.merge(spark, dir, merged, keyCols)
  }

  def read(spark: SparkSession, dir: String): DataFrame = TxTable.read(spark, dir)
}
