package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-layer query surface: the aggregations the reference documents as its
  * consumer contract but delegates to Athena/QuickSight (etl/README.md:115-123,
  * :679-685). First-class DataFrame API here.
  */
object Gold {

  /** Daily sales summary (A1, etl/README.md:118-123):
    * `groupby([_year,_month,_day]).agg(quantity: sum, unit_price: mean, total: sum)`.
    */
  def dailySummary(silver: DataFrame,
                   quantityCol: String = "quantity",
                   priceCol: String = "unit_price"): DataFrame =
    silver
      .groupBy(col("_year"), col("_month"), col("_day"))
      .agg(
        sum(col(quantityCol)).as("total_quantity"),
        avg(col(priceCol)).as("avg_unit_price"),
        sum(col(quantityCol) * col(priceCol)).as("total_revenue")
      )
      .orderBy(col("_year"), col("_month"), col("_day"))

  /** The documented Athena companion query (A2-A4, etl/README.md:679-685):
    * `SELECT _year,_month,_day, COUNT(*) order_count,
    *  SUM(quantity*unit_price) total_revenue GROUP BY 1,2,3 ORDER BY 1,2,3`.
    */
  def dailyRevenue(silver: DataFrame,
                   quantityCol: String = "quantity",
                   priceCol: String = "unit_price"): DataFrame =
    silver
      .groupBy(col("_year"), col("_month"), col("_day"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(col(quantityCol) * col(priceCol)).as("total_revenue")
      )
      .orderBy(col("_year"), col("_month"), col("_day"))
}
