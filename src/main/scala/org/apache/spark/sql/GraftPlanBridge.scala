package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one-line bridge a Spark-extension library needs to turn a custom
  * [[LogicalPlan]] node into a public `DataFrame`: `Dataset.ofRows` is
  * `private[sql]`, so the call lives in this package — the same pattern
  * Delta/Sedona-style extension libraries use. Nothing else in the
  * engine lives outside the `graft` namespace, and nothing here touches
  * Spark internals beyond this single constructor.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
