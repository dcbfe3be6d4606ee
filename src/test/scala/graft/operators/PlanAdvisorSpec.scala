package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Each hazard the advisor claims to detect, detected on a plan built
  * to exhibit exactly it — and nothing on a clean plan.
  */
class PlanAdvisorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def checks(df: org.apache.spark.sql.DataFrame): Seq[String] =
    PlanAdvisor.findings(df).map(_.check)

  test("clean broadcast-join aggregate yields no findings") {
    val clean = Tables.load(spark, dir, "customer")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
    assert(checks(clean).isEmpty)
  }

  test("forced cartesian and broadcast nested loop are flagged") {
    val cart = Tables.load(spark, dir, "region").hint("shuffle_replicate_nl")
      .crossJoin(Tables.load(spark, dir, "nation"))
    assert(checks(cart).contains("cartesian-product"))
    val bnlj = Tables.load(spark, dir, "region")
      .crossJoin(broadcast(Tables.load(spark, dir, "nation")))
    assert(checks(bnlj) == Seq("nested-loop-join"))
  }

  test("global window flags the window AND its single-partition exchange") {
    val gwin = Tables.load(spark, dir, "events")
      .withColumn("rn", row_number().over(Window.orderBy(col("ts"))))
    val cs = checks(gwin)
    assert(cs.contains("global-window") && cs.contains("single-partition-exchange"), cs)
    // a PARTITIONED window must NOT trip the global-window heuristic
    val pwin = Tables.load(spark, dir, "events")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"))))
    assert(!checks(pwin).contains("global-window"), checks(pwin))
  }

  test("a scan whose filters cannot push down is reported") {
    // length(...) > 3 on top of the scan: nothing (not even IsNotNull)
    // reaches PushedFilters because the predicate wraps the column
    val up = Tables.load(spark, dir, "region")
      .filter(length(col("r_name")) + 1 > 4)
    val cs = checks(up)
    assert(cs.contains("unpushed-scan-filter"), cs)
  }
}
