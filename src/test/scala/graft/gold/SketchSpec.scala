package graft.gold

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mergeable distinct-count sketches via Spark's built-in Datasketches
  * HLL functions — the 100 TB pattern for corpus cardinality: compute
  * per-partition/per-day sketches once, persist them, and answer any
  * rollup by UNIONING sketches instead of rescanning raw data.
  */
class SketchSpec extends SparkSpec {

  private val events =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")

  test("union of per-group HLL sketches equals the global sketch estimate") {
    val global = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getLong(0)
    val mergedFromGroups = events
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    // Sketch union is lossless (same registers), so the rollup-from-
    // sketches answer is IDENTICAL to the full-scan answer.
    assert(mergedFromGroups == global)
  }

  test("HLL estimate lands within the configured error envelope of exact") {
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    val est = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("e"))
      .head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est vs exact $exact")
  }
}
