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

  test("sketch union is partitioning-independent and inside the error envelope") {
    def unionBy(g: org.apache.spark.sql.Column): Long = events
      .groupBy(g)
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    // Register max-union is order- and partitioning-independent, so the
    // rollup-from-sketches answer is IDENTICAL under any grouping. (A
    // direct global sketch is NOT compared for equality: it answers via
    // the HIP estimator while unions use the composite one — equal in
    // sparse mode, legitimately different in dense mode.)
    val byType = unionBy(col("event_type"))
    assert(byType == unionBy(pmod(col("event_id"), lit(7))))
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(byType - exact).toDouble / exact < 0.1,
      s"union estimate $byType vs exact $exact")
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
