package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The zone-map diagnostic must reproduce the data-skipping trade-off
  * it exists to quantify, and its file assignment must be exact.
  */
class ZoneMapsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("diagnostic reproduces the linear-vs-zorder skipping trade-off") {
    val d = ZoneMaps.diagnostic(
      graft.sources.Tables.load(spark, dir, "lineitem"),
      "l_partkey", "l_suppkey", files = 32, preds = 16)
      .collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("pred_dim")) ->
        r.getAs[Double]("scan_frac")).toMap
    // linear prunes its own sort column near-perfectly...
    assert(d(("linear", "a")) < 0.2, d.toString)
    // ...and is the WORST of the four on the secondary column (1.0 at
    // sf0.01+; at sf0.001 a 188-row file can sit inside one partkey and
    // shrink its b range, so the gate is the ordering, not the constant)
    assert(d(("linear", "b")) >= 0.5, d.toString)
    // z-order prunes BOTH columns materially (the whole point), at an
    // intermediate rate strictly between the linear extremes
    for (dim <- Seq("a", "b")) {
      assert(d(("zorder", dim)) < d(("linear", "b")), d.toString)
      assert(d(("zorder", dim)) > d(("linear", "a")), d.toString)
      assert(d(("zorder", dim)) < 0.6, d.toString)
    }
  }

  test("file assignment is an exact quantile split, independent of parallelism") {
    val base = graft.sources.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("a"),
        col("l_suppkey").cast("long").as("b"))
    val files = ZoneMaps.fileAssign(base, Seq(col("a"), col("b")), 8)
      .groupBy("file").count().orderBy("file").collect()
    assert(files.length == 8)
    val sizes = files.map(_.getAs[Long]("count"))
    // exact-rank buckets: sizes differ by at most one row
    assert(sizes.max - sizes.min <= 1, sizes.mkString(","))
    // zone ranges must be non-overlapping in the sort order: max(a, b)
    // of file i ≤ min(a, b) of file i+1 (lexicographic)
    val zones = ZoneMaps.fileAssign(base, Seq(col("a"), col("b")), 8)
      .groupBy("file")
      .agg(min(struct(col("a"), col("b"))).as("lo"),
        max(struct(col("a"), col("b"))).as("hi"))
      .orderBy("file").collect()
    zones.sliding(2).foreach {
      case Array(x, y) =>
        val hi = x.getStruct(2); val lo = y.getStruct(1)
        assert(hi.getLong(0) < lo.getLong(0) ||
          (hi.getLong(0) == lo.getLong(0) && hi.getLong(1) <= lo.getLong(1)))
      case _ => ()
    }
  }
}
