package graft.operators

import org.apache.spark.sql.functions._

import graft.{MetricsProbe, SparkSpec}

/** The bloom semi-join reduction must (a) equal the plain join exactly —
  * false positives are candidates, never results — and (b) measurably cut
  * the fact side's shuffle traffic when the dim key set is selective,
  * which is its entire reason to exist. The shuffle claim is asserted
  * from task metrics with broadcast joins disabled: broadcast is what you
  * CANNOT do at real dim scale, so the spec forces the shuffle-join
  * regime the operator targets.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = spark.range(0, 50000)
    .select(col("id").as("fk"), (col("id") % 997).as("payload"))
  // 2% of the fact keys join
  private def dim = spark.range(0, 50000, 50)
    .select(col("id").as("dk"), lit("d").as("tag"))

  test("equals the plain join exactly (inner, with duplicates and misses)") {
    val got = BloomJoin.reduceThenJoin(fact, dim, "fk", "dk",
      expectedDimKeys = 4096, fpp = 0.01)
      .select(col("fk"), col("payload"), col("tag"))
    val want = fact.join(dim, col("fk") === col("dk"))
      .select(col("fk"), col("payload"), col("tag"))
    assert(got.collect().toSet == want.collect().toSet)
    assert(got.count() == 1000)
  }

  test("a too-small expectedDimKeys inflates fpp but never loses rows") {
    val got = BloomJoin.reduceThenJoin(fact, dim, "fk", "dk",
      expectedDimKeys = 8, fpp = 0.01)
    assert(got.count() == 1000)
  }

  test("prunes the fact shuffle by >= 5x at 2% dim selectivity (no broadcast)") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def shuffled(df: org.apache.spark.sql.DataFrame): Long =
        MetricsProbe.measure(spark) { df.count(): Unit }.shuffleWriteBytes
      val plain = shuffled(fact.join(dim, col("fk") === col("dk")))
      val bloomed = shuffled(BloomJoin.reduceThenJoin(fact, dim, "fk", "dk",
        expectedDimKeys = 4096, fpp = 0.01))
      assert(bloomed * 5 <= plain,
        s"expected >=5x shuffle reduction: plain=$plain bloomed=$bloomed")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("probe stays inside whole-stage codegen") {
    val q = BloomJoin.reduceThenJoin(fact, dim, "fk", "dk", expectedDimKeys = 4096)
    q.collect() // AQE finalizes (and codegen markers appear) only on execution
    val plan = q.queryExecution.executedPlan.toString
    // The probe Filter must carry the '*(n)' codegen marker — not fall
    // back to interpreted eval.
    assert("""\*\(\d+\) Filter .*graft_bloom_contains""".r.findFirstIn(plan).isDefined, plan)
  }
}
