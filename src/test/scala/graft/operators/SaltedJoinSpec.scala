package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals the plain join on a skewed dataset") {
    // 90% of probe rows hit one hot key.
    val probe = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("k", "v")
    val build = (Seq("hot") ++ (0 until 10).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, i * 10.0) }.toDF("k", "w")

    val plain = probe.join(build, Seq("k"))
      .select("k", "v", "w").as[(String, Long, Double)].collect().sorted.toSeq
    val salted = SaltedJoin.inner(probe, build, Seq("k"), saltFactor = 8)
      .select("k", "v", "w").as[(String, Long, Double)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("probe rows of one hot key spread across salt partitions") {
    val probe = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val nSalts = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(8L)).cast("int"))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(nSalts == 8, s"expected the hot key to fan out over all 8 salts, got $nSalts")
  }
}
