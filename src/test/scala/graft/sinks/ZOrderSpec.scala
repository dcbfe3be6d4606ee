package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("z-value interleaves bits of both dimensions") {
    // 2-bit example: a=0b10, b=0b01 → z bits (j*2+d): a0→pos0, b0→pos1,
    // a1→pos2, b1→pos3 = 0b0110? a=10: a0=0,a1=1; b=01: b0=1,b1=0
    // z = a0<<0 | b0<<1 | a1<<2 | b1<<3 = 0 + 2 + 4 + 0 = 6.
    val z = Seq((2L, 1L)).toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), bits = 2).as("z"))
      .head().getLong(0)
    assert(z == 6L)
  }

  test("clustering shrinks per-partition ranges on BOTH columns") {
    // A grid where user and value are independent: a plain sort on one
    // column leaves the other's per-partition span global.
    val df = (for { u <- 0 until 64; v <- 0 until 16 }
      yield (u.toLong, v.toDouble)).toDF("u", "v")
    val clustered = ZOrder.cluster(df, Seq("u", "v"), numFiles = 16, bits = 8)

    val spans = clustered
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg((max("u") - min("u")).as("uspan"), (max("v") - min("v")).as("vspan"))
      .agg(avg("uspan").as("au"), avg("vspan").as("av"))
      .head()
    // Global spans: u=63, v=15. Z-clustering into 16 files must shrink
    // both substantially (plain sort by u would leave av ≈ 15).
    assert(spans.getAs[Double]("au") < 63.0 * 0.5, spans.toString)
    assert(spans.getAs[Double]("av") < 15.0 * 0.75, spans.toString)
  }
}
