package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExactlyOnceSpec extends SparkSpec {
  import spark.implicits._

  test("replayed batch overwrites its own partition; others untouched") {
    val dir = tmpDir("exactly-once")
    ExactlyOnce.appendKeyed(Seq((1L, "a")).toDF("id", "v"), dir, 0L)
    ExactlyOnce.appendKeyed(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir, 1L)
    // sink-side failure replay: Structured Streaming re-runs foreachBatch
    // with the SAME batchId and (deterministic source offsets) the same
    // rows — the keyed write must land the batch ONCE, not twice
    ExactlyOnce.appendKeyed(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir, 1L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3, "replay must not double-append")
    assert(back.filter(col("batch_id") === 1).count() == 2)
    assert(back.filter(col("batch_id") === 0).count() == 1,
      "a replay of batch 1 must not touch batch 0's partition")
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("the blind append this replaces WOULD double-write (the failure mode)") {
    val dir = tmpDir("blind-append")
    val b = Seq((2L, "b")).toDF("id", "v")
    b.write.mode("append").parquet(dir)
    b.write.mode("append").parquet(dir) // the retry
    assert(spark.read.parquet(dir).count() == 2,
      "fixture self-check: append-mode retry duplicates — the r13 ADVICE finding")
  }
}
