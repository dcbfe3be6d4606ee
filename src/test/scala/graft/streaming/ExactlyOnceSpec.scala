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

  test("real StreamingQuery: post-write failure + checkpoint restart lands the batch ONCE") {
    // the end-to-end retry scenario the recipe exists for: the batch is
    // WRITTEN, then the sink throws; the restarted query replays the same
    // batchId from the checkpoint and the keyed write must overwrite, not
    // double-append
    val root = tmpDir("eo-stream")
    val inDir = s"$root/in"
    val sinkDir = s"$root/sink"
    val ckptDir = s"$root/ckpt"
    (1L to 5L).map(i => (i, s"row $i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(inDir)
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = spark.readStream
      .schema("id LONG, v STRING")
      .parquet(inDir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) {
          ExactlyOnce.appendKeyed(b, sinkDir, id)
          if (injected.compareAndSet(false, true))
            throw new RuntimeException("injected sink failure AFTER the write")
        }
      }
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q1.awaitTermination())
    val q2 = start() // replays the failed batch with the SAME batchId
    q2.awaitTermination()
    val back = spark.read.parquet(sinkDir)
    assert(back.count() == 5, "the replayed batch must land exactly once")
    assert(back.select("id").as[Long].collect().sorted.toSeq == (1L to 5L))
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
