package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.FileFormat

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow file-stream ingest drains input through the transform to parquet") {
    val in = tmpDir("stream-in")
    val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    sampleSales.write.mode("overwrite").option("header", "true").csv(in)

    val schema = StructType(sampleSales.schema.fields.map(f => f.copy(nullable = true)))
    val q = StreamingIngest.start(spark, in, schema, FileFormat.Csv, out, ckpt)
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow stream should terminate after draining")

    val result = spark.read.parquet(out)
    assert(result.count() == 3)
    // The transform ran: derived columns + normalized names present.
    assert(result.columns.contains("_row_hash"))
    assert(result.columns.contains("_year"))
  }

  test("q82 runs a real StreamingQuery and its sink equals the duplicate-free table") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingQueries.queries("q82_streaming_dedup")(spark, dir)
    val expected = graft.sources.Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    // planted copies collapsed: exactly the original rows, each once
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("q86 merges micro-batches transactionally and converges to the distinct table") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingQueries.queries("q86_streaming_txmerge")(spark, dir)
    val expected = graft.sources.Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("streaming hourly counts equal the batch window aggregation") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.sources.Tables.load(spark, dir, "events")
    val expected = StreamingIngest.hourlyCounts(batchEvents)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap

    // Same parquet through the streaming engine (schema declared, ns ts
    // already normalized by staging through a temp dir in µs).
    val staged = tmpDir("stream-events")
    batchEvents.write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(staged)
    val q = StreamingIngest.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("hourly")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("dedupWithinWatermark: re-delivered keys collapse across micro-batches, state bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val input = MemoryStream[(Long, Timestamp)]
    val q = StreamingIngest.dedupWithinWatermark(
      input.toDF().toDF("key", "ts"), Seq("key"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((1L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      input.addData((1L, ts(2)), (3L, ts(3))) // key 1 re-delivered → dropped
      q.processAllAvailable()
      val keys = spark.table("dedup").collect().map(_.getLong(0)).sorted
      assert(keys.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize: gap >= threshold starts a new session") {
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0), // session A: 2 events
      (1L, ts(10 + 361), 3.0), // 6h1m later → session B
      (2L, ts(5), 5.0)) // other user
      .toDF("user_id", "ts", "value")
    val sessions = StreamingIngest.sessionize(events, gap = "6 hours")
      .orderBy("user_id", "session_start")
      .collect()
    assert(sessions.length == 3)
    assert(sessions(0).getAs[Long]("n_events") == 2)
    assert(sessions(1).getAs[Long]("n_events") == 1)
    assert(sessions(2).getAs[Long]("n_events") == 1)
  }
}
