package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.{MinHashDedup, Shingles}

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val base = "the quick brown fox jumps over the lazy dog again and again " * 3
  private val unrelated = "completely unrelated words here nothing shared at all zero overlap"

  /** The batch reference: corpus bucket-collect pair generation at the
    * operator's default parameters, normalized to (min, max) pairs. One
    * definition — the differential tests must all compare against the
    * SAME parameters the streaming operator defaults to.
    */
  private def expectedPairs(docs: DataFrame): Set[(Long, Long)] = {
    val withSig = docs
      .select(col("doc_id"), Shingles.shingleSet(col("text"), 3).as("shset"))
      .filter(size(col("shset")) > 0)
      .withColumn("sig", MinHashDedup.signature(col("shset"), 32 * 4))
    MinHashDedup.candidatePairs(withSig, "doc_id", "sig", 32, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def streamedPairs(docs: DataFrame): Set[(Long, Long)] =
    StreamingNearDup.candidates(docs, "doc_id", "ts", "text", maxPerBucket = 100000)
      .collect()
      .map(c => (math.min(c.first_id, c.later_id), math.max(c.first_id, c.later_id)))
      .toSet

  test("batch differential: candidate set equals MinHashDedup.candidatePairs") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), lit(ts(0)).as("ts"), col("text"))
    val got = streamedPairs(docs)
    assert(got == expectedPairs(docs))
    assert(got.nonEmpty) // the corpus plants near-dups; empty = broken
  }

  test("stream: a near-identical doc in a later micro-batch emits a candidate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
      watermarkDelay = "5 minutes", horizonMs = 60L * 60 * 1000)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      input.addData((1L, ts(0), base), (2L, ts(1), unrelated))
      q.processAllAvailable()
      input.addData((3L, ts(2), base + "tail")) // near-identical to doc 1
      q.processAllAvailable()
      val pairs = spark.table("neardup")
        .select("first_id", "later_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 3L)), pairs)
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), pairs) // no false family
    } finally q.stop()
  }

  test("stream: a LATE arrival is oriented by event time, not arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    // generous watermark so the late row is admitted, not dropped
    val q = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
      watermarkDelay = "2 hours", horizonMs = 4L * 60 * 60 * 1000)
      .writeStream.format("memory").queryName("neardup_late").outputMode("append").start()
    try {
      input.addData((1L, ts(120), base)) // event time 02:00, arrives first
      q.processAllAvailable()
      input.addData((2L, ts(60), base + "tail")) // event time 01:00, arrives SECOND
      q.processAllAvailable()
      val pairs = spark.table("neardup_late")
        .select("first_id", "later_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // doc 2 is event-time-earlier: it must be first_id even though it
      // arrived later — a keep-first consumer keeps the right document.
      assert(pairs.contains((2L, 1L)), pairs)
      assert(!pairs.contains((1L, 2L)), pairs)
    } finally q.stop()
  }

  test("stream: entries beyond the horizon stop matching (bounded state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    // horizon 30 min, watermark delay 1 min
    val q = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
      watermarkDelay = "1 minutes", horizonMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("neardup_ttl").outputMode("append").start()
    try {
      input.addData((1L, ts(0), base))
      q.processAllAvailable()
      // advance the watermark far past doc 1's horizon (unrelated text)
      input.addData((2L, ts(120), unrelated))
      q.processAllAvailable()
      // near-identical to doc 1, but doc 1 is beyond the horizon now
      input.addData((3L, ts(121), base + "tail"))
      q.processAllAvailable()
      val pairs = spark.table("neardup_ttl")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!pairs.contains((1L, 3L)), pairs)
    } finally q.stop()
  }

  test("property: batch candidate set equals candidatePairs on random corpora") {
    // Random small-vocabulary corpora (so bucket collisions actually
    // occur) through two completely different executions of the same
    // bucket structure: the stateful per-bucket fold vs the batch
    // bucket-collect. 5 seeded corpora, one Spark job pair each.
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
      val docs = (1 to 40).map { i =>
        val n = 5 + rng.nextInt(8)
        (i.toLong, ts(i), Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "ts", "text")
      assert(streamedPairs(docs) == expectedPairs(docs), s"seed $seed")
    }
  }

  test("hot-bucket cap keeps event-time-newest entries, drops oldest (batch execution)") {
    // 4 identical docs, cap 2, one batch (deterministic ts order):
    // d2 pairs with 1; d3 with 1,2 (then state=[2,3]); d4 with 2,3 only.
    val docs = (1 to 4).map(i => (i.toLong, ts(i), base)).toDF("doc_id", "ts", "text")
    val pairs = StreamingNearDup.candidates(
      docs, "doc_id", "ts", "text", maxPerBucket = 2)
      .distinct().collect().map(c => (c.first_id, c.later_id)).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)), pairs)
  }
}
