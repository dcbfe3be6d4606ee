package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.{MinHashDedup, Shingles}

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("batch differential: candidate set equals MinHashDedup.candidatePairs") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), lit(ts(0)).as("ts"), col("text"))

    // Batch reference: the corpus bucket-collect pair generation.
    val withSig = docs
      .select(col("doc_id"), Shingles.shingleSet(col("text"), 3).as("shset"))
      .filter(size(col("shset")) > 0)
      .withColumn("sig", MinHashDedup.signature(col("shset"), 32 * 4))
    val expected = MinHashDedup.candidatePairs(withSig, "doc_id", "sig", 32, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Streaming operator in batch execution (watermark 0: nothing
    // evicts; cap high enough that no bucket truncates).
    val got = StreamingNearDup.candidates(
      docs, "doc_id", "ts", "text", maxPerBucket = 100000)
      .collect()
      .map(c => (math.min(c.first_id, c.later_id), math.max(c.first_id, c.later_id)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty) // the corpus plants near-dups; empty = broken
  }

  test("stream: a near-identical doc in a later micro-batch emits a candidate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
      watermarkDelay = "5 minutes", horizonMs = 60L * 60 * 1000)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      input.addData((1L, ts(0), base), (2L, ts(1), "completely unrelated words here nothing shared at all zero overlap"))
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

  test("stream: entries beyond the horizon stop matching (bounded state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
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
      input.addData((2L, ts(120), "completely unrelated words here nothing shared at all zero overlap"))
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

      val withSig = docs
        .select(col("doc_id"), Shingles.shingleSet(col("text"), 3).as("shset"))
        .filter(size(col("shset")) > 0)
        .withColumn("sig", MinHashDedup.signature(col("shset"), 32 * 4))
      val expected = MinHashDedup.candidatePairs(withSig, "doc_id", "sig", 32, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = StreamingNearDup.candidates(
        docs, "doc_id", "ts", "text", maxPerBucket = 100000)
        .collect()
        .map(c => (math.min(c.first_id, c.later_id), math.max(c.first_id, c.later_id)))
        .toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("hot-bucket cap keeps newest entries, drops oldest") {
    // 4 identical docs, cap 2, one batch (deterministic ts order):
    // d2 pairs with 1; d3 with 1,2 (then state=[2,3]); d4 with 2,3 only.
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = (1 to 4).map(i => (i.toLong, ts(i), base)).toDF("doc_id", "ts", "text")
    val pairs = StreamingNearDup.candidates(
      docs, "doc_id", "ts", "text", maxPerBucket = 2)
      .distinct().collect().map(c => (c.first_id, c.later_id)).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)), pairs)
  }
}
