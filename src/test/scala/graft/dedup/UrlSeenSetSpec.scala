package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlSeenSetSpec extends SparkSpec {
  import spark.implicits._

  test("filterNew kills seen URLs, keeps new and null; extend accumulates") {
    val seen0 = UrlSeenSet.build(
      Seq("http://a/1", "http://a/2").toDF("canon"), "canon")
    val batch = Seq(
      (1L, "http://a/1"),       // seen → killed
      (2L, "http://a/3"),       // new → kept
      (3L, null: String)        // no evidence → kept
    ).toDF("id", "canon")
    val fresh = UrlSeenSet.filterNew(batch, "canon", seen0)
    assert(fresh.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))

    // extend with the UNFILTERED survivors — including the null row:
    // hashPair drops nulls, so the set gains only /3's pair and a later
    // null URL must STILL be kept (the null-poisoning trap the r14
    // verdict found: xxhash64(null) is a non-null constant, so an
    // unfiltered extend used to plant a pair that killed all nulls)
    val seen1 = UrlSeenSet.extend(seen0, fresh, "canon")
    val batch2 = Seq((4L, "http://a/3"), (5L, "http://a/4"),
      (6L, null: String)).toDF("id", "canon")
    assert(UrlSeenSet.filterNew(batch2, "canon", seen1)
      .select("id").as[Long].collect().sorted.toSeq == Seq(5L, 6L))
    assert(seen1.hashes.count() == 3L)
  }

  test("compact: parquet round-trip is the same set, frame-exactly") {
    val seen = UrlSeenSet.extend(
      UrlSeenSet.build(Seq("http://a/1", "http://a/2").toDF("canon"), "canon"),
      Seq("http://a/3").toDF("canon"), "canon")
    val compacted = UrlSeenSet.compact(seen, tmpDir("url-seen-compact"))
    assert(seen.hashes.exceptAll(compacted.hashes).isEmpty &&
      compacted.hashes.exceptAll(seen.hashes).isEmpty)
    val batch = (1 to 4).map(i => (i.toLong, s"http://a/$i")).toDF("id", "canon")
    val a = UrlSeenSet.filterNew(batch, "canon", seen)
      .select("id").as[Long].collect().sorted.toSeq
    val b = UrlSeenSet.filterNew(batch, "canon", compacted)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a == Seq(4L))
  }

  test("empty set: everything is new") {
    val batch = Seq((1L, "http://a/1")).toDF("id", "canon")
    assert(UrlSeenSet.filterNew(batch, "canon", UrlSeenSet.empty(spark))
      .count() == 1L)
  }

  test("change-aware: changed content passes and supersedes; unchanged dies") {
    val day1 = Seq(("http://a/1", "alpha"), ("http://a/2", "beta"))
      .toDF("canon", "text")
    val seen0 = UrlSeenSet.build(day1, "canon", "text")
    val day2 = Seq(
      (1L, "http://a/1", "alpha"),      // unchanged re-crawl → killed
      (2L, "http://a/2", "beta v2"),    // CHANGED → kept (refresh)
      (3L, "http://a/3", "gamma"),      // new URL → kept
      (4L, null: String, "delta")       // null URL → kept (no evidence)
    ).toDF("id", "canon", "text")
    val fresh = UrlSeenSet.filterNew(day2, "canon", "text", seen0)
    assert(fresh.select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 4L))
    // schema passthrough: the joined hash columns must not leak
    assert(fresh.columns.toSeq == Seq("id", "canon", "text"))

    // upsert: /2 now stored at v2 — offering v2 again dies, v1 (stale)
    // differs from the stored hash so it would re-enter; /3 recorded
    val seen1 = UrlSeenSet.extend(seen0, fresh, "canon", "text")
    assert(seen1.hashes.count() == 3L) // one row per URL, not four
    val day3 = Seq(
      (5L, "http://a/2", "beta v2"),    // superseded hash → killed
      (6L, "http://a/2", "beta"),       // differs from stored v2 → kept
      (7L, "http://a/3", "gamma")       // unchanged → killed
    ).toDF("id", "canon", "text")
    assert(UrlSeenSet.filterNew(day3, "canon", "text", seen1)
      .select("id").as[Long].collect().sorted.toSeq == Seq(6L))
    // the URL-only form still treats all three URLs as seen
    assert(UrlSeenSet.filterNew(day3, "canon", seen1).count() == 0L)
  }

  test("change-aware: URL-only rows (null stored hash) are kept, then upgraded") {
    // a URL recorded WITHOUT content evidence must not kill on content
    val seen0 = UrlSeenSet.build(Seq("http://a/1").toDF("canon"), "canon")
    val batch = Seq((1L, "http://a/1", "alpha")).toDF("id", "canon", "text")
    val kept = UrlSeenSet.filterNew(batch, "canon", "text", seen0)
    assert(kept.select("id").as[Long].collect().toSeq == Seq(1L))
    // the upsert replaces the evidence-free row with the hashed one
    val seen1 = UrlSeenSet.extend(seen0, kept, "canon", "text")
    assert(seen1.hashes.count() == 1L)
    assert(UrlSeenSet.filterNew(batch, "canon", "text", seen1).count() == 0L)
  }

  test("change-aware: compact round-trip preserves verdicts") {
    val seen = UrlSeenSet.extend(
      UrlSeenSet.build(Seq(("http://a/1", "x")).toDF("canon", "text"),
        "canon", "text"),
      Seq(("http://a/2", "y")).toDF("canon", "text"), "canon", "text")
    val compacted = UrlSeenSet.compact(seen, tmpDir("url-seen-content-compact"))
    val probe = Seq(
      (1L, "http://a/1", "x"), (2L, "http://a/1", "x2"),
      (3L, "http://a/2", "y"), (4L, "http://a/3", "z")
    ).toDF("id", "canon", "text")
    def verdict(ix: UrlSeenSet.Index) =
      UrlSeenSet.filterNew(probe, "canon", "text", ix)
        .select("id").as[Long].collect().sorted.toSeq
    assert(verdict(seen) == Seq(2L, 4L) && verdict(compacted) == Seq(2L, 4L))
  }
}
