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
}
