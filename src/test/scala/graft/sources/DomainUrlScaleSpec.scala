package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{MetricsProbe, SparkSpec}

/** MEASURES (not argues) the scale claims of the URL-side curation
  * stages, the IngestScaleSpec discipline:
  *
  *  - [[Domains.stats]] is "one hash aggregation whose shuffle carries
  *    GROUPS, not rows" — partial aggregation must absorb an 8× row
  *    growth over a fixed domain set into ≈1× shuffle bytes.
  *  - [[graft.dedup.UrlSeenSet.filterNew]] is "an anti-join whose
  *    per-batch cost is the batch" — against an index inside the
  *    broadcast threshold the plan must be a broadcast LeftAnti (the
  *    batch never shuffles), and shuffle bytes must stay flat when the
  *    seen-set grows 8×. (Past the broadcast threshold the documented
  *    layout is a bucketed index so the join co-locates — that regime
  *    needs a real cluster; this pins the fast path never silently
  *    degrading into a corpus shuffle.)
  */
class DomainUrlScaleSpec extends SparkSpec {

  private def urls(n: Long, tag: String): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat(lit("https://"),
        // 6 hosts over 3 registered domains, the q239 shape
        element_at(array(
          lit("www.example.com"), lit("cdn.example.com"),
          lit("blog.example.co.uk"), lit("shop.example.co.uk"),
          lit("ads.tracker.net"), lit("cdn.static.tracker.net")),
          (col("id") % 6 + 1).cast("int")),
        lit(s"/$tag/"), col("id").cast("string")).as("uri"),
      concat(lit("text for doc "), col("id").cast("string")).as("text"))

  test("Domains.stats shuffle carries groups, not rows (1x vs 8x corpus)") {
    val small = urls(4000, "doc").localCheckpoint()
    val big = urls(32000, "doc").localCheckpoint()
    def run(df: DataFrame): Long = Domains.stats(df, "uri", "text").count()
    assert(run(small) == 3L && run(big) == 3L) // warm-up + sanity

    def best(df: DataFrame) = {
      val a = MetricsProbe.measure(spark)(run(df))
      val b = MetricsProbe.measure(spark)(run(df))
      math.min(a.shuffleWriteBytes, b.shuffleWriteBytes)
    }
    val s1 = best(small)
    val s8 = best(big)
    info(f"stats shuffle write: 1x $s1%d B, 8x $s8%d B")
    val ratio = s8.toDouble / math.max(1L, s1)
    assert(ratio < 2.0,
      f"stats shuffle grew $ratio%.2f× on 8× rows over a fixed domain set — " +
        "partial aggregation is no longer absorbing rows map-side")
  }

  test("UrlSeenSet.filterNew: broadcast LeftAnti plan; batch-flat shuffle vs 8x set") {
    import graft.dedup.UrlSeenSet
    val batch = urls(2000, "doc")
      .select(col("doc_id"), UrlOps.canonicalize(col("uri")).as("canon"))
      .localCheckpoint()
    def seenOf(n: Long) = UrlSeenSet.build(
      urls(n, "old").select(UrlOps.canonicalize(col("uri")).as("canon")), "canon")
    val seen1 = seenOf(4000)
    val seen8 = seenOf(32000)

    // plan gate: the small-set fast path is a broadcast anti-join — the
    // batch side must not shuffle
    val plan = UrlSeenSet.filterNew(batch, "canon", seen1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast") && plan.contains("LeftAnti"),
      s"filterNew against a small seen-set must broadcast the index:\n$plan")

    def run(idx: UrlSeenSet.Index): Long =
      UrlSeenSet.filterNew(batch, "canon", idx).count()
    assert(run(seen1) == 2000L && run(seen8) == 2000L) // disjoint keys: all new

    def best(idx: UrlSeenSet.Index) = {
      val a = MetricsProbe.measure(spark)(run(idx))
      val b = MetricsProbe.measure(spark)(run(idx))
      math.min(a.shuffleWriteBytes, b.shuffleWriteBytes)
    }
    val s1 = best(seen1)
    val s8 = best(seen8)
    info(f"filterNew shuffle write: 1x-set $s1%d B, 8x-set $s8%d B")
    assert(s8.toDouble / math.max(1L, s1) < 2.0 || s8 == 0L,
      f"filterNew shuffle grew ${s8.toDouble / math.max(1L, s1)}%.2f× on an " +
        "8× seen-set — the anti-join is shuffling index-proportional data")
  }

  test("change-aware filterNew: broadcast plan; batch-flat shuffle vs 8x set") {
    import graft.dedup.UrlSeenSet
    val batch = urls(2000, "doc")
      .select(col("doc_id"), UrlOps.canonicalize(col("uri")).as("canon"),
        col("text"))
      .localCheckpoint()
    def seenOf(n: Long) = UrlSeenSet.build(
      urls(n, "old").select(UrlOps.canonicalize(col("uri")).as("canon"),
        col("text")),
      "canon", "text")
    val seen1 = seenOf(4000)
    val seen8 = seenOf(32000)
    // the content form is a broadcast LEFT join + row-local filter —
    // the batch side must not shuffle any more than the URL-only form
    val plan = UrlSeenSet.filterNew(batch, "canon", "text", seen1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"),
      s"content filterNew against a small seen-set must broadcast:\n$plan")
    def run(idx: UrlSeenSet.Index): Long =
      UrlSeenSet.filterNew(batch, "canon", "text", idx).count()
    assert(run(seen1) == 2000L && run(seen8) == 2000L)
    def best(idx: UrlSeenSet.Index) = {
      val a = MetricsProbe.measure(spark)(run(idx))
      val b = MetricsProbe.measure(spark)(run(idx))
      math.min(a.shuffleWriteBytes, b.shuffleWriteBytes)
    }
    val s1 = best(seen1)
    val s8 = best(seen8)
    info(f"content filterNew shuffle write: 1x-set $s1%d B, 8x-set $s8%d B")
    assert(s8.toDouble / math.max(1L, s1) < 2.0 || s8 == 0L,
      f"content filterNew shuffle grew ${s8.toDouble / math.max(1L, s1)}%.2f× " +
        "on an 8× seen-set — the join is shuffling index-proportional data")
  }

  test("compactBucketed: the corpus-sized index side joins with NO exchange") {
    // the past-broadcast-threshold regime, runnable: the seen-set is
    // compacted into a table bucketed on (url_hash, url_hash2) — the
    // join's exact key set — so filterNew's sort-merge join takes the
    // scan's bucketing as its distribution. The ONLY shuffle in the plan
    // is the drop-sized batch moving into the bucket layout; the
    // index side (the 100 TB frontier) never moves.
    import graft.dedup.UrlSeenSet
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val seen = UrlSeenSet.build(
      urls(32000, "old").select(UrlOps.canonicalize(col("uri")).as("canon")),
      "canon")
    val bucketed = UrlSeenSet.compactBucketed(
      seen, tmpDir("url-seen-bucketed"), "graft_seen_bucketed_spec", 8)
    val batch = urls(2000, "doc")
      .select(col("doc_id"), UrlOps.canonicalize(col("uri")).as("canon"))
      .localCheckpoint()
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // past-threshold regime
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan for node collect
    try {
      val q = UrlSeenSet.filterNew(batch, "canon", bucketed)
      assert(q.count() == 2000L) // disjoint key spaces: all new
      val plan = q.queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.size == 1,
        s"expected exactly one exchange (the batch side), got " +
          s"${exchanges.size}:\n$plan")
      // the exchange subtree must not contain the bucketed file scan —
      // i.e. the shuffle is the BATCH moving, never the index
      val scansUnderExchange =
        exchanges.head.collect { case s: FileSourceScanExec => s }
      assert(scansUnderExchange.isEmpty,
        s"the index-side file scan sits under an exchange — the bucketed " +
          s"layout is not being used:\n$plan")
      val indexScans = plan.collect { case s: FileSourceScanExec => s }
      assert(indexScans.nonEmpty &&
        indexScans.forall(_.relation.bucketSpec.isDefined),
        s"expected the index side to be a bucketed table scan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
