package graft.gold

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants for the behavioral-analytics family
  * (q157-q161) that the DuckDB hash gate can't express directly:
  * funnel monotonicity, retention bounds, gap-fill contiguity and
  * interpolation bounds, SCD2 interval chaining, expectation verdicts.
  */
class BehaviorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("funnel steps are monotonically non-increasing") {
    val rows = BehaviorQueries.queries("q157_funnel")(spark, dir)
      .orderBy("step").collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.sliding(2).forall { case Array(a, b) => b <= a })
    // every step-2+ row reports its conversion against the previous step
    rows.drop(1).zip(counts.sliding(2).toSeq).foreach { case (r, Array(prev, cur)) =>
      if (prev > 0)
        assert(math.abs(r.getAs[Double]("pct_of_prev") -
          math.rint(cur.toDouble / prev * 10000) / 10000) < 1e-9)
    }
  }

  test("cohort retention is 1.0 at offset 0 and never exceeds cohort size") {
    val df = BehaviorQueries.queries("q158_cohort_retention")(spark, dir)
    val bad = df.filter(
      (col("month_offset") === 0 && col("retention_pct") =!= 1.0) ||
        col("n_active") > col("cohort_size") ||
        col("retention_pct") <= 0.0 || col("retention_pct") > 1.0)
    assert(bad.isEmpty, bad.limit(5).collect().mkString("; "))
  }

  test("gap-fill emits a contiguous daily grid with bounded interpolation") {
    val df = BehaviorQueries.queries("q159_gap_fill")(spark, dir).cache()
    try {
      // contiguity: per user, row count == span length, no duplicate days
      val spans = df.groupBy("user_id")
        .agg(count(lit(1)).as("n"), countDistinct(col("day")).as("nd"),
          (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
      assert(spans.filter(col("n") =!= col("span") || col("nd") =!= col("n")).isEmpty)
      // gap rows (n_purchases = 0) interpolate within the LOCF/next bounds:
      // lerp is a convex combination of flanks, so it can never escape
      // [min(locf, lerp-target), max(...)]; locf_cents is always defined.
      assert(df.filter(col("locf_cents").isNull).isEmpty)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      val fwd = w.rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val nextObs = first(when(col("n_purchases") > 0, col("lerp_cents")),
        ignoreNulls = true).over(fwd)
      val gaps = df.withColumn("next_c", nextObs)
        .filter(col("n_purchases") === 0)
        .filter(!(col("lerp_cents") >= least(col("locf_cents"), col("next_c")) &&
          col("lerp_cents") <= greatest(col("locf_cents"), col("next_c"))))
      assert(gaps.isEmpty, gaps.limit(5).collect().mkString("; "))
    } finally df.unpersist()
  }

  test("scd2 intervals chain exactly and collapse consecutive duplicates") {
    val df = BehaviorQueries.queries("q160_scd2_history")(spark, dir).cache()
    try {
      // exactly one open (is_current) interval per key
      val open = df.filter(col("is_current")).groupBy("user_id").count()
      assert(open.filter(col("count") =!= 1).isEmpty)
      // valid_to of version v == valid_from of version v+1 (half-open chain)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("version")
      val chained = df
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
      assert(chained.filter(col("next_from").isNotNull &&
        col("valid_to") =!= col("next_from")).isEmpty)
      // consecutive intervals never carry the same attribute value
      assert(chained.filter(col("next_type").isNotNull &&
        col("next_type") === col("event_type")).isEmpty)
      // versions are 1..n dense per key
      val dense = df.groupBy("user_id")
        .agg(min(col("version")).as("v0"), max(col("version")).as("v1"),
          count(lit(1)).as("n"))
      assert(dense.filter(col("v0") =!= 1 || col("v1") =!= col("n")).isEmpty)
    } finally df.unpersist()
  }

  test("expectation suite flags exactly the testdata's real defect") {
    val rows = BehaviorQueries.queries("q161_expectations")(spark, dir).collect()
    assert(rows.length == 8)
    val failedChecks = rows.filterNot(_.getAs[Boolean]("passed"))
      .map(_.getAs[String]("check_name"))
    // The synthetic generator does NOT deduplicate (l_orderkey,
    // l_linenumber) — 4,599 distinct pairs across 6,000 rows at
    // sf0.001 — so the uniqueness constraint legitimately fails while
    // completeness/range/set/freshness all hold. The suite catching a
    // real defect in driver-shipped data is the point of the operator.
    assert(failedChecks.toSeq == Seq("pk_unique"),
      s"failed: ${failedChecks.mkString(", ")}")
  }

  test("interval coverage/peak match a brute-force sequential sweep") {
    // Independent recompute: collect the raw events, rebuild the same
    // intervals, and run the textbook in-memory sweep per user — the
    // windowed query must agree exactly on every user.
    val raw = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + (col("event_id") % 120 + 1) * lit(1000000L)).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = raw.groupBy(_._1).map { case (u, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sortBy(identity)
      var maxEnd = Long.MinValue
      var covered = 0L
      sorted.foreach { case (s, e) =>
        covered += math.max(0L, e - math.max(s, if (maxEnd == Long.MinValue) s else maxEnd))
        maxEnd = math.max(maxEnd, e)
      }
      val ticks = ivs.flatMap(t => Seq((t._2, 1), (t._3, -1))).sortBy(identity)
      var run = 0
      var peak = 0
      ticks.foreach { t => run += t._2; peak = math.max(peak, run) }
      u -> (ivs.size.toLong, covered, peak.toLong)
    }
    val got = BehaviorQueries.queries("q212_interval_coverage")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    // the union length is genuinely shorter than the naive duration sum
    // somewhere (the query is not just sum(e - s))
    val naive = raw.groupBy(_._1).map { case (u, ivs) =>
      u -> ivs.map(t => t._3 - t._2).sum }
    assert(naive.exists { case (u, n) => n > got(u)._2 })
  }

  test("closed-form CUSUM equals the sequential recurrence") {
    val got = BehaviorQueries.queries("q213_cusum_drift")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // Recompute S_t = max(0, S_{t-1} + dev_t) the slow sequential way
    // from the same daily counts.
    got.keys.map(_._1).toSeq.distinct.foreach { et =>
      val days = got.filter(_._1._1 == et).toSeq.sortBy(_._1._2)
      val xs = days.map(_._2._1)
      val dd = xs.size.toLong
      val tt = xs.sum
      var s = 0L
      days.zip(xs).foreach { case (((_, _), (_, cusum)), x) =>
        s = math.max(0L, s + (x * dd - tt))
        assert(cusum == s, s"cusum mismatch for $et")
      }
    }
    assert(got.nonEmpty)
  }
}
