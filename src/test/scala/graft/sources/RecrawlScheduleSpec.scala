package graft.sources

import graft.SparkSpec

class RecrawlScheduleSpec extends SparkSpec {
  import spark.implicits._

  test("schedule: churners keep the base interval, static pages back off, clamp holds") {
    val base = 100.0
    val fetches = Seq(
      // churner: every observation changed → streak 0 → base
      ("churn", 1000.0, 1L), ("churn", 2000.0, 2L), ("churn", 3000.0, 3L),
      // static: 4 fetches never changed → streak 3 → base * 8
      ("static", 1000.0, 7L), ("static", 2000.0, 7L),
      ("static", 3000.0, 7L), ("static", 4000.0, 7L),
      // changed mid-history, stable since: 5 fetches, change at #3 → streak 2
      ("mixed", 1000.0, 1L), ("mixed", 2000.0, 1L), ("mixed", 3000.0, 2L),
      ("mixed", 4000.0, 2L), ("mixed", 5000.0, 2L),
      // single observation: no evidence → base
      ("once", 1000.0, 9L)
    ).toDF("url", "t", "h")
    val got = RecrawlSchedule.schedule(fetches, "url", "t", "h",
      baseIntervalSeconds = base, maxIntervalSeconds = 500.0)
      .select("url", "last_fetch", "n_fetches", "unchanged_streak",
        "interval_seconds", "next_fetch")
      .as[(String, Double, Long, Int, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("churn") == ("churn", 3000.0, 3L, 0, 100.0, 3100.0), s"${got("churn")}")
    // static would be base*8=800 but clamps at 500
    assert(got("static") == ("static", 4000.0, 4L, 3, 500.0, 4500.0), s"${got("static")}")
    assert(got("mixed") == ("mixed", 5000.0, 5L, 2, 400.0, 5400.0), s"${got("mixed")}")
    assert(got("once") == ("once", 1000.0, 1L, 0, 100.0, 1100.0), s"${got("once")}")
  }

  test("schedule: null content hashes form one change-class (null ≡ null)") {
    val fetches = Seq(
      ("u", 1000.0, None: Option[Long]), ("u", 2000.0, None: Option[Long]),
      ("v", 1000.0, Some(1L)), ("v", 2000.0, None: Option[Long]))
      .toDF("url", "t", "h")
    val got = RecrawlSchedule.schedule(fetches, "url", "t", "h",
      baseIntervalSeconds = 10.0, maxIntervalSeconds = 1000.0)
      .select("url", "unchanged_streak")
      .as[(String, Int)].collect().toMap
    // null → null is "unchanged" (streak 1); 1 → null is a change (streak 0)
    assert(got("u") == 1 && got("v") == 0, s"streaks: $got")
  }

  test("rolling fold over drains ≡ schedule over the full history " +
      "(randomized)") {
    // 40 urls × up to 6 drains, pseudo-random change patterns (seeded —
    // reproducible). Each drain carries a random subset of urls; the
    // per-drain advance fold must land on exactly the state schedule()
    // derives from the concatenated history.
    val rnd = new scala.util.Random(20260816L)
    val history = for {
      u <- 0 until 40
      t <- 0 until (1 + rnd.nextInt(6)) if rnd.nextBoolean() || t == 0
    } yield (s"http://h$u.example/p", t.toDouble, rnd.nextInt(3).toLong)
    val hist = history.toDF("url", "t", "h").localCheckpoint()
    val folded = (0 until 6).foldLeft(RecrawlSchedule.emptyState(spark)) {
      (st, t) =>
        RecrawlSchedule.advance(st, hist.where($"t" === t.toDouble),
          "url", "t", "h").localCheckpoint()
    }
    val wantFull = RecrawlSchedule.schedule(hist, "url", "t", "h",
      baseIntervalSeconds = 1.0, maxIntervalSeconds = 8.0)
    val gotDue = RecrawlSchedule.due(folded, asOf = 4.0,
        baseIntervalSeconds = 1.0, maxIntervalSeconds = 8.0)
      .select("url", "last_fetch", "n_fetches", "unchanged_streak",
        "interval_seconds", "next_fetch")
      .as[(String, Double, Long, Int, Double, Double)].collect().sorted.toSeq
    val wantDue = wantFull.where($"next_fetch" <= 4.0)
      .select("url", "last_fetch", "n_fetches", "unchanged_streak",
        "interval_seconds", "next_fetch")
      .as[(String, Double, Long, Int, Double, Double)].collect().sorted.toSeq
    assert(gotDue.nonEmpty, "degenerate fixture: no url due")
    assert(gotDue == wantDue)
    // and the full folded state matches on every url, not just due ones
    val gotAll = folded.select("url", "last_fetch", "n_fetches",
        "unchanged_streak")
      .as[(String, Double, Long, Int)].collect().sorted.toSeq
    val wantAll = wantFull.select("url", "last_fetch", "n_fetches",
        "unchanged_streak")
      .as[(String, Double, Long, Int)].collect().sorted.toSeq
    assert(gotAll == wantAll)
  }

  test("advance: the state side joins without an exchange (batch is " +
      "broadcast both ways)") {
    val state0 = RecrawlSchedule.advance(RecrawlSchedule.emptyState(spark),
      Seq(("u", 1.0, 1L), ("v", 1.0, 2L)).toDF("url", "t", "h"),
      "url", "t", "h").localCheckpoint()
    val step = RecrawlSchedule.advance(state0,
      Seq(("u", 2.0, 1L), ("w", 2.0, 3L)).toDF("url", "t", "h"),
      "url", "t", "h")
    val plan = step.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"state side shuffled:\n$plan")
    val got = step.select("url", "n_fetches", "unchanged_streak")
      .as[(String, Long, Int)].collect().sorted.toSeq
    assert(got == Seq(("u", 2L, 1), ("v", 1L, 0), ("w", 1L, 0)), s"$got")
  }

  test("schedule: parameter validation") {
    val f = Seq(("u", 1.0, 1L)).toDF("url", "t", "h")
    intercept[IllegalArgumentException](
      RecrawlSchedule.schedule(f, "url", "t", "h", baseIntervalSeconds = 0.0))
    intercept[IllegalArgumentException](
      RecrawlSchedule.schedule(f, "url", "t", "h",
        baseIntervalSeconds = 10.0, maxIntervalSeconds = 5.0))
  }
}
