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

  test("advanceFailures: advances the generation, backs off, tombstones " +
      "on 404 strikes, ignores unknown urls, stays exchange-free") {
    val s0 = RecrawlSchedule.advance(RecrawlSchedule.emptyState(spark),
      Seq(("u", 0.0, 1L), ("v", 0.0, 1L)).toDF("url", "t", "h"),
      "url", "t", "h").localCheckpoint()
    // one 503 with Retry-After: last_fetch ADVANCES (the stall fix),
    // fail streak starts, the unknown url "x" is ignored
    val s1 = RecrawlSchedule.advanceFailures(s0,
      Seq(("u", 1.0, 503, Some(9.0)), ("x", 1.0, 404, None))
        .toDF("url", "t", "status", "ra"),
      "url", "t", "status", "ra").localCheckpoint()
    val plan = RecrawlSchedule.advanceFailures(s0,
      Seq(("u", 1.0, 503, Option.empty[Double]))
        .toDF("url", "t", "status", "ra"),
      "url", "t", "status", "ra").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"state side shuffled:\n$plan")
    val u1 = s1.where($"url" === "u")
      .select("last_fetch", "fail_streak", "gone", "retry_after")
      .as[(Double, Int, Boolean, Option[Double])].head()
    assert(u1 == ((1.0, 1, false, Some(9.0))), s"u after one 503: $u1")
    assert(s1.count() == 2, "unknown url minted a state row")
    // Retry-After floors the delay: interval 2^1 = 2 but next = lf + 9
    val du = RecrawlSchedule.scheduleOf(s1, 1.0, 8.0)
      .where($"url" === "u").select("interval_seconds", "next_fetch")
      .as[(Double, Double)].head()
    assert(du == ((2.0, 10.0)), s"RA-floored schedule: $du")
    // two more failures ENDING in 404 → tombstoned, due() never emits
    val s3 = Seq(2.0, 3.0).foldLeft(s1) { (st, t) =>
      RecrawlSchedule.advanceFailures(st,
        Seq(("u", t, 404, Option.empty[Double])).toDF("url", "t", "status", "ra"),
        "url", "t", "status", "ra").localCheckpoint()
    }
    val u3 = s3.where($"url" === "u").select("fail_streak", "gone")
      .as[(Int, Boolean)].head()
    assert(u3 == ((3, true)), s"u after 3 strikes: $u3")
    assert(RecrawlSchedule.due(s3, asOf = 1e9, 1.0, 8.0)
      .where($"url" === "u").isEmpty, "tombstoned url still due")
    // a success resurrects: streaks clear, gone drops
    val s4 = RecrawlSchedule.advance(s3,
      Seq(("u", 4.0, 1L)).toDF("url", "t", "h"), "url", "t", "h")
    val u4 = s4.where($"url" === "u")
      .select("n_fetches", "unchanged_streak", "fail_streak", "gone")
      .as[(Long, Int, Int, Boolean)].head()
    assert(u4 == ((2L, 1, 0, false)), s"u after resurrection: $u4")
  }

  test("representativeFailures: a terminal 404 beats a same-drain 503 " +
      "and retry_after stays paired with the chosen response") {
    val raw = Seq(
      ("u", 503, Some(30.0)), ("u", 404, Option.empty[Double]), // terminal wins
      ("v", 503, Option.empty[Double]), ("v", 500, Some(7.0)),  // 503 wins, RA stays null
      ("w", 429, Some(5.0))                                     // singleton passthrough
    ).toDF("url", "status", "ra")
    val got = RecrawlSchedule.representativeFailures(raw, "url", "status", "ra")
      .orderBy("url")
      .as[(String, Int, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("u", 404, None),   // independent maxes would read (503, 30.0)
      ("v", 503, None),   // independent maxes would read (503, 7.0)
      ("w", 429, Some(5.0))), s"representatives: $got")
  }

  test("seedFromLastmod: age-derived streak priors survive the first " +
      "fetch, known urls are never re-seeded, seeds are never due") {
    val seeds = Seq(
      ("fresh", Some(990.0)),   // age 10 < base → streak 0
      ("old", Some(200.0)),     // age 800 → floor(log2(8)) = 3 → clamp 3? max/base=8 → cap 3
      ("ancient", Some(-1e6)),  // clamped at log2(max/base) = 3
      ("nohint", Option.empty[Double])) // no lastmod → not seeded
      .toDF("url", "lm")
    val st0 = RecrawlSchedule.seedFromLastmod(
      RecrawlSchedule.emptyState(spark), seeds, "url", "lm",
      asOf = 1000.0, baseIntervalSeconds = 100.0,
      maxIntervalSeconds = 800.0)
    val got0 = st0.select("url", "n_fetches", "unchanged_streak")
      .as[(String, Long, Int)].collect().sorted.toSeq
    assert(got0 == Seq(("ancient", 0L, 3), ("fresh", 0L, 0), ("old", 0L, 3)),
      s"seeded state: $got0")
    // seeds never emit from due() — their first fetch is discovery's
    assert(RecrawlSchedule.due(st0, asOf = 1e9, 100.0, 800.0).isEmpty,
      "a never-fetched seed row was due")
    // a real observation outranks a later hint: re-seeding is a no-op
    val st1 = RecrawlSchedule.seedFromLastmod(st0,
      Seq(("fresh", Some(-1e6))).toDF("url", "lm"), "url", "lm",
      asOf = 1000.0, baseIntervalSeconds = 100.0,
      maxIntervalSeconds = 800.0)
    assert(st1.where($"url" === "fresh").count() == 1)
    // the first fetch KEEPS the seeded streak (no change evidence
    // against the prior); the second unchanged fetch grows it, a
    // changed one resets it
    val f1 = RecrawlSchedule.advance(st1,
      Seq(("old", 1000.0, 7L), ("fresh", 1000.0, 7L)).toDF("url", "t", "h"),
      "url", "t", "h")
    val g1 = f1.where($"url".isin("old", "fresh"))
      .select("url", "n_fetches", "unchanged_streak")
      .as[(String, Long, Int)].collect().sorted.toSeq
    assert(g1 == Seq(("fresh", 1L, 0), ("old", 1L, 3)),
      s"after first fetch: $g1")
    val f2 = RecrawlSchedule.advance(f1,
      Seq(("old", 1100.0, 7L), ("fresh", 1100.0, 9L)).toDF("url", "t", "h"),
      "url", "t", "h")
    val g2 = f2.where($"url".isin("old", "fresh"))
      .select("url", "n_fetches", "unchanged_streak")
      .as[(String, Long, Int)].collect().sorted.toSeq
    assert(g2 == Seq(("fresh", 2L, 0), ("old", 2L, 4)),
      s"after second fetch (old unchanged, fresh changed): $g2")
  }

  test("withFailureDefaults migrates a pre-failure-era state frame") {
    val old = Seq(("u", 1.0, 1L, 2L, 1))
      .toDF("url", "last_fetch", "last_hash", "n_fetches", "unchanged_streak")
    val got = RecrawlSchedule.withFailureDefaults(old)
      .select("url", "fail_streak", "gone", "retry_after")
      .as[(String, Int, Boolean, Option[Double])].head()
    assert(got == (("u", 0, false, None)), s"migrated: $got")
    // already-migrated frames pass through unchanged
    assert(RecrawlSchedule.withFailureDefaults(
      RecrawlSchedule.emptyState(spark)).columns.count(_ == "gone") == 1)
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
