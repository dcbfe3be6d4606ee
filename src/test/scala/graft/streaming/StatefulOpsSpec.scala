package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StatefulOps.{Drift, Event}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("drift detector: per-key state persists across micro-batches, emits on shift") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulOps.detectDrift(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("drift").outputMode("append").start()
    try {
      input.addData(Event(1L, 10.0), Event(1L, 10.0), Event(2L, 5.0))
      q.processAllAvailable()
      assert(spark.table("drift").count() == 0, "first batch has no previous state")

      input.addData(Event(1L, 100.0)) // user 1 mean 10 → 40: |30| > 0.5·10 → emit
      input.addData(Event(2L, 5.0)) //   user 2 mean 5 → 5: stable → silent
      q.processAllAvailable()

      val drifts = spark.table("drift").as[Drift].collect().toSeq
      assert(drifts == Seq(Drift(1L, 3L, 10.0, 40.0)))
    } finally q.stop()
  }

  test("batch execution runs the same fold (single pass, no prior state)") {
    val out = StatefulOps.detectDrift(
      Seq(Event(1L, 1.0), Event(1L, 100.0)).toDS())
    assert(out.count() == 0, "all data in one batch = one fold with empty prior state")
  }

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("event-time sessionize: watermark passing last_event+gap finalizes the session") {
    import StatefulOps.{Session, TimedEvent}
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TimedEvent]
    val q = StatefulOps.sessionize(input.toDS(),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 1 min apart → one session [10:00, 10:01]
      input.addData(TimedEvent(1L, ts(0), 1.0), TimedEvent(1L, ts(1), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0, "watermark has not passed the gap yet")

      // push the watermark beyond 10:01 + 5min with another key's event
      input.addData(TimedEvent(2L, ts(30), 9.0))
      q.processAllAvailable()
      // one more tick so the timeout (checked against the advanced
      // watermark) actually fires
      input.addData(TimedEvent(2L, ts(31), 1.0))
      q.processAllAvailable()

      val sessions = spark.table("sessions").as[Session].collect()
      val u1 = sessions.find(_.user_id == 1L)
      assert(u1.contains(Session(1L, ts(0), ts(1), 2L, 3.0)), sessions.toSeq.toString)
    } finally q.stop()
  }

  test("two late events near each other merge into ONE session behind the open one") {
    import StatefulOps.{Session, TimedEvent}
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TimedEvent]
    // 30-minute watermark delay keeps 10:00-10:02 admissible while the
    // open session sits at 10:20.
    val q = StatefulOps.sessionize(input.toDS(),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("late_sessions").outputMode("append").start()
    try {
      input.addData(TimedEvent(1L, ts(20), 9.0))
      q.processAllAvailable()
      // late pair, > gap before the open session, within gap of each other
      input.addData(TimedEvent(1L, ts(0), 1.0), TimedEvent(1L, ts(2), 2.0))
      q.processAllAvailable()
      // advance the watermark far enough to seal everything (max event
      // 11:40 - 30min = 11:10 > all close points), then tick the timeout
      input.addData(TimedEvent(2L, ts(100), 0.0))
      q.processAllAvailable()
      input.addData(TimedEvent(2L, ts(101), 0.0))
      q.processAllAvailable()
      val u1 = spark.table("late_sessions").as[Session].collect()
        .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(u1.toSeq == Seq(
        Session(1L, ts(0), ts(2), 2L, 3.0),   // ONE merged late session
        Session(1L, ts(20), ts(20), 1L, 9.0)), u1.toSeq.toString)
    } finally q.stop()
  }

  test("randomized: batch sessionize matches an independent sweep reference") {
    import StatefulOps.{Session, TimedEvent}
    val gapMs = 5 * 60 * 1000L
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val events = (1 to 120).map { _ =>
        TimedEvent(rng.nextInt(4).toLong,
          new java.sql.Timestamp(1700000000000L + rng.nextInt(6 * 60) * 60000L),
          rng.nextInt(100) / 10.0)
      }
      // reference: per user, sort, split where gap exceeded, aggregate
      val expected = events.groupBy(_.user_id).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(_.ts.getTime)
        val groups = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
          if (e.ts.getTime - acc.head.head.ts.getTime <= gapMs) (e :: acc.head) :: acc.tail
          else List(e) :: acc
        }
        groups.map { g =>
          val ts = g.map(_.ts.getTime)
          Session(u, new java.sql.Timestamp(ts.min), new java.sql.Timestamp(ts.max),
            g.length.toLong, g.map(_.value).sum)
        }
      }.toSet
      val got = StatefulOps.sessionize(events.toDS(), gapMs = gapMs).collect().toSet
      // compare on everything but the float sum (order-dependent); sums
      // compared rounded
      def key(s: Session) = (s.user_id, s.session_start, s.session_end, s.n_events,
        math.round(s.total * 1e6))
      assert(got.map(key) == expected.map(key), s"trial $trial")
    }
  }

  test("batch sessionize splits on gap and finalizes every session in one pass") {
    import StatefulOps.{Session, TimedEvent}
    val out = StatefulOps.sessionize(
      Seq(
        TimedEvent(1L, ts(0), 1.0), TimedEvent(1L, ts(2), 2.0), // session A
        TimedEvent(1L, ts(20), 5.0),                            // session B (gap > 5min)
        TimedEvent(2L, ts(7), 4.0)
      ).toDS(), gapMs = 5 * 60 * 1000L)
      .collect().toSet
    assert(out == Set(
      Session(1L, ts(0), ts(2), 2L, 3.0),
      Session(1L, ts(20), ts(20), 1L, 5.0),
      Session(2L, ts(7), ts(7), 1L, 4.0)))
  }

  import StatefulOps.{PatternHit, TypedEvent}

  private def ev(u: Long, minute: Int, t: String): TypedEvent =
    TypedEvent(u, ts(minute), t)

  test("matchPattern batch: greedy first-touch chain with overall deadline") {
    val out = StatefulOps.matchPattern(
      Seq(
        // user 1: A@0, B@2, C@5 → hit, span 300 s
        ev(1, 0, "A"), ev(1, 2, "B"), ev(1, 5, "C"),
        // user 2: B before A never counts; chain A@3,B@4 incomplete
        ev(2, 1, "B"), ev(2, 3, "A"), ev(2, 4, "B"),
        // user 3: completes but past the 10-min deadline → no hit
        ev(3, 0, "A"), ev(3, 2, "B"), ev(3, 30, "C"),
        // user 4: first-touch — the LATER faster chain must NOT re-anchor
        ev(4, 0, "A"), ev(4, 40, "A"), ev(4, 41, "B"), ev(4, 42, "C")
      ).toDS(), Seq("A", "B", "C"), withinMs = 10 * 60 * 1000L)
      .collect().toSeq
    assert(out == Seq(PatternHit(1L, ts(0), ts(5), 300L)))
  }

  test("matchPattern: a same-timestamp next-stage event is not strictly after") {
    val out = StatefulOps.matchPattern(
      Seq(ev(1, 0, "A"), ev(1, 0, "B"), ev(1, 1, "B"), ev(1, 2, "C")).toDS(),
      Seq("A", "B", "C"), withinMs = 60 * 60 * 1000L)
      .collect().toSeq
    // B@0 is simultaneous with the anchor → stage 2 waits for B@1
    assert(out == Seq(PatternHit(1L, ts(0), ts(2), 120L)))
  }

  import StatefulOps.PatternOutcome

  test("patternOutcomes batch: matched, abandoned-with-stage, window-scoped advance") {
    val out = StatefulOps.patternOutcomes(
      Seq(
        // user 1: full chain within 10 min → matched, stage 3
        ev(1, 0, "A"), ev(1, 2, "B"), ev(1, 5, "C"),
        // user 2: anchors, B arrives past the deadline → never advances;
        // abandoned at stage 1
        ev(2, 0, "A"), ev(2, 30, "B"),
        // user 3: A then B in window, C late → abandoned at stage 2
        ev(3, 0, "A"), ev(3, 4, "B"), ev(3, 40, "C"),
        // user 4: never anchors (no A) → NO outcome row at all
        ev(4, 1, "B"), ev(4, 2, "C")
      ).toDS(), Seq("A", "B", "C"), withinMs = 10 * 60 * 1000L)
      .collect().sortBy(_.user_id).toSeq
    assert(out == Seq(
      PatternOutcome(1L, ts(0), 3, matched = true),
      PatternOutcome(2L, ts(0), 1, matched = false),
      PatternOutcome(3L, ts(0), 2, matched = false)))
  }

  test("patternOutcomes streaming: abandonment fires on event-time timeout, once") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = StatefulOps.patternOutcomes(
      input.toDS(), Seq("A", "B", "C"), withinMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("aband").outputMode("append").start()
    try {
      // user 1 anchors and completes; user 2 anchors only
      input.addData(ev(1, 0, "A"), ev(2, 0, "A"))
      q.processAllAvailable()
      input.addData(ev(1, 2, "B"), ev(1, 5, "C"))
      q.processAllAvailable()
      val afterMatch = spark.table("aband").as[PatternOutcome].collect().toSeq
      assert(afterMatch == Seq(PatternOutcome(1L, ts(0), 3, matched = true)))

      // watermark must pass user 2's deadline (minute 10): feed a late
      // unrelated event far beyond it, then another batch so the
      // advanced watermark is applied and the timeout fires
      input.addData(ev(9, 50, "X"))
      q.processAllAvailable()
      input.addData(ev(9, 51, "X"))
      q.processAllAvailable()
      val all = spark.table("aband").as[PatternOutcome].collect().sortBy(_.user_id).toSeq
      assert(all == Seq(
        PatternOutcome(1L, ts(0), 3, matched = true),
        PatternOutcome(2L, ts(0), 1, matched = false)))

      // tombstone: later in-pattern events for user 2 must not re-anchor
      input.addData(ev(2, 52, "A"), ev(2, 53, "B"), ev(2, 54, "C"))
      q.processAllAvailable()
      assert(spark.table("aband").count() == 2)
    } finally q.stop()
  }

  test("matchPattern streaming: chain advances across micro-batches, emits once") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = StatefulOps.matchPattern(
      input.toDS(), Seq("A", "B", "C"), withinMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("cep").outputMode("append").start()
    try {
      input.addData(ev(1, 0, "A"), ev(2, 0, "A"))
      q.processAllAvailable()
      assert(spark.table("cep").count() == 0)

      input.addData(ev(1, 2, "B"))
      q.processAllAvailable()
      assert(spark.table("cep").count() == 0)

      input.addData(ev(1, 5, "C"), ev(2, 6, "B"))
      q.processAllAvailable()
      assert(spark.table("cep").as[PatternHit].collect().toSeq ==
        Seq(PatternHit(1L, ts(0), ts(5), 300L)))

      // parked after the hit: a second full chain must not re-emit
      input.addData(ev(1, 20, "A"), ev(1, 21, "B"), ev(1, 22, "C"))
      q.processAllAvailable()
      assert(spark.table("cep").count() == 1)
    } finally q.stop()
  }
}
