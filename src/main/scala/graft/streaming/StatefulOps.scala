package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** µs ↔ java.sql.Timestamp, shared by every stateful operator in this
  * package (the event tables carry µs precision; `getTime` alone is
  * millis). A top-level object: closures reference it through the
  * static module instance, capturing nothing — unlike a method on the
  * enclosing (non-serializable) operator object, which would drag
  * `this` into closure serialization.
  */
private[streaming] object TimeUs {
  def toMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}

/** Custom per-key streaming state via flatMapGroupsWithState — the
  * escape hatch for semantics the built-in windows can't express. The
  * example operator here is per-user cumulative accounting with
  * change-point emission: emit a record only when a user's running mean
  * shifts by more than `threshold` × the previous mean (a simple online
  * drift detector; the shape generalizes to sessionized feature
  * extraction, CDC folding, etc.).
  *
  * State is bounded: one [[UserAgg]] per active key, with a processing-
  * time timeout evicting idle keys — the knob that keeps state size
  * proportional to *active* users, not all users ever seen.
  *
  * Works identically over a batch Dataset (Spark runs the same function
  * per group) which is how the spec pins semantics without a cluster.
  */
object StatefulOps {

  final case class Event(user_id: Long, value: Double)
  final case class UserAgg(n: Long, sum: Double) {
    def mean: Double = if (n == 0) 0.0 else sum / n
  }
  final case class Drift(user_id: Long, n_events: Long, prev_mean: Double, new_mean: Double)

  /** Fold a user's new events into running state; emit a Drift record on
    * significant mean shift.
    */
  /** `idleTimeout`: opt-in processing-time eviction of idle keys. Note it
    * keeps the micro-batch engine scheduling timeout-check batches, so
    * `processAllAvailable`-style draining never settles — use it on
    * long-running continuous queries, not AvailableNow/drain-style runs.
    */
  def detectDrift(
      events: Dataset[Event],
      threshold: Double = 0.5,
      idleTimeout: Option[String] = None
  ): Dataset[Drift] = {
    import events.sparkSession.implicits._
    // Captured as primitives: referencing the Dataset inside the fold
    // closure would drag it into executor serialization.
    val streaming = events.isStreaming
    val timeout = idleTimeout.filter(_ => streaming)

    def fold(userId: Long, it: Iterator[Event], state: GroupState[UserAgg]): Iterator[Drift] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val prev = state.getOption.getOrElse(UserAgg(0L, 0.0))
      var agg = prev
      it.foreach(e => agg = UserAgg(agg.n + 1, agg.sum + e.value))
      state.update(agg)
      timeout.foreach(state.setTimeoutDuration)
      val shifted = prev.n > 0 &&
        math.abs(agg.mean - prev.mean) > threshold * math.abs(prev.mean)
      if (shifted) Iterator.single(Drift(userId, agg.n, prev.mean, agg.mean))
      else Iterator.empty
    }

    val timeoutConf =
      if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(fold)
  }

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionAgg(startUs: Long, endUs: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long, total: Double)


  /** Event-time sessionization with WATERMARK-driven finalization — the
    * event-time-timeout counterpart to [[detectDrift]]'s processing-time
    * eviction. State per key is the LIST of still-open sessions (late
    * in-watermark events can open a session BEHIND the newest one, and
    * two late events near each other must merge — single-open-session
    * state cannot represent that). Each batch merges new events into the
    * interval list, emits every session the watermark has sealed
    * (end + gap ≤ watermark: no admissible future event can extend it),
    * and registers a timeout at the earliest unsealed close point.
    * Events later than the watermark are dropped by Spark before
    * reaching the fold — the session_window contract, in the state
    * formulation that also supports custom per-session payloads.
    *
    * In batch execution timeouts never fire, so the fold finalizes every
    * session at end of group instead — same output, single pass.
    *
    * State-format note: the per-key state is `List[SessionAgg]` (was a
    * single `SessionAgg` before multi-open-session support). A streaming
    * checkpoint written by the old format does NOT restore into this
    * operator — restart such queries with a fresh checkpoint directory.
    */
  def sessionize(
      events: Dataset[TimedEvent],
      gapMs: Long = 5 * 60 * 1000L,
      watermarkDelay: String = "10 seconds"
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val gapUs = gapMs * 1000L

    // Conversions live in [[TimeUs]] (static module access — nothing the
    // fold closure touches drags this non-serializable operator object
    // into closure serialization).
    import TimeUs.{fromMicros, toMicros}
    def finalize(userId: Long, s: SessionAgg): Session =
      Session(userId, fromMicros(s.startUs), fromMicros(s.endUs), s.n, s.sum)

    // Gap-merge a start-sorted interval list: neighbors ≤ gap apart fuse
    // (an event can bridge two previously-separate open sessions).
    def sweep(intervals: Seq[SessionAgg]): List[SessionAgg] =
      intervals.sortBy(s => (s.startUs, s.endUs)).foldLeft(List.empty[SessionAgg]) {
        case (cur :: done, s) if s.startUs <= cur.endUs + gapUs =>
          SessionAgg(cur.startUs, math.max(cur.endUs, s.endUs),
            cur.n + s.n, cur.sum + s.sum) :: done
        case (acc, s) => s :: acc
      }.reverse

    def fold(userId: Long, it: Iterator[TimedEvent],
             state: GroupState[List[SessionAgg]]): Iterator[Session] = {
      val wmUs = if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MaxValue
      val incoming = it.map(e => SessionAgg(toMicros(e.ts), toMicros(e.ts), 1L, e.value))
      val merged = sweep(state.getOption.getOrElse(Nil) ++ incoming)
      // Closed = the watermark passed the close point STRICTLY: Spark
      // admits events with ts == watermark (late means ts < watermark),
      // and the inclusive gap rule (the q57-pinned contract — a gap
      // exactly equal to the threshold extends the session) means such
      // an event still extends a session ending gap-before it. A `<=`
      // here sealed exactly at the boundary and split what batch merges.
      // Batch closes all (wmUs = MaxValue).
      val (closed, open) = merged.partition(s => s.endUs + gapUs < wmUs)
      if (open.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(open)
        // Timeout at the earliest unsealed close point, strictly beyond
        // the current watermark or Spark rejects it.
        state.setTimeoutTimestamp(
          math.max(open.map(s => s.endUs + gapUs).min / 1000L,
            state.getCurrentWatermarkMs() + 1))
      }
      closed.iterator.map(finalize(userId, _))
    }

    val withWm =
      if (streaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  final case class TypedEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class PatternState(stage: Int, anchorUs: Long, prevUs: Long, done: Boolean)
  final case class PatternHit(user_id: Long, t_start: java.sql.Timestamp,
                              t_end: java.sql.Timestamp, span_seconds: Long)

  /** Sequence/CEP detection with first-touch semantics: per key, anchor
    * on the EARLIEST `pattern(0)` event, then advance each stage at the
    * earliest later event of the next stage's type (strictly increasing
    * event time); emit one [[PatternHit]] iff the chain completes within
    * `withinMs` of the anchor. Exactly the greedy chain `t1 = min ts(A);
    * t_i = min ts(p_i) > t_{i-1}; hit ⟺ t_n ≤ t_1 + D` — a relational
    * recompute the oracle replays with n chained min-joins.
    *
    * State is O(1) per key — (stage, anchor, prev, done) — never an
    * event buffer: the automaton is single-pass over time-ordered
    * events. Each micro-batch's group iterator is time-sorted before
    * folding (the BATCH-mode working set is one key's events in one
    * task — fine for user-keyed streams, a deliberate cost on
    * pathologically hot keys); ACROSS batches the operator requires
    * non-decreasing per-key event time (log-replay / range-staged
    * ingest — what q199_streaming_pattern stages by construction). A
    * chain that completes past the deadline parks in `done`
    * (first-touch: no re-anchor), as does an emitted hit — repeat
    * completions can't double-emit under AvailableNow restarts within
    * one run.
    *
    * State COUNT ∝ anchored keys and is never evicted here: on a
    * continuous stream over an unbounded key space, bound it upstream
    * (key TTL at ingest) or drain bounded corpora per run (the
    * q199/q204 deployment shape) — silent eviction would either forget
    * chain progress or re-open double-emission. The same note applies
    * to [[patternOutcomes]]' parked tombstones.
    */
  def matchPattern(
      events: Dataset[TypedEvent],
      pattern: Seq[String],
      withinMs: Long
  ): Dataset[PatternHit] = {
    require(pattern.nonEmpty, "pattern must have at least one stage")
    import events.sparkSession.implicits._
    import TimeUs.{fromMicros, toMicros}
    val stages = pattern.toArray
    val withinUs = withinMs * 1000L

    def fold(userId: Long, it: Iterator[TypedEvent],
             state: GroupState[PatternState]): Iterator[PatternHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var st = state.getOption.getOrElse(PatternState(0, 0L, Long.MinValue, done = false))
      if (st.done) return Iterator.empty // parked: hit emitted or deadline blown
      var hit: PatternHit = null
      // time-sort WITHIN the batch; cross-batch order is the caller's
      // ingest contract (see scaladoc)
      val sorted = it.toArray.sortBy(e => toMicros(e.ts))
      var i = 0
      while (i < sorted.length && !st.done) {
        val e = sorted(i)
        val us = toMicros(e.ts)
        if (e.event_type == stages(st.stage) && us > st.prevUs) {
          val anchor = if (st.stage == 0) us else st.anchorUs
          st = PatternState(st.stage + 1, anchor, us, done = false)
          if (st.stage == stages.length) {
            st = st.copy(done = true)
            if (us <= anchor + withinUs)
              hit = PatternHit(userId, fromMicros(anchor), fromMicros(us),
                Math.floorDiv(us - anchor, 1000000L))
          }
        }
        i += 1
      }
      // Only persist state for keys that ANCHORED (advanced past stage
      // 0) or already had state — otherwise every key ever seen grows
      // the store forever under NoTimeout, violating the scaladoc's
      // "state COUNT ∝ anchored keys" (mirrors patternOutcomes' guard).
      if (st.stage > 0 || st.done || state.exists) state.update(st)
      if (hit == null) Iterator.empty else Iterator.single(hit)
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }

  final case class PatternOutcome(user_id: Long, t_start: java.sql.Timestamp,
                                  stage_reached: Int, matched: Boolean)

  /** The timeout half of CEP — [[matchPattern]] plus ABANDONMENT: one
    * [[PatternOutcome]] per anchored key, `matched = true` emitted at the
    * completing event, `matched = false` with the furthest stage reached
    * when the deadline expires uncompleted. Stage advances are
    * window-scoped (an event past `anchor + withinMs` never advances),
    * so `stage_reached` is "how far within the window" — the funnel-drop
    * profile. On matched keys this is exactly [[matchPattern]]'s hit set
    * (the greedy chain's times are minimal, so a within-window chain is
    * found identically by both).
    *
    * Streaming: abandonment fires via EVENT-TIME TIMEOUT at
    * `anchor + withinMs` — the input gets `withWatermark(ts,
    * watermarkDelay)` and the state parks as a tombstone after emission
    * (never removed on timeout: a removal would let a later event
    * re-anchor and double-emit). Batch: timeouts never fire; the group
    * is complete, so the outcome is finalized at end of group — same
    * output, single pass.
    */
  def patternOutcomes(
      events: Dataset[TypedEvent],
      pattern: Seq[String],
      withinMs: Long,
      watermarkDelay: String = "0 seconds"
  ): Dataset[PatternOutcome] = {
    require(pattern.nonEmpty, "pattern must have at least one stage")
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val stages = pattern.toArray
    val withinUs = withinMs * 1000L

    import TimeUs.{fromMicros, toMicros}
    def outcome(userId: Long, st: PatternState): PatternOutcome =
      PatternOutcome(userId, fromMicros(st.anchorUs), st.stage,
        matched = st.stage == stages.length)

    def fold(userId: Long, it: Iterator[TypedEvent],
             state: GroupState[PatternState]): Iterator[PatternOutcome] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.update(st.copy(done = true)) // tombstone, not removal
        return if (st.done) Iterator.empty else Iterator.single(outcome(userId, st))
      }
      var st = state.getOption.getOrElse(PatternState(0, 0L, Long.MinValue, done = false))
      var emitted: PatternOutcome = null
      if (!st.done) {
        val sorted = it.toArray.sortBy(e => toMicros(e.ts))
        var i = 0
        while (i < sorted.length && !st.done) {
          val e = sorted(i)
          val us = toMicros(e.ts)
          val withinWindow = st.stage == 0 || us <= st.anchorUs + withinUs
          if (withinWindow && e.event_type == stages(st.stage) && us > st.prevUs) {
            val anchor = if (st.stage == 0) us else st.anchorUs
            st = PatternState(st.stage + 1, anchor, us, done = false)
            if (st.stage == stages.length) {
              st = st.copy(done = true)
              emitted = outcome(userId, st)
            }
          }
          i += 1
        }
        if (st.stage > 0) {
          if (!streaming && !st.done) {
            // batch: the group is complete — finalize the abandonment now
            emitted = outcome(userId, st)
            st = st.copy(done = true)
          }
          state.update(st)
          if (streaming && !st.done)
            state.setTimeoutTimestamp(math.max(
              Math.floorDiv(st.anchorUs + withinUs, 1000L) + 1,
              state.getCurrentWatermarkMs() + 1))
        } else if (state.exists) state.update(st)
      }
      if (emitted == null) Iterator.empty else Iterator.single(emitted)
    }

    val withWm =
      if (streaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        if (streaming) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout())(fold)
  }
}
