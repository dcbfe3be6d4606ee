package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
