package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of `operators.EventAnalytics.pathTransitions` — the
  * page-flow transition stream as a `flatMapGroupsWithState` machine:
  * one `Transition(prev → next)` row per event, `_start` for each
  * user's first event, folded per user in event-time order.
  *
  * State is ONE last-event record per user — O(1), the smallest state
  * any cross-event operator can carry. With `sessionGapMs` set, the
  * event-time timeout deletes state once the watermark passes
  * lastTs + gap; the user's next event then transitions from `_start`
  * again — the timeout IS the session reset, so bounded state and
  * session-scoped semantics are the same switch (state bounded by
  * users active within one gap, not by history). Without a gap the
  * chain never resets (exact batch-operator parity for in-horizon,
  * in-order data — spec-asserted) and state is one record per
  * ever-seen user — the documented cost of global-chain semantics.
  *
  * Downstream, the matrix is `transitions.groupBy(prev, next).count()`
  * — an update-mode streaming aggregate with |types|² state.
  */
object PathStream {

  case class PathEvent(userId: Long, ts: Long, tie: Long, eventType: String)
  case class PathState(lastTs: Long, lastTie: Long, lastType: String)
  case class Transition(userId: Long, prevType: String, nextType: String, ts: Long)

  /** Pure per-key fold shared with the specs: advances the last-event
    * state over a (ts, tie)-sorted slice, emitting one transition per
    * event; a gap larger than sessionGapMs (when set) resets to
    * `_start` even mid-batch. */
  def pathStep(startState: String, sessionGapMs: Option[Long])
              (userId: Long, carried: Option[PathState],
               sorted: Seq[PathEvent]): (Option[PathState], Seq[Transition]) = {
    var state = carried
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    sorted.foreach { e =>
      val prev = state match {
        case Some(s) if sessionGapMs.forall(g => e.ts - s.lastTs <= g) => s.lastType
        case _ => startState
      }
      out += Transition(userId, prev, e.eventType, e.ts)
      state = Some(PathState(e.ts, e.tie, e.eventType))
    }
    (state, out.toSeq)
  }

  /** Streaming (or batch — same code path) transition stream in append
    * mode. */
  def transitions(events: Dataset[PathEvent],
                  sessionGapMs: Option[Long] = None,
                  startState: String = "_start",
                  watermarkDelay: String = "0 seconds"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val withTime =
      if (streaming)
        events.withColumn("event_time", timestamp_millis(col("ts")))
          .withWatermark("event_time", watermarkDelay).as[PathEvent]
      else events
    val step = pathStep(startState, sessionGapMs) _
    withTime.groupByKey(_.userId).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, rows: Iterator[PathEvent], state: GroupState[PathState]) => {
        if (state.hasTimedOut) {
          // watermark passed lastTs + gap: the session is over; the
          // user's next event starts a fresh chain
          state.remove()
          Iterator.empty
        } else {
          val sorted = rows.toSeq.sortBy(e => (e.ts, e.tie))
          val (next, out) = step(userId, state.getOption, sorted)
          next.foreach { s =>
            if (streaming) {
              state.update(s)
              sessionGapMs.foreach { g =>
                val wm = try state.getCurrentWatermarkMs() catch { case _: Throwable => 0L }
                state.setTimeoutTimestamp(math.max(s.lastTs + g, wm + 1))
              }
            }
          }
          out.iterator
        }
      })
  }
}
