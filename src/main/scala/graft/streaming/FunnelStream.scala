package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of `operators.EventAnalytics.funnel` — the ordered-
  * step CEP generalization of the reference's bounce machine
  * (`UserJumpDetailApp`): per-user greedy-anchored windowed funnel as a
  * `flatMapGroupsWithState` state machine, emitting a progress row the
  * moment a user reaches a new step.
  *
  * Semantics match the batch operator when events are processed in
  * event-time order: t1 = the user's first step-1 event, t(i+1) = the
  * earliest step-(i+1) event in [t(i), t1 + window]. Within a
  * micro-batch rows are ts-sorted before folding; ACROSS batches the
  * usual two-tier contract applies — events later than the watermark
  * horizon may re-anchor a user whose state already expired
  * (re-anchoring is what most production funnel engines do anyway;
  * exact batch parity holds for in-horizon data, spec-asserted).
  *
  * Scale: state is O(k) timestamps per user with a step-1 event, and an
  * event-time timeout removes it once the watermark passes t1 + window
  * (no further progress is possible by then) — state is bounded by
  * users ACTIVE inside one funnel window, not by history.
  */
object FunnelStream {

  case class FunnelEvent(userId: Long, ts: Long, eventType: String)
  /** times(i) = epoch-ms of step i+1; anchor expiry = times(0)+windowMs */
  case class FunnelState(times: Seq[Long])
  case class FunnelProgress(userId: Long, step: Int, ts: Long)

  /** Pure per-key fold shared by streaming and the property specs:
    * advances the achieved-steps state over a ts-sorted slice, emitting
    * one progress row per newly reached step. */
  def funnelStep(steps: Seq[String], windowMs: Long)
               (userId: Long, carried: Seq[Long],
                sorted: Seq[FunnelEvent]): (Seq[Long], Seq[FunnelProgress]) = {
    var times = carried
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelProgress]
    sorted.foreach { e =>
      if (times.isEmpty) {
        if (e.eventType == steps.head) {
          times = Seq(e.ts)
          out += FunnelProgress(userId, 1, e.ts)
        }
      } else if (times.size < steps.size &&
        e.eventType == steps(times.size) &&
        e.ts >= times.last && e.ts <= times.head + windowMs) {
        times = times :+ e.ts
        out += FunnelProgress(userId, times.size, e.ts)
      }
    }
    (times, out.toSeq)
  }

  /** Streaming (or batch — same code path, like bounceDetect) funnel
    * progress stream. Emits `FunnelProgress(user, step, ts)` rows in
    * append mode. */
  def funnelProgress(events: Dataset[FunnelEvent], steps: Seq[String],
                     windowMs: Long,
                     watermarkDelay: String = "0 seconds"): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.size >= 2, "funnelProgress: need at least two steps")
    val streaming = events.isStreaming
    val withTime =
      if (streaming)
        events.withColumn("event_time", timestamp_millis(col("ts")))
          .withWatermark("event_time", watermarkDelay).as[FunnelEvent]
      else events
    val step = funnelStep(steps, windowMs) _
    // Equal-timestamp tie-break must be FUNNEL-STEP order, not event-type
    // lexicographic order: the batch operator accepts t(i+1) = t(i)
    // (time >= t(i) is inclusive), so at a shared timestamp the earlier
    // step has to fold first or the later-step event is dropped while
    // state is still behind. Non-step events (never folded) sort last.
    val stepIdx = steps.zipWithIndex.toMap
    withTime.groupByKey(_.userId).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
        if (state.hasTimedOut) {
          // watermark passed t1 + window: no further step can qualify
          state.remove()
          Iterator.empty
        } else {
          val sorted = rows.toSeq.sortBy(e =>
            (e.ts, stepIdx.getOrElse(e.eventType, Int.MaxValue)))
          val (times, out) = step(userId, state.getOption.map(_.times).getOrElse(Nil), sorted)
          if (times.nonEmpty && streaming) {
            state.update(FunnelState(times))
            val wm = try state.getCurrentWatermarkMs() catch { case _: Throwable => 0L }
            state.setTimeoutTimestamp(math.max(times.head + windowMs, wm + 1))
          }
          out.iterator
        }
      })
  }
}
