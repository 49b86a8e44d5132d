package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of `operators.EventAnalytics.retentionCohorts` — the
  * third event-analytics operator to get one (FunnelStream is E1's,
  * AsofStream is J7's): per-user cohort anchoring and day-offset
  * emission as a `flatMapGroupsWithState` machine, emitting one
  * `RetentionHit(user, cohortDay, offset)` the FIRST time a user is
  * seen at a given whole-day offset from their cohort day. Because each
  * (user, offset) is emitted exactly once, the retention triangle is a
  * plain `count(*)` over hits per (cohort_day, offset) — the downstream
  * aggregation never needs a distinct.
  *
  * Two-tier contract (same as FunnelStream): the anchor is the user's
  * first event in EVENT-TIME order within each micro-batch, so for
  * in-order/in-horizon arrival the hits aggregate to exactly the batch
  * triangle (spec-asserted); an out-of-horizon straggler older than the
  * user's anchor cannot re-anchor (append mode cannot retract emitted
  * rows) and is counted at its non-negative offset if new.
  *
  * Scale/state story: per user O(1) — the cohort day plus the set of
  * offsets already emitted, bounded by `horizonDays` (a 90-day product
  * horizon = at most 91 small ints; offsets beyond it are ignored). An
  * event-time timeout removes the state once the watermark passes
  * cohort + horizon + 1 day — no offset inside the horizon can arrive
  * after that — so state is bounded by users ACTIVE within one horizon,
  * not by history.
  */
object RetentionStream {

  case class RetEvent(userId: Long, ts: Long)
  case class RetState(cohortDayMs: Long, emitted: Seq[Int])
  case class RetentionHit(userId: Long, cohortDayMs: Long, dayOffset: Int)

  private val DayMs = 86400000L
  /** UTC day floor on epoch millis (negative-safe). */
  def dayFloor(ts: Long): Long = Math.floorDiv(ts, DayMs) * DayMs

  /** Retention hit stream (or batch — same code path; each group then
    * sees the user's full history, making the anchor the true min). */
  def retentionHits(events: Dataset[RetEvent], horizonDays: Int = 90,
                    watermarkDelay: String = "0 seconds"): Dataset[RetentionHit] = {
    import events.sparkSession.implicits._
    require(horizonDays >= 0, "retentionHits: horizonDays must be >= 0")
    val streaming = events.isStreaming
    val withTime =
      if (streaming)
        events.withColumn("event_time", timestamp_millis(col("ts")))
          .withWatermark("event_time", watermarkDelay).as[RetEvent]
      else events
    withTime.groupByKey(_.userId).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (userId: Long, rows: Iterator[RetEvent], state: GroupState[RetState]) => {
        if (state.hasTimedOut) {
          // watermark passed cohort + horizon + 1 day: no in-horizon
          // offset can still arrive
          state.remove()
          Iterator.empty
        } else {
          var st = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[RetentionHit]
          rows.toSeq.sortBy(_.ts).foreach { e =>
            val d = dayFloor(e.ts)
            st match {
              case None =>
                st = Some(RetState(d, Seq(0)))
                out += RetentionHit(userId, d, 0)
              case Some(s) =>
                val off = (d - s.cohortDayMs) / DayMs
                if (off >= 0 && off <= horizonDays && !s.emitted.contains(off.toInt)) {
                  st = Some(s.copy(emitted = s.emitted :+ off.toInt))
                  out += RetentionHit(userId, s.cohortDayMs, off.toInt)
                }
            }
          }
          if (streaming) st.foreach { s =>
            state.update(s)
            val ttl = s.cohortDayMs + (horizonDays.toLong + 1) * DayMs
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(ttl, wm + 1))
          }
          out.iterator
        }
      })
  }
}
