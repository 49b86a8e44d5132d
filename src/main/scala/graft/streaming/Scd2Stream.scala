package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** D1's streaming face: SCD2 version history maintained from a live
  * changelog. Closed versions — a value run whose successor has
  * arrived and been SEALED by the watermark — emit downstream
  * (append-mode, exactly once per version); the OPEN current version
  * lives in state, exactly the row `sources.Sinks.dimUpsert` would
  * serve as `_LATEST`.
  *
  * Correctness contract: a change at event-time t only seals once the
  * watermark passes t (a late record between two changes could split or
  * merge runs), so events buffer in-horizon and fold in (ts, tie) order
  * when sealed — making the emitted closed versions EQUAL to the batch
  * operator's non-current rows over the same data (spec-asserted), not
  * merely arrival-order best effort. Same null-safe run-collapse
  * semantics as batch: re-emits of the current value never fork a
  * version; NULL is a value.
  *
  * State per key: the open version (one row) + in-horizon buffered
  * events — the same bound as every watermarked stateful op here; an
  * event-time timeout drains the buffer when the watermark advances
  * without fresh traffic. */
object Scd2Stream {

  case class Change(key: Long, ms: Long, tie: Long, value: Option[String])
  case class OpenVersion(value: Option[String], sinceMs: Long, version: Long)
  case class Scd2State(pending: Seq[Change], open: Option[OpenVersion])
  case class ClosedVersion(key: Long, value: Option[String],
                           validFromMs: Long, validToMs: Long, version: Long)

  def closedVersions(changes: Dataset[Change],
                     watermarkDelay: String = "0 seconds"): Dataset[ClosedVersion] = {
    implicit val chEnc: Encoder[Change] = Encoders.product[Change]
    implicit val stEnc: Encoder[Scd2State] = Encoders.product[Scd2State]
    implicit val outEnc: Encoder[ClosedVersion] = Encoders.product[ClosedVersion]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    val streaming = changes.isStreaming
    val withTime =
      if (streaming)
        changes.withColumn("event_time", timestamp_millis(col("ms")))
          .withWatermark("event_time", watermarkDelay).as[Change]
      else changes

    withTime.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (key: Long, rows: Iterator[Change], state: GroupState[Scd2State]) => {
        val st = state.getOption.getOrElse(Scd2State(Nil, None))
        val fresh = if (state.hasTimedOut) Seq.empty else rows.toSeq
        val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
        val (ready, still) = (st.pending ++ fresh).partition(_.ms <= wm)

        var open = st.open
        val out = Seq.newBuilder[ClosedVersion]
        ready.sortBy(c => (c.ms, c.tie)).foreach { c =>
          open match {
            case Some(o) if o.value == c.value => // run continues, no fork
            case Some(o) =>
              out += ClosedVersion(key, o.value, o.sinceMs, c.ms, o.version)
              open = Some(OpenVersion(c.value, c.ms, o.version + 1))
            case None =>
              open = Some(OpenVersion(c.value, c.ms, 1L))
          }
        }

        if (streaming) {
          state.update(Scd2State(still, open))
          if (still.nonEmpty) state.setTimeoutTimestamp(wm + 1)
        }
        out.result().iterator
      })
  }
}
