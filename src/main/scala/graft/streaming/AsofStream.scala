package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of `operators.Joins.asofJoin` — the late-data-correct
  * "what was in effect at this moment" join (J7's streaming analog, the
  * way `FunnelStream` is E1's): for each left row attach the single most
  * recent right row with the same key and `right.ts <= left.ts`
  * (inclusive), where BOTH sides arrive incrementally and either may be
  * late within the watermark.
  *
  * Correctness contract: a left row at event-time t can only be sealed
  * once the watermark passes t — until then a right row with ts <= t may
  * still arrive and change the answer. So lefts buffer in state and emit
  * exactly when `watermark >= ts`, which makes the output equal to the
  * batch operator on all in-horizon data (spec-asserted), not merely
  * "best effort at arrival order". Ties: at `right.ts == left.ts` the
  * right row is included (same inclusivity as batch); among right rows
  * sharing a timestamp the largest `tieBreak` wins (batch's
  * `tieBreak` ascending-last-wins).
  *
  * Scale/state story: per key the state holds (a) lefts newer than the
  * watermark — bounded by the in-horizon traffic, exactly like any
  * watermarked stateful op — and (b) right rows newer than the watermark
  * PLUS a single sealed "current version" row; everything older is
  * pruned every trigger. An event-time timeout re-fires the group when
  * the watermark advances past a buffered left even if no new rows
  * arrive, so emission never needs a nudge from traffic. Keys that go
  * quiet keep one right row (the version a future left would need) —
  * the same retention any streaming dim store carries.
  *
  * Batch runs the identical code path (no watermark ⇒ everything seals
  * immediately), so the correctness gate can prove this operator with
  * the same DuckDB ASOF oracle as J7.
  */
object AsofStream {

  /** `side` 1 = left, 0 = right (right sorts first at equal ts). */
  case class Tagged[L, R](key: Long, ts: Long, side: Int,
                          l: Option[L], r: Option[R])
  /** rights kept sorted by (ts, tie); pending = unsealed lefts. */
  case class AsofState[L, R](pending: Seq[(Long, L)],
                             rights: Seq[(Long, Long, R)])
  case class AsofJoined[L, R](key: Long, ts: Long, left: L, right: Option[R])

  /** As-of join two typed streams (or batch Datasets — same code path).
    * `leftKeyTs` / `rightKeyTs` extract (join key, event-time millis);
    * `tieBreak` orders right rows sharing a timestamp (largest wins). */
  def asofJoinStream[L <: Product : TypeTag, R <: Product : TypeTag](
      left: Dataset[L], right: Dataset[R],
      leftKeyTs: L => (Long, Long), rightKeyTs: R => (Long, Long),
      watermarkDelay: String = "0 seconds",
      tieBreak: R => Long = (_: R) => 0L): Dataset[AsofJoined[L, R]] = {
    implicit val tagEnc: Encoder[Tagged[L, R]] = Encoders.product[Tagged[L, R]]
    implicit val stEnc: Encoder[AsofState[L, R]] = Encoders.product[AsofState[L, R]]
    implicit val outEnc: Encoder[AsofJoined[L, R]] = Encoders.product[AsofJoined[L, R]]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    val lt = left.map { l =>
      val (k, t) = leftKeyTs(l); Tagged[L, R](k, t, 1, Some(l), None)
    }
    val rt = right.map { r =>
      val (k, t) = rightKeyTs(r); Tagged[L, R](k, t, 0, None, Some(r))
    }
    val uni = lt.unionByName(rt)
    val streaming = uni.isStreaming
    val withTime =
      if (streaming)
        uni.withColumn("event_time", timestamp_millis(col("ts")))
          .withWatermark("event_time", watermarkDelay).as[Tagged[L, R]]
      else uni

    withTime.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (key: Long, rows: Iterator[Tagged[L, R]], state: GroupState[AsofState[L, R]]) => {
        val st = state.getOption.getOrElse(AsofState[L, R](Nil, Nil))
        val fresh = if (state.hasTimedOut) Seq.empty else rows.toSeq
        val lefts = st.pending ++
          fresh.filter(_.side == 1).map(t => (t.ts, t.l.get))
        // stable sort: state rights are already ordered, new ones merge in
        val rights = (st.rights ++
          fresh.filter(_.side == 0).map(t => (t.ts, tieBreak(t.r.get), t.r.get)))
          .sortBy(x => (x._1, x._2))
        val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue

        // seal lefts the watermark has passed; two-pointer over the
        // sorted rights keeps this linear per trigger
        val (ready, still) = lefts.partition(_._1 <= wm)
        var i = 0
        var cur: Option[R] = None
        val out = ready.sortBy(_._1).map { case (ts, l) =>
          while (i < rights.length && rights(i)._1 <= ts) {
            cur = Some(rights(i)._3); i += 1
          }
          AsofJoined(key, ts, l, cur)
        }

        if (streaming) {
          // prune: one sealed "current version" + everything in-horizon
          val (old, inHorizon) = rights.partition(_._1 <= wm)
          val kept = old.lastOption.toSeq ++ inHorizon
          if (still.nonEmpty || kept.nonEmpty) {
            state.update(AsofState(still, kept))
            // re-fire on watermark advance while lefts wait to seal
            if (still.nonEmpty) state.setTimeoutTimestamp(wm + 1)
          } else state.remove()
        }
        out.iterator
      })
  }
}
