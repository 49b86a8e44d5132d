package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** E6's streaming face: LAST-touch attribution on live streams, by
  * composition — a conversion credited to the most recent source touch
  * IS an as-of join of conversions against touches, so this rides
  * `AsofStream.asofJoinStream`'s watermark-sealed state machine (late
  * in-horizon touches still win; per-key state is the in-horizon
  * traffic plus ONE sealed current touch) and then applies the
  * lookback staleness rule map-side: a touch older than `lookbackMs`
  * nulls out and the conversion stays "direct", exactly like batch.
  *
  * Boundary semantics, documented: at EQUAL timestamps the as-of
  * machinery is tie-blind about which side "came first" — a same-ts
  * touch is attributable regardless of its tie relative to the
  * conversion's, while the batch operator's rows-frame only sees
  * touches sorting strictly before the conversion. Both are
  * deterministic; they differ only for a same-timestamp touch whose
  * tie sorts AFTER the conversion's (sub-second log collisions where
  * the "touch" was recorded after the purchase — arguably not a touch
  * at all). The parity spec pins stream==batch everywhere else.
  *
  * First-touch needs earliest-in-window state (a different machine);
  * it stays batch-only (`EventAnalytics.attribution`). */
object AttributionStream {

  case class Conversion(user: Long, ms: Long, id: Long)
  case class Touch(user: Long, ms: Long, tie: Long, typ: String)
  case class Attributed(user: Long, ms: Long, id: Long,
                        srcType: Option[String], srcMs: Option[Long])

  def lastTouch(conversions: Dataset[Conversion], touches: Dataset[Touch],
                lookbackMs: Long,
                watermarkDelay: String = "0 seconds"): Dataset[Attributed] = {
    implicit val enc: Encoder[Attributed] = Encoders.product[Attributed]
    AsofStream.asofJoinStream(conversions, touches,
        (c: Conversion) => (c.user, c.ms), (t: Touch) => (t.user, t.ms),
        watermarkDelay, (t: Touch) => t.tie)
      .map { j =>
        val fresh = j.right.filter(_.ms >= j.ts - lookbackMs)
        Attributed(j.key, j.ts, j.left.id, fresh.map(_.typ), fresh.map(_.ms))
      }
  }
}
