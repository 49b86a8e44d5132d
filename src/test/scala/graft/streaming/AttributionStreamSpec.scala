package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.AttributionStream._

/** E6's streaming face: stream==batch on real events, late in-horizon
  * touches win, stale touches stay "direct".
  */
class AttributionStreamSpec extends SparkSpec {

  private def run(batches: Seq[(Seq[Conversion], Seq[Touch])],
                  lookbackMs: Long, delay: String = "10 seconds")
      : Map[Long, (Option[String], Option[Long])] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val name = s"attr${System.nanoTime()}"
    val cm = MemoryStream[Conversion]
    val tm = MemoryStream[Touch]
    val q = lastTouch(cm.toDS(), tm.toDS(), lookbackMs, delay)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { case (cs, ts) =>
        if (cs.nonEmpty) cm.addData(cs: _*)
        if (ts.nonEmpty) tm.addData(ts: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[Attributed].collect()
        .map(a => a.id -> ((a.srcType, a.srcMs))).toMap
    } finally q.stop()
  }

  test("late in-horizon touch wins; stale touch stays direct; seal needs the watermark") {
    val got = run(Seq(
      // conversion at 20s arrives first — must wait for the watermark
      (Seq(Conversion(1L, 20000L, 100L)), Seq(Touch(1L, 1000L, 1L, "stale"))),
      // LATE touch at 18s (inside horizon) + advance to 60s via user 2
      (Nil, Seq(Touch(1L, 18000L, 2L, "view"), Touch(2L, 60000L, 3L, "x"))),
      // push watermark far past everything so all conversions seal
      (Seq(Conversion(9L, 999000L, 999L)), Nil)),
      lookbackMs = 10000L)
    assert(got(100L) == ((Some("view"), Some(18000L))),
      s"late in-horizon touch must win: ${got(100L)}")
    // same shape but the only touch is older than the lookback
    val direct = run(Seq(
      (Seq(Conversion(1L, 50000L, 200L)), Seq(Touch(1L, 1000L, 1L, "old"))),
      (Seq(Conversion(9L, 999000L, 999L)), Nil)), lookbackMs = 10000L)
    assert(direct(200L) == ((None, None)), s"stale must null: ${direct(200L)}")
  }

  test("stream equals the batch operator's last-touch on sf0.001 events") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val convs = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")), col("event_id"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, ms, id) => Conversion(u, ms, id) }
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), unix_millis(col("ts")), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map { case (u, ms, tie, ty) => Touch(u, ms, tie, ty) }
    // two arrival chunks split by event time, then a far-future seal
    val cutoff = (convs.map(_.ms) ++ touches.map(_.ms)).sorted
      .apply((convs.length + touches.length) / 2)
    val got = run(Seq(
      (convs.filter(_.ms <= cutoff).toSeq, touches.filter(_.ms <= cutoff).toSeq),
      (convs.filter(_.ms > cutoff).toSeq, touches.filter(_.ms > cutoff).toSeq),
      (Seq(Conversion(999999L, convs.map(_.ms).max + 86400000L, 999999L)), Nil)),
      lookbackMs = 3600000L) - 999999L
    val batch = graft.operators.EventAnalytics.attribution(
        ev, "user_id", "ts", "event_id", "event_type",
        "purchase", Seq("view", "click"), 3600000L)
      .select(col("conv_id"), col("last_src_type"), col("last_src_ms"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got.size == batch.size && got == batch,
      s"stream/batch attribution mismatch: ${got.size} vs ${batch.size}; " +
        s"diff=${got.toSet.diff(batch.toSet).take(3)}")
  }
}
