package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.RetentionStream._

/** Streaming retention: cross-batch anchor carry, per-offset exactly-once
  * emission, horizon cut, and agreement with the batch triangle.
  */
class RetentionStreamSpec extends SparkSpec {

  private val Day = 86400000L

  test("anchor carries across batches; an offset is emitted once; horizon cuts") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[RetEvent]
    val q = retentionHits(mem.toDS(), horizonDays = 7).writeStream
      .format("memory").queryName("rethits").outputMode(OutputMode.Append).start()
    try {
      // batch 1: u1 anchors day 0 (two same-day events -> ONE offset-0 hit)
      mem.addData(RetEvent(1L, 100L), RetEvent(1L, 2000L))
      q.processAllAvailable()
      // batch 2: u1 returns day 2 twice -> one hit; day 2 again later batch
      mem.addData(RetEvent(1L, 2 * Day + 5L), RetEvent(1L, 2 * Day + 9L))
      q.processAllAvailable()
      // batch 3: duplicate offset (ignored), offset 7 (in horizon, kept),
      //          offset 8 (beyond the 7-day horizon, dropped)
      mem.addData(RetEvent(1L, 2 * Day + 100L), RetEvent(1L, 7 * Day + 1L),
        RetEvent(1L, 8 * Day + 1L))
      q.processAllAvailable()
      val got = spark.table("rethits").as[RetentionHit].collect()
        .map(h => (h.userId, h.cohortDayMs, h.dayOffset)).sorted.toSeq
      assert(got == Seq((1L, 0L, 0), (1L, 0L, 2), (1L, 0L, 7)),
        s"unexpected hits: $got")
    } finally q.stop()
  }

  test("hits aggregate to the batch retention triangle on real events (sf0.001)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val typed = ev.select(col("user_id").as("userId"),
        (unix_micros(col("ts")) / 1000L).cast("long").as("ts"))
      .as[RetEvent].collect().sortBy(_.ts)
    val chunks = typed.grouped(math.max(1, typed.length / 3 + 1)).toSeq
    val mem = MemoryStream[RetEvent]
    // horizon wider than the fixture span; 0s watermark delay is fine for
    // event-time-ordered feeding
    val q = retentionHits(mem.toDS(), horizonDays = 100000).writeStream
      .format("memory").queryName("retpar").outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => mem.addData(c.toSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("retpar").as[RetentionHit].collect()
        .groupBy(h => (h.cohortDayMs, h.dayOffset.toLong))
        .view.mapValues(_.length.toLong).toMap
      val batch = graft.operators.EventAnalytics
        .retentionCohorts(ev, "user_id", "ts")
        .select(unix_millis(col("cohort_day")), col("day_offset"), col("users"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed.nonEmpty && streamed == batch,
        s"stream/batch divergence: only-stream=${(streamed.toSet -- batch.toSet).take(3)} " +
          s"only-batch=${(batch.toSet -- streamed.toSet).take(3)}")
    } finally q.stop()
  }

  test("dayFloor is negative-safe and state stays bounded by the horizon") {
    assert(dayFloor(0L) == 0L && dayFloor(Day - 1) == 0L && dayFloor(Day) == Day)
    assert(dayFloor(-1L) == -Day, "pre-epoch timestamps floor DOWN, not toward zero")
    // exactly-once per offset bounds emitted to horizon+1 entries
    val rnd = new scala.util.Random(11)
    val evs = (1 to 500).map(_ => RetEvent(1L, rnd.nextInt(10 * Day.toInt).toLong))
    import spark.implicits._
    val hits = retentionHits(evs.toDS(), horizonDays = 5).collect()
    assert(hits.length <= 6, s"horizon 5 allows offsets 0..5 only: ${hits.length}")
    assert(hits.map(_.dayOffset).distinct.length == hits.length, "no duplicate offsets")
  }
}
