package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.PathStream._

/** Streaming path transitions: cross-batch chain carry, session-gap
  * reset via event-time timeout, tie ordering, and full-matrix parity
  * with the batch operator over the same events.
  */
class PathStreamSpec extends SparkSpec {

  test("transitions across micro-batches: chain carries, first event is _start, ties by tie col") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[PathEvent]
    val q = transitions(mem.toDS()).writeStream
      .format("memory").queryName("pathout").outputMode(OutputMode.Append).start()
    try {
      // batch 1: u1 view; equal-ts pair for u2 ordered by tie (5 before 6)
      mem.addData(PathEvent(1L, 100L, 1L, "view"),
        PathEvent(2L, 100L, 6L, "click"), PathEvent(2L, 100L, 5L, "view"))
      q.processAllAvailable()
      // batch 2: u1 click — prev must be the view carried from batch 1
      mem.addData(PathEvent(1L, 200L, 2L, "click"))
      q.processAllAvailable()
      val got = spark.table("pathout").as[Transition].collect()
        .map(t => (t.userId, t.prevType, t.nextType)).toSet
      assert(got == Set(
        (1L, "_start", "view"), (1L, "view", "click"),
        (2L, "_start", "view"), (2L, "view", "click")), s"unexpected: $got")
    } finally q.stop()
  }

  test("session gap: intra-batch gap resets; state timeout resets across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[PathEvent]
    // gap 1000 ms, zero watermark delay
    val q = transitions(mem.toDS(), sessionGapMs = Some(1000L)).writeStream
      .format("memory").queryName("pathsess").outputMode(OutputMode.Append).start()
    try {
      // u1: two events 5s apart IN ONE BATCH -> second is a fresh _start
      mem.addData(PathEvent(1L, 1000L, 1L, "view"), PathEvent(1L, 6000L, 2L, "click"))
      q.processAllAvailable()
      // watermark is now ~6000; u1's state (lastTs 6000) times out once
      // the watermark passes 7000 — push it forward with another user
      mem.addData(PathEvent(2L, 20000L, 3L, "view"))
      q.processAllAvailable()
      // u1 returns: timeout removed the chain -> _start again
      mem.addData(PathEvent(1L, 21000L, 4L, "purchase"))
      q.processAllAvailable()
      val got = spark.table("pathsess").as[Transition].collect()
        .map(t => (t.userId, t.prevType, t.nextType)).toSet
      assert(got == Set(
        (1L, "_start", "view"), (1L, "_start", "click"),
        (2L, "_start", "view"), (1L, "_start", "purchase")), s"unexpected: $got")
    } finally q.stop()
  }

  test("streamed matrix equals the batch operator on real events, global and sessionized") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("user_id").as("userId"),
        (unix_micros(col("ts")) / 1000L).cast("long").as("ts"),
        col("event_id").as("tie"), col("event_type").as("eventType"))
      .as[PathEvent].collect().sortBy(e => (e.ts, e.tie))
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    for (gap <- Seq(None, Some(1800000L))) {
      val name = s"pathpar${gap.isDefined}"
      val mem = MemoryStream[PathEvent]
      // watermark held far behind event time so no session timeout fires
      // mid-stream with in-order chunks; intra-fold gap logic still runs
      val q = transitions(mem.toDS(), sessionGapMs = gap,
          watermarkDelay = "3650 days").writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append).start()
      try {
        chunks.foreach { c => mem.addData(c.toSeq: _*); q.processAllAvailable() }
        val streamed = spark.table(name)
          .groupBy(col("prevType"), col("nextType")).count()
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val batch = graft.operators.EventAnalytics.pathTransitions(
            graft.Tables.events(spark, sf("sf0.001")),
            "user_id", "ts", "event_type", "event_id", sessionGapMs = gap)
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        assert(streamed.nonEmpty && streamed == batch,
          s"stream/batch divergence (gap=$gap)")
      } finally q.stop()
    }
  }
}
