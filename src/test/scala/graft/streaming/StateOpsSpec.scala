package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.StateOps._

/** Drives the keyed-state trio through real streaming micro-batches
  * (MemoryStream) and checks the semantics the reference implements with
  * ValueState/CEP, including cross-batch state carry-over and event-time
  * timeouts.
  */
class StateOpsSpec extends SparkSpec {

  test("ST1 is_new: first event per mid keeps 1, later events (even in later batches) get 0") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Visit]
    val q = fixIsNew(mem.toDS()).writeStream
      .format("memory").queryName("st1out").outputMode(OutputMode.Append).start()
    try {
      mem.addData(Visit("m1", 1000L, "1", None, 1), Visit("m1", 2000L, "1", Some("home"), 2),
        Visit("m2", 1500L, "1", None, 3))
      q.processAllAvailable()
      mem.addData(Visit("m1", 9000L, "1", None, 4)) // second batch: state must persist
      q.processAllAvailable()
      val out = spark.table("st1out").as[VisitOut].collect().sortBy(_.eventId)
      assert(out.map(v => v.eventId -> v.isNew).toSeq ==
        Seq(1L -> "1", 2L -> "0", 3L -> "1", 4L -> "0"))
    } finally q.stop()
  }

  test("ST2 uv dedup: one visit per mid per day across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val day = 86400000L
    val mem = MemoryStream[Visit]
    val q = uvDedup(mem.toDS()).writeStream
      .format("memory").queryName("st2out").outputMode(OutputMode.Append).start()
    try {
      mem.addData(Visit("m1", 1000L, "1", None, 1), Visit("m1", 5000L, "1", None, 2))
      q.processAllAvailable()
      mem.addData(Visit("m1", 8000L, "1", None, 3),       // same day -> dropped
        Visit("m1", day + 1000L, "1", None, 4),           // next day -> kept
        Visit("m2", 2000L, "1", None, 5))
      q.processAllAvailable()
      val kept = spark.table("st2out").as[VisitOut].collect().map(_.eventId).sorted.toSeq
      assert(kept == Seq(1L, 4L, 5L))
    } finally q.stop()
  }

  test("ST3 bounce: timeout emits lone session start; quick second page cancels; " +
    "double session start emits first") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Visit]
    val q = bounceDetect(mem.toDS(), gapMs = 10000L).writeStream
      .format("memory").queryName("st3out").outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Visit("lone", 1000L, "1", None, 1),               // no follow-up -> bounce via timeout
        Visit("quick", 1000L, "1", None, 2), Visit("quick", 3000L, "1", Some("p"), 3), // no bounce
        Visit("double", 1000L, "1", None, 4), Visit("double", 4000L, "1", None, 5), // 4 bounces
        Visit("slow", 1000L, "1", None, 6), Visit("slow", 60000L, "1", Some("p"), 7)) // 6 bounces
      q.processAllAvailable()
      // advance the watermark far past every pending timeout
      mem.addData(Visit("wm", 10000000L, "1", Some("p"), 99))
      q.processAllAvailable()
      val bounced = spark.table("st3out").as[Bounce].collect().map(_.eventId).sorted.toSeq
      // pending of "double" (5) and "slow" (none: 7 is not a start) resolved:
      // 5 bounces via final watermark too
      assert(bounced == Seq(1L, 4L, 5L, 6L))
    } finally q.stop()
  }

  test("ST3 batch execution flushes the trailing pending (timers never fire in batch)") {
    import spark.implicits._
    val visits = Seq(
      Visit("lone", 1000L, "1", None, 1),
      Visit("busy", 1000L, "1", None, 2), Visit("busy", 3000L, "1", Some("p"), 3)).toDS()
    val out = bounceDetect(visits).collect().map(_.eventId).toSeq
    assert(out == Seq(1L), s"lone start must flush in batch; got $out")
  }

  test("ST3 streaming agrees with the declarative batch oracle on real events (sf0.001)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val events = graft.Tables.events(spark, sf("sf0.001"))
    // the adapter derives the session-entry flag exactly as the batch
    // query does (no predecessor within 30 min)
    val visits = StateOps.visitsFromEvents(spark, events)
      .collect().toSeq.sortBy(_.ts)
    val expected = graft.queries.Stateful.st3Bounce(spark, sf("sf0.001"))
      .select("event_id").as[Long].collect().toSet

    val mem = MemoryStream[Visit]
    val q = bounceDetect(mem.toDS(), gapMs = 10000L).writeStream
      .format("memory").queryName("st3parity").outputMode(OutputMode.Append).start()
    try {
      // two arbitrary micro-batches + watermark flush
      val (b1, b2) = visits.splitAt(visits.length / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(Visit("wmflush", visits.last.ts + 100000000L, "1", Some("p"), -1L))
      q.processAllAvailable()
      val got = spark.table("st3parity").as[Bounce].collect()
        .map(_.eventId).filter(_ >= 0).toSet
      assert(got == expected)
    } finally q.stop()
  }
}
