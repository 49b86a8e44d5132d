package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.FunnelStream._

/** Streaming funnel: cross-batch state carry-over, window cut, ordered
  * steps, and agreement with the batch operator over the same events.
  */
class FunnelStreamSpec extends SparkSpec {

  private val steps = Seq("view", "click", "purchase")

  test("funnel progress across micro-batches: state carries, window cuts, order enforced") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = funnelProgress(mem.toDS(), steps, windowMs = 1000_000L).writeStream
      .format("memory").queryName("funout").outputMode(OutputMode.Append).start()
    try {
      // batch 1: u1 views; u2 clicks (no view yet — must not count)
      mem.addData(FunnelEvent(1L, 100_000L, "view"), FunnelEvent(2L, 100_000L, "click"))
      q.processAllAvailable()
      // batch 2: u1 clicks (state from batch 1 must anchor);
      //          u2 views then purchases (purchase skips click: ignored)
      mem.addData(FunnelEvent(1L, 200_000L, "click"),
        FunnelEvent(2L, 200_000L, "view"), FunnelEvent(2L, 300_000L, "purchase"))
      q.processAllAvailable()
      // batch 3: u1 purchases but OUTSIDE t1+window -> ignored;
      //          u2 clicks inside the window -> step 2
      mem.addData(FunnelEvent(1L, 1_200_000L, "purchase"),
        FunnelEvent(2L, 400_000L, "click"))
      q.processAllAvailable()
      val got = spark.table("funout").as[FunnelProgress].collect()
        .map(p => (p.userId, p.step, p.ts)).toSet
      assert(got == Set((1L, 1, 100_000L), (1L, 2, 200_000L),
        (2L, 1, 200_000L), (2L, 2, 400_000L)), s"unexpected progress: $got")
    } finally q.stop()
  }

  test("streaming max step per user equals batch funnel depth on real events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // window wider than the fixture's span: no state expiry fires, so the
    // greedy anchor is identical in both renderings. (With a narrower
    // window the stream RE-ANCHORS a user whose expired state saw step 1
    // again — the documented two-tier divergence, exercised above by the
    // hand case's window cut.)
    val windowMs = 90L * 24 * 3600 * 1000
    val ev = graft.Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id").as("userId"),
        (unix_micros(col("ts")) / 1000L).cast("long").as("ts"),
        col("event_type").as("eventType"))
      .as[FunnelEvent].collect().sortBy(_.ts)
    // split event-time-ordered stream into three micro-batches
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    val mem = MemoryStream[FunnelEvent]
    val q = funnelProgress(mem.toDS(), steps, windowMs).writeStream
      .format("memory").queryName("funpar").outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => mem.addData(c.toSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("funpar").as[FunnelProgress].collect()
        .groupBy(_.userId).view.mapValues(_.map(_.step).max).toMap
      val batch = graft.operators.EventAnalytics.funnel(
          graft.Tables.events(spark, sf("sf0.001")), "user_id", "ts", "event_type",
          steps, expr("INTERVAL 90 DAYS"))
        .select(col("user_id"), col("depth")).collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(streamed.nonEmpty && streamed == batch,
        s"stream/batch divergence: ${streamed.toSeq.sorted.take(5)} vs ${batch.toSeq.sorted.take(5)}")
    } finally q.stop()
  }

  test("same-timestamp events fold in FUNNEL-STEP order, matching batch inclusivity") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // all three steps share one timestamp: the batch operator accepts
    // t3 = t2 = t1 (time >= t(i) is inclusive). A lexicographic (ts,
    // eventType) tie-break would fold 'click' < 'purchase' < 'view' and
    // drop everything past step 1; the step-index tie-break must not.
    val mem = MemoryStream[FunnelEvent]
    val q = funnelProgress(mem.toDS(), steps, windowMs = 1000_000L).writeStream
      .format("memory").queryName("funties").outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        FunnelEvent(1L, 100_000L, "purchase"), FunnelEvent(1L, 100_000L, "click"),
        FunnelEvent(1L, 100_000L, "view"),
        // u2: equal-ts later step BEFORE its anchor exists -> only view counts
        FunnelEvent(2L, 100_000L, "click"), FunnelEvent(2L, 200_000L, "view"))
      q.processAllAvailable()
      val got = spark.table("funties").as[FunnelProgress].collect()
        .map(p => (p.userId, p.step, p.ts)).toSet
      assert(got == Set((1L, 1, 100_000L), (1L, 2, 100_000L), (1L, 3, 100_000L),
        (2L, 1, 200_000L)), s"tie-break divergence: $got")
      // parity with the batch operator on the identical events
      val batch = graft.operators.EventAnalytics.funnel(
          Seq((1L, 100L, "purchase"), (1L, 100L, "click"), (1L, 100L, "view"),
            (2L, 100L, "click"), (2L, 200L, "view"))
            .toDF("user_id", "sec", "event_type")
            .withColumn("ts", timestamp_seconds(col("sec"))),
          "user_id", "ts", "event_type", steps, expr("INTERVAL 1000 SECONDS"))
        .select(col("user_id"), col("depth")).as[(Long, Long)].collect().toMap
      val streamedDepth = got.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(batch == streamedDepth.map { case (u, d) => u -> d.toLong },
        s"stream/batch divergence at equal ts: $streamedDepth vs $batch")
    } finally q.stop()
  }

  test("funnelStep property: emitted steps are contiguous, ordered, inside the window") {
    val step = funnelStep(steps, 1000L) _
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val evs = (1 to rnd.nextInt(12)).map(_ =>
        FunnelEvent(1L, rnd.nextInt(3000).toLong, steps(rnd.nextInt(3))))
        .sortBy(_.ts)
      val (times, out) = step(1L, Nil, evs)
      assert(times.size == out.size && out.map(_.step) == (1 to times.size))
      if (times.nonEmpty) {
        assert(times == times.sorted, s"steps must be time-ordered: $times")
        assert(times.last <= times.head + 1000L, s"window violated: $times")
        // t1 really is the first step-1 event
        assert(times.head == evs.filter(_.eventType == steps.head).map(_.ts).min)
      }
    }
  }
}
