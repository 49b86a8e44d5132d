package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** W11's streaming face must emit the identical bars the batch operator
  * computes — including open/close picked by the (time, tie) order even
  * when same-timestamp ticks arrive in different micro-batches.
  */
class OhlcStreamSpec extends SparkSpec {

  test("streaming OHLC bars equal the batch operator on sf0.001 events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
    val rows = ev.as[(String, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(r => (r._2.getTime, r._3))
    val mem = MemoryStream[(String, java.sql.Timestamp, Long, Double)]
    val agg = OhlcStream.ohlcBars(
      mem.toDS().toDF("event_type", "ts", "event_id", "value"),
      "event_type", "ts", "event_id", "value", "1 hour")
    val q = agg.writeStream.format("memory").queryName("ohlc")
      .outputMode(OutputMode.Append).start()
    try {
      // 3 in-order chunks, then a sentinel far past the end to seal all
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { c =>
        mem.addData(c.toSeq: _*); q.processAllAvailable()
      }
      mem.addData(("__seal", new java.sql.Timestamp(
        rows.last._2.getTime + 86400000L), 0L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ohlc").filter(col("event_type") =!= "__seal")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      val batch = graft.operators.TimeSeries.ohlcBars(
          ev, "event_type", "ts", "event_id", "value", "hour")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream/batch OHLC mismatch: ${streamed.size} vs ${batch.size} " +
          s"(onlyStream=${streamed.diff(batch).take(3)} onlyBatch=${batch.diff(streamed).take(3)})")
    } finally q.stop()
  }

  test("same-timestamp ticks split across micro-batches keep tie-ordered open/close") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val mem = MemoryStream[(String, java.sql.Timestamp, Long, Double)]
    val agg = OhlcStream.ohlcBars(
      mem.toDS().toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v", "1 hour")
    val q = agg.writeStream.format("memory").queryName("ohlc_tie")
      .outputMode(OutputMode.Append).start()
    try {
      // tie 2 arrives FIRST; tie 1 (the true open at the same ts) later
      mem.addData(("a", t0, 2L, 50.0)); q.processAllAvailable()
      mem.addData(("a", t0, 1L, 10.0), ("a", t0, 3L, 99.0)); q.processAllAvailable()
      mem.addData(("z", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 0L, 0.0))
      q.processAllAvailable()
      val got = spark.table("ohlc_tie").filter(col("k") === "a")
        .select("open", "high", "low", "close", "ct")
        .as[(Double, Double, Double, Double, Long)].collect().toSeq
      assert(got == Seq((10.0, 99.0, 10.0, 99.0, 3L)), s"got $got")
    } finally q.stop()
  }
}
