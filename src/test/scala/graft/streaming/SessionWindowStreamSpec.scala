package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** W6's streaming face: `session_window` is a first-class streaming
  * aggregation — the same 30-minute-gap sessionization the batch gate
  * proves must emit identical merged sessions when the events arrive as
  * a stream with a watermark.
  */
class SessionWindowStreamSpec extends SparkSpec {

  test("streaming session_window emits the batch gate's sessions (sf0.001)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("ts"), col("value"))
    // feed in event-time order in 3 chunks; watermark 0s finalizes each
    // session once the stream advances past its gap
    val rows = ev.as[(Long, java.sql.Timestamp, Double)].collect().sortBy(_._2.getTime)
    val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = mem.toDS().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("pv_ct"), graft.util.Det.decSum(col("value")).as("val_sum"))
      .select(col("session_window.start").as("stt"), col("session_window.end").as("edt"),
        col("user_id"), col("pv_ct"), col("val_sum"))
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => mem.addData(c.toSeq: _*); q.processAllAvailable() }
      // push the watermark far past the last session so every session closes
      mem.addData((999999L, new java.sql.Timestamp(rows.last._2.getTime + 86400000L), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .filter(col("user_id") =!= 999999L)
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      val batch = ev
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("pv_ct"), graft.util.Det.decSum(col("value")).as("val_sum"))
        .select(col("session_window.start"), col("session_window.end"),
          col("user_id"), col("pv_ct"), col("val_sum"))
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream/batch session mismatch: ${streamed.size} vs ${batch.size} " +
          s"(onlyStream=${streamed.diff(batch).take(3)} onlyBatch=${batch.diff(streamed).take(3)})")
    } finally q.stop()
  }
}
