package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W11's streaming face: OHLC bars as a watermarked tumbling-window
  * streaming aggregation — the tick-to-bar downsampler running on the
  * live feed with the SAME five aggregates as the batch
  * `operators.TimeSeries.ohlcBars` (open/close = lexicographic min/max
  * over struct(time, tie, value), so there is no per-bucket sort and
  * partial aggregation applies — the exact property that makes the agg
  * legal in streaming state, where only the five scalars round-trip
  * the state store per open bar).
  *
  * State is O(keys × open windows); the watermark seals bars for
  * append-mode emission. Same-timestamp ticks order by `tie`, so a
  * replayed batch and the stream agree bit-for-bit (spec-asserted).
  */
object OhlcStream {

  /** `windowDur` is a duration string ("1 hour"); the emitted `bucket`
    * is the window start — identical to the batch face's
    * `date_trunc(step, ...)` when the duration equals the trunc unit. */
  def ohlcBars(ticks: DataFrame, key: String, time: String, tie: String,
               value: String, windowDur: String,
               watermark: String = "0 seconds"): DataFrame = {
    val o = struct(col(time), col(tie), col(value).as("v"))
    ticks.withWatermark(time, watermark)
      .groupBy(window(col(time), windowDur), col(key))
      .agg(
        min(o).getField("v").as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max(o).getField("v").as("close"),
        count(lit(1)).as("ct"))
      .select(col(key), col("window.start").as("bucket"),
        col("open"), col("high"), col("low"), col("close"), col("ct"))
  }
}
