package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Det._

/** DWS streaming aggregations — the reference's four 10s-TUMBLE jobs
  * (SURVEY.md §2.4/§2.6) as watermarked windowed aggregations in Append
  * mode: late data beyond the watermark is dropped (the reference has no
  * allowedLateness either, W5) and a window emits exactly once when the
  * watermark passes its end — the Flink trigger-on-watermark behavior.
  *
  * Exact distinct counts use collect_set+size (the reference's
  * HashSet-in-reduce); Spark bans COUNT(DISTINCT) in streaming, and the
  * set is bounded by the window. At 100 TB scale swap setCount for
  * approx_count_distinct (HLL) per query.
  */
object StatsStreams {

  /** A1 ProductStats shape (ProductStatsApp.java:243-284). */
  def productStats(events: DataFrame, tsCol: String = "ts",
                   watermark: String = "2 seconds",
                   windowLen: String = "10 seconds"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("ct"),
        decSum(col("value")).as("amount"),
        setCount(col("user_id")).as("user_ct"))
      .select(stamp(col("window.start")).as("stt"), stamp(col("window.end")).as("edt"),
        col("event_type"), col("ct"), col("amount"), col("user_ct"))

  /** A2 VisitorStats shape (VisitorStatsApp.java:132-165): multi-key
    * tumble with summed 0/1 flags. */
  def visitorStats(flagged: DataFrame, keys: Seq[String], tsCol: String = "ts",
                   watermark: String = "0 seconds",
                   windowLen: String = "10 seconds"): DataFrame =
    flagged.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
      .agg(count(lit(1)).as("pv_ct"), setCount(col("user_id")).as("uv_ct"),
        sum(col("sv")).as("sv_ct"))
      .select(Seq(stamp(col("window.start")).as("stt"), stamp(col("window.end")).as("edt"))
        ++ keys.map(col) ++ Seq(col("pv_ct"), col("uv_ct"), col("sv_ct")): _*)

  /** A4 KeywordStats shape (KeywordStatsApp.java:50-59): tokenizer UDTF →
    * tumbling word count. */
  def keywordStats(docsWithTs: DataFrame, textCol: String = "text",
                   tsCol: String = "ts", watermark: String = "1 second",
                   windowLen: String = "10 seconds"): DataFrame =
    docsWithTs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(graft.llm.TextAnalysis.tokens(col(textCol))).as("keyword"))
      .groupBy(window(col(tsCol), windowLen), col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .select(stamp(col("window.start")).as("stt"), stamp(col("window.end")).as("edt"),
        col("keyword"), col("ct"))
}
