package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {

  test("gapFillFfill inserts missing buckets and forward-fills only the named columns") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 09:00:00"), 7.0), // Jan 2 is a gap
      (2L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 1.0)  // single-day key
    ).toDF("k", "ts", "v")
    val out = TimeSeries.gapFillFfill(df, "k", "ts", "day",
      aggs = Seq("ct" -> count(lit(1)), "vs" -> sum(col("v"))),
      fill = Seq("vs"))
      .select(col("k"), date_format(col("bucket"), "MM-dd").as("b"),
        col("ct"), col("vs"), col("vs_filled"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)), r.getDouble(4))).toList.sortBy(t => (t._1, t._2))
    assert(out == List(
      (1L, "01-01", Some(1L), Some(5.0), 5.0),
      (1L, "01-02", None, None, 5.0), // gap row: ct/vs null, fill carries 5.0
      (1L, "01-03", Some(1L), Some(7.0), 7.0),
      (2L, "01-05", Some(1L), Some(1.0), 1.0)), s"got $out")
  }

  test("on real events every user's span is dense and fills never go backward") {
    val filled = TimeSeries.gapFillFfill(
      graft.Tables.events(spark, sf("sf0.001")), "user_id", "ts", "day",
      aggs = Seq("ct" -> count(lit(1))), fill = Seq("ct"))
    val perUser = filled.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        (datediff(max(col("bucket")), min(col("bucket"))) + 1).as("span"),
        sum(when(col("ct").isNull, 1).otherwise(0)).as("gaps"))
    assert(perUser.filter(col("rows") =!= col("span")).count() == 0,
      "every user must have exactly one row per day of their span")
    assert(perUser.agg(sum("gaps")).head().getLong(0) > 0,
      "fixture spans should contain at least one gap day")
    assert(filled.filter(col("ct_filled").isNull).count() == 0,
      "first bucket always has data, so the fill is never null")
  }
}
