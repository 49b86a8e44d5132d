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

  test("ohlcBars: open/close picked by (time, tie), high/low exact, one agg no window") {
    import spark.implicits._
    val df = Seq(
      // key "x", hour 10: open decided by tie at equal first ts (id 1 < id 2)
      ("x", "2024-01-01 10:00:00", 1L, 5.0),
      ("x", "2024-01-01 10:00:00", 2L, 9.0),
      ("x", "2024-01-01 10:30:00", 3L, 2.0),  // low
      ("x", "2024-01-01 10:59:00", 4L, 7.0),  // close
      // key "x", hour 11: single row — all four prices equal
      ("x", "2024-01-01 11:05:00", 5L, 3.0)
    ).map { case (k, t, i, v) => (k, java.sql.Timestamp.valueOf(t), i, v) }
      .toDF("k", "ts", "id", "v")
    val got = TimeSeries.ohlcBars(df, "k", "ts", "id", "v", "hour")
      .select(date_format(col("bucket"), "HH").as("h"),
        col("open"), col("high"), col("low"), col("close"), col("ct"))
      .collect().map(r => (r.getString(0),
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got("10") == ((5.0, 9.0, 2.0, 7.0, 4L)), s"hour 10: ${got("10")}")
    assert(got("11") == ((3.0, 3.0, 3.0, 3.0, 1L)), s"hour 11: ${got("11")}")
    // plan: a hash aggregate, not a sorting window
    val plan = TimeSeries.ohlcBars(df, "k", "ts", "id", "v", "hour")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"OHLC must not need a Window:\n$plan")
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

  test("twap: duration-weighted (chatty periods don't bias), tail holds to bucket edge, zero-dur ticks vanish") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ticks = Seq(
      // value 10 holds 00:00→00:54 (54 min), value 100 holds 00:54→01:00
      // (6 min): twap = (10*54 + 100*6)/60 = 19.0 — a plain avg says 55
      ("a", ts("2024-01-01 10:00:00"), 1L, 10.0),
      ("a", ts("2024-01-01 10:54:00"), 2L, 100.0),
      // same-microsecond supersession: tie 3 lasts 0us, contributes nothing
      ("b", ts("2024-01-01 10:00:00"), 3L, 999.0),
      ("b", ts("2024-01-01 10:00:00"), 4L, 50.0))
      .toDF("k", "t", "tie", "v")
    val got = TimeSeries.twap(ticks, "k", "t", "tie", "v", "hour")
      .select("k", "twap", "ct").as[(String, Double, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((19.0, 2L)), s"a: ${got("a")}")
    assert(got("b") == ((50.0, 2L)), s"zero-duration tick must vanish: ${got("b")}")
  }
}
