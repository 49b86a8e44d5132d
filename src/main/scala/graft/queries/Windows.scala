package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.util.Det._

/** Window machinery beyond the reference's tumbling-only surface
  * (SURVEY.md §2.6 W6: "no sliding/session windows, no rank/row_number —
  * add later for the LLM-pipeline extensions"). Session and sliding
  * windows are first-class in Structured Streaming too (session_window /
  * window with slide), so these double as the streaming shapes.
  */
object Windows {

  /** The ONE exact integer-cents rendering every cents-based window
    * gate shares — w19–w22's cross-engine bit-exactness hangs on this
    * expression staying identical everywhere it appears (w18 works in
    * exact decimal sums instead; FrameBench reuses this helper). */
  private[graft] def valueCents: org.apache.spark.sql.Column =
    (col("value").cast("decimal(18,2)") * 100).cast("long")

  /** Session windows: 30-minute-gap sessionization per user —
    * `session_window` is one hash-aggregate keyed (user, merged window);
    * the batch oracle is the classic gaps-and-islands rendering. */
  def w6SessionWindow(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    ordered(
      e.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("pv_ct"), decSum(col("value")).as("val_sum"))
        .select(
          stamp(col("session_window.start")).as("stt"),
          stamp(col("session_window.end")).as("edt"),
          col("user_id"), col("pv_ct"), col("val_sum")),
      "user_id", "stt")
  }

  /** Sliding (hopping) windows: 20s length, 10s slide — every event lands
    * in exactly two windows. */
  def w7SlidingWindow(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    ordered(
      e.groupBy(window(col("ts"), "20 seconds", "10 seconds"), col("event_type"))
        .agg(count(lit(1)).as("ct"))
        .select(stamp(col("window.start")).as("stt"), stamp(col("window.end")).as("edt"),
          col("event_type"), col("ct")),
      "stt", "event_type")
  }

  /** Frame-spec window functions: top-3 orders by price per nation
    * (rank/row_number surface the reference lacks).
    *
    * NOT a row_number window: partitioning by ~25 nations would sort the
    * whole orders table into 25 reducer tasks at any scale. The bounded
    * TopKAgg aggregate carries at most 3 pairs per nation per partial
    * buffer through the shuffle (map-side combine), then posexplode
    * assigns ranks — same output, no full sort (WindowsSpec proves
    * equality with the window form and the absence of a Window node). */
  def w8TopN(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TopKAgg.topK
    val o = orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = customer(s, d).select("c_custkey", "c_nationkey")
    val n = nation(s, d).select("n_nationkey", "n_name")
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    ordered(
      joined.groupBy(col("n_name"))
        .agg(topK(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("n_name"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("n_name"), (col("pos") + 1).cast("long").as("rank"),
          col("t.id").as("o_orderkey"), col("t.value").as("o_totalprice")),
      "n_name", "rank")
  }

  /** W9: frame-spec running analytics per user — cumulative count/sum
    * and the previous event's value (lag). One shuffle on user_id, one
    * within-partition sort; parallelism = |users|, each task a user's
    * short history (at 100 TB the partition key is the natural entity
    * key, so tasks stay entity-sized). Order pinned by (ts, event_id)
    * so window frames are deterministic under timestamp ties. */
  def w9Running(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val frame = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    ordered(
      events(s, d).select(
        col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        count(lit(1)).over(frame).as("run_ct"),
        sum(col("value").cast("decimal(18,2)")).over(frame).cast("double").as("run_sum"),
        lag(col("value"), 1).over(w).as("prev_value")),
      "event_id")
  }

  /** W10: per-user daily resample with gap rows + forward fill
    * (`operators.TimeSeries.gapFillFfill`) — every user gets one row
    * per day of their own active span; empty days carry ct=0 and the
    * last seen daily sum. */
  def w10GapFill(s: SparkSession, d: String): DataFrame = {
    val filled = graft.operators.TimeSeries.gapFillFfill(
      events(s, d), "user_id", "ts", step = "day",
      aggs = Seq("ct" -> count(lit(1)), "val_sum" -> decSum(col("value"))),
      fill = Seq("val_sum"))
    ordered(
      filled.select(col("user_id"), stamp(col("bucket")).as("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"), col("val_sum"),
        col("val_sum_filled")),
      "user_id", "bucket")
  }

  /** W11: OHLC downsampling bars (`operators.TimeSeries.ohlcBars`) —
    * per (event_type, hour) open/high/low/close of `value` with
    * (ts, event_id) picking first/last deterministically. ONE hash
    * aggregate — the struct-min/max open/close render as plain
    * aggregates with map-side partials, where a `first_value` window
    * would sort every bucket. */
  def w11Ohlc(s: SparkSession, d: String): DataFrame = {
    ordered(
      graft.operators.TimeSeries.ohlcBars(
        events(s, d), "event_type", "ts", "event_id", "value", "hour")
        .select(col("event_type"), stamp(col("bucket")).as("bucket"),
          col("open"), col("high"), col("low"), col("close"), col("ct")),
      "event_type", "bucket")
  }

  /** W11-stream: the SAME OHLC bars through the ACTUAL streaming engine
    * — events as a file-source stream, watermarked tumbling-window
    * aggregation (`streaming.OhlcStream.ohlcBars`), AvailableNow
    * trigger, append-mode parquet sink, read back against the identical
    * DuckDB oracle as w11_ohlc. Append mode only emits bars the
    * watermark has SEALED, so a sentinel tick 3 hours past the corpus
    * max rides in a second source file: it pushes the final watermark
    * past every real bar's end (its own bar stays unsealed and is never
    * emitted — and is filtered by type on read-back regardless).
    * Complements j1_interval_stream: that gate proves the streaming
    * JOIN face, this one the streaming windowed-AGGREGATION face. */
  def w11OhlcStream(s: SparkSession, d: String): DataFrame = {
    val st = eventsFileStream(s, d)
    val bars = graft.streaming.OhlcStream.ohlcBars(
      st, "event_type", "ts", "event_id", "value", "1 hour")
    ordered(
      runToSink(s, bars)
        .filter(col("event_type") =!= "__sentinel")
        .select(col("event_type"), stamp(col("bucket")).as("bucket"),
          col("open"), col("high"), col("low"), col("close"), col("ct")),
      "event_type", "bucket")
  }

  /** W6-stream: the SAME 30-minute-gap sessionization through the
    * ACTUAL streaming engine — `session_window` over the events file
    * stream, append-mode sink, sentinel-sealed (the sentinel tick's far
    * future timestamp closes every real session's gap), read back
    * against the identical gaps-and-islands oracle as w6. With
    * w11_ohlc_stream (tumbling) and j1_interval_stream (join) this
    * gates the three streaming engine faces a dashboard pipeline runs:
    * fixed windows, merged session windows, stream-stream joins. */
  def w6SessionStream(s: SparkSession, d: String): DataFrame = {
    val st = eventsFileStream(s, d)
    val sessions = st
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("pv_ct"), decSum(col("value")).as("val_sum"))
      .select(
        col("session_window.start").as("stt_raw"),
        col("session_window.end").as("edt_raw"),
        col("user_id"), col("pv_ct"), col("val_sum"))
    ordered(
      runToSink(s, sessions)
        .filter(col("user_id") =!= -1L)
        .select(stamp(col("stt_raw")).as("stt"), stamp(col("edt_raw")).as("edt"),
          col("user_id"), col("pv_ct"), col("val_sum")),
      "user_id", "stt")
  }

  /** Sentinel-stream fixtures + bounded sink runner shared across all
    * real-engine streaming gates — see `StreamGate`. */
  private def eventsFileStream(s: SparkSession, d: String): DataFrame =
    StreamGate.eventsFileStream(s, d)

  private def runToSink(s: SparkSession, df: DataFrame): DataFrame =
    StreamGate.runToSink(s, df)

  /** W16: capped sessionization — 30-minute-gap sessions additionally
    * SPLIT at a maximum duration (the bot-session guard every
    * dashboard needs; `session_window` can only express the gap).
    * Semantics: gap islands first (strictly >30 min of silence breaks),
    * then fixed duration blocks measured from each island's start (a
    * sub-session boundary does NOT re-anchor — block k = events in
    * [start + k·cap, start + (k+1)·cap)), all in exact integer micros.
    * The cap is 30 min here — the fixture's session-length scale, so
    * the splitting branch is exercised by real data (8 islands split
    * at sf0.01); production would run the same plan at 4 h.
    * ONE user-key shuffle carries the lag, the running island sum, the
    * island-min window and the final aggregate; parallelism = |users|. */
  def w16CappedSessions(s: SparkSession, d: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val e = events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("brk", (col("prev_us").isNull ||
        col("us") - col("prev_us") > 1800L * 1000000L).cast("long"))
      .withColumn("island", sum(col("brk")).over(run))
      .withColumn("sub",
        expr("(us - min(us) OVER (PARTITION BY user_id, island)) div 1800000000"))
    ordered(
      e.groupBy(col("user_id"), col("island"), col("sub"))
        .agg(count(lit(1)).as("pv_ct"), decSum(col("value")).as("val_sum"),
          min(col("ts")).as("stt_raw"), max(col("ts")).as("edt_raw"))
        .select(col("user_id"), col("island"), col("sub"),
          stamp(col("stt_raw")).as("stt"), stamp(col("edt_raw")).as("edt"),
          col("pv_ct"), col("val_sum")),
      "user_id", "island", "sub")
  }

  /** W12: period-over-period growth — daily revenue per event_type in
    * integer cents with previous-day value and truncating integer-ppm
    * delta (both engines truncate toward zero, spec'd by the oracle
    * match). The dashboard "DoD %" query: ONE bounded aggregate
    * (types × days), then lag + delta over that tiny result — the raw
    * table is never windowed. */
  def w12PeriodDelta(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    ordered(
      daily.withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .withColumn("delta_ppm",
          expr("(cents - prev_cents) * 1000000L div prev_cents"))
        .select(col("event_type"), stamp(col("day")).as("day"),
          col("cents"), col("prev_cents"), col("delta_ppm")),
      "event_type", "day")
  }

  /** W13: event-TIME rolling aggregate — each order's trailing-7-day
    * revenue for its customer via a RANGE frame over epoch seconds
    * (rows frames count rows; dashboards want wall-clock trailing
    * windows, and a range frame is tie-safe by construction: every
    * same-timestamp order sees the identical frame, so no tie column
    * is needed). Integer cents keep the sums hash-exact. Per-customer
    * partitioning — the standard keyed window sort, nothing global. */
  def w13RollingRange(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("sec"))
      .rangeBetween(-6L * 86400, 0)
    ordered(
      orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          unix_seconds(col("o_orderdate")).as("sec"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG)").as("cents"))
        .select(col("o_orderkey"), col("o_custkey"), col("sec"),
          sum(col("cents")).over(w).as("roll_cents"),
          count(lit(1)).over(w).as("roll_ct")),
      "o_orderkey")
  }

  /** W14: hourly TWAP of the event value stream per type — each
    * observation weighted by how long it was "current"
    * (`operators/TimeSeries.twap`). */
  def w14Twap(s: SparkSession, d: String): DataFrame = {
    ordered(
      graft.operators.TimeSeries.twap(
        events(s, d), "event_type", "ts", "event_id", "value", "hour")
        .select(col("event_type"), stamp(col("bucket")).as("bucket"),
          col("twap"), col("ct")),
      "event_type", "bucket")
  }

  /** W15: daily VWAP of lineitem prices, volume = quantity — the
    * volume-weighted face of the same aggregate. */
  def w15Vwap(s: SparkSession, d: String): DataFrame = {
    ordered(
      graft.operators.TimeSeries.vwap(
        lineitem(s, d), "l_returnflag", "l_shipdate", "l_extendedprice",
        "l_quantity", "day")
        .select(col("l_returnflag"), stamp(col("bucket")).as("bucket"),
          col("vwap"), col("volume"), col("ct")),
      "l_returnflag", "bucket")
  }

  /** W17: time-decayed engagement score per event type — exponential
    * half-life weighting (1-day half-life, 30-half-life horizon) via
    * `operators/TimeSeries.decayedScoreFixedPoint`. The weights are
    * dyadic and the age is integer, so the "exponential" is hash-exact
    * in both engines — no pow(), no float accumulation. Gate-level
    * rendering is the FIXED-POINT variant (score·2³⁰ as int64): a
    * decimal(38,30) is value-exact but its arrow/duckdb renderings
    * hash differently; an int64 has one representation everywhere. */
  def w17DecayScore(s: SparkSession, d: String): DataFrame = {
    ordered(
      graft.operators.TimeSeries.decayedScoreFixedPoint(
        events(s, d), "event_type", "ts"),
      "event_type")
  }

  /** W18: rolling z-score anomaly detection — per event type, each
    * value against the mean/std of its trailing 20-row frame; |z|>2.5
    * flags. The moment sums are EXACT decimals riding one per-type
    * sort (rowsBetween frame on the (ts, event_id) order); the
    * variance is assembled in DOUBLE from those exact sums with the
    * identical operand order on both engines — (n·ssq − s·s)/(n·(n−1))
    * — so mean/std/z hash bit-exactly despite the sqrt. Rows without a
    * full frame (n<20) are warm-up, not scored: an under-filled frame
    * would flag the stream's first minutes as anomalies every restart. */
  def w18ZscoreAnomaly(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-19, 0)
    val dv = col("value").cast("decimal(18,2)")
    val f = events(s, d)
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
      .withColumn("__s", sum(dv).over(w))
      .withColumn("__ssq", sum((dv * dv).cast("decimal(18,4)")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") === 20)
    val sd = col("__s").cast("double")
    val ssqd = col("__ssq").cast("double")
    val mean = sd / col("__n")
    val std = sqrt((col("__n") * ssqd - sd * sd) /
      (col("__n") * (col("__n") - 1)))
    // a zero-variance frame has no anomaly by definition (every value
    // IS the mean) — and the guard must be explicit on both engines:
    // ANSI Spark throws on the /0, DuckDB would emit ±inf and flag it
    ordered(
      f.select(col("event_id"), col("event_type"), col("value"),
          mean.as("mean"), std.as("std"))
        .filter(col("std") > 0)
        .withColumn("z", (col("value") - col("mean")) / col("std"))
        .filter(abs(col("z")) > 2.5),
      "event_id")
  }

  /** W19: trailing exact rolling median — the robust companion to W18's
    * rolling z-score: per event type, each row's value against the
    * MEDIAN of its trailing 21-row frame (odd frame size, so the median
    * is the 11th order statistic — an ELEMENT of the frame, never an
    * interpolation, hence bit-exact in integer cents with no float
    * arithmetic at all). Rendering: collect the frame into an array
    * column, array_sort, take the middle — the per-row state is the
    * frame itself (21 longs), bounded by the frame width, and the whole
    * thing rides ONE per-type sort exchange; a running two-heap or
    * order-statistic-tree UDAF is the constant-factor swap when frames
    * grow to thousands, not a different plan. Warm-up rows without a
    * full frame are excluded (same contract as W18). */
  def w19RollingMedian(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, 0)
    ordered(
      events(s, d)
        .select(col("event_id"), col("event_type"), col("ts"),
          valueCents
            .as("cents"))
        // NULL contract made explicit on both engines: Spark's
        // collect_list silently DROPS nulls (shrinking frames) while
        // DuckDB's list() keeps them and sorts them first (shifting the
        // 11th element) — a null value is simply not a framed sample
        .filter(col("cents").isNotNull)
        .withColumn("__frame", collect_list(col("cents")).over(w))
        .filter(size(col("__frame")) === 21)
        .select(col("event_id"), col("event_type"), col("cents"),
          element_at(array_sort(col("__frame")), 11).as("med_cents"))
        .withColumn("dev_cents", col("cents") - col("med_cents")),
      "event_id")
  }

  /** W20: exponentially-weighted moving average (α = 1/2), integer-
    * exact: the trailing smoother every monitoring/trending surface
    * runs next to W18's z-score. The recursion s_t = α·x_t + (1−α)·
    * s_{t−1} unrolls to a dot product of trailing lags with dyadic
    * weights, so the scaled value Σ_{a=0..30} cents(t−a)·2^(30−a) is
    * an exact int64 while |cents| stays below 2⁶³/2³¹ ≈ 4.3·10⁹
    * (values ≤ ~$43M each; ANSI-off Spark would wrap silently past
    * that while DuckDB errors — the bound is the operator's
    * documented domain, rescale to coarser units beyond it) — same
    * weight-table trick as W17, same horizon argument: beyond 31 taps
    * a contribution is < 2⁻³⁰ of fresh, below any trend's resolution.
    * Rendered as 31 lag() taps riding ONE per-type (ts, id) sort —
    * each tap is O(1) per row, no frame materialization at all (vs
    * w19's collect_list), and the identical lag algebra runs on both
    * engines, so the gate hash-matches bit-exactly. Warm-up rows
    * (fewer than 31 predecessors) are excluded — the same contract as
    * w18/w19, and what keeps the weight mass constant per row. */
  def w20Ewma(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val cents = valueCents
    val taps = (0 to 30).map(a =>
      lag(col("cents"), a).over(w) * lit(1L << (30 - a)))
    ordered(
      events(s, d)
        .select(col("event_id"), col("event_type"), col("ts"),
          cents.as("cents"))
        .filter(col("cents").isNotNull)
        .withColumn("ewma_2p31", taps.reduce(_ + _))
        .filter(col("ewma_2p31").isNotNull) // any missing tap = warm-up
        .select(col("event_id"), col("event_type"), col("cents"),
          col("ewma_2p31")),
      "event_id")
  }

  /** W21: integer CUSUM drift detection — the classic changepoint
    * screen (Page 1954): per event type, the upper CUSUM
    * max(0, c_{t−1} + x_t − target) unrolls to S_t − min_{0≤i≤t} S_i
    * over the prefix sums S of (cents − target) — the min INCLUDES
    * the empty prefix S_0 = 0 — so the recursion
    * becomes two stacked window functions (running sum, then running
    * min of it) riding ONE per-type sort — no state machine, no
    * mapPartitions, and every quantity is an exact int64 (target =
    * per-type integer mean, sum div cnt). Alarm when the accumulated
    * drift exceeds 10 target-units — a sustained shift fires, noise
    * resets at the running minimum. */
  def w21Cusum(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val e = events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"),
        valueCents.as("cents"))
      .filter(col("cents").isNotNull)
    val target = e.groupBy(col("event_type"))
      .agg(expr("sum(cents) div count(1)").as("__target"))
    ordered(
      e.join(broadcast(target), "event_type")
        .withColumn("__s", sum(col("cents") - col("__target")).over(w))
        // the unroll is S_t − min_{0 ≤ i ≤ t} S_i and the prefix-sum
        // sequence STARTS at S_0 = 0 — dropping the zero term
        // understates the statistic whenever drift is positive from
        // the first sample (row 1's CUSUM is its own deviation, not 0)
        .withColumn("__smin", least(lit(0L), min(col("__s")).over(w)))
        .select(col("event_id"), col("event_type"), col("cents"),
          (col("__s") - col("__smin")).as("cusum_cents"),
          ((col("__s") - col("__smin")) > col("__target") * 10).as("alarm")),
      "event_id")
  }

  /** W22: seasonal baseline + deviation — the hour-of-day profile
    * (the simplest seasonal decomposition every ops dashboard runs):
    * per (event_type, hour) integer-mean baseline from ONE bounded
    * aggregate (≤ |types|·24 rows, broadcast back), each event scored
    * as cents − baseline. The profile is the "expected at this hour"
    * curve; deviations feed W18/W21 style detectors with seasonality
    * removed. Map-side hour extraction, one tiny join, exact int64. */
  def w22Seasonal(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("event_id"), col("event_type"), hour(col("ts")).as("hr"),
        valueCents.as("cents"))
      .filter(col("cents").isNotNull)
    val prof = e.groupBy(col("event_type"), col("hr"))
      .agg(expr("sum(cents) div count(1)").as("baseline_cents"),
        count(lit(1)).as("hr_ct"))
    ordered(
      e.join(broadcast(prof), Seq("event_type", "hr"))
        .select(col("event_id"), col("event_type"), col("hr"), col("cents"),
          col("baseline_cents"),
          (col("cents") - col("baseline_cents")).as("dev_cents")),
      "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w22_seasonal"        -> (w22Seasonal _),
    "w21_cusum"           -> (w21Cusum _),
    "w20_ewma"            -> (w20Ewma _),
    "w19_rolling_median"  -> (w19RollingMedian _),
    "w18_zscore"          -> (w18ZscoreAnomaly _),
    "w17_decay_score"     -> (w17DecayScore _),
    "w16_capped_sessions" -> (w16CappedSessions _),
    "w14_twap"          -> (w14Twap _),
    "w15_vwap"          -> (w15Vwap _),
    "w13_rolling_range" -> (w13RollingRange _),
    "w12_period_delta"  -> (w12PeriodDelta _),
    "w11_ohlc"          -> (w11Ohlc _),
    "w11_ohlc_stream"   -> (w11OhlcStream _),
    "w10_gapfill"       -> (w10GapFill _),
    "w6_session_window" -> (w6SessionWindow _),
    "w6_session_stream" -> (w6SessionStream _),
    "w7_sliding_window" -> (w7SlidingWindow _),
    "w8_topn"           -> (w8TopN _),
    "w9_running"        -> (w9Running _))

  val oracle: Map[String, String] = Map(
    "w22_seasonal" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(hour(ts) AS INT) AS hr,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |p AS (SELECT event_type, hr,
        |    CAST(SUM(cents) AS BIGINT) // COUNT(*) AS baseline_cents,
        |    COUNT(*) AS hr_ct
        |  FROM e GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.hr, e.cents,
        |  p.baseline_cents, e.cents - p.baseline_cents AS dev_cents
        |FROM e JOIN p USING (event_type, hr)
        |ORDER BY event_id""".stripMargin,
    "w21_cusum" ->
      """WITH e AS (SELECT event_id, event_type, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |t AS (SELECT event_type,
        |    CAST(SUM(cents) AS BIGINT) // COUNT(*) AS target
        |  FROM e GROUP BY 1),
        |f AS (SELECT e.event_id, e.event_type, e.ts, e.cents, t.target,
        |    CAST(SUM(e.cents - t.target) OVER (PARTITION BY e.event_type
        |      ORDER BY e.ts, e.event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS s
        |  FROM e JOIN t USING (event_type)),
        |g AS (SELECT *, least(0, MIN(s) OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) AS smin
        |  FROM f)
        |SELECT event_id, event_type, cents, s - smin AS cusum_cents,
        |  (s - smin) > target * 10 AS alarm
        |FROM g ORDER BY event_id""".stripMargin,
    "w20_ewma" -> {
      // the identical 31-tap dyadic lag algebra the Spark plan embeds
      val taps = (0 to 30)
        .map(a => s"lag(cents, $a) OVER w * ${1L << (30 - a)}")
        .mkString(" + ")
      s"""WITH e AS (SELECT event_id, event_type, ts,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events WHERE value IS NOT NULL),
         |f AS (SELECT event_id, event_type, cents,
         |    $taps AS ewma_2p31
         |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
         |SELECT event_id, event_type, cents, ewma_2p31
         |FROM f WHERE ewma_2p31 IS NOT NULL ORDER BY event_id""".stripMargin
    },
    "w19_rolling_median" ->
      """WITH e AS (SELECT event_id, event_type, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  WHERE value IS NOT NULL),
        |f AS (SELECT event_id, event_type, cents,
        |    list(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW) AS frame
        |  FROM e)
        |SELECT event_id, event_type, cents,
        |  list_sort(frame)[11] AS med_cents,
        |  cents - list_sort(frame)[11] AS dev_cents
        |FROM f WHERE len(frame) = 21 ORDER BY event_id""".stripMargin,
    "w18_zscore" ->
      """WITH f AS (
        |  SELECT event_id, event_type, value,
        |    SUM(CAST(value AS DECIMAL(18,2))) OVER w AS s,
        |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
        |        AS DECIMAL(18,4))) OVER w AS ssq,
        |    COUNT(*) OVER w AS n
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |z AS (
        |  SELECT event_id, event_type, value,
        |    CAST(s AS DOUBLE) / n AS mean,
        |    sqrt((n * CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |         / (n * (n - 1))) AS std
        |  FROM f WHERE n = 20)
        |SELECT event_id, event_type, value, mean, std,
        |       (value - mean) / std AS z
        |FROM z WHERE std > 0 AND abs((value - mean) / std) > 2.5
        |ORDER BY event_id""".stripMargin,
    "w17_decay_score" -> {
      // the identical fixed-point constants the Spark plan embeds:
      // weight(d) = 2^(30-d), an exact int64 — one representation on
      // every engine, unlike a decimal(38,30) sum
      val values = (0 to 30)
        .map(d => s"($d, CAST(${1L << (30 - d)} AS BIGINT))")
        .mkString(", ")
      s"""WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
         |a AS (SELECT max(us) AS anchor FROM e),
         |w(d, wt) AS (VALUES $values),
         |g AS (SELECT event_type, (anchor - us) // 86400000000 AS age
         |      FROM e CROSS JOIN a)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(w.wt) AS BIGINT) AS n_live,
         |  CAST(SUM(w.wt) AS BIGINT) AS score_2p30
         |FROM g LEFT JOIN w ON w.d = g.age
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "w16_capped_sessions" ->
      """WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us
        |  FROM events),
        |f AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |i AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM f),
        |s AS (SELECT *, (us - min(us) OVER (PARTITION BY user_id, island))
        |      // 1800000000 AS sub
        |  FROM i)
        |SELECT user_id, island, sub,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stt,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS edt,
        |  COUNT(*) AS pv_ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "w14_twap" ->
      """WITH b AS (SELECT event_type, ts, event_id, value,
        |  date_trunc('hour', ts) AS bucket FROM events),
        |d AS (SELECT *, coalesce(
        |    lead(epoch_us(ts)) OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts, event_id),
        |    epoch_us(bucket + INTERVAL 1 HOUR)) - epoch_us(ts) AS dur
        |  FROM b)
        |SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * dur) AS DOUBLE)
        |    / CAST(SUM(dur) AS DOUBLE) AS twap,
        |  COUNT(*) AS ct
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "w15_vwap" ->
      """SELECT l_returnflag,
        |  strftime(date_trunc('day', l_shipdate), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS vwap,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS volume,
        |  COUNT(*) AS ct
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "w13_rolling_range" ->
      """SELECT o_orderkey, o_custkey,
        |  epoch_ms(o_orderdate) // 1000 AS sec,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w
        |    AS BIGINT) AS roll_cents,
        |  COUNT(*) OVER w AS roll_ct
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate) // 1000
        |  RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "w12_period_delta" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, strftime(day, '%Y-%m-%d %H:%M:%S') AS day, cents,
        |  lag(cents) OVER w AS prev_cents,
        |  (cents - lag(cents) OVER w) * 1000000 // lag(cents) OVER w AS delta_ppm
        |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |ORDER BY event_type, day""".stripMargin,
    "w11_ohlc" ->
      """SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  (min(struct_pack(t := ts, i := event_id, v := value))).v AS open,
        |  max(value) AS high, min(value) AS low,
        |  (max(struct_pack(t := ts, i := event_id, v := value))).v AS close,
        |  COUNT(*) AS ct
        |FROM events GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, bucket""".stripMargin,
    "w11_ohlc_stream" ->
      """SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  (min(struct_pack(t := ts, i := event_id, v := value))).v AS open,
        |  max(value) AS high, min(value) AS low,
        |  (max(struct_pack(t := ts, i := event_id, v := value))).v AS close,
        |  COUNT(*) AS ct
        |FROM events GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, bucket""".stripMargin,
    "w10_gapfill" ->
      """WITH b AS (SELECT user_id, date_trunc('day', ts) AS bucket, count(*) AS ct,
        |             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |           FROM events GROUP BY 1, 2),
        |sp AS (SELECT user_id, unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 DAY)) AS bucket
        |       FROM b GROUP BY 1),
        |j AS (SELECT sp.user_id, sp.bucket, b.ct, b.val_sum
        |      FROM sp LEFT JOIN b ON sp.user_id = b.user_id AND sp.bucket = b.bucket)
        |SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  coalesce(ct, 0) AS ct, val_sum,
        |  last_value(val_sum IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS val_sum_filled
        |FROM j ORDER BY user_id, bucket""".stripMargin,
    "w9_running" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |  COUNT(*) OVER w AS run_ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_sum,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |ORDER BY event_id""".stripMargin,
    "w6_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stt,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
        |  user_id, COUNT(*) AS pv_ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, stt""".stripMargin,
    "w6_session_stream" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stt,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
        |  user_id, COUNT(*) AS pv_ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, stt""".stripMargin,
    "w7_sliding_window" ->
      """WITH x AS (
        |  SELECT event_type,
        |    unnest([epoch_us(ts)//10000000*10000000,
        |            epoch_us(ts)//10000000*10000000 - 10000000]) AS ws
        |  FROM events)
        |SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS stt,
        |  strftime(make_timestamp(ws + 20000000), '%Y-%m-%d %H:%M:%S') AS edt,
        |  event_type, COUNT(*) AS ct
        |FROM x GROUP BY 1, 2, 3
        |ORDER BY stt, event_type""".stripMargin,
    "w8_topn" ->
      """SELECT n_name, CAST(row_number() OVER w AS BIGINT) AS rank,
        |  o_orderkey, o_totalprice
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WINDOW w AS (PARTITION BY n_name ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY rank <= 3
        |ORDER BY n_name, rank""".stripMargin)
}
