package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.util.Det._

/** Batch renderings of the reference's keyed-state trio (SURVEY.md §2.5
  * ST1-ST3). The per-key ValueState/CEP semantics reduce, over a bounded
  * replay, to per-key order statistics — expressed declaratively with
  * window functions so Catalyst plans one shuffle per key and keeps the
  * whole pipeline in codegen. The true record-at-a-time streaming
  * versions (flatMapGroupsWithState) live in graft.streaming.StateOps and
  * are property-tested to agree with these on the same input.
  */
object Stateful {

  /** ST1: new/returning-visitor correction (BaseLogApp.java:69-94) —
    * a visitor is "new" only on their first event; any later event claiming
    * is_new is rewritten to 0. user_id plays device-id `mid`. */
  def st1IsNew(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ordered(
      e.withColumn("rn", row_number().over(byUser))
        .select(col("event_id"), col("user_id"),
          when(col("rn") === 1, 1L).otherwise(0L).as("is_new")),
      "event_id")
  }

  /** ST2: per-day UV dedup (UniqueVisitApp.java:45-87) — keep only the
    * first visit of each (user, day); the 24h state TTL is the day
    * boundary here. */
  def st2UvDedup(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val byUserDay = Window
      .partitionBy(col("user_id"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    ordered(
      e.withColumn("rn", row_number().over(byUserDay))
        .filter(col("rn") === 1)
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("visit_date"),
          col("event_id"), stamp(col("ts")).as("visit_time")),
      "user_id", "visit_date")
  }

  /** ST3: bounce detection (UserJumpDetailApp.java:70-120, Flink CEP) —
    * emit every session entry (no prior event within 30 min) that is NOT
    * followed by another event within 10 s. Matches the CEP pattern's
    * match-and-timeout union: a second session-start within 10 s is
    * impossible here (10 s < 30 min gap), so both CEP branches collapse to
    * "next event absent or >= 10 s away". */
  def st3Bounce(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ordered(
      e.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
        .filter(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L)
        .filter(col("next_ts").isNull ||
          unix_micros(col("next_ts")) - unix_micros(col("ts")) >= 10000000L)
        .select(col("event_id"), col("user_id"), stamp(col("ts")).as("jump_time")),
      "event_id")
  }

  /** ST2-stream: the SAME per-day UV dedup through the ACTUAL streaming
    * engine — `StateOps.uvDedup` (flatMapGroupsWithState, cross-batch
    * GroupState) over the events fixture served as TWO time-range file
    * batches (splitParts=2, one file per AvailableNow trigger), so a
    * key's day-state written by micro-batch 0 must suppress that day's
    * re-visits arriving in micro-batch 1 through the real state store.
    * Read back against an oracle ordered by (epoch_ms, event_id) — the
    * machine's exact comparison basis (Visit.ts is epoch-ms). With
    * j1/w6/w11 streams this adds the fourth engine face: arbitrary
    * keyed state. */
  def st2UvDedupStream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val st = StreamGate.eventsFileStream(s, d,
      sentinels = 0, oneFilePerTrigger = true, splitParts = 2)
    val visits = st.select(
        col("user_id").cast("string").as("mid"),
        unix_millis(col("ts")).as("ts"),
        lit("1").as("isNew"),
        lit(null: String).as("lastPageId"),
        col("event_id").as("eventId"),
        lit("").as("payload")).as[graft.streaming.StateOps.Visit]
    ordered(
      StreamGate.runToSink(s, graft.streaming.StateOps.uvDedup(visits).toDF)
        .select(col("mid").cast("bigint").as("user_id"),
          date_format(timestamp_millis(col("ts")), "yyyy-MM-dd").as("visit_date"),
          col("eventId").as("event_id"),
          stamp(timestamp_millis(col("ts"))).as("visit_time")),
      "user_id", "visit_date")
  }

  /** ST3-stream: the CEP bounce machine through the ACTUAL streaming
    * engine with event-time TIMERS — `StateOps.bounceDetectDerived`
    * (session entries derived in-state, pending entries armed as
    * event-time timeouts) over the corpus as two time-range batches plus
    * TWO watermark sentinels: the first lifts the watermark past the
    * corpus, the second triggers the batch in which that lifted
    * watermark fires every still-armed timer (a timer only fires in a
    * batch AFTER the watermark passed it). Bounces therefore emerge by
    * BOTH paths — proven-by-later-event inside data batches, and
    * timer-fired in the sentinel batches — and the union must equal the
    * epoch-ms lag/lead oracle. */
  def st3BounceStream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val st = StreamGate.eventsFileStream(s, d,
      sentinels = 2, oneFilePerTrigger = true, splitParts = 2)
    val visits = st.select(
        col("user_id").cast("string").as("mid"),
        unix_millis(col("ts")).as("ts"),
        lit("1").as("isNew"),
        lit(null: String).as("lastPageId"),
        col("event_id").as("eventId"),
        lit("").as("payload")).as[graft.streaming.StateOps.Visit]
    ordered(
      StreamGate.runToSink(s, graft.streaming.StateOps.bounceDetectDerived(visits).toDF)
        .filter(col("mid") =!= "-1")
        .select(col("eventId").as("event_id"),
          col("mid").cast("bigint").as("user_id"),
          stamp(timestamp_millis(col("ts"))).as("jump_time")),
      "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_is_new"   -> (st1IsNew _),
    "st2_uv_dedup" -> (st2UvDedup _),
    "st3_bounce"   -> (st3Bounce _),
    "st2_uv_dedup_stream" -> (st2UvDedupStream _),
    "st3_bounce_stream"   -> (st3BounceStream _))

  val oracle: Map[String, String] = Map(
    "st1_is_new" ->
      """SELECT event_id, user_id,
        |  CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
        |       THEN CAST(1 AS BIGINT) ELSE 0 END AS is_new
        |FROM events ORDER BY event_id""".stripMargin,
    "st2_uv_dedup" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS visit_date, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS visit_time
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) = 1
        |ORDER BY user_id, visit_date""".stripMargin,
    // stream faces compare in epoch-ms terms — the machines' exact basis
    // (Visit.ts is epoch-ms); same rows as the batch oracles unless two
    // same-key events share a millisecond, in which case ms order is the
    // defined semantic
    "st2_uv_dedup_stream" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS visit_date, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS visit_time
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |  ORDER BY epoch_ms(ts), event_id) = 1
        |ORDER BY user_id, visit_date""".stripMargin,
    "st3_bounce_stream" ->
      """WITH w AS (
        |  SELECT event_id, user_id, ts, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts))  OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms,
        |    lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS next_ms
        |  FROM events)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS jump_time
        |FROM w
        |WHERE (prev_ms IS NULL OR ms - prev_ms > 1800000)
        |  AND (next_ms IS NULL OR next_ms - ms >= 10000)
        |ORDER BY event_id""".stripMargin,
    "st3_bounce" ->
      """WITH w AS (
        |  SELECT event_id, user_id, ts,
        |    lag(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |  FROM events)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS jump_time
        |FROM w
        |WHERE (prev_ts IS NULL OR epoch_us(ts)//1000000 - epoch_us(prev_ts)//1000000 > 1800)
        |  AND (next_ts IS NULL OR epoch_us(next_ts) - epoch_us(ts) >= 10000000)
        |ORDER BY event_id""".stripMargin)
}
