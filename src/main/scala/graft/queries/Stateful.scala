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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_is_new"   -> (st1IsNew _),
    "st2_uv_dedup" -> (st2UvDedup _),
    "st3_bounce"   -> (st3Bounce _))

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
