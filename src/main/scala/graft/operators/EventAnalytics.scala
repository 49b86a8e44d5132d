package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over an event stream — the batch faces
  * of the reference's user-behavior DWS layer (UV, bounce, visit stats:
  * `VisitorStatsApp`/`UserJumpDetailApp`) generalized to the two queries
  * every product-analytics stack ships: ordered-step funnels and cohort
  * retention. Both are compositions of keyed aggregations (SURVEY §7.3:
  * no custom plan where groupBy/join expresses the semantics).
  */
object EventAnalytics {

  /** WINDOWED FUNNEL: for each user, the earliest completion of the
    * ordered step sequence, greedy from the user's FIRST step-1 event:
    * t1 = min time of steps(0); t(i+1) = min time of a steps(i+1) event
    * with t(i) <= time <= t1 + window. Greedy-anchored semantics (the
    * window opens at the first step-1 occurrence and never re-anchors)
    * — the cheap, deterministic contract most funnel engines default to;
    * a re-anchoring variant would need per-user sequence state
    * (`flatMapGroupsWithState`, cf. streaming/StateOps bounce machine).
    *
    * Output: one row per user that performed step 1, with nullable
    * `t1..tk` timestamps and `depth` = number of steps completed.
    *
    * Plan shape: k hash-aggregates and k-1 joins, ALL keyed on the user
    * column — after the first shuffle every stage reuses the same
    * hash partitioning, and each stage's left side only shrinks (users
    * surviving i steps). At 100 TB: k passes over the (filtered) event
    * scan, no window functions, no per-user sort, state bounded by
    * users-at-depth-i. Skew = one hyperactive user's events hash to one
    * task at the filter-agg stage only (min() partial-aggregates
    * map-side, so even that is safe). */
  def funnel(events: DataFrame, userCol: String, timeCol: String,
             typeCol: String, steps: Seq[String],
             window: Column): DataFrame = {
    require(steps.size >= 2, "funnel: need at least two steps")
    val u = col(userCol)
    // stage 1: every user's first step-1 event anchors their window
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(timeCol)).as("t1"))
    // stage i+1: earliest qualifying next-step event per surviving user
    val stages = steps.tail.zipWithIndex.scanLeft(s1) {
      case (prev, (step, i)) =>
        val prevT = s"t${i + 1}"
        val curT  = s"t${i + 2}"
        events.filter(col(typeCol) === step)
          .join(prev.select(u, col(prevT), col("t1").as("__anchor")), userCol)
          .filter(col(timeCol) >= col(prevT) &&
            col(timeCol) <= col("__anchor") + window)
          .groupBy(u).agg(min(col(timeCol)).as(curT), first(col("__anchor")).as("t1"))
          .select(u, col("t1"), col(curT))
    }
    // assemble the per-user row: left-join each deeper stage onto stage 1
    val full = stages.tail.zipWithIndex.foldLeft(stages.head) {
      case (acc, (st, i)) =>
        acc.join(st.select(u, col(s"t${i + 2}")), Seq(userCol), "left_outer")
    }
    val depth = steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    full.withColumn("depth", depth.cast("long"))
  }

  /** Funnel step counts: (step index, step name, users reaching it) —
    * the conversion chart. A single aggregate over `funnel`'s per-user
    * output; counts are non-increasing by construction. */
  def funnelCounts(events: DataFrame, userCol: String, timeCol: String,
                   typeCol: String, steps: Seq[String],
                   window: Column): DataFrame = {
    val f = funnel(events, userCol, timeCol, typeCol, steps, window)
    val counts = steps.indices.map(i => count(col(s"t${i + 1}")).as(s"__c${i + 1}"))
    val aggd = f.agg(counts.head, counts.tail: _*)
    aggd.select(explode(array(steps.zipWithIndex.map { case (name, i) =>
        struct(lit(i + 1).cast("long").as("step"), lit(name).as("step_name"),
          col(s"__c${i + 1}").as("users"))
      }: _*)).as("x"))
      .select(col("x.step"), col("x.step_name").as("step_name"),
        col("x.users").as("users"))
  }

  /** COHORT RETENTION: users bucketed by the day of their first event
    * (the cohort), counted per whole-day offset at which they returned —
    * the day-N retention triangle. `cohort_day × day_offset → distinct
    * users`; offset 0 row = cohort size.
    *
    * Plan shape: one agg keyed by user (first-seen), one join back on
    * user (the cohort table is user-cardinality — broadcast when small,
    * hash-join otherwise; Spark/AQE decides), one agg keyed by
    * (cohort, offset) whose cardinality is days² — tiny. Distinct-user
    * count is exact via the set path at gate scale; at 100 TB swap for
    * approx_count_distinct exactly as the DWS stats queries document. */
  def retentionCohorts(events: DataFrame, userCol: String,
                       timeCol: String): DataFrame = {
    val u = col(userCol)
    val firstSeen = events.groupBy(u)
      .agg(date_trunc("day", min(col(timeCol))).as("cohort_day"))
    events.select(u, date_trunc("day", col(timeCol)).as("day"))
      .join(firstSeen, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(u).as("users"))
  }
}
