package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * Plan shape: ONE scan (pushed filter keeps only the k step types)
    * and ONE shuffle on the user column. Each stage timestamp is a
    * whole-partition window aggregate over the same user partitioning —
    * t(i+1)'s predicate references t(i), so Spark stacks k Window
    * operators on the one Exchange with no extra shuffle and no
    * per-user sort (unordered frame) — then the per-user collapse is a
    * groupBy reusing that same partitioning. A k-stage join/agg chain
    * would re-scan the event table O(k²) times (each DataFrame stage
    * recomputes its predecessors — no common-subplan reuse across a
    * join); at 100 TB the single scan wins outright. Skew guard
    * (`preAggregate`): the funnel is a pure function of each user's
    * DISTINCT (type, timestamp) set — multiplicity never moves a min() —
    * so a (user, type, time) dedup before the Window stack is exact.
    * The dedup's partial aggregation collapses a bot's burst of
    * duplicate-timestamp events MAP-SIDE, before anything shuffles, and
    * the whole-partition window task then sees at most the distinct
    * timestamp count per user instead of its raw event volume (the
    * hyperactive-key ceiling). Cost: one extra exchange keyed on
    * (user, type, time) — off by default to keep the single-shuffle
    * plan; turn it on when bot-grade keys are expected (the reference's
    * `UserJumpDetailApp` domain has them routinely). */
  def funnel(events: DataFrame, userCol: String, timeCol: String,
             typeCol: String, steps: Seq[String],
             window: Column, preAggregate: Boolean = false): DataFrame = {
    require(steps.size >= 2, "funnel: need at least two steps")
    val u = col(userCol)
    val w = Window.partitionBy(u)
    // only funnel-step events participate: the isin filter reaches the scan
    val filtered = events.filter(col(typeCol).isin(steps: _*))
      .select(u, col(timeCol), col(typeCol))
    val relevant =
      if (preAggregate) filtered.dropDuplicates(Seq(userCol, typeCol, timeCol))
      else filtered
    // t1 anchors the window at the user's FIRST step-1 event
    val withT1 = relevant.withColumn("t1",
      min(when(col(typeCol) === steps.head, col(timeCol))).over(w))
    // t(i+1) = earliest step-(i+1) event in [t(i), t1 + window]
    val filled = steps.tail.zipWithIndex.foldLeft(withT1) {
      case (d, (step, i)) =>
        d.withColumn(s"t${i + 2}",
          min(when(col(typeCol) === step &&
            col(timeCol) >= col(s"t${i + 1}") &&
            col(timeCol) <= col("t1") + window, col(timeCol))).over(w))
    }
    val ts = steps.indices.map(i => s"t${i + 1}")
    val depth = ts.map(t => when(col(t).isNotNull, 1).otherwise(0)).reduce(_ + _)
    filled.filter(col("t1").isNotNull)
      .groupBy(u).agg(min(col(ts.head)).as(ts.head),
        ts.tail.map(t => min(col(t)).as(t)): _*)
      .withColumn("depth", depth.cast("long"))
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

  /** PATH TRANSITIONS: the Markov transition matrix over each user's
    * time-ordered event sequence — "after a `view`, what happens next,
    * and how often?" — the page-flow / Sankey query behind the
    * reference's visitor-journey layer (`UserJumpDetailApp` is the
    * `prev → nothing` diagonal of exactly this matrix). Each user's
    * first event transitions from the synthetic `_start` state, so
    * entry-point distribution falls out of the same matrix.
    *
    * Output: (prev_type, next_type, ct, prob_ppm) — `prob_ppm` is the
    * row-conditional transition probability in parts-per-million as an
    * INTEGER (`ct * 1e6 div prev_total`): exact in int64, so the gate
    * hash never depends on float division or rounding mode.
    *
    * Plan shape: ONE shuffle — the per-user lag sorts (user, ts, tie)
    * within hash(user) partitions — then a hash-agg whose output is
    * bounded by |types|² regardless of input size (partials collapse
    * map-side), and a Window over that tiny aggregate for the per-prev
    * totals. The tie column makes same-timestamp ordering deterministic;
    * at 100 TB the sort is the standard lag cost and nothing else grows
    * beyond |types|².
    *
    * `sessionGapMs`: when set, a gap larger than it resets the chain —
    * the next event transitions from `_start` again, making the matrix
    * SESSION-scoped (a `view → view` pair twelve hours apart is two
    * visits, not a transition). Requires `timeCol` to be a timestamp.
    * Streaming face: `streaming.PathStream.transitions`, where the same
    * gap doubles as the state TTL. */
  def pathTransitions(events: DataFrame, userCol: String, timeCol: String,
                      typeCol: String, tieCol: String,
                      startState: String = "_start",
                      sessionGapMs: Option[Long] = None): DataFrame = {
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(timeCol), col(tieCol))
    val lagged = events
      .select(col(userCol), col(timeCol), col(tieCol), col(typeCol))
      .withColumn("__pt", lag(col(typeCol), 1).over(perUser))
      .withColumn("__pms", lag(unix_millis(col(timeCol)), 1).over(perUser))
    val prev = sessionGapMs match {
      case None => coalesce(col("__pt"), lit(startState))
      case Some(gap) => when(col("__pt").isNull ||
          unix_millis(col(timeCol)) - col("__pms") > gap, lit(startState))
        .otherwise(col("__pt"))
    }
    lagged
      .groupBy(prev.as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("ct"))
      .withColumn("prev_total", sum(col("ct")).over(Window.partitionBy(col("prev_type"))))
      .withColumn("prob_ppm", expr("ct * 1000000L div prev_total"))
      .drop("prev_total")
  }

  /** TOUCH ATTRIBUTION: for every conversion event, the source touch it
    * credits under the two standard models at once — LAST-touch (the
    * most recent source event at or before the conversion, by strict
    * (time, tie) precedence, nulled when older than `lookbackMs`:
    * "direct" conversions keep their NULL rather than stealing a stale
    * touch) and FIRST-touch (the earliest source within the lookback;
    * rendered as a RANGE frame over epoch millis, which is tie-blind by
    * construction — same-timestamp sources count regardless of tie
    * order, documented). The reference's `SEARCH`-source constants
    * (GmallConstant.java) are exactly this query's source vocabulary.
    *
    * Plan shape: one pushed `isin` filter keeps only conversions +
    * sources; both models are Window aggregates over the SAME
    * hash(user) Exchange (a rows frame and a range frame — two Window
    * operators, one shuffle); each touch travels as ONE struct so all
    * its fields come from the same source row (the asofJoin
    * struct-atomicity rule). Output is one row per conversion. At
    * 100 TB the per-user sort is the standard sessionize cost and
    * nothing else grows.
    *
    * Round-10 decision: this does NOT swap to the native
    * `plans/AsofJoinExec` (unlike j12's enrichment). The last-touch
    * face alone would fit (backward as-of + post-hoc lookback null),
    * but FIRST-touch is an earliest-within-range aggregate — not an
    * as-of shape — so a native rendering would need two passes (one
    * as-of join + one range window) plus a join-back on the
    * conversion id: two extra shuffles versus the current ONE-exchange
    * two-window plan. The single-shuffle form wins; measured plans
    * confirmed (e6_attribution 0.21 s cold at sf0.1 in isolation). */
  def attribution(events: DataFrame, userCol: String, timeCol: String,
                  tieCol: String, typeCol: String, conversionType: String,
                  sourceTypes: Seq[String], lookbackMs: Long): DataFrame = {
    require(sourceTypes.nonEmpty && !sourceTypes.contains(conversionType),
      "attribution: sources must be non-empty and exclude the conversion type")
    val kept = events
      .filter(col(typeCol).isin(conversionType +: sourceTypes: _*))
      .select(col(userCol), col(timeCol), col(tieCol), col(typeCol),
        unix_millis(col(timeCol)).as("__ms"))
    val touch = when(col(typeCol) =!= conversionType,
      struct(col("__ms").as("ms"), col(tieCol).as("tie"), col(typeCol).as("typ")))
    val wRows = Window.partitionBy(col(userCol))
      .orderBy(col("__ms"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRange = Window.partitionBy(col(userCol)).orderBy(col("__ms"))
      .rangeBetween(-lookbackMs, 0)
    val inWindow = col("__lt").getField("ms") >= col("__ms") - lookbackMs
    kept
      .withColumn("__lt", last(touch, ignoreNulls = true).over(wRows))
      .withColumn("__ft", min(touch).over(wRange))
      .filter(col(typeCol) === conversionType)
      .select(col(userCol), col(timeCol).as("conv_ts"), col(tieCol).as("conv_id"),
        when(inWindow, col("__lt").getField("typ")).as("last_src_type"),
        when(inWindow, col("__lt").getField("ms")).as("last_src_ms"),
        col("__ft").getField("typ").as("first_src_type"),
        col("__ft").getField("ms").as("first_src_ms"))
  }

  /** Frequent path mining — the top-k most common length-`n` event
    * sequences across all user journeys (the "what do people actually
    * do" discovery pass that funnels are then DEFINED from; the
    * sequence-mining face of `pathTransitions`' pair matrix). n−1
    * lead() taps on one per-user sort turn each row into its n-gram,
    * one hash aggregate counts them (|types|ⁿ-bounded output), and the
    * top-k rides a TakeOrdered — no global sort. Ties break by path
    * string, so the k-th rank is deterministic cross-engine. */
  def frequentPaths(events: DataFrame, userCol: String, timeCol: String,
                    tieCol: String, typeCol: String, n: Int = 3,
                    k: Int = 20): DataFrame = {
    require(n >= 2 && k >= 1, "frequentPaths: n >= 2, k >= 1")
    val w = Window.partitionBy(col(userCol)).orderBy(col(timeCol), col(tieCol))
    val withSteps = (1 until n).foldLeft(
      events.select(col(userCol), col(timeCol), col(tieCol), col(typeCol))) {
      (df, i) => df.withColumn(s"__s$i", lead(col(typeCol), i).over(w))
    }
    val steps = col(typeCol) +: (1 until n).map(i => col(s"__s$i"))
    withSteps
      // EVERY step must be non-null, not just the last: concat_ws
      // silently drops nulls, which would count a NULL-holed sequence
      // as a fabricated shorter path (and diverge from the oracle's
      // NULL-propagating || concatenation)
      .filter(steps.map(_.isNotNull).reduce(_ && _))
      .select(concat_ws(">", steps: _*).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("path"))
      .limit(k)
  }

  /** Linear (equal-credit) multi-touch attribution — each conversion
    * splits one unit of credit equally across ALL its in-lookback
    * touches, in exact integer ppm: every touch gets 10⁶ div n, and
    * the division remainder (10⁶ mod n) goes to the LAST touch, so
    * per-conversion credit sums to exactly 10⁶ and the whole report is
    * hash-exact. The companion to `attribution`'s last/first-touch
    * answer when spend allocation needs the full journey weighted.
    *
    * Plan: conversions join touches on the USER equi-key with the
    * lookback range as a residual condition — per-user groups bound
    * the pair fan-out (the same bounded-key contract as the funnel);
    * at hot-user scale the δ-bucketed range join (`Joins.
    * rangeOverlapJoin`) is the documented swap. One count aggregate
    * per conversion, one final per-source rollup. */
  def linearAttribution(events: DataFrame, userCol: String, timeCol: String,
                        tieCol: String, typeCol: String,
                        conversionType: String,
                        lookbackMs: Long): DataFrame = {
    val e = events.select(col(userCol).as("__u"),
      unix_millis(col(timeCol)).as("__ms"), col(tieCol).as("__tie"),
      col(typeCol).as("__typ"))
    val conv = e.filter(col("__typ") === conversionType)
      .select(col("__u"), col("__ms").as("__cms"), col("__tie").as("conv_id"))
    val touch = e.filter(col("__typ") =!= conversionType)
    val pairs = conv.join(touch,
      conv("__u") === touch("__u") &&
        col("__ms") <= col("__cms") &&
        col("__ms") > col("__cms") - lookbackMs)
      .select(col("conv_id"), col("__typ"), col("__ms"), col("__tie"))
    // per-conversion n and argmax as WINDOWS over the pair stream —
    // one pass: an aggregate + join-back would re-execute the whole
    // expensive range join (and its upstream scans) under both branches
    val w = Window.partitionBy(col("conv_id"))
    pairs
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__last", max(struct(col("__ms"), col("__tie"))).over(w))
      .withColumn("credit_ppm",
        expr("1000000L div __n") +
          when(struct(col("__ms"), col("__tie")) === col("__last"),
            expr("1000000L % __n")).otherwise(lit(0L)))
      .groupBy(col("__typ").as("src_type"))
      .agg(countDistinct(col("conv_id")).as("conversions"),
        sum(col("credit_ppm")).as("credit_ppm"))
  }
}
