package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  test("funnel: greedy anchor, ordered steps, window cut, depth per user") {
    val events = ev(Seq(
      // user 1: full funnel inside the window
      (1L, 1L, "view", 100L), (2L, 1L, "click", 200L), (3L, 1L, "purchase", 300L),
      // user 2: click BEFORE first view never counts; purchase before click ignored
      (4L, 2L, "click", 50L), (5L, 2L, "view", 100L),
      (6L, 2L, "purchase", 150L), (7L, 2L, "click", 200L),
      // user 3: completes, but only outside the 1000s window anchored at t1
      (8L, 3L, "view", 0L), (9L, 3L, "click", 500L), (10L, 3L, "purchase", 1500L),
      // user 4: never does step 1 -> absent entirely
      (11L, 4L, "click", 100L), (12L, 4L, "purchase", 200L),
      // user 5: greedy anchor — SECOND view would allow completion, but the
      // window anchors at the FIRST view and the purchase misses it
      (13L, 5L, "view", 0L), (14L, 5L, "view", 900L),
      (15L, 5L, "click", 950L), (16L, 5L, "purchase", 1100L)
    ))
    val got = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), expr("INTERVAL 1000 SECONDS"))
      .select(col("user_id"), col("depth")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 5L -> 2L),
      s"unexpected depths: $got")
  }

  test("funnel preAggregate skew guard: identical result, window input bounded by distinct (type,ts)") {
    import spark.implicits._
    // bot user 99 fires 100k events over only 120 distinct (type, sec)
    // combos — the realistic bot shape (second-granularity bursts); plus
    // two organic users
    val bot = (0 until 100000).map { i =>
      (1000L + i, 99L, Seq("view", "click", "purchase")(i % 3), 100L + (i % 40) * 10L)
    }
    val organic = Seq(
      (1L, 1L, "view", 100L), (2L, 1L, "click", 200L), (3L, 1L, "purchase", 300L),
      (4L, 2L, "view", 50L))
    val events = ev(organic ++ bot)
    val steps = Seq("view", "click", "purchase")
    val base = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      steps, expr("INTERVAL 1000 SECONDS"))
    val guarded = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      steps, expr("INTERVAL 1000 SECONDS"), preAggregate = true)
    val b = base.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val g = guarded.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(g == b && g.contains(99L) && g(99L).last == 3L,
      s"guard must not change semantics: ${g.get(99L)} vs ${b.get(99L)}")
    // the bound itself: what the whole-partition Window task receives is
    // the DEDUPED set — 120 rows for the bot, not 100k
    val deduped = events.filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), col("event_type"))
      .dropDuplicates(Seq("user_id", "event_type", "ts"))
      .filter(col("user_id") === 99L).count()
    assert(deduped == 120L, s"bot window input must collapse to 120, got $deduped")
  }

  test("funnelCounts is the non-increasing conversion chart of funnel") {
    val events = graft.Tables.events(spark, sf("sf0.001"))
    val counts = EventAnalytics.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), expr("INTERVAL 24 HOURS"))
      .orderBy("step").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(counts.map(_._2).toSeq == Seq("view", "click", "purchase"))
    assert(counts.head._3 > 0, "someone must enter the funnel")
    assert(counts.sliding(2).forall { case Array(a, b) => a._3 >= b._3 },
      s"conversion must be non-increasing: ${counts.mkString(",")}")
    // cross-check against the per-user depths
    val f = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), expr("INTERVAL 24 HOURS"))
    val byDepth = f.groupBy().agg(
      count(when(col("depth") >= 1, 1)).as("d1"),
      count(when(col("depth") >= 2, 1)).as("d2"),
      count(when(col("depth") >= 3, 1)).as("d3")).head()
    assert(Seq(byDepth.getLong(0), byDepth.getLong(1), byDepth.getLong(2)) ==
      counts.map(_._3).toSeq)
  }

  test("retentionCohorts: hand case + offset-0 equals cohort size") {
    val events = ev(Seq(
      // day 0 cohort: users 1,2 — user 1 returns day 1 and day 3, user 2 day 1
      (1L, 1L, "view", 0L), (2L, 2L, "view", 3600L),
      (3L, 1L, "view", 86400L), (4L, 2L, "view", 90000L),
      (5L, 1L, "view", 3 * 86400L),
      // day 1 cohort: user 3
      (6L, 3L, "view", 86400L + 100L)
    ))
    val got = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("1970-01-01", 0L, 2L), ("1970-01-01", 1L, 2L), ("1970-01-01", 3L, 1L),
      ("1970-01-02", 0L, 1L)), s"unexpected triangle: $got")
  }

  test("pathTransitions: hand matrix, _start entries, ppm rows sum per prev, ts tie broken by id") {
    val events = ev(Seq(
      // user 1: view -> click -> click
      (1L, 1L, "view", 100L), (2L, 1L, "click", 200L), (3L, 1L, "click", 300L),
      // user 2: view -> buy
      (4L, 2L, "view", 10L), (5L, 2L, "buy", 20L),
      // user 3: equal timestamps — order must follow event_id, so
      // view(6) precedes click(7): _start->view, view->click
      (6L, 3L, "view", 50L), (7L, 3L, "click", 50L)
    ))
    val got = EventAnalytics.pathTransitions(events, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("_start", "view", 3L, 1000000L),
      ("view", "click", 2L, 666666L),
      ("view", "buy", 1L, 333333L),
      ("click", "click", 1L, 1000000L)), s"unexpected matrix: $got")
  }

  test("attribution: last vs first touch, stale lookback nulls, direct conversions, same-ts ties") {
    val events = ev(Seq(
      // user 1: view then click then purchase — last=click, first=view
      (1L, 1L, "view", 10L), (2L, 1L, "click", 50L), (3L, 1L, "purchase", 60L),
      // user 2: only touch is 190s before purchase — outside 100s lookback
      (4L, 2L, "view", 10L), (5L, 2L, "purchase", 200L),
      // user 3: direct purchase, no touches at all
      (6L, 3L, "purchase", 5L),
      // user 4: click(tie 7) and view(tie 8) at the SAME ts as purchase
      (7L, 4L, "click", 30L), (8L, 4L, "view", 30L), (9L, 4L, "purchase", 30L)))
    val got = EventAnalytics.attribution(events, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("view", "click"), 100000L)
      .collect().map(r => r.getLong(2) -> ((Option(r.getString(3)),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.getString(5)), Option(r.get(6)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got(3L) == ((Some("click"), Some(50000L), Some("view"), Some(10000L))), s"u1: ${got(3L)}")
    assert(got(5L) == ((None, None, None, None)), s"stale touch must null out: ${got(5L)}")
    assert(got(6L) == ((None, None, None, None)), s"direct: ${got(6L)}")
    // same-ts: last by (ms, tie) precedence = view (tie 8); first by
    // struct min = click (tie 7)
    assert(got(9L) == ((Some("view"), Some(30000L), Some("click"), Some(30000L))), s"u4: ${got(9L)}")
    assert(got.size == 4)
  }

  test("weightedSample: w=1 keeps all, w=0 keeps none, HT weight exact") {
    import spark.implicits._
    val docs = (1L to 200L).toDF("doc_id")
    val all = graft.llm.Sampling.weightedSample(docs, "doc_id", lit(1.0))
    assert(all.count() == 200 &&
      all.select(min(col("sample_weight")), max(col("sample_weight")))
        .as[(Double, Double)].head() == ((1.0, 1.0)))
    assert(graft.llm.Sampling.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
    val half = graft.llm.Sampling.weightedSample(docs, "doc_id", lit(0.5))
    val n = half.count()
    assert(n > 60 && n < 140, s"rate-0.5 sample wildly off: $n/200")
    assert(half.select(first(col("sample_weight"))).as[Double].head() == 2.0)
  }

  test("frequentPaths: counts crossing user journeys, excludes partial " +
       "tails, ranks count-desc with path tie-break, honors k") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    // u1: a b c b c  -> trigrams a>b>c, b>c>b, c>b>c
    // u2: a b c      -> a>b>c (again)
    // u3: a b        -> too short, contributes nothing
    val ev = (Seq(("a", 1), ("b", 2), ("c", 3), ("b", 4), ("c", 5)).map {
        case (t, i) => (1L, ts(i), i.toLong, t) } ++
      Seq(("a", 1), ("b", 2), ("c", 3)).map {
        case (t, i) => (2L, ts(i), 10L + i, t) } ++
      Seq(("a", 1), ("b", 2)).map {
        case (t, i) => (3L, ts(i), 20L + i, t) })
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.frequentPaths(ev, "user_id", "ts", "event_id",
        "event_type", n = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // a>b>c ×2 first; then the count-1 paths tie-break by string:
    // b>c>b before c>b>c — k=2 keeps only the first
    assert(got == List(("a>b>c", 2L), ("b>c>b", 1L)), s"got $got")
  }

  test("linearAttribution: equal split with remainder to the last " +
       "touch; out-of-lookback touches excluded; credit sums to 1e6 " +
       "per converted conversion") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val ev = Seq(
      // u1: 3 touches inside 1h + 1 outside, then the purchase
      (1L, ts(0L), 1L, "view"),            // outside (>1h before)
      (1L, ts(3000000L), 2L, "view"),
      (1L, ts(3100000L), 3L, "click"),
      (1L, ts(3200000L), 4L, "view"),
      (1L, ts(3600000L), 5L, "purchase"),
      // u2: purchase with no touches -> absent from the report
      (2L, ts(100L), 6L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.linearAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", 3600000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 3 in-window touches: floor(1e6/3) = 333333 each, +1 remainder to
    // the LAST touch (event 4, a view)
    assert(got == Map(
      "view" -> ((1L, 333333L + 333334L)), // events 2 and 4 (4 is last: +1)
      "click" -> ((1L, 333333L))), s"got $got")
    val total = got.values.map(_._2).sum
    assert(total == 1000000L, s"credit must sum to exactly 1e6: $total")
  }

  test("w22 seasonal: truncating-mean law — per (type, hour) the " +
       "deviations sum to the division remainder, 0 <= r < count") {
    val rows = graft.queries.Windows.w22Seasonal(spark, sf("sf0.001"))
      .collect().map(r => ((r.getString(1), r.getInt(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (key, grp) =>
      val devSum = grp.map(_._2._3).sum
      assert(devSum >= 0 && devSum < grp.size, s"$key: $devSum/${grp.size}")
      grp.foreach { case (_, (cents, base, dev)) =>
        assert(dev == cents - base)
      }
    }
  }
}
