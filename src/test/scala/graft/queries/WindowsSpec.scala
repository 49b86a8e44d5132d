package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowsSpec extends SparkSpec {

  test("w8 TopKAgg matches the row_number window form and plans without a Window node") {
    val d = sf("sf0.001")
    val got = Windows.w8TopN(spark, d)

    // independent window rendering of the same semantics
    val o = graft.Tables.orders(spark, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val n = graft.Tables.nation(spark, d).select("n_nationkey", "n_name")
    val joined = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("n_name"), col("rank").cast("long").as("rank"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("n_name", "rank")

    val gotRows = got.collect().toSeq
    val wantRows = want.collect().toSeq
    assert(gotRows == wantRows && gotRows.nonEmpty)

    // the whole point: no Window (= no full sort into |nations| tasks),
    // and the aggregate runs with a map-side partial (ObjectHashAggregate)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "bounded top-k must not plan a window sort")
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_top_k_agg"),
      s"expected partial ObjectHashAggregate in:\n$plan")
  }

  test("TopKAgg property: matches sort-take-k for random data, k, and partitioning") {
    import spark.implicits._
    import graft.functions.TopKAgg.topK
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.Parameters
    val rows = Gen.listOf(for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-5.0, 5.0)
      i <- Gen.chooseNum(0L, 50L)
    } yield (g, v, i))
    val prop = Prop.forAll(rows, Gen.chooseNum(1, 5), Gen.chooseNum(1, 8)) {
      (data: List[(String, Double, Long)], k: Int, parts: Int) =>
        data.isEmpty || {
          val got = data.toDF("g", "v", "i").repartition(parts)
            .groupBy($"g").agg(topK($"v", $"i", k).as("top"))
            .select($"g", posexplode($"top").as(Seq("pos", "t")))
            .select($"g", $"pos", $"t.id", $"t.value")
            .as[(String, Int, Long, Double)].collect().toSet
          // reference model: stable sort by (v desc, id asc), take k —
          // duplicate (v, id) occurrences are distinct buffer entries
          val want = data.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
            rs.map(r => (r._2, r._3)).sortBy { case (v, i) => (-v, i) }
              .take(k).zipWithIndex.map { case ((v, i), pos) => (g, pos, i, v) }
          }.toSet
          got == want
        }
    }
    val res = org.scalacheck.Test.check(
      Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("TopKAgg ranks ties by smaller id and bounds the buffer at k") {
    import spark.implicits._
    import graft.functions.TopKAgg.topK
    val df = Seq(
      ("g", 5.0, 10L), ("g", 5.0, 9L), ("g", 7.0, 99L),
      ("g", 1.0, 1L), ("g", 7.0, 100L), ("h", 2.0, 5L))
      .toDF("g", "v", "i")
    val out = df.groupBy($"g").agg(topK($"v", $"i", 3).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", $"pos", $"t.id", $"t.value")
      .as[(String, Int, Long, Double)].collect().toSet
    assert(out == Set(
      ("g", 0, 99L, 7.0), ("g", 1, 100L, 7.0), ("g", 2, 9L, 5.0),
      ("h", 0, 5L, 2.0)))
  }

  test("TopKAgg orders NaN as the greatest double, matching Spark's window sort") {
    import spark.implicits._
    import graft.functions.TopKAgg.topK
    val df = Seq(("g", 1.0, 1L), ("g", Double.NaN, 2L), ("g", 9.0, 3L))
      .toDF("g", "v", "i")
    val got = df.groupBy($"g").agg(topK($"v", $"i", 2).as("top"))
      .select(posexplode($"top").as(Seq("pos", "t")))
      .select($"pos", $"t.id").as[(Int, Long)].collect().toSet
    // Spark sorts NaN greatest: DESC puts (NaN,2) first, then (9.0,3)
    val want = df.withColumn("rank", row_number().over(
        Window.partitionBy($"g").orderBy($"v".desc, $"i")))
      .filter($"rank" <= 2).select($"rank" - 1, $"i").as[(Int, Long)].collect().toSet
    assert(got == want && got == Set((0, 2L), (1, 3L)))
  }

  test("decayedScore: hand-computed dyadic sums, horizon cutoff, and a " +
       "window-free single-aggregate plan") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // anchor = the newest event; ages in whole days behind it
    val t0 = java.sql.Timestamp.valueOf("2026-08-10 12:00:00")
    def daysBack(d: Int) =
      new java.sql.Timestamp(t0.getTime - d.toLong * 86400000L)
    val df = Seq(
      ("a", daysBack(0)), ("a", daysBack(1)), ("a", daysBack(2)),
      ("b", daysBack(0)), ("b", daysBack(40)),   // 40 days: beyond the cap
      ("c", daysBack(31))                        // all-stale key
    ).toDF("k", "ts")
    val got = TimeSeries.decayedScore(df, "k", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.getDecimal(3)).map(_.stripTrailingZeros.toPlainString)))).toMap
    assert(got("a") == ((3L, 3L, Some("1.75"))), s"got ${got("a")}")     // 1+1/2+1/4
    assert(got("b") == ((2L, 1L, Some("1"))), s"got ${got("b")}")        // stale drops
    assert(got("c") == ((1L, 0L, None)), s"got ${got("c")}")             // empty sum
    // plan: one scalar-max broadcast + one hash aggregate — no Window,
    // no per-key sort; the input relation is aggregated in one pass
    val plan = TimeSeries.decayedScore(df, "k", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!plan.contains("Sort"), s"unexpected sort:\n$plan")
  }

  test("decayedScore incremental-maintenance law: advancing the anchor " +
       "by D halves D times and adds the new arrivals") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val t0 = java.sql.Timestamp.valueOf("2026-08-10 12:00:00")
    def at(d: Int) = new java.sql.Timestamp(t0.getTime + d.toLong * 86400000L)
    val old = Seq(("a", at(-2)), ("a", at(-1)), ("a", at(0)), ("b", at(-1)))
    val fresh = Seq(("a", at(2))) // moves the anchor 2 days forward
    def scores(rows: Seq[(String, java.sql.Timestamp)]) =
      TimeSeries.decayedScore(rows.toDF("k", "ts"), "k", "ts")
        .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(3))).toMap
    val before = scores(old)
    val after = scores(old ++ fresh)
    // score(t+Δ) = score(t)·2^-Δ + new contributions — the property that
    // makes exponential decay incrementally maintainable at feed scale
    assert(after("a") == before("a") / 4 + 1, s"got ${after("a")}")
    assert(after("b") == before("b") / 4, s"got ${after("b")}")
  }

  test("w18 z-score matches an independent two-pass mean/std; warm-up rows never scored") {
    val d = sf("sf0.001")
    val flagged = Windows.w18ZscoreAnomaly(spark, d).collect()
    assert(flagged.nonEmpty, "fixture must produce at least one anomaly")
    // recompute one flagged row's stats from the raw events, two-pass
    val r = flagged.head
    val (id, typ) = (r.getLong(0), r.getString(1))
    val ev = graft.Tables.events(spark, d)
      .filter(col("event_type") === typ)
      .select(col("event_id"), col("ts"), col("value"))
      .orderBy(col("ts"), col("event_id")).collect()
    val i = ev.indexWhere(_.getLong(0) == id)
    assert(i >= 19, "a scored row must have a full 20-row frame")
    val frame = ev.slice(i - 19, i + 1).map(_.getDouble(2))
    val mean2 = frame.map(BigDecimal(_)).sum.toDouble / 20
    val s = frame.map(BigDecimal(_)).sum
    val ssq = frame.map(v => BigDecimal(v) * BigDecimal(v)).sum
    val std2 = math.sqrt((20 * ssq.toDouble - s.toDouble * s.toDouble) / (20 * 19))
    assert(math.abs(r.getDouble(3) - mean2) < 1e-9, s"mean ${r.getDouble(3)} vs $mean2")
    assert(math.abs(r.getDouble(4) - std2) < 1e-9, s"std ${r.getDouble(4)} vs $std2")
    assert(math.abs(r.getDouble(5)) > 2.5, "flagged rows must clear the threshold")
  }

  test("a17 RFM: quartiles are balanced and the code composes its digits") {
    val rows = Stats.a17Rfm(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    for (c <- Seq(4, 5, 6)) {
      val hist = rows.groupBy(_.getInt(c)).map { case (k, v) => k -> v.length }
      assert(hist.keySet.subsetOf(Set(1, 2, 3, 4)), s"col $c: $hist")
      // NTILE balance law: bucket sizes differ by at most one
      assert(hist.values.max - hist.values.min <= 1, s"col $c: $hist")
    }
    assert(rows.forall(r =>
      r.getInt(7) == r.getInt(4) * 100 + r.getInt(5) * 10 + r.getInt(6)))
    assert(n == rows.map(_.getLong(0)).distinct.length, "one row per customer")
  }

  test("w19 rolling median: hand-computed 21-row frames on a crafted " +
       "fixture; warm-up rows (and under-filled types) never scored") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("w19fix").toString
    // type 'x': 25 rows, value i.00 at minute i (shuffled write order —
    // the window's (ts, event_id) sort must restore it); type 'y': only
    // 20 rows — never reaches a full frame, wholly excluded as warm-up
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:$i%02d:00")
    val rows =
      (1 to 25).map(i => (i.toLong, ts(i), 7L, "x", i.toDouble, "{}")) ++
      (1 to 20).map(i => (100L + i, ts(i), 7L, "y", i.toDouble, "{}"))
    scala.util.Random.shuffle(rows.toList)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Windows.w19RollingMedian(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // rows 21..25 of 'x' have full frames [i-20..i]; the 11th order
    // statistic of 21 consecutive integers is the middle one, i-10
    val want = (21 to 25).map(i =>
      (i.toLong, "x", i * 100L, (i - 10) * 100L, 1000L))
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }

  test("w19 rolling median matches an independent Scala sliding-frame " +
       "oracle on sf0.001") {
    val d = sf("sf0.001")
    val got = Windows.w19RollingMedian(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getLong(3)))
    val want = ev.groupBy(_._2).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1))
      sorted.indices.drop(20).map { i =>
        val frame = sorted.slice(i - 20, i + 1).map(_._4).sorted
        sorted(i)._1 -> frame(10)
      }
    }
    assert(got.nonEmpty && got == want,
      s"sizes ${got.size} vs ${want.size}")
  }

  test("rollingMedianLarge == the collect_list/array_sort form on real " +
       "data; no collect_list in the plan; one exchange + one sort") {
    import graft.operators.TimeSeries
    val d = sf("sf0.001")
    val in = graft.Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val large = TimeSeries.rollingMedianLarge(
      in, "event_type", Seq("ts", "event_id"), "cents", 21, "med_cents")
    val got = large.select("event_id", "med_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Windows.w19RollingMedian(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got.nonEmpty && got == want, s"sizes ${got.size} vs ${want.size}")
    val plan = large.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      "large-frame path must not materialize frames")
    assert(!plan.toLowerCase.contains("window"),
      "large-frame path must not plan a Window")
  }

  test("SlidingMedian property: matches sorted-frame median under " +
       "duplicate-heavy random streams, with bounded physical size") {
    import graft.operators.TimeSeries
    val rnd = new scala.util.Random(42)
    for (frame <- Seq(1, 3, 5, 21); trial <- 1 to 5) {
      val n = 400
      // tiny value domain → constant duplicate collisions across the
      // lo/hi boundary, the regime where lazy deletion goes wrong
      val xs = Array.fill(n)(rnd.nextInt(7).toLong - 3)
      val med = new TimeSeries.SlidingMedian(frame)
      val win = new scala.collection.mutable.Queue[Long]()
      for (i <- xs.indices) {
        if (win.size == frame) med.remove(win.dequeue())
        win.enqueue(xs(i)); med.add(xs(i))
        if (med.physicalSize > 4 * frame) med.rebuild(win)
        if (win.size == frame) {
          val want = win.toArray.sorted.apply(frame / 2)
          assert(med.median == want,
            s"frame=$frame trial=$trial i=$i: ${med.median} vs $want")
          assert(med.physicalSize <= 4 * frame + 2,
            s"unbounded garbage: ${med.physicalSize}")
        }
      }
    }
  }

  test("w20 EWMA: constant series saturates at (2^31-1)x; an impulse " +
       "decays by exactly one bit per step and leaves the horizon") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("w20fix").toString
    def ts(i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + i * 60000L)
    // type 'c': constant 1.00 for 40 rows; type 'i': 2.00 impulse at
    // row 0 then 0.00 for 39 rows
    val rows =
      (0 until 40).map(i => (i.toLong, ts(i), 1L, "c", 1.0, "{}")) ++
      (0 until 40).map(i => (100L + i, ts(i), 1L, "i",
        if (i == 0) 2.0 else 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Windows.w20Ewma(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toList
    val c = got.filter(_._2 == "c")
    val i = got.filter(_._2 == "i")
    // warm-up: rows 0..29 excluded; 10 scored rows per type
    assert(c.size == 10 && i.size == 10)
    assert(c.forall(_._3 == 100L * ((1L << 31) - 1)),
      s"constant series must saturate: $c")
    // impulse: at t=30 the age-30 tap holds it with weight 2^0 -> 200;
    // from t=31 it is beyond the horizon -> exactly 0
    assert(i.head == ((130L, "i", 200L)), s"got ${i.head}")
    assert(i.tail.forall(_._3 == 0L), s"got ${i.tail}")
  }

  test("w21 CUSUM: zero through the low regime, linear climb after a " +
       "sustained shift, alarm past 10 target-units") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("w21fix").toString
    def ts(i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + i * 60000L)
    // 18 zeros then two 10.00 spikes: target = 2000/20 = 100 cents;
    // the zero run pins cusum at 0 (running min tracks the sum), the
    // spikes climb 900/1800 — the second crosses 10·target = 1000
    val rows = (0 until 20).map(i =>
      (i.toLong, ts(i), 1L, "c", if (i >= 18) 10.0 else 0.0, "{}")) ++
      // type 'u' drifts UP from its very first sample: values 10, 0 ->
      // target 500; true Page CUSUM of row 0 is its own +500 deviation
      // (S_0 = 0 is in the min), NOT 0 — the dropped-zero-term bug
      Seq((100L, ts(0), 1L, "u", 10.0, "{}"),
        (101L, ts(1), 1L, "u", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val all = Windows.w21Cusum(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getBoolean(4)))
    val got = all.filter(_._2 == "c").map(t => (t._1, t._3, t._4))
    assert(got.length == 20)
    assert(got.take(18).forall(t => t._2 == 0L && !t._3),
      s"low regime must sit at zero: ${got.take(18).toSeq}")
    assert(got(18) == ((18L, 900L, false)), s"got ${got(18)}")
    assert(got(19) == ((19L, 1800L, true)), s"got ${got(19)}")
    val up = all.filter(_._2 == "u").map(t => (t._1, t._3, t._4))
    assert(up.toSeq == Seq((100L, 500L, false), (101L, 0L, false)),
      s"upward drift from the first sample must score immediately: ${up.toSeq}")
  }

  test("decayedScoreFixedPoint: exact int64 rendering — score_2p30 = " +
       "decimal score · 2^30 on every key; same window-free plan") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val t0 = java.sql.Timestamp.valueOf("2026-08-10 12:00:00")
    def daysBack(d: Int) =
      new java.sql.Timestamp(t0.getTime - d.toLong * 86400000L)
    val df = Seq(
      ("a", daysBack(0)), ("a", daysBack(1)), ("a", daysBack(2)),
      ("b", daysBack(0)), ("b", daysBack(40)),
      ("c", daysBack(31))
    ).toDF("k", "ts")
    val got = TimeSeries.decayedScoreFixedPoint(df, "k", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // 1.75·2^30, 1·2^30, empty sum
    assert(got("a") == ((3L, 3L, Some(1879048192L))), s"got ${got("a")}")
    assert(got("b") == ((2L, 1L, Some(1073741824L))), s"got ${got("b")}")
    assert(got("c") == ((1L, 0L, None)), s"got ${got("c")}")
    // cross-check the law against the decimal variant on the same data
    val dec = TimeSeries.decayedScore(df, "k", "ts")
      .collect().map(r => r.getString(0) ->
        Option(r.getDecimal(3)).map(bd =>
          (BigDecimal(bd) * BigDecimal(2).pow(30)).toLongExact)).toMap
    assert(got.map { case (k, (_, _, s)) => k -> s } == dec)
    val plan = TimeSeries.decayedScoreFixedPoint(df, "k", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"unexpected window/sort:\n$plan")
  }
}
