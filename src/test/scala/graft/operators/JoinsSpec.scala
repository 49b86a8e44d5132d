package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {

  test("asofJoin: inclusive match, tie-break, and null when nothing precedes") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // before any right row -> null
      (2L, 10L, 205L), // strictly after right@200
      (3L, 10L, 300L), // EQUAL to right@300 -> inclusive match
      (4L, 99L, 500L)  // key with no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, 200L),
      (102L, 10L, 300L),
      (103L, 10L, 300L), // same ts as 102: tie-break keeps the larger id
      (104L, 10L, 400L)  // after every left row -> never matched
    ).toDF("event_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("event_id"))
    val got = Joins.asofJoin(left, right, "user_id", "ts",
      rightPrefix = "c_", tieBreak = Some("event_id"))
      .select("event_id", "c_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(101L), 3L -> Some(103L), 4L -> None),
      s"unexpected matches: $got")
  }

  test("asofJoin on real events equals the naive per-row argmax, without a nested loop") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val got = Joins.asofJoin(p, c, "user_id", "ts", rightPrefix = "c_")
      .select(col("event_id"), col("c_event_id"))
    // naive rendering: theta LEFT join (nested loop — fine at spec scale,
    // the exact plan asofJoin exists to avoid) + argmax by (ts, id)
    val naive = p.join(
        c.select(col("user_id").as("cuser"), col("ts").as("cts"),
          col("event_id").as("cid")),
        col("user_id") === col("cuser") && col("cts") <= col("ts"),
        "left_outer")
      .groupBy(col("event_id"))
      .agg(max(when(col("cts").isNotNull,
        struct(col("cts"), col("cid")))).getField("cid").as("c_event_id"))
    val g = got.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val w = naive.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(g == w && g.nonEmpty, s"asof mismatch: ${g.size} vs ${w.size}")
    assert(g.values.exists(_.isDefined), "some purchase must have a preceding click")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"asofJoin must not plan a nested loop:\n$plan")
    assert(plan.contains("Window"), "expected the keyed-window rendering")
  }

  test("asofJoin attaches ONE consistent right row and preserves its NULLs") {
    import spark.implicits._
    val left = Seq((1L, 10L, 250L), (2L, 10L, 350L)).toDF("event_id", "user_id", "ts")
    // right payload columns hold NULLs in alternating rows: a per-column
    // fill would stitch values from DIFFERENT right rows (left@250 would
    // get tag 'a' from ts=100 next to score 42 from ts=200) and would
    // resurrect stale 42 over the genuine NULL in the ts=300 row
    val right = Seq(
      (10L, 100L, Option("a"), Option.empty[Long]),
      (10L, 200L, Option.empty[String], Option(42L)),
      (10L, 300L, Option("c"), Option.empty[Long])
    ).toDF("user_id", "ts", "tag", "score")
    val got = Joins.asofJoin(left, right, "user_id", "ts")
      .select("event_id", "r_ts", "r_tag", "r_score").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) == ((200L, None, Some(42L))), s"left@250 must carry row@200 whole: ${got(1L)}")
    assert(got(2L) == ((300L, Some("c"), None)), s"left@350 must carry row@300's real NULL: ${got(2L)}")
  }

  test("rangeJoinBinned bins stay exact above 2^53") {
    import spark.implicits._
    // near 2^60 a double-division bin key rounds: facts land in wrong
    // bins and (the exact predicate only REMOVES candidates) matches are
    // silently missed; the IntegralDivide rendering stays in int64
    val base = 1L << 60
    val facts = (0L to 40L).map(i => (i, base + i * 13L)).toDF("fid", "v")
    val ranges = Seq(("lo", base + 1L, base + 250L), ("hi", base + 250L, base + 520L))
      .toDF("label", "lo", "hi")
    val got = Joins.rangeJoinBinned(facts, ranges, "v", "lo", "hi", binWidth = 7L)
      .select("fid", "label").as[(Long, String)].collect().toSet
    val want = facts.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
      .select("fid", "label").as[(Long, String)].collect().toSet
    assert(got == want && got.nonEmpty, s"big-value mismatch: missing=${want.diff(got)} extra=${got.diff(want)}")
  }

  test("rangeJoinBinned equals the naive inequality join incl. bin-edge cases") {
    import spark.implicits._
    // ranges deliberately hitting edges: [0,100) one bin; [100,200) exact
    // bin; [50,250) spans three; [200,200) empty; [199,201) straddles
    val ranges = Seq(
      ("a", 0L, 100L), ("b", 100L, 200L), ("c", 50L, 250L),
      ("d", 200L, 200L), ("e", 199L, 201L)
    ).toDF("label", "lo", "hi")
    val facts = (0L to 260L by 7L).toDF("v").withColumn("fid", col("v"))
    val got = Joins.rangeJoinBinned(facts, ranges, "v", "lo", "hi", 100L)
      .select("fid", "label").as[(Long, String)].collect().toSet
    val want = facts.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
      .select("fid", "label").as[(Long, String)].collect().toSet
    assert(got == want && got.nonEmpty, s"edge mismatch: ${got.diff(want)} / ${want.diff(got)}")
    // boundary semantics: lo inclusive, hi exclusive
    assert(got.contains((0L, "a")) && !want.exists(_._2 == "d"))
  }

  test("rangeJoinBinned on orders x nation bands matches the naive join and avoids a nested loop") {
    val o = graft.Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val bands = graft.Tables.nation(spark, sf("sf0.001"))
      .select(col("n_nationkey"), col("n_name"))
      .withColumn("lo", col("n_nationkey").cast("long") * 300000L)
      .withColumn("hi", col("n_nationkey").cast("long") * 300000L + 700000L)
    val got = Joins.rangeJoinBinned(o, bands, "cents", "lo", "hi", 100000L)
    val gotSet = got.select("o_orderkey", "n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val wantSet = o.join(bands, col("cents") >= col("lo") && col("cents") < col("hi"))
      .select("o_orderkey", "n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotSet == wantSet && gotSet.nonEmpty)
    // overlapping bands: some order must land in more than one
    assert(gotSet.groupBy(_._1).exists(_._2.size > 1), "bands overlap by construction")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned range join must be an equi-join:\n$plan")
  }

  test("asofJoin forward: nearest following right, inclusive, tolerance nulls far matches") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // next right at 200
      (2L, 10L, 300L), // EQUAL to right@300 -> inclusive
      (3L, 10L, 500L)  // nothing follows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((101L, 10L, 200L), (102L, 10L, 300L), (103L, 10L, 90L))
      .toDF("event_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("event_id"))
    val fwd = Joins.asofJoin(left, right, "user_id", "ts",
      rightPrefix = "n_", direction = "forward")
      .select("event_id", "n_event_id").as[(Long, Option[Long])].collect().toMap
    assert(fwd == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None), s"fwd: $fwd")
    // tolerance 50: left@100 -> right@200 is 100 away -> nulled whole
    val tol = Joins.asofJoin(left, right, "user_id", "ts",
      rightPrefix = "n_", direction = "forward", tolerance = Some(lit(50L)))
      .select("event_id", "n_event_id", "n_ts").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(tol(1L) == ((None, None)), "out-of-tolerance match must null ALL right columns")
    assert(tol(2L) == ((Some(102L), Some(300L))))
  }

  test("asofJoin forward/tolerance agree with the naive argmin on real events") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("puser"), col("ts").as("pts"), col("event_id").as("pid"))
    val got = Joins.asofJoin(c,
        p.select(col("puser").as("user_id"), col("pts").as("ts"), col("pid").as("event_id")),
        "user_id", "ts", rightPrefix = "p_", direction = "forward")
      .select(col("event_id"), col("p_event_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val naive = c.join(p, col("user_id") === col("puser") && col("pts") >= col("ts"), "left_outer")
      .groupBy(col("event_id"))
      .agg(min(when(col("pts").isNotNull, struct(col("pts"), col("pid"))))
        .getField("pid").as("p_event_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got == naive && got.values.exists(_.isDefined))
  }

  test("asofJoinNearest picks the closer side, backward on ties, tolerance applies per leg") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // back@90 (gap 10) vs fwd@200 (gap 100) -> backward
      (2L, 10L, 195L), // back@90 (gap 105) vs fwd@200 (gap 5)  -> forward
      (3L, 10L, 145L), // back@90 (gap 55) == fwd@200 (gap 55)  -> tie -> backward
      (4L, 99L, 100L)  // no rights for the key -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((101L, 10L, 90L), (102L, 10L, 200L))
      .toDF("event_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("event_id"))
    val got = Joins.asofJoinNearest(left, right, "user_id", "ts", leftId = "event_id")
      .select("event_id", "r_event_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> Some(101L), 4L -> None),
      s"nearest: $got")
    // tolerance 20 kills both of row 3's candidates (gap 55 each side)
    val tol = Joins.asofJoinNearest(left, right, "user_id", "ts", leftId = "event_id",
      tolerance = Some(lit(20L)))
      .select("event_id", "r_event_id").as[(Long, Option[Long])].collect().toMap
    assert(tol == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None, 4L -> None),
      s"tolerance: $tol")
  }

  test("rangeOverlapJoin equals the theta join, one emission per pair, no nested loop") {
    import spark.implicits._
    val o = graft.Tables.orders(spark, sf("sf0.001"))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val a = o.select(col("o_orderkey").as("k1"), col("cents").as("lo1"),
      (col("cents") + 10000L).as("hi1"))
    val b = o.select(col("o_orderkey").as("k2"), col("cents").as("lo2"),
      (col("cents") + 10000L).as("hi2"))
    val got = Joins.rangeOverlapJoin(a, b, "lo1", "hi1", "lo2", "hi2", 10000L)
      .filter(col("k1") < col("k2"))
    val gotPairs = got.select("k1", "k2").as[(Long, Long)].collect()
    val want = a.join(b, col("lo1") < col("hi2") && col("lo2") < col("hi1") &&
        col("k1") < col("k2"))
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    // exactly-once: list equality against the set proves no multi-bin dupes
    assert(gotPairs.length == want.size && gotPairs.toSet == want && want.nonEmpty,
      s"${gotPairs.length} emissions vs ${want.size} pairs")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n$plan")
  }

  test("rangeOverlapJoin matches brute force over random intervals, widths, negative bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 4) {
      val width = 1L + rnd.nextInt(50)
      def mk(n: Int) = (1 to n).map { i =>
        val lo = rnd.nextInt(1000) - 500L
        (i.toLong, lo, lo + 1L + rnd.nextInt(120)) // non-empty by contract
      }
      val as = mk(60); val bs = mk(60)
      val a = as.toDF("ka", "loa", "hia")
      val b = bs.toDF("kb", "lob", "hib")
      val got = Joins.rangeOverlapJoin(a, b, "loa", "hia", "lob", "hib", width)
        .select("ka", "kb").as[(Long, Long)].collect().sorted.toSeq
      val want = (for {
        (ka, la, ha) <- as; (kb, lb, hb) <- bs
        if la < hb && lb < ha
      } yield (ka, kb)).sorted
      assert(got == want,
        s"round $round width=$width: ${got.size} vs ${want.size} pairs")
    }
  }

  test("saltedJoin equals the plain join row-for-row (inner and left), multiplicity intact") {
    import spark.implicits._
    val probe = Seq(
      (1L, "hot", 10.0), (2L, "hot", 20.0), (3L, "hot", 30.0),
      (4L, "cold", 40.0), (5L, "none", 50.0) // no dim row -> inner drops, left keeps null
    ).toDF("id", "k", "v")
    // duplicate build keys: every probe row must meet BOTH 'hot' rows
    // exactly once (fan-out multiplicity preserved through the salt)
    val build = Seq(("hot", 100L), ("hot", 101L), ("cold", 200L)).toDF("k", "tag")
    for (jt <- Seq("inner", "left")) {
      val got = Joins.saltedJoin(probe, build, Seq("k"), buckets = 4, joinType = jt)
        .select("id", "tag").collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).toList.sorted
      val want = probe.join(build, Seq("k"), jt)
        .select("id", "tag").collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).toList.sorted
      assert(got == want && got.nonEmpty, s"$jt mismatch: $got vs $want")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(probe, build, Seq("k"), 4, joinType = "right")
    }
  }

  test("saltedJoin shuffles on (key, salt) — the hot key fans out past one reducer") {
    import spark.implicits._
    // with broadcast off, the plain join's exchange hashes on k alone
    // (one partition owns ALL 'hot' rows); the salted plan's exchange
    // key includes __salt, spreading the hot key across buckets
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
             "spark.sql.adaptive.enabled" -> "false") {
      val probe = (1 to 1000).map(i => (i.toLong, "hot", i * 1.0)).toDF("id", "k", "v")
      val build = Seq(("hot", 1L)).toDF("k", "tag")
      val salted = Joins.saltedJoin(probe, build, Seq("k"), buckets = 8)
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"exchange must carry the salt key:\n$plan")
      assert(salted.count() == 1000L)
    }
  }
}
