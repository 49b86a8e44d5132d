package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableStatsSpec extends SparkSpec {

  test("profileNumeric matches hand-computed stats, including a column with nulls") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.5), (2L, null), (3L, -4.0), (null, 2.25), (3L, 10.5)
    ).toDF("a", "b")
    val got = TableStats.profileNumeric(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got("a") == ((4L, 1L, 1.0, 3.0, 3L)), s"a: ${got("a")}")
    assert(got("b") == ((4L, 1L, -4.0, 10.5, 3L)), s"b: ${got("b")}")
  }

  test("histogram: exact counts, under/overflow clamp to edge bins, nulls dropped") {
    import spark.implicits._
    val df = Seq(("g", Some(-5.0)), ("g", Some(0.0)), ("g", Some(4.9)), // bin 0 (2 clamped-ish)
      ("g", Some(5.0)), ("g", Some(9.9)),                               // bin 1
      ("g", Some(99.0)), ("g", None)                                    // overflow -> bin 2; null dropped
    ).toDF("k", "v")
    val got = TableStats.histogram(df, "v", lo = 0.0, width = 5.0, nBins = 3,
        groupCols = Seq("k"))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got == Map(
      0L -> ((3L, 0.0, 5.0)), 1L -> ((2L, 5.0, 10.0)), 2L -> ((1L, 10.0, 15.0))),
      s"unexpected: $got")
  }

  test("profile is ONE job over ONE scan — a single aggregate, no per-column re-scan") {
    val o = graft.Tables.orders(spark, sf("sf0.001"))
    val df = TableStats.profileNumeric(o, Seq("o_orderkey", "o_custkey", "o_totalprice"))
    val plan = df.queryExecution.executedPlan.toString
    // exactly one parquet scan feeds the whole profile
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
    assert(df.count() == 3)
  }

  test("globalPercentRank: ties share ranks, matches percent_rank, window sees only distinct values") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(20L)),
        (4L, Some(30L)), (5L, Some(5L)), (6L, None))
      .toDF("id", "v")
    // NULL contract: row 6 is excluded from output AND denominator —
    // the ppm expectations below only hold with N (non-null) = 5
    val got = TableStats.globalPercentRank(df, "v")
      .collect().map(r => (r.getAs[Long]("id"), (r.getAs[Long]("rank_below"),
        r.getAs[Long]("pct_ppm")))).toMap
    // ranks below: 5->0, 10->1, 20->2 (both), 30->4; ppm = below*1e6 div 4
    assert(got == Map(5L -> ((0L, 0L)), 1L -> ((1L, 250000L)),
      2L -> ((2L, 500000L)), 3L -> ((2L, 500000L)),
      4L -> ((4L, 1000000L))), s"got $got")
    // parity with SQL percent_rank (rank-1)/(N-1) at exact dyadic points
    import org.apache.spark.sql.expressions.Window
    val pr = df.filter(col("v").isNotNull).withColumn("pr",
      percent_rank().over(Window.orderBy(col("v"))))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pr")).toMap
    got.foreach { case (id, (_, ppm)) =>
      assert(math.abs(ppm / 1e6 - pr(id)) < 1e-9, s"id $id: $ppm vs ${pr(id)}")
    }
    // the cumulative Window must ride the aggregated distinct-value
    // table, never the raw rows: the single-partition exchange feeds
    // from a HashAggregate subtree
    val plan = TableStats.globalPercentRank(
        graft.Tables.orders(spark, sf("sf0.001"))
          .select(col("o_orderkey"), (col("o_custkey") % 100).as("v")), "v")
      .queryExecution.optimizedPlan.toString
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"Window must consume the per-value aggregate:\n$plan")
  }

  test("groupedPercentRank: per-group ranks match per-group percent_rank; " +
       "window rides the value table") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(10L)), ("a", 2L, Some(20L)), ("a", 3L, Some(20L)),
      ("a", 4L, Some(30L)),
      ("b", 5L, Some(100L)), ("b", 6L, Some(5L)),
      ("b", 7L, None), // NULL: excluded from output and the b denominator
      ("c", 8L, Some(7L))) // singleton group → pct 0
      .toDF("g", "id", "v")
    val got = TableStats.groupedPercentRank(df, "g", "v")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rank_below"), r.getAs[Long]("pct_ppm")))).toMap
    assert(got == Map(
      1L -> ((0L, 0L)), 2L -> ((1L, 333333L)), 3L -> ((1L, 333333L)),
      4L -> ((3L, 1000000L)),
      6L -> ((0L, 0L)), 5L -> ((1L, 1000000L)),
      8L -> ((0L, 0L))), s"got $got")
    assert(!got.contains(7L), "NULL-valued row must have no rank")
    // calibration property: a raw threshold keeps different fractions of
    // a and b, the per-group ppm threshold keeps the same fraction
    import org.apache.spark.sql.expressions.Window
    val pr = df.filter(col("v").isNotNull).withColumn("pr",
        percent_rank().over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pr")).toMap
    got.foreach { case (id, (_, ppm)) =>
      assert(math.abs(ppm / 1e6 - pr(id)) < 1e-6, s"id $id: $ppm vs ${pr(id)}")
    }
    // the window consumes the (group, value) aggregate, not raw rows
    val plan = TableStats.groupedPercentRank(
        graft.Tables.orders(spark, sf("sf0.001"))
          .select(col("o_orderkey"), col("o_orderstatus").as("g"),
            (col("o_custkey") % 100).as("v")), "g", "v")
      .queryExecution.optimizedPlan.toString
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"Window must consume the per-(group, value) aggregate:\n$plan")
  }

  test("globalPercentRankUnbounded == the window form on random data " +
       "with ties across range-bucket boundaries; no single-partition " +
       "exchange in the cumulative") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // heavy ties: values from a small-ish domain so equal values land
    // in one range bucket and duplicates straddle boundaries
    val df = (1 to 500).map(i => (i.toLong, (rnd.nextInt(40) * 3).toDouble))
      .toDF("id", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "rank_below", "pct_ppm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val unb = TableStats.globalPercentRankUnbounded(df, "v", parts = 7)
    assert(canon(unb) == canon(TableStats.globalPercentRank(df, "v")))
    // the cumulative must ride the range-partitioned window, not a
    // SinglePartition exchange feeding a global sort
    val plan = unb.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val singleIdx = lines.indexWhere(_.contains("Exchange SinglePartition"))
    assert(singleIdx == -1,
      s"unbounded path must not plan a single-partition exchange:\n$plan")
  }

  test("globalNtile == ntile window for every n mod buckets case, asc and " +
       "desc orders, n < buckets; a17_rfm plans no single-partition exchange") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    // n = 2 (< buckets), and n covering each residue mod 4
    for (n <- Seq(2, 8, 9, 10, 11)) {
      val df = (1 to n).map(i => (i.toLong, rnd.nextInt(1000).toDouble))
        .toDF("id", "v")
      for (desc <- Seq(false, true)) {
        val ord = if (desc) Seq(col("v").desc, col("id")) else Seq(col("v"), col("id"))
        val got = TableStats.globalNtile(df, 4, ord, "b", parts = 3)
          .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val want = df.withColumn("b", ntile(4).over(Window.orderBy(ord: _*)))
          .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == want, s"n=$n desc=$desc: $got vs $want")
      }
    }
    // the scale contract a17_rfm now rides: no Exchange SinglePartition
    // anywhere in the three chained quartile cuts (each window is
    // partitioned by range-bucket id, never global)
    val plan = graft.queries.Stats.a17Rfm(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"a17_rfm must not plan a single-partition exchange:\n$plan")
  }

  test("tableFingerprint: invariant under row order and partitioning; " +
       "any value change moves it; duplicate pairs escape XOR but not sum/ct") {
    import spark.implicits._
    val base = Seq(
      ("a", 1L, "x", "10.50"), ("a", 2L, "y", "3.00"), ("a", 3L, null, "7.25"),
      ("b", 4L, "z", "1.00"))
      .toDF("g", "id", "s", "price")
    def fp(df: org.apache.spark.sql.DataFrame) =
      TableStats.tableFingerprint(df, "g", Seq("id", "s", "price"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val ref = fp(base)
    // row order / partitioning invariance — the whole point
    assert(fp(base.orderBy(col("id").desc).repartition(7)) == ref)
    // one changed value moves the group's fingerprint, others untouched
    val changed = fp(base.withColumn("price",
      when(col("id") === 2, "3.01").otherwise(col("price"))))
    assert(changed("a") != ref("a") && changed("b") == ref("b"))
    // NULL must differ from any literal value (length-prefixed fields
    // with the bare "N" null marker make the rendering injective —
    // the ambiguity asserts below pin the edge cases)
    val nulled = fp(base.withColumn("s",
      when(col("id") === 1, lit(null)).otherwise(col("s"))))
    assert(nulled("a") != ref("a"))
    // an even number of identical rows cancels in XOR — sum_fp and ct
    // still catch it (why the digest carries all three)
    val doubled = fp(base.unionAll(base.filter(col("id") === 4)))
    assert(doubled("b")._1 == 0L, "two identical rows XOR to zero")
    assert(doubled("b")._2 == 2 * ref("b")._2 && doubled("b")._3 == 2)

    // canonicalization ambiguity regressions: a delimiter shifting
    // across a field boundary, and NULL vs any literal string, must
    // all fingerprint differently (the raw-'|'-join bug)
    def fp2(rows: Seq[(String, String, String)]) =
      fp(rows.toDF("g", "id", "s")
        .select(col("g"), col("id"), col("s"), lit("0").as("price"))
        .select("g", "id", "s", "price"))
    val shifted1 = fp2(Seq(("g", "a|b", "c")))("g")
    val shifted2 = fp2(Seq(("g", "a", "b|c")))("g")
    assert(shifted1 != shifted2, "delimiter shift must change the digest")
    val asNull = fp(Seq(("g", 1L, null.asInstanceOf[String], "1"))
      .toDF("g", "id", "s", "price"))("g")
    val asSpace = fp(Seq(("g", 1L, " ", "1"))
      .toDF("g", "id", "s", "price"))("g")
    val asN = fp(Seq(("g", 1L, "N", "1"))
      .toDF("g", "id", "s", "price"))("g")
    assert(asNull != asSpace && asNull != asN,
      "NULL must differ from every literal rendering")
  }

  test("fkAudit: counts orphan rows (incl. NULL keys) and non-null " +
       "orphan keys; clean relation reports full coverage") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(1L), Some(2L), Some(3L), None, Some(9L))
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L, 3L).toDF("pk") // dup dim keys must not inflate
    val got = TableStats.fkAudit(fact, "fk", dim, "pk", "fact.fk->dim")
      .collect().head
    assert(got.getString(0) == "fact.fk->dim")
    assert(got.getLong(1) == 6, "fact_rows")
    assert(got.getLong(2) == 2, "orphan_rows: the NULL and the 9")
    assert(got.getLong(3) == 4, "distinct non-null keys: 1,2,3,9")
    assert(got.getLong(4) == 1, "orphan keys: only 9 (NULL not a key)")
    assert(got.getLong(5) == 4L * 1000000 / 6, "coverage_ppm truncates")

    val clean = TableStats.fkAudit(dim, "pk", dim, "pk", "self")
      .collect().head
    assert(clean.getLong(2) == 0 && clean.getLong(5) == 1000000L)
  }

  test("examplesPerGroup: matches the row_number window rendering, " +
       "no Window in the plan, whole group when k exceeds it") {
    import spark.implicits._
    import graft.llm.Sampling
    val df = (1L to 100L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
    val got = Sampling.examplesPerGroup(df, "g", "id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val h = pmod(pmod(col("id"), lit(2147483648L)) * 2654435761L,
      lit(2147483648L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(h, col("id"))
    val want = df.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w).cast("long") - 1)
      .filter(col("rank") < 5).select("g", "rank", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.size == 15)

    val plan = Sampling.examplesPerGroup(df, "g", "id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sampler must not plan a window:\n$plan")

    // k larger than the group: every row sampled, ranks dense from 0
    val tiny = Seq(("g", 10L), ("g", 20L)).toDF("g", "id")
    val all = Sampling.examplesPerGroup(tiny, "g", "id", 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(all.length == 2 && all.map(_._1).sameElements(Array(0L, 1L)))
  }
}
