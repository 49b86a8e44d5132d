package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Seeded-random property checks for the sampling operators' laws —
  * many configurations, the same invariants: sampling is a subset with
  * exact 1/rate weights and is rerun-stable; a split is a partition of
  * the input for ANY valid fraction vector (zero fractions allowed and
  * never assigned).
  */
class SamplingPropertySpec extends SparkSpec {

  private val langs = Seq("en", "de", "fr", "es", "zh")

  test("stratifiedSample: subset, exact weight law, rerun-stable (12 seeded rate maps)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val total = docs.count()
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 12) {
      // rates in quarters so 1/rate is exact in both engines' doubles
      val rates = langs.filter(_ => rnd.nextBoolean())
        .map(l => l -> (rnd.nextInt(4) + 1) / 4.0).toMap
      val default = (rnd.nextInt(4) + 1) / 4.0
      val out = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, default)
      assert(out.count() <= total)
      out.select($"lang", $"sample_rate", $"sample_weight").distinct().collect()
        .foreach { r =>
          val rate = rates.getOrElse(r.getString(0), default)
          assert(r.getDouble(1) == rate, s"rate for ${r.getString(0)}")
          assert(r.getDouble(2) == 1.0 / rate, s"weight for ${r.getString(0)}")
        }
      val again = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, default)
      assert(out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty &&
        again.select("doc_id").exceptAll(out.select("doc_id")).isEmpty)
    }
  }

  test("deterministicSplit: a partition for any fraction vector in eighths (12 seeded)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val total = docs.count()
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 12) {
      // k parts as differences of sorted cut points in eighths — exact
      // binary fractions summing to exactly 1; zero fractions possible
      val k = rnd.nextInt(3) + 2
      val cuts = (Seq.fill(k - 1)(rnd.nextInt(9)).sorted :+ 8).prepended(0)
      val fractions = cuts.sliding(2).map(w => (w(1) - w(0)) / 8.0).toSeq
      val splits = fractions.zipWithIndex.map { case (f, j) => s"s$j" -> f }
      val out = Sampling.deterministicSplit(docs, "doc_id", splits)
      assert(out.count() == total, "split must preserve row count")
      val byLabel = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byLabel.values.sum == total)
      assert(byLabel.keySet.subsetOf(splits.map(_._1).toSet))
      // a zero-fraction part can never be assigned (every position —
      // the final split is excluded BEFORE filtering, so a zero in the
      // middle is always asserted)
      splits.dropRight(1).filter(_._2 == 0.0).foreach { case (name, _) =>
        assert(!byLabel.contains(name), s"zero-fraction split $name got rows")
      }
    }
  }

  test("tokenBudgetSelect: hand-computed cut with a boundary value spent " +
       "in id order") {
    import spark.implicits._
    val docs = Seq(
      (1L, 3L, 10L), (2L, 3L, 10L),               // q=3: fully inside
      (3L, 2L, 10L), (4L, 2L, 10L), (5L, 2L, 10L), // q=2: boundary value
      (6L, 1L, 10L)                                // q=1: fully outside
    ).toDF("doc_id", "q", "toks")
    // total 60, budget 50% = 30: q3 (20) fits, q2 spends the last 10 on
    // doc 3 only, q1 starts past the budget
    val got = Sampling.tokenBudgetSelect(docs, "doc_id", "q", "toks", 500000L)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 0, 6L -> 0),
      s"got $got")
  }

  test("leakage-safe split: no near-dup cluster spans two splits, and " +
       "both ends of every LSH pair share a split (sf0.001)") {
    val rows = graft.queries.LlmOps.xSplitLeakageSafe(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
    val byDoc = rows.toMap
    rows.groupBy(_._2._1).foreach { case (cid, ms) =>
      assert(ms.map(_._2._2).toSet.size == 1,
        s"cluster $cid spans splits ${ms.map(_._2._2).toSet}")
    }
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    Dedup.minhashLshPairs(docs, 3, 0.8).select("d1", "d2").collect()
      .foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(byDoc(a)._2 == byDoc(b)._2,
          s"near-dup pair ($a, $b) split across ${byDoc(a)._2}/${byDoc(b)._2}")
      }
  }

  test("tokenBudgetSelect: a hot boundary value (half the corpus on one " +
       "quality score) still cuts correctly in id order") {
    import spark.implicits._
    // 8 docs: 4 at the hot value 5, budget lands mid-value
    val docs = (1L to 2L).map((_, 9L, 10L)) ++ (3L to 6L).map((_, 5L, 10L)) ++
      (7L to 8L).map((_, 1L, 10L))
    val got = Sampling.tokenBudgetSelect(docs.toDF("doc_id", "q", "toks"),
        "doc_id", "q", "toks", 500000L) // budget = 40 of 80
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // q=9 (20) fits; hot q=5 spends the last 20 on ids 3 and 4 only
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1,
      5L -> 0, 6L -> 0, 7L -> 0, 8L -> 0), s"got $got")
  }

  test("tokenBudgetSelect on real signals: selection is the maximal " +
       "greedy prefix within budget (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val in = TextAnalysis.lmTypicality(docs).select(col("doc_id"), col("typ_ppm"))
      .join(TextAnalysis.withTokenCounts(docs).select("doc_id", "n_tokens"),
        Seq("doc_id"))
    val rows = Sampling.tokenBudgetSelect(in, "doc_id", "typ_ppm", "n_tokens",
        600000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val total = rows.map(_._3).sum
    val budget = total * 600000L / 1000000L
    val greedy = rows.sortBy(t => (-t._2, t._1)) // quality desc, id asc
    val selected = greedy.takeWhile(_._4 == 1)
    // the selected set is a PREFIX of the greedy order (no gaps)
    assert(greedy.drop(selected.length).forall(_._4 == 0),
      "selected set is not a greedy prefix")
    // within budget, and maximal: the next greedy doc would burst it
    val spent = selected.map(_._3).sum
    assert(spent <= budget, s"spent $spent over budget $budget")
    greedy.drop(selected.length).headOption.foreach { next =>
      assert(spent + next._3 > budget,
        s"selection not maximal: doc ${next._1} still fits")
    }
  }

  test("systematicPps: multiplicities sum to k, each within 1 of its " +
       "k*w/T expectation, heavy items drawn multiple times; no " +
       "single-partition window; invariant under partition count") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1L to 200L).map(i =>
      (i, if (i == 42) 5000L else 10L + rnd.nextInt(90))) // one whale
    val df = rows.toDF("id", "w")
    val k = 20
    val total = rows.map(_._2).sum
    def run(parts: Int) = Sampling.systematicPps(df, "id", "w", k, parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    val got = run(5)
    assert(got.map(_._3).sum == k, "multiplicities must sum to k")
    got.foreach { case (id, w, m) =>
      val expect = k.toDouble * w / total
      assert(math.abs(m - expect) <= 1.0, s"id $id: m=$m expect=$expect")
    }
    val whale = got.find(_._1 == 42L)
    assert(whale.exists(_._3 >= 2),
      s"the whale (w=5000 of T=$total) must be drawn multiple times: $whale")
    // non-selected items also satisfy the bound (expectation < 1 + 1)
    val selectedIds = got.map(_._1).toSet
    rows.filterNot(r => selectedIds(r._1)).foreach { case (id, w) =>
      assert(k.toDouble * w / total <= 1.0 + 1e-9,
        s"unselected id $id has expectation > 1")
    }
    // partitioning must not change a deterministic sample
    assert(run(1).toSet == got.toSet && run(13).toSet == got.toSet)
    val plan = Sampling.systematicPps(df, "id", "w", k, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"prefix sum must stay range-partitioned:\n$plan")
  }

  test("systematicPps: duplicate ids still yield sum(multiplicity) = k " +
       "(ROWS-frame cumulative sum tiles the weight line exactly)") {
    // under the default RANGE frame, duplicate ids share one cumulative
    // value -> overlapping intervals -> a point can match several rows
    // and the sum exceed k. The ROWS frame keeps the tiling exact; only
    // WHICH duplicate gets a point is tie-dependent (documented).
    import spark.implicits._
    val rows = (1L to 50L).flatMap(i => Seq((i, 25L), (i, 25L))) // every id twice
    val df = rows.toDF("id", "w")
    val k = 17
    val got = Sampling.systematicPps(df, "id", "w", k, 4).collect()
    assert(got.map(_.getLong(4)).sum == k,
      s"duplicate ids must not inflate the draw: ${got.map(_.getLong(4)).sum} != $k")
    // intervals must be disjoint and tile [0, T): total covered width == T
    val width = got.map(r => r.getLong(3) - r.getLong(2))
    assert(width.forall(_ == 25L))
  }
}
