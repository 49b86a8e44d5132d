package graft.queries

import graft.SparkSpec

/** Plan-shape contracts for the classic multi-join analytics gates. */
class RelationalSpec extends SparkSpec {

  test("q3: date filters reach both scans, top-10 is TakeOrderedAndProject not a full sort") {
    val df = Relational.q3ShippingPriority(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must render as TakeOrderedAndProject:\n$plan")
    // the ONLY ordering operator is the top-k; no global Sort anywhere
    assert(!plan.linesIterator.exists(l =>
      l.trim.startsWith("+- Sort") || l.trim.startsWith(":- Sort")),
      s"no full Sort expected:\n$plan")
    val scans = df.queryExecution.sparkPlan.toString
    assert(scans.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate") ||
      scans.contains("GreaterThan(l_shipdate"), "lineitem date filter must push down")
    assert(scans.contains("LessThan(o_orderdate"), "orders date filter must push down")
    assert(df.collect().length <= 10)
  }

  test("q10: returnflag filter pushes down, dims broadcast, top-20 bounded") {
    val df = Relational.q10ReturnedItems(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n$plan")
    val scans = df.queryExecution.sparkPlan.toString
    assert(scans.contains("EqualTo(l_returnflag,R)"), "returnflag filter must push down")
    assert(df.collect().length <= 20)
  }
}
