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

  test("q17: part dim broadcasts, ONE fact shuffle (window decorrelation), threshold is exact") {
    val df = Relational.q17SmallQuantity(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"part dim must broadcast:\n$plan")
    assert(plan.contains("Window"), s"decorrelation must be a window, not a self-join:\n$plan")
    // one hash-partition exchange on the fact (l_partkey); the brand agg
    // rides the tiny surviving set
    val factEx = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning(l_partkey")).size
    assert(factEx == 1, s"exactly one fact shuffle expected:\n$plan")
    val scans = df.queryExecution.sparkPlan.toString
    assert(scans.contains("EqualTo(p_type,ECONOMY)"), "part type filter must push down")
    // brute-force parity on the small fixture: per-part avg via plain agg
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf("sf0.001"))
    val p = graft.Tables.part(spark, sf("sf0.001"))
      .filter(col("p_type") === "ECONOMY").select("p_partkey", "p_brand")
    val stats = li.groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("sq"), count(lit(1)).as("ct"))
    val brute = li.join(stats, "l_partkey").join(p, col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity").cast("long") * 5 * col("ct") < col("sq"))
      .groupBy("p_brand")
      .agg((sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0)
        .as("avg_yearly"), count(lit(1)).as("n_items"))
      .orderBy("p_brand").collect().toSeq
    assert(df.collect().toSeq == brute, "window and join decorrelations must agree")
  }

  test("q13: aggregated-orders shape equals the naive outer join; no customer is lost") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val df = Relational.q13CustomerDistribution(spark, dir)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    // every customer lands in exactly one bucket — the ON-clause filter
    // must never delete zero-order customers (a WHERE-pushed filter would)
    val nCust = graft.Tables.customer(spark, dir).count()
    assert(rows.map(_._2).sum == nCust)
    // shape equivalence: the textbook customer LEFT JOIN raw-orders form
    // (one row per order through the join) must give the same histogram
    // as the aggregate-first form the operator ships
    val c = graft.Tables.customer(spark, dir).select("c_custkey")
    val o = graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT").select("o_custkey")
    val naive = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey")).agg(count(col("o_custkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.toSet == naive, "aggregate-first must equal the naive outer-join shape")
    // plan contract: each table scanned once; the outer join is against the
    // customer-sized count table, not raw orders
    // sparkPlan (pre-AQE): the executed plan's string repeats scans in its
    // Initial/Final sections under adaptive execution
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 2,
      s"each table scanned exactly once:\n$plan")
    assert(plan.contains("LeftOuter"), s"outer join must survive optimization:\n$plan")
  }

  test("q18: one fact shuffle serves predicate and output; top-100 is TakeOrdered") {
    val df = Relational.q18LargeOrders(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no global sort for top-100:\n$plan")
    val factEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning(l_orderkey"))
    assert(factEx == 1, s"exactly one lineitem shuffle (the per-order agg):\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 3, s"each table scanned exactly once:\n$plan")
  }

  test("q21: exists/not-exists decorrelates to ONE fact scan + window; supplier broadcasts") {
    val df = Relational.q21WaitingSuppliers(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // both correlated subqueries fold into per-order counts — the fact
    // (lineitem) is scanned exactly once, with no anti-join anywhere
    val scans = df.queryExecution.sparkPlan.toString
    val liScans = scans.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(liScans == 1, s"exactly one lineitem scan expected ($liScans):\n$scans")
    assert(!plan.contains("LeftAnti"), s"no anti-join expected:\n$plan")
    assert(plan.contains("Window"), s"per-order counts must be a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"supplier dim must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-20 must be top-k:\n$plan")
    assert(scans.contains("EqualTo(o_orderstatus,F)"), "status filter must push down")
    assert(df.collect().length <= 20)
  }

  test("q5: one fact-fact shuffle, every dim broadcasts, date filter " +
       "pushes down") {
    val df = Relational.q5LocalSupplierVolume(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the only exchanges allowed: the lineitem⋈orders key shuffle (plus
    // its partial-agg exchange) and broadcasts — customer/supplier/
    // nation never hash-shuffle the fact side again
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(l => l.contains("l_orderkey") || l.contains("o_orderkey")
        || l.contains("n_name")),
      s"unexpected fact shuffle:\n${hashEx.mkString("\n")}")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"customer, supplier, nation must broadcast:\n$plan")
    val scans = df.queryExecution.sparkPlan.toString
    assert(scans.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date range must push to the orders scan")
    assert(df.collect().length <= 5)
  }

  test("q7: nation joins twice under two roles, all broadcast; one fact " +
       "exchange; shipdate range pushes down") {
    val df = Relational.q7VolumeShipping(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 4,
      s"customer, supplier and both nation roles must broadcast:\n$plan")
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(l => l.contains("l_orderkey") || l.contains("o_orderkey")
        || l.contains("supp_nation")),
      s"unexpected fact shuffle:\n${hashEx.mkString("\n")}")
    val scans = df.queryExecution.sparkPlan.toString
    assert(scans.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate range must push to the lineitem scan")
    // both directions present, symmetric pair filter held
    val dirs = df.select("supp_nation", "cust_nation").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.subsetOf(Set(("NATION_2", "NATION_7"), ("NATION_7", "NATION_2"))),
      s"unexpected nation pairs: $dirs")
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
