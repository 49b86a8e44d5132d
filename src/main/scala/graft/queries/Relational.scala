package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.util.Det._

/** Relational parity queries: scans, projections, filters, derived columns,
  * joins (SURVEY.md §2.1 S1, §2.2 P1-P5, §2.3 J1-J3).
  *
  * Each query maps a reference operator onto the driver's TPC-H-ish tables
  * (FIXTURES.md §8 mapping): `orders ⋈ lineitem` plays order_info ⋈
  * order_detail, the small tables play the Phoenix DIM_* lookups.
  */
object Relational {

  /** A1-style pricing summary (scan → groupBy → exact decimal sums).
    * Catalyst plans partial+final agg with map-side combine; one shuffle on
    * the (tiny-cardinality) group key. */
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    ordered(
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          decAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")),
      "l_returnflag", "l_linestatus")
  }

  /** S1/P1: scan + projection + predicate — both pushed to the parquet
    * reader (PushedFilters + pruned ReadSchema; reference: every
    * Kafka-source `map`/`filter` head, e.g. BaseLogApp.java:40-58). */
  def s1Scan(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    ordered(
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .filter(col("l_extendedprice") > 9000.0),
      "l_orderkey", "l_linenumber")
  }

  /** P3: bean-binding derived columns — create_date / create_hour /
    * epoch-ms from a datetime (reference OrderWideApp.java:52-74). */
  def p3Derive(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    ordered(
      o.select(
        col("o_orderkey"),
        stamp(col("o_orderdate")).as("create_time"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("create_date"),
        hour(col("o_orderdate")).cast("long").as("create_hour"),
        unix_millis(col("o_orderdate")).as("create_ts")),
      "o_orderkey")
  }

  /** P4: drop records by field value (reference filters CDC "delete" ops,
    * BaseDbApp.java:49-54). */
  def p4Filter(s: SparkSession, d: String): DataFrame =
    ordered(
      events(s, d).filter(col("event_type") =!= "error")
        .select(col("event_id"), col("event_type"), col("user_id")),
      "event_id")

  /** J1: time-bounded equijoin — batch rendering of the ±bounds interval
    * join (OrderWideApp.java:96-105: keyBy id ⋈ keyBy order_id
    * between(-5s,+5s), inclusive). Here: lineitems shipped within
    * [orderdate, orderdate + 60 days]. The streaming rendering (watermarked
    * stream-stream join) lives in graft.streaming.IntervalJoin. */
  def j1IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice")
    val li = lineitem(s, d).select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
    ordered(
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("o_orderkey"), col("l_linenumber"),
          stamp(col("l_shipdate")).as("ship_time"), col("l_extendedprice")),
      "o_orderkey", "l_linenumber")
  }

  /** J1-stream: the SAME interval join through the ACTUAL streaming
    * engine — both fixture tables as file-source streams, watermarked
    * stream-stream inner join (`streaming.WidePipelines.intervalJoin`),
    * AvailableNow trigger, parquet sink — then the sink read back and
    * ordered. Inner interval-join matches are emitted regardless of
    * watermark progress (the watermark only bounds state retention and
    * late input), so over a static file set the streaming result must
    * equal j1_interval_join's batch result row-for-row — giving the
    * streaming ENGINE face the same DuckDB oracle the batch face has
    * (the stream==batch parity previously lived only in a spec). */
  def j1IntervalStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def streamTable(name: String, cols: Seq[String]): DataFrame = {
      val raw = s.read.parquet(s"$d/$name.parquet")
      // the file source wants a DIRECTORY; the fixtures are single files —
      // symlink into a temp dir (no data copy)
      val dir = java.nio.file.Files.createTempDirectory(s"j1src_$name")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$name.parquet"), java.nio.file.Paths.get(s"$d/$name.parquet"))
      val st = s.readStream.schema(raw.schema).parquet(dir.toString)
      raw.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(st) {
        (df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType))
      }.select(cols.map(col): _*)
    }
    val li = streamTable("lineitem",
      Seq("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"))
    val o = streamTable("orders", Seq("o_orderkey", "o_orderdate"))
    // l_shipdate ∈ [o_orderdate, o_orderdate + 60d]  ⇔
    // o_orderdate ∈ [l_shipdate − 60d, l_shipdate + 0s]
    val joined = graft.streaming.WidePipelines.intervalJoin(
      li, o, "l_orderkey", "o_orderkey", "l_shipdate", "o_orderdate",
      lower = "60 days", upper = "0 seconds")
    val tmp = java.nio.file.Files.createTempDirectory("j1stream").toString
    // fewer state partitions for this bounded run: the join state is
    // 4 stores per partition, and 32 partitions of store setup/commit
    // dominate a fixture-sized micro-batch (the partition count is baked
    // into the checkpoint at first start, so this stays self-contained)
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      joined.writeStream
        .format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    ordered(
      s.read.parquet(s"$tmp/out")
        .select(col("o_orderkey"), col("l_linenumber"),
          stamp(col("l_shipdate")).as("ship_time"), col("l_extendedprice")),
      "o_orderkey", "l_linenumber")
  }

  /** J3: multi-hop dimension enrichment — the 6 sequential async dim
    * lookups of OrderWideApp.java:112-225 re-expressed as broadcast hash
    * joins (dims are small; broadcast IS the cache, so the Redis layer
    * disappears). Revenue per region/nation, TPC-H Q5-shaped. */
  def j3DimEnrich(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val o  = orders(s, d).select("o_orderkey", "o_custkey")
    val c  = customer(s, d).select("c_custkey", "c_nationkey")
    val su = supplier(s, d).select("s_suppkey", "s_nationkey")
    val n  = nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val r  = region(s, d).select("r_regionkey", "r_name")
    ordered(
      li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        // same-nation constraint keeps the query selective (Q5 semantics)
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items")),
      "r_name", "n_name")
  }

  /** Q3: TPC-H Q3 shape (shipping priority) — the classic "filters on
    * BOTH fact sides + dim filter + high-cardinality group + top-k"
    * plan. Both date predicates and the segment filter push into the
    * parquet scans; the segment-filtered customer list broadcasts; the
    * orderkey-grained aggregate shuffles only surviving rows; and the
    * final top-10 renders as TakeOrderedAndProject — per-partition
    * top-k then a k-row merge, never a full sort of the aggregate
    * (the same reason w8 uses TopKAgg). Revenue through the exact
    * decimal(18,4) accumulator (2-dec × 2-dec products are exact
    * 4-dec values). */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1998-06-01").cast("timestamp")
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = orders(s, d).filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = lineitem(s, d).filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .select(col("l_orderkey"), stamp(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q10: TPC-H Q10 shape (returned-item customer ranking) — revenue
    * lost to returns per customer: returnflag filter pushed to the
    * lineitem scan, customer/nation broadcast, customer-grained
    * aggregate, top-20 via TakeOrderedAndProject. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = orders(s, d).select("o_orderkey", "o_custkey")
    val c = customer(s, d).select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = nation(s, d).select("n_nationkey", "n_name")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q5: TPC-H Q5 shape (local supplier volume) — the six-table join
    * chain with the CORRELATED dim condition (customer and supplier in
    * the SAME nation) that makes Q5 the canonical join-order test.
    * Plan: the ONLY fact-sized exchange is lineitem ⋈ filtered orders
    * on the order key; supplier, customer, and the region-pruned
    * nation list all broadcast (nation ⋈ region folds to a literal-in
    * dim at plan time), and the locality predicate
    * c_nationkey = s_nationkey applies as a join condition on the
    * broadcast side — never a second shuffle. Revenue accumulates in
    * exact decimal; the output is |nations in region| rows. */
  def q5LocalSupplierVolume(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d).join(region(s, d),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select("n_nationkey", "n_name")
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val c = customer(s, d).select("c_custkey", "c_nationkey")
    val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
    ordered(
      lineitem(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items")),
      "n_name")
  }

  /** Q7: TPC-H Q7 shape (volume shipping between two nations) — the
    * dim-ROLE self-join test: nation joins twice under different roles
    * (supplier's nation, customer's nation) with the symmetric OR pair
    * predicate. Both roles pre-filter to the two nations of interest
    * BEFORE joining — supplier and customer prune at their broadcast
    * joins, and only the cross pairs survive the post-join OR — so the
    * fact side again pays exactly one exchange (lineitem ⋈ orders on
    * the order key); everything else is broadcast. Yearly decimal
    * revenue per direction. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val (na, nb) = ("NATION_2", "NATION_7")
    val n1 = nation(s, d).filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = nation(s, d).filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val li = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    ordered(
      li.join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
          (col("supp_nation") === nb && col("cust_nation") === na))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items")),
      "supp_nation", "cust_nation", "l_year")
  }

  /** Q17: TPC-H Q17 shape (small-quantity-order revenue) — the classic
    * CORRELATED SCALAR SUBQUERY ("lineitems below 20% of this part's
    * average quantity") decorrelated by hand: the per-part average
    * renders as a whole-partition window over the one hash(l_partkey)
    * shuffle — no self-join, no second fact scan — and the threshold
    * compares in EXACT INTEGER space (qty < 0.2·sum/ct ⟺ 5·qty·ct <
    * sum; quantities are integer-valued), so no float-rounding
    * borderline can ever flip a row cross-engine. The type-filtered
    * part dim broadcasts ahead of the window, pruning the shuffle to
    * surviving parts; the final brand aggregate is dim-bounded. The
    * aggregate+shuffle-join rendering is the documented alternative
    * when the window's in-partition sort is the bottleneck. */
  def q17SmallQuantity(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).filter(col("p_type") === "ECONOMY")
      .select("p_partkey", "p_brand")
    val li = lineitem(s, d).select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    ordered(
      li.withColumn("__sq", sum(col("l_quantity").cast("long")).over(w))
        .withColumn("__ct", count(lit(1)).over(w))
        .filter(col("l_quantity").cast("long") * 5 * col("__ct") < col("__sq"))
        .groupBy(col("p_brand"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_items")),
      "p_brand")
  }

  /** Q21: TPC-H Q21 shape (suppliers who kept orders waiting) — the
    * classic EXISTS / NOT-EXISTS double-correlated subquery pair,
    * decorrelated by hand: "another supplier on the same order" and "no
    * OTHER late supplier on the same order" both reduce to per-order
    * supplier counts (nsupp > 1 ∧ nlate = 1 ∧ this supplier late), so
    * the whole predicate pair is ONE aggregate over distinct
    * (order, supplier) plus a per-order window — no second or third
    * fact scan, no anti-join. Late = shipped >60 days after the order
    * date (the fixture carries no receipt/commit dates). Plan: filtered
    * orders ⋈ lineitem (one key shuffle), distinct-supplier aggregate
    * riding the same key, a window over the already-small per-order
    * supplier table, then a supplier-grained count with the name dim
    * broadcast and top-20 via TakeOrderedAndProject — at 100 TB the
    * only fact-sized exchange is the first join's. */
  def q21WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val perSupp = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS")).cast("long")).as("late"))
    val w = Window.partitionBy(col("l_orderkey"))
    val waiting = perSupp
      .withColumn("nsupp", count(lit(1)).over(w))
      .withColumn("nlate", sum(col("late")).over(w))
      .filter(col("late") === 1 && col("nsupp") > 1 && col("nlate") === 1)
    val sup = supplier(s, d).select("s_suppkey", "s_name")
    waiting.groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q18: TPC-H Q18 shape (large-volume orders) — the IN-subquery over
    * an aggregate (`o_orderkey IN (SELECT l_orderkey ... HAVING
    * sum(qty) > T)`) decorrelated into a single per-order aggregate
    * that serves BOTH the predicate and the output column: lineitem is
    * scanned ONCE, grouped by order (one key shuffle), the HAVING
    * filter rides the aggregate, and orders/customer join the
    * already-small qualifying set (customer broadcast). Top-100 via
    * TakeOrderedAndProject — no global sort. Threshold 262 ≈ the
    * fixture's p99 per-order quantity. */
  /** TPC-H Q13 shape ("customer distribution"): the histogram of how many
    * customers placed 0, 1, 2, … qualifying orders. The defining subtlety
    * is that the order predicate belongs to the OUTER join — pushed into a
    * WHERE it would delete exactly the zero-order customers the histogram
    * exists to count. Spark-first plan: aggregate orders FIRST (one
    * shuffle on o_custkey, map-side combined), LEFT-join customers to the
    * customer-sized count table (never to raw orders — the join carries
    * one row per customer, not one per order), then the histogram is a
    * second tiny aggregate over c_count. Ties in custdist are broken by
    * the unique c_count key, so the output order is total. */
  def q13CustomerDistribution(s: SparkSession, d: String): DataFrame = {
    val cnt = orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("__n"))
    customer(s, d).select(col("c_custkey"))
      .join(cnt, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("__n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val qty = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 262)
    val o = orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = customer(s, d).select("c_custkey", "c_name")
    qty.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        stamp(col("o_orderdate")).as("o_date"), col("o_totalprice"),
        col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_date"), col("o_orderkey"))
      .limit(100)
  }

  /** J14: the NATIVE as-of join — `Joins.asofJoinNative`
    * (`plans/AsofJoinExec`: custom LogicalPlan + planner strategy +
    * physical two-pointer merge over co-clustered sorted children) on
    * the IDENTICAL query shape and oracle as `j7_asof_join`, so the
    * whole-operator plan is held to the exact same hash as the
    * composed union+window rendering. */
  def j14AsofNative(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    ordered(
      graft.operators.Joins.asofJoinNative(purchases, clicks, "user_id",
        "ts", rightPrefix = "c_", tieBreak = Some("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"),
          col("c_event_id").as("click_id"),
          unix_micros(col("c_ts")).as("c_us"),
          (unix_micros(col("ts")) - unix_micros(col("c_ts"))).as("gap_us")),
      "event_id")
  }

  /** J13: referential-integrity audit over the schema's four declared
    * FK relationships (`TableStats.fkAudit`): per relation, fact rows
    * and distinct keys pointing at a nonexistent dimension row, and
    * the integer-ppm coverage. Each relation is one dim-key-distinct
    * left join + one aggregate; the four one-row results union. */
  def j13FkAudit(s: SparkSession, d: String): DataFrame = {
    import graft.operators.TableStats.fkAudit
    ordered(
      fkAudit(orders(s, d), "o_custkey", customer(s, d), "c_custkey",
          "orders.o_custkey->customer")
        .unionByName(fkAudit(lineitem(s, d), "l_orderkey", orders(s, d),
          "o_orderkey", "lineitem.l_orderkey->orders"))
        .unionByName(fkAudit(lineitem(s, d), "l_partkey", part(s, d),
          "p_partkey", "lineitem.l_partkey->part"))
        .unionByName(fkAudit(lineitem(s, d), "l_suppkey", supplier(s, d),
          "s_suppkey", "lineitem.l_suppkey->supplier")),
      "relation")
  }

  /** D2: incremental aggregate maintenance — the per-customer order
    * cube maintained as snapshot + delta instead of full recompute
    * (`operators/Incremental`): the history (orders before 1999)
    * collapses to mergeable partial state, the "new day" (1999+) is
    * aggregated alone, and the published cube is the MERGE of the two
    * partial tables. The oracle computes the one-shot aggregate over
    * everything — the gate is the merge law itself, hash-exact in
    * integer cents, avg derived at read time (sum div cnt — the
    * don't-merge-averages pitfall pinned). */
  def d2Incremental(s: SparkSession, d: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val o = orders(s, d).select(col("o_custkey"), col("o_orderdate"),
      cents.as("__cents"))
    val cut = "1999-01-01"
    // the split must be EXHAUSTIVE: a NULL date satisfies neither
    // comparison, so '< cut' / '>= cut' would silently drop null-dated
    // rows from both partials while the one-shot oracle counts them —
    // nulls route to the delta explicitly
    val hist = graft.operators.Incremental.partialAggregate(
      o.filter(col("o_orderdate") < lit(cut)), "o_custkey", col("__cents"))
    val delta = graft.operators.Incremental.partialAggregate(
      o.filter(col("o_orderdate").isNull || col("o_orderdate") >= lit(cut)),
      "o_custkey", col("__cents"))
    ordered(
      graft.operators.Incremental.mergePartials("o_custkey", hist, delta)
        .withColumn("avg_cents", expr("sum_cents div cnt")),
      "o_custkey")
  }

  /** D1: SCD2 dimension history from the event stream — each user's
    * event_type run-length-collapsed into [valid_from, valid_to)
    * versions (`operators/Dimensions.scd2FromChangelog`); the full
    * type-2 table whose LATEST face is what `sources.Sinks.dimUpsert`
    * serves to stream enrichment. */
  def d1Scd2(s: SparkSession, d: String): DataFrame = {
    ordered(
      graft.operators.Dimensions.scd2FromChangelog(
        events(s, d), "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("event_type"),
          stamp(col("valid_from")).as("valid_from"),
          stamp(col("valid_to")).as("valid_to"),
          col("is_current"), col("version")),
      "user_id", "version")
  }

  /** D1-stream: SCD2 version maintenance through the ACTUAL streaming
    * engine — the events changelog as two time-range micro-batches plus
    * two watermark sentinels, `streaming.Scd2Stream.closedVersions`
    * (fMGWS: in-horizon buffering, watermark-sealed run collapse,
    * event-time drain timers), append sink. A version only CLOSES when
    * its successor is sealed, so the stream face emits exactly the
    * batch operator's non-current rows — the oracle is the same
    * gaps-and-islands rendering as d1_scd2 restricted to runs with a
    * successor, in epoch-ms terms (the machine's basis). Batch 0 rides
    * with watermark 0, so its changes buffer in-horizon and drain on
    * the batch-1 timer — the late-data reorder path runs for real, not
    * just in the spec. */
  def d1Scd2Stream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val st = StreamGate.eventsFileStream(s, d,
      sentinels = 2, oneFilePerTrigger = true, splitParts = 2)
    val changes = st.select(
        col("user_id").as("key"),
        unix_millis(col("ts")).as("ms"),
        col("event_id").as("tie"),
        col("event_type").as("value")).as[graft.streaming.Scd2Stream.Change]
    ordered(
      StreamGate.runToSink(s,
        graft.streaming.Scd2Stream.closedVersions(changes).toDF)
        .filter(col("key") =!= -1L)
        .select(col("key").as("user_id"),
          col("value").as("event_type"),
          stamp(timestamp_millis(col("validFromMs"))).as("valid_from"),
          stamp(timestamp_millis(col("validToMs"))).as("valid_to"),
          col("version")),
      "user_id", "version")
  }

  /** J4-stream: time-bounded LEFT OUTER stream-stream join with
    * retention through the ACTUAL streaming engine (the reference's
    * SQL-join-with-retention face, TestFlinkSQLJoin.java rendered as a
    * watermarked outer join): views ⋈ clicks on user within
    * [view_ts, view_ts + 2 h]. Null-padded rows for unmatched views are
    * only emitted once the watermark closes their bound, so the gate
    * runs two sentinel batches (the first lifts the watermark past the
    * corpus, the second triggers the eviction batch) — the read-back
    * then equals the batch LEFT JOIN row-for-row and shares its DuckDB
    * oracle. Sentinels flow THROUGH the join (they advance both sides'
    * watermarks even though the type filter is pushed below the
    * watermark node) and are dropped on read-back by user_id. */
  def j4OuterStream(s: SparkSession, d: String): DataFrame = {
    // ONE canonicalized stream source feeds both join sides (a streaming
    // self-join): the corpus is copied and min/max-scanned once, not per
    // side — each branch still gets its own watermark column
    val st = StreamGate.eventsFileStream(s, d, sentinels = 2, oneFilePerTrigger = true)
    val vs = st
      .filter(col("event_type").isin("view", "__sentinel"))
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "0 seconds")
    val cs = st
      .filter(col("event_type").isin("click", "__sentinel"))
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "0 seconds")
    val joined = vs.join(cs,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 2 HOURS"),
      "left_outer")
    ordered(
      StreamGate.runToSink(s, joined.select(
          col("view_id"), col("user_id"),
          unix_micros(col("v_ts")).as("view_us"),
          col("click_id"), unix_micros(col("c_ts")).as("click_us")))
        .filter(col("user_id") =!= -1L),
      "view_id", "click_id")
  }

  /** J12: point-in-time dimension enrichment — the D1 SCD2 history
    * probed by the J7 as-of join: every event gets the dimension
    * version valid AT its timestamp (same-ts version supersessions
    * resolve to the max version via the tie-break, i.e. zero-length
    * intervals never win). The composition every event-sourced
    * warehouse runs: CDC → type-2 history → as-of enrichment; and a
    * built-in self-consistency law — the version valid at an event's
    * own timestamp carries that event's value — which the spec checks
    * corpus-wide.
    *
    * Round 10: enrichment rides the NATIVE whole-operator as-of join
    * (`Joins.asofJoinNative` → `plans/AsofJoinExec`) — the production
    * shape it was built for (backward, tie-break, no tolerance): a
    * two-pointer streaming merge instead of the union+window rendering,
    * no union materialization, and zero exchanges once event/dim tables
    * are bucketed on user_id. Identical oracle to the window form
    * (j14's parity gate pins the two renderings row-equal). */
  def j12DimAsof(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select("event_id", "user_id", "ts")
    val dim = graft.operators.Dimensions.scd2FromChangelog(
        events(s, d), "user_id", "ts", "event_id", "event_type")
      .select(col("user_id"), col("valid_from").as("ts"),
        col("event_type").as("dim_value"), col("version"))
    ordered(
      graft.operators.Joins.asofJoinNative(ev, dim, "user_id", "ts",
        rightPrefix = "d_", tieBreak = Some("version"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("e_us"),
          col("d_dim_value").as("dim_value"), col("d_version").as("version")),
      "event_id")
  }

  /** J2: the PaymentWide interval join (PaymentWideApp.java:69-76) —
    * asymmetric inclusive bounds [leftTime - 15min, leftTime], i.e. the
    * payment must land within a window BEFORE/AT the order event (the
    * reference's literal is -15 ms, an upstream bug documented in
    * SURVEY.md §7.4.3; we use the intended shape). Rendered here as
    * lineitems shipped within [o_orderdate - 5 days, o_orderdate]. */
  def j2PaymentWide(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice")
    val li = lineitem(s, d).select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
    ordered(
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 5 DAYS") &&
          col("l_shipdate") <= col("o_orderdate"))
        .select(col("o_orderkey"), col("l_linenumber"),
          stamp(col("l_shipdate")).as("payment_time"),
          stamp(col("o_orderdate")).as("order_time"),
          col("l_extendedprice"), col("o_totalprice")),
      "o_orderkey", "l_linenumber")
  }

  /** A4 via the declarative SQL path — the reference's only Flink-SQL
    * pipelines (KeywordStatsApp/ProvinceStatsSqlApp) go DDL → sqlQuery →
    * sink; here: temp view → spark.sql, planned by Catalyst exactly like
    * the DataFrame form (same oracle as a4_keyword_stats). */
  def a4KeywordStatsSql(s: SparkSession, d: String): DataFrame = {
    documents(s, d).createOrReplaceTempView("documents_v")
    s.sql(
      """SELECT keyword, source, COUNT(*) AS ct
        |FROM (
        |  SELECT source, explode(split(lower(text), '[^a-z0-9]+')) AS keyword
        |  FROM documents_v)
        |WHERE keyword <> ''
        |GROUP BY keyword, source
        |ORDER BY keyword, source""".stripMargin)
  }

  /** Semi/anti joins (EXISTS / NOT EXISTS) — not used by the reference
    * (SURVEY.md §2.3 note) but part of any complete relational surface;
    * Catalyst plans them as LeftSemi/LeftAnti without materializing the
    * probe side. */
  def j6SemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select("c_custkey", "c_mktsegment")
    val o = orders(s, d).select("o_custkey")
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"), lit("active").as("status"))
    val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"), lit("dormant").as("status"))
    ordered(withOrders.unionByName(withoutOrders), "c_custkey")
  }

  /** J7: AS-OF join — last-touch attribution: each purchase event joined
    * to the same user's most recent click at-or-before it (inclusive),
    * the generalization of the reference's "dim state at event time"
    * lookups to a fully time-versioned right side. Planned by
    * `operators.Joins.asofJoin` as one union + one keyed window — a
    * theta-join `c.ts <= p.ts` would go BroadcastNestedLoop and melt at
    * scale. Timestamps emitted as epoch micros (the loader's floored-ns
    * resolution; no same-microsecond same-user collisions exist in any
    * SF, checked, so ns-vs-us comparison order is identical). */
  def j7AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    ordered(
      graft.operators.Joins.asofJoin(purchases, clicks, "user_id", "ts",
        rightPrefix = "c_", tieBreak = Some("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"),
          col("c_event_id").as("click_id"),
          unix_micros(col("c_ts")).as("c_us"),
          (unix_micros(col("ts")) - unix_micros(col("c_ts"))).as("gap_us")),
      "event_id")
  }

  /** J7-forward: the mirror attribution — each click joined to the same
    * user's NEXT purchase at-or-after it (conversion lookahead), via
    * `asofJoin(direction = "forward")`: the identical one-shuffle plan
    * with the time ordering flipped. */
  def j7AsofFwd(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    ordered(
      graft.operators.Joins.asofJoin(clicks, purchases, "user_id", "ts",
        rightPrefix = "p_", tieBreak = Some("event_id"), direction = "forward")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("c_us"),
          col("p_event_id").as("purchase_id"),
          unix_micros(col("p_ts")).as("p_us"),
          (unix_micros(col("p_ts")) - unix_micros(col("ts"))).as("gap_us")),
      "event_id")
  }

  /** J7-tolerance: J7's attribution bounded to a 10-minute lookback —
    * pandas-merge_asof `tolerance` semantics: a most-recent click
    * farther back than the bound attaches as all-null, atomically. */
  def j7AsofTol(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    ordered(
      graft.operators.Joins.asofJoin(purchases, clicks, "user_id", "ts",
        rightPrefix = "c_", tieBreak = Some("event_id"),
        tolerance = Some(expr("INTERVAL 10 MINUTES")))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"),
          col("c_event_id").as("click_id"),
          unix_micros(col("c_ts")).as("c_us"),
          (unix_micros(col("ts")) - unix_micros(col("c_ts"))).as("gap_us")),
      "event_id")
  }

  /** J7-nearest: each purchase joined to the temporally CLOSEST click
    * either side (merge_asof direction='nearest'; equal distance
    * prefers the backward match). Signed gap keeps the direction
    * visible. */
  def j7AsofNear(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    ordered(
      graft.operators.Joins.asofJoinNearest(purchases, clicks, "user_id", "ts",
        leftId = "event_id", rightPrefix = "c_", tieBreak = Some("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"),
          col("c_event_id").as("click_id"),
          unix_micros(col("c_ts")).as("c_us"),
          (unix_micros(col("ts")) - unix_micros(col("c_ts"))).as("gap_us")),
      "event_id")
  }

  /** J7-stream: the SAME as-of attribution through
    * `streaming.AsofStream.asofJoinStream`'s code path, run in batch mode
    * (no watermark ⇒ every left row seals immediately) — so the
    * watermark-correct streaming operator is proven against the identical
    * DuckDB ASOF oracle as j7, the way the ST gates prove their state
    * machines. Event time travels as raw epoch-micros through the typed
    * state machine (the operator treats time as an opaque Long in batch).
    * Tuples: (event_id, user_id, us). */
  def j7AsofStream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long, Long)]
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long, Long)]
    val joined = graft.streaming.AsofStream.asofJoinStream(
      purchases, clicks,
      (l: (Long, Long, Long)) => (l._2, l._3),
      (r: (Long, Long, Long)) => (r._2, r._3),
      tieBreak = (r: (Long, Long, Long)) => r._1)
    ordered(
      joined.toDF().select(
        col("left._1").as("event_id"), col("key").as("user_id"),
        col("ts").as("p_us"), col("right._1").as("click_id"),
        col("right._3").as("c_us"),
        (col("ts") - col("right._3")).as("gap_us")),
      "event_id")
  }

  /** J8: value-range (band) join — each order priced into overlapping
    * bands derived from the nation dim (band n covers cents
    * [n·300000, n·300000 + 700000): stride < width, so a price can land
    * in up to 3 bands — a genuine many-to-many range join, not a
    * bucketing). Planned by `operators.Joins.rangeJoinBinned`: ranges
    * explode to covering 100k-cent bins, facts equi-join on bin, exact
    * predicate re-filters — the shape that survives when the range side
    * outgrows broadcast. Cents (integer) keep the predicate bit-exact
    * cross-engine. */
  def j8RangeJoin(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("cents", (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
    val bands = nation(s, d).select(col("n_nationkey"), col("n_name"))
      .withColumn("lo", col("n_nationkey").cast("long") * 300000L)
      .withColumn("hi", col("n_nationkey").cast("long") * 300000L + 700000L)
    ordered(
      graft.operators.Joins.rangeJoinBinned(o, bands, "cents", "lo", "hi", 100000L)
        .select(col("o_orderkey"), col("n_name").as("band"), col("o_totalprice")),
      "o_orderkey", "band")
  }

  /** J9: skew-salted join — events enriched with their type's average
    * value. `event_type` has FIVE distinct values, so a plain shuffle
    * join caps at five reducer tasks no matter the cluster size — the
    * canonical skew shape `operators.Joins.saltedJoin` exists for: the
    * probe side salts to (type, salt∈[0,16)), the five-row dim
    * replicates ×16, and the shuffle fans out to 80 uniformly-loaded
    * partitions. Result rows are EXACTLY the plain join's (spec-proved
    * row-level); the gate aggregates them back down so the oracle output
    * stays small. */
  def j9SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val dim = ev.groupBy(col("event_type"))
      .agg(decAvg(col("value")).as("type_avg"))
    ordered(
      graft.operators.Joins.saltedJoin(ev, dim, Seq("event_type"), buckets = 16)
        .groupBy(col("event_type"), col("type_avg"))
        .agg(count(lit(1)).as("ct"), decSum(col("value")).as("val_sum")),
      "event_type")
  }

  /** J11: range-OVERLAP join — orders as price intervals
    * [cents, cents+10000): every pair of orders whose intervals overlap
    * (k1 < k2 halves the symmetric pairs). Both sides are ranges, so
    * this is `operators.Joins.rangeOverlapJoin`: bins on both sides,
    * one equi-join, each pair emitted exactly once via the
    * first-shared-bin predicate — no distinct, no nested loop. */
  def j11OverlapJoin(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .withColumn("cents", (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
    val a = o.select(col("o_orderkey").as("k1"), col("cents").as("lo1"),
      (col("cents") + 10000L).as("hi1"))
    val b = o.select(col("o_orderkey").as("k2"), col("cents").as("lo2"),
      (col("cents") + 10000L).as("hi2"))
    ordered(
      graft.operators.Joins.rangeOverlapJoin(a, b, "lo1", "hi1", "lo2", "hi2", 10000L)
        .filter(col("k1") < col("k2"))
        .select(col("k1"), col("k2")),
      "k1", "k2")
  }

  /** J10: bloom-pruned semi join — lineitems of high-value orders. The
    * build key set (orders > 400k) compresses into a Bloom filter that
    * drops ~98% of non-matching lineitems BEFORE the semi-join's
    * shuffle (`operators.BloomPrune`); the final semi-join re-checks
    * exactly, so the result is bit-identical to the plain semi join
    * (spec-proved row-level, plan-proved filter placement). */
  def j10BloomSemi(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_orderkey"), col("l_returnflag"))
    val hot = orders(s, d).filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"))
    ordered(
      // expectedItems sized to the build side (high-value orders are a
      // few % of the table at any SF here): the filter's bit array is
      // ITS OWN partial-buffer size, so an oversized default ships
      // megabytes per partition through the one-row aggregate
      graft.operators.BloomPrune.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey",
        expectedItems = 65536L)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("ct")),
      "l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j10_bloom_semi"   -> (j10BloomSemi _),
    "j11_overlap_join" -> (j11OverlapJoin _),
    "j9_salted_join"   -> (j9SaltedJoin _),
    "j6_semi_anti"     -> (j6SemiAnti _),
    "j7_asof_join"     -> (j7AsofJoin _),
    "j7_asof_fwd"      -> (j7AsofFwd _),
    "j7_asof_tol"      -> (j7AsofTol _),
    "j7_asof_near"     -> (j7AsofNear _),
    "j7_asof_stream"   -> (j7AsofStream _),
    "j8_range_join"    -> (j8RangeJoin _),
    "q1_agg"           -> (q1Agg _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q17_small_quantity"   -> (q17SmallQuantity _),
    "q5_local_supplier"    -> (q5LocalSupplierVolume _),
    "q7_volume_shipping"   -> (q7VolumeShipping _),
    "q18_large_orders"     -> (q18LargeOrders _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q21_waiting_suppliers" -> (q21WaitingSuppliers _),
    "d1_scd2"              -> (d1Scd2 _),
    "d2_incremental"       -> (d2Incremental _),
    "j13_fk_audit"         -> (j13FkAudit _),
    "j14_asof_native"      -> (j14AsofNative _),
    "d1_scd2_stream"       -> (d1Scd2Stream _),
    "j12_dim_asof"         -> (j12DimAsof _),
    "q10_returned_items"   -> (q10ReturnedItems _),
    "s1_scan"          -> (s1Scan _),
    "p3_derive"        -> (p3Derive _),
    "p4_filter"        -> (p4Filter _),
    "j1_interval_join" -> (j1IntervalJoin _),
    "j1_interval_stream" -> (j1IntervalStream _),
    "j4_outer_stream"   -> (j4OuterStream _),
    "j2_payment_wide"  -> (j2PaymentWide _),
    "j3_dim_enrich"    -> (j3DimEnrich _),
    "a4_keyword_stats_sql" -> (a4KeywordStatsSql _))

  /** Shared by j7_asof_join and j7_asof_stream — one semantics, two
    * engine code paths (windowed union vs typed state machine). */
  private val asofOracle =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us,
      |       c.event_id AS click_id, epoch_us(c.ts) AS c_us,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "j7_asof_fwd" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |     p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS c_us,
        |       p.event_id AS purchase_id, epoch_us(p.ts) AS p_us,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "j7_asof_tol" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |     j AS (SELECT p.event_id, p.user_id, p.ts AS pts, c.event_id AS cid, c.ts AS cts,
        |             CASE WHEN p.ts - c.ts <= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS keep
        |           FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT event_id, user_id, epoch_us(pts) AS p_us,
        |       CASE WHEN keep = 1 THEN cid END AS click_id,
        |       CASE WHEN keep = 1 THEN epoch_us(cts) END AS c_us,
        |       CASE WHEN keep = 1 THEN epoch_us(pts) - epoch_us(cts) END AS gap_us
        |FROM j ORDER BY event_id""".stripMargin,
    "j7_asof_near" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |     b AS (SELECT p.event_id, c.event_id AS cid, c.ts AS cts
        |           FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
        |     f AS (SELECT p.event_id, c.event_id AS cid, c.ts AS cts
        |           FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us,
        |  CASE WHEN f.cid IS NULL OR (b.cid IS NOT NULL AND p.ts - b.cts <= f.cts - p.ts)
        |       THEN b.cid ELSE f.cid END AS click_id,
        |  CASE WHEN f.cid IS NULL OR (b.cid IS NOT NULL AND p.ts - b.cts <= f.cts - p.ts)
        |       THEN epoch_us(b.cts) ELSE epoch_us(f.cts) END AS c_us,
        |  CASE WHEN f.cid IS NULL OR (b.cid IS NOT NULL AND p.ts - b.cts <= f.cts - p.ts)
        |       THEN epoch_us(p.ts) - epoch_us(b.cts)
        |       ELSE epoch_us(p.ts) - epoch_us(f.cts) END AS gap_us
        |FROM p JOIN b ON p.event_id = b.event_id JOIN f ON p.event_id = f.event_id
        |ORDER BY p.event_id""".stripMargin,
    "j11_overlap_join" ->
      """WITH o AS (SELECT o_orderkey AS k, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS lo,
        |             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) + 10000 AS hi FROM orders)
        |SELECT a.k AS k1, b.k AS k2
        |FROM o a JOIN o b ON a.lo < b.hi AND b.lo < a.hi AND a.k < b.k
        |ORDER BY k1, k2""".stripMargin,
    "j10_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS ct FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j9_salted_join" ->
      """WITH d AS (SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS type_avg
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, d.type_avg, count(*) AS ct,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events e JOIN d ON e.event_type = d.event_type
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "j7_asof_join" -> asofOracle,
    "j14_asof_native" -> asofOracle,
    "j7_asof_stream" -> asofOracle,
    "j8_range_join" ->
      """SELECT o_orderkey, n_name AS band, o_totalprice
        |FROM orders JOIN nation
        |  ON CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >= CAST(n_nationkey AS BIGINT) * 300000
        | AND CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) < CAST(n_nationkey AS BIGINT) * 300000 + 700000
        |ORDER BY o_orderkey, band""".stripMargin,
    "j6_semi_anti" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |       THEN 'active' ELSE 'dormant' END AS status
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "j12_dim_asof" ->
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER w AS pv, row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT user_id, event_type, ts, event_id FROM s
        |      WHERE rn = 1 OR pv IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_type AS dim_value, ts AS vf,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS BIGINT) AS version
        |  FROM c)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS e_us,
        |  v.dim_value, v.version
        |FROM events e LEFT JOIN v
        |  ON e.user_id = v.user_id AND v.vf <= e.ts
        |QUALIFY row_number() OVER (PARTITION BY e.event_id
        |  ORDER BY v.vf DESC, v.version DESC) = 1
        |ORDER BY e.event_id""".stripMargin,
    "j13_fk_audit" -> {
      def one(factTbl: String, factKey: String, dimTbl: String,
              dimKey: String, rel: String) =
        s"""SELECT '$rel' AS relation,
           |  COUNT(*) AS fact_rows,
           |  COUNT(CASE WHEN d.__hit IS NULL THEN 1 END) AS orphan_rows,
           |  COUNT(DISTINCT f.$factKey) AS distinct_keys,
           |  COUNT(DISTINCT CASE WHEN d.__hit IS NULL THEN f.$factKey END)
           |    AS orphan_keys,
           |  CASE WHEN COUNT(*) > 0 THEN
           |    (COUNT(*) - COUNT(CASE WHEN d.__hit IS NULL THEN 1 END))
           |      * 1000000 // COUNT(*)
           |  ELSE 1000000 END AS coverage_ppm
           |FROM $factTbl f LEFT JOIN
           |  (SELECT DISTINCT $dimKey AS k, 1 AS __hit FROM $dimTbl) d
           |  ON f.$factKey = d.k""".stripMargin
      Seq(
        one("orders", "o_custkey", "customer", "c_custkey",
          "orders.o_custkey->customer"),
        one("lineitem", "l_orderkey", "orders", "o_orderkey",
          "lineitem.l_orderkey->orders"),
        one("lineitem", "l_partkey", "part", "p_partkey",
          "lineitem.l_partkey->part"),
        one("lineitem", "l_suppkey", "supplier", "s_suppkey",
          "lineitem.l_suppkey->supplier"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
    },
    "d2_incremental" ->
      """WITH c AS (SELECT o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, COUNT(*) AS cnt,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  MIN(cents) AS min_cents, MAX(cents) AS max_cents,
        |  CAST(SUM(cents) AS BIGINT) // COUNT(*) AS avg_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "d1_scd2" ->
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER w AS pv, row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT user_id, event_type, ts, event_id FROM s
        |      WHERE rn = 1 OR pv IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_type, ts AS vf,
        |  lead(ts) OVER w2 AS vt,
        |  CAST(row_number() OVER w2 AS BIGINT) AS version
        |  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  vt IS NULL AS is_current, version
        |FROM v ORDER BY user_id, version""".stripMargin,
    // stream face: same gaps-and-islands rendering in epoch-ms terms
    // (the machine's basis), restricted to CLOSED versions — a version
    // only seals once its successor does, so the open (current) run per
    // key lives in state, not the sink
    "d1_scd2_stream" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
        |           FROM events),
        |s AS (SELECT user_id, event_type, ms, event_id,
        |  lag(event_type) OVER w AS pv, row_number() OVER w AS rn
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |c AS (SELECT user_id, event_type, ms, event_id FROM s
        |      WHERE rn = 1 OR pv IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_type, ms AS vf,
        |  lead(ms) OVER w2 AS vt,
        |  CAST(row_number() OVER w2 AS BIGINT) AS version
        |  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ms, event_id))
        |SELECT user_id, event_type,
        |  strftime(make_timestamp(vf * 1000), '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(make_timestamp(vt * 1000), '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  version
        |FROM v WHERE vt IS NOT NULL ORDER BY user_id, version""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_customer_distribution" ->
      """WITH cnt AS (SELECT o_custkey, COUNT(*) AS n FROM orders
        |            WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
        |SELECT CAST(coalesce(n, 0) AS BIGINT) AS c_count,
        |       CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM customer LEFT JOIN cnt ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q18_large_orders" ->
      """WITH q AS (SELECT l_orderkey,
        |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |           FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 262)
        |SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date,
        |       o_totalprice, total_qty
        |FROM q JOIN orders ON l_orderkey = o_orderkey
        |       JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_date, o_orderkey
        |LIMIT 100""".stripMargin,
    "q17_small_quantity" ->
      """WITH p AS (SELECT p_partkey, p_brand FROM part WHERE p_type = 'ECONOMY'),
        |li AS (SELECT l_partkey, l_quantity, l_extendedprice, p_brand
        |       FROM lineitem JOIN p ON p_partkey = l_partkey),
        |st AS (SELECT *,
        |  SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS sq,
        |  COUNT(*) OVER (PARTITION BY l_partkey) AS ct FROM li)
        |SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_items
        |FROM st WHERE CAST(l_quantity AS BIGINT) * 5 * ct < sq
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH l AS (
        |  SELECT l_orderkey, l_suppkey,
        |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |w AS (SELECT *,
        |  COUNT(*) OVER (PARTITION BY l_orderkey) AS nsupp,
        |  SUM(late) OVER (PARTITION BY l_orderkey) AS nlate FROM l)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM w JOIN supplier ON l_suppkey = s_suppkey
        |WHERE late = 1 AND nsupp > 1 AND nlate = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "s1_scan" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_extendedprice > 9000.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p3_derive" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS create_time,
        |  strftime(o_orderdate, '%Y-%m-%d') AS create_date,
        |  CAST(hour(o_orderdate) AS BIGINT) AS create_hour,
        |  CAST(epoch_ms(o_orderdate) AS BIGINT) AS create_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p4_filter" ->
      """SELECT event_id, event_type, user_id FROM events
        |WHERE event_type <> 'error' ORDER BY event_id""".stripMargin,
    "j2_payment_wide" ->
      """SELECT o_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS payment_time,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_time,
        |  l_extendedprice, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate - INTERVAL 5 DAY
        |  AND l_shipdate <= o_orderdate
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    "a4_keyword_stats_sql" ->
      """WITH toks AS (
        |  SELECT source, unnest(str_split_regex(lower(text), '[^a-z0-9]+')) AS keyword
        |  FROM documents)
        |SELECT keyword, source, COUNT(*) AS ct FROM toks
        |WHERE keyword <> '' GROUP BY keyword, source
        |ORDER BY keyword, source""".stripMargin,
    "j1_interval_join" ->
      """SELECT o_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_time, l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    "j1_interval_stream" ->
      """SELECT o_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_time, l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    "j4_outer_stream" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts AS v_ts FROM events
        |           WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts FROM events
        |      WHERE event_type = 'click')
        |SELECT view_id, user_id, epoch_us(v_ts) AS view_us,
        |       click_id, epoch_us(c_ts) AS click_us
        |FROM v LEFT JOIN c ON user_id = c_user
        |  AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 2 HOUR
        |ORDER BY view_id, click_id NULLS FIRST""".stripMargin,
    "j3_dim_enrich" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin)
}
