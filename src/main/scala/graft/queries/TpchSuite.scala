package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** The remaining TPC-H query shapes (Q2, Q4, Q6, Q8, Q9, Q11, Q12, Q14,
  * Q15, Q16, Q19, Q20, Q22), completing the 22-query suite alongside
  * Relational.scala's Q1/Q3/Q5/Q7/Q10/Q13/Q17/Q18/Q21.
  *
  * The driver's fixture is TPC-H-ish but carries no `partsupp` table and
  * no commit/receipt dates, so the queries that reference them are
  * ADAPTED while preserving the query's defining *shape* (the plan
  * pattern a 100 TB engine must get right):
  *  - the supply relation (Q2/Q16/Q20) is the distinct (l_partkey,
  *    l_suppkey) pairs observed in lineitem; `s_acctbal` stands in for
  *    `ps_supplycost` in Q2's correlated-min;
  *  - "late" (Q4) is shipped >30 days after the order date (no
  *    commit/receipt dates in the fixture), as in Q21;
  *  - Q12's ship-mode split becomes a ship-DELAY split (FAST ≤30 days /
  *    SLOW), keeping the two-way CASE-count pivot over a fact-fact join.
  *
  * Every float boundary that could flip a row cross-engine is kept
  * exact: thresholds are cross-multiplied into decimal/integer space
  * (Q11 `500·val > total`, Q22 `bal·ct > sum`), and money aggregates go
  * through the DECIMAL(18,4) accumulator (util.Det convention).
  */
object TpchSuite {

  private def revenue: Column =
    sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")).cast("double")

  /** Q2 shape (minimum-cost supplier): the correlated scalar MIN
    * subquery ("the supplier whose cost equals the minimum for this
    * part") decorrelated into a per-part window MIN over the pruned
    * supply relation. Both dims are filtered FIRST and broadcast, so
    * the fact scan is pruned map-side before the only fact-sized
    * exchange (the distinct over surviving supply pairs); the MIN
    * window rides a supply-pair-sized shuffle, never the fact. Top-100
    * via TakeOrderedAndProject. */
  def q2MinCostSupp(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    val p = part(s, d).filter(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select("p_partkey", "p_brand")
    val supply = lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select("l_partkey", "l_suppkey", "s_acctbal", "s_name", "n_name", "p_brand")
      .distinct()
    val w = Window.partitionBy(col("l_partkey"))
    supply.withColumn("__mn", min(col("s_acctbal")).over(w))
      .filter(col("s_acctbal") === col("__mn"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q4 shape (order priority checking): the EXISTS correlated
    * subquery. The quarter-filtered orders are a small fraction of the
    * table (the date filter is pushed to the scan), so instead of a
    * shuffle semi-join the orders side BROADCASTS under the fact and
    * existence renders as "group the matches by order, then count
    * orders" — lineitem is scanned once with zero fact-sized
    * exchanges (the per-order group is match-sized). */
  def q4PriorityCount(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    lineitem(s, d).select("l_orderkey", "l_shipdate")
      .join(broadcast(o), col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderkey"), col("o_orderpriority")).agg(count(lit(1)))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q6 shape (forecasting revenue change): pure scan→filter→global
    * aggregate. All three predicates push to the parquet reader
    * (PushedFilters), the projection prunes to three columns, and the
    * single-row result needs no data shuffle at all — partial sums
    * merge in the one-row final aggregate. The 100 TB ideal: cost =
    * one pruned columnar scan. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n"))

  /** Q8 shape (national market share): the share of one supplier
    * nation in a region's order volume, by year. Five dims all
    * broadcast (region-filtered customer path and the supplier→nation
    * name path), so the only fact-sized exchange is the lineitem ⋈
    * orders key shuffle; the year grid is bounded, and the share
    * division happens once per year on the exact decimal sums. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val o = orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    val sup = supplier(s, d)
      .join(broadcast(nation(s, d).select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")
    lineitem(s, d)
      .join(broadcast(part(s, d).filter(col("p_type") === "PROMO")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_5", vol)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("nat_vol"),
        sum(vol).cast("double").as("tot_vol"))
      .withColumn("mkt_share", col("nat_vol") / col("tot_vol"))
      .orderBy(col("o_year"))
  }

  /** Q9 shape (product-type profit): profit by supplier nation and
    * year over a name-filtered part set. `ps_supplycost` is absent, so
    * cost is rendered as `p_retailprice · l_quantity · 0.1` — the
    * expression tree (and its left-associative evaluation order)
    * matches the oracle token-for-token so the decimal cast sees the
    * identical double in both engines. Part/supplier/nation broadcast;
    * the lineitem ⋈ orders key shuffle is the single fact exchange;
    * the (nation, year) grid is bounded. */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).filter(col("p_name").like("%red%"))
      .select("p_partkey", "p_retailprice")
    val sup = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val profit = (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("p_retailprice") * col("l_quantity") * lit(0.1)).cast("decimal(18,4)")
    lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(profit).cast("double").as("profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** Q11 shape (important stock identification): per-part value for a
    * supplier nation group, kept where the part's value exceeds a
    * FRACTION OF THE GLOBAL TOTAL — the scalar-subquery-in-HAVING
    * pattern. The global total is the one-row aggregate of the
    * per-part table itself, broadcast back over it (no driver action,
    * no second fact scan); the threshold compares in exact decimal via
    * cross-multiplication (500·val > total ⟺ val > 0.2% of total), so
    * no float boundary exists. One fact shuffle (the part grouping). */
  def q11ImportantParts(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
      .select("s_suppkey")
    val v = lineitem(s, d)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * col("l_quantity"))
        .cast("decimal(18,4)")).as("val"))
    v.join(broadcast(v.agg(sum(col("val")).as("__tot"))))
      .filter(col("val") * 500 > col("__tot"))
      .select(col("l_partkey"), col("val").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q12 shape (shipping modes / critical priority): the two-way
    * CASE-count pivot over a fact-fact join. The fixture has no
    * l_shipmode, so the split key is ship DELAY (FAST ≤30 days, SLOW
    * otherwise) — same plan: date-filtered lineitem ⋈ orders on the
    * order key (the one fact exchange), then a bounded two-row
    * conditional-count aggregate. */
  def q12ShipClass(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_shipdate")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "FAST").otherwise("SLOW").as("ship_class"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  /** Q14 shape (promotion effect): conditional share of revenue in a
    * month — scan-side date pruning, the 2k-row part dim broadcast,
    * one single-row aggregate holding BOTH conditional decimal sums,
    * and one double division at the end (identical operand order in
    * the oracle). Zero fact-sized exchanges. */
  def q14PromoEffect(s: SparkSession, d: String): DataFrame = {
    val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .join(broadcast(part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("promo_rev"),
        sum(vol).cast("double").as("total_rev"))
      .withColumn("promo_pct", col("promo_rev") / col("total_rev") * 100)
  }

  /** Q15 shape (top supplier): the revenue "view" plus the
    * `total_revenue = (SELECT MAX(...))` scalar subquery. The view is
    * one quarter-filtered supplier aggregate (single fact shuffle on
    * l_suppkey); the max is its one-row aggregate broadcast back —
    * copy-equality on the double is exact, the tie surfaces every
    * argmax supplier exactly as the spec requires. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(revenue.as("total_rev"))
    rev.join(broadcast(rev.agg(max(col("total_rev")).as("__mx"))))
      .filter(col("total_rev") === col("__mx"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16 shape (parts/supplier relationship): distinct-supplier counts
    * per part attribute triple, with a NOT-IN supplier exclusion. The
    * supply relation is pruned by the broadcast part filter BEFORE its
    * distinct (the one fact exchange); the exclusion list ("suppliers
    * with complaints" → negative balance) is dim-sized and renders as
    * a broadcast LEFT ANTI join — never a shuffle; the final
    * COUNT(DISTINCT) rides the attribute-triple grid. */
  def q16SupplierCount(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val bad = supplier(s, d).filter(col("s_acctbal") < 0.0).select("s_suppkey")
    lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q19 shape (discounted revenue, disjunctive predicates): the
    * OR-of-ANDs over part attributes × lineitem ranges. The part side
    * broadcasts with only the attribute columns; the disjunction lives
    * in the JOIN CONDITION (not post-filter), so non-matching rows die
    * in the map-side hash probe and the whole query is one pruned scan
    * + a single-row aggregate — no shuffle. */
  def q19DisjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select("p_partkey", "p_brand", "p_size")
    val q = col("l_quantity")
    val cond = col("l_partkey") === col("p_partkey") && (
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && q.between(1.0, 11.0)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && q.between(10.0, 20.0)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && q.between(20.0, 30.0)))
    lineitem(s, d).join(broadcast(p), cond)
      .agg(revenue.as("revenue"), count(lit(1)).as("n"))
  }

  /** Q20 shape (potential part promotion): the nested-IN with a
    * correlated half-sum — "suppliers whose supplied quantity exceeds
    * half the part's total". Decorrelated: one (part, supplier)
    * aggregate over the year+name-pruned fact (the only fact
    * exchange), the per-part total as a window over that already-small
    * table, the dominance predicate in exact integer space (2·qty >
    * total), then a distinct-supplier projection against the broadcast
    * nation-filtered supplier dim. */
  def q20DominantSupplier(s: SparkSession, d: String): DataFrame = {
    val red = part(s, d).filter(col("p_name").like("red%")).select("p_partkey")
    val sq = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(red), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val w = Window.partitionBy(col("l_partkey"))
    val sup = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3",
        "NATION_4", "NATION_5"))
      .select("s_suppkey", "s_name", "n_name")
    sq.withColumn("__tqty", sum(col("qty")).over(w))
      .filter(col("qty") * 2 > col("__tqty"))
      .select("l_suppkey").distinct()
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  /** Q22 shape (global sales opportunity): above-average balances with
    * NO recent orders — the scalar AVG subquery plus NOT EXISTS. The
    * average threshold is cross-multiplied into exact decimal space
    * (bal·ct > sum ⟺ bal > avg), so the one float boundary of the
    * original is gone; the one-row (sum, count) aggregate broadcasts
    * over customers, NOT EXISTS renders as a LEFT ANTI join against
    * the date-pruned orders projection (one key shuffle), and the
    * nation grid aggregate is bounded. */
  def q22SalesOpportunity(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val bal = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("__s"),
        count(lit(1)).as("__ct"))
    val rich = c.select("c_custkey", "c_acctbal", "c_nationkey")
      .join(broadcast(bal))
      .filter(col("c_acctbal").cast("decimal(18,2)") * col("__ct") > col("__s"))
    val recent = orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey")
    rich.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supp"     -> (q2MinCostSupp _),
    "q4_priority_count"    -> (q4PriorityCount _),
    "q6_forecast_revenue"  -> (q6ForecastRevenue _),
    "q8_market_share"      -> (q8MarketShare _),
    "q9_product_profit"    -> (q9ProductProfit _),
    "q11_important_parts"  -> (q11ImportantParts _),
    "q12_ship_class"       -> (q12ShipClass _),
    "q14_promo_effect"     -> (q14PromoEffect _),
    "q15_top_supplier"     -> (q15TopSupplier _),
    "q16_supplier_count"   -> (q16SupplierCount _),
    "q19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "q20_dominant_supplier" -> (q20DominantSupplier _),
    "q22_sales_opportunity" -> (q22SalesOpportunity _))

  val oracle: Map[String, String] = Map(
    "q2_min_cost_supp" ->
      """WITH sup AS (SELECT s_suppkey, s_acctbal, s_name, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |p AS (SELECT p_partkey, p_brand FROM part
        |      WHERE p_type = 'LARGE' AND p_size <= 10),
        |supply AS (SELECT DISTINCT l_partkey, l_suppkey, s_acctbal, s_name, n_name, p_brand
        |  FROM lineitem JOIN p ON l_partkey = p_partkey
        |  JOIN sup ON l_suppkey = s_suppkey),
        |m AS (SELECT *, MIN(s_acctbal) OVER (PARTITION BY l_partkey) AS mn FROM supply)
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_brand
        |FROM m WHERE s_acctbal = mn
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q4_priority_count" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |              AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """WITH v AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS vol,
        |         sn.n_name AS supp_nation
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nat_vol,
        |  CAST(SUM(vol) AS DOUBLE) AS tot_vol,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,4))) AS DOUBLE) AS profit
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH v AS (SELECT l_partkey,
        |    SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS val
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1','NATION_2','NATION_3') GROUP BY 1)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS value FROM v
        |WHERE val * 500 > (SELECT SUM(val) FROM v)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_ship_class" ->
      """SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |    THEN 'FAST' ELSE 'SLOW' END AS ship_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_promo_effect" ->
      """SELECT promo_rev, total_rev, promo_rev / total_rev * 100 AS promo_pct FROM (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_rev,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01')""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) supply
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1,4,9,16,25,36,49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_dominant_supplier" ->
      """WITH sq AS (SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND p_name LIKE 'red%'
        |  GROUP BY 1, 2),
        |w AS (SELECT *, SUM(qty) OVER (PARTITION BY l_partkey) AS tqty FROM sq),
        |dom AS (SELECT DISTINCT l_suppkey FROM w WHERE qty * 2 > tqty)
        |SELECT s_name, n_name FROM dom
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
        |ORDER BY s_name""".stripMargin,
    "q22_sales_opportunity" ->
      """WITH bal AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS ct
        |  FROM customer WHERE c_acctbal > 0.0),
        |rich AS (SELECT c_custkey, c_acctbal, c_nationkey FROM customer, bal
        |  WHERE CAST(c_acctbal AS DECIMAL(18,2)) * ct > s),
        |noord AS (SELECT r.* FROM rich r WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = r.c_custkey
        |   AND o_orderdate >= TIMESTAMP '1999-01-01'))
        |SELECT n_name, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM noord JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
