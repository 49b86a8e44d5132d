package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.util.Det._

/** DWS-layer windowed aggregations (SURVEY.md §2.4 A1-A5, §2.6 W1).
  *
  * All are event-time tumbling windows over `events` / `orders` like the
  * reference's 10s TUMBLE jobs (ProductStatsApp/VisitorStatsApp/
  * KeywordStatsApp/ProvinceStatsSqlApp). Batch rendering here (the
  * correctness gate is batch); the streaming rendering with watermarks is
  * graft.streaming.StatsStreams, spec-tested to agree with these.
  *
  * Scale notes: every query is a single hash-aggregate after a scan —
  * partial aggregation map-side, one shuffle on the (bounded) group key.
  * Exact distinct counts use collect_set (reference's HashSet-in-reduce,
  * ProductStatsApp.java:274-283) — bounded by window × key cardinality; at
  * 100 TB swap for approx_count_distinct (documented per query).
  */
object Stats {

  /** A1: ProductStats analog — 10s tumbling event-time window per
    * event_type: row count, exact decimal amount sum, exact distinct-user
    * count (set semantics), stt/edt window stamps
    * (ProductStatsApp.java:243-284). */
  def a1ProductStats(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    ordered(
      e.groupBy(window(col("ts"), "10 seconds"), col("event_type"))
        .agg(
          count(lit(1)).as("ct"),
          decSum(col("value")).as("amount"),
          setCount(col("user_id")).as("user_ct"))
        .select(
          stamp(col("window.start")).as("stt"),
          stamp(col("window.end")).as("edt"),
          col("event_type"), col("ct"), col("amount"), col("user_ct")),
      "stt", "event_type")
  }

  /** A2: VisitorStats analog — daily window × event_type with derived
    * session-entry flag (sv=1 iff no prior event within 30 min, the
    * last_page_id-is-null analog, VisitorStatsApp.java:92-104). Uses a
    * lag() window partitioned by user (one extra shuffle on user_id before
    * the agg shuffle — at scale both keyed by bounded cardinality). */
  def a2VisitorStats(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = e.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("sv",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
          .otherwise(0L))
    ordered(
      flagged
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("pv_ct"),
          setCount(col("user_id")).as("uv_ct"),
          sum(col("sv")).as("sv_ct"),
          decSum(col("value")).as("dur_sum"))
        .select(stamp(col("day")).as("stt"), col("event_type"),
          col("pv_ct"), col("uv_ct"), col("sv_ct"), col("dur_sum")),
      "stt", "event_type")
  }

  /** A3: ProvinceStats analog — nation plays province: monthly window,
    * exact amount sum + exact distinct order count across lineitems
    * (ProvinceStatsSqlApp.java:50-68's sum + count(distinct)). Dim side
    * (customer⋈nation) is broadcast. */
  def a3ProvinceStats(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select("l_orderkey", "l_extendedprice")
    val o = orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
    val c = customer(s, d).select("c_custkey", "c_nationkey")
    val n = nation(s, d).select("n_nationkey", "n_name")
    ordered(
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"), col("n_name"))
        .agg(
          decSum(col("l_extendedprice")).as("order_amount"),
          setCount(col("l_orderkey")).as("order_count"))
        .select(stamp(col("month")).as("stt"), col("n_name").as("province_name"),
          col("order_amount"), col("order_count")),
      "stt", "province_name")
  }

  /** A4+F1: KeywordStats analog — tokenizer UDTF as split+explode
    * (KeywordStatsApp.java:46-59, SplitFunction.java). Word count per
    * (keyword, source). Generator-based variant: graft.functions.Tokenize. */
  def a4KeywordStats(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    ordered(
      docs.select(col("source"),
          explode(split(lower(col("text")), "[^a-z0-9]+")).as("keyword"))
        .filter(col("keyword") =!= "")
        .groupBy(col("keyword"), col("source"))
        .agg(count(lit(1)).as("ct")),
      "keyword", "source")
  }

  /** A5: exact distinct-via-set accumulation per key
    * (ProductStats orderIdSet, bean/ProductStats.java:74-83). */
  def a5DistinctSets(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    ordered(
      e.groupBy(col("event_type"))
        .agg(
          setCount(col("user_id")).as("uv_ct"),
          count(lit(1)).as("pv_ct")),
      "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_product_stats"  -> (a1ProductStats _),
    "a2_visitor_stats"  -> (a2VisitorStats _),
    "a3_province_stats" -> (a3ProvinceStats _),
    "a4_keyword_stats"  -> (a4KeywordStats _),
    "a5_distinct_sets"  -> (a5DistinctSets _))

  val oracle: Map[String, String] = Map(
    "a1_product_stats" ->
      """SELECT strftime(make_timestamp(epoch_us(ts) // 10000000 * 10000000), '%Y-%m-%d %H:%M:%S') AS stt,
        |  strftime(make_timestamp(epoch_us(ts) // 10000000 * 10000000 + 10000000), '%Y-%m-%d %H:%M:%S') AS edt,
        |  event_type, COUNT(*) AS ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount,
        |  COUNT(DISTINCT user_id) AS user_ct
        |FROM events GROUP BY 1, 2, 3 ORDER BY stt, event_type""".stripMargin,
    "a2_visitor_stats" ->
      """WITH flagged AS (
        |  SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR epoch_us(ts)//1000000 - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))//1000000 > 1800
        |      THEN 1 ELSE 0 END AS sv
        |  FROM events)
        |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS stt,
        |  event_type, COUNT(*) AS pv_ct, COUNT(DISTINCT user_id) AS uv_ct,
        |  CAST(SUM(sv) AS BIGINT) AS sv_ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
        |FROM flagged GROUP BY 1, 2 ORDER BY stt, event_type""".stripMargin,
    "a3_province_stats" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS stt,
        |  n_name AS province_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
        |  COUNT(DISTINCT l_orderkey) AS order_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY stt, province_name""".stripMargin,
    "a4_keyword_stats" ->
      """WITH toks AS (
        |  SELECT source, unnest(str_split_regex(lower(text), '[^a-z0-9]+')) AS keyword
        |  FROM documents)
        |SELECT keyword, source, COUNT(*) AS ct FROM toks
        |WHERE keyword <> '' GROUP BY keyword, source
        |ORDER BY keyword, source""".stripMargin,
    "a5_distinct_sets" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS uv_ct, COUNT(*) AS pv_ct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
