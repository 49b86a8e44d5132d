package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Tables._
import graft.util.Det._

/** Stream-plumbing parity: JSON parse / dirty split, config-driven routing
  * with dynamic column allow-lists, multi-source normalization + union
  * (SURVEY.md §2.2 P1/P2/P6-P8, §2.5 ST4, §2.7 U1-U3, §2.8 F5/F8).
  */
object Plumbing {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** P1+P2: strict JSON parse with dirty-data split (BaseLogApp.java:45-58).
    * from_json yields null on malformed input — the null side is the dirty
    * stream (side-output analog; see graft.streaming.FanOut for the
    * multi-sink rendering). This query returns the clean main stream. */
  def p2DirtySplit(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val parsed = e.withColumn("parsed", from_json(col("props"), propsSchema))
    // dirty side: parsed.isNull — routed to a quarantine sink in streaming
    ordered(
      parsed.filter(col("parsed").isNotNull && col("parsed.k").isNotNull)
        .select(col("event_id"), col("parsed.k").as("k")),
      "event_id")
  }

  /** ST4+P6: broadcast config-driven routing with per-table column
    * allow-list (BaseDbApp.java:70-92, TableProcessFunction.java:124-166).
    * The config table (source type → sink table/type + allowed columns) is
    * tiny and broadcast; the allow-list projection is map_filter on a
    * MapType column; the kept entries are exploded to rows for exact
    * comparison. */
  def st4ConfigRouting(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val config = Seq(
      ("click",    "dwd_click_log",    "kafka", Seq("user_id", "k")),
      ("view",     "dwd_view_log",     "kafka", Seq("user_id")),
      ("purchase", "dim_purchase",     "hbase", Seq("user_id", "k", "event_type")),
      ("signup",   "dim_signup",       "hbase", Seq("user_id", "event_type"))
      // "error" absent from config → dropped, like unconfigured CDC tables
    ).toDF("src_type", "sink_table", "sink_type", "allow_cols")
    val e = events(s, d)
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .withColumn("data", map(
        lit("user_id"), col("user_id").cast("string"),
        lit("event_type"), col("event_type"),
        // '' (not NULL) for absent k: DuckDB regexp_extract returns ''
        // on no-match, and the oracle mirrors that
        lit("k"), coalesce(col("k").cast("string"), lit(""))))
    val routed = e.join(broadcast(config), col("event_type") === col("src_type"))
      .withColumn("kept", map_filter(col("data"),
        (key, _) => array_contains(col("allow_cols"), key)))
    ordered(
      routed.select(col("event_id"), col("sink_table"), col("sink_type"),
          explode(col("kept")).as(Seq("col_name", "col_value"))),
      "event_id", "col_name")
  }

  /** P7+P8+U1: per-source normalization to a sparse common schema then
    * n-way union + rollup (ProductStatsApp.java:78-230's 7-way union of
    * sparse ProductStats rows). Each event type becomes a sparse
    * measure-row; the union is aggregated per user. */
  def p8UnionNormalize(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select("user_id", "event_type", "value")
    def sparse(t: String, measure: String): DataFrame = {
      val base = e.filter(col("event_type") === t)
      val cols = Seq("click_ct", "view_ct", "purchase_ct", "signup_ct", "error_ct")
        .map(c => (if (c == measure) lit(1L) else lit(0L)).as(c)) ++
        Seq((if (t == "purchase") col("value") else lit(0.0)).as("amount"))
      base.select(col("user_id") +: cols: _*)
    }
    val unioned = Seq(
      sparse("click", "click_ct"), sparse("view", "view_ct"),
      sparse("purchase", "purchase_ct"), sparse("signup", "signup_ct"),
      sparse("error", "error_ct")).reduce(_ unionByName _)
    ordered(
      unioned.groupBy(col("user_id"))
        .agg(sum(col("click_ct")).as("click_ct"), sum(col("view_ct")).as("view_ct"),
          sum(col("purchase_ct")).as("purchase_ct"), sum(col("signup_ct")).as("signup_ct"),
          sum(col("error_ct")).as("error_ct"), decSum(col("amount")).as("purchase_amount")),
      "user_id")
  }

  /** F5: age-from-date computation with injected "now" (2024-01-01; the
    * reference uses wall-clock System.currentTimeMillis, OrderWideApp
    * .java:129-137 — parameterized here for determinism). */
  def f5Age(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    ordered(
      o.select(col("o_orderkey"),
        floor(datediff(lit("2024-01-01").cast("date"), to_date(col("o_orderdate"))) / 365.0)
          .cast("long").as("age_years")),
      "o_orderkey")
  }

  /** P11: schema-on-read via Spark 4 VARIANT — the same props
    * extraction as `p2_dirty_split`, but through `parse_json` +
    * `variant_get` instead of a declared StructType: the modern face
    * for payloads whose schema drifts (new keys appear without a
    * schema migration; `try_parse_json` nulls the dirty side exactly
    * like from_json). Same oracle semantics as the typed parse, so the
    * two faces can never diverge. */
  def p11VariantProps(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .withColumn("v", try_parse_json(col("props")))
      .withColumn("k", variant_get(col("v"), "$.k", "bigint"))
    ordered(
      e.filter(col("k").isNotNull).select(col("event_id"), col("k")),
      "event_id")
  }

  /** F8: UPPER_UNDERSCORE → lowerCamel column rename helper
    * (JdbcUtil.java:66-69). */
  def f8Rename(s: SparkSession, d: String): DataFrame = {
    def toCamel(name: String): String = {
      val parts = name.toLowerCase(java.util.Locale.ROOT).split("_")
      (parts.head +: parts.tail.map(_.capitalize)).mkString
    }
    val r = region(s, d) // r_regionkey -> rRegionkey, r_name -> rName
    ordered(r.toDF(r.columns.toIndexedSeq.map(toCamel): _*), "rRegionkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p2_dirty_split"     -> (p2DirtySplit _),
    "p11_variant_props"  -> (p11VariantProps _),
    "st4_config_routing" -> (st4ConfigRouting _),
    "p8_union_normalize" -> (p8UnionNormalize _),
    "f5_age"             -> (f5Age _),
    "f8_rename"          -> (f8Rename _))

  val oracle: Map[String, String] = Map(
    "p2_dirty_split" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events WHERE regexp_extract(props, '"k": ([0-9]+)', 1) <> ''
        |ORDER BY event_id""".stripMargin,
    "p11_variant_props" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events WHERE regexp_extract(props, '"k": ([0-9]+)', 1) <> ''
        |ORDER BY event_id""".stripMargin,
    "st4_config_routing" ->
      """WITH config(src_type, sink_table, sink_type, allow_cols) AS (VALUES
        |    ('click',    'dwd_click_log', 'kafka', ['user_id','k']),
        |    ('view',     'dwd_view_log',  'kafka', ['user_id']),
        |    ('purchase', 'dim_purchase',  'hbase', ['user_id','k','event_type']),
        |    ('signup',   'dim_signup',    'hbase', ['user_id','event_type'])),
        |  fields(col_name) AS (VALUES ('user_id'), ('event_type'), ('k')),
        |  e AS (SELECT event_id, event_type,
        |          CAST(user_id AS VARCHAR) AS user_id_s,
        |          CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS VARCHAR) AS k_s
        |        FROM events)
        |SELECT event_id, sink_table, sink_type, col_name,
        |  CASE col_name WHEN 'user_id' THEN user_id_s
        |                WHEN 'event_type' THEN event_type
        |                ELSE k_s END AS col_value
        |FROM e
        |JOIN config ON event_type = src_type
        |CROSS JOIN fields
        |WHERE list_contains(allow_cols, col_name)
        |ORDER BY event_id, col_name""".stripMargin,
    "p8_union_normalize" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_ct,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_ct,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_ct,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_ct,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS purchase_amount
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "f5_age" ->
      """SELECT o_orderkey,
        |  CAST(floor(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-01-01') / 365.0) AS BIGINT) AS age_years
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f8_rename" ->
      """SELECT r_regionkey AS rRegionkey, r_name AS rName
        |FROM region ORDER BY rRegionkey""".stripMargin)
}
