package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructTypes for every topic the reference consumes/produces
  * (FIXTURES.md §1-§7) — replaces the reference's untyped JSONObject
  * plumbing with declared schemas so from_json is strict, columns prune,
  * and malformed rows surface as nulls (dirty split).
  */
object Schemas {

  /** ods_base_log behavior log (FIXTURES.md §1; reference
    * BaseLogApp.java:64-133). */
  val behaviorLog: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("mid", StringType),
      StructField("is_new", StringType),
      StructField("vc", StringType),
      StructField("ch", StringType),
      StructField("ar", StringType)))),
    StructField("page", StructType(Seq(
      StructField("page_id", StringType),
      StructField("last_page_id", StringType),
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("during_time", LongType)))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType),
      StructField("loading_time", LongType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("order", LongType))))),
    StructField("ts", LongType)))

  /** ods_base_db CDC envelope (FIXTURES.md §2; reference
    * MyStringDeserializationSchema.java:26-86). */
  val cdcEnvelope: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("tableName", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("before", MapType(StringType, StringType)),
    StructField("type", StringType)))

  /** table_process routing config row (FIXTURES.md §3; reference
    * bean/TableProcess.java:6-25). */
  val tableProcess: StructType = StructType(Seq(
    StructField("sourceTable", StringType),
    StructField("operateType", StringType),
    StructField("sinkType", StringType),
    StructField("sinkTable", StringType),
    StructField("sinkColumns", StringType),
    StructField("sinkPk", StringType),
    StructField("sinkExtend", StringType)))

  /** dwd_order_info (FIXTURES.md §4; reference bean/OrderInfo.java). */
  val orderInfo: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("province_id", LongType),
    StructField("order_status", StringType),
    StructField("user_id", LongType),
    StructField("total_amount", DecimalType(16, 2)),
    StructField("activity_reduce_amount", DecimalType(16, 2)),
    StructField("coupon_reduce_amount", DecimalType(16, 2)),
    StructField("original_total_amount", DecimalType(16, 2)),
    StructField("feight_fee", DecimalType(16, 2)),
    StructField("expire_time", StringType),
    StructField("create_time", StringType),
    StructField("operate_time", StringType)))

  /** dwd_order_detail (reference bean/OrderDetail.java). */
  val orderDetail: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("order_id", LongType),
    StructField("sku_id", LongType),
    StructField("order_price", DecimalType(16, 2)),
    StructField("sku_num", LongType),
    StructField("sku_name", StringType),
    StructField("create_time", StringType),
    StructField("split_total_amount", DecimalType(16, 2)),
    StructField("split_activity_amount", DecimalType(16, 2)),
    StructField("split_coupon_amount", DecimalType(16, 2))))

  /** dwd_cart_info / dwd_favor_info (FIXTURES.md §4). */
  val skuAction: StructType = StructType(Seq(
    StructField("sku_id", LongType),
    StructField("create_time", StringType)))

  /** dwd_order_refund_info (FIXTURES.md §4). */
  val refundInfo: StructType = StructType(Seq(
    StructField("sku_id", LongType),
    StructField("order_id", LongType),
    StructField("refund_amount", DecimalType(16, 2)),
    StructField("create_time", StringType)))

  /** dwd_comment_info (FIXTURES.md §4; appraise "1201" = good). */
  val commentInfo: StructType = StructType(Seq(
    StructField("sku_id", LongType),
    StructField("order_id", LongType),
    StructField("appraise", StringType),
    StructField("create_time", StringType)))

  /** dwd_payment_info (reference bean/PaymentInfo.java). */
  val paymentInfo: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("order_id", LongType),
    StructField("user_id", LongType),
    StructField("total_amount", DecimalType(16, 2)),
    StructField("subject", StringType),
    StructField("payment_type", StringType),
    StructField("create_time", StringType),
    StructField("callback_time", StringType)))
}
