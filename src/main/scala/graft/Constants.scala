package graft

/** F7 — the e-commerce code dictionary
  * (reference common/GmallConstant.java:6-68): order/coupon status codes,
  * appraise grades, and keyword sources used across the stats pipelines.
  */
object Constants {
  // order status
  val OrderStatusUnpaid = "1001"
  val OrderStatusPaid = "1002"
  val OrderStatusCancel = "1003"
  val OrderStatusFinish = "1004"
  val OrderStatusRefund = "1005"
  val OrderStatusRefundDone = "1006"

  // comment appraise
  val AppraiseGood = "1201"
  val AppraiseSoso = "1202"
  val AppraiseBad = "1203"
  val AppraiseAuto = "1204"

  // keyword sources (KeywordStats `source` column)
  val KeywordSearch = "SEARCH"
  val KeywordClick = "CLICK"
  val KeywordCart = "CART"
  val KeywordOrder = "ORDER"
}
