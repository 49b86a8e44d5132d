package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import graft.apps.Apps

/** Streaming soak of the composed DWS apps: ProductStats (7 sources) and
  * VisitorStats (3 sources) under the RocksDB state store, driven for a
  * configurable number of rate-controlled micro-batches with advancing
  * event time, so windows keep closing and state keeps getting evicted
  * past the watermark.
  *
  * Reports events/second AND the state-row trajectory — the soak's real
  * assertion is that state size plateaus (watermark-bounded) instead of
  * growing with input, which is what makes the pipelines run-forever
  * safe on a cluster.
  *
  *   sbt "runMain graft.tools.Soak [numBatches]"   (default 24)
  */
object Soak {

  private def pageLine(mid: String, ts: Long, lastPage: String, item: Long): String = {
    val lp = if (lastPage == null) "null" else s""""$lastPage""""
    s"""{"common":{"mid":"$mid","is_new":"1","vc":"v1","ch":"web","ar":"${mid.hashCode.abs % 30}"},""" +
      s""""page":{"page_id":"good_detail","last_page_id":$lp,"item":"$item","item_type":"sku_id","during_time":5},""" +
      s""""displays":[{"item":"${item + 1}","item_type":"sku_id","order":1}],"ts":$ts}"""
  }

  // UTC formatter, NOT Timestamp.toString: the session timezone is UTC,
  // so a JVM-default-timezone rendering would skew these sources'
  // event times against the page/order/pay streams on non-UTC machines
  // (holding the union's watermark back and distorting the state plateau)
  private val utcFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
  private def fmtUtc(ts: Long): String =
    utcFmt.format(java.time.Instant.ofEpochMilli(ts))

  private def skuJson(sku: Long, ts: Long): String =
    s"""{"sku_id":$sku,"create_time":"${fmtUtc(ts)}"}"""

  private def refundJson(sku: Long, ts: Long): String =
    s"""{"sku_id":$sku,"order_id":${sku * 7},"refund_amount":5.00,"create_time":"${fmtUtc(ts)}"}"""

  private def commentJson(sku: Long, ts: Long): String =
    s"""{"sku_id":$sku,"order_id":${sku * 7},"appraise":"${if (sku % 3 == 0) "1201" else "1202"}","create_time":"${fmtUtc(ts)}"}"""

  private def stateRows(q: StreamingQuery): Long =
    Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val numBatches = args.headOption.map(_.toInt).getOrElse(24)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    implicit val sq = spark.sqlContext
    spark.sparkContext.setLogLevel("ERROR")

    // ---- ProductStats: 7 sources ----------------------------------------
    val page = MemoryStream[String]
    val orderW = MemoryStream[(Timestamp, Long, Double)]
    val payW = MemoryStream[(Timestamp, Long, Double)]
    val cart = MemoryStream[String]
    val favor = MemoryStream[String]
    val refund = MemoryStream[String]
    val comment = MemoryStream[String]
    val qP = Apps.productStats(
        page.toDF().toDF("value"),
        orderW.toDF().toDF("o_et", "sku_id", "split_total_amount"),
        payW.toDF().toDF("p_et", "sku_id", "split_total_amount"),
        cart.toDF().toDF("value"), favor.toDF().toDF("value"),
        refund.toDF().toDF("value"), comment.toDF().toDF("value"))
      .writeStream.format("noop").outputMode(OutputMode.Append).start()

    // rate control: fixed rows per source per 10 s batch window, event
    // time advancing one window per batch so the watermark keeps moving
    val perBatchPage = 2000
    val perBatchSku = 400
    var fedP = 0L
    val stateTrajP = new scala.collection.mutable.ArrayBuffer[Long]
    val tP0 = System.nanoTime()
    for (b <- 0 until numBatches) {
      val t0 = b.toLong * 10000L
      page.addData((0 until perBatchPage).map(i =>
        pageLine(s"m${i % 500}", t0 + i % 10000, if (i % 4 == 0) null else "home", i % 200)))
      orderW.addData((0 until perBatchSku).map(i =>
        (new Timestamp(t0 + i % 10000), (i % 200).toLong, 99.5)))
      payW.addData((0 until perBatchSku).map(i =>
        (new Timestamp(t0 + i % 10000), (i % 200).toLong, 99.5)))
      cart.addData((0 until perBatchSku).map(i => skuJson(i % 200, t0 + i % 10000)))
      favor.addData((0 until perBatchSku).map(i => skuJson(i % 200, t0 + i % 10000)))
      refund.addData((0 until perBatchSku).map(i => refundJson(i % 200, t0 + i % 10000)))
      comment.addData((0 until perBatchSku).map(i => commentJson(i % 200, t0 + i % 10000)))
      fedP += perBatchPage + 6L * perBatchSku
      qP.processAllAvailable()
      stateTrajP += stateRows(qP)
    }
    val secsP = (System.nanoTime() - tP0) / 1e9
    qP.stop()

    // ---- VisitorStats: 3 sources ----------------------------------------
    val pv = MemoryStream[String]
    val uv = MemoryStream[String]
    val uj = MemoryStream[String]
    val qV = Apps.visitorStats(pv.toDF().toDF("value"),
        uv.toDF().toDF("value"), uj.toDF().toDF("value"))
      .writeStream.format("noop").outputMode(OutputMode.Append).start()
    val perBatchV = 1500
    var fedV = 0L
    val stateTrajV = new scala.collection.mutable.ArrayBuffer[Long]
    val tV0 = System.nanoTime()
    for (b <- 0 until numBatches) {
      val t0 = b.toLong * 10000L
      def lines(n: Int) = (0 until n).map(i =>
        pageLine(s"m${i % 300}", t0 + i % 10000, if (i % 3 == 0) null else "home", i % 50))
      pv.addData(lines(perBatchV)); uv.addData(lines(perBatchV / 3)); uj.addData(lines(perBatchV / 5))
      fedV += perBatchV + perBatchV / 3 + perBatchV / 5
      qV.processAllAvailable()
      stateTrajV += stateRows(qV)
    }
    val secsV = (System.nanoTime() - tV0) / 1e9
    qV.stop()

    def traj(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    println(
      s"""{"metric":"dws_soak","batches":$numBatches,"store":"rocksdb",""" +
        s""""product_events":$fedP,"product_eps":${(fedP / secsP).toInt},""" +
        s""""product_state_rows":${traj(stateTrajP.toSeq)},""" +
        s""""visitor_events":$fedV,"visitor_eps":${(fedV / secsV).toInt},""" +
        s""""visitor_state_rows":${traj(stateTrajV.toSeq)}}""")
    spark.stop()
  }
}
