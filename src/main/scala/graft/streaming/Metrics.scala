package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Engine observability for the streaming surface: a
  * `StreamingQueryListener` that accumulates, per micro-batch, the
  * health numbers an operator watches in production — input volume,
  * keyed-state size, watermark progression, and the LATE-DATA DROP
  * count (`numRowsDroppedByWatermark`), which is the one signal that
  * distinguishes "pipeline is healthy" from "pipeline is silently
  * discarding your events because the watermark outran a skewed
  * source".
  *
  * Listener callbacks arrive on the streams-listener bus thread, so
  * the buffer is synchronized; `snapshot` hands back an immutable
  * copy. Register per query-run via `collect(spark){ ... }`, which
  * detaches the listener afterwards (a leaked listener would keep
  * accumulating every later query's batches — the same leak class the
  * round-7 cache finding was about). */
object Metrics {

  /** One micro-batch's health row. `stateRows`/`droppedByWatermark`
    * sum over the query's stateful operators; `watermark` is the
    * engine's event-time watermark after the batch (epoch-ms, 0 when
    * the query has no event-time axis yet). */
  final case class BatchHealth(
      batchId: Long,
      inputRows: Long,
      stateRows: Long,
      droppedByWatermark: Long,
      watermarkMs: Long)

  final class Collector extends StreamingQueryListener {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[BatchHealth]

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryIdle(e: QueryIdleEvent): Unit = ()

    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val wm = Option(p.eventTime.get("watermark"))
        .map(ts => java.time.Instant.parse(ts).toEpochMilli).getOrElse(0L)
      val row = BatchHealth(
        p.batchId,
        p.numInputRows,
        p.stateOperators.map(_.numRowsTotal).sum,
        p.stateOperators.map(_.numRowsDroppedByWatermark).sum,
        wm)
      buf.synchronized { buf += row }
    }

    def snapshot: Seq[BatchHealth] = buf.synchronized { buf.toVector }

    /** Totals across all observed batches — the numbers a health check
      * alerts on. */
    def totals: (Long, Long) = {
      val s = snapshot
      (s.map(_.inputRows).sum, s.map(_.droppedByWatermark).sum)
    }
  }

  /** Run `body` with a fresh collector registered, detach it after
    * (even on failure), and return (body result, collector). The
    * listener bus is asynchronous — call `spark.streams
    * .awaitAnyTermination`/`processAllAvailable` inside `body` before
    * relying on the snapshot, and note Spark delivers progress events
    * shortly after each batch commits. */
  def collect[A](spark: SparkSession)(body: => A): (A, Collector) = {
    val c = new Collector
    spark.streams.addListener(c)
    try {
      val a = body
      (a, c)
    } finally spark.streams.removeListener(c)
  }

  /** Progress events are posted asynchronously on the listener bus —
    * poll until at least `n` batches (with any input) have landed, or
    * time out. Returns the snapshot either way. */
  def awaitBatches(c: Collector, n: Int,
                   timeoutMs: Long = 10000L): Seq[BatchHealth] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var s = c.snapshot
    while (s.count(_.inputRows > 0) < n && System.nanoTime() < deadline) {
      Thread.sleep(50)
      s = c.snapshot
    }
    s
  }
}
