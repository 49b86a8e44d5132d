package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.Scd2Stream._

/** D1's streaming face: sealed closed versions must equal the batch
  * operator's non-current rows; late in-horizon changes reorder
  * correctly; re-emits never fork.
  */
class Scd2StreamSpec extends SparkSpec {

  private def run(batches: Seq[Seq[Change]], delay: String = "10 seconds")
      : Set[(Long, Option[String], Long, Long, Long)] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val name = s"scd2s${System.nanoTime()}"
    val mem = MemoryStream[Change]
    val q = closedVersions(mem.toDS(), delay)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => if (b.nonEmpty) mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[ClosedVersion].collect()
        .map(v => (v.key, v.value, v.validFromMs, v.validToMs, v.version)).toSet
    } finally q.stop()
  }

  test("late in-horizon change lands between two sealed ones; re-emit never forks") {
    val got = run(Seq(
      // a@10s then b@30s arrive; a LATE a-re-emit@20s arrives next batch
      Seq(Change(1L, 10000L, 1L, Some("a")), Change(1L, 30000L, 3L, Some("b"))),
      // the late re-emit must NOT split the a-run; then c@40s closes b
      Seq(Change(1L, 20000L, 2L, Some("a")), Change(1L, 40000L, 4L, Some("c"))),
      // seal everything
      Seq(Change(9L, 999000L, 9L, Some("z")))))
    assert(got == Set(
      (1L, Some("a"), 10000L, 30000L, 1L),
      (1L, Some("b"), 30000L, 40000L, 2L)),
      s"got $got")
  }

  test("stream closed versions equal the batch operator's non-current rows (sf0.001)") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val rows = ev.select(col("user_id"), unix_millis(col("ts")),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map { case (u, ms, tie, v) => Change(u, ms, tie, Some(v)) }
      .sortBy(c => (c.ms, c.tie))
    val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).map(_.toSeq).toSeq
    val maxMs = rows.map(_.ms).max
    val got = run(chunks :+ Seq(Change(999999L, maxMs + 86400000L, 0L, Some("x"))))
      .filter(_._1 != 999999L)
    val batch = graft.operators.Dimensions.scd2FromChangelog(
        ev, "user_id", "ts", "event_id", "event_type")
      .filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("valid_from")), unix_millis(col("valid_to")), col("version"))
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, Option(r._2), r._3, r._4, r._5)).toSet
    assert(got.nonEmpty && got == batch,
      s"stream/batch SCD2 mismatch: ${got.size} vs ${batch.size}; " +
        s"diff=${got.diff(batch).take(3)} / ${batch.diff(got).take(3)}")
  }
}
