package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.AsofStream._

/** Top-level so Spark can derive product encoders (inner classes of a
  * suite have an outer pointer encoders refuse). */
case class AsofSpecL(key: Long, ts: Long, tag: String)
case class AsofSpecR(key: Long, ts: Long, v: Long)

/** Streaming as-of join: watermark-gated sealing, late right rows inside
  * the horizon, right-buffer pruning, and agreement with the batch
  * operator over the same data.
  */
class AsofStreamSpec extends SparkSpec {
  private type L = AsofSpecL
  private type R = AsofSpecR
  private val L = AsofSpecL
  private val R = AsofSpecR

  private def run(batches: Seq[(Seq[L], Seq[R])], delay: String = "10 seconds",
                  name: String = s"asof${System.nanoTime()}")
      : Seq[(Long, Long, String, Option[Long], Option[Long])] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val lm = MemoryStream[L]
    val rm = MemoryStream[R]
    val q = asofJoinStream[L, R](lm.toDS(), rm.toDS(),
        l => (l.key, l.ts), r => (r.key, r.ts), watermarkDelay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { case (ls, rs) =>
        if (ls.nonEmpty) lm.addData(ls: _*)
        if (rs.nonEmpty) rm.addData(rs: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[AsofJoined[L, R]].collect().toSeq
        .map(j => (j.key, j.ts, j.left.tag, j.right.map(_.ts), j.right.map(_.v)))
    } finally q.stop()
  }

  test("left rows seal only once the watermark passes; late in-horizon rights still match") {
    // batch 1: left at t=20s, right at t=10s — left must NOT emit yet
    //   (watermark is still behind 20s; a better right could arrive)
    // batch 2: LATE right at t=15s (inside the 10s delay relative to max
    //   event 20s → watermark 10s) + advancing right at t=60s
    // batch 3: watermark mover — now the left at 20s seals and must pick
    //   the late t=15s right, not the t=10s one it saw first
    val out = run(Seq(
      (Seq(L(1L, 20_000L, "a")), Seq(R(1L, 10_000L, 100L))),
      (Seq.empty, Seq(R(1L, 15_000L, 150L), R(1L, 60_000L, 600L))),
      (Seq.empty, Seq(R(1L, 120_000L, 999L)))))
    assert(out == Seq((1L, 20_000L, "a", Some(15_000L), Some(150L))),
      s"late right must win: $out")
  }

  test("no matching right yields None; equal-ts right is inclusive; versions don't leak across keys") {
    val out = run(Seq(
      (Seq(L(1L, 30_000L, "x"), L(2L, 30_000L, "y"), L(3L, 25_000L, "z")),
        Seq(R(1L, 30_000L, 1L), R(2L, 29_000L, 2L))),
      (Seq.empty, Seq(R(9L, 200_000L, 0L))),   // watermark mover, other key
      (Seq.empty, Seq(R(9L, 400_000L, 0L))))).sortBy(t => (t._1, t._2))
    assert(out == Seq(
      (1L, 30_000L, "x", Some(30_000L), Some(1L)),   // ts == left ts: inclusive
      (2L, 30_000L, "y", Some(29_000L), Some(2L)),
      (3L, 25_000L, "z", None, None)), s"unexpected: $out")
  }

  test("pruned 'current version' survives: a left far after quiet rights still matches") {
    // right seals at t=10s, watermark sweeps far past it (pruning the
    // buffer down to the single current version), THEN a left arrives
    val out = run(Seq(
      (Seq.empty, Seq(R(1L, 10_000L, 7L), R(1L, 5_000L, 3L))),
      (Seq.empty, Seq(R(2L, 500_000L, 0L))),          // watermark mover
      (Seq(L(1L, 600_000L, "late-reader")), Seq(R(2L, 900_000L, 0L))),
      (Seq.empty, Seq(R(2L, 2_000_000L, 0L)))))
    val mine = out.filter(_._1 == 1L)
    assert(mine == Seq((1L, 600_000L, "late-reader", Some(10_000L), Some(7L))),
      s"current-version retention broken: $mine")
  }

  test("stream equals batch asofJoin on in-horizon event data (sf0.001)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) / 1000L).cast("long").as("ms"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val purchases = side("purchase")
    val clicks = side("click")
    // interleave both sides in event-time order across 4 micro-batches,
    // with a horizon wide enough that nothing is dropped as too-late
    val all = (purchases.map(p => (p._3, Left(p))) ++ clicks.map(c => (c._3, Right(c))))
      .sortBy(_._1).map(_._2)
    val chunks = all.grouped(math.max(1, all.length / 4 + 1)).toSeq
    val lm = MemoryStream[(Long, Long, Long)]
    val rm = MemoryStream[(Long, Long, Long)]
    val q = asofJoinStream(lm.toDS(), rm.toDS(),
        (l: (Long, Long, Long)) => (l._2, l._3),
        (r: (Long, Long, Long)) => (r._2, r._3),
        watermarkDelay = "365 days",
        tieBreak = (r: (Long, Long, Long)) => r._1)
      .writeStream.format("memory").queryName("asofpar")
      .outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c =>
        val ls = c.collect { case Left(l) => l }
        val rs = c.collect { case Right(r) => r }
        if (ls.nonEmpty) lm.addData(ls.toSeq: _*)
        if (rs.nonEmpty) rm.addData(rs.toSeq: _*)
        q.processAllAvailable()
      }
      // horizon is wider than the fixture span: nothing sealed yet — a
      // final watermark mover on the right side flushes every left
      val maxMs = all.map { case Left(l) => l._3; case Right(r) => r._3 }.max
      rm.addData((-1L, -1L, maxMs + 400L * 24 * 3600 * 1000))
      q.processAllAvailable()
      val streamed = spark.table("asofpar").as[AsofJoined[(Long, Long, Long), (Long, Long, Long)]]
        .collect()
        .map(j => (j.left._1, j.key, j.ts, j.right.map(_._1), j.right.map(_._3)))
        .toSet
      val batch = graft.operators.Joins.asofJoin(
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"),
              (unix_micros(col("ts")) / 1000L).cast("long").as("ts")),
          ev.filter(col("event_type") === "click")
            .select(col("user_id"),
              (unix_micros(col("ts")) / 1000L).cast("long").as("ts"), col("event_id")),
          "user_id", "ts", rightPrefix = "c_", tieBreak = Some("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"), col("c_event_id"), col("c_ts"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))
        .toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream/batch divergence: only-stream=${(streamed -- batch).take(3)} " +
          s"only-batch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }
}
