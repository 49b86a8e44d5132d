package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FreqAggSpec extends SparkSpec {
  import FreqAgg.freqSummary

  test("freqSummary is EXACT when capacity covers the key domain, across many partitions") {
    import spark.implicits._
    // zipf-ish: key k appears 1000/k times, 1 <= k <= 50
    val rows = (1 to 50).flatMap(k => Seq.fill(1000 / k)(k.toLong))
    val df = spark.createDataset(scala.util.Random.shuffle(rows)).toDF("k")
      .repartition(16) // force real partial-buffer merges
    val got = df.agg(freqSummary(col("k"), capacity = 64).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.count")).as[(Long, Long)].collect().toMap
    val want = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want, s"exact regime must match groupBy-count: ${got.toSeq.sorted.take(5)}")
  }

  test("freqSummary output is sorted (count DESC, key ASC) through ties") {
    import spark.implicits._
    val rows = Seq(5L, 5L, 3L, 3L, 9L, 9L, 1L) // 5,3,9 tie at 2; 1 has 1
    val out = spark.createDataset(rows).toDF("k")
      .agg(freqSummary(col("k"), 16).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.count")).as[(Long, Long)].collect().toList
    assert(out == List((3L, 2L), (5L, 2L), (9L, 2L), (1L, 1L)), s"order: $out")
  }

  test("under capacity pressure: MG bound holds and true heavy hitters survive") {
    import spark.implicits._
    // one dominant key (40%), 999 rare keys sharing the rest
    val n = 20000
    val rows = Seq.fill(n * 2 / 5)(7777L) ++ (1 to n * 3 / 5).map(i => (i % 999 + 10000).toLong)
    val df = spark.createDataset(scala.util.Random.shuffle(rows)).toDF("k").repartition(8)
    val cap = 100
    val got = df.agg(freqSummary(col("k"), cap).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.count")).as[(Long, Long)].collect().toMap
    val total = rows.size.toLong
    val trueCt = rows.count(_ == 7777L).toLong
    // MG with per-partition buffers then merged: each partial admits at most
    // N_p/(cap+1) undercount, and the merge cut adds its own — the classical
    // mergeable bound stays N/(cap+1) overall
    val bound = total / (cap + 1)
    assert(got.contains(7777L), s"a 40% key must survive capacity $cap")
    val est = got(7777L)
    assert(est <= trueCt && est >= trueCt - bound,
      s"estimate $est outside [${trueCt - bound}, $trueCt]")
    // no reported count may EXCEED its truth (MG never overcounts)
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got.foreach { case (k, c) =>
      assert(c <= truth(k), s"key $k overcounted: $c > ${truth(k)}")
    }
  }

  test("MG summary survives streaming state-store round-trips exactly (capacity > domain)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // update across micro-batches: partial MG buffers serialize into the
    // state store; with capacity above the key domain the counts must be
    // EXACT across batches, proving the buffer round-trips losslessly
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val agg = mem.toDS().toDF("g", "k")
      .groupBy(col("g"))
      .agg(graft.functions.FreqAgg.freqSummary(col("k"), 8).as("hh"))
    val q = agg.writeStream.format("memory").queryName("freqstream")
      .outputMode("complete").start()
    try {
      mem.addData(("A", 1L), ("A", 1L), ("A", 2L)); q.processAllAvailable()
      mem.addData(("A", 1L), ("A", 3L), ("A", 2L)); q.processAllAvailable()
      val got = spark.table("freqstream").selectExpr("explode(hh) AS e")
        .selectExpr("e.key", "e.count").as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L), s"unexpected: $got")
    } finally q.stop()
  }
}
