package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.BloomDedup._

class BloomDedupSpec extends SparkSpec {

  test("duplicates never re-emit across batches; state is a fixed-size filter") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = dedupStream(mem.toDS(), buckets = 4, expectedPerBucket = 1000)
      .writeStream.format("memory").queryName("bloomdd")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Doc(1, 100), Doc(2, 200), Doc(3, 100)) // 3 dups 1 in-batch
      q.processAllAvailable()
      mem.addData(Doc(4, 100), Doc(5, 300)) // cross-batch dup + fresh
      q.processAllAvailable()
      val got = spark.table("bloomdd").as[Doc].collect().map(_.docId).toSet
      assert(got == Set(1L, 2L, 5L), s"got $got")
    } finally q.stop()
  }

  test("no duplicate hash is ever emitted twice; unique survival stays near 1-fpp") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = dedupStream(mem.toDS(), buckets = 8, expectedPerBucket = 10000, fpp = 0.01)
      .writeStream.format("memory").queryName("bloomdd2")
      .outputMode(OutputMode.Append).start()
    try {
      // 5000 uniques fed twice (second pass = all duplicates), 2 batches
      val uniques = (1 to 5000).map(i => Doc(i.toLong, i.toLong * 2654435761L))
      mem.addData(uniques: _*)
      q.processAllAvailable()
      mem.addData(uniques.map(d => d.copy(docId = d.docId + 100000)): _*)
      q.processAllAvailable()
      val got = spark.table("bloomdd2").as[Doc].collect()
      val hashes = got.map(_.hash)
      assert(hashes.length == hashes.distinct.length, "a hash re-emitted — never allowed")
      assert(got.forall(_.docId <= 5000), "a duplicate (second-pass) doc was emitted")
      val survival = got.length.toDouble / uniques.size
      assert(survival >= 0.98, s"unique survival $survival below 1 - 2*fpp")
    } finally q.stop()
  }
}
