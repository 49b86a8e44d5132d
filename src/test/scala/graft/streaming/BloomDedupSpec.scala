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

  test("bloom state survives a checkpoint restart: a dup from before the outage stays dropped") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("bloomrec").toString
    Files.createDirectories(Paths.get(s"$dir/in"))
    def start() = dedupStream(
      spark.readStream.schema("docId LONG, hash LONG").json(s"$dir/in").as[Doc],
      buckets = 4, expectedPerBucket = 1000)
      .writeStream.format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()

    val q1 = start()
    try {
      Files.writeString(Paths.get(s"$dir/in/b1.json"),
        """{"docId":1,"hash":100}""" + "\n" + """{"docId":2,"hash":200}""")
      q1.processAllAvailable()
    } finally q1.stop()
    // while the query is DOWN: a duplicate of hash 100 and a fresh hash
    Files.writeString(Paths.get(s"$dir/in/b2.json"),
      """{"docId":3,"hash":100}""" + "\n" + """{"docId":4,"hash":300}""")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out").as[Doc].collect().map(_.docId).toSet
      assert(got == Set(1L, 2L, 4L),
        s"recovered filter must still drop the pre-outage hash: $got")
    } finally q2.stop()
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
