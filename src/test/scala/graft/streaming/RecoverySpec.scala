package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** §2.9 fault tolerance: a streaming query stopped and restarted from its
  * checkpoint resumes exactly where it left off — no reprocessing, no
  * loss (the guarantee the reference *designed* with its commented-out
  * checkpointing, which Structured Streaming always provides).
  */
class RecoverySpec extends SparkSpec {

  private val line =
    """{"common":{"mid":"m1","is_new":"1","vc":"v1","ch":"web","ar":"11"},""" +
      """"page":{"page_id":"home","last_page_id":null,"item":null,"item_type":null,"during_time":5},"ts":%d}"""

  test("fan-out restarted from checkpoint neither reprocesses nor loses batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("recovery").toString
    Files.createDirectories(Paths.get(s"$dir/in"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def sinks = Map("page" -> ((df: org.apache.spark.sql.DataFrame) =>
      seen ++= df.as[String].collect(): Unit))

    val q1 = LogFanOut.run(spark, FileChannel(s"$dir/in"), sinks, s"$dir/ckpt")
    try {
      Files.writeString(Paths.get(s"$dir/in/w1.json"), line.format(1000L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.size == 1)

    // while the query is DOWN, more data lands
    Files.writeString(Paths.get(s"$dir/in/w2.json"), line.format(2000L))

    val q2 = LogFanOut.run(spark, FileChannel(s"$dir/in"), sinks, s"$dir/ckpt")
    try {
      q2.processAllAvailable()
      // the restarted query must pick up ONLY the missed file
      assert(seen.size == 2, s"expected exactly one new record, saw: $seen")
      assert(seen.count(_.contains("\"ts\":1000")) == 1)
      assert(seen.count(_.contains("\"ts\":2000")) == 1)
    } finally q2.stop()
  }
}
