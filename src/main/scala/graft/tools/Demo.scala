package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.streaming.{FileChannel, LogFanOut}

/** Dev driver / usage example: runs the DWD log fan-out topology over a
  * file channel, feeding two waves of behavior-log JSON and printing the
  * per-sink record counts after each wave — demonstrates incremental
  * micro-batch pickup with checkpointing.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft_demo").toString
    Files.createDirectories(Paths.get(s"$dir/in"))
    def log(mid: String, ts: Long, withStart: Boolean): String =
      if (withStart)
        s"""{"common":{"mid":"$mid","is_new":"1","vc":"v1","ch":"web","ar":"11"},"start":{"entry":"icon","loading_time":10},"ts":$ts}"""
      else
        s"""{"common":{"mid":"$mid","is_new":"1","vc":"v1","ch":"web","ar":"11"},"page":{"page_id":"home","last_page_id":null,"item":"sku1","item_type":"sku_id","during_time":5},"displays":[{"item":"sku2","item_type":"sku_id","order":1}],"ts":$ts}"""
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val q = LogFanOut.run(spark, FileChannel(s"$dir/in"),
      Map("dirty" -> (df => counts("dirty") += df.count()),
        "start" -> (df => counts("start") += df.count()),
        "display" -> (df => counts("display") += df.count()),
        "page" -> (df => counts("page") += df.count())),
      s"$dir/ckpt")
    try {
      Files.writeString(Paths.get(s"$dir/in/wave1.json"),
        Seq(log("m1", 1000, false), log("m2", 2000, true), "corrupt{").mkString("\n"))
      q.processAllAvailable()
      println(s"[demo] after wave 1: ${counts.toMap}")
      Files.writeString(Paths.get(s"$dir/in/wave2.json"),
        Seq(log("m1", 5000, false), log("m3", 6000, true)).mkString("\n"))
      q.processAllAvailable()
      println(s"[demo] after wave 2: ${counts.toMap}")
    } finally q.stop()
    spark.stop()
  }
}
