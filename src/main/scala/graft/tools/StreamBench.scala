package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{StateOps, StatsStreams}

/** Streaming throughput probe: drives the real events table through the
  * windowed-aggregation and keyed-state pipelines as micro-batches and
  * reports events/second. The reference publishes no throughput numbers
  * (BASELINE.md) — this gives ours a measurable floor.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.StreamBench"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    implicit val sq = spark.sqlContext
    spark.sparkContext.setLogLevel("ERROR")

    val events = graft.Tables.events(spark, sfDir)
      .select($"ts", $"event_type", $"user_id", $"value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    val batches = events.grouped(math.max(1, events.length / 4)).toSeq

    // pipeline 1: windowed aggregation (A1 shape)
    val memA = MemoryStream[(java.sql.Timestamp, String, Long, Double)]
    // 1h windows: the synthetic events span 30 days, so 10s windows would
    // mean ~260k near-empty windows — state-store churn, not throughput.
    val qA = StatsStreams.productStats(
        memA.toDF().toDF("ts", "event_type", "user_id", "value"),
        watermark = "2 seconds", windowLen = "1 hour")
      .writeStream.format("noop").outputMode(OutputMode.Append).start()
    val tA0 = System.nanoTime()
    batches.foreach { b => memA.addData(b.toIndexedSeq); qA.processAllAvailable() }
    val secsA = (System.nanoTime() - tA0) / 1e9
    qA.stop()

    // pipeline 2: keyed state (ST2 uv dedup shape)
    val memS = MemoryStream[StateOps.Visit]
    val qS = StateOps.uvDedup(memS.toDS())
      .writeStream.format("noop").outputMode(OutputMode.Append).start()
    val visits = events.zipWithIndex.map { case ((ts, _, uid, _), i) =>
      StateOps.Visit(uid.toString, ts.getTime, "1", None, i.toLong)
    }
    val vBatches = visits.grouped(math.max(1, visits.length / 4)).toSeq
    val tS0 = System.nanoTime()
    vBatches.foreach { b => memS.addData(b.toIndexedSeq); qS.processAllAvailable() }
    val secsS = (System.nanoTime() - tS0) / 1e9
    qS.stop()

    // pipeline 3: streaming near-dup LSH ingest (linear signature state)
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ingestDir = java.nio.file.Files.createTempDirectory("sb_lsh").toString
    val memD = MemoryStream[(Long, String)]
    val qD = memD.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(graft.llm.Dedup.lshIngestBatch(s"$ingestDir/artifact") _)
      .option("checkpointLocation", s"$ingestDir/ckpt").start()
    val dBatches = docs.grouped(math.max(1, docs.length / 4)).toSeq
    val tD0 = System.nanoTime()
    dBatches.foreach { b => memD.addData(b.toIndexedSeq); qD.processAllAvailable() }
    val secsD = (System.nanoTime() - tD0) / 1e9
    qD.stop()

    // pipeline 4: the full composed corpus-ingest job (LSH state + gate +
    // dedup + sampling + sharded exactly-once writes per micro-batch)
    val ciDir = java.nio.file.Files.createTempDirectory("sb_ci").toString
    val memC = MemoryStream[(Long, String)]
    val qC = graft.streaming.CorpusIngest.run(
      memC.toDF().toDF("doc_id", "text"),
      s"$ciDir/artifact", s"$ciDir/out", s"$ciDir/ckpt")
    val tC0 = System.nanoTime()
    dBatches.foreach { b => memC.addData(b.toIndexedSeq); qC.processAllAvailable() }
    val secsC = (System.nanoTime() - tC0) / 1e9
    qC.stop()

    val n = events.length
    val nd = docs.length
    println(f"""{"metric":"stream_throughput","events":$n,"windowed_agg_eps":${n / secsA}%.0f,"keyed_state_eps":${n / secsS}%.0f,"lsh_ingest_docs":$nd,"lsh_ingest_dps":${nd / secsD}%.0f,"corpus_ingest_dps":${nd / secsC}%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
