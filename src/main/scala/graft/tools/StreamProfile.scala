package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: per-micro-batch duration breakdown for the streaming
  * gates — the engine's own progress events (triggerExecution,
  * queryPlanning, walCommit, stateOperators commit times, ...) plus a
  * job counter, so a slow gate can be attributed to planning vs state
  * vs sink instead of guessed at.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StreamProfile /root/testdata/sf0.1 d1_scd2_stream ..."
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("d1_scd2_stream")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet(): Unit
      })
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val stateStr = p.stateOperators.zipWithIndex.map { case (so, i) =>
          s"state$i(rows=${so.numRowsTotal} commit=${so.commitTimeMs}ms)"
        }.mkString(" ")
        println(s"[sprof]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${dur.get("triggerExecution")}ms " +
          s"addBatch=${dur.get("addBatch")}ms plan=${dur.get("queryPlanning")}ms " +
          s"latestOffset=${dur.get("latestOffset")}ms wal=${dur.get("walCommit")}ms " +
          s"commitOffsets=${dur.get("commitOffsets")}ms $stateStr")
      }
    })

    // same warm-up as Bench so numbers are comparable
    Seq("lineitem", "orders", "documents")
      .foreach(t => graft.Tables.table(spark, sfDir, t).count())
    graft.Tables.events(spark, sfDir).count()
    graft.SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (0 to 1).foreach { rep =>
        val j0 = jobCount.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[sprof] $n%-22s rep$rep $sec%6.2f s  jobs=${jobCount.get() - j0}")
      }
    }
    spark.stop()
  }
}
