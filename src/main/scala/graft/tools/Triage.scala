package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-10 bench-regression triage: re-run a set of flagged queries in
  * ISOLATION under the exact Bench session (same master, shuffle
  * partitions, AQE, extensions), cold + 2 warm repeats each, artifacts
  * pre-built and timed as their own line items — so a flag from the full
  * 210-query bench can be attributed to either (a) a real plan
  * regression (reproduces here), or (b) shared-box / full-run
  * interference (vanishes here). Run the MAIN three times (fresh JVM =
  * fresh cold) for a ×3 cold sample.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Triage /root/testdata/sf0.1 q1 q2 ..."
  */
object Triage {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("e4_funnel_latency", "e5_pagerank", "e6_attribution",
        "x_decontaminate", "x_dedup_apply", "x_dedup_eval")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // same warm-up as Bench so cold numbers are comparable
    Seq("lineitem", "orders", "documents", "embeddings")
      .foreach(t => graft.Tables.table(spark, sfDir, t).count())
    graft.Tables.events(spark, sfDir).count()
    graft.SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
    graft.queries.LlmOps.resetArtifactCaches()
    graft.queries.LlmOps.artifactBuilders.foreach { case (n, build) =>
      println(f"[triage] artifact $n%-16s ${time(build(spark, sfDir))}%6.2f s")
    }
    val rows = names.map { n =>
      val fn = graft.SparkEntry.queries(n)
      val cold = time(fn(spark, sfDir).count())
      val w1 = time(fn(spark, sfDir).count())
      val w2 = time(fn(spark, sfDir).count())
      println(f"[triage] $n%-22s cold $cold%6.2f  warm $w1%6.2f $w2%6.2f")
      s""""$n":[$cold,$w1,$w2]"""
    }
    println(rows.mkString("{", ",", "}"))
    spark.stop()
  }
}
