package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * A warm-up action runs first so JVM/codegen/session start-up cost is
  * not attributed to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("WARN")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    // warm-up: touch every table + force a shuffle and codegen. Guarded so
    // one broken loader degrades to per-query failures instead of aborting
    // Bench before the JSON line is emitted.
    try {
      Seq("lineitem", "orders", "documents", "embeddings")
        .foreach(t => Tables.table(spark, sfDir, t).count())
      Tables.events(spark, sfDir).count() // ns-timestamp loader
      SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up FAILED (continuing): ${e.getMessage}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        failures += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fs,"sf":"$sfDir"}"""
    println(json)
    // also land the line in a dedicated file so a log-prefixing runner
    // (sbt wraps forked stdout unless outputStrategy passes it through)
    // can never corrupt it
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    java.nio.file.Files.write(outFile,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
