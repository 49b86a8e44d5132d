package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis
import graft.streaming.CrawlStore

/** Dev probe: per-STEP Spark job counts and wall times for one
  * crawlIngestBatch wave (mirrors CorpusIngest.crawlIngestBatch so the
  * 73-job x_crawl_waves figure can be attributed to specific seams).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.CrawlJobsProbe /root/testdata/sf0.1"
  */
object CrawlJobsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      })
    def step[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[cjp] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get() - j0}")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()
    val seeds = docs.filter(pmod(col("doc_id"), lit(50L)) === 0)
      .select(col("doc_id"))
    def rec(uri: org.apache.spark.sql.Column,
            html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(lit("WARC/1.0\r\nWARC-Target-URI: "), uri,
        lit("\r\nContent-Type: text/html\r\nContent-Length: "),
        length(html).cast("string"), lit("\r\n\r\n"), html, lit("\r\n\r\n"))
    val site = concat(lit("s"), col("doc_id"), lit(".example"))
    val w0 = seeds.select(col("doc_id"), rec(
      concat(lit("https://"), site, lit("/seed")),
      lit("<p>seed <a href=\"/p1\">a</a> <a href=\"/p2\">b</a> " +
        "<a href=\"https://hub.example/shared\">h</a></p>"))
      .cast("binary").as("payload"))

    (0 to 1).foreach { it =>
      println(s"[cjp] ---- wave iteration $it ----")
      val dir = java.nio.file.Files
        .createTempDirectory("cjp").toString
      val urlsPath = s"$dir/urls"
      val frontierPath = s"$dir/frontier"
      val batchId = 0L
      import org.apache.spark.sql.expressions.Window
      val pages = step("warcExtract+canon+text checkpoint") {
        graft.llm.Multimodal.warcExtract(w0)
          .select(col("doc_id"), col("rec_idx"), col("uri"),
            TextAnalysis.urlCanonical(col("uri")).as("canon"),
            col("content"))
          .filter(col("canon").isNotNull)
          .withColumn("domain", TextAnalysis.registrableDomain(
            regexp_extract(col("canon"), "^([^/?]*)", 1)))
          .withColumn("text", TextAnalysis.htmlToText(col("content")))
          .localCheckpoint(true)
      }
      step("isEmpty")(pages.isEmpty)
      val w = Window.partitionBy(col("canon"))
        .orderBy(col("doc_id"), col("rec_idx"))
      val firsts = pages.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      val survivors = step("antiJoinNew(urls) + checkpoint") {
        CrawlStore.antiJoinNew(firsts, "canon", urlsPath, batchId)
          .localCheckpoint(true)
      }
      step("pages sink") {
        graft.sources.Sinks.idempotentBatchSink(s"$dir/pages")(
          survivors.select("doc_id", "rec_idx", "canon", "domain", "text"),
          batchId)
      }
      step("appendKeys(urls)") {
        CrawlStore.appendKeys(urlsPath)(survivors, "canon", batchId)
      }
      val outlinks = step("outlinks + checkpoint") {
        TextAnalysis.extractLinks(
            survivors.select(col("doc_id"), col("uri").as("url"),
              col("content").as("html")))
          .select(TextAnalysis.urlCanonical(col("url")).as("canon"), col("url"))
          .filter(col("canon").isNotNull)
          .dropDuplicates("canon")
          .join(survivors.select("canon"), Seq("canon"), "left_anti")
          .localCheckpoint(true)
      }
      val fresh = step("antiJoinNewAll (lazy)") {
        CrawlStore.antiJoinNewAll(outlinks, "canon",
          Seq(urlsPath, frontierPath), batchId)
      }
      step("appendKeys(frontier)") {
        CrawlStore.appendKeys(frontierPath)(
          fresh, "canon", batchId, carry = Seq("url"))
      }
    }
    spark.stop()
  }
}
