package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Direct scale probe for the crawl-history membership seam
  * (round-13 verdict: the per-batch `left_anti` against the full
  * `urls`/`frontier` history was linear in crawl history — the
  * scale-killer for the one loop a crawler runs millions of times).
  *
  * Builds a CrawlStore at history sizes H, 10·H, 30·H (epoch appends +
  * one compaction + a post-compaction increment, exactly the layout a
  * live stream produces), then times the SAME fixed-size batch
  * membership check (`antiJoinNew`: bloom prefilter + bucket-pruned
  * confirm) at every size — flat-ish times across 30× history is the
  * claim under test. The round-12 shape (full-history left_anti) runs
  * next to it as the linear control, and exactness asserts inline
  * (the probe fails loudly if the store miscounts).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.CrawlHistoryProbe 1000000"
  */
object CrawlHistoryProbe {
  def main(args: Array[String]): Unit = {
    val baseH = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val batchKeys = 2000L // fixed per-batch candidate count, half dup
    // small buckets make the asymptote visible at probe scale: the
    // confirm plateaus at candidates x targetRowsPerBucket rows read,
    // whatever the history (production keeps the default 1M-row
    // buckets; the plateau is the same, it just needs a bigger corpus
    // to separate from the full scan)
    val target = 4096L
    def canon(idCol: org.apache.spark.sql.Column) =
      concat(lit("h"), idCol, lit(".example/p"), idCol)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    for (factor <- Seq(1, 10, 30)) {
      val h = baseH * factor
      val dir = java.nio.file.Files
        .createTempDirectory(s"crawl_probe_$factor").toString + "/urls"
      // history: ≥2 epochs summing to `h` keys, compacted, plus one
      // 1/10-epoch of post-compaction increments — a live stream's shape
      val nEpochs = math.max(2, factor)
      val perEpoch = h / nEpochs
      (0 until nEpochs).foreach { e =>
        val hi = if (e == nEpochs - 1) h else (e + 1) * perEpoch
        graft.streaming.CrawlStore.appendKeys(dir)(
          spark.range(e * perEpoch, hi)
            .select(canon(col("id")).as("canon")), "canon", e.toLong)
      }
      graft.streaming.CrawlStore.compact(spark, dir, "canon",
        targetRowsPerBucket = target, keepEpochs = 1)
      graft.streaming.CrawlStore.appendKeys(dir)(
        spark.range(h, h + baseH / 10)
          .select(canon(col("id")).as("canon")), "canon", nEpochs.toLong)
      val total = h + baseH / 10
      // the fixed batch: half dups striding the WHOLE history (worst
      // case for pruning — hits spread uniformly, no clustering
      // favors), half new
      val stride = math.max(1L, total / (batchKeys / 2))
      val cands = spark.range(batchKeys)
        .select(when(col("id") < batchKeys / 2, col("id") * stride)
          .otherwise(lit(total) + col("id")).as("kid"))
        .select(canon(col("kid")).as("canon"))
        .localCheckpoint(true)
      // store path (cold then warm)
      def storeRun(): Long = graft.streaming.CrawlStore
        .antiJoinNew(cands, "canon", dir, 999999L).count()
      var n = 0L
      val cold = time { n = storeRun() }
      val warm = time { storeRun() }
      require(n == batchKeys / 2, s"exactness: $n new, expected ${batchKeys / 2}")
      // the round-12 linear control: full-history read + left_anti
      val meta = { // control reads both tiers whole, as the old shape read its one tier
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        graft.streaming.CrawlStore.readMeta(fs, dir).get
      }
      val control = time {
        val hist = spark.read
          .parquet(s"${dir}_compacted/v=${meta.version}/data").select("canon")
          .union(spark.read.parquet(dir).select("canon"))
        require(cands.join(hist, Seq("canon"), "left_anti").count() == batchKeys / 2)
      }
      // grace-cost face (round-16): the one-compaction reader grace
      // leaves the epochs folded by the LAST flip on disk (batch_id <=
      // upTo, list-filtered but never read). Delete them — exactly
      // what an immediate (grace-free) vacuum would have done — and
      // re-time the same batch: the delta is the pure listing/
      // discovery cost of the graced generation.
      val fs2 = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.streaming.CrawlStore.listEpochs(fs2, dir)
        .filter(_ <= meta.upTo).foreach(e => fs2.delete(
          new org.apache.hadoop.fs.Path(dir, s"batch_id=$e"), true))
      var n2 = 0L
      val vacCold = time { n2 = storeRun() }
      val vacWarm = time { storeRun() }
      require(n2 == batchKeys / 2, s"post-vacuum exactness: $n2")
      println(f"""{"probe":"crawl_history","factor":$factor,"history":$total,""" +
        f""""store_cold_s":$cold%.2f,"store_warm_s":$warm%.2f,""" +
        f""""vacuumed_cold_s":$vacCold%.2f,"vacuumed_warm_s":$vacWarm%.2f,""" +
        f""""linear_control_s":$control%.2f,"nb":${meta.nb}}""")
    }
    spark.stop()
  }
}
