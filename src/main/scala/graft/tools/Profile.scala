package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage wall times for the bench hot spots, so a
  * slow query can be attributed to a specific stage instead of guessed
  * at. Usage: sbt "runMain graft.tools.Profile /root/testdata/sf0.1"
  */
object Profile {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    time("scan documents")(docs.count())
    import graft.llm.{Dedup, TextAnalysis}
    time("tokens explode")(
      docs.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok")).count())
    time("tokens + h60 + simhash agg")(Dedup.simhash(docs).count())
    time("simhashNearPairs total")(Dedup.simhashNearPairs(docs).count())
    time("simhashNearPairs warm")(Dedup.simhashNearPairs(docs).count())
    val g = time("shingles distinct")({
      val s = Dedup.shingles(docs); s.count(); s
    })
    time("hashed grams")(g.withColumn("h",
      conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")).count())
    time("minhash signatures")(Dedup.minhashSignatures(docs).count())
    time("minhashLshPairs full")(Dedup.minhashLshPairs(docs).count())
    time("minhashLshPairs warm")(Dedup.minhashLshPairs(docs).count())
    spark.stop()
  }
}
