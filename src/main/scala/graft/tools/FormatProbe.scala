package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Format-tier throughput probe: the lake-format readers
  * (ParquetFooter/ParquetPages/AvroRead/OrcMeta) and codec decoders are
  * map-side per-payload expressions, so the 100 TB claim is (a) linear
  * in payload count, (b) embarrassingly parallel across tasks, (c)
  * zero-shuffle. This measures (a)/(b) directly: decode the sf0.1
  * lineitem file's l_orderkey column from raw bytes at 1×, 32× and
  * 256× blob replication on local[32], reporting wall time and
  * MB/s of parquet bytes decoded.
  *
  *   sbt "runMain graft.tools.FormatProbe"
  */
object FormatProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/lineitem.parquet"))
    val mb = bytes.length / 1e6
    println(f"[format-probe] lineitem.parquet = $mb%.1f MB")

    def run(n: Int): Unit = {
      // `when` over the non-foldable id keeps ConstantFolding from
      // collapsing the whole decode to one evaluation
      val df = spark.range(0, n).repartition(math.min(n, cpus.toInt))
        .select(when(col("id") >= 0, lit(bytes)).as("content"))
      // warm JVM/codegen once
      val vals = graft.functions.ParquetPages
        .int64ColumnCol(col("content"), lit("l_orderkey"))
      val q = df.select(
        aggregate(vals, lit(0L), (a, x) => a + coalesce(x, lit(0L))).as("s"),
        size(vals).cast("long").as("c"))
        .agg(sum("s").as("s"), sum("c").as("c"))
      q.collect() // warm
      val t0 = System.nanoTime()
      val r = q.collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[format-probe] n=$n%4d blobs  ${sec}%6.2f s  " +
        f"${n * mb / sec}%8.1f MB/s  rows=${r.getLong(1)}  sum=${r.getLong(0)}")
    }
    Seq(1, 32, 256).foreach(run)
    spark.stop()
  }
}
