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

    def run(label: String, blob: Array[Byte], blobMb: Double,
            vals: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
           (n: Int): Unit = {
      // `when` over the non-foldable id keeps ConstantFolding from
      // collapsing the whole decode to one evaluation
      val df = spark.range(0, n).repartition(math.min(n, cpus.toInt))
        .select(when(col("id") >= 0, lit(blob)).as("content"))
      val v = vals(col("content"))
      val q = df.select(
        aggregate(v, lit(0L), (a, x) => a + coalesce(x, lit(0L))).as("s"),
        size(v).cast("long").as("c"))
        .agg(sum("s").as("s"), sum("c").as("c"))
      q.collect() // warm JVM/codegen once
      val t0 = System.nanoTime()
      val r = q.collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[format-probe] $label n=$n%4d blobs  ${sec}%6.2f s  " +
        f"${n * blobMb / sec}%8.1f MB/s  rows=${r.getLong(1)}  sum=${r.getLong(0)}")
    }

    val parquetRun = run("parquet", bytes, mb,
      c => graft.functions.ParquetPages.int64ColumnCol(c, lit("l_orderkey"))) _
    Seq(1, 32, 256).foreach(parquetRun)

    // zstd-compressed parquet (codec 6 written by Spark) — the decode
    // path real newly-written lakes exercise: gzip-tier cost question
    val zstdDir = java.nio.file.Files.createTempDirectory("fp_zstd")
    spark.read.parquet(s"$base/lineitem.parquet")
      .select("l_orderkey").coalesce(1)
      .write.option("compression", "zstd").mode("overwrite")
      .parquet(zstdDir.toString)
    val zb = {
      val f = zstdDir.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.readAllBytes(f.toPath)
    }
    println(f"[format-probe] zstd-parquet blob = ${zb.length / 1e6}%.1f MB")
    val zstdRun = run("zstd-pq", zb, zb.length / 1e6,
      c => graft.functions.ParquetPages.int64ColumnCol(c, lit("l_orderkey"))) _
    Seq(1, 32, 256).foreach(zstdRun)

    // ORC stripe decode (RLEv2 + present) at the same scale ramp
    val orcDir = java.nio.file.Files.createTempDirectory("fp_orc")
    spark.read.parquet(s"$base/lineitem.parquet")
      .select("l_orderkey").coalesce(1)
      .write.option("compression", "zlib").mode("overwrite")
      .orc(orcDir.toString)
    val ob = {
      val f = orcDir.toFile.listFiles().filter(_.getName.endsWith(".orc")).head
      java.nio.file.Files.readAllBytes(f.toPath)
    }
    println(f"[format-probe] orc blob = ${ob.length / 1e6}%.1f MB")
    val orcRun = run("orc", ob, ob.length / 1e6,
      c => graft.functions.OrcValues.int64ColumnCol(c, lit("l_orderkey"))) _
    Seq(1, 32, 256).foreach(orcRun)

    // round-17 faces: MAP (two-chunk zip), nested LIST (depth-2 Dremel
    // assembly), STRUCT dotted path — same per-payload map-side shape,
    // measured on a Spark-written blob of all three columns
    val nestDir = java.nio.file.Files.createTempDirectory("fp_nest")
    spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .select(col("l_orderkey"),
        map(lit("a"), col("l_orderkey"), lit("b"), col("l_partkey"))
          .as("m"),
        array(array(col("l_orderkey")), array(col("l_partkey"))).as("aa"),
        struct(col("l_partkey").as("x")).as("st"))
      .coalesce(1)
      .write.option("compression", "snappy").mode("overwrite")
      .parquet(nestDir.toString)
    val nb = {
      val f = nestDir.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.readAllBytes(f.toPath)
    }
    println(f"[format-probe] nested blob = ${nb.length / 1e6}%.1f MB")
    val structRun = run("struct-path", nb, nb.length / 1e6,
      c => graft.functions.ParquetPages.int64ColumnCol(c, lit("st.x"))) _
    Seq(1, 32, 256).foreach(structRun)
    // list2/map yield nested/string values the shared harness can't
    // sum; measure them with size-only aggregates instead
    def runNested(label: String,
                  vals: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
                 (n: Int): Unit = {
      val df = spark.range(0, n).repartition(math.min(n, cpus.toInt))
        .select(when(col("id") >= 0, lit(nb)).as("content"))
      val q = df.select(size(vals(col("content"))).cast("long").as("c"))
        .agg(sum("c").as("c"))
      q.collect()
      val t0 = System.nanoTime()
      val r = q.collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[format-probe] $label n=$n%4d blobs  ${sec}%6.2f s  " +
        f"${n.toDouble * nb.length / 1e6 / sec}%8.1f MB/s  rows=${r.getLong(0)}")
    }
    Seq(1, 32, 256).foreach(runNested("map-csv",
      c => graft.functions.ParquetPages.mapInt64CsvCol(c, lit("m"))))
    Seq(1, 32, 256).foreach(runNested("list2",
      c => graft.functions.ParquetPages.int64List2ColumnCol(c, lit("aa"))))

    spark.stop()
  }
}
