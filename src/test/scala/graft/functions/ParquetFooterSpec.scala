package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ParquetFooter against files Spark itself writes (parquet-mr) — the
  * second writer lineage next to the gate's parquet-cpp testdata:
  * multi-row-group layouts, per-codec footers, double/float stat
  * rendering, and the total-parser contract under truncation/corruption.
  */
class ParquetFooterSpec extends SparkSpec {
  import spark.implicits._

  private def writeAndRead(df: org.apache.spark.sql.DataFrame,
                           opts: Map[String, String] = Map.empty): Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("pqfooter").toString
    df.coalesce(1).write.options(opts).mode("overwrite").parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.readAllBytes(f.toPath)
  }

  private def chunks(b: Array[Byte]) = {
    val one = Seq(b).toDF("content")
    one.select(explode(ParquetFooter.columnChunksCol(col("content"))).as("c"))
      .select("c.*").collect()
  }

  private def meta(b: Array[Byte]) = {
    val one = Seq(b).toDF("content")
    one.select(ParquetFooter.fileMetaCol(col("content")).as("m"))
      .select("m.*").collect().head
  }

  test("parquet-mr file: schema, counts, stats, codec") {
    val df = spark.range(0, 1000)
      .select(col("id").as("k"),
        (col("id") * 3 - 500).cast("int").as("v32"),
        concat(lit("s"), lpad(col("id").cast("string"), 4, "0")).as("name"),
        (col("id").cast("double") / 8.0).as("score"))
    val b = writeAndRead(df, Map("compression" -> "snappy"))
    val m = meta(b)
    assert(m.getAs[Long]("num_rows") === 1000L)
    assert(m.getAs[Long]("rg_rows_total") === 1000L)
    assert(m.getAs[Int]("n_row_groups") === 1)
    assert(m.getAs[Int]("n_leaves") === 4)
    assert(m.getAs[String]("leaf_names") === "k,name,score,v32")
    assert(m.getAs[String]("created_by") != null &&
      m.getAs[String]("created_by").contains("parquet-mr"))

    val cs = chunks(b).map(r => r.getAs[String]("col_path") -> r).toMap
    assert(cs.keySet === Set("k", "v32", "name", "score"))
    val k = cs("k")
    assert(k.getAs[String]("ptype") === "INT64")
    assert(k.getAs[String]("codec") === "SNAPPY")
    assert(k.getAs[Long]("num_values") === 1000L)
    assert(k.getAs[Long]("null_count") === 0L)
    assert(k.getAs[String]("min_s") === "0")
    assert(k.getAs[String]("max_s") === "999")
    val v = cs("v32")
    assert(v.getAs[String]("ptype") === "INT32")
    assert(v.getAs[String]("min_s") === "-500")
    assert(v.getAs[String]("max_s") === (999 * 3 - 500).toString)
    val n = cs("name")
    assert(n.getAs[String]("ptype") === "BYTE_ARRAY")
    assert(n.getAs[String]("min_s") === "s0000")
    assert(n.getAs[String]("max_s") === "s0999")
    val sc = cs("score")
    assert(sc.getAs[String]("ptype") === "DOUBLE")
    assert(sc.getAs[String]("min_s") === "0.0")
    assert(sc.getAs[String]("max_s") === (999.0 / 8.0).toString)
    // sizes are real byte counts
    assert(k.getAs[Long]("compressed") > 0 && k.getAs[Long]("uncompressed") > 0)
  }

  test("null counts and uncompressed codec") {
    val df = spark.range(0, 100)
      .select(when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("k"))
    val b = writeAndRead(df, Map("compression" -> "none"))
    val cs = chunks(b)
    assert(cs.length === 1)
    assert(cs.head.getAs[String]("codec") === "UNCOMPRESSED")
    assert(cs.head.getAs[Long]("null_count") === 10L)
    assert(cs.head.getAs[Long]("num_values") === 100L)
    assert(cs.head.getAs[String]("min_s") === "1")
  }

  test("multi-row-group layout: per-group stats partition the key range") {
    // parquet.block.size is the row-group target; small value → many groups
    val df = spark.range(0, 50000).select(col("id").as("k"))
    val b = writeAndRead(df,
      Map("parquet.block.size" -> "65536", "compression" -> "snappy"))
    val m = meta(b)
    assert(m.getAs[Int]("n_row_groups") > 1)
    assert(m.getAs[Long]("rg_rows_total") === 50000L)
    assert(m.getAs[Long]("num_rows") === 50000L)
    val cs = chunks(b).sortBy(_.getAs[Int]("rg"))
    assert(cs.length === m.getAs[Int]("n_row_groups"))
    // row groups are written in key order here: mins ascend, each group's
    // max < next group's min, global span = full range — exactly the
    // invariant row-group pruning relies on
    val mins = cs.map(_.getAs[String]("min_s").toLong)
    val maxs = cs.map(_.getAs[String]("max_s").toLong)
    assert(mins.head === 0L && maxs.last === 49999L)
    mins.zip(maxs).foreach { case (mn, mx) => assert(mn <= mx) }
    mins.tail.zip(maxs.init).foreach { case (nextMin, prevMax) =>
      assert(prevMax < nextMin)
    }
    assert(cs.map(_.getAs[Long]("num_values")).sum === 50000L)
  }

  test("total parser: truncation, corruption, foreign bytes → null") {
    val df = spark.range(0, 50).select(col("id").as("k"))
    val good = writeAndRead(df)
    assert(meta(good) != null)
    // every truncation of the tail (footer region) declines, never throws
    (1 to 64).foreach { cut =>
      val t = java.util.Arrays.copyOfRange(good, 0, good.length - cut)
      val r = Seq(t).toDF("content")
        .select(ParquetFooter.fileMetaCol(col("content")).as("m"))
        .collect().head
      assert(r.isNullAt(0), s"cut=$cut should decline")
    }
    // corrupt one byte in the thrift body: either still-parsable or null,
    // never an exception (and declared length keeps it in-bounds)
    val flen = (good(good.length - 8) & 0xff) |
      ((good(good.length - 7) & 0xff) << 8) |
      ((good(good.length - 6) & 0xff) << 16) |
      ((good(good.length - 5) & 0xff) << 24)
    val start = good.length - 8 - flen
    (0 until flen).foreach { i =>
      val c = good.clone()
      c(start + i) = (c(start + i) ^ 0x5a).toByte
      Seq(c).toDF("content")
        .select(ParquetFooter.fileMetaCol(col("content")).as("m"))
        .collect() // must not throw
    }
    // foreign bytes
    Seq("PAR1 not really a parquet file PAR1".getBytes,
      Array.empty[Byte], "x".getBytes).foreach { junk =>
      val r = Seq(junk).toDF("content")
        .select(ParquetFooter.fileMetaCol(col("content")).as("m")).collect().head
      assert(r.isNullAt(0))
    }
  }

  test("footer length field beyond file bounds declines") {
    val df = spark.range(0, 10).select(col("id").as("k"))
    val good = writeAndRead(df)
    val c = good.clone()
    // claim a footer longer than the file
    c(c.length - 8) = 0xff.toByte; c(c.length - 7) = 0xff.toByte
    c(c.length - 6) = 0xff.toByte; c(c.length - 5) = 0x7f.toByte
    val r = Seq(c).toDF("content")
      .select(ParquetFooter.fileMetaCol(col("content")).as("m")).collect().head
    assert(r.isNullAt(0))
  }
}
