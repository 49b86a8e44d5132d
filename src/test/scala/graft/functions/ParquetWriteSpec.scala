package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ParquetWrite blobs read back by SPARK'S OWN parquet reader — the
  * independent-implementation check — plus our-reader round-trips and
  * determinism under repartitioning. */
class ParquetWriteSpec extends SparkSpec {
  import spark.implicits._

  private def blobFor(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.agg(ParquetWrite.parquetFile(col("id"), col("s"), "id", "s").as("f"))
      .collect().head.getAs[Array[Byte]](0)

  test("spark reads our file: values, schema, types") {
    val df = spark.range(0, 2000)
      .select(col("id"), concat(lit("row-"), lpad(col("id").cast("string"), 5, "0")).as("s"))
    val blob = blobFor(df)
    val dir = java.nio.file.Files.createTempDirectory("pqwrite")
    java.nio.file.Files.write(dir.resolve("part-0.parquet"), blob)
    val back = spark.read.parquet(dir.toString)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("id", "bigint"), ("s", "string")))
    val rows = back.orderBy("id").collect()
    assert(rows.length === 2000)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getString(1) === f"row-$i%05d")
    }
    // and Spark's scan can push a filter over our statistics
    assert(back.filter(col("id") === 1500).count() === 1)
  }

  test("our own footer/pages readers round-trip the blob") {
    val df = spark.range(0, 500)
      .select((col("id") * 7 - 100).as("id"), concat(lit("v"), col("id").cast("string")).as("s"))
    val blob = blobFor(df)
    val m = Seq(blob).toDF("content")
      .select(ParquetFooter.fileMetaCol(col("content")).as("m")).select("m.*")
      .collect().head
    assert(m.getAs[Long]("num_rows") === 500L)
    assert(m.getAs[String]("leaf_names") === "id,s")
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val ids = ParquetPages.int64Values(blob, u("id"))
    assert(ids != null && ids.numElements() === 500)
    assert((0 until 500).map(ids.getLong).toSet ===
      (0 until 500).map(_.toLong * 7 - 100).toSet)
    val ss = ParquetPages.stringValues(blob, u("s"))
    assert(ss != null && ss.numElements() === 500)
    // stats in the footer match the data
    val chunks = Seq(blob).toDF("content")
      .select(explode(ParquetFooter.columnChunksCol(col("content"))).as("c"))
      .select("c.*").collect().map(r => r.getAs[String]("col_path") -> r).toMap
    assert(chunks("id").getAs[String]("min_s") === "-100")
    assert(chunks("id").getAs[String]("max_s") === (499 * 7 - 100).toString)
    assert(chunks("s").getAs[String]("min_s") === "v0")
  }

  test("blob is deterministic under shuffle arrival order") {
    val df = spark.range(0, 3000)
      .select(pmod(col("id") * 131, lit(3000)).as("id"),
        concat(lit("x"), col("id").cast("string")).as("s"))
    val a = blobFor(df.repartition(13))
    val b = blobFor(df.repartition(2).sortWithinPartitions(desc("s")))
    assert(java.util.Arrays.equals(a, b))
  }

  // ---- general surface: schema, nulls, dictionary, snappy, groups ----

  private val genCols = Seq(
    ParquetWrite.ColSpec("k", isString = false, nullable = false),
    ParquetWrite.ColSpec("opt", isString = false, nullable = true),
    ParquetWrite.ColSpec("s", isString = true, nullable = true),
    ParquetWrite.ColSpec("req_s", isString = true, nullable = false))

  private def genRows(n: Int): Seq[Array[Any]] = (0 until n).map { i =>
    Array[Any](
      java.lang.Long.valueOf(i.toLong),
      if (i % 7 == 0) null else java.lang.Long.valueOf(i.toLong * 3 - 50),
      if (i % 11 == 0) null else s"s-${i % 40}".getBytes("UTF-8"),
      s"r-${i % 25}".getBytes("UTF-8"))
  }

  private def sparkReads(blob: Array[Byte], n: Int, label: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("pqgen")
    java.nio.file.Files.write(dir.resolve("p.parquet"), blob)
    val back = spark.read.parquet(dir.toString)
    // Spark surfaces every parquet column as nullable; names/types only
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("k", "bigint"), ("opt", "bigint"),
        ("s", "string"), ("req_s", "string")), label)
    val rows = back.orderBy("k").collect()
    assert(rows.length === n, label)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong, s"$label k@$i")
      if (i % 7 == 0) assert(r.isNullAt(1), s"$label opt@$i")
      else assert(r.getLong(1) === i.toLong * 3 - 50, s"$label opt@$i")
      if (i % 11 == 0) assert(r.isNullAt(2), s"$label s@$i")
      else assert(r.getString(2) === s"s-${i % 40}", s"$label s@$i")
      assert(r.getString(3) === s"r-${i % 25}", s"$label req_s@$i")
    }
  }

  test("general surface: every codec x dictionary x group-size variant " +
    "reads back through Spark AND our own reader") {
    val n = 4000
    val rows = genRows(n)
    for {
      codec <- Seq(0, 1, 6) // uncompressed, snappy, zstd (stored blocks)
      dict <- Seq(false, true)
      groupRows <- Seq(Int.MaxValue, 700) // single + multi row group
    } {
      val label = s"codec=$codec dict=$dict groups=$groupRows"
      val blob = ParquetWrite.fileBytes(genCols, rows, codec, dict, groupRows)
      sparkReads(blob, n, label)
      // our own reader round-trips the same blob
      val u = org.apache.spark.unsafe.types.UTF8String.fromString _
      val ks = ParquetPages.int64Values(blob, u("k"))
      val opts = ParquetPages.int64Values(blob, u("opt"))
      val ss = ParquetPages.stringValues(blob, u("s"))
      assert(ks != null && opts != null && ss != null, label)
      assert(ks.numElements() === n, label)
      (0 until n).foreach { i =>
        assert(ks.getLong(i) === i.toLong, s"$label ks@$i")
        if (i % 7 == 0) assert(opts.isNullAt(i), s"$label opt@$i")
        else assert(opts.getLong(i) === i.toLong * 3 - 50, s"$label opt@$i")
        if (i % 11 == 0) assert(ss.isNullAt(i), s"$label s@$i")
        else assert(ss.getUTF8String(i).toString === s"s-${i % 40}", s"$label s@$i")
      }
    }
  }

  test("multi-group stats: our pruned read skips groups our writer wrote") {
    val n = 10000
    val rows = genRows(n)
    val blob = ParquetWrite.fileBytes(genCols, rows, codec = 1,
      useDictionary = false, rowGroupRows = 1000)
    val r = ParquetPages.int64ValuesPruned(blob,
      org.apache.spark.unsafe.types.UTF8String.fromString("k"), 2500L, 3500L)
    assert(r != null)
    assert(r.getInt(0) === 10) // 10 groups written
    assert(r.getInt(1) === 2) // only [2000,3000) + [3000,4000) survive
    val a = r.getArray(2)
    val got = (0 until a.numElements()).map(a.getLong)
      .filter(v => v >= 2500 && v <= 3500)
    assert(got === (2500L to 3500L))
    // Spark prunes on the same stats: filter result stays exact
    val dir = java.nio.file.Files.createTempDirectory("pqprune")
    java.nio.file.Files.write(dir.resolve("p.parquet"), blob)
    assert(spark.read.parquet(dir.toString)
      .filter(col("k").between(2500, 3500)).count() === 1001)
  }

  test("dictionary page pair: footer records the dict offset; " +
    "page walk starts at the dictionary") {
    val rows = genRows(600)
    val blob = ParquetWrite.fileBytes(genCols, rows, codec = 0,
      useDictionary = true)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    // our reader walks dict page first, decodes indices
    val ss = ParquetPages.stringValues(blob, u("req_s"))
    assert(ss != null && ss.numElements() === 600)
    (0 until 600).foreach(i =>
      assert(ss.getUTF8String(i).toString === s"r-${i % 25}"))
  }

  test("footer records TRUE uncompressed chunk sizes (field 6 vs 7)") {
    val rows = (0 until 500).map(i =>
      (i.toLong, s"payload-value-$i".getBytes("UTF-8")))
    // codec 0: compressed == uncompressed byte-for-byte
    val plain = ParquetFooter.parse(
      ParquetWrite.fileBytes(rows, "k", "s"))
    assert(plain != null)
    plain.rowGroups.flatMap(_.columns).foreach { c =>
      assert(c.uncompressed > 0)
      assert(c.uncompressed === c.compressed)
    }
    // stored snappy/zstd framing ADDS bytes: the uncompressed total a
    // size-budgeting reader plans from must now be strictly smaller
    // than the on-disk compressed total (it equaled it before the fix)
    Seq(1, 6).foreach { codec =>
      val cols = Seq(
        ParquetWrite.ColSpec("k", isString = false, nullable = false),
        ParquetWrite.ColSpec("s", isString = true, nullable = false))
      val b = ParquetWrite.fileBytes(cols,
        rows.map(r => Array[Any](java.lang.Long.valueOf(r._1), r._2)),
        codec = codec)
      val f = ParquetFooter.parse(b)
      assert(f != null)
      f.rowGroups.flatMap(_.columns).foreach { c =>
        assert(c.uncompressed > 0 && c.compressed > 0)
        assert(c.uncompressed < c.compressed,
          s"codec $codec: field 6 (${c.uncompressed}) should be the raw " +
            s"total, below the stored-block total (${c.compressed})")
      }
    }
  }

  test("empty group yields a valid zero-row file") {
    val df = spark.range(0, 10).filter(col("id") < 0)
      .select(col("id"), col("id").cast("string").as("s"))
    val blob = blobFor(df)
    val dir = java.nio.file.Files.createTempDirectory("pqwrite0")
    java.nio.file.Files.write(dir.resolve("p.parquet"), blob)
    assert(spark.read.parquet(dir.toString).count() === 0)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val ids = ParquetPages.int64Values(blob, u("id"))
    assert(ids != null && ids.numElements() === 0)
  }
}
