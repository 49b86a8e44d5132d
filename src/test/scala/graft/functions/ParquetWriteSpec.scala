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
