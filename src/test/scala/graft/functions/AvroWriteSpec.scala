package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

/** AvroWrite blobs read back by the REAL avro-java DataFileReader (the
  * independent implementation), by our own AvroRead, and determinism
  * under repartitioning. */
class AvroWriteSpec extends SparkSpec {
  import spark.implicits._

  private def blobFor(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.agg(AvroWrite.avroFile(col("id"), col("s"), "id", "s").as("f"))
      .collect().head.getAs[Array[Byte]](0)

  test("avro-java reads our file: schema, values, multi-block") {
    val n = 10000 // > RecordsPerBlock → multi-block
    val df = spark.range(0, n)
      .select(col("id"), concat(lit("row-"), col("id").cast("string")).as("s"))
    val blob = blobFor(df)
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(blob), new GenericDatumReader[GenericRecord]())
    assert(r.getSchema.getField("id").schema().getType.getName === "long")
    assert(r.getSchema.getField("s").schema().getType.getName === "string")
    var i = 0L
    while (r.hasNext) {
      val rec = r.next()
      assert(rec.get("id") === i)
      assert(rec.get("s").toString === s"row-$i")
      i += 1
    }
    assert(i === n.toLong)
    r.close()
  }

  test("our own AvroRead round-trips the blob") {
    val df = spark.range(0, 3000)
      .select((col("id") * 11 - 999).as("id"),
        concat(lit("v"), col("id").cast("string")).as("s"))
    val blob = blobFor(df)
    val m = AvroRead.fileMeta(blob)
    assert(m != null && m.getLong(0) === 3000L)
    assert(m.getUTF8String(3).toString === "id,s")
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val ids = AvroRead.int64Values(blob, u("id"))
    assert(ids != null && ids.numElements() === 3000)
    assert((0 until 3000).map(ids.getLong).toSet ===
      (0 until 3000).map(_.toLong * 11 - 999).toSet)
  }

  test("generic nested writer: avro-java and AvroRead both consume") {
    val schemaJson =
      """{"type":"record","name":"entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"df","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"record_count","type":"long"},
        |    {"name":"sizes","type":{"type":"map","values":"long"}},
        |    {"name":"parts","type":{"type":"array","items":
        |      {"type":"record","name":"kv","fields":[
        |        {"name":"key","type":"int"},
        |        {"name":"value","type":["null","long"],"default":null}]}}}
        |  ]}}]}""".stripMargin.replaceAll("\n\\s*", "")
    def row(i: Int): Map[String, Any] = Map(
      "status" -> 1,
      "snapshot_id" -> (if (i % 3 == 0) null else java.lang.Long.valueOf(i * 7L)),
      "data_file" -> Map(
        "file_path" -> s"data/f$i.parquet",
        "record_count" -> (i * 100L),
        "sizes" -> scala.collection.mutable.LinkedHashMap(
          "c1" -> (i + 1L), "c2" -> (i + 2L)),
        "parts" -> Seq(
          Map("key" -> 1, "value" -> java.lang.Long.valueOf(i.toLong)),
          Map("key" -> 2, "value" -> null))))
    Seq("null", "deflate", "zstandard").foreach { codec =>
      val blob = AvroWrite.genericFileBytes(
        schemaJson, (0 until 50).map(row), codec)
      // independent implementation consumes it
      val r = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(blob),
        new GenericDatumReader[GenericRecord]())
      var i = 0
      while (r.hasNext) {
        val rec = r.next()
        val df = rec.get("data_file").asInstanceOf[GenericRecord]
        assert(df.get("file_path").toString === s"data/f$i.parquet")
        assert(df.get("record_count") === i * 100L)
        if (i % 3 == 0) assert(rec.get("snapshot_id") == null)
        else assert(rec.get("snapshot_id") === i * 7L)
        i += 1
      }
      assert(i === 50)
      r.close()
      // and our own tree reader round-trips
      val recs = AvroRead.genericRecords(blob)
      assert(recs.length === 50)
      val d9 = recs(9)("data_file")
        .asInstanceOf[scala.collection.Map[String, Any]]
      assert(d9("record_count") === java.lang.Long.valueOf(900L))
      assert(d9("sizes").asInstanceOf[scala.collection.Map[String, Any]]("c2")
        === java.lang.Long.valueOf(11L))
    }
    // loud on schema/value mismatch
    intercept[IllegalArgumentException] {
      AvroWrite.genericFileBytes(schemaJson,
        Seq(Map("status" -> 1))) // missing required data_file
    }
  }

  test("deflate + zstandard codecs (stored blocks): avro-java AND our AvroRead consume") {
    val n = 9000 // multi-block, and one block body > 65535 bytes
    val df = spark.range(0, n)
      .select(col("id"),
        concat(lit("payload-padding-padding-"), col("id").cast("string")).as("s"))
    Seq("deflate", "zstandard").foreach { codec =>
      val blob = df.agg(AvroWrite
        .avroFile(col("id"), col("s"), "id", "s", codec).as("f"))
        .collect().head.getAs[Array[Byte]](0)
      // the independent implementation decodes the blocks
      val r = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(blob), new GenericDatumReader[GenericRecord]())
      assert(r.getMetaString("avro.codec") === codec)
      var i = 0L
      while (r.hasNext) {
        val rec = r.next()
        assert(rec.get("id") === i, codec)
        assert(rec.get("s").toString === s"payload-padding-padding-$i", codec)
        i += 1
      }
      assert(i === n.toLong, codec)
      r.close()
      // and our own reader routes it through the in-house codec tier
      val m = AvroRead.fileMeta(blob)
      assert(m != null && m.getLong(0) === n.toLong, codec)
      assert(m.getUTF8String(2).toString === codec)
      val u = org.apache.spark.unsafe.types.UTF8String.fromString _
      val ids = AvroRead.int64Values(blob, u("id"))
      assert(ids != null && ids.numElements() === n, codec)
      (0 until n).foreach(i => assert(ids.getLong(i) === i.toLong))
    }
  }

  test("invalid field names are rejected at construction, not miswritten") {
    intercept[IllegalArgumentException] {
      AvroWrite.fileBytes(Seq((1L, "x".getBytes)), "bad\"name", "s")
    }
    intercept[IllegalArgumentException] {
      AvroWrite.avroFile(col("id"), col("s"), "ok", "has-dash")
    }
  }

  test("blob is deterministic under shuffle arrival order") {
    val df = spark.range(0, 5000)
      .select(pmod(col("id") * 997, lit(5000)).as("id"),
        concat(lit("x"), col("id").cast("string")).as("s"))
    val a = blobFor(df.repartition(17))
    val b = blobFor(df.repartition(3).sortWithinPartitions(desc("s")))
    assert(java.util.Arrays.equals(a, b))
  }

  test("empty group yields a valid zero-record file") {
    val df = spark.range(0, 5).filter(col("id") < 0)
      .select(col("id"), col("id").cast("string").as("s"))
    val blob = blobFor(df)
    val m = AvroRead.fileMeta(blob)
    assert(m != null && m.getLong(0) === 0L)
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(blob), new GenericDatumReader[GenericRecord]())
    assert(!r.hasNext)
    r.close()
  }
}
