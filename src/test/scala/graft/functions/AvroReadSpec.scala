package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.unsafe.types.UTF8String

/** AvroRead against REAL Avro writer output (avro-java DataFileWriter,
  * on the Spark classpath): all three codecs, nullable unions, every
  * flat primitive, multi-block files, and the decline/fuzz contract. */
class AvroReadSpec extends AnyFunSuite {

  private def write(schema: Schema, rows: Seq[GenericRecord],
                    codec: CodecFactory, syncInterval: Int = 64000): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec)
    w.setSyncInterval(syncInterval)
    w.create(schema, out)
    rows.foreach(w.append)
    w.close()
    out.toByteArray
  }

  private val schema: Schema = SchemaBuilder.record("r").fields()
    .requiredLong("id")
    .requiredString("name")
    .optionalLong("opt")
    .requiredDouble("score")
    .requiredBoolean("flag")
    .requiredInt("small")
    .endRecord()

  private def rows(n: Int): Seq[GenericRecord] = (0 until n).map { i =>
    val r = new GenericData.Record(schema)
    r.put("id", i.toLong * 3 - 50)
    r.put("name", s"name-$i")
    r.put("opt", if (i % 5 == 0) null else java.lang.Long.valueOf(i.toLong))
    r.put("score", i / 8.0)
    r.put("flag", i % 2 == 0)
    r.put("small", i - 7)
    r
  }

  private def u(s: String) = UTF8String.fromString(s)

  test("all codecs round-trip: null, deflate, snappy, zstandard; nullable unions") {
    val data = rows(3000)
    Seq(CodecFactory.nullCodec(), CodecFactory.deflateCodec(6),
      CodecFactory.snappyCodec(), CodecFactory.zstandardCodec(3)).foreach { codec =>
      val b = write(schema, data, codec)
      val meta = AvroRead.fileMeta(b)
      assert(meta != null, s"$codec declined")
      assert(meta.getLong(0) === 3000L)
      assert(meta.getUTF8String(3).toString === "flag,id,name,opt,score,small")
      val ids = AvroRead.int64Values(b, u("id"))
      assert(ids != null && ids.numElements() === 3000)
      (0 until 3000).foreach(i => assert(ids.getLong(i) === i.toLong * 3 - 50))
      val small = AvroRead.int64Values(b, u("small"))
      (0 until 3000).foreach(i => assert(small.getLong(i) === i.toLong - 7))
      val opt = AvroRead.int64Values(b, u("opt"))
      (0 until 3000).foreach { i =>
        if (i % 5 == 0) assert(opt.isNullAt(i))
        else assert(opt.getLong(i) === i.toLong)
      }
      val names = AvroRead.stringValues(b, u("name"))
      (0 until 3000).foreach(i =>
        assert(names.getUTF8String(i).toString === s"name-$i"))
      val scores = AvroRead.doubleValues(b, u("score"))
      (0 until 3000).foreach(i => assert(scores.getDouble(i) === i / 8.0))
    }
  }

  test("multi-block files verify every sync marker") {
    val b = write(schema, rows(5000), CodecFactory.nullCodec(),
      syncInterval = 2000) // tiny interval → many blocks
    val meta = AvroRead.fileMeta(b)
    assert(meta != null && meta.getLong(0) === 5000L)
    assert(meta.getInt(1) > 3, s"expected many blocks, got ${meta.getInt(1)}")
    val ids = AvroRead.int64Values(b, u("id"))
    assert(ids.numElements() === 5000)
    // corrupt one sync marker byte → decline, never a torn read
    val metaEnd = {
      // find the first sync by re-reading the header: cheap proxy — flip a
      // byte near the end of the file (inside the final sync)
      val c = b.clone()
      c(c.length - 3) = (c(c.length - 3) ^ 0x7f).toByte
      c
    }
    assert(AvroRead.fileMeta(metaEnd) == null)
  }

  test("declines: unsupported schema shapes, wrong field/type, junk") {
    val nested = SchemaBuilder.record("o").fields()
      .name("inner").`type`(schema).noDefault()
      .endRecord()
    val r = new GenericData.Record(nested)
    val ir = rows(1).head
    r.put("inner", ir)
    val bNested = write(nested, Seq(r), CodecFactory.nullCodec())
    assert(AvroRead.fileMeta(bNested) == null)

    val b = write(schema, rows(10), CodecFactory.nullCodec())
    assert(AvroRead.int64Values(b, u("nope")) == null)
    assert(AvroRead.int64Values(b, u("name")) == null) // type mismatch
    assert(AvroRead.stringValues(b, u("id")) == null)
    assert(AvroRead.doubleValues(b, u("flag")) == null)
    assert(AvroRead.fileMeta("Obj not avro".getBytes) == null)
    assert(AvroRead.fileMeta(Array.emptyByteArray) == null)
  }

  test("claim-bomb: zero-width records / oversized count claims decline") {
    def vint(out: java.io.ByteArrayOutputStream, n0: Long): Unit = {
      var v = (n0 << 1) ^ (n0 >> 63)
      do { val b = (v & 0x7f).toInt; v >>>= 7
        out.write(if (v != 0) b | 0x80 else b) } while (v != 0)
    }
    def ocf(schemaJson: String, count: Long, block: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("Obj".getBytes("UTF-8")); out.write(1)
      vint(out, 2L)
      Seq("avro.schema" -> schemaJson, "avro.codec" -> "null").foreach {
        case (k, v) =>
          val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
          vint(out, kb.length.toLong); out.write(kb)
          vint(out, vb.length.toLong); out.write(vb)
      }
      vint(out, 0L)
      val sync = Array.fill[Byte](16)(0x11)
      out.write(sync)
      vint(out, count); vint(out, block.length.toLong)
      out.write(block); out.write(sync)
      out.toByteArray
    }
    // empty fields → each record decodes to ZERO bytes: a ~60-byte blob
    // claiming 2^26 records must decline before materializing any rows
    val bomb = ocf("""{"type":"record","name":"r","fields":[]}""",
      1L << 26, Array.emptyByteArray)
    val t0 = System.nanoTime()
    assert(AvroRead.fileMeta(bomb) == null)
    assert(System.nanoTime() - t0 < 2e9.toLong, "must decline fast")
    // all-"null"-typed fields are zero-width too
    val bombNullField = ocf(
      """{"type":"record","name":"r","fields":[{"name":"z","type":"null"}]}""",
      1L << 26, Array.emptyByteArray)
    assert(AvroRead.fileMeta(bombNullField) == null)
    // a count claim the block's bytes cannot hold declines up front
    val over = ocf(
      """{"type":"record","name":"r","fields":[{"name":"k","type":"long"}]}""",
      1L << 20, Array[Byte](2, 4, 6))
    assert(AvroRead.fileMeta(over) == null)
    // sanity: a well-formed tiny file through the same builder parses
    val ok = ocf(
      """{"type":"record","name":"r","fields":[{"name":"k","type":"long"}]}""",
      3L, Array[Byte](2, 4, 6))
    val meta = AvroRead.fileMeta(ok)
    assert(meta != null && meta.getLong(0) === 3L)
    val ks = AvroRead.int64Values(ok, u("k"))
    assert((0 until 3).map(ks.getLong) === Seq(1L, 2L, 3L))
  }

  test("totality: truncation and corruption fuzz never throws") {
    val b = write(schema, rows(500), CodecFactory.deflateCodec(6))
    (1 until b.length by 5).foreach { keep =>
      AvroRead.fileMeta(java.util.Arrays.copyOf(b, keep))
    }
    (0 until b.length by 3).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x2a).toByte
      AvroRead.fileMeta(c)
      AvroRead.int64Values(c, u("id"))
    }
  }
}
