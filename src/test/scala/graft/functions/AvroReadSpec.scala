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

  test("declines: wrong field/type/path, junk") {
    val b = write(schema, rows(10), CodecFactory.nullCodec())
    assert(AvroRead.int64Values(b, u("nope")) == null)
    assert(AvroRead.int64Values(b, u("name")) == null) // type mismatch
    assert(AvroRead.stringValues(b, u("id")) == null)
    assert(AvroRead.doubleValues(b, u("flag")) == null)
    assert(AvroRead.fileMeta("Obj not avro".getBytes) == null)
    assert(AvroRead.fileMeta(Array.emptyByteArray) == null)
  }

  test("nested records: dotted paths through required + nullable structs") {
    val inner = SchemaBuilder.record("inner").fields()
      .requiredLong("k")
      .requiredString("s")
      .endRecord()
    val outer = SchemaBuilder.record("outer").fields()
      .requiredLong("id")
      .name("req").`type`(inner).noDefault()
      .name("opt").`type`().optional().`type`(inner)
      .endRecord()
    val data = (0 until 500).map { i =>
      val in = new GenericData.Record(inner)
      in.put("k", i * 2L); in.put("s", s"v$i")
      val r = new GenericData.Record(outer)
      r.put("id", i.toLong)
      r.put("req", in)
      if (i % 3 == 0) r.put("opt", null)
      else {
        val o = new GenericData.Record(inner)
        o.put("k", i * 5L); o.put("s", s"o$i")
        r.put("opt", o)
      }
      r
    }
    Seq(CodecFactory.nullCodec(), CodecFactory.deflateCodec(6)).foreach { c =>
      val b = write(outer, data, c)
      val ks = AvroRead.int64Values(b, u("req.k"))
      assert(ks != null && ks.numElements() === 500)
      (0 until 500).foreach(i => assert(ks.getLong(i) === i * 2L))
      val ss = AvroRead.stringValues(b, u("req.s"))
      (0 until 500).foreach(i =>
        assert(ss.getUTF8String(i).toString === s"v$i"))
      // null struct on the path propagates to a null leaf
      val ok = AvroRead.int64Values(b, u("opt.k"))
      (0 until 500).foreach { i =>
        if (i % 3 == 0) assert(ok.isNullAt(i))
        else assert(ok.getLong(i) === i * 5L)
      }
      // path into a non-record declines
      assert(AvroRead.int64Values(b, u("id.k")) == null)
      assert(AvroRead.int64Values(b, u("req.nope")) == null)
    }
  }

  test("arrays, maps, enums, fixed — real avro-java lineage") {
    val s = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"xs","type":{"type":"array","items":"long"}},
        |  {"name":"tags","type":["null",{"type":"array","items":"string"}]},
        |  {"name":"m","type":{"type":"map","values":"long"}},
        |  {"name":"col","type":{"type":"enum","name":"c",
        |    "symbols":["RED","GREEN","BLUE"]}},
        |  {"name":"fx","type":{"type":"fixed","name":"f8","size":8}},
        |  {"name":"ds","type":{"type":"array","items":"double"}}
        |]}""".stripMargin)
    val colS = s.getField("col").schema()
    val fxS = s.getField("fx").schema()
    val syms = Array("RED", "GREEN", "BLUE")
    val data = (0 until 300).map { i =>
      val r = new GenericData.Record(s)
      r.put("id", i.toLong)
      val xs = new java.util.ArrayList[java.lang.Long]()
      (0 until i % 5).foreach(j => xs.add(i * 10L + j))
      r.put("xs", xs)
      if (i % 4 == 0) r.put("tags", null)
      else {
        val ts = new java.util.ArrayList[String]()
        (0 until i % 3).foreach(j => ts.add(s"t$j"))
        r.put("tags", ts)
      }
      val m = new java.util.LinkedHashMap[String, java.lang.Long]()
      m.put("a", i.toLong); m.put("b", i * 2L)
      r.put("m", m)
      r.put("col", new GenericData.EnumSymbol(colS, syms(i % 3)))
      val fb = java.nio.ByteBuffer.allocate(8).putLong(i.toLong).array()
      r.put("fx", new GenericData.Fixed(fxS, fb))
      val ds = new java.util.ArrayList[java.lang.Double]()
      ds.add(i / 4.0)
      r.put("ds", ds)
      r
    }
    val b = write(s, data, CodecFactory.nullCodec())
    val meta = AvroRead.fileMeta(b)
    assert(meta != null && meta.getLong(0) === 300L)
    val xs = AvroRead.int64ListValues(b, u("xs"))
    assert(xs != null && xs.numElements() === 300)
    (0 until 300).foreach { i =>
      val inner = xs.getArray(i)
      assert(inner.numElements() === i % 5)
      (0 until i % 5).foreach(j => assert(inner.getLong(j) === i * 10L + j))
    }
    val tags = AvroRead.stringListValues(b, u("tags"))
    (0 until 300).foreach { i =>
      if (i % 4 == 0) assert(tags.isNullAt(i))
      else assert(tags.getArray(i).numElements() === i % 3)
    }
    val ms = AvroRead.mapInt64Csv(b, u("m"))
    (0 until 300).foreach(i =>
      assert(ms.getUTF8String(i).toString === s"a=$i,b=${i * 2}"))
    val cols = AvroRead.stringValues(b, u("col"))
    (0 until 300).foreach(i =>
      assert(cols.getUTF8String(i).toString === syms(i % 3)))
    val ds = AvroRead.doubleListValues(b, u("ds"))
    (0 until 300).foreach(i => assert(ds.getArray(i).getDouble(0) === i / 4.0))
    // wrong element kinds decline
    assert(AvroRead.stringListValues(b, u("xs")) == null)
    assert(AvroRead.int64ListValues(b, u("id")) == null)
    assert(AvroRead.mapInt64Csv(b, u("xs")) == null)
  }

  test("genericRecords exposes the whole tree; recursive schemas decline") {
    val s = new Schema.Parser().parse(
      """{"type":"record","name":"entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"data_file","type":{"type":"record","name":"df","fields":[
        |    {"name":"path","type":"string"},
        |    {"name":"n","type":"long"},
        |    {"name":"parts","type":{"type":"array","items":
        |      {"type":"record","name":"kv","fields":[
        |        {"name":"key","type":"int"},{"name":"value","type":"long"}]}}}
        |  ]}}]}""".stripMargin)
    val dfS = s.getField("data_file").schema()
    val kvS = dfS.getField("parts").schema().getElementType
    val data = (0 until 20).map { i =>
      val kv = new GenericData.Record(kvS)
      kv.put("key", 7); kv.put("value", i * 100L)
      val parts = new java.util.ArrayList[GenericRecord]()
      parts.add(kv)
      val df = new GenericData.Record(dfS)
      df.put("path", s"f$i.parquet"); df.put("n", i.toLong)
      df.put("parts", parts)
      val r = new GenericData.Record(s)
      r.put("status", i % 3); r.put("data_file", df)
      r
    }
    val b = write(s, data, CodecFactory.nullCodec())
    val recs = AvroRead.genericRecords(b)
    assert(recs.length === 20)
    val r5 = recs(5)
    assert(r5("status") === java.lang.Long.valueOf(5 % 3))
    val df5 = r5("data_file").asInstanceOf[scala.collection.Map[String, Any]]
    assert(df5("path").toString === "f5.parquet")
    assert(df5("n") === java.lang.Long.valueOf(5L))
    val parts = df5("parts").asInstanceOf[scala.collection.Seq[Any]]
    assert(parts.head.asInstanceOf[scala.collection.Map[String, Any]]("value")
      === java.lang.Long.valueOf(500L))
    // loud on junk
    intercept[IllegalArgumentException] {
      AvroRead.genericRecords("Obj junk".getBytes)
    }
    // recursive named type: reference precedes completion → decline
    val rec = """{"type":"record","name":"n","fields":[
      |  {"name":"next","type":["null","n"]},
      |  {"name":"v","type":"long"}]}""".stripMargin
    val out = new java.io.ByteArrayOutputStream()
    out.write("Obj".getBytes("UTF-8")); out.write(1)
    def vint(n0: Long): Unit = {
      var v = (n0 << 1) ^ (n0 >> 63)
      do { val x = (v & 0x7f).toInt; v >>>= 7
        out.write(if (v != 0) x | 0x80 else x) } while (v != 0)
    }
    vint(2L)
    Seq("avro.schema" -> rec, "avro.codec" -> "null").foreach { case (k, v) =>
      vint(k.length.toLong); out.write(k.getBytes("UTF-8"))
      vint(v.length.toLong); out.write(v.getBytes("UTF-8"))
    }
    vint(0L)
    out.write(Array.fill[Byte](16)(0x22))
    assert(AvroRead.fileMeta(out.toByteArray) == null)
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
