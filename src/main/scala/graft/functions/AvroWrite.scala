package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro OCF WRITER as an aggregate — the row-format twin of
  * [[ParquetWrite]]: `groupBy(part).agg(avro_file(id, name))` yields
  * one complete Object Container File blob per group (magic, metadata
  * map with schema JSON + codec, zigzag-varint block framing,
  * sync markers, Avro-binary record bodies; codec `null`, `deflate`
  * via stored-block RFC 1951, or `zstandard` via raw-block zstd
  * frames — always-valid compressor-free encodings that round-trip
  * through the in-house [[Inflate]]/[[ZstdDecode]] and real
  * zlib/zstd alike). Rows are sorted
  * (id, name) inside the aggregate so blobs are deterministic under
  * shuffle arrival order. Blocks split at [[RecordsPerBlock]] records,
  * so large groups produce the multi-block layout real readers expect
  * to stream.
  *
  * Cross-checked both ways like the parquet twin: AvroWriteSpec reads
  * the blobs back with the REAL avro-java DataFileReader, and the gate
  * round-trips through [[AvroRead]].
  *
  * Reference scope: beyond-reference §2.10.
  */
object AvroWrite {

  val RecordsPerBlock = 4096

  /** Avro name grammar (spec "Names"). Enforced at construction so a
    * column name with a quote/backslash can never be interpolated into
    * the schema JSON and yield an unreadable (or differently-parsed)
    * blob — reject loudly instead of writing corrupt output. */
  private val AvroName = java.util.regex.Pattern.compile("[A-Za-z_][A-Za-z0-9_]*")
  def requireAvroName(n: String): Unit =
    require(n != null && AvroName.matcher(n).matches(),
      s"avro_file_agg: field name '$n' is not a valid Avro name " +
        "([A-Za-z_][A-Za-z0-9_]*)")

  private def schemaJson(idName: String, strName: String): String =
    s"""{"type":"record","name":"r","fields":[{"name":"$idName",""" +
      s""""type":"long"},{"name":"$strName","type":"string"}]}"""

  /** Fixed, deterministic sync marker (any 16 bytes are valid). */
  private val Sync: Array[Byte] = (0 until 16).map(i => (0xc8 ^ i).toByte).toArray

  private def writeVarint(out: java.io.ByteArrayOutputStream, n0: Long): Unit = {
    var v = (n0 << 1) ^ (n0 >> 63) // zigzag
    do {
      val b = (v & 0x7f).toInt
      v >>>= 7
      out.write(if (v != 0) b | 0x80 else b)
    } while (v != 0)
  }

  /** Stored-block DEFLATE (RFC 1951 BTYPE=00) — valid deflate with no
    * compressor: ≤65535-byte blocks of [BFINAL/BTYPE byte][LEN][NLEN]
    * [bytes]. Self-describing blobs that round-trip through the
    * in-house [[Inflate]] and real zlib alike (the write-side twin of
    * [[ParquetWrite.snappyStored]]). */
  private[functions] def deflateStored(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    if (b.isEmpty) {
      out.write(1); out.write(0); out.write(0); out.write(0xff); out.write(0xff)
      return out.toByteArray
    }
    var p = 0
    while (p < b.length) {
      val n = math.min(65535, b.length - p)
      out.write(if (p + n == b.length) 1 else 0) // BFINAL + BTYPE=00 + pad
      out.write(n & 0xff); out.write((n >>> 8) & 0xff)
      out.write(~n & 0xff); out.write((~n >>> 8) & 0xff)
      out.write(b, p, n)
      p += n
    }
    out.toByteArray
  }

  def fileBytes(rows: Seq[(Long, Array[Byte])], idName: String,
                strName: String, codec: String = "null"): Array[Byte] = {
    requireAvroName(idName); requireAvroName(strName)
    require(codec == "null" || codec == "deflate" || codec == "zstandard",
      s"avro_file_agg: unsupported codec '$codec'")
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write("Obj".getBytes("UTF-8")); out.write(1)
    // metadata map: one block of 2 entries, then end-of-map
    writeVarint(out, 2L)
    def kv(k: String, v: String): Unit = {
      val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
      writeVarint(out, kb.length.toLong); out.write(kb)
      writeVarint(out, vb.length.toLong); out.write(vb)
    }
    kv("avro.schema", schemaJson(idName, strName))
    kv("avro.codec", codec)
    writeVarint(out, 0L)
    out.write(Sync)
    rows.grouped(RecordsPerBlock).foreach { block =>
      val body = new java.io.ByteArrayOutputStream(block.size * 16)
      block.foreach { case (id, s) =>
        writeVarint(body, id)
        writeVarint(body, s.length.toLong)
        body.write(s, 0, s.length)
      }
      val payload = codec match {
        case "deflate" => deflateStored(body.toByteArray)
        case "zstandard" => ZstdDecode.frameStored(body.toByteArray)
        case _ => body.toByteArray
      }
      writeVarint(out, block.size.toLong)
      writeVarint(out, payload.length.toLong)
      out.write(payload, 0, payload.length)
      out.write(Sync)
    }
    out.toByteArray
  }

  /** Generic OCF writer over the FULL schema tree ([[AvroRead]]'s
    * model): rows are String→Any maps matching the record schema —
    * numbers for int/long, String for string/enum, Array[Byte] for
    * bytes/fixed, Seq for arrays, String-keyed Map (insertion-ordered
    * for determinism) for maps, nested Map for records, null only
    * under a ["null", T] union. LOUD on any mismatch — this is the
    * fixture/metadata writer (Iceberg manifests are nested Avro), not
    * a decline-to-null reader. Round-trips through [[AvroRead]] and
    * real avro-java alike. */
  def genericFileBytes(schemaJson: String, rows: Seq[Any],
                       codec: String = "null"): Array[Byte] = {
    require(codec == "null" || codec == "deflate" || codec == "zstandard",
      s"generic avro write: unsupported codec '$codec'")
    val root = AvroRead.schemaTree(schemaJson)

    def writeValue(out: java.io.ByteArrayOutputStream,
                   t: AvroRead.AType, v: Any): Unit = t match {
      case AvroRead.APrim(kind) => kind match {
        case "null" =>
          require(v == null, s"expected null, got $v")
        case "boolean" =>
          out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
        case "int" | "long" =>
          writeVarint(out, v.asInstanceOf[Number].longValue)
        case "float" =>
          val bits = java.lang.Float.floatToIntBits(
            v.asInstanceOf[Number].floatValue)
          var k = 0
          while (k < 4) { out.write((bits >>> (8 * k)) & 0xff); k += 1 }
        case "double" =>
          val bits = java.lang.Double.doubleToLongBits(
            v.asInstanceOf[Number].doubleValue)
          var k = 0
          while (k < 8) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
        case "string" =>
          val b = v.toString.getBytes("UTF-8")
          writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
        case "bytes" =>
          val b = v.asInstanceOf[Array[Byte]]
          writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
        case other => sys.error(s"unreachable prim $other")
      }
      case AvroRead.AOpt(inner, nullFirst) =>
        if (v == null) writeVarint(out, if (nullFirst) 0L else 1L)
        else {
          writeVarint(out, if (nullFirst) 1L else 0L)
          writeValue(out, inner, v)
        }
      case AvroRead.ARec(rname, fields) =>
        val m = v.asInstanceOf[scala.collection.Map[String, Any]]
        fields.foreach { f =>
          require(m.contains(f.name) ||
            f.t.isInstanceOf[AvroRead.AOpt] || f.t == AvroRead.APrim("null"),
            s"record $rname: missing required field ${f.name}")
          writeValue(out, f.t, m.getOrElse(f.name, null))
        }
      case AvroRead.AArr(items) =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        if (xs.nonEmpty) {
          writeVarint(out, xs.length.toLong)
          xs.foreach(writeValue(out, items, _))
        }
        writeVarint(out, 0L)
      case AvroRead.AMap(values) =>
        val m = v.asInstanceOf[scala.collection.Map[String, Any]]
        if (m.nonEmpty) {
          writeVarint(out, m.size.toLong)
          m.foreach { case (k, x) =>
            val kb = k.getBytes("UTF-8")
            writeVarint(out, kb.length.toLong); out.write(kb, 0, kb.length)
            writeValue(out, values, x)
          }
        }
        writeVarint(out, 0L)
      case AvroRead.AEnum(ename, symbols) =>
        val ix = symbols.indexOf(v.toString)
        require(ix >= 0, s"enum $ename: unknown symbol $v")
        writeVarint(out, ix.toLong)
      case AvroRead.AFixed(fname, size) =>
        val b = v.asInstanceOf[Array[Byte]]
        require(b.length == size, s"fixed $fname: ${b.length} != $size")
        out.write(b, 0, b.length)
    }

    val out = new java.io.ByteArrayOutputStream(1024)
    out.write("Obj".getBytes("UTF-8")); out.write(1)
    writeVarint(out, 2L)
    def kv(k: String, v: String): Unit = {
      val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
      writeVarint(out, kb.length.toLong); out.write(kb, 0, kb.length)
      writeVarint(out, vb.length.toLong); out.write(vb, 0, vb.length)
    }
    kv("avro.schema", schemaJson)
    kv("avro.codec", codec)
    writeVarint(out, 0L)
    out.write(Sync)
    rows.grouped(RecordsPerBlock).foreach { block =>
      val body = new java.io.ByteArrayOutputStream(block.size * 32)
      block.foreach(writeValue(body, root, _))
      val payload = codec match {
        case "deflate" => deflateStored(body.toByteArray)
        case "zstandard" => ZstdDecode.frameStored(body.toByteArray)
        case _ => body.toByteArray
      }
      writeVarint(out, block.size.toLong)
      writeVarint(out, payload.length.toLong)
      out.write(payload, 0, payload.length)
      out.write(Sync)
    }
    out.toByteArray
  }

  private def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  case class AvroFileAgg(
      id: Expression, name: Expression,
      idName: String, strName: String,
      codec: String = "null",
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Array[Byte])]] {

    override def children: Seq[Expression] = Seq(id, name)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (id.dataType == LongType && name.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"avro_file_agg expects (bigint, string), got " +
          s"(${id.dataType.simpleString}, ${name.dataType.simpleString})")
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): ArrayBuffer[(Long, Array[Byte])] =
      ArrayBuffer.empty
    override def update(buf: ArrayBuffer[(Long, Array[Byte])],
                        input: InternalRow): ArrayBuffer[(Long, Array[Byte])] = {
      val i = id.eval(input)
      val n = name.eval(input)
      if (i != null && n != null)
        buf += ((i.asInstanceOf[Long], n.asInstanceOf[UTF8String].getBytes))
      buf
    }
    override def merge(buf: ArrayBuffer[(Long, Array[Byte])],
                       other: ArrayBuffer[(Long, Array[Byte])])
        : ArrayBuffer[(Long, Array[Byte])] = { buf ++= other; buf }

    override def eval(buf: ArrayBuffer[(Long, Array[Byte])]): Any = {
      val sorted = buf.sortWith { case ((a, as), (b, bs)) =>
        a < b || (a == b && byteLt(as, bs))
      }
      fileBytes(sorted.toSeq, idName, strName, codec)
    }

    override def serialize(buf: ArrayBuffer[(Long, Array[Byte])]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.map(12 + _._2.length).sum)
      bb.putInt(buf.length)
      buf.foreach { case (v, s) => bb.putLong(v); bb.putInt(s.length); bb.put(s) }
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Array[Byte])] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val buf = new ArrayBuffer[(Long, Array[Byte])](n)
      var j = 0
      while (j < n) {
        val v = bb.getLong()
        val s = new Array[Byte](bb.getInt()); bb.get(s)
        buf += ((v, s))
        j += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): AvroFileAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): AvroFileAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(id = newChildren(0), name = newChildren(1))
    override def prettyName: String = "avro_file_agg"
  }

  def avroFile(id: Column, name: Column, idName: String,
               strName: String, codec: String = "null"): Column = {
    requireAvroName(idName); requireAvroName(strName)
    require(codec == "null" || codec == "deflate" || codec == "zstandard",
      s"avro_file_agg: unsupported codec '$codec'")
    SparkInternals.column(AvroFileAgg(
      Cast(SparkInternals.expression(id), LongType),
      Cast(SparkInternals.expression(name), StringType),
      idName, strName, codec).toAggregateExpression())
  }
}
