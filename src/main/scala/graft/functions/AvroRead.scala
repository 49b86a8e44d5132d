package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro Object Container File (OCF) reader — the row-oriented sibling
  * of the parquet tier, and the framing Kafka/ingest archives actually
  * ship: `Obj\1` magic, metadata map (schema JSON + codec), 16-byte
  * sync markers, zigzag-varint block framing, then Avro binary-encoded
  * records. Everything is decoded in-house: the schema JSON through a
  * minimal recursive-descent parser, block payloads through OUR codec
  * tier ([[Inflate.raw]] for the deflate codec — Avro deflate is raw
  * RFC 1951 — [[BlockCodecs.snappyBlock]] + CRC-32 suffix check for
  * snappy, and [[ZstdDecode]] frames for the zstandard codec), and
  * the record body through the Avro binary spec
  * (zigzag varints, length-prefixed strings/bytes, LE float/double,
  * union branch indices).
  *
  * Scope (= the flat-record shape log pipelines emit): top-level
  * record whose fields are null / boolean / int / long / float /
  * double / string / bytes, or a ["null", prim] union (either order).
  * Nested records, arrays, maps, enums, and fixed DECLINE to null —
  * never misread — as do sync-marker mismatches, short blocks, bad
  * codecs, and counts past the shared 64 MiB bound.
  *
  * Faces mirror [[ParquetPages]]: per-field typed value arrays for
  * map-side aggregation (values never shuffle), plus a file-meta
  * struct (record/block counts, codec, field list).
  *
  * Reference scope: beyond-reference §2.10.
  */
object AvroRead {

  private[functions] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  private val MaxOut = BlockCodecs.MaxOut

  // ---- minimal JSON (schema strings only; total, cycle-free) ----

  private[functions] final class JsonP(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def parse(): Any = { ws(); val v = value(); v }
    private def value(): Any = {
      if (i >= s.length) fail()
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
          if (i < s.length && s.charAt(i) == '}') { i += 1; return m }
          var done = false
          while (!done) {
            ws()
            val k = str()
            ws(); if (i >= s.length || s.charAt(i) != ':') fail(); i += 1; ws()
            m(k) = value()
            ws()
            if (i < s.length && s.charAt(i) == ',') i += 1
            else if (i < s.length && s.charAt(i) == '}') { i += 1; done = true }
            else fail()
          }
          m
        case '[' =>
          i += 1; ws()
          val a = scala.collection.mutable.ArrayBuffer.empty[Any]
          if (i < s.length && s.charAt(i) == ']') { i += 1; return a }
          var done = false
          while (!done) {
            a += value(); ws()
            if (i < s.length && s.charAt(i) == ',') { i += 1; ws() }
            else if (i < s.length && s.charAt(i) == ']') { i += 1; done = true }
            else fail()
          }
          a
        case '"' => str()
        case 't' => expect("true"); java.lang.Boolean.TRUE
        case 'f' => expect("false"); java.lang.Boolean.FALSE
        case 'n' => expect("null"); null
        case _ =>
          val st = i
          while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
          if (i == st) fail()
          val tok = s.substring(st, i)
          // integral tokens stay exact as Long — parsing them as Double
          // would silently round above 2^53 (real Iceberg snapshot ids
          // are uniform 63-bit longs); a too-big integer declines
          if (tok.indexOf('.') < 0 && tok.indexOf('e') < 0 &&
            tok.indexOf('E') < 0) {
            try java.lang.Long.valueOf(tok)
            catch { case _: NumberFormatException => fail() }
          } else {
            try java.lang.Double.valueOf(tok)
            catch { case _: NumberFormatException => fail() }
          }
      }
    }
    private def expect(w: String): Unit = {
      if (!s.startsWith(w, i)) fail(); i += w.length
    }
    private def str(): String = {
      if (i >= s.length || s.charAt(i) != '"') fail()
      i += 1
      val sb = new java.lang.StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail()
          s.charAt(i) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
            case 'r' => sb.append('\r'); case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail()
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case _ => fail()
          }
        } else sb.append(c)
        i += 1
      }
      if (i >= s.length) fail()
      i += 1
      sb.toString
    }
  }

  // ---- schema model (flat records only) ----

  /** Primitive kinds; `nullable` via ["null", prim] unions. */
  private final class Field(val name: String, val kind: String,
                            val nullable: Boolean, val nullFirst: Boolean)

  private val Prims = Set("null", "boolean", "int", "long", "float",
    "double", "string", "bytes")

  private def primOf(t: Any): String = t match {
    case s: String if Prims(s) => s
    case m: scala.collection.Map[_, _] =>
      m.asInstanceOf[scala.collection.Map[String, Any]].get("type") match {
        case Some(s: String) if Prims(s) => s
        case _ => fail()
      }
    case _ => fail()
  }

  private def parseSchema(json: String): Array[Field] = {
    val root = new JsonP(json).parse() match {
      case m: scala.collection.Map[_, _] =>
        m.asInstanceOf[scala.collection.Map[String, Any]]
      case _ => fail()
    }
    if (!root.get("type").contains("record")) fail()
    val fields = root.get("fields") match {
      case Some(a: scala.collection.Seq[_]) => a
      case _ => fail()
    }
    fields.map {
      case fm: scala.collection.Map[_, _] =>
        val f = fm.asInstanceOf[scala.collection.Map[String, Any]]
        val name = f.get("name") match {
          case Some(s: String) => s; case _ => fail()
        }
        f.get("type") match {
          case Some(u: scala.collection.Seq[_]) =>
            if (u.length != 2) fail()
            val kinds = u.map(primOf)
            if (!kinds.contains("null")) fail()
            val k = kinds.find(_ != "null").getOrElse("null")
            new Field(name, k, nullable = true, nullFirst = kinds.head == "null")
          case Some(t) => new Field(name, primOf(t), nullable = false,
            nullFirst = false)
          case None => fail()
        }
      case _ => fail()
    }.toArray
  }

  // ---- binary decode ----

  private final class Bin(val d: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = { if (pos >= end) fail(); val v = d(pos) & 0xff; pos += 1; v }
    def zigzag(): Long = {
      var shift = 0; var v = 0L; var c = 0
      do {
        if (shift > 63) fail()
        c = u8(); v |= (c & 0x7fL) << shift; shift += 7
      } while ((c & 0x80) != 0)
      (v >>> 1) ^ -(v & 1)
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || n > end - pos) fail()
      val r = java.util.Arrays.copyOfRange(d, pos, pos + n); pos += n; r
    }
  }

  /** Decodes one primitive value; boxed, null for the null type. */
  private def readPrim(b: Bin, kind: String): Any = kind match {
    case "null" => null
    case "boolean" => val v = b.u8(); if (v > 1) fail(); java.lang.Boolean.valueOf(v == 1)
    case "int" | "long" => java.lang.Long.valueOf(b.zigzag())
    case "float" =>
      var v = 0; var k = 0
      while (k < 4) { v |= b.u8() << (8 * k); k += 1 }
      java.lang.Float.valueOf(java.lang.Float.intBitsToFloat(v))
    case "double" =>
      var v = 0L; var k = 0
      while (k < 8) { v |= (b.u8().toLong) << (8 * k); k += 1 }
      java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(v))
    case "string" | "bytes" =>
      val n = b.zigzag()
      if (n < 0 || n > MaxOut) fail()
      val raw = b.bytes(n.toInt)
      if (kind == "string") UTF8String.fromBytes(raw) else raw
    case _ => fail()
  }

  private final class Ocf(val fields: Array[Field], val codec: String,
                          val records: Array[Array[Any]], val nBlocks: Int)

  private def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, from, until - from)
    c.getValue
  }

  private def parse(b: Array[Byte]): Ocf = {
    if (b == null || b.length < 32) fail()
    if (b(0) != 'O' || b(1) != 'b' || b(2) != 'j' || b(3) != 1) fail()
    val r = new Bin(b, 4, b.length)
    // file metadata map: blocks of (count, entries*), 0-count ends
    var schemaJson: String = null
    var codec = "null"
    var done = false
    while (!done) {
      var count = r.zigzag()
      if (count == 0) done = true
      else {
        if (count < 0) { r.zigzag(); count = -count } // block byte size, unused
        if (count > (1 << 16)) fail()
        var i = 0L
        while (i < count) {
          val klen = r.zigzag()
          if (klen < 0 || klen > (1 << 16)) fail()
          val key = new String(r.bytes(klen.toInt), "UTF-8")
          val vlen = r.zigzag()
          if (vlen < 0 || vlen > MaxOut) fail()
          val v = r.bytes(vlen.toInt)
          if (key == "avro.schema") schemaJson = new String(v, "UTF-8")
          if (key == "avro.codec") codec = new String(v, "UTF-8")
          i += 1
        }
      }
    }
    if (schemaJson == null) fail()
    val fields = parseSchema(schemaJson)
    // claim-bomb bound: every field below consumes ≥1 encoded byte per
    // record except the bare "null" primitive (nullable unions still
    // spend a branch byte). A schema whose records decode to ZERO bytes
    // would let a tiny block claim count=MaxOut and materialize ~67M
    // empty rows before the exact-consumption check — reject it.
    val minRecordBytes = fields.count(f => f.nullable || f.kind != "null")
    val sync = r.bytes(16)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    var nBlocks = 0
    while (r.pos < r.end) {
      val count = r.zigzag()
      if (count < 0 || count > MaxOut) fail()
      val size = r.zigzag()
      if (size < 0 || size > MaxOut) fail()
      val raw = r.bytes(size.toInt)
      val data = codec match {
        case "null" => raw
        case "deflate" =>
          val d = Inflate.raw(raw)
          if (d == null) fail()
          d
        case "zstandard" => // zstd frame per block (RFC 8878)
          val d = ZstdDecode.decompress(raw)
          if (d == null) fail()
          d
        case "snappy" => // avro snappy: block + 4-byte BE CRC32 of the DATA
          if (raw.length < 4) fail()
          val body = java.util.Arrays.copyOfRange(raw, 0, raw.length - 4)
          val d = BlockCodecs.snappyBlock(body)
          if (d == null) fail()
          val want = ((raw(raw.length - 4) & 0xffL) << 24) |
            ((raw(raw.length - 3) & 0xffL) << 16) |
            ((raw(raw.length - 2) & 0xffL) << 8) |
            (raw(raw.length - 1) & 0xffL)
          if (crc32(d, 0, d.length) != want) fail()
          d
        case _ => fail()
      }
      // bound the record-count claim by the decoded block's byte size
      // BEFORE the decode loop (each record consumes ≥ minRecordBytes)
      if (count > 0 && minRecordBytes == 0) fail()
      if (count * minRecordBytes.toLong > data.length) fail()
      val rb = new Bin(data, 0, data.length)
      var i = 0L
      while (i < count) {
        val row = new Array[Any](fields.length)
        var fi = 0
        while (fi < fields.length) {
          val f = fields(fi)
          row(fi) =
            if (f.nullable) {
              val branch = rb.zigzag()
              if (branch < 0 || branch > 1) fail()
              val isNull = if (f.nullFirst) branch == 0 else branch == 1
              if (isNull) null else readPrim(rb, f.kind)
            } else readPrim(rb, f.kind)
          fi += 1
        }
        out += row
        i += 1
        if (out.length > MaxOut) fail()
      }
      if (rb.pos != rb.end) fail() // block must be exactly consumed
      val gotSync = r.bytes(16)
      if (!java.util.Arrays.equals(gotSync, sync)) fail()
      nBlocks += 1
    }
    new Ocf(fields, codec, out.toArray, nBlocks)
  }

  // ---- faces ----

  def fileMeta(b: Array[Byte]): InternalRow =
    try {
      val o = parse(b)
      InternalRow(o.records.length.toLong, o.nBlocks,
        UTF8String.fromString(o.codec),
        UTF8String.fromString(o.fields.map(_.name).sorted.mkString(",")))
    } catch { case Malformed => null }

  private def fieldIndex(o: Ocf, name: String): Int = {
    val i = o.fields.indexWhere(_.name == name)
    if (i < 0) fail()
    i
  }

  def int64Values(b: Array[Byte], name: UTF8String): ArrayData =
    try {
      val o = parse(b)
      val i = fieldIndex(o, name.toString)
      if (o.fields(i).kind != "int" && o.fields(i).kind != "long") fail()
      new GenericArrayData(o.records.map(_(i)))
    } catch { case Malformed => null }

  def stringValues(b: Array[Byte], name: UTF8String): ArrayData =
    try {
      val o = parse(b)
      val i = fieldIndex(o, name.toString)
      if (o.fields(i).kind != "string") fail()
      new GenericArrayData(o.records.map(_(i)))
    } catch { case Malformed => null }

  def doubleValues(b: Array[Byte], name: UTF8String): ArrayData =
    try {
      val o = parse(b)
      val i = fieldIndex(o, name.toString)
      val k = o.fields(i).kind
      if (k != "double" && k != "float") fail()
      new GenericArrayData(o.records.map { r =>
        r(i) match {
          case null => null
          case f: java.lang.Float => java.lang.Double.valueOf(f.doubleValue())
          case d => d
        }
      })
    } catch { case Malformed => null }

  // ---- expressions ----

  case class AvroFileMeta(child: Expression) extends UnaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "avro_file_meta"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("n_records", LongType, nullable = false),
      StructField("n_blocks", IntegerType, nullable = false),
      StructField("codec", StringType),
      StructField("field_names", StringType)))
    override def nullSafeEval(v: Any): Any =
      AvroRead.fileMeta(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.AvroRead.fileMeta($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  abstract class AvroColumn extends BinaryExpression {
    override def nullable: Boolean = true
    def method: String
    def elemType: DataType
    override def dataType: DataType = ArrayType(elemType, containsNull = true)
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, string) inputs")
      }
    override def nullSafeEval(b: Any, c: Any): Any = method match {
      case "int64Values" => AvroRead.int64Values(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "stringValues" => AvroRead.stringValues(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "doubleValues" => AvroRead.doubleValues(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bytes, name) => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.AvroRead.$method($bytes, $name);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
  }

  case class AvroInt64Column(left: Expression, right: Expression)
      extends AvroColumn {
    override def method: String = "int64Values"
    override def elemType: DataType = LongType
    override def prettyName: String = "avro_int64_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class AvroStringColumn(left: Expression, right: Expression)
      extends AvroColumn {
    override def method: String = "stringValues"
    override def elemType: DataType = StringType
    override def prettyName: String = "avro_string_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class AvroDoubleColumn(left: Expression, right: Expression)
      extends AvroColumn {
    override def method: String = "doubleValues"
    override def elemType: DataType = DoubleType
    override def prettyName: String = "avro_double_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def fileMetaCol(c: Column): Column =
    SparkInternals.column(AvroFileMeta(SparkInternals.expression(c)))
  def int64ColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(AvroInt64Column(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def stringColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(AvroStringColumn(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def doubleColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(AvroDoubleColumn(
      SparkInternals.expression(content), SparkInternals.expression(name)))
}
