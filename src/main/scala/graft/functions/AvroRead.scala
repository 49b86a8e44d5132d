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
  * Scope (= real event/table-metadata schemas): a top-level record
  * over the FULL schema tree — primitives, ["null", T] unions (either
  * order), nested records (any depth ≤ 32), arrays, string-keyed
  * maps, enums (read as their symbol), fixed, and named-type
  * references. RECURSIVE named types decline (a name only resolves
  * after its body parses — keeps decode total); so do multi-branch
  * unions, sync-marker mismatches, short blocks, bad codecs, and any
  * count claim past the shared 64 MiB bound (arrays/maps carry a
  * file-wide element budget plus per-block bytes/min-width caps).
  *
  * Faces mirror [[ParquetPages]]: per-field typed value arrays for
  * map-side aggregation (values never shuffle) with DOTTED PATHS
  * navigating nested records, list faces for array fields, a
  * string→long map face, plus a file-meta struct (record/block
  * counts, codec, field list). [[genericRecords]] exposes the whole
  * tree to the table-format planners (Iceberg manifests are nested
  * Avro records).
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

  private[graft] final class JsonP(s: String) {
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

  // ---- schema model (full tree: records / arrays / maps / enums /
  //      fixed / [null, T] unions, named-type references) ----

  private[functions] sealed abstract class AType {
    /** Minimum encoded bytes one value of this type consumes — the
      * claim-bomb floor for every count claim in the file. */
    val minBytes: Int
  }
  private[functions] final case class APrim(kind: String) extends AType {
    val minBytes: Int = kind match {
      case "null" => 0
      case "float" => 4
      case "double" => 8
      case _ => 1 // boolean, int, long, string, bytes (varint/len ≥ 1)
    }
  }
  private[functions] final class AField(val name: String, val t: AType)
  private[functions] final case class ARec(name: String,
      fields: Array[AField]) extends AType {
    val minBytes: Int = {
      val s = fields.foldLeft(0L)(_ + _.t.minBytes)
      if (s > (1 << 20)) fail() else s.toInt
    }
  }
  /** A ["null", T] union (either order). */
  private[functions] final case class AOpt(inner: AType,
      nullFirst: Boolean) extends AType {
    val minBytes: Int = 1
  }
  private[functions] final case class AArr(items: AType) extends AType {
    if (items.minBytes == 0) fail() // zero-width items = count bomb
    val minBytes: Int = 1 // the terminating 0 block count
  }
  private[functions] final case class AMap(values: AType) extends AType {
    val minBytes: Int = 1
  }
  private[functions] final case class AEnum(name: String,
      symbols: Array[String]) extends AType {
    val minBytes: Int = 1
  }
  private[functions] final case class AFixed(name: String,
      size: Int) extends AType {
    if (size < 0 || size > MaxOut) fail()
    val minBytes: Int = size
  }

  private val Prims = Set("null", "boolean", "int", "long", "float",
    "double", "string", "bytes")

  private type JMap = scala.collection.Map[String, Any]

  /** Parses one schema node. `reg` holds named types ALREADY completed
    * (registered after their body parses), so recursive types — which
    * would make decode non-total — reference an absent name and
    * decline. Depth-bounded like every parser here. */
  private def parseType(v: Any, reg: scala.collection.mutable.Map[String, AType],
                        ns: String, depth: Int): AType = {
    if (depth > 32) fail()
    v match {
      case s: String if Prims(s) => APrim(s)
      case s: String => // named-type reference (short or full name)
        reg.getOrElse(s, reg.getOrElse(if (ns.isEmpty) s else s"$ns.$s", fail()))
      case u: scala.collection.Seq[_] => // union: ["null", T] only
        if (u.length != 2) fail()
        val ts = u.map(parseType(_, reg, ns, depth + 1))
        val nullIdx = ts.indexWhere(_ == APrim("null"))
        if (nullIdx < 0) fail()
        val inner = ts(1 - nullIdx)
        if (inner == APrim("null")) fail()
        AOpt(inner, nullFirst = nullIdx == 0)
      case m0: scala.collection.Map[_, _] =>
        val m = m0.asInstanceOf[JMap]
        val ns1 = m.get("namespace") match {
          case Some(s: String) => s
          case _ => ns
        }
        m.get("type") match {
          case Some("record") =>
            val name = m.get("name") match {
              case Some(s: String) => s; case _ => fail()
            }
            val fs = m.get("fields") match {
              case Some(a: scala.collection.Seq[_]) => a
              case _ => fail()
            }
            if (fs.length > (1 << 12)) fail()
            val fields = fs.map {
              case fm0: scala.collection.Map[_, _] =>
                val fm = fm0.asInstanceOf[JMap]
                val fn = fm.get("name") match {
                  case Some(s: String) => s; case _ => fail()
                }
                new AField(fn,
                  parseType(fm.getOrElse("type", fail()), reg, ns1, depth + 1))
              case _ => fail()
            }.toArray
            val r = ARec(name, fields)
            reg(name) = r
            if (ns1.nonEmpty) reg(s"$ns1.$name") = r
            r
          case Some("array") =>
            AArr(parseType(m.getOrElse("items", fail()), reg, ns1, depth + 1))
          case Some("map") =>
            AMap(parseType(m.getOrElse("values", fail()), reg, ns1, depth + 1))
          case Some("enum") =>
            val name = m.get("name") match {
              case Some(s: String) => s; case _ => fail()
            }
            val syms = m.get("symbols") match {
              case Some(a: scala.collection.Seq[_]) =>
                if (a.length > (1 << 16)) fail()
                a.map { case s: String => s; case _ => fail() }.toArray
              case _ => fail()
            }
            val e = AEnum(name, syms)
            reg(name) = e
            if (ns1.nonEmpty) reg(s"$ns1.$name") = e
            e
          case Some("fixed") =>
            val name = m.get("name") match {
              case Some(s: String) => s; case _ => fail()
            }
            val size = m.get("size") match {
              case Some(l: java.lang.Long) => l.toInt
              case Some(d: java.lang.Double) => d.toInt
              case _ => fail()
            }
            val f = AFixed(name, size)
            reg(name) = f
            if (ns1.nonEmpty) reg(s"$ns1.$name") = f
            f
          case Some(s: String) if Prims(s) => APrim(s) // {"type":"long",...}
          case Some(other) => parseType(other, reg, ns1, depth + 1)
          case None => fail()
        }
      case _ => fail()
    }
  }

  /** Loud schema-tree parse for the writer side ([[AvroWrite]]). */
  private[functions] def schemaTree(json: String): ARec =
    try parseSchema(json)
    catch {
      case Malformed =>
        throw new IllegalArgumentException(s"unsupported Avro schema: " +
          json.take(200))
    }

  private def parseSchema(json: String): ARec = {
    if (json.length > (1 << 22)) fail()
    val reg = scala.collection.mutable.Map.empty[String, AType]
    parseType(new JsonP(json).parse(), reg, "", 0) match {
      case r: ARec => r
      case _ => fail() // OCF top level must be a record here
    }
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

  /** Tree decode with a FILE-WIDE element budget: every nested array /
    * map / record element spends against the shared 64 MiB cap, so no
    * combination of per-collection count claims can multiply past it.
    * Yields: prims boxed as in [[readPrim]], records as insertion-
    * ordered String→Any maps, arrays as ArrayBuffer[Any], maps as
    * String-keyed insertion-ordered maps, enums as their symbol
    * (UTF8String), fixed as raw bytes. */
  private final class Decoder {
    private var budget: Long = MaxOut

    def spend(n: Long): Unit = { budget -= n; if (budget < 0) fail() }

    def readValue(b: Bin, t: AType): Any = t match {
      case APrim(kind) => readPrim(b, kind)
      case AOpt(inner, nullFirst) =>
        val branch = b.zigzag()
        if (branch < 0 || branch > 1) fail()
        val isNull = if (nullFirst) branch == 0 else branch == 1
        if (isNull) null else readValue(b, inner)
      case ARec(_, fields) =>
        spend(fields.length.toLong)
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
        var i = 0
        while (i < fields.length) {
          m(fields(i).name) = readValue(b, fields(i).t)
          i += 1
        }
        m
      case AArr(items) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Any]
        readBlocks(b, items.minBytes) { () => out += readValue(b, items) }
        out
      case AMap(values) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
        readBlocks(b, 1 + values.minBytes) { () =>
          val k = readPrim(b, "string").asInstanceOf[UTF8String].toString
          m(k) = readValue(b, values)
        }
        m
      case AEnum(_, symbols) =>
        val ix = b.zigzag()
        if (ix < 0 || ix >= symbols.length) fail()
        UTF8String.fromString(symbols(ix.toInt))
      case AFixed(_, size) => b.bytes(size)
    }

    /** Avro block-sequence framing for arrays/maps: positive count, or
      * negative count followed by a byte size; 0 ends. Every claimed
      * count is bounded by the bytes still available / the item's
      * minimum width BEFORE any element decodes. */
    private def readBlocks(b: Bin, minItem: Int)(item: () => Unit): Unit = {
      var done = false
      while (!done) {
        var count = b.zigzag()
        if (count == 0) done = true
        else {
          if (count < 0) {
            val bytes = b.zigzag() // block byte size (skippable framing)
            if (bytes < 0 || bytes > MaxOut) fail()
            count = -count
          }
          if (count > (b.end - b.pos).toLong / math.max(1, minItem)) fail()
          spend(count)
          var i = 0L
          while (i < count) { item(); i += 1 }
        }
      }
    }
  }

  private final class Ocf(val root: ARec, val codec: String,
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
    val root = parseSchema(schemaJson)
    val fields = root.fields
    // claim-bomb bound: a record consumes at least root.minBytes encoded
    // bytes (nullable unions spend a branch byte; only bare "null"
    // fields are zero-width). A schema whose records decode to ZERO
    // bytes would let a tiny block claim count=MaxOut and materialize
    // ~67M empty rows before the exact-consumption check — reject it.
    val minRecordBytes = root.minBytes
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
      val dec = new Decoder
      var i = 0L
      while (i < count) {
        val row = new Array[Any](fields.length)
        var fi = 0
        while (fi < fields.length) {
          row(fi) = dec.readValue(rb, fields(fi).t)
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
    new Ocf(root, codec, out.toArray, nBlocks)
  }

  // ---- faces ----

  def fileMeta(b: Array[Byte]): InternalRow =
    try {
      val o = parse(b)
      InternalRow(o.records.length.toLong, o.nBlocks,
        UTF8String.fromString(o.codec),
        UTF8String.fromString(o.root.fields.map(_.name).sorted.mkString(",")))
    } catch { case Malformed => null }

  private def unwrap(t: AType): AType = t match {
    case AOpt(inner, _) => inner
    case other => other
  }

  /** Navigates a dotted path through (possibly nullable) nested
    * records: returns the leaf type and one value per record (null
    * propagates past a null record on the path). */
  private def extract(o: Ocf, path: String): (AType, Array[Any]) = {
    val parts = path.split('.')
    if (parts.isEmpty || parts.exists(_.isEmpty)) fail()
    val i0 = o.root.fields.indexWhere(_.name == parts(0))
    if (i0 < 0) fail()
    var t: AType = o.root.fields(i0).t
    var vs: Array[Any] = o.records.map(_(i0))
    var pi = 1
    while (pi < parts.length) {
      val rec = unwrap(t) match {
        case r: ARec => r
        case _ => fail()
      }
      val fi = rec.fields.indexWhere(_.name == parts(pi))
      if (fi < 0) fail()
      t = rec.fields(fi).t
      val name = parts(pi)
      vs = vs.map {
        case null => null
        case m: scala.collection.mutable.LinkedHashMap[_, _] =>
          m.asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
            .getOrElse(name, fail())
        case _ => fail()
      }
      pi += 1
    }
    (t, vs)
  }

  private def asDouble(v: Any): Any = v match {
    case null => null
    case f: java.lang.Float => java.lang.Double.valueOf(f.doubleValue())
    case d => d
  }

  private def leafKindOk(t: AType, kinds: Set[String]): Boolean =
    unwrap(t) match {
      case APrim(k) => kinds(k)
      case _: AEnum => kinds("string") // enums read as their symbol
      case _ => false
    }

  def int64Values(b: Array[Byte], name: UTF8String): ArrayData =
    try {
      val o = parse(b)
      val (t, vs) = extract(o, name.toString)
      if (!leafKindOk(t, Set("int", "long"))) fail()
      new GenericArrayData(vs)
    } catch { case Malformed => null }

  def stringValues(b: Array[Byte], name: UTF8String): ArrayData =
    try {
      val o = parse(b)
      val (t, vs) = extract(o, name.toString)
      if (!leafKindOk(t, Set("string"))) fail()
      new GenericArrayData(vs)
    } catch { case Malformed => null }

  def doubleValues(b: Array[Byte], name: UTF8String): ArrayData =
    try {
      val o = parse(b)
      val (t, vs) = extract(o, name.toString)
      if (!leafKindOk(t, Set("double", "float"))) fail()
      new GenericArrayData(vs.map(asDouble))
    } catch { case Malformed => null }

  /** ARRAY faces: the value at `path` must be an (optionally nullable)
    * array of the requested element kind; one inner array (or null)
    * per record. */
  private def listFace(b: Array[Byte], name: UTF8String,
                       kinds: Set[String], widen: Boolean): ArrayData =
    try {
      val o = parse(b)
      val (t, vs) = extract(o, name.toString)
      val items = unwrap(t) match {
        case AArr(it) => it
        case _ => fail()
      }
      if (!leafKindOk(items, kinds)) fail()
      new GenericArrayData(vs.map {
        case null => null
        case buf: scala.collection.mutable.ArrayBuffer[_] =>
          val a = buf.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
          new GenericArrayData(
            (if (widen) a.map(asDouble) else a).toArray)
        case _ => fail()
      })
    } catch { case Malformed => null }

  def int64ListValues(b: Array[Byte], name: UTF8String): ArrayData =
    listFace(b, name, Set("int", "long"), widen = false)
  def stringListValues(b: Array[Byte], name: UTF8String): ArrayData =
    listFace(b, name, Set("string"), widen = false)
  def doubleListValues(b: Array[Byte], name: UTF8String): ArrayData =
    listFace(b, name, Set("double", "float"), widen = true)

  /** MAP face: string→long map at `path` flattened to one sorted
    * key=value CSV string per record (deterministic, oracle-friendly). */
  def mapInt64Csv(b: Array[Byte], name: UTF8String): ArrayData =
    try {
      val o = parse(b)
      val (t, vs) = extract(o, name.toString)
      unwrap(t) match {
        case AMap(values) if leafKindOk(values, Set("int", "long")) => ()
        case _ => fail()
      }
      new GenericArrayData(vs.map {
        case null => null
        case m: scala.collection.mutable.LinkedHashMap[_, _] =>
          UTF8String.fromString(
            m.asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
              .toSeq.sortBy(_._1)
              .map { case (k, v) => s"$k=$v" }.mkString(","))
        case _ => fail()
      })
    } catch { case Malformed => null }

  /** Whole-file generic decode for table-format planners (the Iceberg
    * manifest tier): top-level records as String→Any maps with nested
    * records/arrays/maps as in [[Decoder]]. LOUD on malformed input —
    * a planner must never silently skip a manifest. */
  private[graft] def genericRecords(b: Array[Byte])
      : Array[scala.collection.Map[String, Any]] =
    try {
      val o = parse(b)
      o.records.map { row =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
        var i = 0
        while (i < o.root.fields.length) {
          m(o.root.fields(i).name) = row(i)
          i += 1
        }
        m: scala.collection.Map[String, Any]
      }
    } catch {
      case Malformed =>
        throw new IllegalArgumentException("malformed Avro object container file")
    }

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
      case "int64ListValues" => AvroRead.int64ListValues(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "stringListValues" => AvroRead.stringListValues(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "doubleListValues" => AvroRead.doubleListValues(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "mapInt64Csv" => AvroRead.mapInt64Csv(
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

  case class AvroInt64ListColumn(left: Expression, right: Expression)
      extends AvroColumn {
    override def method: String = "int64ListValues"
    override def elemType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "avro_int64_list_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class AvroStringListColumn(left: Expression, right: Expression)
      extends AvroColumn {
    override def method: String = "stringListValues"
    override def elemType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "avro_string_list_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class AvroDoubleListColumn(left: Expression, right: Expression)
      extends AvroColumn {
    override def method: String = "doubleListValues"
    override def elemType: DataType = ArrayType(DoubleType, containsNull = true)
    override def prettyName: String = "avro_double_list_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class AvroMapInt64Csv(left: Expression, right: Expression)
      extends AvroColumn {
    override def method: String = "mapInt64Csv"
    override def elemType: DataType = StringType
    override def prettyName: String = "avro_map_int64_csv"
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
  def int64ListColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(AvroInt64ListColumn(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def stringListColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(AvroStringListColumn(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def doubleListColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(AvroDoubleListColumn(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def mapInt64CsvCol(content: Column, name: Column): Column =
    SparkInternals.column(AvroMapInt64Csv(
      SparkInternals.expression(content), SparkInternals.expression(name)))
}
