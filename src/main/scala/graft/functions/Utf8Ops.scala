package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level text hygiene for corpus ingestion — the ftfy/CCNet tier
  * every LLM data pipeline runs before anything else touches the
  * text:
  *
  *  - [[utf8Scan]]: STRICT UTF-8 validation (RFC 3629: overlongs,
  *    surrogate code points, > U+10FFFF, stray continuations and
  *    truncated sequences all invalid) with a repair that replaces
  *    each invalid BYTE with one U+FFFD (the per-byte policy, chosen
  *    over WHATWG maximal-subpart so the replacement count equals the
  *    invalid-byte count — restatable arithmetically by an oracle);
  *  - [[fixMojibake]]: reverses the classic double-encoding accident
  *    (UTF-8 bytes decoded as cp1252/Latin-1, "é" → "Ã©") by
  *    re-encoding through the cp1252 byte map and accepting the
  *    result only when it is strict UTF-8 with at least one multibyte
  *    sequence — plain ASCII and genuinely accented text are fixed
  *    points, so the repair is safe to run unconditionally.
  *
  * Both are map-side codegen'd expressions; nothing shuffles.
  */
object Utf8Ops {

  /** (is_valid, n_invalid_bytes, repaired) — repaired is the input
    * with every invalid byte replaced by U+FFFD. */
  def utf8Scan(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    var i = 0
    var bad = 0
    var sb: java.lang.StringBuilder = null // allocated on first defect
    def defect(upTo: Int): Unit = {
      if (sb == null) {
        sb = new java.lang.StringBuilder(b.length + 16)
        sb.append(new String(b, 0, i, java.nio.charset.StandardCharsets.UTF_8))
      }
      var k = i
      while (k < upTo) { sb.append('�'); bad += 1; k += 1 }
    }
    def emit(from: Int, until: Int): Unit =
      if (sb != null) sb.append(
        new String(b, from, until - from,
          java.nio.charset.StandardCharsets.UTF_8))
    while (i < b.length) {
      val c = b(i) & 0xFF
      val len =
        if (c < 0x80) 1
        else if (c < 0xC2) 0 // stray continuation or overlong C0/C1
        else if (c < 0xE0) 2
        else if (c < 0xF0) 3
        else if (c < 0xF5) 4
        else 0 // F5..FF can never appear
      var ok = len > 0 && i + len <= b.length
      if (ok && len > 1) {
        // continuation bytes, plus the second-byte tightenings that
        // exclude overlongs (E0 A0.., F0 90..), surrogates (ED 80-9F
        // only) and > U+10FFFF (F4 80-8F only)
        val c1 = if (i + 1 < b.length) b(i + 1) & 0xFF else 0
        val lo = c match {
          case 0xE0 => 0xA0
          case 0xF0 => 0x90
          case _    => 0x80
        }
        val hi = c match {
          case 0xED => 0x9F
          case 0xF4 => 0x8F
          case _    => 0xBF
        }
        ok = c1 >= lo && c1 <= hi
        var k = 2
        while (ok && k < len) {
          val ck = b(i + k) & 0xFF
          ok = ck >= 0x80 && ck <= 0xBF
          k += 1
        }
      }
      if (ok) { emit(i, i + len); i += len }
      else { defect(i + 1); i += 1 } // per-byte: advance one, one FFFD
    }
    if (sb == null)
      InternalRow(true, 0, UTF8String.fromBytes(b))
    else
      InternalRow(false, bad, UTF8String.fromString(sb.toString))
  }

  // cp1252: identical to Latin-1 except 0x80-0x9F, which carry the
  // Windows printables (the bytes real mojibake contains). The five
  // unassigned slots (81 8D 8F 90 9D) fall back to the Latin-1
  // control char so Latin-1 round-trips repair too.
  private val cp1252FromByte: Array[Char] = {
    val t = Array.tabulate[Char](256)(_.toChar)
    val win = Map(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ',
      0x84 -> '„', 0x85 -> '…', 0x86 -> '†',
      0x87 -> '‡', 0x88 -> 'ˆ', 0x89 -> '‰',
      0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’',
      0x93 -> '“', 0x94 -> '”', 0x95 -> '•',
      0x96 -> '–', 0x97 -> '—', 0x98 -> '˜',
      0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    win.foreach { case (b, ch) => t(b) = ch }
    t
  }
  // boxed key/value types ON PURPOSE: with primitive type params the
  // missing-key null would silently unbox to 0 (a NUL byte)
  private val byteFromChar: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    var i = 255
    while (i >= 0) {
      m.put(Character.valueOf(cp1252FromByte(i)),
        java.lang.Byte.valueOf(i.toByte))
      i -= 1
    }
    // "sloppy cp1252" (the ftfy convention): text garbled through a
    // strict Latin-1 reader shows the 0x80-0x9F bytes as C1 controls
    // instead of the Windows printables — accept either rendering
    i = 0x9F
    while (i >= 0x80) {
      m.putIfAbsent(Character.valueOf(i.toChar),
        java.lang.Byte.valueOf(i.toByte))
      i -= 1
    }
    m
  }

  /** Undo one level of UTF-8-read-as-cp1252/Latin-1 mojibake, or
    * return the input unchanged when the re-encoding is not possible
    * or does not yield strict multibyte UTF-8. */
  def fixMojibake(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    var i = 0
    var anyHigh = false
    val bytes = new Array[Byte](str.length)
    while (i < str.length) {
      val ch = str.charAt(i)
      val boxed = byteFromChar.get(ch)
      if (boxed == null) return s // unmappable char → not mojibake
      val b = boxed.byteValue()
      if ((b & 0x80) != 0) anyHigh = true
      bytes(i) = b
      i += 1
    }
    if (!anyHigh) return s // pure ASCII is a fixed point
    val scan = utf8Scan(bytes)
    if (!scan.getBoolean(0)) return s // not valid UTF-8 → genuine text
    val decoded = scan.getUTF8String(2)
    // require an actual multibyte sequence (the decode shrank), else
    // Latin-1 text that happens to re-validate would get corrupted
    if (decoded.numChars() < str.length) decoded else s
  }

  /** Encoding sniff — the chardet-lite step before [[utf8Scan]] can be
    * trusted: BOMs first (UTF-8 / UTF-16LE / UTF-16BE), then BOM-less
    * UTF-16 by the null-byte parity pattern (ASCII-ish text in UTF-16
    * puts zeros on one parity; ≥ 30% zeros with a ≥ 4:1 skew calls
    * it), then strict UTF-8 validity, then a control-byte density test
    * (> 5% non-tab/CR/LF controls = "binary"), else windows-1252 —
    * the de-facto single-byte fallback. Returns the label; see
    * [[decodeSniffed]] for the matching decode. */
  def sniffEncoding(b: Array[Byte]): UTF8String = {
    if (b == null) return null
    UTF8String.fromString(sniff(b))
  }

  private def sniff(b: Array[Byte]): String = {
    if (b.length == 0) return "empty"
    if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
      (b(2) & 0xFF) == 0xBF) return "utf-8-bom"
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE)
      return "utf-16le"
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      return "utf-16be"
    val n = math.min(b.length, 4096) & ~1
    if (n >= 8) {
      var zEven = 0; var zOdd = 0
      var i = 0
      while (i < n) {
        if (b(i) == 0) { if ((i & 1) == 0) zEven += 1 else zOdd += 1 }
        i += 1
      }
      val z = zEven + zOdd
      if (z * 10 >= n * 3) {
        if (zEven >= 4 * math.max(1, zOdd)) return "utf-16be"
        if (zOdd >= 4 * math.max(1, zEven)) return "utf-16le"
      }
    }
    // control density BEFORE utf-8 validity: a blob of low control
    // bytes is valid UTF-8 and still not text
    var ctl = 0
    var i = 0
    val m = math.min(b.length, 4096)
    while (i < m) {
      val c = b(i) & 0xFF
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r') ctl += 1
      i += 1
    }
    if (ctl * 20 > m) "binary"
    else if (utf8Scan(b).getBoolean(0)) "utf-8"
    else "windows-1252"
  }

  /** Decode through the sniffed encoding (BOMs stripped); "binary"
    * makes no text claim (null). */
  def decodeSniffed(b: Array[Byte]): UTF8String = {
    if (b == null) return null
    val s = sniff(b) match {
      case "empty" => ""
      case "utf-8-bom" =>
        new String(b, 3, b.length - 3,
          java.nio.charset.StandardCharsets.UTF_8)
      // Strip ONLY a full 2-byte BOM (matching the sniff's own BOM
      // test): the utf-16le/be label can also come from the BOM-less
      // zero-parity heuristic, and a BOM-less payload whose first code
      // unit merely STARTS with 0xFF/0xFE must keep its first char.
      case "utf-16le" =>
        val body = if (b.length >= 2 && (b(0) & 0xFF) == 0xFF &&
          (b(1) & 0xFF) == 0xFE) 2 else 0
        new String(b, body, (b.length - body) & ~1,
          java.nio.charset.StandardCharsets.UTF_16LE)
      case "utf-16be" =>
        val body = if (b.length >= 2 && (b(0) & 0xFF) == 0xFE &&
          (b(1) & 0xFF) == 0xFF) 2 else 0
        new String(b, body, (b.length - body) & ~1,
          java.nio.charset.StandardCharsets.UTF_16BE)
      case "utf-8" =>
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case "windows-1252" =>
        val sb = new java.lang.StringBuilder(b.length)
        var i = 0
        while (i < b.length) { sb.append(cp1252FromByte(b(i) & 0xFF)); i += 1 }
        sb.toString
      case _ => return null // binary
    }
    UTF8String.fromString(s)
  }

  // ---- expressions ----

  case class Utf8Scan(child: Expression) extends BinaryMeta.BinaryProbe {
    override def prettyName: String = "utf8_scan"
    override def dataType: DataType = StructType(Seq(
      StructField("is_valid", BooleanType, nullable = false),
      StructField("n_invalid", IntegerType, nullable = false),
      StructField("text", StringType, nullable = false)))
    override def nullSafeEval(v: Any): Any =
      utf8Scan(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.Utf8Ops.utf8Scan($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class FixMojibake(child: Expression) extends UnaryExpression {
    override def prettyName: String = "fix_mojibake"
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string input")
      }
    override def nullSafeEval(v: Any): Any =
      fixMojibake(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.Utf8Ops.fixMojibake($s);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class SniffEncoding(child: Expression) extends BinaryMeta.BinaryProbe {
    override def prettyName: String = "sniff_encoding"
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      sniffEncoding(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes =>
        s"${ev.value} = graft.functions.Utf8Ops.sniffEncoding($bytes);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class DecodeSniffed(child: Expression) extends BinaryMeta.BinaryProbe {
    override def prettyName: String = "decode_sniffed"
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      decodeSniffed(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.unsafe.types.UTF8String $r =
           |  graft.functions.Utf8Ops.decodeSniffed($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def utf8ScanCol(c: Column): Column =
    SparkInternals.column(Utf8Scan(SparkInternals.expression(c)))
  def fixMojibakeCol(c: Column): Column =
    SparkInternals.column(FixMojibake(SparkInternals.expression(c)))
  def sniffEncodingCol(c: Column): Column =
    SparkInternals.column(SniffEncoding(SparkInternals.expression(c)))
  def decodeSniffedCol(c: Column): Column =
    SparkInternals.column(DecodeSniffed(SparkInternals.expression(c)))
}
