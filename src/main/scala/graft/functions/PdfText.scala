package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PDF text + metadata extraction over opaque `binary` columns — the
  * one document container every real corpus carries that the engine
  * could not read before round 14. Pure public-spec byte arithmetic
  * (ISO 32000-1 / the classic Adobe PDF 1.x layout), the same
  * total-parser pattern as the rest of the container tier: any
  * malformed, truncated, or foreign input yields null, never an
  * exception.
  *
  * Subset (documented, spec-tested):
  *   - cross-reference TABLES and (PDF 1.5+) cross-reference STREAMS
  *     (`/Type /XRef`: `/W` field widths, `/Index` subsections, PNG
  *     predictors 10–15 via `/DecodeParms`), walked from `startxref`
  *     through `/Prev` chains — the two forms chain freely, and a
  *     hybrid file's `/XRefStm` side pointer is followed too; a broken
  *     xref falls back to a linear `N G obj` scan (later definitions of
  *     an object number win — incremental-update order);
  *   - `/Type /ObjStm` compressed object streams: type-2 xref entries
  *     resolve through the decoded stream's `N` (objnum, offset) header
  *     pairs, so post-1.5 catalogs/pages packed into object streams are
  *     fully reachable;
  *   - the page tree from trailer `/Root` → `/Pages` → `/Kids`
  *     (bounded depth), `/Contents` as one ref or an array; when the
  *     tree is unreachable, text falls back to every visible stream
  *     that decodes and contains a `BT` text object;
  *   - stream filters: none, or `/FlateDecode` through the JDK's
  *     public `java.util.zip.Inflater` (the gunzip-members precedent);
  *     any other filter makes that stream non-extractable (skipped);
  *   - text operators inside `BT…ET`: `Tj`, `'`, `"`, `TJ` (kerning
  *     numbers ignored), with `Td`/`TD`/`T*`/`'`/`"` starting a new
  *     output line; literal strings with the full escape set (octal,
  *     line continuations, nested parens) and hex strings, decoded
  *     byte-per-char — the standard-font/Latin-1 subset (no embedded
  *     CMap/ToUnicode remapping: composite-font bytes surface
  *     verbatim);
  *   - DECLINE CONTRACTS (narrowed in round 15 to encryption +
  *     non-Flate filters): an `/Encrypt` entry in any trailer — classic
  *     or xref-stream — makes `pdfText` null and `pdfMeta.encrypted`
  *     true (content strings are RC4/AES material — extracting them
  *     would emit garbage); a stream behind any filter other than
  *     none/FlateDecode is non-extractable (skipped).
  *
  * `pdfMeta` returns (version, n_pages, n_objects, encrypted, title,
  * producer) — title/producer from the trailer `/Info` dictionary,
  * UTF-16BE BOM honored, PDFDocEncoding approximated as Latin-1.
  *
  * Reference scope: gmall-flink carries no binary documents at all;
  * this is a beyond-reference corpus operator (SURVEY §2.10).
  */
object PdfText {

  // ---------- minimal object model ----------

  private sealed trait V
  private final case class VNum(d: Double) extends V
  private final case class VStr(bytes: Array[Byte]) extends V
  private final case class VName(s: String) extends V
  private final case class VArr(xs: List[V]) extends V
  private final case class VDict(m: Map[String, V]) extends V
  private final case class VRef(n: Int, g: Int) extends V
  private final case object VOther extends V

  private final class Lexer(val b: Array[Byte], var pos: Int) {
    def eof: Boolean = pos >= b.length
    def peek: Int = if (eof) -1 else b(pos) & 0xff
    private def isWs(c: Int) =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    private def isDelim(c: Int) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to EOL
          while (!eof && peek != '\n' && peek != '\r') pos += 1
        } else go = false
      }
    }
    /** Bare keyword/number token (not strings/names/structures). */
    def readToken(): String = {
      skipWs()
      val start = pos
      while (!eof && !isWs(peek) && !isDelim(peek)) pos += 1
      new String(b, start, pos - start, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    def readName(): String = { // caller consumed '/'
      val start = pos
      while (!eof && !isWs(peek) && !isDelim(peek)) pos += 1
      new String(b, start, pos - start, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    /** Literal string, caller consumed '('. Resolves the escape set. */
    def readLiteralString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (!eof && depth > 0) {
        val c = b(pos) & 0xff; pos += 1
        if (c == '\\' && !eof) {
          val e = b(pos) & 0xff; pos += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (!eof && peek == '\n') pos += 1 // continuation
            case '\n' => // continuation
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'; var k = 0
              while (k < 2 && !eof && peek >= '0' && peek <= '7') {
                v = v * 8 + (peek - '0'); pos += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other) // unknown escape: the char itself
          }
        } else if (c == '(') { depth += 1; out.write(c) }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c) }
        else out.write(c)
      }
      out.toByteArray
    }
    /** Hex string, caller consumed '<' (and peek is not '<'). */
    def readHexString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var go = true
      while (go && !eof) {
        val c = b(pos) & 0xff; pos += 1
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else if (c == '>') { go = false; -1 }
          else -1
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd count: trailing 0 nibble
      out.toByteArray
    }
  }

  /** One value at the lexer head; depth-bounded; VOther on anything
    * unparseable (the lexer still advances, keeping the walk total). */
  private def parseValue(lx: Lexer, depth: Int): V = {
    if (depth > 32) return VOther
    lx.skipWs()
    if (lx.eof) return VOther
    lx.peek match {
      case '/' => lx.pos += 1; VName(lx.readName())
      case '(' => lx.pos += 1; VStr(lx.readLiteralString())
      case '[' =>
        lx.pos += 1
        val buf = List.newBuilder[V]
        var n = 0
        lx.skipWs()
        while (!lx.eof && lx.peek != ']' && n < 8192) {
          buf += parseValue(lx, depth + 1); n += 1; lx.skipWs()
        }
        if (!lx.eof && lx.peek == ']') lx.pos += 1
        VArr(buf.result())
      case '<' =>
        if (lx.pos + 1 < lx.b.length && (lx.b(lx.pos + 1) & 0xff) == '<') {
          lx.pos += 2
          val m = Map.newBuilder[String, V]
          var n = 0
          var go = true
          while (go && n < 4096) {
            lx.skipWs()
            if (lx.eof) go = false
            else if (lx.peek == '>') {
              lx.pos += 1
              if (!lx.eof && lx.peek == '>') lx.pos += 1
              go = false
            } else if (lx.peek == '/') {
              lx.pos += 1
              val k = lx.readName()
              m += k -> parseValue(lx, depth + 1)
              n += 1
            } else { parseValue(lx, depth + 1); n += 1 } // stray value
          }
          VDict(m.result())
        } else { lx.pos += 1; VStr(lx.readHexString()) }
      case ']' | '>' | ')' => lx.pos += 1; VOther
      case c if (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.' =>
        val save = lx.pos
        val t = lx.readToken()
        val n1 = numOf(t)
        if (n1.isEmpty) return VOther
        // integer may head a `n g R` reference — look ahead, restore on miss
        if (t.forall(ch => ch >= '0' && ch <= '9')) {
          val p1 = lx.pos
          val t2 = lx.readToken()
          if (t2.nonEmpty && t2.forall(ch => ch >= '0' && ch <= '9')) {
            val p2 = lx.pos
            val t3 = lx.readToken()
            if (t3 == "R") return VRef(t.toLong.min(Int.MaxValue).toInt,
              t2.toLong.min(Int.MaxValue).toInt)
            lx.pos = p2
          }
          lx.pos = p1
          val _ = save
        }
        VNum(n1.get)
      case _ =>
        val t = lx.readToken()
        if (t.isEmpty) { lx.pos += 1; VOther } // unknown delimiter: step over
        else VOther // true/false/null/keywords
    }
  }

  private def numOf(s: String): Option[Double] =
    try { if (s.isEmpty) None else Some(java.lang.Double.parseDouble(s)) }
    catch { case _: NumberFormatException => None }

  // ---------- document structure ----------

  private def isPdf(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' &&
      b(3) == 'F' && b(4) == '-'

  private def findBytes(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = b.length - pat.length
    while (i <= last) {
      var k = 0
      while (k < pat.length && b(i + k) == pat(k)) k += 1
      if (k == pat.length) return i
      i += 1
    }
    -1
  }

  private val OBJ = "obj".getBytes
  private val TRAILER = "trailer".getBytes
  private val STARTXREF = "startxref".getBytes
  private val XREF = "xref".getBytes
  private val STREAM = "stream".getBytes
  private val ENDSTREAM = "endstream".getBytes

  /** Linear `N G obj` scan — the fallback ground truth (later
    * definitions win, matching incremental-update semantics). Returns
    * objNum → offset of the byte AFTER `obj`. */
  private def scanObjects(b: Array[Byte]): Map[Int, Int] = {
    var out = Map.empty[Int, Int]
    var i = 0
    var guard = 0
    while (i >= 0 && guard < 65536) {
      i = findBytes(b, OBJ, i)
      if (i >= 0) {
        val after = i + 3
        // token-bounded: `obj` must end at ws/delimiter
        val okEnd = after >= b.length || {
          val c = b(after) & 0xff
          c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '<' ||
            c == '[' || c == '(' || c == '/' || c == '%'
        }
        // walk back over: ws, gen digits, ws, obj-num digits
        var p = i - 1
        def back(pred: Int => Boolean): Int = {
          var n = 0
          while (p >= 0 && pred(b(p) & 0xff)) { p -= 1; n += 1 }
          n
        }
        val ws1 = back(c => c == ' ' || c == '\n' || c == '\r' || c == '\t')
        val gd = back(c => c >= '0' && c <= '9')
        val ws2 = back(c => c == ' ' || c == '\n' || c == '\r' || c == '\t')
        val ns = p + 1
        val nd = back(c => c >= '0' && c <= '9')
        if (okEnd && ws1 > 0 && gd > 0 && ws2 > 0 && nd > 0 && nd <= 9) {
          val num = new String(b, ns - nd, nd,
            java.nio.charset.StandardCharsets.ISO_8859_1).toInt
          out += num -> after
        }
        i = after
        guard += 1
      }
    }
    out
  }

  /** Parse a `N G obj` header at `off`; Some(objNum, offset after the
    * `obj` keyword) when well-formed. */
  private def objHeaderAt(b: Array[Byte], off: Int): Option[(Int, Int)] = {
    val lx = new Lexer(b, off)
    val t1 = lx.readToken()
    if (t1.isEmpty || !t1.forall(c => c >= '0' && c <= '9') ||
        t1.length > 9) return None
    val t2 = lx.readToken()
    if (t2.isEmpty || !t2.forall(c => c >= '0' && c <= '9')) return None
    if (lx.readToken() != "obj") return None
    Some((t1.toInt, lx.pos))
  }

  /** Where a cross-reference entry says an object lives: at a byte
    * offset in the file (validated against the `N G obj` header
    * there), or at index `idx` of compressed object stream `stm`. */
  private sealed trait XEntry
  private final case class XFile(afterObj: Int) extends XEntry
  private final case class XStm(stm: Int, idx: Int) extends XEntry

  /** Big-endian unsigned field of `width` bytes (width 0 → 0). */
  private def readBE(d: Array[Byte], at: Int, width: Int): Long = {
    var v = 0L
    var i = 0
    while (i < width) { v = (v << 8) | (d(at + i) & 0xffL); i += 1 }
    v
  }

  /** PNG predictor reconstruction for `/DecodeParms` (10–15 = per-row
    * filter byte, spec §7.4.4.4 via PNG §9.2; 1/absent = passthrough;
    * TIFF predictor 2 and sub-byte components decline). Row width is
    * Columns·Colors·BitsPerComponent/8 bytes. */
  private def unpredict(data: Array[Byte],
                        parms: Map[String, V]): Option[Array[Byte]] = {
    def intOf(k: String, dflt: Int) = parms.get(k) match {
      case Some(VNum(x)) => x.toInt
      case _ => dflt
    }
    val pred = intOf("Predictor", 1)
    if (pred == 1) return Some(data)
    if (pred < 10 || pred > 15) return None
    val bpc = intOf("BitsPerComponent", 8)
    if (bpc % 8 != 0 || bpc <= 0) return None
    val bpp = math.max(1, intOf("Colors", 1) * (bpc / 8))
    val cols = intOf("Columns", 1).toLong * bpp
    if (cols <= 0 || cols > (1 << 24)) return None
    val rowLen = cols.toInt + 1
    if (data.length == 0 || data.length % rowLen != 0) return None
    val rows = data.length / rowLen
    val c0 = cols.toInt
    val out = new Array[Byte](rows * c0)
    var r = 0
    while (r < rows) {
      val ft = data(r * rowLen) & 0xff
      var c = 0
      while (c < c0) {
        val raw = data(r * rowLen + 1 + c) & 0xff
        val left = if (c >= bpp) out(r * c0 + c - bpp) & 0xff else 0
        val up = if (r > 0) out((r - 1) * c0 + c) & 0xff else 0
        val ul = if (r > 0 && c >= bpp) out((r - 1) * c0 + c - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(r * c0 + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    Some(out)
  }

  /** Filter + predictor decode shared by in-document streams and the
    * xref-stream parser (which has no object table yet, so `resolveV`
    * there only passes direct values through). */
  private def decodeStreamBytes(m: Map[String, V], raw: Array[Byte],
                                resolveV: V => Option[V]): Option[Array[Byte]] = {
    val parms: Map[String, V] =
      resolveV(m.getOrElse("DecodeParms", m.getOrElse("DP", VOther))) match {
        case Some(VDict(p)) => p
        case Some(VArr(List(VDict(p)))) => p
        case _ => Map.empty
      }
    resolveV(m.getOrElse("Filter", VName("__none"))) match {
      case Some(VName("__none")) => Some(raw)
      case Some(VName("FlateDecode")) |
           Some(VArr(List(VName("FlateDecode")))) =>
        inflate(raw).flatMap(unpredict(_, parms))
      case _ => None
    }
  }

  /** Dict + raw stream bytes of the object whose body starts at
    * `afterObj`; `/Length` honored when `resolveLen` can make it a
    * sane direct number, else `endstream`-bounded. */
  private def rawStreamAt(b: Array[Byte], afterObj: Int,
                          resolveLen: V => Option[Long])
      : Option[(Map[String, V], Array[Byte])] = {
    val lx = new Lexer(b, afterObj)
    parseValue(lx, 0) match {
      case VDict(m) =>
        val sAt = findBytes(b, STREAM, lx.pos)
        if (sAt < 0 || sAt - lx.pos > 64) None
        else {
          var d = sAt + STREAM.length
          if (d < b.length && b(d) == '\r') d += 1
          if (d < b.length && b(d) == '\n') d += 1
          val len = resolveLen(m.getOrElse("Length", VOther)) match {
            case Some(l) if l >= 0 && d + l <= b.length => l
            case _ => -1L
          }
          val esAfterLen =
            if (len >= 0) findBytes(b, ENDSTREAM, (d + len).toInt)
            else -1
          val end =
            if (len >= 0 && esAfterLen >= 0 && esAfterLen - (d + len) <= 2)
              d + len.toInt
            else {
              val e = findBytes(b, ENDSTREAM, d)
              if (e < 0) return None
              // the spec puts an EOL before endstream; strip one
              var ee = e
              if (ee > d && b(ee - 1) == '\n') ee -= 1
              if (ee > d && b(ee - 1) == '\r') ee -= 1
              ee
            }
          Some((m, java.util.Arrays.copyOfRange(b, d, end)))
        }
      case _ => None
    }
  }

  /** `/Type /XRef` stream whose `N G obj` header starts at `objOff`:
    * (entries, stream dict — which doubles as the trailer). `/Length`
    * and `/Filter` must be direct here (there is no object table to
    * resolve references against yet — universally true of real files,
    * which is why the spec requires the xref stream be readable
    * standalone). */
  private def parseXrefStream(b: Array[Byte], objOff: Int)
      : Option[(Map[Int, XEntry], Map[String, V])] = {
    val (_, after) = objHeaderAt(b, objOff).getOrElse(return None)
    val (m, raw) = rawStreamAt(b, after, {
      case VNum(l) => Some(l.toLong)
      case _ => None
    }).getOrElse(return None)
    if (!m.get("Type").contains(VName("XRef"))) return None
    val data = decodeStreamBytes(m, raw, v => Some(v)).getOrElse(return None)
    val w: Array[Int] = m.get("W") match {
      case Some(VArr(ws)) if ws.length >= 3 &&
          ws.take(3).forall(_.isInstanceOf[VNum]) =>
        val a = ws.take(3).map { case VNum(x) => x.toInt; case _ => -1 }.toArray
        if (a.exists(x => x < 0 || x > 8)) return None
        a
      case _ => return None
    }
    val size = m.get("Size") match {
      case Some(VNum(s)) if s >= 0 => s.toLong
      case _ => return None
    }
    val index: List[(Long, Long)] = m.get("Index") match {
      case Some(VArr(xs)) if xs.length % 2 == 0 &&
          xs.forall(_.isInstanceOf[VNum]) =>
        xs.map { case VNum(x) => x.toLong; case _ => -1L }
          .grouped(2).collect { case List(a, c) => (a, c) }.toList
      case None => List((0L, size))
      case _ => return None
    }
    val rowLen = w.sum
    if (rowLen <= 0) return None
    var entries = Map.empty[Int, XEntry]
    var p = 0
    var total = 0L
    for ((start, count) <- index) {
      if (start < 0 || count < 0) return None
      total += count
      if (total > (1L << 20)) return None
      var k = 0L
      while (k < count) {
        if (p + rowLen > data.length) return None
        val f1 = if (w(0) == 0) 1L else readBE(data, p, w(0))
        val f2 = readBE(data, p + w(0), w(1))
        val f3 = readBE(data, p + w(0) + w(1), w(2))
        val objNum = (start + k).toInt
        f1 match {
          case 1 => // in file at offset f2 — header-validated, like tables
            if (f2 >= 0 && f2 < b.length && !entries.contains(objNum))
              objHeaderAt(b, f2.toInt).foreach { case (n, a) =>
                if (n == objNum) entries += objNum -> XFile(a)
              }
          case 2 =>
            if (f2 <= Int.MaxValue && f3 <= Int.MaxValue &&
                !entries.contains(objNum))
              entries += objNum -> XStm(f2.toInt, f3.toInt)
          case _ => // 0 = free; unknown types skipped per spec
        }
        p += rowLen
        k += 1
      }
    }
    Some((entries, m))
  }

  /** Cross-reference walk from `startxref`: classic TABLES and xref
    * STREAMS chained freely through `/Prev`, hybrid `/XRefStm` side
    * pointers followed (before `/Prev`, per spec — first-seen wins).
    * Returns (entries, trailer/stream dicts oldest..newest); None on
    * anything unexpected — the linear scan is the fallback. */
  private def xrefEntries(b: Array[Byte])
      : Option[(Map[Int, XEntry], List[Map[String, V]])] = {
    val sx = lastIndexOfBytes(b, STARTXREF)
    if (sx < 0) return None
    val lx0 = new Lexer(b, sx + STARTXREF.length)
    val off0 = numOf(lx0.readToken()).getOrElse(return None)
    var entries = Map.empty[Int, XEntry]
    var dictsOldestFirst = List.empty[Map[String, V]] // prepend per hop: hops run newest-first
    var queue = List(off0.toLong)
    var hops = 0
    while (queue.nonEmpty && hops < 32) {
      val next = queue.head
      queue = queue.tail
      hops += 1
      if (next < 0 || next > b.length - 4) return None
      val lx = new Lexer(b, next.toInt)
      val save = lx.pos
      if (lx.readToken() == "xref") {
        // ---- classic table ----
        var go = true
        while (go) {
          lx.skipWs()
          val s2 = lx.pos
          val t = lx.readToken()
          if (t == "trailer" || t.isEmpty) { lx.pos = s2; go = false }
          else {
            val start = numOf(t).getOrElse(return None).toLong
            val count = numOf(lx.readToken()).getOrElse(return None).toLong
            if (count < 0 || count > 65536) return None
            var k = 0L
            while (k < count) {
              lx.skipWs()
              if (lx.pos + 18 > b.length) return None
              val off = new String(b.slice(lx.pos, lx.pos + 10)).trim
              val typ = b(lx.pos + 17)
              if (typ == 'n') {
                val objNum = (start + k).toInt
                // first-seen wins across hops (newest xref first); an
                // entry only counts when the object header AT the
                // offset declares the same number (tolerant-reader
                // validation — stale/corrupt tables lose to the scan)
                if (!entries.contains(objNum))
                  numOf(off).foreach { o =>
                    if (o >= 0 && o < b.length)
                      objHeaderAt(b, o.toInt).foreach { case (n, after) =>
                        if (n == objNum) entries += objNum -> XFile(after)
                      }
                  }
              }
              lx.pos += 20
              k += 1
            }
          }
        }
        if (lx.readToken() != "trailer")
          return Some((entries, dictsOldestFirst))
        parseValue(lx, 0) match {
          case VDict(m) =>
            dictsOldestFirst ::= m
            // hybrid files: /XRefStm points at a stream whose entries
            // SUPERSEDE this table's /Prev chain — queue it first
            val stm = m.get("XRefStm") match {
              case Some(VNum(p)) => List(p.toLong)
              case _ => Nil
            }
            val prev = m.get("Prev") match {
              case Some(VNum(p)) => List(p.toLong)
              case _ => Nil
            }
            queue = stm ++ prev ++ queue
          case _ =>
        }
      } else {
        // ---- xref STREAM ----
        lx.pos = save
        val (es, m) = parseXrefStream(b, next.toInt).getOrElse(return None)
        es.foreach { case (n, e) =>
          if (!entries.contains(n)) entries += n -> e
        }
        dictsOldestFirst ::= m
        m.get("Prev") match {
          case Some(VNum(p)) => queue = p.toLong :: queue
          case _ =>
        }
      }
    }
    Some((entries, dictsOldestFirst))
  }

  private def lastIndexOfBytes(b: Array[Byte], pat: Array[Byte]): Int = {
    var best = -1
    var i = 0
    while (i >= 0) {
      i = findBytes(b, pat, i)
      if (i >= 0) { best = i; i += 1 }
    }
    best
  }

  /** Last occurrence of `pat` strictly before index `before`. */
  private def findBytesBefore(b: Array[Byte], pat: Array[Byte],
                              before: Int): Int = {
    var i = math.min(before, b.length) - pat.length
    while (i >= 0) {
      var k = 0
      while (k < pat.length && b(i + k) == pat(k)) k += 1
      if (k == pat.length) return i
      i -= 1
    }
    -1
  }

  /** Every trailer dict in the file (classic layout); newest last.
    * Scanned BACKWARDS from the end so the guard caps the 64 NEWEST
    * occurrences: real trailers live at the end of the file (each
    * incremental update appends one), while an uncompressed content
    * stream whose page text happens to contain the word `trailer`
    * many times sits before them — a forward scan would burn the
    * guard on those in-stream decoys and miss the real trailer,
    * losing /Encrypt (the decline contract) and /Root//Info. */
  private def trailerDicts(b: Array[Byte]): List[Map[String, V]] = {
    var out = List.empty[Map[String, V]]
    var i = b.length
    var guard = 0
    while (i >= 0 && guard < 64) {
      i = findBytesBefore(b, TRAILER, i)
      if (i >= 0) {
        val lx = new Lexer(b, i + TRAILER.length)
        parseValue(lx, 0) match {
          case VDict(m) => out = m :: out
          case _ =>
        }
        guard += 1
      }
    }
    out
  }

  private final class Doc(val b: Array[Byte]) {
    private val scanned: Map[Int, Int] = scanObjects(b)
    private val xref: (Map[Int, XEntry], List[Map[String, V]]) =
      xrefEntries(b).getOrElse((Map.empty, Nil))
    private val xrefFile: Map[Int, Int] =
      xref._1.collect { case (n, XFile(a)) => n -> a }
    private val inStm: Map[Int, (Int, Int)] =
      xref._1.collect { case (n, XStm(s, i)) => n -> (s, i) }
    /** File-resident objects (stream payloads can only live here):
      * xref is authoritative where it resolves; the scan fills holes
      * (objects reachable but unlisted — tolerant-reader behavior). */
    val objs: Map[Int, Int] = scanned ++ xrefFile
    /** Every object number any tier knows about (for n_objects). */
    def allObjNums: Set[Int] = scanned.keySet ++ xref._1.keySet
    /** Classic `trailer` dicts, then xref-stream dicts (which double
      * as trailers in 1.5+ files) — newest LAST either way. */
    val trailers: List[Map[String, V]] = trailerDicts(b) ++ xref._2
    val encrypted: Boolean = trailers.exists(_.contains("Encrypt"))

    /** Object body value: xref file entries first, then compressed
      * (ObjStm) entries, then the linear scan. */
    def objValue(n: Int): Option[V] =
      xrefFile.get(n).map(off => parseValue(new Lexer(b, off), 0))
        .orElse(inStm.get(n).flatMap { case (s, i) => objStmValue(s, i, n) })
        .orElse(scanned.get(n).map(off => parseValue(new Lexer(b, off), 0)))

    def resolve(v: V, depth: Int = 0): Option[V] = v match {
      case VRef(n, _) if depth < 16 =>
        objValue(n).flatMap(resolve(_, depth + 1))
      case other => Some(other)
    }

    /** Raw stream bytes of object `n` (after `stream` EOL, `/Length`
      * honored when it resolves sane, else `endstream`-bounded). */
    def streamData(n: Int): Option[(Map[String, V], Array[Byte])] =
      objs.get(n).flatMap { off =>
        rawStreamAt(b, off, v => resolve(v) match {
          case Some(VNum(l)) => Some(l.toLong)
          case _ => None
        })
      }

    /** Decoded stream: no filter passes through; FlateDecode inflates
      * (+ PNG predictors via /DecodeParms); anything else is
      * non-extractable. */
    def decodedStream(n: Int): Option[Array[Byte]] =
      streamData(n).flatMap { case (m, raw) =>
        decodeStreamBytes(m, raw, resolve(_))
      }

    // ---- /Type /ObjStm: decoded once per stream, cycle-guarded ----
    private val stmCache = scala.collection.mutable.Map
      .empty[Int, Option[(Array[Int], Array[Int], Array[Byte], Int)]]
    private val stmInProgress = scala.collection.mutable.Set.empty[Int]

    /** (objNums, offsets, decoded data, /First) of object stream `s`.
      * The in-progress guard declines a malicious stream whose own
      * /Length or /Filter is a reference back into itself. */
    private def objStm(s: Int)
        : Option[(Array[Int], Array[Int], Array[Byte], Int)] =
      stmCache.getOrElse(s, {
        if (!stmInProgress.add(s)) None
        else try {
          val r = for {
            md <- streamData(s)
            if resolve(md._1.getOrElse("Type", VOther))
              .contains(VName("ObjStm"))
            data <- decodeStreamBytes(md._1, md._2, resolve(_))
            n <- resolve(md._1.getOrElse("N", VOther))
              .collect { case VNum(x) if x >= 0 && x <= 65536 => x.toInt }
            first <- resolve(md._1.getOrElse("First", VOther))
              .collect { case VNum(x) if x >= 0 && x <= data.length => x.toInt }
            pairs <- {
              val lx = new Lexer(data, 0)
              val nums = new Array[Int](n)
              val offs = new Array[Int](n)
              var ok = true
              var i = 0
              while (ok && i < n) {
                val a = numOf(lx.readToken())
                val o = numOf(lx.readToken())
                if (a.isEmpty || o.isEmpty || lx.pos > first) ok = false
                else { nums(i) = a.get.toInt; offs(i) = o.get.toInt; i += 1 }
              }
              if (ok) Some((nums, offs)) else None
            }
          } yield (pairs._1, pairs._2, data, first)
          stmCache(s) = r
          r
        } finally stmInProgress.remove(s)
      })

    /** Value of the object at index `idx` of stream `s` — only when
      * the stream's own header agrees it holds object `expect`
      * (tolerant-reader validation, like the file-offset check). */
    private def objStmValue(s: Int, idx: Int, expect: Int): Option[V] =
      objStm(s).flatMap { case (nums, offs, data, first) =>
        if (idx < 0 || idx >= nums.length || nums(idx) != expect) None
        else {
          val off = first.toLong + offs(idx)
          if (off < 0 || off >= data.length) None
          else Some(parseValue(new Lexer(data, off.toInt), 0))
        }
      }

    /** `/Type /Page` objects in page-tree order (trailer → Root →
      * Kids), falling back to file order of visible Page objects. */
    def pageObjects: List[Int] = {
      val viaTree = for {
        t <- trailers.lastOption
        rootRef <- t.get("Root")
        root <- resolve(rootRef)
        m <- Some(root).collect { case VDict(d) => d }
        pagesRef <- m.get("Pages")
      } yield walkKids(pagesRef, 0)
      viaTree.filter(_.nonEmpty).getOrElse {
        objs.toList.sortBy(_._2).collect {
          case (n, _) if objValue(n).exists {
            case VDict(m) => m.get("Type").contains(VName("Page"))
            case _ => false
          } => n
        }
      }
    }

    private def walkKids(v: V, depth: Int): List[Int] = v match {
      case VRef(n, _) if depth < 32 =>
        objValue(n) match {
          case Some(VDict(m)) if m.get("Type").contains(VName("Page")) => List(n)
          case Some(VDict(m)) =>
            m.get("Kids") match {
              case Some(VArr(kids)) => kids.flatMap(walkKids(_, depth + 1))
              case _ => Nil
            }
          case _ => Nil
        }
      case _ => Nil
    }

    /** Content-stream object numbers of a page (`/Contents` ref or
      * array of refs). */
    def contentsOf(page: Int): List[Int] =
      objValue(page) match {
        case Some(VDict(m)) => m.get("Contents") match {
          case Some(VRef(n, _)) => List(n)
          case Some(VArr(xs)) => xs.collect { case VRef(n, _) => n }
          case _ => Nil
        }
        case _ => Nil
      }
  }

  /** Largest decoded stream accepted: 64 MiB — the same per-blob
    * ratio-bomb bound as gunzipMembers. A 100 KB deflate stream that
    * claims to expand past it is a zip bomb, not a content stream. */
  private val MaxInflated: Long = 1L << 26

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(math.max(64, raw.length * 3))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None // needs dict / truncated
        if (out.size().toLong + n > MaxInflated) return None // ratio bomb
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  // ---------- content-stream text extraction ----------

  /** Text shown by one content stream, appended to `out` with the
    * line rules in the scaladoc above. */
  private def extractContent(data: Array[Byte], out: java.lang.StringBuilder): Unit = {
    val lx = new Lexer(data, 0)
    var inBT = false
    var pendingNL = false
    var blockStarted = false
    var lastStr: Array[Byte] = null
    var lastArr: List[Array[Byte]] = null

    def show(bytes: Array[Byte]): Unit = {
      if (pendingNL && blockStarted) out.append('\n')
      pendingNL = false
      blockStarted = true
      var i = 0
      while (i < bytes.length) { out.append((bytes(i) & 0xff).toChar); i += 1 }
    }

    var guard = 0
    while (!lx.eof && guard < (1 << 22)) {
      guard += 1
      lx.skipWs()
      if (!lx.eof) lx.peek match {
        case '(' => lx.pos += 1; lastStr = lx.readLiteralString()
        case '<' =>
          if (lx.pos + 1 < data.length && (data(lx.pos + 1) & 0xff) == '<')
            parseValue(lx, 0) // inline dict (BDC/DP/gs): parse past it
          else { lx.pos += 1; lastStr = lx.readHexString() }
        case '[' =>
          lx.pos += 1
          val strs = List.newBuilder[Array[Byte]]
          var n = 0
          lx.skipWs()
          while (!lx.eof && lx.peek != ']' && n < 8192) {
            parseValue(lx, 1) match {
              case VStr(s) => strs += s
              case _ =>
            }
            n += 1; lx.skipWs()
          }
          if (!lx.eof && lx.peek == ']') lx.pos += 1
          lastArr = strs.result()
        case '/' => lx.pos += 1; lx.readName()
        case '\'' =>
          lx.pos += 1
          if (inBT && lastStr != null) { pendingNL = true; show(lastStr) }
        case '"' =>
          lx.pos += 1
          if (inBT && lastStr != null) { pendingNL = true; show(lastStr) }
        case ')' | ']' | '>' | '}' | '{' => lx.pos += 1
        case _ =>
          val t = lx.readToken()
          t match {
            case "BT" => inBT = true; pendingNL = false
            case "ET" =>
              inBT = false
              if (blockStarted) { out.append('\n'); blockStarted = false }
            case "Tj" => if (inBT && lastStr != null) show(lastStr)
            case "TJ" =>
              if (inBT && lastArr != null) lastArr.foreach(show)
            case "Td" | "TD" | "T*" => if (inBT) pendingNL = true
            case "BI" => // inline image: skip to EI at a token boundary
              val e = findBytes(data, "EI".getBytes, lx.pos)
              lx.pos = if (e < 0) data.length else e + 2
            case "" => if (!lx.eof) lx.pos += 1
            case _ => // any other operator: operands already consumed
          }
      }
    }
  }

  // ---------- public faces ----------

  /** Extracted text (pages joined in tree order, streams per the
    * scaladoc), or null: not a PDF, encrypted, or no extractable text. */
  def pdfText(b: Array[Byte]): UTF8String = {
    if (!isPdf(b)) return null
    val doc = new Doc(b)
    if (doc.encrypted) return null
    val out = new java.lang.StringBuilder()
    val pages = doc.pageObjects
    // decode each stream exactly ONCE — the no-page-tree fallback both
    // tests for BT and extracts from the same decoded buffer (a filter
    // over decodedStream(n) would run every Inflater twice)
    val decoded: List[Array[Byte]] =
      if (pages.nonEmpty)
        pages.flatMap(doc.contentsOf).flatMap(doc.decodedStream)
      else {
        val bt = "BT".getBytes
        doc.objs.toList.sortBy(_._2)
          .flatMap { case (n, _) => doc.decodedStream(n) }
          .filter(d => findBytes(d, bt, 0) >= 0)
      }
    decoded.foreach(extractContent(_, out))
    // per-block ETs left a trailing newline; strip the outermost
    var end = out.length()
    while (end > 0 && out.charAt(end - 1) == '\n') end -= 1
    if (end == 0) null
    else UTF8String.fromString(out.substring(0, end))
  }

  /** (version, n_pages, n_objects, encrypted, title, producer), or
    * null when the magic is absent. */
  def pdfMeta(b: Array[Byte]): InternalRow = {
    if (!isPdf(b)) return null
    val doc = new Doc(b)
    val version = {
      var e = 5
      while (e < b.length && e < 16 && b(e) != '\r' && b(e) != '\n' &&
        b(e) != ' ') e += 1
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 5, e))
    }
    val info: Map[String, V] = (for {
      t <- doc.trailers.lastOption
      ref <- t.get("Info")
      v <- doc.resolve(ref)
      m <- Some(v).collect { case VDict(d) => d }
    } yield m).getOrElse(Map.empty)
    def strOf(k: String): UTF8String = info.get(k) match {
      case Some(VStr(bytes)) => UTF8String.fromString(decodePdfString(bytes))
      case _ => null
    }
    InternalRow(
      version,
      doc.pageObjects.size,
      doc.allObjNums.size,
      doc.encrypted,
      strOf("Title"),
      strOf("Producer"))
  }

  /** PDF text-string decode: UTF-16BE behind a BOM, else the Latin-1
    * approximation of PDFDocEncoding. */
  private def decodePdfString(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)

  // ---------- expressions ----------

  abstract class PdfProbe extends UnaryExpression {
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
  }

  case class PdfTextExtract(child: Expression) extends PdfProbe {
    override def prettyName: String = "pdf_text"
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      PdfText.pdfText(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |UTF8String $r = graft.functions.PdfText.pdfText($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class PdfMeta(child: Expression) extends PdfProbe {
    override def prettyName: String = "pdf_meta"
    override def dataType: DataType = StructType(Seq(
      StructField("version", StringType),
      StructField("n_pages", IntegerType, nullable = false),
      StructField("n_objects", IntegerType, nullable = false),
      StructField("encrypted", BooleanType, nullable = false),
      StructField("title", StringType),
      StructField("producer", StringType)))
    override def nullSafeEval(v: Any): Any =
      PdfText.pdfMeta(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.PdfText.pdfMeta($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---------- Column faces ----------

  def pdfTextCol(c: Column): Column =
    SparkInternals.column(PdfTextExtract(SparkInternals.expression(c)))
  def pdfMetaCol(c: Column): Column =
    SparkInternals.column(PdfMeta(SparkInternals.expression(c)))
}
