package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 5322 / MIME (RFC 2045-2047) message parsing — the mail-corpus
  * tier (mailing-list archives, support dumps, the classic research
  * corpora are all EML/mbox shaped). Total like the rest of the decode
  * tier: anything hopeless yields null, a defective PART nulls its
  * decoded fields but stays listed.
  *
  *  - [[mimeParts]]: header block (CRLF or bare-LF, folded
  *    continuation lines per §2.2.3), multipart walked recursively
  *    through nested boundaries (depth ≤ 8), per-leaf
  *    Content-Transfer-Encoding decode (base64 via the JDK MIME
  *    decoder, quoted-printable incl. soft breaks, 7bit/8bit/binary
  *    pass-through) and charset decode to `text` for text parts
  *    (utf-8 / iso-8859-1 / windows-1252 / us-ascii; other charsets
  *    keep `data` and null `text`);
  *  - [[emailHeaders]]: From/To/Subject/Date/Message-ID with RFC 2047
  *    encoded-words (`=?charset?B|Q?...?=`, adjacent words joined,
  *    Q-encoding `_` = space) decoded in Subject/From/To.
  *
  * Map-side; messages never leave their partition — explode the parts
  * array downstream.
  */
object Mime {

  private val Charsets: Map[String, java.nio.charset.Charset] = Map(
    "utf-8" -> java.nio.charset.StandardCharsets.UTF_8,
    "utf8" -> java.nio.charset.StandardCharsets.UTF_8,
    "us-ascii" -> java.nio.charset.StandardCharsets.US_ASCII,
    "ascii" -> java.nio.charset.StandardCharsets.US_ASCII,
    "iso-8859-1" -> java.nio.charset.StandardCharsets.ISO_8859_1,
    "latin-1" -> java.nio.charset.StandardCharsets.ISO_8859_1,
    "latin1" -> java.nio.charset.StandardCharsets.ISO_8859_1,
    "windows-1252" -> java.nio.charset.Charset.forName("windows-1252"),
    "cp1252" -> java.nio.charset.Charset.forName("windows-1252"))

  /** End index (exclusive) of the header block and start of the body:
    * the first blank line. Tolerates CRLF and bare LF. -1 = no blank
    * line (headers only — body empty). */
  private def headerEnd(b: Array[Byte], from: Int): (Int, Int) = {
    var i = from
    while (i < b.length) {
      if (b(i) == '\n') {
        if (i + 1 < b.length && b(i + 1) == '\n') return (i + 1, i + 2)
        if (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n')
          return (i + 1, i + 3)
      }
      i += 1
    }
    (b.length, b.length)
  }

  /** Unfolded header lines of the block [from, until). */
  private def headerLines(b: Array[Byte], from: Int, until: Int)
      : List[String] = {
    val raw = new String(b, from, until - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    for (line <- raw.split("\r?\n")) {
      if (line.nonEmpty && (line(0) == ' ' || line(0) == '\t') &&
        out.nonEmpty)
        out(out.length - 1) = out.last + " " + line.trim
      else if (line.nonEmpty) out += line
    }
    out.toList
  }

  private def headerValue(lines: List[String], name: String): String =
    lines.collectFirst {
      case l if l.length > name.length + 1 &&
        l.substring(0, name.length).equalsIgnoreCase(name) &&
        l(name.length) == ':' => l.substring(name.length + 1).trim
    }.orNull

  /** `attr=value` (optionally quoted) out of a structured header. */
  private def headerParam(value: String, attr: String): String = {
    if (value == null) return null
    val m = java.util.regex.Pattern
      .compile(s"""(?i)[;\\s]$attr\\s*=\\s*("([^"]*)"|[^;\\s]+)""")
      .matcher(value)
    if (!m.find()) null
    else if (m.group(2) != null) m.group(2)
    else m.group(1)
  }

  private def qpDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 2 < s.length && s.charAt(i + 1) == '\r' &&
        s.charAt(i + 2) == '\n') i += 3 // soft break CRLF
      else if (c == '=' && i + 1 < s.length && s.charAt(i + 1) == '\n')
        i += 2 // soft break LF
      else if (c == '=' && i + 2 < s.length) {
        val h = Character.digit(s.charAt(i + 1), 16)
        val l = Character.digit(s.charAt(i + 2), 16)
        if (h >= 0 && l >= 0) { out.write((h << 4) | l); i += 3 }
        else { out.write(c.toInt); i += 1 } // malformed escape: literal
      } else { out.write(c.toInt & 0xFF); i += 1 }
    }
    out.toByteArray
  }

  private def decodeTransfer(body: Array[Byte], enc: String): Array[Byte] =
    Option(enc).map(_.trim.toLowerCase).getOrElse("") match {
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(
          new String(body, java.nio.charset.StandardCharsets.US_ASCII)
            .replaceAll("[^A-Za-z0-9+/=]", ""))
        catch { case _: IllegalArgumentException => null }
      case "quoted-printable" =>
        qpDecode(new String(body,
          java.nio.charset.StandardCharsets.ISO_8859_1))
      case "" | "7bit" | "8bit" | "binary" => body
      case _ => null
    }

  /** One leaf part → (content_type, charset, filename, text, data). */
  private def leafRow(ctype: String, ctypeFull: String, disp: String,
                      decoded: Array[Byte]): InternalRow = {
    val charset = Option(headerParam(" " + ctypeFull, "charset"))
      .map(_.toLowerCase).orNull
    val filename = {
      val f = headerParam(if (disp == null) null else " " + disp, "filename")
      if (f != null) f
      else headerParam(" " + ctypeFull, "name")
    }
    val isText = ctype.startsWith("text/")
    val text: UTF8String =
      if (decoded == null || !isText) null
      else Charsets.get(if (charset == null) "us-ascii" else charset) match {
        case Some(cs) => UTF8String.fromString(new String(decoded, cs))
        case None => null // unknown charset: keep bytes, no text claim
      }
    InternalRow(
      UTF8String.fromString(ctype),
      if (charset == null) null else UTF8String.fromString(charset),
      if (filename == null) null else UTF8String.fromString(filename),
      text,
      decoded)
  }

  private def walk(b: Array[Byte], from: Int, until: Int, depth: Int,
                   out: scala.collection.mutable.ArrayBuffer[InternalRow])
      : Unit = {
    if (depth > 8) return
    val (hEnd, bodyStart) = headerEnd(b, from)
    val lines = headerLines(b, from, math.min(hEnd, until))
    val ctypeFull = Option(headerValue(lines, "Content-Type"))
      .getOrElse("text/plain; charset=us-ascii")
    val ctype = ctypeFull.split(";")(0).trim.toLowerCase
    val bodyEnd = until
    if (ctype.startsWith("multipart/")) {
      val boundary = headerParam(" " + ctypeFull, "boundary")
      if (boundary == null) return
      val marker = ("--" + boundary)
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      // collect delimiter line positions
      var positions = List.empty[(Int, Boolean)] // (lineStart, isFinal)
      var i = bodyStart
      while (i < bodyEnd) {
        val atLineStart = i == bodyStart || b(i - 1) == '\n'
        if (atLineStart && i + marker.length <= bodyEnd &&
          java.util.Arrays.equals(
            java.util.Arrays.copyOfRange(b, i, i + marker.length), marker)) {
          val fin = i + marker.length + 1 < bodyEnd &&
            b(i + marker.length) == '-' && b(i + marker.length + 1) == '-'
          // RFC 2046: a delimiter LINE is "--boundary" followed by
          // optional transport padding (SP/HT) and CRLF, or the "--"
          // close. A body line that merely starts with the marker
          // ("--b42-not-a-delimiter") is content, not a delimiter.
          var j = i + marker.length + (if (fin) 2 else 0)
          while (j < bodyEnd && (b(j) == ' ' || b(j) == '\t')) j += 1
          val terminated = j >= bodyEnd || b(j) == '\r' || b(j) == '\n'
          if (terminated) positions = (i, fin) :: positions
        }
        i += 1
      }
      val delims = positions.reverse
      var starts = List.empty[(Int, Int)] // (partStart, partEnd)
      var k = 0
      val arr = delims.toArray
      while (k < arr.length && !arr(k)._2) {
        // part body: after this delimiter's line break, to the next
        // delimiter's line start (minus its preceding EOL)
        var ps = arr(k)._1
        while (ps < bodyEnd && b(ps) != '\n') ps += 1
        ps += 1
        val rawEnd = if (k + 1 < arr.length) arr(k + 1)._1 else bodyEnd
        var pe = rawEnd
        if (pe > ps && pe - 1 < b.length && pe - 1 >= 1 && b(pe - 1) == '\n') {
          pe -= 1
          if (pe > ps && b(pe - 1) == '\r') pe -= 1
        }
        if (ps < pe) starts = (ps, pe) :: starts
        k += 1
      }
      starts.reverse.foreach { case (ps, pe) =>
        walk(b, ps, pe, depth + 1, out)
      }
    } else {
      val enc = headerValue(lines, "Content-Transfer-Encoding")
      val body = java.util.Arrays.copyOfRange(b,
        math.min(bodyStart, bodyEnd), bodyEnd)
      val disp = headerValue(lines, "Content-Disposition")
      out += leafRow(ctype, ctypeFull, disp, decodeTransfer(body, enc))
    }
  }

  /** Leaf parts of a MIME message (a non-multipart message is one
    * part). Null when the input has no parseable header block at all. */
  def mimeParts(b: Array[Byte]): ArrayData = {
    if (b == null || b.length == 0) return null
    // sanity: the first unfolded line must look like a header
    val (hEnd, _) = headerEnd(b, 0)
    val lines = headerLines(b, 0, hEnd)
    if (lines.isEmpty || !lines.exists(l => l.contains(":"))) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    try walk(b, 0, b.length, 0, out)
    catch { case _: RuntimeException => return null }
    if (out.isEmpty) null else new GenericArrayData(out.toArray)
  }

  // ---- RFC 2047 encoded words ----

  private val EncodedWord = java.util.regex.Pattern.compile(
    """=\?([^?]+)\?([bBqQ])\?([^?]*)\?=""")

  /** Decode every `=?charset?B|Q?...?=` run; adjacent encoded words
    * separated only by whitespace join without the whitespace (§6.2);
    * undecodable words stay verbatim. */
  def decodeWords(s: String): String = {
    if (s == null) return null
    val m = EncodedWord.matcher(s)
    val sb = new java.lang.StringBuilder()
    var last = 0
    var prevEnd = -1 // end of the previous encoded word
    while (m.find()) {
      val between = s.substring(last, m.start())
      // whitespace BETWEEN two encoded words is transparent
      if (!(prevEnd == last && between.forall(c => c == ' ' || c == '\t')))
        sb.append(between)
      val cs = Charsets.get(m.group(1).toLowerCase)
      val payload = m.group(3)
      val decoded: String =
        if (cs.isEmpty) null
        else if (m.group(2).equalsIgnoreCase("B")) {
          try new String(java.util.Base64.getMimeDecoder.decode(payload),
            cs.get)
          catch { case _: IllegalArgumentException => null }
        } else
          new String(qpDecode(payload.replace('_', ' ')), cs.get)
      sb.append(if (decoded == null) m.group(0) else decoded)
      last = m.end()
      prevEnd = m.end()
    }
    sb.append(s.substring(last))
    sb.toString
  }

  /** (from, to, subject, date, message_id); encoded words decoded in
    * the address/subject fields. Null when not header-shaped. */
  def emailHeaders(b: Array[Byte]): InternalRow = {
    if (b == null || b.length == 0) return null
    val (hEnd, _) = headerEnd(b, 0)
    val lines = headerLines(b, 0, hEnd)
    if (lines.isEmpty || !lines.exists(_.contains(":"))) return null
    def f(n: String, dec: Boolean = true): UTF8String = {
      val v = headerValue(lines, n)
      if (v == null) null
      else UTF8String.fromString(if (dec) decodeWords(v) else v)
    }
    InternalRow(f("From"), f("To"), f("Subject"),
      f("Date", dec = false), f("Message-ID", dec = false))
  }

  /** mbox framing (the classic mailbox-archive layout): split at
    * `From ` postmark lines (column 0 only — RFC 4155), un-escape
    * `>From ` quoting inside bodies, return each message's bytes for
    * [[mimeParts]]/[[emailHeaders]] downstream. Null when the input
    * does not start with a postmark. */
  def mboxMessages(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 5) return null
    def postmarkAt(i: Int): Boolean =
      i + 5 <= b.length && b(i) == 'F' && b(i + 1) == 'r' &&
        b(i + 2) == 'o' && b(i + 3) == 'm' && b(i + 4) == ' '
    if (!postmarkAt(0)) return null
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 1
    while (i < b.length) {
      if (b(i - 1) == '\n' && postmarkAt(i)) starts += i
      i += 1
    }
    val out: Seq[Any] = starts.toSeq.zipAll(starts.toSeq.drop(1), 0, b.length)
      .map { case (s, e) =>
        // drop the postmark line itself
        var ms = s
        while (ms < e && b(ms) != '\n') ms += 1
        ms += 1
        val raw = java.util.Arrays.copyOfRange(b, math.min(ms, e), e)
        // un-escape ">From " at line starts
        new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
          .replaceAll("(?m)^>(>*From )", "$1")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      }
    if (out.isEmpty) null else new GenericArrayData(out.toArray)
  }

  // ---- expressions ----

  case class MimeParts(child: Expression) extends BinaryMeta.BinaryProbe {
    override def prettyName: String = "mime_parts"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("content_type", StringType),
      StructField("charset", StringType),
      StructField("filename", StringType),
      StructField("text", StringType),
      StructField("data", BinaryType))), containsNull = false)
    override def nullSafeEval(v: Any): Any =
      mimeParts(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.Mime.mimeParts($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class EmailHeaders(child: Expression) extends BinaryMeta.BinaryProbe {
    override def prettyName: String = "email_headers"
    override def dataType: DataType = StructType(Seq(
      StructField("from", StringType),
      StructField("to", StringType),
      StructField("subject", StringType),
      StructField("date", StringType),
      StructField("message_id", StringType)))
    override def nullSafeEval(v: Any): Any =
      emailHeaders(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.Mime.emailHeaders($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class MboxMessages(child: Expression) extends BinaryMeta.BinaryProbe {
    override def prettyName: String = "mbox_messages"
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      mboxMessages(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.Mime.mboxMessages($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def mimePartsCol(c: Column): Column =
    SparkInternals.column(MimeParts(SparkInternals.expression(c)))
  def emailHeadersCol(c: Column): Column =
    SparkInternals.column(EmailHeaders(SparkInternals.expression(c)))
  def mboxMessagesCol(c: Column): Column =
    SparkInternals.column(MboxMessages(SparkInternals.expression(c)))
}
