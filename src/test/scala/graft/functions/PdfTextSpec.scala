package graft.functions

import graft.SparkSpec

/** PdfText: classic-layout parsing, the text-operator subset, filters,
  * structure fallbacks, the decline contracts, and totality under
  * truncation/corruption. Fixtures are built with REAL xref offsets by
  * the byte-accurate builder below — the parsers must do real
  * arithmetic, not pattern-luck. */
class PdfTextSpec extends SparkSpec {

  /** Classic PDF builder: objects are (num, body) — body either text or
    * raw bytes (dict + stream). Emits header, objects in order, a
    * correct xref table, trailer, startxref, %%EOF. */
  private def buildPdf(version: String,
                       objects: Seq[(Int, Array[Byte])],
                       trailerEntries: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w(s"%PDF-$version\n%âãÏÓ\n")
    val offsets = objects.map { case (num, body) =>
      val off = out.size()
      w(s"$num 0 obj\n")
      out.write(body)
      w("\nendobj\n")
      num -> off
    }.toMap
    val xrefAt = out.size()
    val maxNum = objects.map(_._1).max
    w(s"xref\n0 ${maxNum + 1}\n")
    w(f"${0}%010d ${65535}%05d f \n")
    (1 to maxNum).foreach { n =>
      val off = offsets.getOrElse(n, 0)
      w(f"$off%010d ${0}%05d n \n")
    }
    w(s"trailer\n<< /Size ${maxNum + 1} $trailerEntries >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def contentStream(ops: String,
                            deflate: Boolean = false): Array[Byte] = {
    val data = bytes(ops)
    if (!deflate)
      bytes(s"<< /Length ${data.length} >>\nstream\n") ++ data ++
        bytes("\nendstream")
    else {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val buf = new Array[Byte](data.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      val z = buf.take(n)
      bytes(s"<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n") ++
        z ++ bytes("\nendstream")
    }
  }

  private def onePagePdf(content: Array[Byte],
                         trailerExtra: String = ""): Array[Byte] =
    buildPdf("1.4", Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      4 -> content),
      s"/Root 1 0 R$trailerExtra")

  private def text(b: Array[Byte]): String = {
    val r = PdfText.pdfText(b)
    if (r == null) null else r.toString
  }

  test("one page, xref-walked: Tj text extracts; meta reports version/" +
       "pages/objects") {
    val pdf = onePagePdf(contentStream(
      "BT /F1 12 Tf 72 712 Td (Hello World) Tj ET"))
    assert(text(pdf) == "Hello World")
    val m = PdfText.pdfMeta(pdf)
    assert(m.getUTF8String(0).toString == "1.4")
    assert(m.getInt(1) == 1 && m.getInt(2) == 4 && !m.getBoolean(3))
  }

  test("text operators: Td/TD/T* newlines, TJ kerning arrays, ' and \" " +
       "show-next-line, hex strings, the literal escape set") {
    val ops =
      "BT /F1 10 Tf 72 700 Td (line one) Tj " +
        "0 -14 Td (line two) Tj " +
        "T* [(ker) -120 (ned)] TJ " +
        "(quoted next) ' " +
        "<48 69> Tj " +
        "(esc \\(p\\) \\\\ \\101 \\na) Tj ET"
    val got = text(onePagePdf(contentStream(ops)))
    assert(got ==
      "line one\nline two\nkerned\nquoted next" +
        "Hi" + "esc (p) \\ A \na",
      got)
  }

  test("FlateDecode content streams inflate through the JDK Inflater; " +
       "an unknown filter makes the stream non-extractable") {
    val pdf = onePagePdf(contentStream(
      "BT (compressed text here) Tj ET", deflate = true))
    assert(text(pdf) == "compressed text here")
    // unknown filter: declared DCTDecode -> no text, but no error
    val bad = onePagePdf(
      bytes("<< /Length 9 /Filter /DCTDecode >>\nstream\nBT (x) Tj\nendstream"))
    assert(text(bad) == null)
  }

  test("multi-page tree order; /Contents arrays concatenate") {
    val pdf = buildPdf("1.5", Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Contents [4 0 R 7 0 R] >>"),
      4 -> contentStream("BT (page one a) Tj ET"),
      5 -> bytes("<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
      6 -> contentStream("BT (page two) Tj ET"),
      7 -> contentStream("BT (page one b) Tj ET")),
      "/Root 1 0 R")
    assert(text(pdf) == "page one a\npage one b\npage two")
    assert(PdfText.pdfMeta(pdf).getInt(1) == 2)
  }

  test("trailer /Info strings surface in meta (Latin-1 and UTF-16BE BOM)") {
    val pdf = buildPdf("1.4", Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      4 -> contentStream("BT (t) Tj ET"),
      5 -> (bytes("<< /Title (café report) /Producer <FEFF00470072006100660074> >>")))
      , "/Root 1 0 R /Info 5 0 R")
    val m = PdfText.pdfMeta(pdf)
    assert(m.getUTF8String(4).toString == "café report")
    assert(m.getUTF8String(5).toString == "Graft")
  }

  test("DECLINE: /Encrypt in the trailer nulls text and flags meta") {
    val enc = onePagePdf(contentStream("BT (secret) Tj ET"),
      trailerExtra = " /Encrypt 9 0 R")
    assert(text(enc) == null)
    assert(PdfText.pdfMeta(enc).getBoolean(3))
  }

  test("in-stream 'trailer' decoys cannot starve the real trailer: the " +
       "backward scan still finds /Encrypt past 100 decoy occurrences") {
    // a page whose legitimate text contains the word `trailer` 100
    // times — a forward scan capped at 64 burned its guard on these
    // and missed the file's real trailer (losing the decline contract)
    val decoyOps = (1 to 100)
      .map(i => s"BT (movie trailer $i) Tj ET").mkString("\n")
    val enc = onePagePdf(contentStream(decoyOps),
      trailerExtra = " /Encrypt 9 0 R")
    assert(text(enc) == null, "encrypted must decline despite decoys")
    assert(PdfText.pdfMeta(enc).getBoolean(3), "meta must flag encrypted")
    // same decoys, unencrypted: text still extracts fully
    val plain = onePagePdf(contentStream(decoyOps))
    val t = text(plain)
    assert(t != null && t.contains("movie trailer 1") &&
      t.contains("movie trailer 100"), String.valueOf(t))
  }

  test("fallbacks: corrupt xref offsets fall back to the object scan; " +
       "a startxref pointing at garbage takes the linear-scan path; " +
       "page tree unreachable -> BT-stream fallback") {
    val good = onePagePdf(contentStream("BT (still works) Tj ET"))
    // corrupt every xref offset digit: validation rejects the entries,
    // the linear scan still finds the objects
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xrefAt = s.lastIndexOf("xref")
    val corrupted = s.substring(0, xrefAt) +
      s.substring(xrefAt).replaceAll("\\d{10}", "0000000007")
    assert(text(bytes(corrupted)) == "still works")
    // no trailer keyword at all (xref-stream layout): Root unreachable,
    // the /Type /Page fallback still orders and extracts
    val noTrailer = {
      val full = onePagePdf(contentStream("BT (scan path) Tj ET"))
      val str = new String(full, java.nio.charset.StandardCharsets.ISO_8859_1)
      bytes(str.substring(0, str.lastIndexOf("xref")) + "startxref\n0\n%%EOF\n")
    }
    assert(text(noTrailer) == "scan path")
    // catalog deleted -> page-tree walk dies -> visible-BT fallback
    val noCat = buildPdf("1.4", Seq(
      4 -> contentStream("BT (orphan stream) Tj ET")), "")
    assert(text(noCat) == "orphan stream")
  }

  test("without a cross-reference stream, ObjStm contents stay " +
       "unreachable (the scan cannot see inside; no text, zero pages, " +
       "no error)") {
    // the ObjStm body would hold the page + content objects; only the
    // container object is visible — type-2 xref entries are the ONLY
    // road in, and this file has none
    val pdf = buildPdf("1.5", Seq(
      1 -> (bytes("<< /Type /ObjStm /N 2 /First 10 /Length 4 >>\nstream\ndata\nendstream")))
      , "/Root 9 0 R")
    assert(text(pdf) == null)
    assert(PdfText.pdfMeta(pdf).getInt(1) == 0)
  }

  /** PDF 1.5 layout builder: catalog/pages/page (objects 1–3) packed
    * in a FlateDecode ObjStm (object 5), the content stream (object 4)
    * file-resident, and a /Type /XRef stream (object 6; W [1 2 1],
    * FlateDecode, optional PNG up-predictor) as the only
    * cross-reference — no classic table, no `trailer` keyword. */
  private def xrefStreamPdf(ops: String, encrypt: Boolean = false,
                            predictor: Boolean = true,
                            hybrid: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(bytes(s))
    def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val buf = new Array[Byte](data.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    w("%PDF-1.5\n")
    val off4 = out.size()
    val data = bytes(ops)
    w(s"4 0 obj\n<< /Length ${data.length} >>\nstream\n")
    out.write(data)
    w("\nendstream\nendobj\n")
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val offs = Seq(0, o1.length + 1, o1.length + o2.length + 2)
    val header = s"1 ${offs(0)} 2 ${offs(1)} 3 ${offs(2)}\n"
    val first = header.length
    val z5 = deflate(bytes(header + Seq(o1, o2, o3).mkString(" ")))
    val off5 = out.size()
    w(s"5 0 obj\n<< /Type /ObjStm /N 3 /First $first " +
      s"/Length ${z5.length} /Filter /FlateDecode >>\nstream\n")
    out.write(z5)
    w("\nendstream\nendobj\n")
    val off6 = out.size()
    val entries: Seq[(Int, Int, Int)] = Seq(
      (0, 0, 0), // free head
      (2, 5, 0), (2, 5, 1), (2, 5, 2), // 1,2,3 live in ObjStm 5
      (1, off4, 0), (1, off5, 0), (1, off6, 0))
    val rowLen = 4
    val raw = entries.flatMap { case (t, f2, f3) =>
      Seq(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
        (f3 & 0xff).toByte)
    }.toArray
    val table =
      if (!predictor) raw
      else { // PNG Up (filter type 2) encoding of each row
        val o = new Array[Byte](entries.length * (rowLen + 1))
        for (r <- entries.indices) {
          o(r * (rowLen + 1)) = 2
          for (c <- 0 until rowLen) {
            val cur = raw(r * rowLen + c) & 0xff
            val up = if (r > 0) raw((r - 1) * rowLen + c) & 0xff else 0
            o(r * (rowLen + 1) + 1 + c) = ((cur - up) & 0xff).toByte
          }
        }
        o
      }
    val z6 = deflate(table)
    val parms =
      if (predictor) " /DecodeParms << /Predictor 12 /Columns 4 >>" else ""
    val encE = if (encrypt) " /Encrypt 9 0 R" else ""
    w(s"6 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Root 1 0 R$encE" +
      s" /Length ${z6.length} /Filter /FlateDecode$parms >>\nstream\n")
    out.write(z6)
    w("\nendstream\nendobj\n")
    if (!hybrid) w(s"startxref\n$off6\n%%EOF\n")
    else {
      // hybrid layout: a classic table (free head only) whose trailer's
      // /XRefStm points at the stream — the pre-1.5-reader-compatible
      // shape real writers emit
      val xrefAt = out.size()
      w("xref\n0 1\n" + f"${0}%010d 65535 f \n")
      w(s"trailer\n<< /Size 7 /Root 1 0 R /XRefStm $off6 >>\n")
      w(s"startxref\n$xrefAt\n%%EOF\n")
    }
    out.toByteArray
  }

  test("PDF 1.5: xref STREAM (PNG up-predictor) + ObjStm-packed " +
       "catalog/pages/page extract fully; meta counts compressed objects") {
    val pdf = xrefStreamPdf("BT (objstm text) Tj 0 -14 Td (line two) Tj ET")
    assert(text(pdf) == "objstm text\nline two")
    val m = PdfText.pdfMeta(pdf)
    assert(m.getUTF8String(0).toString == "1.5")
    assert(m.getInt(1) == 1, "one page, reached THROUGH the ObjStm")
    assert(m.getInt(2) == 6, "n_objects = 3 compressed + 3 file-resident")
    assert(!m.getBoolean(3))
    // predictor-free W rows parse identically
    assert(text(xrefStreamPdf("BT (plain rows) Tj ET",
      predictor = false)) == "plain rows")
  }

  test("hybrid file: classic table + /XRefStm side pointer resolves the " +
       "ObjStm objects") {
    val pdf = xrefStreamPdf("BT (hybrid text) Tj ET", hybrid = true)
    assert(text(pdf) == "hybrid text")
    assert(PdfText.pdfMeta(pdf).getInt(1) == 1)
  }

  test("DECLINE: /Encrypt in an xref-STREAM dict (the 1.5+ trailer) " +
       "nulls text and flags meta") {
    val enc = xrefStreamPdf("BT (secret) Tj ET", encrypt = true)
    assert(text(enc) == null)
    assert(PdfText.pdfMeta(enc).getBoolean(3))
  }

  test("totality: the 1.5 layout truncated at every byte and randomly " +
       "corrupted never throws") {
    val pdf = xrefStreamPdf("BT (fuzz me) Tj ET")
    for (c <- 0 until pdf.length) {
      PdfText.pdfText(pdf.take(c)); PdfText.pdfMeta(pdf.take(c))
    }
    val rnd = new scala.util.Random(1015)
    (0 until 200).foreach { _ =>
      val mutated = pdf.clone()
      (0 until 8).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      PdfText.pdfText(mutated); PdfText.pdfMeta(mutated)
    }
  }

  test("totality: not a PDF -> null; truncation at every byte never " +
       "throws; random corruption never throws") {
    assert(text(bytes("plain text")) == null)
    assert(PdfText.pdfMeta(bytes("%PDX-1.4")) == null)
    val pdf = onePagePdf(contentStream(
      "BT (fuzz target \\( with escapes <41>) Tj [(a) 1 (b)] TJ ET",
      deflate = true))
    for (c <- 0 until pdf.length) {
      PdfText.pdfText(pdf.take(c)); PdfText.pdfMeta(pdf.take(c))
    }
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val mutated = pdf.clone()
      (0 until 8).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      PdfText.pdfText(mutated); PdfText.pdfMeta(mutated)
    }
  }

  test("column faces run codegen'd over a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, onePagePdf(contentStream("BT (doc one) Tj ET"))),
      (2L, onePagePdf(contentStream("BT (doc two) Tj ET", deflate = true))),
      (3L, bytes("not a pdf"))).toDF("doc_id", "payload")
    val got = rows.select($"doc_id",
        PdfText.pdfTextCol($"payload").as("t"),
        PdfText.pdfMetaCol($"payload").getField("n_pages").as("np"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).orNull,
        if (r.isNullAt(2)) -1 else r.getInt(2))).toList
    assert(got == List((1L, "doc one", 1), (2L, "doc two", 1),
      (3L, null, -1)), got.toString)
  }
}
