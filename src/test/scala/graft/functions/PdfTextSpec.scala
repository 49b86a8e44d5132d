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
       "a stream-style xref (no classic table) takes the linear-scan " +
       "path; page tree unreachable -> BT-stream fallback") {
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

  test("DECLINE: pages packed in an ObjStm are invisible to the subset " +
       "(no text, zero pages, no error)") {
    // the ObjStm body would hold the page + content objects; only the
    // container object is visible
    val pdf = buildPdf("1.5", Seq(
      1 -> (bytes("<< /Type /ObjStm /N 2 /First 10 /Length 4 >>\nstream\ndata\nendstream")))
      , "/Root 9 0 R")
    assert(text(pdf) == null)
    assert(PdfText.pdfMeta(pdf).getInt(1) == 0)
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
