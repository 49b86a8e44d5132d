package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Mime parsing semantics the SQL fixture gate cannot express: nested
  * multiparts, folded headers, Q-encoded words, CRLF framing, binary
  * attachments, charset fallbacks and malformed-input totality. */
class MimeSpec extends AnyFunSuite {

  private def parts(s: String): Seq[(String, String, String, String, Array[Byte])] = {
    val a = Mime.mimeParts(s.getBytes("ISO-8859-1"))
    if (a == null) Nil
    else (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 5)
      def str(j: Int) = if (r.isNullAt(j)) null else r.getUTF8String(j).toString
      (str(0), str(1), str(2), str(3),
        if (r.isNullAt(4)) null else r.getBinary(4))
    }
  }

  test("nested multipart: alternative inside mixed, plus a binary " +
       "attachment — leaves in document order") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      Array[Byte](1, 2, 3, 0, -1))
    val msg =
      """From: x@example.com
        |Content-Type: multipart/mixed; boundary="outer"
        |
        |preamble is ignored
        |--outer
        |Content-Type: multipart/alternative; boundary="inner"
        |
        |--inner
        |Content-Type: text/plain
        |
        |plain body
        |--inner
        |Content-Type: text/html
        |
        |<b>html body</b>
        |--inner--
        |--outer
        |Content-Type: application/octet-stream
        |Content-Transfer-Encoding: base64
        |Content-Disposition: attachment; filename="blob.bin"
        |
        |""".stripMargin + b64 + "\n--outer--\n"
    val got = parts(msg)
    assert(got.map(_._1) ==
      Seq("text/plain", "text/html", "application/octet-stream"))
    assert(got(0)._4 == "plain body")
    assert(got(1)._4 == "<b>html body</b>")
    assert(got(2)._4 == null, "binary part claims no text")
    assert(got(2)._3 == "blob.bin")
    assert(got(2)._5.toSeq == Seq[Byte](1, 2, 3, 0, -1))
  }

  test("folded headers unfold; CRLF framing; quoted-printable soft " +
       "breaks splice lines") {
    val msg = "From: x@example.com\r\n" +
      "Content-Type: text/plain;\r\n charset=utf-8\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      "one long line that was =\r\nsoft-wrapped, caf=C3=A9\r\n"
    val got = parts(msg)
    assert(got.size == 1)
    assert(got.head._2 == "utf-8", "param on the folded line")
    assert(got.head._4 ==
      "one long line that was soft-wrapped, café\r\n")
  }

  test("non-MIME message defaults to text/plain us-ascii") {
    val got = parts("From: a@b\nSubject: hi\n\njust a body\n")
    assert(got.map(t => (t._1, t._4)) ==
      Seq(("text/plain", "just a body\n")))
  }

  test("unknown charset keeps bytes but makes no text claim") {
    val got = parts("Content-Type: text/plain; charset=shift_jis\n\nxyz\n")
    assert(got.head._4 == null && new String(got.head._5) == "xyz\n")
  }

  test("RFC 2047: B and Q words, underscores as spaces, adjacent " +
       "words join without the separating whitespace") {
    assert(Mime.decodeWords("=?UTF-8?Q?caf=C3=A9_au_lait?=") ==
      "café au lait")
    val b = java.util.Base64.getEncoder.encodeToString("héllo".getBytes("UTF-8"))
    assert(Mime.decodeWords(s"=?utf-8?B?$b?= world") == "héllo world")
    // adjacent encoded words: the space between them is transparent
    assert(Mime.decodeWords("=?UTF-8?Q?one?= =?UTF-8?Q?two?=") == "onetwo")
    // but real text between words survives
    assert(Mime.decodeWords("a =?UTF-8?Q?b?= c") == "a b c")
    // undecodable charset stays verbatim
    assert(Mime.decodeWords("=?x-weird?Q?abc?=") == "=?x-weird?Q?abc?=")
  }

  test("emailHeaders: decoded subject/from, raw date and message-id") {
    val msg = "From: =?UTF-8?Q?Ren=C3=A9?= <r@example.com>\n" +
      "To: b@example.com\nSubject: =?UTF-8?Q?r=C3=A9sum=C3=A9?=\n" +
      "Date: Tue, 2 Feb 2024 10:00:00 +0000\n" +
      "Message-ID: <42@example>\n\nbody\n"
    val h = Mime.emailHeaders(msg.getBytes("ISO-8859-1"))
    assert(h.getUTF8String(0).toString == "René <r@example.com>")
    assert(h.getUTF8String(2).toString == "résumé")
    assert(h.getUTF8String(3).toString == "Tue, 2 Feb 2024 10:00:00 +0000")
    assert(h.getUTF8String(4).toString == "<42@example>")
  }

  test("mbox: splits at column-0 postmarks only, un-escapes >From, " +
       "single-message and non-mbox contracts") {
    def msgs(s: String): Seq[String] = {
      val a = Mime.mboxMessages(s.getBytes("ISO-8859-1"))
      if (a == null) Nil
      else (0 until a.numElements()).map(i => new String(a.getBinary(i)))
    }
    val box = "From a@x Mon Jan  1 00:00:00 2024\nSubject: one\n\n" +
      "body with\n>From a quoted postmark\n>>From double\n" +
      "mid From not at column 0\n" +
      "From b@x Tue Jan  2 00:00:00 2024\nSubject: two\n\nsecond body\n"
    val got = msgs(box)
    assert(got.size == 2)
    assert(got(0).contains("Subject: one"))
    assert(got(0).contains("\nFrom a quoted postmark"), "one > stripped")
    assert(got(0).contains("\n>From double"), "only one level un-escaped")
    assert(got(0).contains("mid From not at column 0"))
    assert(got(1).contains("second body"))
    // single message, no terminator
    assert(msgs("From x\nSubject: s\n\nb\n").size == 1)
    // not an mbox at all
    assert(Mime.mboxMessages("Subject: plain eml\n\nbody".getBytes) == null)
    assert(Mime.mboxMessages(Array.empty[Byte]) == null)
  }

  test("totality: not a message → null; corrupt base64 nulls data; " +
       "missing terminal boundary still yields the parts") {
    assert(Mime.mimeParts("no header block here".getBytes) == null)
    assert(Mime.mimeParts(Array.empty[Byte]) == null)
    val badB64 = parts("Content-Transfer-Encoding: base64\n" +
      "Content-Type: text/plain\n\n!!!not=base64!!!\n")
    assert(badB64.head._4 == null && badB64.head._5 == null)
    val unterminated = parts(
      "Content-Type: multipart/mixed; boundary=\"q\"\n\n" +
        "--q\nContent-Type: text/plain\n\nlast part\n")
    assert(unterminated.map(_._4) == Seq("last part"),
      unterminated.toString)
    // random garbage never throws
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val blob = new Array[Byte](4 + rnd.nextInt(400))
      rnd.nextBytes(blob)
      blob(0) = 'A'; blob(1) = ':'
      Mime.mimeParts(blob); Mime.emailHeaders(blob)
    }
  }

  test("RFC 2046 delimiter must END the line: a body line that merely " +
       "starts with --boundary is content, not a delimiter") {
    val msg =
      "Content-Type: multipart/mixed; boundary=\"b42\"\n\n" +
        "--b42\nContent-Type: text/plain\n\n" +
        "first line\n--b42-not-a-delimiter stays in the body\nlast line\n" +
        "--b42 \t \nContent-Type: text/plain\n\nsecond part\n" +
        "--b42--\n"
    val got = parts(msg)
    assert(got.size == 2, got.toString)
    assert(got(0)._4 ==
      "first line\n--b42-not-a-delimiter stays in the body\nlast line")
    // transport padding (SP/HT) after the marker is still a delimiter
    assert(got(1)._4 == "second part")
  }

}
