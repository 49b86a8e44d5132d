package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Utf8Ops against the RFC 3629 boundary table and the JDK's own
  * decoder as an independent validity referee. */
class Utf8OpsSpec extends AnyFunSuite {

  private def scan(b: Array[Byte]): (Boolean, Int, String) = {
    val r = Utf8Ops.utf8Scan(b)
    (r.getBoolean(0), r.getInt(1), r.getUTF8String(2).toString)
  }
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def fix(s: String): String =
    Utf8Ops.fixMojibake(UTF8String.fromString(s)).toString

  test("valid boundary sequences pass byte-for-byte") {
    val valid = Seq(
      bytes(0x00), bytes(0x7F),                   // ASCII edges
      bytes(0xC2, 0x80), bytes(0xDF, 0xBF),       // 2-byte edges
      bytes(0xE0, 0xA0, 0x80), bytes(0xED, 0x9F, 0xBF), // 3-byte + pre-surrogate
      bytes(0xEE, 0x80, 0x80), bytes(0xEF, 0xBF, 0xBF), // post-surrogate
      bytes(0xF0, 0x90, 0x80, 0x80),              // U+10000
      bytes(0xF4, 0x8F, 0xBF, 0xBF))              // U+10FFFF
    for (v <- valid) {
      val (ok, n, text) = scan(v)
      assert(ok && n == 0, v.map(b => f"${b & 0xFF}%02X").mkString(" "))
      assert(text.getBytes("UTF-8").toSeq == v.toSeq)
    }
  }

  test("overlongs, surrogates, > U+10FFFF, stray continuations and " +
       "truncations are invalid — and the JDK referee agrees on every " +
       "case both ways") {
    val invalid = Seq(
      bytes(0xC0, 0xAF), bytes(0xC1, 0xBF),             // overlong 2-byte
      bytes(0xE0, 0x9F, 0xBF),                          // overlong 3-byte
      bytes(0xF0, 0x8F, 0xBF, 0xBF),                    // overlong 4-byte
      bytes(0xED, 0xA0, 0x80), bytes(0xED, 0xBF, 0xBF), // surrogates
      bytes(0xF4, 0x90, 0x80, 0x80), bytes(0xF5, 0x80), // > U+10FFFF
      bytes(0x80), bytes(0xBF),                         // stray continuation
      bytes(0xC3), bytes(0xE2, 0x82), bytes(0xF0, 0x9F, 0x98)) // truncated
    val referee = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    def jdkValid(b: Array[Byte]): Boolean =
      try { referee.reset().decode(java.nio.ByteBuffer.wrap(b)); true }
      catch { case _: java.nio.charset.CharacterCodingException => false }
    for (v <- invalid) {
      val (ok, n, _) = scan(v)
      assert(!ok && n > 0, v.map(b => f"${b & 0xFF}%02X").mkString(" "))
      assert(!jdkValid(v), "referee disagrees: " +
        v.map(b => f"${b & 0xFF}%02X").mkString(" "))
    }
    // and the referee confirms every valid boundary case too
    assert(jdkValid(bytes(0xF4, 0x8F, 0xBF, 0xBF)))
    assert(jdkValid(bytes(0xED, 0x9F, 0xBF)))
  }

  test("per-byte repair: each invalid byte becomes exactly one U+FFFD, " +
       "valid text around defects survives") {
    val b = "ok ".getBytes ++ bytes(0xFF, 0xFE) ++ "é!".getBytes("UTF-8") ++
      bytes(0xC3)
    val (ok, n, text) = scan(b)
    assert(!ok && n == 3)
    assert(text == "ok ��é!�")
  }

  test("a defect mid-sequence resyncs: the lead byte is replaced, the " +
       "following valid ASCII is kept") {
    val (_, n, text) = scan(bytes('a', 0xE2, 0x82, 'b', 'c'))
    // E2 82 needs a third continuation byte; E2 and 82 each replace
    assert(n == 2 && text == "a��bc", s"$n $text")
  }

  test("mojibake round-trip: é, 4-byte emoji, and the cp1252-only € " +
       "all repair; repairs are idempotent") {
    for (orig <- Seq("café au lait", "emoji 😀 ok", "price €5")) {
      val garbled = new String(orig.getBytes("UTF-8"),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      // ISO-8859-1 maps 0x80-0x9F to C1 controls the cp1252 table
      // renders as the Windows printables — translate like real
      // mojibake displays do
      val displayed = garbled.map(c =>
        if (c >= 0x80 && c <= 0x9F) {
          // what a cp1252 viewer shows for that byte
          new String(Array(c.toByte), "windows-1252").charAt(0)
        } else c).mkString
      assert(fix(displayed) == orig, s"via cp1252 display: $orig")
      assert(fix(garbled) == orig, s"via latin-1 display: $orig")
      assert(fix(fix(garbled)) == orig, "idempotent")
    }
  }

  test("genuine text is a fixed point: ASCII, accents whose bytes are " +
       "not valid UTF-8, and strings with unmappable chars") {
    for (s <- Seq("plain ascii", "naïve façade", "Ã alone", "日本語 text"))
      assert(fix(s) == s, s)
  }

  test("encoding sniff: BOM-less UTF-16 by null parity, binary by " +
       "control density, decode round-trips every label") {
    def enc(b: Array[Byte]): String =
      Utf8Ops.sniffEncoding(b).toString
    def dec(b: Array[Byte]): String = {
      val r = Utf8Ops.decodeSniffed(b)
      if (r == null) null else r.toString
    }
    val text = "hello wörld 42"
    // BOM-less UTF-16, both orders — parity heuristic, no BOM to lean on
    val le = text.getBytes("UTF-16LE")
    val be = text.getBytes("UTF-16BE")
    assert(enc(le) == "utf-16le" && dec(le) == text)
    assert(enc(be) == "utf-16be" && dec(be) == text)
    // BOM forms decode with the BOM stripped
    assert(dec(Array(0xFF.toByte, 0xFE.toByte) ++ le) == text)
    assert(dec(Array(0xFE.toByte, 0xFF.toByte) ++ be) == text)
    assert(dec(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      text.getBytes("UTF-8")) == text)
    // binary: dense control bytes make no text claim
    val bin = Array.tabulate[Byte](64)(i => (i % 8).toByte)
    assert(enc(bin) == "binary" && dec(bin) == null)
    // windows-1252 fallback renders the Windows printables
    val cp = Array[Byte](0x93.toByte, 'h', 'i', 0x94.toByte)
    assert(enc(cp) == "windows-1252" && dec(cp) == "“hi”")
    assert(enc("plain".getBytes) == "utf-8")
    assert(enc(Array.empty[Byte]) == "empty" && dec(Array.empty[Byte]) == "")
  }

  test("BOM-less UTF-16 whose first byte merely LOOKS like a BOM byte " +
       "keeps its first character (only the full 2-byte BOM strips)") {
    def dec(b: Array[Byte]): String = Utf8Ops.decodeSniffed(b).toString
    // LE: 'ÿ' = FF 00 — first byte 0xFF but b(1) != 0xFE, so no BOM
    val le = "ÿ plain ascii follows here".getBytes("UTF-16LE")
    assert((le(0) & 0xFF) == 0xFF && (le(1) & 0xFF) != 0xFE)
    assert(Utf8Ops.sniffEncoding(le).toString == "utf-16le")
    assert(dec(le) == "ÿ plain ascii follows here")
    // BE: U+FE30 = FE 30 — first byte 0xFE but b(1) != 0xFF, so no BOM
    val be = "︰ plain ascii follows here".getBytes("UTF-16BE")
    assert((be(0) & 0xFF) == 0xFE && (be(1) & 0xFF) != 0xFF)
    assert(Utf8Ops.sniffEncoding(be).toString == "utf-16be")
    assert(dec(be) == "︰ plain ascii follows here")
  }
}
