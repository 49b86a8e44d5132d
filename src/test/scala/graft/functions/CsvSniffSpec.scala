package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

class CsvSniffSpec extends AnyFunSuite {

  private def sniff(s: String): (String, Int, Boolean) = {
    val r = CsvSniff.csvSniff(UTF8String.fromString(s))
    if (r == null) null
    else (r.getUTF8String(0).toString, r.getInt(1), r.getBoolean(2))
  }

  test("all four dialects sniff; quoted fields hide foreign delimiters") {
    assert(sniff("a,b,c\n1,2,3\n4,5,6") == (",", 3, true))
    assert(sniff("a;b\n\"x,y;z\";2") == (";", 2, true))
    assert(sniff("k\tv\n\"a\tb\"\t9") == ("\t", 2, true))
    assert(sniff("p|q|r\n\"1|2\"|x|3") == ("|", 3, true))
  }

  test("header heuristic: type flip detects; all-text and all-numeric " +
       "files report no header") {
    assert(sniff("name,score\nann,9.5\nbob,7")._3)
    assert(!sniff("ann,cat\nbob,dog")._3)
    assert(!sniff("1,2\n3,4")._3)
    // RFC 4180 escaped quote inside a quoted field
    assert(sniff("t,u\n\"he said \"\"hi,hi\"\"\",2") == (",", 2, true))
  }

  test("ragged or single-column files decline (null)") {
    assert(sniff("a,b,c\n1,2") == null)   // inconsistent count
    assert(sniff("just text\nmore text") == null) // no delimiter
    assert(sniff("one line only") == null)
    assert(CsvSniff.csvSniff(null) == null)
  }

  test("inconsistent candidate loses to a consistent one") {
    // ';' is consistent at 2 cols, ',' appears only on one line
    assert(sniff("a;b,c\nd;e") == (";", 2, false))
  }
}
