package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Almost-JSON repair — the parse-the-model's-output tier of a
  * training-data pipeline (LLM generations, scraped JS object
  * literals and lenient configs are full of almost-JSON that
  * `from_json` rejects outright). A single char walk that tracks
  * string context — which is exactly what a regex cannot do — and
  * normalizes, OUTSIDE strings only:
  *
  *   - single-quoted strings → double-quoted (interior `"` escaped,
  *     `\'` unescaped);
  *   - unquoted object keys and bare-word values → quoted; the
  *     Python/JS literals True/False/None/undefined/NaN/±Infinity →
  *     true/false/null;
  *   - trailing commas before `}`/`]` dropped; `//` and C-style
  *     comments dropped;
  *   - unbalanced structure healed: stray closers dropped, missing
  *     closers (and an unterminated string) appended at EOF.
  *
  * Returns null for null/blank input or input with no JSON structure
  * at all. The result is well-FORMED by construction of the walk
  * (every opened scope closes); semantic garbage stays garbage —
  * repair is not validation. Map-side codegen'd expression.
  */
object JsonRepair {

  def jsonRepair(s: UTF8String): UTF8String = {
    if (s == null) return null
    val in = s.toString
    val n = in.length
    val out = new java.lang.StringBuilder(n + 8)
    val stack = new java.util.ArrayDeque[Char]()
    var i = 0
    var sawStructure = false

    def trimTrailingComma(): Unit = {
      var e = out.length - 1
      while (e >= 0 && Character.isWhitespace(out.charAt(e))) e -= 1
      if (e >= 0 && out.charAt(e) == ',') out.delete(e, e + 1)
    }
    def copyString(quote: Char): Unit = {
      out.append('"')
      i += 1
      var closed = false
      while (i < n && !closed) {
        val c = in.charAt(i)
        if (c == '\\' && i + 1 < n) {
          val e = in.charAt(i + 1)
          if (e == '\'' && quote == '\'') out.append('\'') // \' → '
          else { out.append('\\'); out.append(e) }
          i += 2
        } else if (c == quote) { closed = true; i += 1 }
        else if (c == '"') { out.append("\\\""); i += 1 } // inside '…'
        else if (c == '\n') { out.append("\\n"); i += 1 } // raw newline
        else { out.append(c); i += 1 }
      }
      out.append('"') // unterminated at EOF heals too
    }

    while (i < n) {
      val c = in.charAt(i)
      if (c == '"' || c == '\'') copyString(c)
      else if (c == '/' && i + 1 < n && in.charAt(i + 1) == '/') {
        while (i < n && in.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && in.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(in.charAt(i) == '*' && in.charAt(i + 1) == '/'))
          i += 1
        i = math.min(n, i + 2)
      } else if (c == '{' || c == '[') {
        sawStructure = true
        stack.push(c); out.append(c); i += 1
      } else if (c == '}' || c == ']') {
        val want = if (c == '}') '{' else '['
        if (!stack.isEmpty && stack.peek() == want) {
          trimTrailingComma()
          stack.pop(); out.append(c)
        } // else: stray closer — drop it
        i += 1
      } else if (Character.isDigit(c) ||
        ((c == '-' || c == '.') && i + 1 < n &&
          (Character.isDigit(in.charAt(i + 1)) || in.charAt(i + 1) == '.'))) {
        // consume the whole number token so its exponent letter can't
        // be mistaken for a bare word (1e5 must not become 1"e5")
        var e = i + 1
        while (e < n && (Character.isDigit(in.charAt(e)) ||
          "eE+-.".indexOf(in.charAt(e)) >= 0)) e += 1
        var tok = in.substring(i, e)
        if (tok.charAt(0) == '.') tok = "0" + tok // .5 → 0.5
        out.append(tok)
        i = e
      } else if (Character.isLetter(c) || c == '_' || c == '$') {
        var e = i
        while (e < n && (Character.isLetterOrDigit(in.charAt(e)) ||
          in.charAt(e) == '_' || in.charAt(e) == '$')) e += 1
        val word = in.substring(i, e)
        i = e
        word match {
          case "true" | "false" | "null" => out.append(word)
          case "True" => out.append("true")
          case "False" => out.append("false")
          case "None" | "undefined" | "NaN" | "Infinity" =>
            out.append("null")
          case _ => out.append('"').append(word).append('"')
        }
      } else if (c == '-' && i + 8 <= n && in.startsWith("Infinity", i + 1)) {
        out.append("null"); i += 9
      } else if (c == '+' && i + 1 < n && Character.isDigit(in.charAt(i + 1))) {
        i += 1 // +5 → 5
      } else { out.append(c); i += 1 }
    }
    trimTrailingComma()
    while (!stack.isEmpty)
      out.append(if (stack.pop() == '{') '}' else ']')
    val r = out.toString.trim
    if (r.isEmpty || !sawStructure) null else UTF8String.fromString(r)
  }

  case class Repair(child: Expression) extends UnaryExpression {
    override def prettyName: String = "json_repair"
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string input")
      }
    override def nullSafeEval(v: Any): Any =
      jsonRepair(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.unsafe.types.UTF8String $r =
           |  graft.functions.JsonRepair.jsonRepair($s);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def jsonRepairCol(c: Column): Column =
    SparkInternals.column(Repair(SparkInternals.expression(c)))
}
