package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Explode, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F1 — the reference's word-segmentation UDTF
  * (SplitFunction.java:9-18 + KeywordUtil.java:16-35, IK analyzer,
  * invoked as `LATERAL TABLE(split_keyword(x))`) rebuilt Spark-first:
  * a codegen'd scalar `TokenizeWords` expression (string → array<string>)
  * composed with Spark's built-in `Explode` generator, so the whole
  * tokenize→fan-out path stays inside whole-stage codegen — no
  * CodegenFallback, no udf boxing, no double materialization.
  *
  * Tokenization: lowercased alphanumeric runs for Latin text, plus CJK
  * bigrams (the standard public substitute for IK's dictionary
  * segmentation — exact IK parity would require its private dictionaries).
  */
object Tokenize {

  def tokenize(text: String): Seq[String] = {
    if (text == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val n = lower.length
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if (c.isLetterOrDigit && c < 0x2E80) {
        var j = i + 1
        while (j < n && { val d = lower.charAt(j); d.isLetterOrDigit && d < 0x2E80 }) j += 1
        out += lower.substring(i, j)
        i = j
      } else if (isCjk(c)) {
        // CJK bigrams: 今天天气 -> 今天, 天天, 天气; an isolated CJK char
        // (run length 1) is emitted alone
        val nextCjk = i + 1 < n && isCjk(lower.charAt(i + 1))
        val prevCjk = i > 0 && isCjk(lower.charAt(i - 1))
        if (nextCjk) out += lower.substring(i, i + 2)
        else if (!prevCjk) out += lower.substring(i, i + 1)
        i += 1
      } else i += 1
    }
    out.toSeq
  }

  private def isCjk(c: Char): Boolean =
    (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF)

  /** Runtime entry point for the generated code (static forwarder on the
    * `Tokenize` class makes it Java-callable). */
  def tokenizeArray(s: UTF8String): GenericArrayData = {
    val words = tokenize(s.toString)
    val arr = new Array[Any](words.length)
    var i = 0
    while (i < words.length) { arr(i) = UTF8String.fromString(words(i)); i += 1 }
    new GenericArrayData(arr)
  }

  /** Codegen'd scalar tokenizer: string → array<string> of keywords. */
  case class TokenizeWords(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }
    override def nullSafeEval(v: Any): Any =
      tokenizeArray(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Tokenize.tokenizeArray($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Generator shape: `split_keyword(text)` → rows of keywords, as
    * `Explode(TokenizeWords(text))` — Spark's own CollectionGenerator
    * supplies the (codegen'd) row fan-out. */
  def splitKeywordExpr(child: Expression): Expression = Explode(TokenizeWords(child))

  /** Column API: `df.select(splitKeyword($"text"))` behaves like
    * explode(); SQL: register then `LATERAL VIEW`/select. */
  def splitKeyword(text: Column): Column =
    SparkInternals.column(splitKeywordExpr(SparkInternals.expression(text)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SparkInternals.functionRegistry(spark)
      .createOrReplaceTempFunction("split_keyword", es => splitKeywordExpr(es.head), "built-in")
}
