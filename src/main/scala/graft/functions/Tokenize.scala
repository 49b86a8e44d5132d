package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F1 — the reference's word-segmentation UDTF
  * (SplitFunction.java:9-18 + KeywordUtil.java:16-35, IK analyzer,
  * invoked as `LATERAL TABLE(split_keyword(x))`) rebuilt as a native
  * Catalyst `Generator`: one input string row → N keyword rows, no
  * udf+explode double materialization.
  *
  * Tokenization: lowercased alphanumeric runs for Latin text, plus CJK
  * bigrams (the standard public substitute for IK's dictionary
  * segmentation — exact IK parity would require its private dictionaries).
  */
object Tokenize {

  def tokenize(text: String): Seq[String] = {
    if (text == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val lower = text.toLowerCase
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

  /** Generator expression: `split_keyword(text)` → rows of `word`. */
  case class SplitKeyword(child: Expression) extends UnaryExpression
      with Generator with CodegenFallback {
    override def elementSchema: StructType =
      StructType(Seq(StructField("word", StringType)))
    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val v = child.eval(input)
      if (v == null) Nil
      else tokenize(v.toString).map { w =>
        InternalRow(UTF8String.fromString(w))
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: `df.select(splitKeyword($"text"))` behaves like
    * explode(); SQL: register then `LATERAL VIEW`/select. */
  def splitKeyword(text: Column): Column =
    SparkInternals.column(SplitKeyword(SparkInternals.expression(text)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SparkInternals.functionRegistry(spark)
      .createOrReplaceTempFunction("split_keyword", es => SplitKeyword(es.head), "built-in")
}
