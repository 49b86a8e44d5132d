package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst string expressions the built-in function surface
  * lacks. Codegen'd (not UDFs) so they stay inside whole-stage codegen
  * on corpus-wide scans.
  */
object TextExpressions {

  /** Unicode NFC normalization (canonical composition) — Spark has no
    * built-in for it, yet it is the first step of any text
    * canonicalization pipeline (decomposed "e" + U+0301 and composed
    * "é" must hash/dedup identically). Delegates to the JDK's
    * `java.text.Normalizer` (ICU-backed Unicode data); DuckDB's
    * `nfc_normalize` implements the same standard algorithm, which is
    * what makes the operator oracle-checkable. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string input")
      }
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      // fast path: Normalizer.isNormalized is a cheap scan and almost
      // every real-corpus string is already NFC — skip the rewrite
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val str = ctx.freshName("str")
        s"""
           |String $str = $s.toString();
           |${ev.value} = java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.NFC)
           |  ? $s
           |  : UTF8String.fromString(java.text.Normalizer.normalize($str, java.text.Normalizer.Form.NFC));
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def nfcNormalize(c: Column): Column =
    SparkInternals.column(NfcNormalize(SparkInternals.expression(c)))

  /** deflate(text).length / utf8(text).length — the compression-ratio
    * redundancy signal (boilerplate and template spam compress far
    * below prose; a classic corpus-quality feature). Static so codegen
    * calls it directly; one Deflater per call keeps it thread-safe
    * (the object is cheap next to the deflate itself). */
  def deflateRatio(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / bytes.length
    } finally d.end()
  }

  /** Compression-ratio expression: double in (0, ~1.05]; lower = more
    * redundant. Pure map-side, stays inside whole-stage codegen. */
  case class CompressionRatio(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string input")
      }
    override def nullSafeEval(v: Any): Any =
      deflateRatio(v.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.TextExpressions.deflateRatio($s.getBytes());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "compression_ratio"
  }

  def compressionRatio(c: Column): Column =
    SparkInternals.column(CompressionRatio(SparkInternals.expression(c)))
}
