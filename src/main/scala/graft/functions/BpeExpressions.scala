package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE inference as a native expression: encodes a document's token
  * array into subwords under a learned merge-rank table. The rank map
  * rides the expression as a codegen reference object (driver-built,
  * task-deserialized once — the broadcast-variable shape without a
  * shuffle), and codegen emits one static call per row, so the scan
  * stays inside WholeStageCodegen.
  */
object BpeExpressions {

  /** Encode every word of `toks` (array<string>) and flatten — the
    * per-word greedy lowest-rank-first loop lives in
    * `llm.Bpe.encodeWord`. */
  def encodeTokens(toks: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.numElements() * 2)
    var i = 0
    while (i < toks.numElements()) {
      val w = toks.getUTF8String(i).toString
      // empty tokens (regex-split artifacts) are skipped HERE so the
      // input can be a bare codegen'd split() — a filter() lambda
      // upstream would drop the whole projection out of codegen
      if (w.nonEmpty)
        graft.llm.Bpe.encodeWord(w, ranks).foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class BpeEncode(child: Expression,
                       merges: Seq[(Int, String, String, Long)])
    extends UnaryExpression {
    @transient private lazy val ranks = graft.llm.Bpe.rankTable(merges)

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string> tokens, got ${other.simpleString}")
      }

    override def nullSafeEval(v: Any): Any =
      encodeTokens(v.asInstanceOf[ArrayData], ranks)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
        classOf[java.util.HashMap[String, Integer]].getName)
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.BpeExpressions.encodeTokens($t, $ranksRef);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "bpe_encode"
  }

  def bpeEncode(toks: Column, merges: Seq[(Int, String, String, Long)]): Column =
    SparkInternals.column(BpeEncode(SparkInternals.expression(toks), merges))
}
