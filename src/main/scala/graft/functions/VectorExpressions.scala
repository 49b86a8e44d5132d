package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity/dedup extension operators
  * (SURVEY.md §7.2 M6). Implemented as codegen'd `Expression`s (not UDFs) so
  * they stay inside whole-stage codegen in the ANN/dedup hot loops — no
  * boxing, no serialization of the float arrays.
  *
  * Accumulation is a sequential ascending-index double fold; this exact
  * order is what DuckDB's list_cosine_similarity / list_sum use, so oracle
  * comparisons are bit-identical.
  */
object VectorExpressions {

  private def elemGetter(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  private def elemAt(dt: DataType, arr: ArrayData, i: Int): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  abstract class VectorBinary extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> inputs")
    }
  }

  /** cosine(a, b) = dot(a,b) / (||a|| * ||b||), double accumulation. */
  case class CosineSim(left: Expression, right: Expression) extends VectorBinary {
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = elemAt(left.dataType, a, i); val y = elemAt(right.dataType, b, i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, dot, na, nb, i) =
          (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("na"),
            ctx.freshName("nb"), ctx.freshName("i"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double x = ${elemGetter(left.dataType, a, i)};
           |  double y = ${elemGetter(right.dataType, b, i)};
           |  $dot += x * y; $na += x * x; $nb += y * y;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** dot(a, b), double accumulation. */
  case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += elemAt(left.dataType, a, i) * elemAt(right.dataType, b, i); i += 1 }
      dot
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, dot, i) = (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (${elemGetter(left.dataType, a, i)}) * (${elemGetter(right.dataType, b, i)});
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Euclidean norm ||a||. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> or array<double> input")
      }
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0
      while (i < a.numElements()) { val x = elemAt(child.dataType, a, i); s += x * x; i += 1 }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (s, i) = (ctx.freshName("s"), ctx.freshName("i"))
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double x = ${elemGetter(child.dataType, a, i)}; $s += x * x;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column-facing API
  def cosineSim(a: Column, b: Column): Column =
    SparkInternals.column(CosineSim(SparkInternals.expression(a), SparkInternals.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    SparkInternals.column(DotProduct(SparkInternals.expression(a), SparkInternals.expression(b)))
  def l2Norm(a: Column): Column =
    SparkInternals.column(L2Norm(SparkInternals.expression(a)))

  /** SQL registration: cosine_sim / dot_product / l2_norm. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = SparkInternals.functionRegistry(spark)
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "built-in")
  }
}
