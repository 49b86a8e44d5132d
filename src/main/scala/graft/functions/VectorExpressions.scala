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

  /** Integer dot(a, b) over array<int> codes, exact int64 accumulation —
    * the quantized-ANN candidate scorer. A native codegen'd loop instead
    * of `aggregate(zip_with(a*b))`: the higher-order pair is interpreted
    * per row and allocates the zipped array, which dominates the
    * corpus × queries candidate pass. Integer arithmetic is
    * order-independent, so SQL-oracle exactness is unaffected.
    *
    * CONTRACT: inputs must be equal-length, null-element-free code
    * arrays (what `withQuantized` emits). Unequal lengths truncate to
    * the shorter side and a null ELEMENT is read as raw buffer bytes —
    * unlike the zip_with fold, which null-poisoned such inputs. The
    * type check cannot enforce element nullability (transform-derived
    * arrays carry conservative containsNull), so the guarantee lives at
    * the quantizer, not here. */
  case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> inputs")
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0L; var i = 0
      while (i < n) { dot += a.getInt(i).toLong * b.getInt(i); i += 1 }
      dot
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, dot, i) = (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $dot = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (long) $a.getInt($i) * (long) $b.getInt($i);
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

  /** Signed-random-projection (cosine-LSH) signature: bit j = 1 iff
    * `Σ_i signs(j)(i) * x(i) > 0`, accumulated as an ascending-index
    * double fold (same order as the Column-fold it replaces and as the
    * unrolled SQL oracle, so signatures are bit-identical).
    *
    * Built as ONE native expression rather than nbits unrolled
    * `when(fold(...))` Columns: the unrolled form expands to
    * nbits × dim leaf expressions and janino rejects the >64 KB
    * generated method, silently dropping the whole stage out of
    * codegen. Here the matrix rides along as a reference object and
    * the generated code is a constant-size nested loop.
    *
    * A row whose vector is not exactly `signs(0).length` wide would
    * hash garbage — fail loudly instead (same contract as the oracle).
    * Null array in, null signature out; elements must be non-null. */
  case class CosineLshSig(child: Expression, signs: Array[Array[Int]])
      extends UnaryExpression {
    private val nbits = signs.length
    private val dim = signs(0).length
    require(nbits >= 1 && nbits <= 63, s"nbits must be in [1, 63], got $nbits")

    override def dataType: DataType = LongType
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
      if (a.numElements() != dim) throw new RuntimeException(
        s"cosine-LSH: embedding dim != $dim: ${a.numElements()}")
      var sig = 0L; var j = 0
      while (j < nbits) {
        val row = signs(j); var acc = 0.0; var i = 0
        while (i < dim) {
          val x = elemAt(child.dataType, a, i)
          acc = if (row(i) > 0) acc + x else acc - x
          i += 1
        }
        if (acc > 0.0) sig |= 1L << j
        j += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val m = ctx.addReferenceObj("lshSigns", signs, "int[][]")
        val (sig, acc, row, i, j) =
          (ctx.freshName("sig"), ctx.freshName("acc"), ctx.freshName("row"),
            ctx.freshName("i"), ctx.freshName("j"))
        s"""
           |if ($a.numElements() != $dim) {
           |  throw new RuntimeException(
           |    "cosine-LSH: embedding dim != $dim: " + $a.numElements());
           |}
           |long $sig = 0L;
           |for (int $j = 0; $j < $nbits; $j++) {
           |  int[] $row = $m[$j];
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $dim; $i++) {
           |    double x = ${elemGetter(child.dataType, a, i)};
           |    $acc = $row[$i] > 0 ? $acc + x : $acc - x;
           |  }
           |  if ($acc > 0.0) $sig |= 1L << $j;
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "cosine_lsh_sig"
  }

  def cosineLshSig(a: Column, signs: Array[Array[Int]]): Column =
    SparkInternals.column(CosineLshSig(SparkInternals.expression(a), signs))

  // Column-facing API
  def cosineSim(a: Column, b: Column): Column =
    SparkInternals.column(CosineSim(SparkInternals.expression(a), SparkInternals.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    SparkInternals.column(DotProduct(SparkInternals.expression(a), SparkInternals.expression(b)))
  def intDotProduct(a: Column, b: Column): Column =
    SparkInternals.column(IntDotProduct(SparkInternals.expression(a), SparkInternals.expression(b)))
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
