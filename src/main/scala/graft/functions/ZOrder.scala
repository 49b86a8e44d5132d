package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** Z-order (Morton) keys for multi-dimensional data layout.
  *
  * Sorting a table by ONE column clusters its parquet min/max stats for
  * that column only — a filter on any other column still reads every
  * file. Interleaving the bits of several columns into one sort key
  * clusters ALL of them at once (each file covers a small hyper-rectangle
  * of the key space), so row-group/file skipping works for predicates on
  * any interleaved dimension. This is the standard layout trick for
  * 100 TB scan-heavy tables (Delta/Iceberg `ZORDER BY`); here it is a
  * plain codegen'd expression + `repartitionByRange`, no table format
  * required.
  */
object ZOrder {

  /** Bitwise interleave of n long values, `bits` low bits each: input
    * i's bit j lands at output bit `j*n + i` (input 0 owns the even
    * bits for n=2). Inputs MUST already lie in [0, 2^bits) — compose
    * with `scaleToBits` to get there; null in, null out. */
  case class InterleaveBits(children: Seq[Expression], bits: Int) extends Expression {
    require(children.size >= 2, "interleave needs at least 2 inputs")
    require(bits >= 1 && bits * children.size <= 63,
      s"bits * inputs must fit a positive long, got $bits * ${children.size}")

    override def dataType: DataType = LongType
    override def nullable: Boolean = children.exists(_.nullable)
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint inputs, got ${children.map(_.dataType.simpleString)}")

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val n = children.size
      var z = 0L
      var i = 0
      while (i < n) {
        val v = children(i).eval(input)
        if (v == null) return null
        val x = v.asInstanceOf[Long]
        var j = 0
        while (j < bits) { z |= ((x >>> j) & 1L) << (j * n + i); j += 1 }
        i += 1
      }
      z
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val n = children.size
      val evals = children.map(_.genCode(ctx))
      val inputs = evals.map(_.code.toString).mkString("\n")
      val interleave = evals.zipWithIndex.map { case (e, i) =>
        s"""for (int j = 0; j < $bits; j++) {
           |  ${ev.value} |= ((${e.value} >>> j) & 1L) << (j * $n + $i);
           |}""".stripMargin
      }.mkString("\n")
      if (nullable) {
        val anyNull = evals.map(_.isNull.toString).mkString(" || ")
        ev.copy(code =
          code"""
            |$inputs
            |boolean ${ev.isNull} = $anyNull;
            |long ${ev.value} = 0L;
            |if (!${ev.isNull}) {
            |$interleave
            |}
          """.stripMargin)
      } else {
        ev.copy(code =
          code"""
            |$inputs
            |long ${ev.value} = 0L;
            |$interleave
          """.stripMargin, isNull = FalseLiteral)
      }
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
    override def prettyName: String = "interleave_bits"
  }

  /** Affine-scale a value from [lo, hi] onto the integer grid
    * [0, 2^bits): clamp, then `(v - lo) * (2^bits - 1) div (hi - lo)` —
    * integer division end to end, so the mapping is bit-exact in any
    * engine (the multiply stays inside int64 for |v| < 2^(63-bits)). */
  def scaleToBits(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, "scaleToBits needs hi > lo")
    val m = (1L << bits) - 1
    val clamped = greatest(least(c.cast("long"), lit(hi)), lit(lo))
    SparkInternals.column(IntegralDivide(
      SparkInternals.expression((clamped - lit(lo)) * lit(m)),
      SparkInternals.expression(lit(hi - lo))))
  }

  /** Morton key over already-scaled [0, 2^bits) coordinates. */
  def zkey(bits: Int, coords: Column*): Column =
    SparkInternals.column(
      InterleaveBits(coords.map(SparkInternals.expression), bits))
}
