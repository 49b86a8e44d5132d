package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator as-of join — the custom LogicalPlan + SparkStrategy +
  * SparkPlan tier of the extension ladder (SURVEY §"custom operators"),
  * for the one semantics Spark's built-in operators can only emulate:
  * "attach the most recent right row at or before each left row, per
  * key".
  *
  * The composed rendering (`operators/Joins.asofJoin`) unions both
  * sides and runs a running `last()` window — correct, one shuffle,
  * but it materializes the union (left rows carry null right-payload
  * columns and vice versa) and pays the window machinery per row. This
  * physical operator instead DECLARES its needs to the planner —
  * co-clustered children (`ClusteredDistribution` on the key) sorted
  * by (key, time) — and then streams BOTH sides through one forward
  * two-pointer merge per partition: O(|L| + |R|) with ONE buffered
  * right row of state, no union, no window buffers, no row widening.
  * EnsureRequirements inserts the exchanges/sorts only when the
  * children aren't already partitioned/sorted — so a bucketed layout
  * runs this join with ZERO exchanges, which the window form can never
  * do (its union destroys the children's partitioning).
  *
  * Semantics (parity with `asofJoin(direction = "backward")`, pinned
  * by the shared gate oracle): inclusive `right.time <= left.time`;
  * among equal times the greatest `rightTie` wins (the required right
  * ordering puts it last); NULL left key/time, and NULL right
  * key/time rows, never match.
  *
  * Reference behavior mirrored: the interval-join family
  * (`OrderWideApp`'s stream joins) — this is its "latest state as-of"
  * face, gmall's dim-lookup-at-event-time generalized.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, leftTime: Attribute,
                        rightKey: Attribute, rightTime: Attribute,
                        rightTie: Option[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, leftTime: Attribute,
                        rightKey: Attribute, rightTime: Attribute,
                        rightTie: Option[Attribute]) extends BinaryExecNode
    with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-cluster on the join key; EnsureRequirements adds exchanges only
  // when a child isn't already hash-partitioned on it (bucketed reads
  // and pre-partitioned intermediates pass through exchange-free)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTie.map(t => SortOrder(t, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  /** Long-backed physical types (bigint/int/timestamp/date) take the
    * primitive merge loop — no per-row boxing, no Ordering dispatch.
    * Anything else falls back to the interpreted comparators. */
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }

  private def isFastPath: Boolean =
    Seq(leftKey, leftTime, rightKey, rightTime)
      .forall(a => longBacked(a.dataType))

  // ---- whole-stage codegen (primitive fast path only) ----
  //
  // The iterator doExecute() below already runs a primitive merge with a
  // generated UnsafeProjection; what it still pays per OUTPUT row is the
  // iterator hand-off to the parent operator and the projection copy.
  // Participating in WholeStageCodegen fuses the merge loop into the
  // parent's generated code: the JoinedRow is consumed in place (the
  // parent's projection/filter reads it directly) and the per-row
  // virtual calls disappear. The interpreted (non-long-backed) path
  // keeps the iterator rendering — supportCodegen gates it out.

  override def supportCodegen: Boolean = isFastPath

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // the emitted JoinedRow is reused across output rows
  override def needCopyResult: Boolean = true

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext)
      : String = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    def intBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.DateType
    def getter(row: String, idx: Int, isInt: Boolean): String =
      if (isInt) s"(long) $row.getInt($idx)" else s"$row.getLong($idx)"
    val row = "org.apache.spark.sql.catalyst.InternalRow"
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")
    val rHead = ctx.addMutableState(row, "asofRHead")
    val rHeadKey = ctx.addMutableState("long", "asofRHeadKey")
    val rHeadTime = ctx.addMutableState("long", "asofRHeadTime")
    val matchRow = ctx.addMutableState(row, "asofMatch")
    val matchKey = ctx.addMutableState("long", "asofMatchKey")
    val started = ctx.addMutableState("boolean", "asofStarted")
    val advance = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  $rHead = null;
         |  while ($rHead == null && $rightInput.hasNext()) {
         |    $row r = ($row) $rightInput.next();
         |    if (!r.isNullAt($rKeyIdx) && !r.isNullAt($rTimeIdx)) {
         |      $rHead = r;
         |      $rHeadKey = ${getter("r", rKeyIdx, intBacked(rightKey.dataType))};
         |      $rHeadTime = ${getter("r", rTimeIdx, intBacked(rightTime.dataType))};
         |    }
         |  }
         |}
       """.stripMargin)
    val lrow = ctx.freshName("asofLeftRow")
    val outRight = ctx.freshName("asofOutRight")
    val lk = ctx.freshName("asofLk")
    val lt = ctx.freshName("asofLt")
    // per-column output vars (SMJ-style), not a JoinedRow hand-off: the
    // parent reads primitives straight out of the sorted UnsafeRows and
    // its usedInputs pruning drops untouched columns at codegen time
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, ExprCode, JavaCode}
    val resultVars = output.zipWithIndex.map { case (a, i) =>
      val fromLeft = i < left.output.size
      val rowTerm = if (fromLeft) lrow else outRight
      val ord = if (fromLeft) i else i - left.output.size
      val jt = CodeGenerator.javaType(a.dataType)
      val valueVar = ctx.freshName("asofVal")
      val isNullVar = ctx.freshName("asofNull")
      val getVal = CodeGenerator.getValue(rowTerm, a.dataType, ord.toString)
      // right side: outRight == null encodes "no match" — all columns null
      val nullCond =
        if (fromLeft) s"$rowTerm.isNullAt($ord)"
        else s"($rowTerm == null || $rowTerm.isNullAt($ord))"
      val c =
        code"""
          |boolean $isNullVar = $nullCond;
          |$jt $valueVar = $isNullVar ?
          |  ${CodeGenerator.defaultValue(a.dataType)} : ($getVal);
        """.stripMargin
      ExprCode(c, JavaCode.isNullVariable(isNullVar),
        JavaCode.variable(valueVar, a.dataType))
    }
    s"""
       |if (!$started) { $started = true; $advance(); }
       |while ($leftInput.hasNext()) {
       |  $row $lrow = ($row) $leftInput.next();
       |  $row $outRight;
       |  if ($lrow.isNullAt($lKeyIdx) || $lrow.isNullAt($lTimeIdx)) {
       |    $outRight = null;
       |  } else {
       |    long $lk = ${getter(lrow, lKeyIdx, intBacked(leftKey.dataType))};
       |    long $lt = ${getter(lrow, lTimeIdx, intBacked(leftTime.dataType))};
       |    if ($matchRow != null && $matchKey != $lk) { $matchRow = null; }
       |    while ($rHead != null && $rHeadKey < $lk) { $advance(); }
       |    while ($rHead != null && $rHeadKey == $lk && $rHeadTime <= $lt) {
       |      $matchRow = $rHead.copy();
       |      $matchKey = $rHeadKey;
       |      $advance();
       |    }
       |    $outRight = $matchRow;
       |  }
       |  ${consume(ctx, resultVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.size
    val outAttrs = output
    val fastPath = Seq(leftKey, leftTime, rightKey, rightTime)
      .forall(a => longBacked(a.dataType))
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    def intBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.DateType
    val lKeyInt = intBacked(leftKey.dataType)
    val lTimeInt = intBacked(leftTime.dataType)
    val rKeyInt = intBacked(rightKey.dataType)
    val rTimeInt = intBacked(rightTime.dataType)
    val lKeyB = BindReferences.bindReference[Expression](leftKey, left.output)
    val lTimeB = BindReferences.bindReference[Expression](leftTime, left.output)
    val rKeyB = BindReferences.bindReference[Expression](rightKey, right.output)
    val rTimeB = BindReferences.bindReference[Expression](rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val project = GenerateUnsafeProjection.generate(
        outAttrs.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable) })
      if (fastPath) {
        // primitive merge: getLong/getInt straight off the sorted rows
        def lKey(r: InternalRow): Long =
          if (lKeyInt) r.getInt(lKeyIdx).toLong else r.getLong(lKeyIdx)
        def lTime(r: InternalRow): Long =
          if (lTimeInt) r.getInt(lTimeIdx).toLong else r.getLong(lTimeIdx)
        def rKey(r: InternalRow): Long =
          if (rKeyInt) r.getInt(rKeyIdx).toLong else r.getLong(rKeyIdx)
        def rTime(r: InternalRow): Long =
          if (rTimeInt) r.getInt(rTimeIdx).toLong else r.getLong(rTimeIdx)
        var rHead: InternalRow = null
        var rHeadKey = 0L
        var rHeadTime = 0L
        def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTimeIdx)) {
              rHead = r; rHeadKey = rKey(r); rHeadTime = rTime(r)
            }
          }
        }
        advanceRight()
        var matchRow: InternalRow = null
        var matchKey = 0L
        lIter.map { lrow =>
          if (lrow.isNullAt(lKeyIdx) || lrow.isNullAt(lTimeIdx)) {
            project(joiner(lrow, nullRight))
          } else {
            val lk = lKey(lrow)
            val lt = lTime(lrow)
            if (matchRow != null && matchKey != lk) matchRow = null
            while (rHead != null && rHeadKey < lk) advanceRight()
            while (rHead != null && rHeadKey == lk && rHeadTime <= lt) {
              matchRow = rHead.copy(); matchKey = rHeadKey
              advanceRight()
            }
            project(joiner(lrow, if (matchRow != null) matchRow else nullRight))
          }
        }
      } else {
        // interpreted fallback for non-primitive key/time types
        var rHead: InternalRow = null
        var rHeadKey: Any = null
        var rHeadTime: Any = null
        def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyB.eval(r)
            val t = rTimeB.eval(r)
            if (k != null && t != null) { rHead = r; rHeadKey = k; rHeadTime = t }
          }
        }
        advanceRight()
        var matchRow: InternalRow = null
        var matchKey: Any = null
        lIter.map { lrow =>
          val lk = lKeyB.eval(lrow)
          val lt = lTimeB.eval(lrow)
          if (lk == null || lt == null) {
            project(joiner(lrow, nullRight))
          } else {
            if (matchRow != null && keyOrd.compare(matchKey, lk) != 0) {
              matchRow = null
            }
            while (rHead != null && keyOrd.compare(rHeadKey, lk) < 0) {
              advanceRight()
            }
            while (rHead != null && keyOrd.compare(rHeadKey, lk) == 0 &&
              timeOrd.compare(rHeadTime, lt) <= 0) {
              matchRow = rHead.copy()
              // derive the cached key from the COPY: rHeadKey may alias
              // the right iterator's reused row buffer (sort spill
              // reader, columnar batch) and would be corrupted by the
              // next advance — the copy owns its memory
              matchKey = rKeyB.eval(matchRow)
              advanceRight()
            }
            project(joiner(lrow, if (matchRow != null) matchRow else nullRight))
          }
        }
      }
    }
  }
}

object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, lt, rk, rt, tie) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}
