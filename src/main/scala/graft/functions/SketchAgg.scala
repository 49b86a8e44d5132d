package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{Intersection, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta and KLL sketches as typed imperative aggregates — the two
  * re-aggregatable summaries Spark's built-ins don't cover:
  *
  *  - Spark ships HLL (`hll_sketch_agg`) for distinct counts, but HLL
  *    sketches can only UNION. The theta sketch additionally supports
  *    set INTERSECTION and difference — "distinct users who did A AND
  *    B" from two already-built per-segment sketches, no rescan of the
  *    raw data and no pairwise `INTERSECT` shuffle. (Apache DataSketches
  *    theta; same library Spark's own HLL functions bind.)
  *  - Spark's `approx_percentile` (t-digest) output is a finished
  *    number, not a mergeable state: a percentile cube must rescan raw
  *    data per rollup level. The KLL sketch is the mergeable-quantiles
  *    summary — store per-cell sketches once, merge along any rollup
  *    axis, query any rank, with the a-priori normalized rank-error
  *    bound ~2.3/k^0.9 (k=200 → ~1.7%).
  *
  * Buffers hold the library objects; partials serialize to the
  * sketches' own compact wire format, so stored sketch columns are
  * readable by any DataSketches binding (Java/C++/Python/PostgreSQL).
  * Theta union/intersection results are order-independent; KLL merge
  * uses sampling during compaction, so merged estimates are
  * reproducible only in the exact (n <= capacity) regime — callers pin
  * gates to the rank-error BOUND, not the estimate (SketchSpec /
  * a14_kll_cube).
  *
  * Output of every aggregate is BinaryType (the sketch); `theta_estimate`
  * / `kll_quantile` scalar expressions read it. These scalars are
  * CodegenFallback: they run once per GROUP on aggregate output, never
  * in the per-row hot path, so codegen would buy nothing.
  */
object SketchAgg {

  private[functions] def thetaUnionBuf(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  /** theta_sketch_agg(col, lgK): raw values -> compact theta sketch.
    * Exact while the distinct count stays under 2^lgK nominal entries
    * (the gate regime); beyond that relative error ~1/sqrt(2^lgK). */
  case class ThetaSketchAgg(
      child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {
    require(lgK >= 4 && lgK <= 26, "theta_sketch_agg: lgK must be in [4, 26]")

    override def children: Seq[Expression] = Seq(child)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_sketch_agg expects bigint or string, got ${other.simpleString}")
    }
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): Union = thetaUnionBuf(lgK)

    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null) v match {
        case l: java.lang.Long => buf.update(l.longValue())
        case s: UTF8String     => buf.update(s.toString)
        case other => throw new IllegalStateException(s"theta_sketch_agg: $other")
      }
      buf
    }
    override def merge(buf: Union, other: Union): Union = {
      buf.union(other.getResult); buf
    }
    override def eval(buf: Union): Any = buf.getResult.toByteArray
    override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = thetaUnionBuf(lgK); u.union(Memory.wrap(bytes)); u
    }
    override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
    override def prettyName: String = "theta_sketch_agg"
  }

  /** theta_union_agg(sketchCol): rollup layer — unions stored sketches. */
  case class ThetaUnionAgg(
      child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

    override def children: Seq[Expression] = Seq(child)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_union_agg expects a binary sketch column, got ${other.simpleString}")
    }
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): Union = thetaUnionBuf(lgK)
    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      buf
    }
    override def merge(buf: Union, other: Union): Union = {
      buf.union(other.getResult); buf
    }
    override def eval(buf: Union): Any = buf.getResult.toByteArray
    override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = thetaUnionBuf(lgK); u.union(Memory.wrap(bytes)); u
    }
    override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
    override def prettyName: String = "theta_union_agg"
  }

  /** theta_intersect_agg(sketchCol): the capability HLL lacks — the
    * intersection of every input sketch in the group. Zero inputs have
    * no well-defined identity (the "universe"), so an all-null/empty
    * group yields NULL; a virgin partial buffer (empty partition) is
    * the no-op in merge. */
  case class ThetaIntersectAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Intersection] {

    override def children: Seq[Expression] = Seq(child)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_agg expects a binary sketch column, got ${other.simpleString}")
    }
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): Intersection =
      SetOperation.builder().buildIntersection()
    override def update(buf: Intersection, input: InternalRow): Intersection = {
      val v = child.eval(input)
      if (v != null)
        buf.intersect(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }
    override def merge(buf: Intersection, other: Intersection): Intersection = {
      if (other.hasResult) buf.intersect(other.getResult)
      buf
    }
    override def eval(buf: Intersection): Any =
      if (buf.hasResult) buf.getResult.toByteArray else null
    // virgin buffer <-> zero-length marker (an intersection's state IS
    // its current result, so re-intersecting the result round-trips)
    override def serialize(buf: Intersection): Array[Byte] =
      if (buf.hasResult) buf.getResult.toByteArray else Array.emptyByteArray
    override def deserialize(bytes: Array[Byte]): Intersection = {
      val i = SetOperation.builder().buildIntersection()
      if (bytes.nonEmpty) i.intersect(Sketches.wrapSketch(Memory.wrap(bytes)))
      i
    }
    override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
    override def prettyName: String = "theta_intersect_agg"
  }

  /** theta_difference(a, b): sketch of A NOT B — completes the set
    * algebra (union/intersect/difference). A binary op over two stored
    * sketches, not an aggregate: "users who did A but never B" is
    * `theta_estimate(theta_difference(skA, skB))`. */
  case class ThetaDifference(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"theta_difference expects (binary, binary), got $other")
      }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      SetOperation.builder().buildANotB().aNotB(
        Sketches.wrapSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])),
        Sketches.wrapSketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))).toByteArray
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "theta_difference"
  }

  /** theta_estimate(sketch): distinct-count estimate of a stored sketch. */
  case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_estimate expects a binary sketch column, got ${other.simpleString}")
    }
    override protected def nullSafeEval(v: Any): Any =
      Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "theta_estimate"
  }

  /** kll_sketch_agg(col, k): raw doubles -> KLL quantiles sketch. */
  case class KllDoublesAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {
    require(k >= 8, "kll_sketch_agg: k must be >= 8")

    override def children: Seq[Expression] = Seq(child)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg expects double (cast first), got ${other.simpleString}")
    }
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)
    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }
    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }
    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))
    override def withNewMutableAggBufferOffset(o: Int): KllDoublesAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllDoublesAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
    override def prettyName: String = "kll_sketch_agg"
  }

  /** kll_merge_agg(sketchCol): rollup layer — merges stored KLL
    * sketches (result k = the smallest input k). */
  case class KllMergeAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

    override def children: Seq[Expression] = Seq(child)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_merge_agg expects a binary sketch column, got ${other.simpleString}")
    }
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)
    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }
    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }
    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))
    override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
    override def prettyName: String = "kll_merge_agg"
  }

  /** kll_quantile(sketch, rank): value at normalized rank (INCLUSIVE
    * criteria — the smallest retained value whose rank >= `rank`, i.e.
    * always one of the input values, never an interpolation). NULL for
    * an empty sketch. */
  case class KllQuantile(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"kll_quantile expects (binary, double), got $other")
      }
    override def eval(input: InternalRow): Any = {
      val s = left.eval(input)
      val r = right.eval(input)
      if (s == null || r == null) null
      else {
        val sk = KllDoublesSketch.heapify(Memory.wrap(s.asInstanceOf[Array[Byte]]))
        if (sk.isEmpty) null
        else sk.getQuantile(r.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
      }
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "kll_quantile"
  }

  // ---- Column-API faces --------------------------------------------------

  private def agg(e: TypedImperativeAggregate[_]): Column =
    SparkInternals.column(e.toAggregateExpression())
  private def ex(c: Column): Expression = SparkInternals.expression(c)

  def thetaSketch(c: Column, lgK: Int = 12): Column =
    agg(ThetaSketchAgg(ex(c), lgK))
  def thetaUnion(c: Column, lgK: Int = 12): Column =
    agg(ThetaUnionAgg(ex(c), lgK))
  def thetaIntersect(c: Column): Column = agg(ThetaIntersectAgg(ex(c)))
  def thetaDifference(a: Column, b: Column): Column =
    SparkInternals.column(ThetaDifference(ex(a), ex(b)))
  def thetaEstimate(c: Column): Column =
    SparkInternals.column(ThetaEstimate(ex(c)))

  def kllSketch(c: Column, k: Int = 400): Column = agg(KllDoublesAgg(ex(c), k))
  def kllMerge(c: Column, k: Int = 400): Column = agg(KllMergeAgg(ex(c), k))
  def kllQuantile(c: Column, rank: Column): Column =
    SparkInternals.column(KllQuantile(ex(c), ex(rank)))
}
