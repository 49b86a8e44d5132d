package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** Bounded top-k as a typed imperative aggregate: keeps the k best
  * (value DESC, id ASC) pairs per group, combined map-side.
  *
  * The declarative rendering — `row_number() OVER (PARTITION BY g ORDER
  * BY v DESC)` then `rank <= k` — shuffles and sorts EVERY row into the
  * group's single reducer; with a low-cardinality group key (25 nations)
  * that is 25 tasks sorting the whole table at any scale. This aggregate
  * carries at most k pairs per group through each partial buffer, so the
  * shuffle volume is k × partitions × |groups| regardless of input size,
  * and no full sort happens anywhere.
  *
  * Output: array<struct<id:bigint, value:double>> in rank order (the
  * caller posexplodes to rows). Ties break on the smaller id, matching
  * the window form's ORDER BY v DESC, id ASC.
  */
case class TopKAgg(
    value: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {
  require(k > 0, "top-k needs k > 0")

  override def children: Seq[Expression] = Seq(value, id)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (value.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_agg expects (double, bigint) inputs (use TopKAgg.coerced), got " +
          s"(${value.dataType.simpleString}, ${id.dataType.simpleString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  /** (v1,i1) ranks strictly before (v2,i2)? java.lang.Double.compare is
    * exactly Spark's SQL double ordering (SQLOrderingUtil): NaN sorts
    * greatest (so a DESC window puts it first) and equal to itself,
    * -0.0 < 0.0 — a plain `>` would instead make NaN incomparable,
    * diverging from the row_number-window form this aggregate mirrors. */
  private def beats(v1: Double, i1: Long, v2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(v1, v2)
    c > 0 || (c == 0 && i1 < i2)
  }

  private def insert(buf: ArrayBuffer[(Double, Long)], v: Double, i: Long): Unit = {
    if (buf.length == k && !beats(v, i, buf.last._1, buf.last._2)) return
    var pos = buf.length
    while (pos > 0 && beats(v, i, buf(pos - 1)._1, buf(pos - 1)._2)) pos -= 1
    buf.insert(pos, (v, i))
    if (buf.length > k) buf.remove(k)
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      insert(buf, v.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
                     other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach { case (v, i) => insert(buf, v, i) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (v, i) =>
      new GenericInternalRow(Array[Any](i, v))
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (v, i) => bb.putDouble(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((bb.getDouble(), bb.getLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_agg"
}

object TopKAgg {
  /** Coerce (value, id) to (double, bigint) — int/decimal columns work
    * instead of dying with an executor ClassCastException. */
  def coerced(value: Expression, id: Expression, k: Int): TopKAgg =
    TopKAgg(
      if (value.dataType == DoubleType) value else Cast(value, DoubleType),
      if (id.dataType == LongType) id else Cast(id, LongType), k)

  /** groupBy(g).agg(topK(value, id, k)) -> array of the k best
    * (value DESC, id ASC) pairs per group. */
  def topK(value: Column, id: Column, k: Int): Column =
    SparkInternals.column(
      coerced(SparkInternals.expression(value),
        SparkInternals.expression(id), k).toAggregateExpression())
}
