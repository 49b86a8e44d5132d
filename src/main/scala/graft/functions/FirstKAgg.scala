package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded ordered-prefix aggregate: keeps the k FIRST (ord ASC, tie
  * ASC) string payloads per group, combined map-side.
  *
  * This is the state bound for ordered LISTAGG at 100 TB: the uncapped
  * rendering (collect_list → array_sort) carries the whole group through
  * the agg buffer, so one runaway key — a bot session with 10⁸ events —
  * owns an unbounded buffer. This aggregate carries at most k
  * (ord, tie, payload) triples per partial buffer regardless of input
  * size, exactly like `TopKAgg` bounds top-k. Truncation is
  * deterministic by construction: the kept prefix is the global (ord,
  * tie) ASC order, so arbitrary shuffle arrival cannot change WHICH
  * elements survive, only discover them in a different order.
  *
  * Output: array<string> of the ≤k payloads in (ord, tie) ASC order.
  */
case class FirstKAgg(
    ord: Expression, tie: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long, UTF8String)]] {
  require(k > 0, "first-k needs k > 0")

  override def children: Seq[Expression] = Seq(ord, tie, payload)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord.dataType == LongType && tie.dataType == LongType &&
        payload.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"first_k_agg expects (bigint, bigint, string) inputs (use FirstKAgg.coerced), got " +
          s"(${ord.dataType.simpleString}, ${tie.dataType.simpleString}, " +
          s"${payload.dataType.simpleString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long, UTF8String)] =
    ArrayBuffer.empty

  private def beats(o1: Long, t1: Long, o2: Long, t2: Long): Boolean =
    o1 < o2 || (o1 == o2 && t1 < t2)

  private def insert(buf: ArrayBuffer[(Long, Long, UTF8String)],
                     o: Long, t: Long, p: UTF8String): Unit = {
    if (buf.length == k && !beats(o, t, buf.last._1, buf.last._2)) return
    var pos = buf.length
    while (pos > 0 && beats(o, t, buf(pos - 1)._1, buf(pos - 1)._2)) pos -= 1
    buf.insert(pos, (o, t, p))
    if (buf.length > k) buf.remove(k)
  }

  override def update(buf: ArrayBuffer[(Long, Long, UTF8String)],
                      input: InternalRow): ArrayBuffer[(Long, Long, UTF8String)] = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    val p = payload.eval(input)
    if (o != null && t != null && p != null)
      // clone: the evaluated UTF8String may point into a reused row buffer
      insert(buf, o.asInstanceOf[Long], t.asInstanceOf[Long],
        p.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long, UTF8String)],
                     other: ArrayBuffer[(Long, Long, UTF8String)])
      : ArrayBuffer[(Long, Long, UTF8String)] = {
    other.foreach { case (o, t, p) => insert(buf, o, t, p) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long, UTF8String)]): Any =
    new GenericArrayData(buf.map(_._3).toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long, UTF8String)]): Array[Byte] = {
    val payloadBytes = buf.map(_._3.getBytes)
    val bb = ByteBuffer.allocate(4 + buf.length * 20 + payloadBytes.map(_.length).sum)
    bb.putInt(buf.length)
    buf.zip(payloadBytes).foreach { case ((o, t, _), pb) =>
      bb.putLong(o); bb.putLong(t); bb.putInt(pb.length); bb.put(pb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new ArrayBuffer[(Long, Long, UTF8String)](n)
    var j = 0
    while (j < n) {
      val o = bb.getLong(); val t = bb.getLong()
      val pb = new Array[Byte](bb.getInt()); bb.get(pb)
      buf += ((o, t, UTF8String.fromBytes(pb)))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FirstKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FirstKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), tie = newChildren(1), payload = newChildren(2))
  override def prettyName: String = "first_k_agg"
}

object FirstKAgg {
  /** Coerce (ord, tie) to bigint and the payload to string. The input
    * expressions are usually UNRESOLVED here (dataType would throw or
    * lie), so the Cast is unconditional — which means a TIMESTAMP ord
    * would floor to SECONDS. Callers own the conversion: pass
    * `unix_micros(ts)`, as `Stats.listaggCapped` does. */
  def coerced(ord: Expression, tie: Expression, payload: Expression, k: Int): FirstKAgg =
    FirstKAgg(Cast(ord, LongType), Cast(tie, LongType),
      Cast(payload, StringType), k)

  /** groupBy(g).agg(firstK(ord, tie, payload, k)) -> array of the k
    * earliest payloads per group in (ord, tie) ASC order. CONTRACT:
    * `ord`/`tie` must be integral — convert timestamps with
    * `unix_micros` first (a raw timestamp column would be floored to
    * whole seconds by the long cast, scrambling sub-second order). */
  def firstK(ord: Column, tie: Column, payload: Column, k: Int): Column =
    SparkInternals.column(
      coerced(SparkInternals.expression(ord), SparkInternals.expression(tie),
        SparkInternals.expression(payload), k).toAggregateExpression())
}
