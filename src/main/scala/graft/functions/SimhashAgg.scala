package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** 60-bit SimHash as a single-pass typed imperative aggregate.
  *
  * Input: one 60-bit token hash per row (see Dedup.h60). The buffer is
  * the 60 vote counters (+1/-1 per bit per token); eval folds the
  * majority signs into the fingerprint long. Bit-identical to the
  * declarative explode(0..59) formulation but without materializing
  * 60 rows per token — one update per token, mergeable map-side, so the
  * shuffle carries 60 longs per document instead of 60 rows per token.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](60)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 60) {
        buffer(b) += (((h >> b) & 1L) * 2L - 1L)
        b += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < 60) { buffer(b) += other(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var fp = 0L
    var b = 0
    while (b < 60) { if (buffer(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(60 * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(60)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "simhash_agg"
}

object SimhashAgg {
  def simhashAgg(tokenHash: Column): Column =
    SparkInternals.column(
      SimhashAgg(SparkInternals.expression(tokenHash)).toAggregateExpression())
}
