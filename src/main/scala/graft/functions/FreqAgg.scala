package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** Misra-Gries frequency summary as a typed imperative aggregate — the
  * heavy-hitter profiler that answers "is this key skewed enough to
  * salt?" (the diagnostic feeding `operators.Joins.saltedJoin`) without
  * ever materializing the full `groupBy(key).count()`.
  *
  * The exact rendering shuffles one row PER DISTINCT KEY — at 100 TB a
  * high-cardinality key (user id, URL) makes that a full-table shuffle
  * just to find the top handful. This summary keeps at most `capacity`
  * counters per partial buffer, combines map-side, and ships
  * O(capacity) per partition regardless of input size, with the
  * classic deterministic guarantee: every reported count undercounts
  * its true frequency by at most N/(capacity+1), and every key with
  * true frequency above N/(capacity+1) survives into the summary. When
  * the number of distinct keys never exceeds `capacity` no decrement
  * ever fires and the counts are EXACT — which is how the gate query
  * pins it to a DuckDB `count(*)` oracle (capacity 4096 over ≤1.5k
  * distinct users), while 100 TB callers size capacity to the error
  * budget instead of the key domain.
  *
  * Output: array<struct<key:bigint, count:bigint>> sorted (count DESC,
  * key ASC) — deterministic even through count ties.
  */
case class FreqAgg(
    key: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {
  require(capacity > 0, "freq_agg needs capacity > 0")

  override def children: Seq[Expression] = Seq(key)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"freq_agg expects a bigint key (use FreqAgg.coerced), got ${key.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty

  /** Classic MG step: hit increments; a miss inserts while room remains,
    * otherwise decrements EVERY counter (dropping zeros) — each such
    * sweep retires capacity+1 units of total count, which is where the
    * N/(capacity+1) bound comes from. */
  private def offer(buf: mutable.LongMap[Long], k: Long, ct: Long): Unit = {
    val cur = buf.getOrElse(k, 0L) // counts are >= 1, so 0 means absent
    if (cur > 0L) buf.update(k, cur + ct)
    else if (buf.size < capacity) buf.update(k, ct)
    else {
      // decrement all by min(ct, smallest counter) rounds at once:
      // a plain -1 loop per input row would be O(capacity) per row
      val snap = buf.toArray // snapshot: never mutate an open-hash map mid-iteration
      var dec = ct
      snap.foreach { case (_, v) => if (v < dec) dec = v }
      snap.foreach { case (kk, v) =>
        if (v - dec <= 0L) buf.remove(kk) else buf.update(kk, v - dec)
      }
      if (ct > dec) offer(buf, k, ct - dec)
    }
  }

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val k = key.eval(input)
    if (k != null) offer(buf, k.asInstanceOf[Long], 1L)
    buf
  }

  /** MG merge: sum counters, then if over capacity shrink by the
    * (capacity+1)-th largest count — the standard merge that preserves
    * the additive error bound across partials. */
  override def merge(buf: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.toArray.foreach { case (k, v) => buf.update(k, buf.getOrElse(k, 0L) + v) }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      buf.toArray.foreach { case (k, v) =>
        if (v - cut <= 0L) buf.remove(k) else buf.update(k, v - cut)
      }
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2) // count DESC
        if (c != 0) c else java.lang.Long.compare(a._1, b._1) // key ASC
      }
    })
    new GenericArrayData(arr.map { case (k, v) =>
      new GenericInternalRow(Array[Any](k, v))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.LongMap.empty[Long]
    var j = 0
    while (j < n) { buf.update(bb.getLong(), bb.getLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0))
  override def prettyName: String = "freq_agg"
}

object FreqAgg {
  def coerced(key: Expression, capacity: Int): FreqAgg =
    FreqAgg(if (key.dataType == LongType) key else Cast(key, LongType), capacity)

  /** groupBy(...).agg(freqSummary(key, capacity)) -> the full MG summary,
    * sorted (count DESC, key ASC). */
  def freqSummary(key: Column, capacity: Int): Column =
    SparkInternals.column(
      coerced(SparkInternals.expression(key), capacity).toAggregateExpression())
}
