package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parquet WRITER — the other half of the format tier: encode a group
  * of rows into a complete, standards-valid parquet file byte string
  * (magic, PLAIN data pages, thrift-compact PageHeaders and
  * FileMetaData, column statistics, footer). Shipped as an AGGREGATE
  * ([[ParquetFileAgg]]): `groupBy(part).agg(parquet_file(id, name))`
  * yields one file blob per group — exactly how a distributed engine
  * materializes partitioned output, except the file bytes are a value,
  * so they can flow to any sink (object-store PUT in `foreachBatch`, a
  * BLOB column, a downstream re-reader) without touching a filesystem
  * committer. Output rows are sorted by (id, name) before encoding, so
  * the blob is deterministic under arbitrary shuffle arrival order —
  * the property every gate here relies on.
  *
  * Scope: one row group, one PLAIN uncompressed data page per column,
  * two REQUIRED columns (INT64 + UTF8 BYTE_ARRAY) — the minimal
  * complete shape; compression and dictionaries are read-side concerns
  * ([[ParquetPages]] handles them from other writers). Cross-checked
  * both ways: ParquetWriteSpec reads the blobs back with SPARK'S OWN
  * parquet reader (independent implementation), and the gate
  * round-trips through [[ParquetPages]] + [[ParquetFooter]].
  *
  * Reference scope: beyond-reference §2.10.
  */
object ParquetWrite {

  // ---- thrift compact writer ----

  private final class TW {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var lastFid = new scala.collection.mutable.Stack[Int]()
    lastFid.push(0)
    def bytes: Array[Byte] = out.toByteArray
    def u8(v: Int): Unit = out.write(v & 0xff)
    def varint(v0: Long): Unit = {
      var v = v0
      do {
        val b = (v & 0x7f).toInt
        v >>>= 7
        u8(if (v != 0) b | 0x80 else b)
      } while (v != 0)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    private def fieldHeader(fid: Int, tpe: Int): Unit = {
      val d = fid - lastFid.top
      if (d >= 1 && d <= 15) u8((d << 4) | tpe)
      else { u8(tpe); zigzag(fid.toLong) }
      lastFid.pop(); lastFid.push(fid)
    }
    def i32(fid: Int, v: Long): Unit = { fieldHeader(fid, 5); zigzag(v) }
    def i64(fid: Int, v: Long): Unit = { fieldHeader(fid, 6); zigzag(v) }
    def binary(fid: Int, b: Array[Byte]): Unit = {
      fieldHeader(fid, 8); varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def str(fid: Int, s: String): Unit = binary(fid, s.getBytes("UTF-8"))
    def i32List(fid: Int, vs: Seq[Long]): Unit = {
      fieldHeader(fid, 9)
      if (vs.length < 15) u8((vs.length << 4) | 5)
      else { u8(0xf0 | 5); varint(vs.length.toLong) }
      vs.foreach(zigzag)
    }
    def binaryList(fid: Int, vs: Seq[Array[Byte]]): Unit = {
      fieldHeader(fid, 9)
      if (vs.length < 15) u8((vs.length << 4) | 8)
      else { u8(0xf0 | 8); varint(vs.length.toLong) }
      vs.foreach { b => varint(b.length.toLong); out.write(b, 0, b.length) }
    }
    def structListBegin(fid: Int, n: Int): Unit = {
      fieldHeader(fid, 9)
      if (n < 15) u8((n << 4) | 12) else { u8(0xf0 | 12); varint(n.toLong) }
      lastFid.push(0) // elements are structs written bare
    }
    def structListElemEnd(): Unit = { u8(0); lastFid.pop(); lastFid.push(0) }
    def structListEnd(): Unit = lastFid.pop()
    def structBegin(fid: Int): Unit = { fieldHeader(fid, 12); lastFid.push(0) }
    def structEnd(): Unit = { u8(0); lastFid.pop() }
    def stop(): Unit = u8(0)
  }

  private def le64(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }
  private def le32(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  private def pageHeader(numValues: Int, dataLen: Int): Array[Byte] = {
    val w = new TW
    w.i32(1, 0) // type: DATA_PAGE
    w.i32(2, dataLen.toLong) // uncompressed
    w.i32(3, dataLen.toLong) // compressed (UNCOMPRESSED codec)
    w.structBegin(5) // DataPageHeader
    w.i32(1, numValues.toLong)
    w.i32(2, 0) // encoding PLAIN
    w.i32(3, 3) // def levels RLE (none present: required)
    w.i32(4, 3) // rep levels RLE
    w.structEnd()
    w.stop()
    w.bytes
  }

  /** Byte-wise unsigned compare (parquet UTF8 sort order). */
  private def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** Encodes rows (already deterministic order) as a complete parquet
    * file: columns `idName` (INT64 REQUIRED) and `strName` (UTF8
    * BYTE_ARRAY REQUIRED). */
  def fileBytes(rows: Seq[(Long, Array[Byte])], idName: String,
                strName: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write("PAR1".getBytes("UTF-8"))

    // column 1: INT64 PLAIN page
    val idData = {
      val bb = ByteBuffer.allocate(rows.length * 8)
      rows.foreach { case (v, _) => bb.put(le64(v)) }
      bb.array()
    }
    val idPageOffset = out.size().toLong
    val idHeader = pageHeader(rows.length, idData.length)
    out.write(idHeader); out.write(idData)
    val idChunkBytes = idHeader.length.toLong + idData.length

    // column 2: BYTE_ARRAY PLAIN page (4-byte LE length prefix each)
    val strData = {
      val total = rows.map(_._2.length + 4).sum
      val bb = ByteBuffer.allocate(total)
      rows.foreach { case (_, s) => bb.put(le32(s.length)); bb.put(s) }
      bb.array()
    }
    val strPageOffset = out.size().toLong
    val strHeader = pageHeader(rows.length, strData.length)
    out.write(strHeader); out.write(strData)
    val strChunkBytes = strHeader.length.toLong + strData.length

    // statistics
    val idMin = if (rows.isEmpty) 0L else rows.map(_._1).min
    val idMax = if (rows.isEmpty) 0L else rows.map(_._1).max
    val strMin = if (rows.isEmpty) Array.emptyByteArray
      else rows.map(_._2).reduceLeft((a, b) => if (byteLt(b, a)) b else a)
    val strMax = if (rows.isEmpty) Array.emptyByteArray
      else rows.map(_._2).reduceLeft((a, b) => if (byteLt(a, b)) b else a)

    // footer
    val w = new TW
    w.i32(1, 1) // version
    // schema: root + 2 leaves
    w.structListBegin(2, 3)
    w.str(4, "schema"); w.i32(5, 2); w.structListElemEnd()
    w.i32(1, 2) /* INT64 */ ; w.i32(3, 0) /* REQUIRED */ ; w.str(4, idName)
    w.structListElemEnd()
    w.i32(1, 6) /* BYTE_ARRAY */ ; w.i32(3, 0); w.str(4, strName)
    w.i32(6, 0) /* converted_type UTF8 */ ; w.structListElemEnd()
    w.structListEnd()
    w.i64(3, rows.length.toLong) // num_rows
    // one row group
    w.structListBegin(4, 1)
    // columns list
    w.structListBegin(1, 2)
    // chunk 1
    w.i64(2, idPageOffset) // file_offset (deprecated, point at page)
    w.structBegin(3) // ColumnMetaData
    w.i32(1, 2) // INT64
    w.i32List(2, Seq(0L)) // encodings: PLAIN
    w.binaryList(3, Seq(idName.getBytes("UTF-8"))) // path_in_schema
    w.i32(4, 0) // codec UNCOMPRESSED
    w.i64(5, rows.length.toLong)
    w.i64(6, idChunkBytes); w.i64(7, idChunkBytes)
    w.i64(9, idPageOffset)
    w.structBegin(12) // Statistics
    w.i64(3, 0L) // null_count
    w.binary(5, le64(idMax)); w.binary(6, le64(idMin))
    w.structEnd()
    w.structEnd()
    w.structListElemEnd()
    // chunk 2
    w.i64(2, strPageOffset)
    w.structBegin(3)
    w.i32(1, 6)
    w.i32List(2, Seq(0L))
    w.binaryList(3, Seq(strName.getBytes("UTF-8")))
    w.i32(4, 0)
    w.i64(5, rows.length.toLong)
    w.i64(6, strChunkBytes); w.i64(7, strChunkBytes)
    w.i64(9, strPageOffset)
    w.structBegin(12)
    w.i64(3, 0L)
    w.binary(5, strMax); w.binary(6, strMin)
    w.structEnd()
    w.structEnd()
    w.structListElemEnd()
    w.structListEnd() // columns
    w.i64(2, idChunkBytes + strChunkBytes) // total_byte_size
    w.i64(3, rows.length.toLong) // num_rows
    w.structListElemEnd()
    w.structListEnd() // row groups
    w.str(6, "graft version 0.15.0 (build graft)")
    w.stop()
    val footer = w.bytes
    out.write(footer)
    out.write(le32(footer.length))
    out.write("PAR1".getBytes("UTF-8"))
    out.toByteArray
  }

  /** groupBy(...).agg(parquetFile(id, name)) → one parquet file blob
    * per group; rows sorted (id, name) for shuffle-order determinism. */
  case class ParquetFileAgg(
      id: Expression, name: Expression,
      idName: String, strName: String,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Array[Byte])]] {

    override def children: Seq[Expression] = Seq(id, name)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (id.dataType == LongType && name.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parquet_file_agg expects (bigint, string), got " +
          s"(${id.dataType.simpleString}, ${name.dataType.simpleString})")
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): ArrayBuffer[(Long, Array[Byte])] =
      ArrayBuffer.empty

    override def update(buf: ArrayBuffer[(Long, Array[Byte])],
                        input: InternalRow): ArrayBuffer[(Long, Array[Byte])] = {
      val i = id.eval(input)
      val n = name.eval(input)
      if (i != null && n != null)
        buf += ((i.asInstanceOf[Long], n.asInstanceOf[UTF8String].getBytes))
      buf
    }
    override def merge(buf: ArrayBuffer[(Long, Array[Byte])],
                       other: ArrayBuffer[(Long, Array[Byte])])
        : ArrayBuffer[(Long, Array[Byte])] = { buf ++= other; buf }

    override def eval(buf: ArrayBuffer[(Long, Array[Byte])]): Any = {
      val sorted = buf.sortWith { case ((a, as), (b, bs)) =>
        a < b || (a == b && byteLt(as, bs))
      }
      fileBytes(sorted.toSeq, idName, strName)
    }

    override def serialize(buf: ArrayBuffer[(Long, Array[Byte])]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.map(12 + _._2.length).sum)
      bb.putInt(buf.length)
      buf.foreach { case (v, s) => bb.putLong(v); bb.putInt(s.length); bb.put(s) }
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Array[Byte])] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val buf = new ArrayBuffer[(Long, Array[Byte])](n)
      var j = 0
      while (j < n) {
        val v = bb.getLong()
        val s = new Array[Byte](bb.getInt()); bb.get(s)
        buf += ((v, s))
        j += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): ParquetFileAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): ParquetFileAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(id = newChildren(0), name = newChildren(1))
    override def prettyName: String = "parquet_file_agg"
  }

  /** Column face; casts are the caller's contract (bigint id, string
    * payload). */
  def parquetFile(id: Column, name: Column, idName: String,
                  strName: String): Column =
    SparkInternals.column(ParquetFileAgg(
      Cast(SparkInternals.expression(id), LongType),
      Cast(SparkInternals.expression(name), StringType),
      idName, strName).toAggregateExpression())
}
