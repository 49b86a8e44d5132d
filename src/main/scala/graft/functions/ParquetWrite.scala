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
  * (magic, data pages, thrift-compact PageHeaders and FileMetaData,
  * column statistics, footer). Shipped as an AGGREGATE
  * ([[ParquetFileAgg]]): `groupBy(part).agg(parquet_file(id, name))`
  * yields one file blob per group — exactly how a distributed engine
  * materializes partitioned output, except the file bytes are a value,
  * so they can flow to any sink (object-store PUT in `foreachBatch`, a
  * BLOB column, a downstream re-reader) without touching a filesystem
  * committer. Output rows are sorted by (id, name) before encoding, so
  * the blob is deterministic under arbitrary shuffle arrival order —
  * the property every gate here relies on.
  *
  * Surface ([[fileBytes]]): caller-specified FLAT schema (INT64 and
  * UTF8 BYTE_ARRAY columns, REQUIRED or OPTIONAL), definition levels
  * (RLE runs) for nullable columns, PLAIN or dictionary
  * (PLAIN_DICTIONARY page pair: dict page + bit-packed index pages)
  * encodings, UNCOMPRESSED / SNAPPY / ZSTD page compression (the
  * in-house compressors emit literal-only snappy and raw-block zstd
  * frames — always valid, byte-exact round-trip, no matcher needed —
  * the write-side twins of stored-block
  * deflate), and multi-row-group layout at a caller-set group size
  * with per-group statistics (so a reader's stats pruning has
  * something to prune on). Cross-checked both ways: ParquetWriteSpec
  * reads every variant back with SPARK'S OWN parquet reader
  * (independent implementation), and the gates round-trip through
  * [[ParquetPages]] + [[ParquetFooter]].
  *
  * Reference scope: beyond-reference §2.10.
  */
object ParquetWrite {

  /** One flat output column: INT64 (isString=false, values
    * java.lang.Long) or UTF8 BYTE_ARRAY (values Array[Byte]); nulls
    * allowed iff `nullable`. */
  final case class ColSpec(name: String, isString: Boolean,
                           nullable: Boolean)

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

  private def dataPageHeader(numValues: Int, uncompLen: Int, compLen: Int,
                             encoding: Int): Array[Byte] = {
    val w = new TW
    w.i32(1, 0) // type: DATA_PAGE
    w.i32(2, uncompLen.toLong)
    w.i32(3, compLen.toLong)
    w.structBegin(5) // DataPageHeader
    w.i32(1, numValues.toLong)
    w.i32(2, encoding.toLong) // PLAIN (0) or PLAIN_DICTIONARY (2)
    w.i32(3, 3) // def levels RLE
    w.i32(4, 3) // rep levels RLE
    w.structEnd()
    w.stop()
    w.bytes
  }

  private def dictPageHeader(numValues: Int, uncompLen: Int,
                             compLen: Int): Array[Byte] = {
    val w = new TW
    w.i32(1, 2) // type: DICTIONARY_PAGE
    w.i32(2, uncompLen.toLong)
    w.i32(3, compLen.toLong)
    w.structBegin(7) // DictionaryPageHeader
    w.i32(1, numValues.toLong)
    w.i32(2, 2) // encoding PLAIN_DICTIONARY
    w.structEnd()
    w.stop()
    w.bytes
  }

  /** Literal-only snappy block (always-valid "stored" compression):
    * varint preamble + one literal element. */
  private[functions] def snappyStored(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    var v = b.length.toLong
    do {
      val x = (v & 0x7f).toInt
      v >>>= 7
      out.write(if (v != 0) x | 0x80 else x)
    } while (v != 0)
    val n = b.length - 1
    if (b.length == 0) ()
    else if (n < 60) out.write(n << 2)
    else if (n < (1 << 8)) { out.write(60 << 2); out.write(n) }
    else if (n < (1 << 16)) {
      out.write(61 << 2); out.write(n & 0xff); out.write((n >>> 8) & 0xff)
    } else {
      out.write(62 << 2)
      out.write(n & 0xff); out.write((n >>> 8) & 0xff)
      out.write((n >>> 16) & 0xff)
    }
    out.write(b, 0, b.length)
    out.toByteArray
  }

  /** RLE runs (the hybrid's RLE form only) over small levels; parquet
    * v1 length prefix NOT included. */
  private def rleRuns(levels: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16)
    def varint(v0: Long): Unit = {
      var v = v0
      do {
        val x = (v & 0x7f).toInt
        v >>>= 7
        out.write(if (v != 0) x | 0x80 else x)
      } while (v != 0)
    }
    var i = 0
    while (i < levels.length) {
      var j = i
      while (j < levels.length && levels(j) == levels(i)) j += 1
      varint((j - i).toLong << 1)
      out.write(levels(i) & 0xff) // bit width 1 → byte width 1
      i = j
    }
    out.toByteArray
  }

  /** Bit-packed-groups hybrid run for dictionary indices: header
    * varint(groups << 1 | 1), then LSB-first packed values padded to
    * groups of 8. */
  private def bitPackedIndices(idx: Array[Int], bitWidth: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(idx.length + 8)
    val groups = (idx.length + 7) >> 3
    var h = groups.toLong << 1 | 1
    do {
      val x = (h & 0x7f).toInt
      h >>>= 7
      out.write(if (h != 0) x | 0x80 else x)
    } while (h != 0)
    var acc = 0L
    var accBits = 0
    var i = 0
    val n = groups * 8
    while (i < n) {
      val v = if (i < idx.length) idx(i) else 0
      acc |= v.toLong << accBits
      accBits += bitWidth
      while (accBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8; accBits -= 8
      }
      i += 1
    }
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  private def plainValue(isString: Boolean, v: Any,
                         out: java.io.ByteArrayOutputStream): Unit =
    if (isString) {
      val b = v.asInstanceOf[Array[Byte]]
      out.write(le32(b.length), 0, 4); out.write(b, 0, b.length)
    } else out.write(le64(v.asInstanceOf[java.lang.Long].longValue), 0, 8)

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

  /** Per-chunk encode result for footer assembly. */
  private final class ChunkInfo(val firstDataPage: Long, val dictPage: Long,
    val totalBytes: Long, val uncompBytes: Long, val nullCount: Long,
    val minV: Array[Byte], val maxV: Array[Byte], val encodings: Seq[Long])

  /** Encodes rows (already deterministic order) as a complete parquet
    * file with the caller-specified flat schema. `codec` 0 =
    * UNCOMPRESSED, 1 = SNAPPY (literal-only blocks); `useDictionary`
    * writes a PLAIN_DICTIONARY page pair per chunk; `rowGroupRows`
    * splits the rows into row groups with per-group statistics. */
  def fileBytes(cols: Seq[ColSpec], rows: Seq[Array[Any]],
                codec: Int = 0, useDictionary: Boolean = false,
                rowGroupRows: Int = Int.MaxValue): Array[Byte] = {
    require(cols.nonEmpty, "parquet file needs at least one column")
    require(codec == 0 || codec == 1 || codec == 6,
      s"unsupported codec $codec (0 uncompressed, 1 snappy, 6 zstd)")
    require(rowGroupRows > 0, "rowGroupRows must be positive")
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write("PAR1".getBytes("UTF-8"))

    def compress(raw: Array[Byte]): Array[Byte] = codec match {
      case 0 => raw
      case 1 => snappyStored(raw)
      case _ => ZstdDecode.frameStored(raw)
    }

    /** Writes one column chunk of `group` and returns its footer info. */
    def writeChunk(ci: Int, group: Seq[Array[Any]]): ChunkInfo = {
      val spec = cols(ci)
      val vals = group.map(_(ci))
      vals.foreach { v =>
        require(v != null || spec.nullable,
          s"null in non-nullable column ${spec.name}")
      }
      val nonNull = vals.filter(_ != null)
      val defLevels: Array[Byte] =
        if (!spec.nullable) Array.emptyByteArray
        else {
          val runs = rleRuns(vals.map(v => if (v == null) 0 else 1).toArray)
          le32(runs.length) ++ runs
        }
      var dictPage = -1L
      var firstData = -1L
      var totalBytes = 0L
      var uncompBytes = 0L // headers + RAW page bodies (spec field 6)
      var encodings: Seq[Long] = null

      if (useDictionary) {
        // dictionary in first-occurrence order; indices reference it
        val index = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
        val keyed = nonNull.map { v =>
          val k: Any = if (spec.isString)
            new String(v.asInstanceOf[Array[Byte]], java.nio.charset.StandardCharsets.ISO_8859_1)
          else v
          index.getOrElseUpdate(k, index.size)
        }
        val dictRaw = new java.io.ByteArrayOutputStream(256)
        index.keysIterator.foreach { k =>
          val v: Any = if (spec.isString)
            k.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          else k
          plainValue(spec.isString, v, dictRaw)
        }
        val dictBody = dictRaw.toByteArray
        val dictComp = compress(dictBody)
        dictPage = out.size().toLong
        val dh = dictPageHeader(index.size, dictBody.length, dictComp.length)
        out.write(dh); out.write(dictComp)
        totalBytes += dh.length + dictComp.length
        uncompBytes += dh.length + dictBody.length

        val bw = 32 - Integer.numberOfLeadingZeros(math.max(index.size - 1, 0))
        val body = new java.io.ByteArrayOutputStream(256)
        body.write(defLevels, 0, defLevels.length)
        body.write(bw)
        val packed = bitPackedIndices(keyed.toArray, bw)
        body.write(packed, 0, packed.length)
        val raw = body.toByteArray
        val comp = compress(raw)
        firstData = out.size().toLong
        val ph = dataPageHeader(vals.length, raw.length, comp.length, 2)
        out.write(ph); out.write(comp)
        totalBytes += ph.length + comp.length
        uncompBytes += ph.length + raw.length
        encodings = Seq(3L, 2L) // RLE levels + PLAIN_DICTIONARY
      } else {
        val body = new java.io.ByteArrayOutputStream(256)
        body.write(defLevels, 0, defLevels.length)
        nonNull.foreach(plainValue(spec.isString, _, body))
        val raw = body.toByteArray
        val comp = compress(raw)
        firstData = out.size().toLong
        val ph = dataPageHeader(vals.length, raw.length, comp.length, 0)
        out.write(ph); out.write(comp)
        totalBytes += ph.length + comp.length
        uncompBytes += ph.length + raw.length
        encodings = Seq(3L, 0L) // RLE levels + PLAIN
      }

      val (minV, maxV) =
        if (nonNull.isEmpty) (null, null)
        else if (spec.isString) {
          val bs = nonNull.map(_.asInstanceOf[Array[Byte]])
          (bs.reduceLeft((a, b) => if (byteLt(b, a)) b else a),
            bs.reduceLeft((a, b) => if (byteLt(a, b)) b else a))
        } else {
          val ls = nonNull.map(_.asInstanceOf[java.lang.Long].longValue)
          (le64(ls.min), le64(ls.max))
        }
      new ChunkInfo(firstData, dictPage, totalBytes, uncompBytes,
        (vals.length - nonNull.length).toLong, minV, maxV, encodings)
    }

    val groups = if (rows.isEmpty) Seq(Seq.empty[Array[Any]])
      else rows.grouped(rowGroupRows).toSeq
    val groupInfos = groups.map { g => (g, cols.indices.map(writeChunk(_, g))) }

    // footer
    val w = new TW
    w.i32(1, 1) // version
    w.structListBegin(2, 1 + cols.length)
    w.str(4, "schema"); w.i32(5, cols.length.toLong); w.structListElemEnd()
    cols.foreach { c =>
      w.i32(1, if (c.isString) 6L else 2L) // BYTE_ARRAY / INT64
      w.i32(3, if (c.nullable) 1L else 0L) // OPTIONAL / REQUIRED
      w.str(4, c.name)
      if (c.isString) w.i32(6, 0) // converted_type UTF8
      w.structListElemEnd()
    }
    w.structListEnd()
    w.i64(3, rows.length.toLong) // num_rows
    w.structListBegin(4, groupInfos.length)
    groupInfos.foreach { case (g, infos) =>
      w.structListBegin(1, cols.length)
      cols.indices.foreach { ci =>
        val c = cols(ci)
        val info = infos(ci)
        val chunkStart =
          if (info.dictPage >= 0) info.dictPage else info.firstDataPage
        w.i64(2, chunkStart) // file_offset (deprecated; point at chunk)
        w.structBegin(3) // ColumnMetaData
        w.i32(1, if (c.isString) 6L else 2L)
        w.i32List(2, info.encodings)
        w.binaryList(3, Seq(c.name.getBytes("UTF-8")))
        w.i32(4, codec.toLong)
        w.i64(5, g.length.toLong)
        // field 6 is the TRUE uncompressed total (headers + raw pages);
        // a size-budgeting reader plans memory from it
        w.i64(6, info.uncompBytes); w.i64(7, info.totalBytes)
        w.i64(9, info.firstDataPage)
        if (info.dictPage >= 0) w.i64(11, info.dictPage)
        w.structBegin(12) // Statistics
        w.i64(3, info.nullCount)
        if (info.maxV != null) { w.binary(5, info.maxV); w.binary(6, info.minV) }
        w.structEnd()
        w.structEnd()
        w.structListElemEnd()
      }
      w.structListEnd() // columns
      w.i64(2, infos.map(_.uncompBytes).sum) // total_byte_size (uncompressed)
      w.i64(3, g.length.toLong) // num_rows
      w.structListElemEnd()
    }
    w.structListEnd() // row groups
    w.str(6, "graft version 0.16.0 (build graft)")
    w.stop()
    val footer = w.bytes
    out.write(footer)
    out.write(le32(footer.length))
    out.write("PAR1".getBytes("UTF-8"))
    out.toByteArray
  }

  /** The round-15 two-required-column shape, now a thin wrapper. */
  def fileBytes(rows: Seq[(Long, Array[Byte])], idName: String,
                strName: String): Array[Byte] =
    fileBytes(
      Seq(ColSpec(idName, isString = false, nullable = false),
        ColSpec(strName, isString = true, nullable = false)),
      rows.map { case (v, s) => Array[Any](java.lang.Long.valueOf(v), s) })

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

  /** The options face: same (id, name) aggregate shape but the string
    * column is NULLABLE (definition levels), and codec / dictionary /
    * row-group size are caller-set. Buffer entries carry null payloads
    * (serialized as length -1); nulls sort before any bytes so blobs
    * stay deterministic under shuffle arrival order. */
  case class ParquetFileOptsAgg(
      id: Expression, name: Expression,
      idName: String, strName: String,
      codec: Int, dict: Boolean, groupRows: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Array[Byte])]] {

    override def children: Seq[Expression] = Seq(id, name)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (id.dataType == LongType && name.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parquet_file_opts expects (bigint, string), got " +
          s"(${id.dataType.simpleString}, ${name.dataType.simpleString})")
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): ArrayBuffer[(Long, Array[Byte])] =
      ArrayBuffer.empty
    override def update(buf: ArrayBuffer[(Long, Array[Byte])],
                        input: InternalRow): ArrayBuffer[(Long, Array[Byte])] = {
      val i = id.eval(input)
      if (i != null) {
        val n = name.eval(input)
        buf += ((i.asInstanceOf[Long],
          if (n == null) null else n.asInstanceOf[UTF8String].getBytes))
      }
      buf
    }
    override def merge(buf: ArrayBuffer[(Long, Array[Byte])],
                       other: ArrayBuffer[(Long, Array[Byte])])
        : ArrayBuffer[(Long, Array[Byte])] = { buf ++= other; buf }

    override def eval(buf: ArrayBuffer[(Long, Array[Byte])]): Any = {
      val sorted = buf.sortWith { case ((a, as), (b, bs)) =>
        a < b || (a == b && (
          if (as == null) bs != null
          else bs != null && byteLt(as, bs)))
      }
      fileBytes(
        Seq(ColSpec(idName, isString = false, nullable = false),
          ColSpec(strName, isString = true, nullable = true)),
        sorted.map { case (v, s) =>
          Array[Any](java.lang.Long.valueOf(v), s)
        }.toSeq,
        codec, dict, groupRows)
    }

    override def serialize(buf: ArrayBuffer[(Long, Array[Byte])]): Array[Byte] = {
      val bb = ByteBuffer.allocate(
        4 + buf.map(e => 12 + (if (e._2 == null) 0 else e._2.length)).sum)
      bb.putInt(buf.length)
      buf.foreach { case (v, s) =>
        bb.putLong(v)
        if (s == null) bb.putInt(-1)
        else { bb.putInt(s.length); bb.put(s) }
      }
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Array[Byte])] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val buf = new ArrayBuffer[(Long, Array[Byte])](n)
      var j = 0
      while (j < n) {
        val v = bb.getLong()
        val len = bb.getInt()
        val s = if (len < 0) null else {
          val a = new Array[Byte](len); bb.get(a); a
        }
        buf += ((v, s))
        j += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): ParquetFileOptsAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): ParquetFileOptsAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(id = newChildren(0), name = newChildren(1))
    override def prettyName: String = "parquet_file_opts"
  }

  /** Column face; casts are the caller's contract (bigint id, string
    * payload). */
  def parquetFile(id: Column, name: Column, idName: String,
                  strName: String): Column =
    SparkInternals.column(ParquetFileAgg(
      Cast(SparkInternals.expression(id), LongType),
      Cast(SparkInternals.expression(name), StringType),
      idName, strName).toAggregateExpression())

  /** Options face: nullable string column, caller-set codec (0
    * uncompressed / 1 snappy), dictionary toggle, row-group size. */
  def parquetFileOpts(id: Column, name: Column, idName: String,
                      strName: String, codec: Int, dict: Boolean,
                      groupRows: Int): Column =
    SparkInternals.column(ParquetFileOptsAgg(
      Cast(SparkInternals.expression(id), LongType),
      Cast(SparkInternals.expression(name), StringType),
      idName, strName, codec, dict, groupRows).toAggregateExpression())
}
