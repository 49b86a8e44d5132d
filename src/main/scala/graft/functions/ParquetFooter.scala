package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parquet footer (FileMetaData) reader over raw file bytes — a Thrift
  * compact-protocol walker, no parquet/thrift library involved. This is
  * the metadata tier a distributed engine actually plans from: row
  * counts, schema leaves, per-row-group / per-column-chunk sizes,
  * codecs, and min/max statistics, all sitting in the last few KB of
  * every file. Reading ONLY footers of a 100 TB lake (via a
  * `binaryFile`-style scan or ranged GETs in a real deployment) is how
  * file- and row-group-level pruning decisions, compaction planning,
  * and lake-inventory audits are made without touching data pages —
  * exactly the scan-planning face Spark itself keeps internal.
  *
  * Wire format (public): a parquet file ends with
  * `[FileMetaData (thrift compact)] [4-byte LE length] "PAR1"`.
  * Thrift compact protocol (public spec): field headers pack a 4-bit
  * field-id delta with a 4-bit type; i16/i32/i64 are zigzag varints;
  * binary is varint-length-prefixed; lists pack size with element
  * type; bools ride in the field-type nibble. The walker skips every
  * field it does not extract (so encryption/bloom/column-order/
  * page-index additions from any writer version pass through), and is
  * total: malformed, truncated, or foreign bytes yield null, never an
  * exception.
  *
  * Statistics decode: `min_value`/`max_value` (Statistics fields 5/6,
  * the order-defined modern pair) preferred; the deprecated `min`/`max`
  * (fields 2/1) accepted as a fallback only for the integer physical
  * types, whose legacy sort order was already correct (signed).
  * Physical-type rendering is exact: INT32/INT64 little-endian two's
  * complement, BOOLEAN one byte, BYTE_ARRAY as UTF-8, FLOAT/DOUBLE via
  * IEEE-754 bits; INT96 and FIXED_LEN_BYTE_ARRAY surface null (no
  * canonical string form).
  *
  * Reference scope: the reference pipeline has no columnar storage at
  * all (SURVEY §0) — this is beyond-reference lake-management surface
  * (SURVEY §2.10). Cross-writer coverage: the oracle gate parses
  * parquet-cpp(arrow)-written testdata; ParquetFooterSpec parses
  * parquet-mr files written by Spark itself, including multi-row-group
  * layouts.
  */
object ParquetFooter {

  private[functions] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  // ---- thrift compact protocol primitives ----

  private[functions] final class TReader(val b: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = {
      if (pos >= end) fail()
      val v = b(pos) & 0xff; pos += 1; v
    }
    def varint(): Long = {
      var shift = 0; var v = 0L; var c = 0
      do {
        if (shift > 63) fail()
        c = u8(); v |= (c & 0x7fL) << shift; shift += 7
      } while ((c & 0x80) != 0)
      v
    }
    def zigzag(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1) }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || n > end - pos) fail()
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; r
    }
    def skip(n: Int): Unit = { if (n < 0 || n > end - pos) fail(); pos += n }
  }

  private[functions] val T_BOOL_TRUE = 1; private[functions] val T_BOOL_FALSE = 2
  private[functions] val T_BYTE = 3; private[functions] val T_I16 = 4; private[functions] val T_I32 = 5
  private[functions] val T_I64 = 6; private[functions] val T_DOUBLE = 7; private[functions] val T_BINARY = 8
  private[functions] val T_LIST = 9; private[functions] val T_SET = 10; private[functions] val T_MAP = 11
  private[functions] val T_STRUCT = 12

  private[functions] def skipValue(r: TReader, t: Int): Unit = t match {
    case T_BOOL_TRUE | T_BOOL_FALSE => () // value lives in the type nibble
    case T_BYTE => r.skip(1)
    case T_I16 | T_I32 | T_I64 => r.zigzag(); ()
    case T_DOUBLE => r.skip(8)
    case T_BINARY => val n = r.varint(); if (n > Int.MaxValue) fail(); r.skip(n.toInt)
    case T_LIST | T_SET => skipList(r)
    case T_MAP => skipMap(r)
    case T_STRUCT => walkStruct(r)((_, _, _) => false)
    case _ => fail()
  }

  private[functions] def listHeader(r: TReader): (Int, Int) = {
    val b0 = r.u8()
    val t = b0 & 0x0f
    val nib = (b0 >> 4) & 0x0f
    val size = if (nib == 15) { val n = r.varint(); if (n > Int.MaxValue) fail(); n.toInt }
               else nib
    if (size < 0) fail()
    (size, t)
  }

  private def skipList(r: TReader): Unit = {
    val (size, t) = listHeader(r)
    var i = 0
    while (i < size) {
      // list-element bools are one byte (unlike field-header bools)
      if (t == T_BOOL_TRUE || t == T_BOOL_FALSE) r.skip(1) else skipValue(r, t)
      i += 1
    }
  }

  private def skipMap(r: TReader): Unit = {
    val size = r.varint()
    if (size < 0) fail()
    if (size == 0) return
    val kt = r.u8()
    var i = 0L
    while (i < size) {
      val k = (kt >> 4) & 0x0f; val v = kt & 0x0f
      if (k == T_BOOL_TRUE || k == T_BOOL_FALSE) r.skip(1) else skipValue(r, k)
      if (v == T_BOOL_TRUE || v == T_BOOL_FALSE) r.skip(1) else skipValue(r, v)
      i += 1
    }
  }

  /** Walks one struct; `h(fieldId, typeId, reader)` returns true iff it
    * consumed the value (bool values need no consumption either way). */
  private[functions] def walkStruct(r: TReader)(h: (Int, Int, TReader) => Boolean): Unit = {
    var fid = 0
    var done = false
    while (!done) {
      val b0 = r.u8()
      if (b0 == 0) done = true
      else {
        val t = b0 & 0x0f
        val delta = (b0 >> 4) & 0x0f
        fid = if (delta != 0) fid + delta else r.zigzag().toInt
        if (t == T_BOOL_TRUE || t == T_BOOL_FALSE) { h(fid, t, r); () }
        else if (!h(fid, t, r)) skipValue(r, t)
      }
    }
  }

  // ---- parsed model ----

  private val PhysicalTypes = Array(
    "BOOLEAN", "INT32", "INT64", "INT96", "FLOAT", "DOUBLE",
    "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")
  private val Codecs = Array(
    "UNCOMPRESSED", "SNAPPY", "GZIP", "LZO", "BROTLI", "LZ4", "ZSTD",
    "LZ4_RAW")

  private[functions] final class ColStats {
    var minValue: Array[Byte] = _
    var maxValue: Array[Byte] = _
    var legacyMin: Array[Byte] = _
    var legacyMax: Array[Byte] = _
    var nullCount: Long = -1L
  }

  private[functions] final class ColChunk {
    var path: String = _
    var ptype: Int = -1
    var codec: Int = -1
    var numValues: Long = -1L
    var uncompressed: Long = -1L
    var compressed: Long = -1L
    var dataPageOffset: Long = -1L
    var dictPageOffset: Long = -1L
    var stats: ColStats = _
  }

  private[functions] final class RowGroup {
    var numRows: Long = -1L
    var totalByteSize: Long = -1L
    val columns = scala.collection.mutable.ArrayBuffer.empty[ColChunk]
  }

  /** One schema-list element: repetition 0=required 1=optional
    * 2=repeated (-1 absent, i.e. the root). */
  private[functions] final class SchemaElem(val name: String,
      val numChildren: Int, val repetition: Int, val ptype: Int)

  private[functions] final class Footer {
    var version: Int = -1
    var numRows: Long = -1L
    var createdBy: String = _
    /** Depth-first schema list; root first. */
    val schema = scala.collection.mutable.ArrayBuffer.empty[SchemaElem]
    val rowGroups = scala.collection.mutable.ArrayBuffer.empty[RowGroup]
  }

  /** Caps repeated-element counts — a hostile footer declaring 2^30
    * schema elements or row groups must not allocate its claim. */
  private val MaxElems = 1 << 20

  private def parseStats(r: TReader): ColStats = {
    val s = new ColStats
    walkStruct(r) { (fid, t, rr) =>
      (fid, t) match {
        case (1, T_BINARY) => s.legacyMax = rr.bytes(rr.varint().toInt); true
        case (2, T_BINARY) => s.legacyMin = rr.bytes(rr.varint().toInt); true
        case (3, T_I64) => s.nullCount = rr.zigzag(); true
        case (5, T_BINARY) => s.maxValue = rr.bytes(rr.varint().toInt); true
        case (6, T_BINARY) => s.minValue = rr.bytes(rr.varint().toInt); true
        case _ => false
      }
    }
    s
  }

  private def parseColumnMeta(r: TReader): ColChunk = {
    val c = new ColChunk
    walkStruct(r) { (fid, t, rr) =>
      (fid, t) match {
        case (1, T_I32) => c.ptype = rr.zigzag().toInt; true
        case (3, T_LIST) =>
          val (n, et) = listHeader(rr)
          if (et != T_BINARY || n > MaxElems) fail()
          val parts = new Array[String](n)
          var i = 0
          while (i < n) {
            parts(i) = new String(rr.bytes(rr.varint().toInt), "UTF-8"); i += 1
          }
          c.path = parts.mkString(".")
          true
        case (4, T_I32) => c.codec = rr.zigzag().toInt; true
        case (5, T_I64) => c.numValues = rr.zigzag(); true
        case (6, T_I64) => c.uncompressed = rr.zigzag(); true
        case (7, T_I64) => c.compressed = rr.zigzag(); true
        case (9, T_I64) => c.dataPageOffset = rr.zigzag(); true
        case (11, T_I64) => c.dictPageOffset = rr.zigzag(); true
        case (12, T_STRUCT) => c.stats = parseStats(rr); true
        case _ => false
      }
    }
    c
  }

  private def parseRowGroup(r: TReader): RowGroup = {
    val g = new RowGroup
    walkStruct(r) { (fid, t, rr) =>
      (fid, t) match {
        case (1, T_LIST) =>
          val (n, et) = listHeader(rr)
          if (et != T_STRUCT || n > MaxElems) fail()
          var i = 0
          while (i < n) {
            // ColumnChunk: field 3 = ColumnMetaData
            var meta: ColChunk = null
            walkStruct(rr) { (cfid, ct, crr) =>
              if (cfid == 3 && ct == T_STRUCT) { meta = parseColumnMeta(crr); true }
              else false
            }
            g.columns += (if (meta != null) meta else new ColChunk)
            i += 1
          }
          true
        case (2, T_I64) => g.totalByteSize = rr.zigzag(); true
        case (3, T_I64) => g.numRows = rr.zigzag(); true
        case _ => false
      }
    }
    g
  }

  /** Parses the footer of a full parquet file byte string; null on any
    * malformed input. */
  private[functions] def parse(b: Array[Byte]): Footer = {
    if (b == null || b.length < 12) return null
    val n = b.length
    if (b(0) != 'P' || b(1) != 'A' || b(2) != 'R' || b(3) != '1') return null
    if (b(n - 4) != 'P' || b(n - 3) != 'A' || b(n - 2) != 'R' || b(n - 1) != '1') return null
    val flen = (b(n - 8) & 0xff) | ((b(n - 7) & 0xff) << 8) |
      ((b(n - 6) & 0xff) << 16) | ((b(n - 5) & 0xff) << 24)
    if (flen <= 0 || flen > n - 12) return null
    try {
      val r = new TReader(b, n - 8 - flen, n - 8)
      val f = new Footer
      walkStruct(r) { (fid, t, rr) =>
        (fid, t) match {
          case (1, T_I32) => f.version = rr.zigzag().toInt; true
          case (2, T_LIST) =>
            val (cnt, et) = listHeader(rr)
            if (et != T_STRUCT || cnt > MaxElems) fail()
            var i = 0
            while (i < cnt) {
              var name: String = null; var numChildren = 0
              var repetition = -1; var ptype = -1
              walkStruct(rr) { (sfid, st, srr) =>
                (sfid, st) match {
                  case (1, T_I32) => ptype = srr.zigzag().toInt; true
                  case (3, T_I32) => repetition = srr.zigzag().toInt; true
                  case (4, T_BINARY) =>
                    name = new String(srr.bytes(srr.varint().toInt), "UTF-8"); true
                  case (5, T_I32) => numChildren = srr.zigzag().toInt; true
                  case _ => false
                }
              }
              if (name == null) fail()
              f.schema += new SchemaElem(name, numChildren, repetition, ptype)
              i += 1
            }
            true
          case (3, T_I64) => f.numRows = rr.zigzag(); true
          case (4, T_LIST) =>
            val (cnt, et) = listHeader(rr)
            if (et != T_STRUCT || cnt > MaxElems) fail()
            var i = 0
            while (i < cnt) { f.rowGroups += parseRowGroup(rr); i += 1 }
            true
          case (6, T_BINARY) =>
            f.createdBy = new String(rr.bytes(rr.varint().toInt), "UTF-8"); true
          case _ => false
        }
      }
      if (f.numRows < 0 || f.schema.isEmpty) null else f
    } catch { case Malformed => null }
  }

  // ---- value rendering ----

  private def leInt(b: Array[Byte]): Int =
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
  private def leLong(b: Array[Byte]): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
    v
  }

  /** Exact string form of a statistics value for a physical type; null
    * when the type has no canonical rendering (INT96, FIXED) or the
    * byte length is wrong for the type. */
  private def renderStat(ptype: Int, v: Array[Byte]): String =
    if (v == null) null
    else ptype match {
      case 0 => if (v.length != 1) null else if (v(0) != 0) "true" else "false"
      case 1 => if (v.length != 4) null else leInt(v).toString
      case 2 => if (v.length != 8) null else leLong(v).toString
      case 4 => if (v.length != 4) null
                else java.lang.Float.toString(java.lang.Float.intBitsToFloat(leInt(v)))
      case 5 => if (v.length != 8) null
                else java.lang.Double.toString(java.lang.Double.longBitsToDouble(leLong(v)))
      case 6 => new String(v, "UTF-8")
      case _ => null
    }

  private def statPair(c: ColChunk): (String, String) = {
    if (c.stats == null) return (null, null)
    val s = c.stats
    val mn = if (s.minValue != null) s.minValue
             else if (c.ptype == 1 || c.ptype == 2) s.legacyMin else null
    val mx = if (s.maxValue != null) s.maxValue
             else if (c.ptype == 1 || c.ptype == 2) s.legacyMax else null
    (renderStat(c.ptype, mn), renderStat(c.ptype, mx))
  }

  /** Commit-stat view of a full parquet file's footer: (total rows,
    * per-leaf-column-path (physical type, min bytes, max bytes)). The
    * writer already computed exact per-row-group min/max while writing
    * — a commit that records per-file bounds can read them here instead
    * of re-scanning the data bytes it just wrote. Row groups combine
    * under the type's order (INT32/INT64 signed little-endian,
    * BYTE_ARRAY unsigned lexicographic — the same order Spark's
    * min/max produce for int/long/string); a column is present only
    * when EVERY row group carries stats for it (a dropped/oversized
    * stat, or an all-null group, surfaces as "no bound", which commit
    * consumers treat conservatively). Returns null on a malformed
    * footer. */
  def commitStats(b: Array[Byte])
      : (Long, Map[String, (Int, Array[Byte], Array[Byte])]) = {
    val f = parse(b)
    if (f == null) return null
    def cmp(ptype: Int, x: Array[Byte], y: Array[Byte]): Int = ptype match {
      case 1 => Integer.compare(leInt(x), leInt(y))
      case 2 => java.lang.Long.compare(leLong(x), leLong(y))
      case _ => // unsigned lexicographic (UTF-8 == UTF8String order)
        var i = 0
        val n = math.min(x.length, y.length)
        while (i < n) {
          val d = (x(i) & 0xff) - (y(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        x.length - y.length
    }
    def wellFormed(ptype: Int, v: Array[Byte]): Boolean = ptype match {
      case 1 => v.length == 4
      case 2 => v.length == 8
      case _ => true
    }
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[String, (Int, Array[Byte], Array[Byte])]
    val dead = scala.collection.mutable.Set.empty[String]
    var rg = 0
    while (rg < f.rowGroups.length) {
      f.rowGroups(rg).columns.foreach { c =>
        val s = c.stats
        // modern min_value/max_value only, except int32/int64 where the
        // legacy pair shares the (signed) order and stays sound
        val mn = if (s != null && s.minValue != null) s.minValue
                 else if (s != null && (c.ptype == 1 || c.ptype == 2))
                   s.legacyMin else null
        val mx = if (s != null && s.maxValue != null) s.maxValue
                 else if (s != null && (c.ptype == 1 || c.ptype == 2))
                   s.legacyMax else null
        val ok = c.path != null && mn != null && mx != null &&
          (c.ptype == 1 || c.ptype == 2 || c.ptype == 6) &&
          wellFormed(c.ptype, mn) && wellFormed(c.ptype, mx)
        if (!ok) { if (c.path != null) { dead += c.path; acc.remove(c.path): Unit } }
        else if (!dead(c.path)) acc.get(c.path) match {
          case None if rg == 0 => acc(c.path) = (c.ptype, mn, mx)
          case Some((pt, omn, omx)) if pt == c.ptype =>
            acc(c.path) = (pt,
              if (cmp(pt, mn, omn) < 0) mn else omn,
              if (cmp(pt, mx, omx) > 0) mx else omx)
          case _ => dead += c.path; acc.remove(c.path): Unit
        }
      }
      rg += 1
    }
    (f.numRows, acc.toMap)
  }

  // ---- static entry points (eval + codegen dispatch targets) ----

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** File-level row: [version, num_rows, created_by, n_row_groups,
    * rg_rows_total, n_leaves, leaf_names (sorted, comma-joined)]. */
  def fileMeta(b: Array[Byte]): InternalRow = {
    val f = parse(b)
    if (f == null) return null
    // Leaves: depth-first schema list; an element with numChildren == 0
    // (field absent) is a leaf. Root is schema(0) by spec.
    val leaves = f.schema.drop(1).collect { case e if e.numChildren == 0 => e.name }
    InternalRow(
      f.version,
      f.numRows,
      utf8(f.createdBy),
      f.rowGroups.length,
      f.rowGroups.map(_.numRows).sum,
      leaves.length,
      utf8(leaves.sorted.mkString(",")))
  }

  /** Per-column-chunk rows: [rg, col_path, ptype, codec, num_values,
    * compressed, uncompressed, null_count (null if absent), min_s,
    * max_s]. */
  def columnChunks(b: Array[Byte]): ArrayData = {
    val f = parse(b)
    if (f == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var rg = 0
    while (rg < f.rowGroups.length) {
      val g = f.rowGroups(rg)
      g.columns.foreach { c =>
        val (mn, mx) = statPair(c)
        out += InternalRow(
          rg,
          utf8(c.path),
          if (c.ptype >= 0 && c.ptype < PhysicalTypes.length) utf8(PhysicalTypes(c.ptype)) else null,
          if (c.codec >= 0 && c.codec < Codecs.length) utf8(Codecs(c.codec)) else null,
          c.numValues,
          c.compressed,
          c.uncompressed,
          if (c.stats != null && c.stats.nullCount >= 0) c.stats.nullCount else null,
          utf8(mn),
          utf8(mx))
      }
      rg += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  // ---- Catalyst expressions ----

  abstract class FooterProbe extends UnaryExpression {
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
  }

  case class ParquetFileMeta(child: Expression) extends FooterProbe {
    override def prettyName: String = "parquet_file_meta"
    override def dataType: DataType = StructType(Seq(
      StructField("version", IntegerType),
      StructField("num_rows", LongType),
      StructField("created_by", StringType),
      StructField("n_row_groups", IntegerType),
      StructField("rg_rows_total", LongType),
      StructField("n_leaves", IntegerType),
      StructField("leaf_names", StringType)))
    override def nullSafeEval(v: Any): Any =
      ParquetFooter.fileMeta(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.ParquetFooter.fileMeta($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class ParquetColumnChunks(child: Expression) extends FooterProbe {
    override def prettyName: String = "parquet_column_chunks"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("rg", IntegerType, nullable = false),
      StructField("col_path", StringType),
      StructField("ptype", StringType),
      StructField("codec", StringType),
      StructField("num_values", LongType),
      StructField("compressed", LongType),
      StructField("uncompressed", LongType),
      StructField("null_count", LongType),
      StructField("min_s", StringType),
      StructField("max_s", StringType))), containsNull = false)
    override def nullSafeEval(v: Any): Any =
      ParquetFooter.columnChunks(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.ParquetFooter.columnChunks($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def fileMetaCol(c: Column): Column =
    SparkInternals.column(ParquetFileMeta(SparkInternals.expression(c)))
  def columnChunksCol(c: Column): Column =
    SparkInternals.column(ParquetColumnChunks(SparkInternals.expression(c)))
}
