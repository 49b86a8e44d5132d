package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ORC tail (PostScript + Footer) reader — built almost entirely out
  * of machinery that already exists here, which is the point: ORC's
  * metadata IS protobuf, so [[ProtoWire.fieldsRaw]] walks the
  * PostScript, Footer, StripeInformation, Type, and ColumnStatistics
  * messages; ORC's ZLIB codec is raw RFC 1951, so compressed footers
  * route through [[Inflate.raw]]; SNAPPY chunks through
  * [[BlockCodecs.snappyBlock]] — each inside ORC's 3-byte chunk
  * framing (`length << 1 | isOriginal`, little-endian). What comes
  * out is the planning tier of the third mainstream lake format:
  * row counts, stripe layout, and per-column min/max/sum statistics,
  * from the last few KB of the file.
  *
  * Faces: [[fileMeta]] (rows, stripes, stripe-row total, compression,
  * root field names) and [[colStats]] (per-column value count,
  * int min/max/sum — proto sint64 zigzag — or string min/max).
  * ZSTD chunks route through the in-house [[ZstdDecode]]; unsupported
  * codecs (LZO/LZ4) and any malformed structure decline to null.
  *
  * Reference scope: beyond-reference §2.10.
  */
object OrcMeta {

  private[functions] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  private val MaxMeta = 1 << 24 // footers are KBs; 16 MiB is hostile

  /** ORC chunk framing: repeated [3-byte LE header][chunk]; header =
    * chunkLen << 1 | isOriginal. Absent for compression NONE. */
  private[functions] def unframe(b: Array[Byte], codec: Int,
                                 maxOut: Int = MaxMeta): Array[Byte] = {
    if (codec == 0) return b
    val out = new java.io.ByteArrayOutputStream(b.length * 2)
    var pos = 0
    while (pos < b.length) {
      if (pos + 3 > b.length) fail()
      val h = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16)
      pos += 3
      val original = (h & 1) == 1
      val len = h >>> 1
      if (len <= 0 || pos + len > b.length) fail()
      val chunk = java.util.Arrays.copyOfRange(b, pos, pos + len)
      pos += len
      val dec =
        if (original) chunk
        else codec match {
          case 1 => Inflate.raw(chunk) // ZLIB in ORC = raw deflate
          case 2 =>
            val d = BlockCodecs.snappyBlock(chunk)
            d
          case 5 => ZstdDecode.decompress(chunk) // zstd frames (RFC 8878)
          case _ => fail() // LZO/LZ4 out of scope
        }
      if (dec == null) fail()
      if (out.size() + dec.length > maxOut) fail()
      out.write(dec)
    }
    out.toByteArray
  }

  private[functions] final class Tail(val footer: Array[Byte], val codec: Int)

  private[functions] def tail(b: Array[Byte]): Tail = {
    if (b == null || b.length < 16) fail()
    val psLen = b(b.length - 1) & 0xff
    if (psLen <= 0 || psLen + 1 > b.length) fail()
    val ps = java.util.Arrays.copyOfRange(b, b.length - 1 - psLen, b.length - 1)
    var footerLen = -1L
    var codec = 0
    var magicOk = false
    ProtoWire.fieldsRaw(ps).foreach { f =>
      f.fieldNo match {
        case 1 if f.wireType == 0 => footerLen = f.raw
        case 2 if f.wireType == 0 => codec = f.raw.toInt
        case 8000 if f.wireType == 2 =>
          magicOk = new String(f.payload, "UTF-8") == "ORC"
        case _ => ()
      }
    }
    if (!magicOk || footerLen <= 0 || footerLen > MaxMeta) fail()
    val end = b.length - 1 - psLen
    if (footerLen > end) fail()
    val raw = java.util.Arrays.copyOfRange(b, end - footerLen.toInt, end)
    new Tail(unframe(raw, codec), codec)
  }

  private val Codecs = Array("NONE", "ZLIB", "SNAPPY", "LZO", "LZ4", "ZSTD")

  /** [n_rows, n_stripes, stripe_rows_total, compression, root field
    * names (sorted, comma-joined)] or null. */
  def fileMeta(b: Array[Byte]): InternalRow =
    try {
      val t = tail(b)
      var nRows = -1L
      var nStripes = 0
      var stripeRows = 0L
      var rootNames: Seq[String] = Nil
      var typeIdx = 0
      ProtoWire.fieldsRaw(t.footer).foreach { f =>
        f.fieldNo match {
          case 3 if f.wireType == 2 => // StripeInformation
            nStripes += 1
            ProtoWire.fieldsRaw(f.payload).foreach { sf =>
              if (sf.fieldNo == 5 && sf.wireType == 0) stripeRows += sf.raw
            }
          case 4 if f.wireType == 2 => // Type (depth-first; root first)
            if (typeIdx == 0) {
              rootNames = ProtoWire.fieldsRaw(f.payload)
                .filter(x => x.fieldNo == 3 && x.wireType == 2)
                .map(x => new String(x.payload, "UTF-8")).toSeq
            }
            typeIdx += 1
          case 6 if f.wireType == 0 => nRows = f.raw
          case _ => ()
        }
      }
      if (nRows < 0) fail()
      InternalRow(nRows, nStripes, stripeRows,
        UTF8String.fromString(
          if (t.codec >= 0 && t.codec < Codecs.length) Codecs(t.codec) else "?"),
        UTF8String.fromString(rootNames.sorted.mkString(",")))
    } catch {
      case Malformed => null
      case e: RuntimeException if e eq ProtoWire.ProtoMalformed => null
    }

  /** Footer ColumnStatistics for the root field `name`:
    * [n_values, min_l, max_l, sum_l, min_s, max_s] (int trio null for
    * string columns and vice versa) or null. */
  def colStats(b: Array[Byte], name: UTF8String): InternalRow =
    try {
      val t = tail(b)
      var rootNames: Seq[String] = Nil
      var typeIdx = 0
      val stats = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      ProtoWire.fieldsRaw(t.footer).foreach { f =>
        f.fieldNo match {
          case 4 if f.wireType == 2 =>
            if (typeIdx == 0)
              rootNames = ProtoWire.fieldsRaw(f.payload)
                .filter(x => x.fieldNo == 3 && x.wireType == 2)
                .map(x => new String(x.payload, "UTF-8")).toSeq
            typeIdx += 1
          case 7 if f.wireType == 2 => stats += f.payload
          case _ => ()
        }
      }
      val fi = rootNames.indexOf(name.toString)
      if (fi < 0) fail()
      val colId = fi + 1 // statistics(0) is the root struct column
      if (colId >= stats.length) fail()
      var nValues = -1L
      var minL: Any = null; var maxL: Any = null; var sumL: Any = null
      var minS: Any = null; var maxS: Any = null
      ProtoWire.fieldsRaw(stats(colId)).foreach { f =>
        f.fieldNo match {
          case 1 if f.wireType == 0 => nValues = f.raw
          case 2 if f.wireType == 2 => // IntegerStatistics (sint64 fields)
            ProtoWire.fieldsRaw(f.payload).foreach { sf =>
              if (sf.wireType == 0) sf.fieldNo match {
                case 1 => minL = sf.sint
                case 2 => maxL = sf.sint
                case 3 => sumL = sf.sint
                case _ => ()
              }
            }
          case 4 if f.wireType == 2 => // StringStatistics
            ProtoWire.fieldsRaw(f.payload).foreach { sf =>
              if (sf.wireType == 2) sf.fieldNo match {
                case 1 => minS = UTF8String.fromBytes(sf.payload)
                case 2 => maxS = UTF8String.fromBytes(sf.payload)
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (nValues < 0) fail()
      InternalRow(nValues, minL, maxL, sumL, minS, maxS)
    } catch {
      case Malformed => null
      case e: RuntimeException if e eq ProtoWire.ProtoMalformed => null
    }

  // ---- expressions ----

  case class OrcFileMeta(child: Expression) extends UnaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "orc_file_meta"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("n_rows", LongType, nullable = false),
      StructField("n_stripes", IntegerType, nullable = false),
      StructField("stripe_rows_total", LongType, nullable = false),
      StructField("compression", StringType),
      StructField("field_names", StringType)))
    override def nullSafeEval(v: Any): Any =
      OrcMeta.fileMeta(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.OrcMeta.fileMeta($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class OrcColStats(left: Expression, right: Expression)
      extends BinaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "orc_col_stats"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, string) inputs")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("n_values", LongType, nullable = false),
      StructField("min_l", LongType),
      StructField("max_l", LongType),
      StructField("sum_l", LongType),
      StructField("min_s", StringType),
      StructField("max_s", StringType)))
    override def nullSafeEval(b: Any, c: Any): Any =
      OrcMeta.colStats(b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bytes, name) => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.OrcMeta.colStats($bytes, $name);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def fileMetaCol(c: Column): Column =
    SparkInternals.column(OrcFileMeta(SparkInternals.expression(c)))
  def colStatsCol(content: Column, name: Column): Column =
    SparkInternals.column(OrcColStats(
      SparkInternals.expression(content), SparkInternals.expression(name)))
}
