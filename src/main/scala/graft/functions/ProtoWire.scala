package graft.functions

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protocol-buffers wire-format field walk — schema-less decode of the
  * public proto3 encoding (varint / fixed64 / length-delimited /
  * fixed32), the binary framing a large share of real event-log
  * corpora ship in. Without the .proto schema a reader can still
  * recover the complete field structure: field numbers, wire types,
  * raw integer values (plus the zigzag interpretation for sint
  * fields), and length-delimited payloads (with a UTF-8 string view
  * when the bytes are valid text). That is exactly what a 100 TB
  * ingest needs for triage (which fields exist, cardinalities, size
  * split per field) before any schema is bound — as a pure map-side
  * codegen'd scan, payloads never shuffling.
  *
  * Contract (total parser): malformed input — truncated varint,
  * overrunning length, reserved wire types 3/4 (groups, removed in
  * proto3) or 6/7, field number 0 — yields null for the whole message,
  * never an exception. Nested messages are length-delimited payloads;
  * re-feed the payload bytes to recurse a level (deliberate: depth is
  * then caller-controlled).
  *
  * Reference scope: the reference parses JSON only (SURVEY §2.2 P1);
  * beyond-reference §2.10 surface.
  */
object ProtoWire {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  /** Hostile-input bound: a message claiming more fields than bytes is
    * impossible; this caps the builder independent of claims. */
  private val MaxFields = 1 << 20

  private def isValidUtf8(b: Array[Byte], from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        val n = if (c >= 0xc2 && c <= 0xdf) 1
                else if (c >= 0xe0 && c <= 0xef) 2
                else if (c >= 0xf0 && c <= 0xf4) 3
                else return false
        if (i + n > until - 1) return false // continuations must fit
        // continuation bytes + overlong/surrogate/range checks
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80) return false
        if (c == 0xe0 && c1 < 0xa0) return false
        if (c == 0xed && c1 > 0x9f) return false
        if (c == 0xf0 && c1 < 0x90) return false
        if (c == 0xf4 && c1 > 0x8f) return false
        var k = 2
        while (k <= n) {
          if ((b(i + k) & 0xc0) != 0x80) return false
          k += 1
        }
        i += n + 1
      }
    }
    true
  }

  /** One walked field: `raw` is the varint/fixed value (0 for
    * length-delimited), `payload` non-null only for wire type 2. */
  final class WField(val fieldNo: Int, val wireType: Int, val raw: Long,
                     val payload: Array[Byte]) {
    def sint: Long = (raw >>> 1) ^ -(raw & 1L)
  }

  /** Scala-level walk (shared by the Catalyst expression and the
    * format readers built on this walker, e.g. OrcMeta). THROWS the
    * internal sentinel on malformed input — callers own the decline
    * boundary via [[fieldsRawOrNull]] or their own catch. */
  private[functions] def fieldsRaw(b: Array[Byte]): ArrayBuffer[WField] = {
    val n = b.length
    var pos = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var c = 0
      do {
        if (pos >= n || shift > 63) fail()
        c = b(pos) & 0xff; pos += 1
        v |= (c & 0x7fL) << shift; shift += 7
      } while ((c & 0x80) != 0)
      v
    }
    val out = ArrayBuffer.empty[WField]
    while (pos < n) {
      if (out.length >= MaxFields) fail()
      val tag = varint()
      val wt = (tag & 7L).toInt
      val fieldNo = tag >>> 3
      if (fieldNo < 1 || fieldNo > 536870911L) fail()
      wt match {
        case 0 =>
          out += new WField(fieldNo.toInt, 0, varint(), null)
        case 1 =>
          if (pos + 8 > n) fail()
          var v = 0L; var k = 7
          while (k >= 0) { v = (v << 8) | (b(pos + k) & 0xffL); k -= 1 }
          pos += 8
          out += new WField(fieldNo.toInt, 1, v, null)
        case 2 =>
          val len = varint()
          if (len < 0 || len > n - pos) fail()
          val l = len.toInt
          val payload = java.util.Arrays.copyOfRange(b, pos, pos + l)
          pos += l
          out += new WField(fieldNo.toInt, 2, 0L, payload)
        case 5 =>
          if (pos + 4 > n) fail()
          val v = (b(pos) & 0xffL) | ((b(pos + 1) & 0xffL) << 8) |
            ((b(pos + 2) & 0xffL) << 16) | ((b(pos + 3) & 0xffL) << 24)
          pos += 4
          out += new WField(fieldNo.toInt, 5, v, null)
        case _ => fail() // groups (3/4) and reserved (6/7)
      }
    }
    out
  }

  private[functions] def failProto(): Nothing = fail()
  private[functions] val ProtoMalformed: RuntimeException = Malformed

  /** Walks one message; null on any malformed input. Rows:
    * [idx, field_no, wire_type, int_value, sint_value, len_value,
    *  payload, str_value]. */
  def fields(b: Array[Byte]): ArrayData = {
    if (b == null) return null
    try {
      val out = fieldsRaw(b).zipWithIndex.map { case (f, idx) =>
        f.wireType match {
          case 0 => InternalRow(idx, f.fieldNo, 0, f.raw, f.sint, null, null, null)
          case 2 =>
            val str = if (isValidUtf8(f.payload, 0, f.payload.length))
              UTF8String.fromBytes(f.payload) else null
            InternalRow(idx, f.fieldNo, 2, null, null, f.payload.length.toLong,
              f.payload, str)
          case wt => InternalRow(idx, f.fieldNo, wt, f.raw, null, null, null, null)
        }
      }
      new GenericArrayData(out.toArray[Any])
    } catch { case Malformed => null }
  }

  case class ProtoFields(child: Expression) extends UnaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "proto_fields"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("field_no", IntegerType, nullable = false),
      StructField("wire_type", IntegerType, nullable = false),
      StructField("int_value", LongType),
      StructField("sint_value", LongType),
      StructField("len_value", LongType),
      StructField("payload", BinaryType),
      StructField("str_value", StringType))), containsNull = false)
    override def nullSafeEval(v: Any): Any =
      ProtoWire.fields(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.ProtoWire.fields($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def fieldsCol(c: Column): Column =
    SparkInternals.column(ProtoFields(SparkInternals.expression(c)))
}
