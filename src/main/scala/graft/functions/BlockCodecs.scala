package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** LZ4 block and Snappy raw-block decoders — pure-integer walks of the
  * two public byte-oriented LZ77 framings that dominate analytics
  * storage (parquet pages, Kafka batches, shuffle/spill files). Both
  * are literal-run + back-reference-copy formats with no entropy
  * coding, so a dependency-free decode is exact by construction and
  * runs as a map-side codegen'd scan.
  *
  *  - [[lz4Block]]: the LZ4 block format — token byte (4-bit literal
  *    length / 4-bit match length, 255-continuation extensions),
  *    literals, 2-byte LE offset, minimum match 4, overlapping copies
  *    byte-exact (offset 1 = RLE). The final sequence is literals-only.
  *  - [[snappyBlock]]: the Snappy raw format — varint uncompressed
  *    length preamble, then tagged elements: literal (6-bit or 1–4
  *    extra LE length bytes), copy-1 (11-bit offset, len 4–11),
  *    copy-2 / copy-4 (LE offsets). The preamble is VERIFIED against
  *    the produced byte count (a wrong claim declines).
  *
  * Total parsers: truncation, offsets beyond produced output, zero
  * offsets, or length claims past [[MaxOut]] (the ratio-bomb bound
  * shared with the inflate call sites, PdfText.MaxInflated) yield
  * null, never an exception and never an unbounded allocation —
  * output buffers grow with produced bytes, not with claims.
  *
  * Reference scope: beyond-reference §2.10 (the reference's payloads
  * are uncompressed JSON strings end to end).
  */
object BlockCodecs {

  /** Shared ratio-bomb output bound (64 MiB), matching the deflate
    * call sites' MaxInflated. */
  val MaxOut: Int = 1 << 26

  private final class Out(hint: Int) {
    private var buf = new Array[Byte](math.max(16, math.min(hint, 1 << 16)))
    var len = 0
    def ensure(n: Int): Boolean = {
      if (len + n > MaxOut) return false
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOut))
      }
      true
    }
    def add(src: Array[Byte], from: Int, n: Int): Boolean = {
      if (!ensure(n)) return false
      System.arraycopy(src, from, buf, len, n); len += n; true
    }
    /** Back-reference copy; byte-by-byte so overlap replicates. */
    def copyBack(offset: Int, n: Int): Boolean = {
      if (offset <= 0 || offset > len || !ensure(n)) return false
      var i = 0
      val start = len - offset
      while (i < n) { buf(len) = buf(start + i); len += 1; i += 1 }
      true
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** LZ4 block decode; null on malformed/oversized input. */
  def lz4Block(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    val n = b.length
    if (n == 0) return Array.emptyByteArray
    val out = new Out(n * 3)
    var pos = 0
    while (pos < n) {
      val token = b(pos) & 0xff; pos += 1
      // literal length (15 → 255-continuations)
      var litLen = token >>> 4
      if (litLen == 15) {
        var c = 255
        while (c == 255) {
          if (pos >= n) return null
          c = b(pos) & 0xff; pos += 1
          litLen += c
          if (litLen > MaxOut) return null
        }
      }
      if (litLen > n - pos) return null
      if (!out.add(b, pos, litLen)) return null
      pos += litLen
      if (pos == n) return out.result() // final sequence: literals only
      // match
      if (pos + 2 > n) return null
      val offset = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
      pos += 2
      var matchLen = (token & 15) + 4
      if ((token & 15) == 15) {
        var c = 255
        while (c == 255) {
          if (pos >= n) return null
          c = b(pos) & 0xff; pos += 1
          matchLen += c
          if (matchLen > MaxOut) return null
        }
      }
      if (!out.copyBack(offset, matchLen)) return null
    }
    out.result() // empty input block
  }

  /** Snappy raw-block decode; null on malformed/oversized input or a
    * preamble that does not match the produced length. */
  def snappyBlock(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    val n = b.length
    var pos = 0
    // uncompressed-length preamble (varint)
    var claim = 0L
    var shift = 0
    var c = 0
    do {
      if (pos >= n || shift > 35) return null
      c = b(pos) & 0xff; pos += 1
      claim |= (c & 0x7fL) << shift; shift += 7
    } while ((c & 0x80) != 0)
    if (claim > MaxOut) return null
    val out = new Out(claim.toInt)
    while (pos < n) {
      val tag = b(pos) & 0xff; pos += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val extra = len - 60 // 1..4 LE length bytes
            if (pos + extra > n) return null
            var v = 0L; var k = extra - 1
            while (k >= 0) { v = (v << 8) | (b(pos + k) & 0xffL); k -= 1 }
            if (v + 1 > MaxOut) return null
            len = (v + 1).toInt
            pos += extra
          }
          if (len > n - pos) return null
          if (!out.add(b, pos, len)) return null
          pos += len
        case 1 => // copy with 1-byte offset tail
          if (pos >= n) return null
          val len = ((tag >>> 2) & 7) + 4
          val offset = ((tag >>> 5) << 8) | (b(pos) & 0xff); pos += 1
          if (!out.copyBack(offset, len)) return null
        case 2 => // copy, 2-byte LE offset
          if (pos + 2 > n) return null
          val len = (tag >>> 2) + 1
          val offset = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8); pos += 2
          if (!out.copyBack(offset, len)) return null
        case 3 => // copy, 4-byte LE offset
          if (pos + 4 > n) return null
          val len = (tag >>> 2) + 1
          val off = (b(pos) & 0xffL) | ((b(pos + 1) & 0xffL) << 8) |
            ((b(pos + 2) & 0xffL) << 16) | ((b(pos + 3) & 0xffL) << 24)
          pos += 4
          if (off > Int.MaxValue || !out.copyBack(off.toInt, len)) return null
      }
    }
    if (out.len.toLong != claim) return null // preamble is verified
    out.result()
  }

  // ---- expressions ----

  abstract class CodecProbe extends UnaryExpression {
    override def nullable: Boolean = true
    def method: String
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
    private def call(b: Array[Byte]): Array[Byte] = method match {
      case "lz4Block" => lz4Block(b)
      case "snappyBlock" => snappyBlock(b)
    }
    override def nullSafeEval(v: Any): Any = call(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |byte[] $r = graft.functions.BlockCodecs.$method($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
  }

  case class Lz4BlockDecode(child: Expression) extends CodecProbe {
    override def method: String = "lz4Block"
    override def prettyName: String = "lz4_block"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class SnappyBlockDecode(child: Expression) extends CodecProbe {
    override def method: String = "snappyBlock"
    override def prettyName: String = "snappy_block"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def lz4BlockCol(c: Column): Column =
    SparkInternals.column(Lz4BlockDecode(SparkInternals.expression(c)))
  def snappyBlockCol(c: Column): Column =
    SparkInternals.column(SnappyBlockDecode(SparkInternals.expression(c)))
}
