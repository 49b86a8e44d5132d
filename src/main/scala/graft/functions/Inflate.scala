package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** RFC 1951 DEFLATE decoder (+ RFC 1950 zlib wrapper) — the last of
  * the three LZ77 family codecs here ([[BlockCodecs]] has LZ4/Snappy),
  * and the one everything else wraps: gzip members, zlib streams, PDF
  * FlateDecode, PNG IDAT, ZIP entries. Pure-integer canonical-Huffman
  * decode, no java.util.zip:
  *
  *  - all three block types: stored (LEN/NLEN verified), fixed
  *    Huffman, dynamic Huffman (code-length tree with 16/17/18
  *    repeats, full canonical reconstruction);
  *  - length/distance alphabets with extra bits, 32 KiB window,
  *    overlap-replicating copies;
  *  - [[zlib]] verifies the CMF/FLG header checksum and the Adler-32
  *    trailer over the decoded output; FDICT is declined.
  *
  * Same totality contract as the other decoders: malformed bit
  * streams, oversized claims (shared 64 MiB ratio-bomb bound), or
  * trailing garbage after BFINAL decline to null. The JDK `Inflater`
  * remains in the existing gzip/PDF call sites (it is zlib-native and
  * faster); this decoder makes the engine's codec tier self-contained
  * and is the drop-in for environments where linking zlib is not an
  * option. Spec proof: round-trips against real `Deflater` output at
  * every compression level and strategy.
  *
  * Reference scope: beyond-reference §2.10.
  */
object Inflate {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  private val MaxOut = BlockCodecs.MaxOut

  private final class BitReader(val d: Array[Byte], var pos: Int) {
    var bit = 0
    def readBit(): Int = {
      if (pos >= d.length) fail()
      val v = (d(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  /** Canonical Huffman table from code lengths (0 = unused). */
  private final class Huffman(lengths: Array[Int]) {
    private val MaxBits = 15
    private val counts = new Array[Int](MaxBits + 1)
    lengths.foreach { l =>
      if (l < 0 || l > MaxBits) fail()
      if (l > 0) counts(l) += 1
    }
    // over-subscribed tree is malformed; incomplete allowed only for
    // the degenerate single-code case (handled leniently like zlib)
    private var left = 1
    (1 to MaxBits).foreach { l =>
      left = (left << 1) - counts(l)
      if (left < 0) fail()
    }
    private val offsets = new Array[Int](MaxBits + 2)
    (1 to MaxBits).foreach(l => offsets(l + 1) = offsets(l) + counts(l))
    private val symbols = new Array[Int](lengths.count(_ > 0))
    lengths.zipWithIndex.foreach { case (l, sym) =>
      if (l > 0) { symbols(offsets(l)) = sym; offsets(l) += 1 }
    }

    def decode(r: BitReader): Int = {
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= MaxBits) {
        code |= r.readBit()
        val count = counts(len)
        if (code - first < count) return symbols(index + code - first)
        index += count
        first = (first + count) << 1
        code <<= 1
        len += 1
      }
      fail()
    }
  }

  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23,
    27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
    6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3,
    13, 2, 14, 1, 15)

  private lazy val FixedLit: Huffman = {
    val l = new Array[Int](288)
    (0 to 143).foreach(l(_) = 8)
    (144 to 255).foreach(l(_) = 9)
    (256 to 279).foreach(l(_) = 7)
    (280 to 287).foreach(l(_) = 8)
    new Huffman(l)
  }
  private lazy val FixedDist: Huffman = new Huffman(Array.fill(30)(5))

  private final class Out {
    private var buf = new Array[Byte](1 << 14)
    var len = 0
    private def ensure(n: Int): Unit = {
      if (len + n > MaxOut) fail()
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOut))
      }
    }
    def add(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def addAll(src: Array[Byte], from: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, from, buf, len, n); len += n
    }
    def copyBack(dist: Int, n: Int): Unit = {
      if (dist <= 0 || dist > len) fail()
      ensure(n)
      var i = 0
      val start = len - dist
      while (i < n) { buf(len) = buf(start + i); len += 1; i += 1 }
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private def inflateInto(b: Array[Byte], start: Int): (Array[Byte], Int) = {
    val r = new BitReader(b, start)
    val out = new Out
    var done = false
    while (!done) {
      val bfinal = r.readBit()
      val btype = r.readBits(2)
      btype match {
        case 0 => // stored
          r.alignByte()
          if (r.pos + 4 > b.length) fail()
          val len = (b(r.pos) & 0xff) | ((b(r.pos + 1) & 0xff) << 8)
          val nlen = (b(r.pos + 2) & 0xff) | ((b(r.pos + 3) & 0xff) << 8)
          if ((len ^ 0xffff) != nlen) fail()
          r.pos += 4
          if (r.pos + len > b.length) fail()
          out.addAll(b, r.pos, len)
          r.pos += len
        case 1 | 2 =>
          val (lit, dist) =
            if (btype == 1) (FixedLit, FixedDist)
            else {
              val hlit = r.readBits(5) + 257
              val hdist = r.readBits(5) + 1
              val hclen = r.readBits(4) + 4
              if (hlit > 286 || hdist > 30) fail()
              val clLens = new Array[Int](19)
              var i = 0
              while (i < hclen) { clLens(ClOrder(i)) = r.readBits(3); i += 1 }
              val clTree = new Huffman(clLens)
              val lens = new Array[Int](hlit + hdist)
              var k = 0
              while (k < hlit + hdist) {
                val sym = clTree.decode(r)
                if (sym < 16) { lens(k) = sym; k += 1 }
                else if (sym == 16) {
                  if (k == 0) fail()
                  val rep = 3 + r.readBits(2)
                  if (k + rep > lens.length) fail()
                  val v = lens(k - 1)
                  (0 until rep).foreach { _ => lens(k) = v; k += 1 }
                } else if (sym == 17) {
                  val rep = 3 + r.readBits(3)
                  if (k + rep > lens.length) fail()
                  k += rep
                } else {
                  val rep = 11 + r.readBits(7)
                  if (k + rep > lens.length) fail()
                  k += rep
                }
              }
              if (lens(256) == 0) fail() // end-of-block code must exist
              (new Huffman(lens.take(hlit)), new Huffman(lens.drop(hlit)))
            }
          var eob = false
          while (!eob) {
            val sym = lit.decode(r)
            if (sym < 256) out.add(sym)
            else if (sym == 256) eob = true
            else {
              if (sym > 285) fail()
              val li = sym - 257
              val length = LenBase(li) + r.readBits(LenExtra(li))
              val dsym = dist.decode(r)
              if (dsym > 29) fail()
              val distance = DistBase(dsym) + r.readBits(DistExtra(dsym))
              if (distance > 32768) fail()
              out.copyBack(distance, length)
            }
          }
        case _ => fail()
      }
      if (bfinal == 1) done = true
    }
    r.alignByte()
    (out.result(), r.pos)
  }

  /** Raw DEFLATE stream → bytes; trailing garbage declines. */
  def raw(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    try {
      val (out, end) = inflateInto(b, 0)
      if (end != b.length) fail() // whole input must be the stream
      out
    } catch { case Malformed => null }
  }

  /** RFC 1950 zlib stream: header checksum + Adler-32 trailer
    * verified; FDICT declined. */
  def zlib(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 6) return null
    try {
      val cmf = b(0) & 0xff
      val flg = b(1) & 0xff
      if ((cmf & 0x0f) != 8) fail() // method: deflate
      if (((cmf << 8) | flg) % 31 != 0) fail()
      if ((flg & 0x20) != 0) fail() // FDICT unsupported
      val (out, end) = inflateInto(b, 2)
      if (end + 4 != b.length) fail()
      var s1 = 1L; var s2 = 0L
      out.foreach { v =>
        s1 = (s1 + (v & 0xff)) % 65521
        s2 = (s2 + s1) % 65521
      }
      val adler = (s2 << 16) | s1
      val want = ((b(end) & 0xffL) << 24) | ((b(end + 1) & 0xffL) << 16) |
        ((b(end + 2) & 0xffL) << 8) | (b(end + 3) & 0xffL)
      if (adler != want) fail()
      out
    } catch { case Malformed => null }
  }

  /** RFC 1952 gzip stream (STRICT): walks every member (magic, CM=8,
    * FEXTRA/FNAME/FCOMMENT/FHCRC header fields), inflates the deflate
    * body in-house, verifies each member's CRC-32 and ISIZE trailer,
    * and concatenates. Unlike [[BinaryMeta.gunzipMembers]]'
    * stop-at-first-malformed crawl semantics, this is the PAGE-CODEC
    * contract: any malformation, trailing garbage, or unverified
    * trailer declines the whole input — a compressed page either
    * decodes exactly or not at all. */
  def gzip(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 18) return null
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(b.length * 2, 1 << 16))
      var p = 0
      while (p < b.length) {
        if (p + 10 > b.length || (b(p) & 0xff) != 0x1f ||
          (b(p + 1) & 0xff) != 0x8b || (b(p + 2) & 0xff) != 8) fail()
        val flg = b(p + 3) & 0xff
        if ((flg & 0xe0) != 0) fail() // reserved flag bits must be zero
        var q = p + 10
        if ((flg & 4) != 0) { // FEXTRA: 2-byte LE xlen
          if (q + 2 > b.length) fail()
          q += 2 + ((b(q) & 0xff) | ((b(q + 1) & 0xff) << 8))
        }
        if ((flg & 8) != 0) { // FNAME: zero-terminated
          while (q < b.length && b(q) != 0) q += 1
          q += 1
        }
        if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
          while (q < b.length && b(q) != 0) q += 1
          q += 1
        }
        if ((flg & 2) != 0) q += 2 // FHCRC (header CRC16, not verified)
        if (q > b.length) fail()
        val (member, end) = inflateInto(b, q)
        if (end + 8 > b.length) fail()
        def le32(at: Int): Long = (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
          ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
        val crc = new java.util.zip.CRC32()
        crc.update(member)
        if (crc.getValue != le32(end)) fail()
        if ((member.length.toLong & 0xffffffffL) != le32(end + 4)) fail()
        if (out.size().toLong + member.length > MaxOut) fail()
        out.write(member)
        p = end + 8
      }
      out.toByteArray
    } catch { case Malformed => null }
  }

  // ---- expressions ----

  abstract class InflateProbe extends UnaryExpression {
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
      case "raw" => raw(b)
      case "zlib" => zlib(b)
      case "gzip" => gzip(b)
    }
    override def nullSafeEval(v: Any): Any = call(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |byte[] $r = graft.functions.Inflate.$method($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
  }

  case class InflateRaw(child: Expression) extends InflateProbe {
    override def method: String = "raw"
    override def prettyName: String = "inflate_raw"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class InflateZlib(child: Expression) extends InflateProbe {
    override def method: String = "zlib"
    override def prettyName: String = "inflate_zlib"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class InflateGzip(child: Expression) extends InflateProbe {
    override def method: String = "gzip"
    override def prettyName: String = "inflate_gzip"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def rawCol(c: Column): Column =
    SparkInternals.column(InflateRaw(SparkInternals.expression(c)))
  def zlibCol(c: Column): Column =
    SparkInternals.column(InflateZlib(SparkInternals.expression(c)))
  def gzipCol(c: Column): Column =
    SparkInternals.column(InflateGzip(SparkInternals.expression(c)))
}
