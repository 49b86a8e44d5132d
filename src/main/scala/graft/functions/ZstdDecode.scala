package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** Zstandard (RFC 8878) frame decoder — the modern lake default codec,
  * and the last block-codec tier gap: without it the parquet/ORC
  * readers decline most newly-written production files. Implemented
  * in full from the RFC, no zstd library:
  *
  *  - frame walk: magic, frame-header descriptor (content size,
  *    single-segment, dictionary-ID decline, window bound), data
  *    blocks, XXH64 content-checksum verification (via Spark's own
  *    public XXH64), skippable frames, multi-frame concatenation;
  *  - raw and RLE blocks;
  *  - compressed blocks: literals in all four forms (raw, RLE,
  *    Huffman-compressed with tree, treeless repeat) with 1- and
  *    4-stream layouts; Huffman trees from direct 4-bit weights or
  *    FSE-compressed weights (two interleaved states on a backward
  *    bitstream); sequences with all three symbol-compression modes
  *    per code (predefined distributions from the RFC, RLE,
  *    FSE-compressed, repeat) over three interleaved FSE states;
  *    repeat-offset history with the literals-length-0 twist;
  *    overlap-replicating match copies against the whole frame
  *    window.
  *
  * Same totality contract as every decoder here: malformed streams,
  * reserved bits, dictionary references, window/claim bombs past the
  * shared 64 MiB bound — all DECLINE to null, never misread, never
  * throw. Spec proof: byte-exact round-trips against real zstd-jni
  * output at every compression level, plus truncation/corruption
  * fuzz.
  *
  * Reference scope: beyond-reference §2.10.
  */
object ZstdDecode {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  private val MaxOut = BlockCodecs.MaxOut
  private val MaxBlock = 1 << 17 // Block_Maximum_Size upper bound (128 KiB)

  private def highBit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  // ---- bitstreams ----

  /** Forward LSB-first bit reader (FSE table descriptions). */
  private final class FwdBits(val d: Array[Byte], val from: Int, val to: Int) {
    var bitPos = 0 // bits consumed from `from`
    private def bitAt(i: Int): Int = {
      val byteAt = from + (i >> 3)
      if (byteAt >= to) fail()
      (d(byteAt) >> (i & 7)) & 1
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bitAt(bitPos + i) << i; i += 1 }
      bitPos += n
      v
    }
    def rewind(n: Int): Unit = bitPos -= n
    def bytesConsumed: Int = (bitPos + 7) >> 3
  }

  /** Backward bit reader: sentinel 1-bit at the top of the last byte;
    * bits read downward, first-read bit is the value's MSB. `pos` may
    * go negative (zero-padded reads) — callers that must not overdraw
    * check `pos >= 0`. */
  private final class BackBits(val d: Array[Byte], val from: Int, val to: Int) {
    var pos: Int = (to - from) * 8
    if (to <= from) fail()
    // strip padding zeros, consume the sentinel bit (which must sit in
    // the LAST byte — a zero last byte is corruption, not padding)
    if (d(to - 1) == 0) fail()
    while (pos > 0 && bitAt(pos - 1) == 0) pos -= 1
    pos -= 1
    private def bitAt(i: Int): Int = {
      if (i < 0) return 0
      (d(from + (i >> 3)) >> (i & 7)) & 1
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { pos -= 1; v = (v << 1) | bitAt(pos); i += 1 }
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { pos -= 1; v = (v << 1) | bitAt(pos); i += 1 }
      v
    }
  }

  // ---- FSE ----

  private final class FseTable(val accuracyLog: Int, val symbol: Array[Int],
                               val nbBits: Array[Int], val newState: Array[Int])

  /** Reads a normalized-count distribution (forward stream, byte-
    * aligned at the end) and returns (frequencies, accuracyLog). */
  private def readNCount(bits: FwdBits, maxSymbol: Int,
                         maxLog: Int): (Array[Int], Int) = {
    val accuracyLog = bits.read(4) + 5
    if (accuracyLog > maxLog) fail()
    var remaining = 1 << accuracyLog
    val freqs = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (remaining > 0 && freqs.length <= maxSymbol) {
      val nb = highBit(remaining + 1) + 1
      val v0 = bits.read(nb)
      val lowerMask = (1 << (nb - 1)) - 1
      val threshold = (1 << nb) - 1 - (remaining + 1)
      val value =
        if ((v0 & lowerMask) < threshold) { bits.rewind(1); v0 & lowerMask }
        else if (v0 > lowerMask) v0 - threshold
        else v0
      val proba = value - 1
      remaining -= (if (proba < 0) -proba else proba)
      freqs += proba
      if (proba == 0) {
        var repeat = bits.read(2)
        while (repeat == 3) {
          (0 until 3).foreach(_ => freqs += 0)
          if (freqs.length > maxSymbol + 1) fail()
          repeat = bits.read(2)
        }
        (0 until repeat).foreach(_ => freqs += 0)
        if (freqs.length > maxSymbol + 1) fail()
      }
    }
    if (remaining != 0) fail()
    (freqs.toArray, accuracyLog)
  }

  /** Builds the FSE decode table from normalized frequencies. */
  private def fseTable(freqs: Array[Int], accuracyLog: Int): FseTable = {
    val size = 1 << accuracyLog
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val newState = new Array[Int](size)
    val stateDesc = new Array[Int](freqs.length)
    var highThreshold = size - 1
    var s = 0
    while (s < freqs.length) {
      if (freqs(s) == -1) {
        if (highThreshold < 0) fail()
        symbol(highThreshold) = s
        highThreshold -= 1
        stateDesc(s) = 1
      } else if (freqs(s) < -1) fail()
      else stateDesc(s) = freqs(s)
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < freqs.length) {
      var k = 0
      while (k < freqs(s)) {
        symbol(pos) = s
        do { pos = (pos + step) & mask } while (pos > highThreshold)
        k += 1
      }
      s += 1
    }
    if (pos != 0) fail()
    var i = 0
    while (i < size) {
      val sy = symbol(i)
      val x = stateDesc(sy)
      stateDesc(sy) += 1
      if (x <= 0) fail()
      nbBits(i) = accuracyLog - highBit(x)
      if (nbBits(i) < 0 || nbBits(i) > accuracyLog) fail()
      newState(i) = (x << nbBits(i)) - size
      i += 1
    }
    new FseTable(accuracyLog, symbol, nbBits, newState)
  }

  /** A 1-cell pseudo-table for RLE sequence mode. */
  private def rleTable(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  // ---- Huffman ----

  private final class HufTable(val maxBits: Int, val symbols: Array[Int],
                               val lengths: Array[Int])

  /** Builds the full-lookup Huffman decode table from weights. */
  private def hufFromWeights(weights0: Array[Int]): HufTable = {
    // infer the last weight from the leftover to the next power of two
    var total = 0L
    weights0.foreach { w =>
      if (w < 0 || w > 11) fail()
      if (w > 0) total += 1L << (w - 1)
    }
    if (total == 0) fail()
    val maxBits = highBit(total.toInt) + 1
    if (maxBits > 11) fail()
    val leftover = (1L << maxBits) - total
    if (leftover <= 0 || (leftover & (leftover - 1)) != 0) fail()
    val lastWeight = highBit(leftover.toInt) + 1
    val weights = weights0 :+ lastWeight
    if (weights.length > 256) fail()
    // numBits per symbol: maxBits + 1 - weight (weight 0 → unused)
    val bits = weights.map(w => if (w == 0) 0 else maxBits + 1 - w)
    val size = 1 << maxBits
    val symbols = new Array[Int](size)
    val lengths = new Array[Int](size)
    val rankCount = new Array[Int](maxBits + 1)
    bits.foreach(b => if (b > 0) rankCount(b) += 1)
    val rankIdx = new Array[Int](maxBits + 2)
    rankIdx(maxBits) = 0
    var l = maxBits
    while (l >= 1) { rankIdx(l - 1) = rankIdx(l) + rankCount(l) * (1 << (maxBits - l)); l -= 1 }
    if (rankIdx(0) != size) fail()
    var sym = 0
    while (sym < bits.length) {
      val b = bits(sym)
      if (b > 0) {
        val len = 1 << (maxBits - b)
        val at = rankIdx(b)
        var k = 0
        while (k < len) { symbols(at + k) = sym; lengths(at + k) = b; k += 1 }
        rankIdx(b) += len
      }
      sym += 1
    }
    new HufTable(maxBits, symbols, lengths)
  }

  /** Parses a Huffman tree description; returns (table, bytes read). */
  private def readHufTable(d: Array[Byte], from: Int, to: Int): (HufTable, Int) = {
    if (from >= to) fail()
    val h = d(from) & 0xff
    if (h >= 128) { // direct: h - 127 weights, 4 bits each
      val n = h - 127
      val nBytes = (n + 1) / 2
      if (from + 1 + nBytes > to) fail()
      val ws = new Array[Int](n)
      var i = 0
      while (i < n) {
        val b = d(from + 1 + (i >> 1)) & 0xff
        ws(i) = if ((i & 1) == 0) b >>> 4 else b & 0xf
        i += 1
      }
      (hufFromWeights(ws), 1 + nBytes)
    } else { // FSE-compressed weights: h = compressed size
      if (from + 1 + h > to) fail()
      val fwd = new FwdBits(d, from + 1, from + 1 + h)
      val (freqs, al) = readNCount(fwd, 255, 6)
      val table = fseTable(freqs, al)
      val descBytes = fwd.bytesConsumed
      val bs = new BackBits(d, from + 1 + descBytes, from + 1 + h)
      var s1 = bs.read(al)
      var s2 = bs.read(al)
      val ws = scala.collection.mutable.ArrayBuffer.empty[Int]
      var done = false
      while (!done) {
        ws += table.symbol(s1)
        if (ws.length > 255) fail()
        s1 = table.newState(s1) + bs.read(table.nbBits(s1))
        if (bs.pos < 0) {
          ws += table.symbol(s2)
          done = true
        } else {
          ws += table.symbol(s2)
          if (ws.length > 255) fail()
          s2 = table.newState(s2) + bs.read(table.nbBits(s2))
          if (bs.pos < 0) {
            ws += table.symbol(s1)
            done = true
          }
        }
        if (ws.length > 255) fail()
      }
      (hufFromWeights(ws.toArray), 1 + h)
    }
  }

  /** Decodes `n` literals from one backward Huffman stream. */
  private def hufDecodeStream(t: HufTable, d: Array[Byte], from: Int, to: Int,
                              n: Int, out: Array[Byte], outAt: Int): Unit = {
    val bs = new BackBits(d, from, to)
    var i = 0
    while (i < n) {
      // peek maxBits (zero-padded), consume the entry's length
      var idx = 0
      var k = 0
      var p = bs.pos
      while (k < t.maxBits) {
        p -= 1
        idx = (idx << 1) | (if (p < 0) 0 else (d(from + (p >> 3)) >> (p & 7)) & 1)
        k += 1
      }
      val len = t.lengths(idx)
      if (len == 0) fail()
      bs.pos -= len
      if (bs.pos < 0) fail() // streams contain exactly the code bits
      out(outAt + i) = t.symbols(idx).toByte
      i += 1
    }
  }

  // ---- sequence code tables (RFC 8878) ----

  private val LlBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private val LlDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1,
    1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val LlPredef = fseTable(LlDefault, 6)
  private lazy val MlPredef = fseTable(MlDefault, 6)
  private lazy val OfPredef = fseTable(OfDefault, 5)

  // ---- frame state ----

  private final class FrameState {
    var huf: HufTable = null
    var llTable: FseTable = null
    var mlTable: FseTable = null
    var ofTable: FseTable = null
    val rep = Array(1L, 4L, 8L)
  }

  private final class Out {
    var buf = new Array[Byte](1 << 14)
    var len = 0
    def ensure(n: Int): Unit = {
      if (n < 0 || len + n > MaxOut) fail()
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOut))
      }
    }
    def addAll(src: Array[Byte], from: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, from, buf, len, n); len += n
    }
    def fill(b: Byte, n: Int): Unit = {
      ensure(n); java.util.Arrays.fill(buf, len, len + n, b); len += n
    }
    /** Overlap-replicating backward copy against the frame window. */
    def copyBack(dist: Long, n: Int, frameStart: Int): Unit = {
      if (dist <= 0 || dist > len - frameStart) fail()
      ensure(n)
      val start = len - dist.toInt
      var i = 0
      while (i < n) { buf(len) = buf(start + i); len += 1; i += 1 }
    }
  }

  // ---- literals section ----

  /** Decodes the literals section; returns (literals, bytes consumed). */
  private def readLiterals(d: Array[Byte], from: Int, to: Int,
                           st: FrameState): (Array[Byte], Int) = {
    if (from >= to) fail()
    val b0 = d(from) & 0xff
    val blockType = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    blockType match {
      case 0 | 1 => // raw / RLE
        val (regen, hdr) = sizeFormat match {
          case 0 | 2 => (b0 >>> 3, 1)
          case 1 =>
            if (from + 2 > to) fail()
            ((b0 >>> 4) | ((d(from + 1) & 0xff) << 4), 2)
          case _ =>
            if (from + 3 > to) fail()
            ((b0 >>> 4) | ((d(from + 1) & 0xff) << 4) |
              ((d(from + 2) & 0xff) << 12), 3)
        }
        if (regen > MaxBlock) fail()
        if (blockType == 0) {
          if (from + hdr + regen > to) fail()
          (java.util.Arrays.copyOfRange(d, from + hdr, from + hdr + regen),
            hdr + regen)
        } else {
          if (from + hdr + 1 > to) fail()
          val lit = new Array[Byte](regen)
          java.util.Arrays.fill(lit, d(from + hdr))
          (lit, hdr + 1)
        }
      case _ => // Huffman with tree (2) / treeless repeat (3)
        var regen = 0; var comp = 0; var hdr = 0; var fourStreams = true
        sizeFormat match {
          case 0 | 1 =>
            if (from + 3 > to) fail()
            val v = b0 | ((d(from + 1) & 0xff) << 8) | ((d(from + 2) & 0xff) << 16)
            regen = (v >>> 4) & 0x3ff; comp = (v >>> 14) & 0x3ff
            hdr = 3; fourStreams = sizeFormat == 1
          case 2 =>
            if (from + 4 > to) fail()
            val v = b0.toLong | ((d(from + 1) & 0xffL) << 8) |
              ((d(from + 2) & 0xffL) << 16) | ((d(from + 3) & 0xffL) << 24)
            regen = ((v >>> 4) & 0x3fff).toInt; comp = ((v >>> 18) & 0x3fff).toInt
            hdr = 4
          case _ =>
            if (from + 5 > to) fail()
            val v = b0.toLong | ((d(from + 1) & 0xffL) << 8) |
              ((d(from + 2) & 0xffL) << 16) | ((d(from + 3) & 0xffL) << 24) |
              ((d(from + 4) & 0xffL) << 32)
            regen = ((v >>> 4) & 0x3ffff).toInt; comp = ((v >>> 22) & 0x3ffff).toInt
            hdr = 5
        }
        if (regen > MaxBlock || comp <= 0 || from + hdr + comp > to) fail()
        var p = from + hdr
        val end = from + hdr + comp
        if (blockType == 2) {
          val (t, used) = readHufTable(d, p, end)
          st.huf = t
          p += used
        } else if (st.huf == null) fail() // treeless with no prior tree
        val t = st.huf
        val lit = new Array[Byte](regen)
        if (!fourStreams) {
          if (regen > 0) hufDecodeStream(t, d, p, end, regen, lit, 0)
        } else {
          if (p + 6 > end) fail()
          def u16(at: Int): Int = (d(at) & 0xff) | ((d(at + 1) & 0xff) << 8)
          val s1 = u16(p); val s2 = u16(p + 2); val s3 = u16(p + 4)
          p += 6
          val s4 = end - p - s1 - s2 - s3
          if (s4 <= 0) fail()
          val per = (regen + 3) / 4
          val n4 = regen - 3 * per
          if (n4 < 0) fail()
          var at = p
          val sizes = Array(s1, s2, s3, s4)
          val counts = Array(per, per, per, n4)
          var k = 0
          var outAt = 0
          while (k < 4) {
            if (counts(k) > 0)
              hufDecodeStream(t, d, at, at + sizes(k), counts(k), lit, outAt)
            else if (sizes(k) <= 0) fail()
            at += sizes(k); outAt += counts(k)
            k += 1
          }
        }
        (lit, hdr + comp)
    }
  }

  // ---- sequences section ----

  /** Builds the decode table for one code per its 2-bit mode. */
  private def seqTable(d: Array[Byte], p0: Int, end: Int, mode: Int,
                       predef: FseTable, prev: FseTable, maxSym: Int,
                       maxLog: Int): (FseTable, Int) = mode match {
    case 0 => (predef, 0)
    case 1 =>
      if (p0 >= end) fail()
      val sym = d(p0) & 0xff
      if (sym > maxSym) fail()
      (rleTable(sym), 1)
    case 2 =>
      val fwd = new FwdBits(d, p0, end)
      val (freqs, al) = readNCount(fwd, maxSym, maxLog)
      (fseTable(freqs, al), fwd.bytesConsumed)
    case _ =>
      if (prev == null) fail() // repeat with no prior table
      (prev, 0)
  }

  /** Decodes and executes the sequences of one block. */
  private def decodeSequences(d: Array[Byte], from: Int, to: Int,
                              lit: Array[Byte], st: FrameState, out: Out,
                              frameStart: Int): Unit = {
    if (from >= to) fail()
    var p = from
    val b0 = d(p) & 0xff
    var nbSeq = 0
    if (b0 < 128) { nbSeq = b0; p += 1 }
    else if (b0 < 255) {
      if (p + 2 > to) fail()
      nbSeq = ((b0 - 128) << 8) | (d(p + 1) & 0xff); p += 2
    } else {
      if (p + 3 > to) fail()
      nbSeq = ((d(p + 1) & 0xff) | ((d(p + 2) & 0xff) << 8)) + 0x7f00
      p += 3
    }
    if (nbSeq == 0) {
      if (p != to) fail()
      out.addAll(lit, 0, lit.length)
      return
    }
    if (p >= to) fail()
    val modes = d(p) & 0xff; p += 1
    if ((modes & 3) != 0) fail() // reserved bits
    val llMode = (modes >> 6) & 3
    val ofMode = (modes >> 4) & 3
    val mlMode = (modes >> 2) & 3
    val (llT, llUsed) = seqTable(d, p, to, llMode, LlPredef, st.llTable, 35, 9)
    p += llUsed
    val (ofT, ofUsed) = seqTable(d, p, to, ofMode, OfPredef, st.ofTable, 31, 8)
    p += ofUsed
    val (mlT, mlUsed) = seqTable(d, p, to, mlMode, MlPredef, st.mlTable, 52, 9)
    p += mlUsed
    st.llTable = llT; st.ofTable = ofT; st.mlTable = mlT

    val bs = new BackBits(d, p, to)
    var llState = bs.read(llT.accuracyLog)
    var ofState = bs.read(ofT.accuracyLog)
    var mlState = bs.read(mlT.accuracyLog)
    var litAt = 0
    var i = 0
    while (i < nbSeq) {
      val ofCode = ofT.symbol(ofState)
      if (ofCode > 31) fail()
      val offsetValue = (1L << ofCode) + bs.readLong(ofCode)
      val mlCode = mlT.symbol(mlState)
      if (mlCode > 52) fail()
      val ml = MlBase(mlCode) + bs.read(MlBits(mlCode))
      val llCode = llT.symbol(llState)
      if (llCode > 35) fail()
      val ll = LlBase(llCode) + bs.read(LlBits(llCode))
      if (bs.pos < 0) fail()

      // repeat-offset resolution (the ll==0 twist)
      var offset = 0L
      if (offsetValue > 3) {
        offset = offsetValue - 3
        st.rep(2) = st.rep(1); st.rep(1) = st.rep(0); st.rep(0) = offset
      } else {
        val idx = (offsetValue - 1 + (if (ll == 0) 1 else 0)).toInt
        offset = if (idx == 3) st.rep(0) - 1 else st.rep(idx)
        if (offset <= 0) fail()
        if (idx > 0) {
          if (idx != 1) st.rep(2) = st.rep(1)
          st.rep(1) = st.rep(0)
          st.rep(0) = offset
        }
      }

      if (litAt + ll > lit.length) fail()
      out.addAll(lit, litAt, ll)
      litAt += ll
      out.copyBack(offset, ml, frameStart)

      if (i != nbSeq - 1) {
        llState = llT.newState(llState) + bs.read(llT.nbBits(llState))
        mlState = mlT.newState(mlState) + bs.read(mlT.nbBits(mlState))
        ofState = ofT.newState(ofState) + bs.read(ofT.nbBits(ofState))
        if (bs.pos < 0) fail()
      }
      i += 1
    }
    if (bs.pos != 0) fail() // bitstream must be exactly consumed
    out.addAll(lit, litAt, lit.length - litAt)
  }

  // ---- frame walk ----

  private def leU(d: Array[Byte], at: Int, n: Int): Long = {
    if (at + n > d.length) fail()
    var v = 0L
    var k = n - 1
    while (k >= 0) { v = (v << 8) | (d(at + k) & 0xffL); k -= 1 }
    v
  }

  /** Decodes all frames; returns null on any malformation. */
  def decompress(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 4) return null
    try {
      val out = new Out
      var p = 0
      var sawFrame = false
      while (p < b.length) {
        val magic = leU(b, p, 4)
        p += 4
        if (magic >= 0x184D2A50L && magic <= 0x184D2A5FL) { // skippable
          val size = leU(b, p, 4); p += 4
          if (size > b.length - p) fail()
          p += size.toInt
        } else if (magic == 0xFD2FB528L) {
          sawFrame = true
          val frameStart = out.len
          if (p >= b.length) fail()
          val desc = b(p) & 0xff; p += 1
          val fcsFlag = desc >>> 6
          val singleSeg = ((desc >>> 5) & 1) == 1
          if ((desc & 0x08) != 0) fail() // reserved bit
          val checksum = ((desc >>> 2) & 1) == 1
          val dictFlag = desc & 3
          if (!singleSeg) {
            if (p >= b.length) fail()
            p += 1 // window descriptor: actual output is bounded by
            // MaxOut in Out.ensure, so a large DECLARED window on a
            // small frame must not decline
          }
          val dictBytes = Array(0, 1, 2, 4)(dictFlag)
          if (dictBytes > 0) {
            if (leU(b, p, dictBytes) != 0L) fail() // dictionaries unsupported
            p += dictBytes
          }
          val fcsBytes = fcsFlag match {
            case 0 => if (singleSeg) 1 else 0
            case 1 => 2
            case 2 => 4
            case _ => 8
          }
          var fcs = -1L
          if (fcsBytes > 0) {
            fcs = leU(b, p, fcsBytes)
            if (fcsBytes == 2) fcs += 256
            p += fcsBytes
            if (fcs > MaxOut - frameStart) fail()
          }
          val st = new FrameState
          var last = false
          while (!last) {
            val h = leU(b, p, 3).toInt
            p += 3
            last = (h & 1) == 1
            val btype = (h >>> 1) & 3
            val size = h >>> 3
            btype match {
              case 0 => // raw
                if (size > b.length - p) fail()
                out.addAll(b, p, size)
                p += size
              case 1 => // RLE: size = regenerated count, content 1 byte
                if (p >= b.length || size > MaxBlock) fail()
                out.fill(b(p), size)
                p += 1
              case 2 => // compressed
                if (size > b.length - p || size > MaxBlock + 3) fail()
                val end = p + size
                val (lit, used) = readLiterals(b, p, end, st)
                decodeSequences(b, p + used, end, lit, st, out, frameStart)
                p = end
              case _ => fail() // reserved
            }
            if (out.len - frameStart > MaxOut) fail()
          }
          if (fcs >= 0 && out.len - frameStart != fcs) fail()
          if (checksum) {
            val want = leU(b, p, 4); p += 4
            val got = org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(out.buf,
                org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + frameStart,
                out.len - frameStart, 0L) & 0xffffffffL
            if (got != want) fail()
          }
        } else fail()
      }
      if (!sawFrame) fail()
      java.util.Arrays.copyOf(out.buf, out.len)
    } catch {
      case Malformed => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** Raw-block zstd frame (always-valid "stored" compression — the
    * write-side twin of [[ParquetWrite.snappyStored]] and
    * [[AvroWrite.deflateStored]]): single-segment frame header with
    * exact content size, ≤128 KiB raw blocks, and a verified XXH64
    * content checksum. Real zstd decoders and [[decompress]] both
    * consume it; no compressor needed. */
  def frameStored(b: Array[Byte]): Array[Byte] = {
    require(b != null && b.length <= MaxOut, "frameStored: input too large")
    val out = new java.io.ByteArrayOutputStream(b.length + 32)
    out.write(Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte), 0, 4)
    val fcsFlag = if (b.length <= 255) 0 else 2
    // single-segment + checksum; fcs 1 byte (flag 0) or 4 bytes (flag 2)
    out.write((fcsFlag << 6) | 0x20 | 0x04)
    if (fcsFlag == 0) out.write(b.length)
    else {
      out.write(b.length & 0xff); out.write((b.length >>> 8) & 0xff)
      out.write((b.length >>> 16) & 0xff); out.write((b.length >>> 24) & 0xff)
    }
    var p = 0
    do {
      val n = math.min(b.length - p, MaxBlock)
      val last = p + n == b.length
      val h = (n << 3) | (if (last) 1 else 0) // type raw (0)
      out.write(h & 0xff); out.write((h >>> 8) & 0xff); out.write((h >>> 16) & 0xff)
      out.write(b, p, n)
      p += n
    } while (p < b.length)
    val crc = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 0L) & 0xffffffffL
    out.write((crc & 0xff).toInt); out.write(((crc >>> 8) & 0xff).toInt)
    out.write(((crc >>> 16) & 0xff).toInt); out.write(((crc >>> 24) & 0xff).toInt)
    out.toByteArray
  }

  // ---- expression ----

  case class ZstdDecompress(child: Expression) extends UnaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "zstd_decompress"
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
    override def nullSafeEval(v: Any): Any =
      ZstdDecode.decompress(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |byte[] $r = graft.functions.ZstdDecode.decompress($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def decompressCol(c: Column): Column =
    SparkInternals.column(ZstdDecompress(SparkInternals.expression(c)))
}
