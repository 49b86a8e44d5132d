package graft.functions

/** FLAC (RFC 9639 / xiph format spec) sample decode — pure integer
  * arithmetic, no codec library, the same total-parser contract as
  * [[JpegBaseline]]: anything malformed yields null, never throws.
  *
  * Coverage: STREAMINFO walk (all metadata block types skipped),
  * frame-header parse (every blocksize/sample-rate/bps code incl. the
  * 8/16-bit uncommon-value forms, UTF-8-style coded frame/sample
  * number, CRC-8 verified), all four subframe types — CONSTANT,
  * VERBATIM, FIXED orders 0–4, LPC orders 1–32 (warmup + 4-bit
  * precision + signed quantization shift + signed coefficients, 64-bit
  * prediction accumulator) — Rice-coded residuals in both 4- and
  * 5-bit-parameter methods with partitioning and the escape-to-raw
  * form, wasted-bits shifting, and all three stereo decorrelation
  * modes (left/side, side/right, mid/side — the lost mid LSB restored
  * from the side channel's parity). Frame CRC-16 is verified; a
  * nonzero STREAMINFO total-samples count must match the decoded sum,
  * so truncation at a frame boundary is still rejected. Unlike WAV/MP3
  * this is the first container here whose payload is genuinely
  * ENTROPY-CODED prediction residuals — decode is the inverse filter,
  * exact in integers by construction, so conforming decoders agree
  * bit-for-bit (no IDCT-style tolerance). This moves the multimodal
  * stub boundary to perceptual/lossy codecs only.
  *
  * Scale shape: map-side, one pass, no allocation beyond the
  * per-frame channel buffers (blocksize-bounded); payloads never
  * leave their partition. Reference scope: the reference pipeline
  * treats media as opaque payloads (gmall-realtime carries no codec
  * work); this is beyond-reference corpus surface.
  *
  * Returns the wavPcmStats loudness/clipping contract: [n_samples,
  * peak, Σ|s|, Σs²] across all channels, exact int64 — except that
  * Σs² can genuinely exceed int64 at high bit depths (seconds of
  * 24-bit audio; two full-scale 32-bit samples), where it saturates
  * sticky at Long.MaxValue rather than wrapping.
  */
object FlacDecode {

  /** Single parse-failure escape, caught once at the public boundary
    * (no stack trace: filled-in traces would dominate fuzz runs). */
  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  /** MSB-first bit reader; whole-byte fast paths when aligned. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    var bit: Int = 0
    def bytePos: Int = pos
    def alignToByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def readBit(): Int = {
      if (pos >= b.length) fail()
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var left = n
      while (left >= 8 && bit == 0) {
        if (pos >= b.length) fail()
        v = (v << 8) | (b(pos) & 0xFFL)
        pos += 1; left -= 8
      }
      while (left > 0) { v = (v << 1) | readBit(); left -= 1 }
      v
    }
    def readSigned(n: Int): Long = {
      if (n == 0) return 0L
      val v = readBits(n)
      if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def readUnary(): Int = {
      var q = 0
      while (bit == 0 && pos < b.length && b(pos) == 0) { q += 8; pos += 1 }
      while (readBit() == 0) q += 1 // readBit fails at EOF → loop is total
      q
    }
  }

  // CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0, MSB-first —
  // the two checksums the FLAC framing mandates.
  private val crc8Table: Array[Int] = Array.tabulate(256) { n =>
    var c = n
    var k = 0
    while (k < 8) {
      c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
      k += 1
    }
    c
  }
  private val crc16Table: Array[Int] = Array.tabulate(256) { n =>
    var c = n << 8
    var k = 0
    while (k < 8) {
      c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
          else (c << 1) & 0xFFFF
      k += 1
    }
    c
  }
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table((c ^ (b(i) & 0xFF)) & 0xFF); i += 1 }
    c
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) {
      c = crc16Table(((c >> 8) ^ (b(i) & 0xFF)) & 0xFF) ^ ((c << 8) & 0xFFFF)
      i += 1
    }
    c
  }

  /** [n_samples, peak, Σ|s|, Σs²] over every decoded sample of every
    * channel, or null for anything that is not a well-formed FLAC
    * stream. */
  def flacPcmStats(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 42) return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    try decode(b) catch { case Malformed => null }
  }

  private def decode(b: Array[Byte]): Array[Long] = {
    // ---- metadata walk: STREAMINFO is mandatory-first per spec ----
    var p = 4
    var last = false
    var siRate = 0; var siCh = 0; var siBps = 0
    var siTotal = 0L
    var seen = false
    while (!last) {
      if (p + 4 > b.length) fail()
      val hdr = b(p) & 0xFF
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7F
      val len = ((b(p + 1) & 0xFF) << 16) | ((b(p + 2) & 0xFF) << 8) |
        (b(p + 3) & 0xFF)
      if (typ == 127) fail()
      if (typ == 0) {
        if (seen || len < 34 || p + 4 + len > b.length) fail()
        val o = p + 14 // past block header (4) + min/max blocksize/framesize
        siRate = ((b(o) & 0xFF) << 12) | ((b(o + 1) & 0xFF) << 4) |
          ((b(o + 2) & 0xFF) >> 4)
        siCh = ((b(o + 2) >> 1) & 0x07) + 1
        siBps = (((b(o + 2) & 0x01) << 4) | ((b(o + 3) & 0xFF) >> 4)) + 1
        siTotal = ((b(o + 3) & 0x0FL) << 32) | ((b(o + 4) & 0xFFL) << 24) |
          ((b(o + 5) & 0xFFL) << 16) | ((b(o + 6) & 0xFFL) << 8) |
          (b(o + 7) & 0xFFL)
        seen = true
      } else if (!seen) fail() // STREAMINFO must be the first block
      p += 4 + len
      if (p > b.length) fail()
    }
    if (!seen || siRate == 0) fail()

    // ---- frames ----
    var n = 0L; var peak = 0L; var sumAbs = 0L; var sumSq = 0L
    var satSq = false
    var decodedPerCh = 0L
    while (p < b.length) {
      val frameStart = p
      if (p + 4 > b.length) fail()
      if ((b(p) & 0xFF) != 0xFF || (b(p + 1) & 0xFE) != 0xF8) fail()
      val bsCode = (b(p + 2) >> 4) & 0xF
      val srCode = b(p + 2) & 0xF
      val chanAsgn = (b(p + 3) >> 4) & 0xF
      val sizeCode = (b(p + 3) >> 1) & 0x7
      if ((b(p + 3) & 1) != 0) fail()
      if (bsCode == 0 || srCode == 15 || chanAsgn > 10) fail()
      var q = p + 4
      // UTF-8-style coded frame/sample number, up to 36 bits / 7 bytes
      if (q >= b.length) fail()
      val c0 = b(q) & 0xFF
      val nExt =
        if ((c0 & 0x80) == 0) 0
        else if ((c0 & 0xE0) == 0xC0) 1
        else if ((c0 & 0xF0) == 0xE0) 2
        else if ((c0 & 0xF8) == 0xF0) 3
        else if ((c0 & 0xFC) == 0xF8) 4
        else if ((c0 & 0xFE) == 0xFC) 5
        else if (c0 == 0xFE) 6
        else fail()
      q += 1
      var e = 0
      while (e < nExt) {
        if (q >= b.length || (b(q) & 0xC0) != 0x80) fail()
        q += 1; e += 1
      }
      var blockSize = bsCode match {
        case 1          => 192
        case c if c < 6 => 576 << (c - 2)
        case 6 | 7      => 0 // uncommon value follows below
        case c          => 256 << (c - 8)
      }
      if (bsCode == 6) {
        if (q >= b.length) fail()
        blockSize = (b(q) & 0xFF) + 1; q += 1
      } else if (bsCode == 7) {
        if (q + 1 >= b.length) fail()
        blockSize = (((b(q) & 0xFF) << 8) | (b(q + 1) & 0xFF)) + 1; q += 2
      }
      // sample rate: value only matters for validity, not the stats
      if (srCode == 12) { if (q >= b.length) fail(); q += 1 }
      else if (srCode == 13 || srCode == 14) {
        if (q + 1 >= b.length) fail(); q += 2
      }
      if (q >= b.length || crc8(b, frameStart, q) != (b(q) & 0xFF)) fail()
      q += 1
      val bps = sizeCode match {
        case 0 => siBps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => fail()
      }
      if (sizeCode != 0 && bps != siBps) fail()
      val nCh = if (chanAsgn < 8) chanAsgn + 1 else 2
      if (nCh != siCh) fail()
      if (blockSize <= 0 || blockSize > 65536) fail()

      val br = new BitReader(b, q)
      val chans = new Array[Array[Long]](nCh)
      var ci = 0
      while (ci < nCh) {
        // the side channel of a decorrelated pair carries one extra bit
        val extra =
          if ((chanAsgn == 8 && ci == 1) || (chanAsgn == 9 && ci == 0) ||
              (chanAsgn == 10 && ci == 1)) 1
          else 0
        chans(ci) = decodeSubframe(br, blockSize, bps + extra)
        ci += 1
      }
      br.alignToByte()
      val crcPos = br.bytePos
      if (crcPos + 2 > b.length) fail()
      val want = ((b(crcPos) & 0xFF) << 8) | (b(crcPos + 1) & 0xFF)
      if (crc16(b, frameStart, crcPos) != want) fail()
      p = crcPos + 2

      // stereo decorrelation: side = left − right in all three modes.
      // Reconstructed samples must fit the declared bps (they always
      // do in a valid stream) — the check keeps garbage side channels
      // from smuggling >bps values into the stats below.
      val lo = -(1L << (bps - 1)); val hi = (1L << (bps - 1)) - 1
      if (chanAsgn == 8) { // left/side → right = left − side
        val l = chans(0); val s = chans(1)
        var i = 0
        while (i < blockSize) {
          s(i) = l(i) - s(i)
          if (s(i) < lo || s(i) > hi) fail()
          i += 1
        }
      } else if (chanAsgn == 9) { // side/right → left = right + side
        val s = chans(0); val r = chans(1)
        var i = 0
        while (i < blockSize) {
          s(i) = r(i) + s(i)
          if (s(i) < lo || s(i) > hi) fail()
          i += 1
        }
      } else if (chanAsgn == 10) { // mid/side: mid = (l+r)>>1 lost the
        val m = chans(0); val s = chans(1) // LSB; l+r and l−r share parity
        var i = 0
        while (i < blockSize) {
          val lr = (m(i) << 1) | (s(i) & 1L)
          m(i) = (lr + s(i)) >> 1
          s(i) = (lr - s(i)) >> 1
          if (m(i) < lo || m(i) > hi || s(i) < lo || s(i) > hi) fail()
          i += 1
        }
      }
      ci = 0
      while (ci < nCh) {
        val ch = chans(ci); var i = 0
        while (i < blockSize) {
          val v = ch(i); val a = math.abs(v)
          n += 1; if (a > peak) peak = a; sumAbs += a
          // Σs² can genuinely exceed int64 at high bit depths (a
          // 3-second 24-bit track already can; two full-scale 32-bit
          // samples do) — saturate sticky at Long.MaxValue instead of
          // wrapping. Each addend is < 2^63 (|v| ≤ 2^31 after the fit
          // check above), so a wrap always lands negative and is
          // caught immediately. Σ|s| cannot overflow for any payload
          // that fits in memory (≤ 2^29 samples · 2^31 < 2^63).
          if (!satSq) {
            sumSq += v * v
            if (sumSq < 0) satSq = true
          }
          i += 1
        }
        ci += 1
      }
      decodedPerCh += blockSize
    }
    // a declared total-sample count must match — catches truncation
    // that happens to land exactly on a frame boundary
    if (siTotal != 0 && siTotal != decodedPerCh) fail()
    Array(n, peak, sumAbs, if (satSq) Long.MaxValue else sumSq)
  }

  private def decodeSubframe(br: BitReader, blockSize: Int,
                             bpsIn: Int): Array[Long] = {
    if (br.readBit() != 0) fail()
    val typ = br.readBits(6).toInt
    var wasted = 0
    if (br.readBit() == 1) wasted = br.readUnary() + 1
    val bps = bpsIn - wasted
    if (bps <= 0 || bps > 33) fail()
    val out = new Array[Long](blockSize)
    if (typ == 0) { // CONSTANT
      java.util.Arrays.fill(out, br.readSigned(bps))
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = br.readSigned(bps); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED 0–4
      val order = typ & 0x07
      if (order > blockSize) fail()
      var i = 0
      while (i < order) { out(i) = br.readSigned(bps); i += 1 }
      readResiduals(br, blockSize, order, out)
      // the fixed predictors are the binomial differences of orders 0–4
      if (order == 1) {
        i = 1; while (i < blockSize) { out(i) += out(i - 1); i += 1 }
      } else if (order == 2) {
        i = 2
        while (i < blockSize) { out(i) += 2 * out(i - 1) - out(i - 2); i += 1 }
      } else if (order == 3) {
        i = 3
        while (i < blockSize) {
          out(i) += 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3); i += 1
        }
      } else if (order == 4) {
        i = 4
        while (i < blockSize) {
          out(i) += 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
            out(i - 4)
          i += 1
        }
      }
    } else if ((typ & 0x20) != 0) { // LPC, order 1–32
      val order = (typ & 0x1F) + 1
      if (order > blockSize) fail()
      var i = 0
      while (i < order) { out(i) = br.readSigned(bps); i += 1 }
      val precM1 = br.readBits(4).toInt
      if (precM1 == 15) fail() // reserved
      val precision = precM1 + 1
      val shift = br.readSigned(5).toInt
      if (shift < 0) fail() // negative shift is spec-invalid (RFC 9639)
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      readResiduals(br, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) += acc >> shift
        i += 1
      }
    } else fail()
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual section: 2-bit method (4- or 5-bit params),
    * 4-bit partition order, per-partition parameter with the
    * all-ones escape to fixed-width raw residuals. Values are
    * zigzag-folded: even → u/2, odd → −(u/2)−1. */
  private def readResiduals(br: BitReader, blockSize: Int, order: Int,
                            out: Array[Long]): Unit = {
    val method = br.readBits(2).toInt
    if (method > 1) fail()
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = br.readBits(4).toInt
    val partitions = 1 << po
    if ((blockSize & (partitions - 1)) != 0) fail()
    val psize = blockSize >> po
    if (psize <= order) fail()
    var idx = order
    var part = 0
    while (part < partitions) {
      val count = if (part == 0) psize - order else psize
      val param = br.readBits(paramBits).toInt
      if (param == escape) {
        val rawBits = br.readBits(5).toInt
        var i = 0
        while (i < count) {
          out(idx) = if (rawBits == 0) 0L else br.readSigned(rawBits)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val u = (br.readUnary().toLong << param) | br.readBits(param)
          out(idx) = if ((u & 1L) != 0) -((u >> 1) + 1) else u >> 1
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }
}
