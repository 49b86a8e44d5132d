package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** FlacDecode against a spec-side ENCODER (this file): the decoder's
  * bit reader, Rice unfolding, prediction filters, decorrelation and
  * CRCs are exercised by streams the SQL fixture builder cannot
  * express — nonzero Rice quotients, 5-bit parameters, partitioning,
  * escape partitions, FIXED orders 1–4, LPC, wasted bits, all three
  * stereo modes, multi-byte coded frame numbers and multi-frame
  * streams. Encoder and decoder share only this file's CRC tables
  * (checksums are definitional); the prediction/entropy paths are
  * written independently in each direction, so a bug must be made
  * twice, mirrored, to slip through. No independent FLAC
  * implementation exists in this zero-egress container (the JDK has
  * none, unlike ImageIO for PNG/GIF/JPEG), so the cross-checks are:
  * encoder↔decoder round-trip here, and the SQL-built fixture stream
  * (an entirely separate construction) in the x_flac_pcm gate. */
class FlacDecodeSpec extends AnyFunSuite {

  // ---- spec-side encoder ----

  private class BitWriter {
    private val out = new scala.collection.mutable.ArrayBuffer[Byte]
    private var cur = 0
    private var n = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); n += 1
      if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
    }
    def writeBits(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def align(): Unit = while (n != 0) writeBit(0)
    def bytes: Array[Byte] = { require(n == 0); out.toArray }
  }

  private val crc8T = Array.tabulate(256) { x =>
    var c = x; var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 7) & 0xFF else (c << 1) & 0xFF; k += 1 }
    c
  }
  private val crc16T = Array.tabulate(256) { x =>
    var c = x << 8; var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF; k += 1 }
    c
  }
  private def crc8(b: Array[Byte]): Int =
    b.foldLeft(0)((c, x) => crc8T((c ^ (x & 0xFF)) & 0xFF))
  private def crc16(b: Array[Byte]): Int =
    b.foldLeft(0)((c, x) => crc16T(((c >> 8) ^ (x & 0xFF)) & 0xFF) ^ ((c << 8) & 0xFFFF))

  private def streamInfo(rate: Int, ch: Int, bps: Int, total: Long): Array[Byte] = {
    val b = new scala.collection.mutable.ArrayBuffer[Byte]
    b ++= "fLaC".getBytes("ISO-8859-1")
    b ++= Array[Byte](0x80.toByte, 0, 0, 34)
    b ++= Array[Byte](0, 16, 0, 16)            // min/max blocksize (unused)
    b ++= Array.fill[Byte](6)(0)               // min/max framesize unknown
    b += ((rate >> 12) & 0xFF).toByte
    b += ((rate >> 4) & 0xFF).toByte
    b += (((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte
    b += ((((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF).toInt).toByte
    b += ((total >> 24) & 0xFF).toByte
    b += ((total >> 16) & 0xFF).toByte
    b += ((total >> 8) & 0xFF).toByte
    b += (total & 0xFF).toByte
    b ++= Array.fill[Byte](16)(0)              // md5 unknown
    b.toArray
  }

  private def utf8Number(v: Long): Array[Byte] = {
    if (v < 0x80) Array(v.toByte)
    else {
      var bytes = 2
      while (v >= (1L << (6 - bytes + 5 * bytes)) && bytes < 7) bytes += 1
      // leading byte: `bytes` ones then a zero, then high payload bits
      val contBits = 6 * (bytes - 1)
      val lead =
        if (bytes < 7) ((0xFF << (8 - bytes)) & 0xFF) | (v >> contBits).toInt
        else 0xFE
      Array(lead.toByte) ++ (1 until bytes).map { i =>
        (0x80 | ((v >> (6 * (bytes - 1 - i))) & 0x3F)).toInt.toByte
      }
    }
  }

  private def zigzag(r: Long): Long = if (r >= 0) 2 * r else -2 * r - 1

  /** A subframe encoding recipe. */
  sealed trait Sub
  case object Constant extends Sub
  case object Verbatim extends Sub
  case class Fixed(order: Int, param: Int, po: Int = 0,
                   method: Int = 0, escape: Boolean = false,
                   wasted: Int = 0) extends Sub
  case class Lpc(order: Int, coefs: Array[Long], shift: Int,
                 precision: Int, param: Int, po: Int = 0) extends Sub

  private def writeResiduals(bw: BitWriter, res: Array[Long], order: Int,
                             blockSize: Int, param: Int, po: Int,
                             method: Int, escape: Boolean): Unit = {
    bw.writeBits(method, 2)
    bw.writeBits(po, 4)
    val partitions = 1 << po
    val psize = blockSize / partitions
    val paramBits = if (method == 0) 4 else 5
    var idx = 0
    for (part <- 0 until partitions) {
      val count = if (part == 0) psize - order else psize
      if (escape) {
        bw.writeBits(if (method == 0) 15 else 31, paramBits)
        val raw = 18 // fixed-width bits wide enough for all test residuals
        bw.writeBits(raw, 5)
        for (_ <- 0 until count) {
          bw.writeBits(res(idx) & ((1L << raw) - 1), raw); idx += 1
        }
      } else {
        bw.writeBits(param, paramBits)
        for (_ <- 0 until count) {
          val u = zigzag(res(idx)); idx += 1
          bw.writeUnary((u >> param).toInt)
          bw.writeBits(u & ((1L << param) - 1), param)
        }
      }
    }
  }

  private def fixedResiduals(s: Array[Long], order: Int): Array[Long] =
    order match {
      case 0 => s.clone()
      case 1 => (1 until s.length).map(i => s(i) - s(i - 1)).toArray
      case 2 => (2 until s.length).map(i => s(i) - 2 * s(i - 1) + s(i - 2)).toArray
      case 3 => (3 until s.length)
        .map(i => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)).toArray
      case 4 => (4 until s.length)
        .map(i => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4))
        .toArray
    }

  private def writeSubframe(bw: BitWriter, s: Array[Long], bps: Int,
                            sub: Sub): Unit = sub match {
    case Constant =>
      bw.writeBit(0); bw.writeBits(0, 6); bw.writeBit(0)
      bw.writeBits(s(0), bps)
    case Verbatim =>
      bw.writeBit(0); bw.writeBits(1, 6); bw.writeBit(0)
      s.foreach(v => bw.writeBits(v, bps))
    case Fixed(order, param, po, method, escape, wasted) =>
      bw.writeBit(0); bw.writeBits(8 | order, 6)
      if (wasted > 0) { bw.writeBit(1); bw.writeUnary(wasted - 1) }
      else bw.writeBit(0)
      require(s.forall(v => wasted == 0 || (v & ((1L << wasted) - 1)) == 0))
      val eff = s.map(_ >> wasted)
      val effBps = bps - wasted
      for (i <- 0 until order) bw.writeBits(eff(i), effBps)
      writeResiduals(bw, fixedResiduals(eff, order), order, s.length,
        param, po, method, escape)
    case Lpc(order, coefs, shift, precision, param, po) =>
      bw.writeBit(0); bw.writeBits(32 | (order - 1), 6); bw.writeBit(0)
      for (i <- 0 until order) bw.writeBits(s(i), bps)
      bw.writeBits(precision - 1, 4)
      bw.writeBits(shift.toLong, 5)
      coefs.foreach(c => bw.writeBits(c, precision))
      val res = (order until s.length).map { i =>
        val pred = (0 until order).map(j => coefs(j) * s(i - 1 - j)).sum >> shift
        s(i) - pred
      }.toArray
      writeResiduals(bw, res, order, s.length, param, po, 0, escape = false)
  }

  /** One frame: `stored` are the channel signals AS STORED (after any
    * decorrelation), with the matching channel assignment code. */
  private def frame(frameNo: Long, blockSize: Int, bps: Int,
                    chanAsgn: Int, stored: Seq[(Array[Long], Sub)],
                    rateCode: Int = 4): Array[Byte] = {
    val hdr = new scala.collection.mutable.ArrayBuffer[Byte]
    hdr += 0xFF.toByte
    hdr += 0xF8.toByte
    hdr += ((7 << 4) | rateCode).toByte // 16-bit blocksize-1 follows
    val sizeCode = bps match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
      case 32 => 7; case _ => 0
    }
    hdr += ((chanAsgn << 4) | (sizeCode << 1)).toByte
    hdr ++= utf8Number(frameNo)
    hdr += (((blockSize - 1) >> 8) & 0xFF).toByte
    hdr += ((blockSize - 1) & 0xFF).toByte
    hdr += crc8(hdr.toArray).toByte
    val bw = new BitWriter
    for (((sig, sub), ci) <- stored.zipWithIndex) {
      val extra =
        if ((chanAsgn == 8 && ci == 1) || (chanAsgn == 9 && ci == 0) ||
            (chanAsgn == 10 && ci == 1)) 1
        else 0
      writeSubframe(bw, sig, bps + extra, sub)
    }
    bw.align()
    val body = hdr.toArray ++ bw.bytes
    val c = crc16(body)
    body ++ Array(((c >> 8) & 0xFF).toByte, (c & 0xFF).toByte)
  }

  private def stats(all: Seq[Array[Long]]): Array[Long] = {
    val flat = all.flatten
    Array(flat.length.toLong, flat.map(math.abs).max,
      flat.map(math.abs).sum, flat.map(v => v * v).sum)
  }

  private def mono(samples: Array[Long], bps: Int, sub: Sub,
                   frameNo: Long = 0L): Array[Byte] =
    streamInfo(8000, 1, bps, samples.length.toLong) ++
      frame(frameNo, samples.length, bps, 0, Seq(samples -> sub))

  private def sig(n: Int, f: Int => Long): Array[Long] =
    Array.tabulate(n)(f)

  // ---- round-trips ----

  test("fixed orders 0-4: real Rice quotients decode back exactly") {
    val s = sig(64, i => ((i * 37) % 211) - 105L)
    for (order <- 0 to 4; param <- Seq(0, 2, 9)) {
      val got = FlacDecode.flacPcmStats(mono(s, 16, Fixed(order, param)))
      assert(got != null, s"order $order param $param")
      assert(got.toSeq == stats(Seq(s)).toSeq, s"order $order param $param")
    }
  }

  test("constant and verbatim subframes") {
    val c = Array.fill(32)(-713L)
    assert(FlacDecode.flacPcmStats(mono(c, 16, Constant)).toSeq ==
      stats(Seq(c)).toSeq)
    val v = sig(32, i => ((i * 9973) % 65536) - 32768L)
    assert(FlacDecode.flacPcmStats(mono(v, 16, Verbatim)).toSeq ==
      stats(Seq(v)).toSeq)
  }

  test("rice partitioning (orders 1-3), 5-bit method, escape partitions") {
    val s = sig(64, i => (math.sin(i * 0.3) * 12000).toLong)
    for (po <- 1 to 3)
      assert(FlacDecode.flacPcmStats(
        mono(s, 16, Fixed(2, 5, po = po))).toSeq == stats(Seq(s)).toSeq,
        s"partition order $po")
    assert(FlacDecode.flacPcmStats(
      mono(s, 16, Fixed(2, 17, method = 1))).toSeq == stats(Seq(s)).toSeq,
      "5-bit parameter method")
    assert(FlacDecode.flacPcmStats(
      mono(s, 16, Fixed(1, 0, po = 2, escape = true))).toSeq ==
      stats(Seq(s)).toSeq, "escape partitions (raw residuals)")
  }

  test("LPC prediction: orders 1, 2 and 8 with quantization shifts") {
    val s = sig(96, i => (math.sin(i * 0.21) * 9000 + i * 3).toLong)
    val cases = Seq(
      Lpc(1, Array(31L), 5, 6, 4),
      Lpc(2, Array(63L, -31L), 5, 7, 4),
      Lpc(8, Array(120L, -60L, 30L, -15L, 8L, -4L, 2L, -1L), 7, 8, 6))
    for (l <- cases)
      assert(FlacDecode.flacPcmStats(mono(s, 16, l)).toSeq ==
        stats(Seq(s)).toSeq, s"LPC order ${l.order}")
  }

  test("wasted bits shift decoded samples back up") {
    val s = sig(48, i => (((i * 37) % 211) - 105L) << 3)
    assert(FlacDecode.flacPcmStats(
      mono(s, 16, Fixed(1, 4, wasted = 3))).toSeq == stats(Seq(s)).toSeq)
  }

  test("stereo: independent, left/side, side/right, mid/side") {
    val l = sig(48, i => (math.sin(i * 0.4) * 8000).toLong)
    val r = sig(48, i => (math.cos(i * 0.3) * 7000).toLong)
    val side = l.indices.map(i => l(i) - r(i)).toArray
    val mid = l.indices.map(i => (l(i) + r(i)) >> 1).toArray
    val expect = stats(Seq(l, r)).toSeq
    def stream(asgn: Int, stored: Seq[(Array[Long], Sub)]) =
      streamInfo(44100, 2, 16, 48) ++ frame(0, 48, 16, asgn, stored)
    assert(FlacDecode.flacPcmStats(stream(1,
      Seq(l -> Fixed(2, 6), r -> Fixed(2, 6)))).toSeq == expect, "indep")
    assert(FlacDecode.flacPcmStats(stream(8,
      Seq(l -> Fixed(2, 6), side -> Fixed(2, 6)))).toSeq == expect, "L/S")
    assert(FlacDecode.flacPcmStats(stream(9,
      Seq(side -> Fixed(2, 6), r -> Fixed(2, 6)))).toSeq == expect, "S/R")
    assert(FlacDecode.flacPcmStats(stream(10,
      Seq(mid -> Fixed(2, 6), side -> Fixed(2, 6)))).toSeq == expect, "M/S")
  }

  test("multi-frame streams and multi-byte coded frame numbers") {
    val a = sig(32, i => i * 11L - 170)
    val b = sig(32, i => 500L - i * 7)
    val two = streamInfo(8000, 1, 16, 64) ++
      frame(0, 32, 16, 0, Seq(a -> Fixed(1, 4))) ++
      frame(1, 32, 16, 0, Seq(b -> Fixed(2, 4)))
    assert(FlacDecode.flacPcmStats(two).toSeq == stats(Seq(a, b)).toSeq)
    // frame number 5000 needs a 3-byte UTF-8-style coding
    val big = streamInfo(8000, 1, 16, 32) ++
      frame(5000, 32, 16, 0, Seq(a -> Fixed(1, 4)))
    assert(FlacDecode.flacPcmStats(big).toSeq == stats(Seq(a)).toSeq)
  }

  test("sum_sq saturates sticky at Long.MaxValue instead of wrapping") {
    // two full-scale 32-bit samples: each square is 2^62, the sum is
    // 2^63 — one past int64. peak and sum_abs stay exact.
    val s = Array.fill(2)(Int.MinValue.toLong)
    val got = FlacDecode.flacPcmStats(mono(s, 32, Constant))
    assert(got.toSeq == Seq(2L, 1L << 31, 1L << 32, Long.MaxValue),
      got.toSeq.toString)
  }

  test("bit depths 8 and 24, and non-streaminfo rate codes") {
    val s8 = sig(40, i => ((i * 29) % 200) - 100L)
    assert(FlacDecode.flacPcmStats(mono(s8, 8, Fixed(1, 3))).toSeq ==
      stats(Seq(s8)).toSeq)
    val s24 = sig(40, i => ((i * 999983L) % 8000000L) - 4000000L)
    assert(FlacDecode.flacPcmStats(mono(s24, 24, Fixed(2, 12))).toSeq ==
      stats(Seq(s24)).toSeq)
  }

  // ---- integrity + totality ----

  test("corrupted CRC-8, CRC-16 and payload bytes are rejected") {
    val s = sig(64, i => ((i * 37) % 211) - 105L)
    val ok = mono(s, 16, Fixed(2, 5))
    assert(FlacDecode.flacPcmStats(ok) != null)
    val hdrCrcPos = 42 + 7 // streaminfo(42) + 7-byte frame header
    for (pos <- Seq(hdrCrcPos, ok.length - 1, ok.length - 10)) {
      val bad = ok.clone(); bad(pos) = (bad(pos) ^ 0x41).toByte
      assert(FlacDecode.flacPcmStats(bad) == null, s"flip at $pos")
    }
  }

  test("truncation at a frame boundary trips the total-samples check") {
    val a = sig(32, i => i * 11L - 170)
    val b = sig(32, i => 500L - i * 7)
    val two = streamInfo(8000, 1, 16, 64) ++
      frame(0, 32, 16, 0, Seq(a -> Fixed(1, 4))) ++
      frame(1, 32, 16, 0, Seq(b -> Fixed(2, 4)))
    val oneFrameLen = 42 +
      frame(0, 32, 16, 0, Seq(a -> Fixed(1, 4))).length
    assert(FlacDecode.flacPcmStats(two.take(oneFrameLen)) == null,
      "frame-boundary truncation must fail the declared-total check")
  }

  test("truncation at every byte: null, never throw") {
    val s = sig(64, i => (math.sin(i * 0.3) * 12000).toLong)
    val ok = mono(s, 16, Fixed(3, 5, po = 1))
    for (cut <- 0 until ok.length) {
      val got = try FlacDecode.flacPcmStats(ok.take(cut))
      catch { case e: Throwable => fail(s"threw at cut $cut: $e") }
      assert(got == null, s"cut $cut")
    }
  }

  test("the SQL fixture bitstream layout decodes (driver-side replica)") {
    // byte-for-byte replica of Multimodal.syntheticFlacPcm for one doc,
    // built by the independent encoder path here: same samples, same
    // subframe plan (fixed order 0, param 7, po 0), same STREAMINFO
    val docId = 37L
    val s = sig(16, i => (docId * 31 + (i + 1) * 17) % 64 - 32)
    val fx = streamInfo(8000, 1, 16, 16) ++ {
      // the fixture uses blocksize-code 6 (8-bit value) — mirror it
      val hdr = scala.collection.mutable.ArrayBuffer[Byte](
        0xFF.toByte, 0xF8.toByte, 0x64.toByte, 0x08.toByte, 0x00, 0x0F)
      hdr += crc8(hdr.toArray).toByte
      val bw = new BitWriter
      writeSubframe(bw, s, 16, Fixed(0, 7))
      bw.align()
      val body = hdr.toArray ++ bw.bytes
      val c = crc16(body)
      body ++ Array(((c >> 8) & 0xFF).toByte, (c & 0xFF).toByte)
    }
    assert(FlacDecode.flacPcmStats(fx).toSeq == stats(Seq(s)).toSeq)
  }
}
