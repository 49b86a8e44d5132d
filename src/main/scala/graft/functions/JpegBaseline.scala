package graft.functions

/** JPEG (ITU-T T.81) decode, baseline-sequential AND progressive —
  * pure arithmetic, no codec library: marker parse (DQT/DHT/SOF0/SOF2/
  * DRI/SOS), canonical Huffman decode with byte unstuffing and restart
  * markers, zigzag dequantization, and a double-precision separable
  * IDCT with round-half-up + level shift. Progressive streams decode
  * COMPLETELY per Annex G: DC first + refinement scans (interleaved),
  * AC spectral-band first scans with EOB runs, and AC successive-
  * approximation refinement (correction bits) — every stage is exactly
  * specified, so the same determinism contract as baseline holds.
  * Component shapes: single-component (luma-only) and 3-component
  * color at ANY T.81-legal sampling (4:4:4, 4:2:2, 4:2:0, …: per-
  * component Hi×Vi ∈ [1,4], ≤10 blocks/MCU) on BOTH the baseline
  * (MCU-interleaved per A.2.3) and progressive paths (interleaved DC
  * scans walk the MCU grid; single-component DC/AC band scans walk
  * the component's own ceil(xi/8)×ceil(yi/8) grid per A.2.2). The
  * two implementation-defined color stages are PINNED: YCbCr→RGB is
  * the 16-bit fixed-point JFIF matrix (constants 91881 / 22554 /
  * 46802 / 116130 = round(1.402 / 0.344136 / 0.714136 / 1.772 · 2¹⁶),
  * add 2¹⁵, arithmetic shift right 16, clamp — the de-facto libjpeg
  * rendering), and chroma UPSAMPLING is nearest-neighbor sample
  * replication (out(x,y) = comp(⌊x·Hi/Hmax⌋, ⌊y·Vi/Vmax⌋) — JFIF's
  * "box" rule, the NanoJPEG/stb_image convention; libjpeg's default
  * "fancy" triangle filter agrees exactly wherever the neighboring
  * chroma samples are equal and differs by a fraction of the local
  * chroma gradient at sample boundaries — the specs compare exactly
  * on constant-chroma content and interior pixels, with tolerance
  * elsewhere). Arithmetic coding,
  * hierarchical/lossless frames, 12-bit precision and anything
  * malformed also yield null, never throw.
  *
  * Determinism note: an IDCT is the one stage where conforming
  * decoders may differ by ±1/pixel (T.81 only bounds accuracy).
  * DC-ONLY blocks are exact in every conforming decoder (the IDCT
  * collapses to round(dc/8) + 128), which is what the hash-exact
  * DuckDB gates use (x_jpeg_pixels gray, x_jpeg_color 4:4:4,
  * x_jpeg_progressive); full-AC streams are spec-pinned against the
  * JDK ImageIO reader with a ±1/pixel tolerance (±2 after color
  * conversion).
  */
object JpegBaseline {

  /** Zigzag scan order: zigzag(k) = raster index of the k-th coefficient. */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · C(u)/2 table for the separable IDCT. */
  private val idctCos: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val c = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        t(x * 8 + u) = 0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Canonical Huffman table built from a DHT segment's BITS/HUFFVAL. */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  /** Entropy-segment bit reader: unstuffs 0xFF 0x00, stops at markers. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var hitMarker = false
    var corrupt = false

    /** Next data byte, handling stuffing; -1 at a marker/end. */
    private def nextByte(): Int = {
      if (pos >= b.length) { corrupt = true; return -1 }
      val v = b(pos) & 0xff
      pos += 1
      if (v != 0xff) v
      else {
        if (pos >= b.length) { corrupt = true; return -1 }
        val m = b(pos) & 0xff
        if (m == 0x00) { pos += 1; 0xff }
        else { pos -= 1; hitMarker = true; -1 } // rewind to the 0xFF
      }
    }
    def bit(): Int = {
      if (bitCnt == 0) {
        val v = nextByte()
        if (v < 0) return -1
        bitBuf = v; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bt = bit()
        if (bt < 0) { corrupt = true; return -1 }
        v = (v << 1) | bt
        i += 1
      }
      v
    }
    def decode(h: Huff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val bt = bit()
        if (bt < 0) { corrupt = true; return -1 }
        code = (code << 1) | bt
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) return h.value(l, code)
        l += 1
      }
      corrupt = true; -1
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Boolean = {
      bitCnt = 0
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + n)) return false
      pos += 2
      hitMarker = false
      true
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Separable IDCT of one dequantized 8×8 block (raster-order `coef`)
    * into the component plane at block (bx, by) — shared by the
    * baseline streaming path and the progressive end-of-stream pass. */
  private def idctToPlane(coef: Array[Double], tmp: Array[Double],
                          px: Array[Int], w: Int, h: Int,
                          bx: Int, by: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += idctCos(x * 8 + u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = acc
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += idctCos(yy * 8 + v) * tmp(v * 8 + x); v += 1 }
        val ix = bx * 8 + x
        val iy = by * 8 + yy
        if (ix < w && iy < h) {
          val p = math.round(acc).toInt + 128
          px(iy * w + ix) = if (p < 0) 0 else if (p > 255) 255 else p
        }
        yy += 1
      }
      x += 1
    }
  }

  /** Decode one PROGRESSIVE scan (T.81 Annex G) into the spectral
    * coefficient store (`coefs(comp)((row·bwPad + col)·64 + k)`, k in
    * zigzag order, rows/cols on the MCU-padded block grid): DC
    * first/refinement (interleaved scans walk the MCU grid with
    * Hi×Vi blocks per component per MCU; a single-component scan is
    * non-interleaved and walks the component's native
    * ceil(compW/8)×ceil(compH/8) grid per A.2.2), AC first/refinement
    * (single-component, EOB-run + correction-bit semantics), restart
    * markers resetting predictors and the EOB run every
    * restartInterval MCUs (interleaved) or data units (otherwise).
    * Returns the byte position after the scan's entropy data, or -1. */
  private def progressiveScan(b: Array[Byte], segStart: Int, segLen: Int,
                              nComp: Int, compId: Array[Int],
                              sampH: Array[Int], sampV: Array[Int],
                              mcusX: Int, mcusY: Int,
                              bwPad: Array[Int],
                              bwNat: Array[Int], bhNat: Array[Int],
                              dcTables: Array[Huff], acTables: Array[Huff],
                              restartInterval: Int,
                              coefs: Array[Array[Int]]): Int = {
    val p0 = segStart + 4
    val ns = b(p0) & 0xff
    if (ns < 1 || ns > nComp || segLen != 6 + 2 * ns) return -1
    val scanComp = new Array[Int](ns)
    val dcSelS = new Array[Int](ns)
    val acSelS = new Array[Int](ns)
    var prev = -1
    var c = 0
    while (c < ns) {
      val cs = b(p0 + 1 + 2 * c) & 0xff
      var idx = -1
      var j = 0
      while (j < nComp) { if (compId(j) == cs) idx = j; j += 1 }
      if (idx < 0 || idx <= prev) return -1 // unknown / out of frame order
      prev = idx
      scanComp(c) = idx
      dcSelS(c) = (b(p0 + 2 + 2 * c) & 0xff) >> 4
      acSelS(c) = b(p0 + 2 + 2 * c) & 0x0f
      if (dcSelS(c) > 3 || acSelS(c) > 3) return -1
      c += 1
    }
    val ss = b(p0 + 1 + 2 * ns) & 0xff
    val se = b(p0 + 2 + 2 * ns) & 0xff
    val ah = (b(p0 + 3 + 2 * ns) & 0xff) >> 4
    val al = b(p0 + 3 + 2 * ns) & 0x0f
    if (ss == 0 && se != 0) return -1 // DC scans carry exactly [0,0]
    if (ss > 0 && (ns != 1 || se < ss || se > 63)) return -1 // AC: 1 comp
    if (al > 13 || ah > 13 || (ah != 0 && ah != al + 1)) return -1
    val r = new BitReader(b, segStart + 2 + segLen)
    // A scan is interleaved iff it carries >1 component (A.2): it then
    // walks the MCU grid with Hi×Vi blocks per component per MCU. A
    // single-component scan walks that component's native block grid.
    val interleaved = ns > 1
    val sc0 = scanComp(0)
    val nUnits =
      if (interleaved) mcusX * mcusY else bwNat(sc0) * bhNat(sc0)
    val pred = new Array[Int](ns)
    var eobrun = 0
    var rstCount = 0
    var rstN = 0
    var m = 0
    // DC entropy step for one data unit of scan component ci at store
    // offset `at` (first pass accumulates the predictor; refinement
    // appends one correction bit per G.1.2.1)
    def dcUnit(co: Array[Int], at: Int, ci: Int): Boolean = {
      if (ah == 0) {
        val dcH = dcTables(dcSelS(ci))
        if (dcH == null) return false
        val s = r.decode(dcH)
        if (r.corrupt || s > 11) return false
        val diff = extend(r.receive(s), s)
        if (r.corrupt) return false
        pred(ci) += diff
        co(at) = pred(ci) << al
        true
      } else {
        val bit = r.bit()
        if (bit < 0) return false
        if (bit == 1) co(at) |= (1 << al)
        true
      }
    }
    while (m < nUnits) {
      if (restartInterval > 0 && rstCount == restartInterval) {
        if (!r.restart(rstN)) return -1
        rstN = (rstN + 1) & 7
        rstCount = 0
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      if (ss == 0) {
        if (interleaved) {
          val mx = m % mcusX
          val my = m / mcusX
          var ci = 0
          while (ci < ns) {
            val comp = scanComp(ci)
            val co = coefs(comp)
            var v = 0
            while (v < sampV(comp)) {
              var hh = 0
              while (hh < sampH(comp)) {
                val at = ((my * sampV(comp) + v) * bwPad(comp) +
                  (mx * sampH(comp) + hh)) * 64
                if (!dcUnit(co, at, ci)) return -1
                hh += 1
              }
              v += 1
            }
            ci += 1
          }
        } else {
          val co = coefs(sc0)
          val at = ((m / bwNat(sc0)) * bwPad(sc0) + (m % bwNat(sc0))) * 64
          if (!dcUnit(co, at, 0)) return -1
        }
      } else {
        val co = coefs(sc0)
        val base = ((m / bwNat(sc0)) * bwPad(sc0) + (m % bwNat(sc0))) * 64
        val acH = acTables(acSelS(0))
        if (acH == null) return -1
        if (ah == 0) {
          // AC first: band coefficients at approximation `al`, EOB runs
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var done = false
            while (!done && k <= se) {
              val rs = r.decode(acH)
              if (r.corrupt) return -1
              val run = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (run == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << run) - 1
                  if (run > 0) {
                    val ext = r.receive(run)
                    if (r.corrupt) return -1
                    eobrun += ext
                  }
                  done = true
                }
              } else {
                k += run
                if (k > se) return -1
                co(base + k) = extend(r.receive(s), s) << al
                if (r.corrupt) return -1
                k += 1
              }
            }
          }
        } else {
          // AC refinement (G.1.2.3): corrections ride nonzero history,
          // new ±1·2^al coefficients land after `run` zero-history slots
          val pos1 = 1 << al
          val neg1 = -1 << al
          def correct(idx: Int): Boolean = {
            val cb = r.bit()
            if (cb < 0) return false
            if (cb == 1 && (co(idx) & pos1) == 0)
              co(idx) += (if (co(idx) >= 0) pos1 else neg1)
            true
          }
          var k = ss
          if (eobrun == 0) {
            var toEob = false
            while (!toEob && k <= se) {
              val rs = r.decode(acH)
              if (r.corrupt) return -1
              var run = rs >> 4
              val s = rs & 15
              var newVal = 0
              if (s == 0) {
                if (run != 15) {
                  eobrun = 1 << run
                  if (run > 0) {
                    val ext = r.receive(run)
                    if (r.corrupt) return -1
                    eobrun += ext
                  }
                  toEob = true
                } // run == 15: skip 16 zero-history slots, corrections en route
              } else {
                if (s != 1) return -1
                val sb = r.bit()
                if (sb < 0) return -1
                newVal = if (sb == 1) pos1 else neg1
              }
              if (!toEob) {
                var placed = false
                while (!placed && k <= se) {
                  val idx = base + k
                  if (co(idx) != 0) {
                    if (!correct(idx)) return -1
                  } else {
                    if (run == 0) {
                      if (newVal != 0) co(idx) = newVal
                      placed = true
                    } else run -= 1
                  }
                  k += 1
                }
                if (!placed && newVal != 0) return -1 // band overrun
              }
            }
          }
          if (eobrun > 0) {
            while (k <= se) {
              val idx = base + k
              if (co(idx) != 0 && !correct(idx)) return -1
              k += 1
            }
            eobrun -= 1
          }
        }
      }
      rstCount += 1
      m += 1
    }
    r.pos
  }

  /** Decode a baseline OR progressive 1-component / 4:4:4 3-component
    * JPEG to (width, height, planes) — planes.length = nComp, each w·h
    * component samples (Y, or Y/Cb/Cr before color conversion) — or
    * null. Baseline decodes its single scan streaming (no coefficient
    * store); progressive (SOF2) accumulates every scan's spectral
    * band into a per-component coefficient store and renders at EOI.
    * Package-private so the spec can compare per-pixel against an
    * independent decoder; the public stats faces wrap it. */
  private[functions] def decodePlanes(b: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    val quant = Array.ofDim[Int](4, 64)
    val seenQ = new Array[Boolean](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var w = 0; var h = 0
    var restartInterval = 0
    var nComp = 0
    val compId = new Array[Int](3)
    val qSel = new Array[Int](3)
    val dcSel = new Array[Int](3)
    val acSel = new Array[Int](3)
    val sampH = new Array[Int](3)
    val sampV = new Array[Int](3)
    // sampling geometry, filled at SOF (A.1.1): native component dims
    // compW×compH = ceil(w·Hi/Hmax)×ceil(h·Vi/Vmax); bwNat/bhNat =
    // the native block grid; bwPad/bhPad = the MCU-padded block grid
    // (mcusX·Hi × mcusY·Vi) that interleaved scans walk
    var hMax = 1; var vMax = 1
    var mcusX = 0; var mcusY = 0
    val compW = new Array[Int](3); val compH = new Array[Int](3)
    val bwPad = new Array[Int](3); val bhPad = new Array[Int](3)
    val bwNat = new Array[Int](3); val bhNat = new Array[Int](3)
    var progressive = false
    var coefs: Array[Array[Int]] = null // progressive spectral store
    var sawEoi = false
    var i = 2
    var scanAt = -1
    while (scanAt < 0 && !sawEoi) {
      if (i + 2 > b.length) return null
      if ((b(i) & 0xff) != 0xff) return null
      val m = b(i + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
      else if (m == 0xd9) {
        // EOI: the progressive end-of-stream render point; premature
        // anywhere else
        if (!progressive || coefs == null) return null
        sawEoi = true
      } else {
        if (i + 4 > b.length) return null
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val p0 = i + 4
        var nextI = i + 2 + len
        m match {
          case 0xdb => // DQT: one or more tables
            var p = p0
            while (p < i + 2 + len) {
              if (p >= b.length) return null
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (pq != 0 || tq > 3) return null // 8-bit tables only
              if (p + 65 > i + 2 + len) return null
              var k = 0
              while (k < 64) { quant(tq)(k) = b(p + 1 + k) & 0xff; k += 1 }
              seenQ(tq) = true
              p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = p0
            while (p < i + 2 + len) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (tc > 1 || th > 3) return null
              if (p + 17 > i + 2 + len) return null
              val bits = Array.tabulate(16)(j => b(p + 1 + j) & 0xff)
              val n = bits.sum
              if (n == 0 || n > 256 || p + 17 + n > i + 2 + len) return null
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
              val t = new Huff(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + n
            }
          case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
            if (nComp != 0) return null // second frame header
            progressive = m == 0xc2
            if (len < 11) return null
            if ((b(p0) & 0xff) != 8) return null // 8-bit precision
            h = u16(b, p0 + 1); w = u16(b, p0 + 3)
            nComp = b(p0 + 5) & 0xff
            if (nComp != 1 && nComp != 3) return null // gray or 3-comp color
            if (len != 8 + 3 * nComp) return null
            var c = 0
            var mcuBlocks = 0
            while (c < nComp) {
              compId(c) = b(p0 + 6 + 3 * c) & 0xff
              val sv = b(p0 + 7 + 3 * c) & 0xff
              // T.81 A.1.1: Hi, Vi ∈ [1,4]; for a single-component
              // frame Hi = Hmax by definition, so the declared factor
              // is irrelevant to dims/MCU shape — normalize to 1×1
              // (encoders write 0x11 or 0x22 for gray interchangeably)
              sampH(c) = if (nComp == 1) 1 else sv >> 4
              sampV(c) = if (nComp == 1) 1 else sv & 0x0f
              if (sampH(c) < 1 || sampH(c) > 4 ||
                  sampV(c) < 1 || sampV(c) > 4) return null
              mcuBlocks += sampH(c) * sampV(c)
              qSel(c) = b(p0 + 8 + 3 * c) & 0xff
              if (qSel(c) > 3) return null
              c += 1
            }
            if (mcuBlocks > 10) return null // T.81 B.2.3 MCU bound
            hMax = 1; vMax = 1
            c = 0
            while (c < nComp) {
              if (sampH(c) > hMax) hMax = sampH(c)
              if (sampV(c) > vMax) vMax = sampV(c)
              c += 1
            }
            if (w > 0 && h > 0) {
              mcusX = (w + 8 * hMax - 1) / (8 * hMax)
              mcusY = (h + 8 * vMax - 1) / (8 * vMax)
              c = 0
              while (c < nComp) {
                compW(c) = (w * sampH(c) + hMax - 1) / hMax
                compH(c) = (h * sampV(c) + vMax - 1) / vMax
                bwNat(c) = (compW(c) + 7) / 8
                bhNat(c) = (compH(c) + 7) / 8
                bwPad(c) = mcusX * sampH(c)
                bhPad(c) = mcusY * sampV(c)
                c += 1
              }
            }
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return null // non-baseline/progressive frame types
          case 0xdd => // DRI
            if (len != 4) return null
            restartInterval = u16(b, p0)
          case 0xda if progressive => // one progressive scan
            if (w <= 0 || h <= 0 || nComp == 0) return null
            if (coefs == null) {
              // MCU-padded spectral stores, bounded in total
              var tot = 0L
              var c2 = 0
              while (c2 < nComp) {
                tot += bwPad(c2).toLong * bhPad(c2) * 64; c2 += 1
              }
              if (tot > (1L << 25) || w.toLong * h * nComp > (1L << 24))
                return null
              coefs = Array.tabulate(nComp)(c2 =>
                new Array[Int](bwPad(c2) * bhPad(c2) * 64))
            }
            val after = progressiveScan(b, i, len, nComp, compId,
              sampH, sampV, mcusX, mcusY, bwPad, bwNat, bhNat,
              dcTables, acTables, restartInterval, coefs)
            if (after < 0) return null
            nextI = after
          case 0xda => // SOS (baseline: the single sequential scan)
            if (nComp == 0) return null // SOS before SOF
            if (len != 6 + 2 * nComp) return null
            if ((b(p0) & 0xff) != nComp) return null // full interleave
            // scan components must follow frame order (T.81 B.2.3)
            var c = 0
            while (c < nComp) {
              if ((b(p0 + 1 + 2 * c) & 0xff) != compId(c)) return null
              dcSel(c) = (b(p0 + 2 + 2 * c) & 0xff) >> 4
              acSel(c) = b(p0 + 2 + 2 * c) & 0x0f
              if (dcSel(c) > 3 || acSel(c) > 3) return null
              c += 1
            }
            val ss = b(p0 + 1 + 2 * nComp) & 0xff
            val se = b(p0 + 2 + 2 * nComp) & 0xff
            if (ss != 0 || se != 63) return null
            scanAt = i + 2 + len
          case _ => // APPn/COM/etc: skip
        }
        i = nextI
      }
    }
    if (w <= 0 || h <= 0) return null
    // native-resolution planes (compW×compH per component) are filled
    // by either path, then box-upsampled to w×h (the pinned rule)
    def upsample(native: Array[Array[Int]]): Array[Array[Int]] =
      Array.tabulate(nComp) { c =>
        if (compW(c) == w && compH(c) == h) native(c)
        else {
          val out = new Array[Int](w * h)
          val cw = compW(c)
          val src = native(c)
          var y = 0
          while (y < h) {
            val rowOff = (y * sampV(c) / vMax) * cw
            val dstOff = y * w
            var x = 0
            while (x < w) {
              out(dstOff + x) = src(rowOff + x * sampH(c) / hMax)
              x += 1
            }
            y += 1
          }
          out
        }
      }
    if (progressive) {
      var c = 0
      while (c < nComp) {
        if (!seenQ(qSel(c))) return null
        c += 1
      }
      val native = Array.tabulate(nComp)(c2 => new Array[Int](compW(c2) * compH(c2)))
      val coefD = new Array[Double](64)
      val tmp = new Array[Double](64)
      c = 0
      while (c < nComp) {
        val q = quant(qSel(c))
        val co = coefs(c)
        val px = native(c)
        // render only the native block grid; padded blocks beyond it
        // hold interleaved-scan data that maps to no visible pixel
        var by = 0
        while (by < bhNat(c)) {
          var bx = 0
          while (bx < bwNat(c)) {
            val base = (by * bwPad(c) + bx) * 64
            var k = 0
            while (k < 64) {
              coefD(zigzag(k)) = co(base + k).toDouble * q(k)
              k += 1
            }
            idctToPlane(coefD, tmp, px, compW(c), compH(c), bx, by)
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      return (w, h, upsample(native))
    }
    var c = 0
    while (c < nComp) {
      if (!seenQ(qSel(c))) return null
      if (dcTables(dcSel(c)) == null || acTables(acSel(c)) == null) return null
      c += 1
    }
    if (w.toLong * h * nComp > (1L << 26)) return null
    val native = Array.tabulate(nComp)(c2 => new Array[Int](compW(c2) * compH(c2)))
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    val r = new BitReader(b, scanAt)
    val pred = new Array[Int](nComp)
    var rstCount = 0
    var rstN = 0
    // the baseline interleaved scan: MCUs row-major, components in
    // frame order, Hi×Vi blocks each, raster order within the MCU
    // (T.81 A.2.3); edge MCUs still carry full block complements,
    // the IDCT clips to the native plane
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          if (!r.restart(rstN)) return null
          rstN = (rstN + 1) & 7
          rstCount = 0
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < nComp) {
          val q = quant(qSel(ci))
          var v = 0
          while (v < sampV(ci)) {
            var hh = 0
            while (hh < sampH(ci)) {
              java.util.Arrays.fill(coef, 0.0)
              val s = r.decode(dcTables(dcSel(ci)))
              if (r.corrupt || s > 11) return null
              val diff = extend(r.receive(s), s)
              if (r.corrupt) return null
              pred(ci) += diff
              coef(0) = pred(ci).toDouble * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = r.decode(acTables(acSel(ci)))
                if (r.corrupt) return null
                val run = rs >> 4
                val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16 else eob = true // ZRL vs EOB
                } else {
                  k += run
                  if (k > 63) return null
                  coef(zigzag(k)) = extend(r.receive(size), size).toDouble * q(k)
                  if (r.corrupt) return null
                  k += 1
                }
              }
              idctToPlane(coef, tmp, native(ci), compW(ci), compH(ci),
                mx * sampH(ci) + hh, my * sampV(ci) + v)
              hh += 1
            }
            v += 1
          }
          ci += 1
        }
        rstCount += 1
        mx += 1
      }
      my += 1
    }
    (w, h, upsample(native))
  }

  /** Decode a GRAYSCALE JPEG (baseline or progressive) to (width,
    * height, pixels), or null (color inputs included — the historical
    * gray-slice face). */
  private[functions] def decodeGray(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = decodePlanes(b)
    if (d == null || d._3.length != 1) null else (d._1, d._2, d._3(0))
  }

  /** The PINNED fixed-point JFIF YCbCr→RGB (see class doc): 16-bit
    * scaled constants, +2¹⁵ rounding bias, shift, clamp. Exposed so the
    * DuckDB oracle and the spec state the identical arithmetic. */
  private[functions] def ycbcrToRgb(yy: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    val r = (yy << 16) + 91881 * (cr - 128) + 32768
    val g = (yy << 16) - 22554 * (cb - 128) - 46802 * (cr - 128) + 32768
    val bb = (yy << 16) + 116130 * (cb - 128) + 32768
    (clamp(r >> 16), clamp(g >> 16), clamp(bb >> 16))
  }

  /** [n_px, sum, sum, sum] over a grayscale JPEG, baseline OR
    * progressive (gray replicates to all three channels — the
    * gif/bmp/png contract), or null for color/malformed input. */
  def jpegPixelStats(b: Array[Byte]): Array[Long] = {
    val d = decodeGray(b)
    if (d == null) return null
    val (w, h, px) = d
    var s = 0L
    var i = 0
    while (i < px.length) { s += px(i); i += 1 }
    Array(w.toLong * h, s, s, s)
  }

  /** [n_px, sum_r, sum_g, sum_b] over a baseline or progressive JPEG:
    * grayscale replicates to all three channels; 3-component color at
    * any T.81-legal sampling (4:4:4 / 4:2:2 / 4:2:0 / …) box-upsamples
    * chroma and converts through the pinned fixed-point JFIF matrix.
    * Malformed input → null. */
  def jpegColorStats(b: Array[Byte]): Array[Long] = {
    val d = decodePlanes(b)
    if (d == null) return null
    val (w, h, planes) = d
    if (planes.length == 1) {
      var s = 0L
      var i = 0
      val px = planes(0)
      while (i < px.length) { s += px(i); i += 1 }
      return Array(w.toLong * h, s, s, s)
    }
    val py = planes(0); val pcb = planes(1); val pcr = planes(2)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < py.length) {
      val (r, g, bl) = ycbcrToRgb(py(i), pcb(i), pcr(i))
      sr += r; sg += g; sb += bl
      i += 1
    }
    Array(w.toLong * h, sr, sg, sb)
  }
}
