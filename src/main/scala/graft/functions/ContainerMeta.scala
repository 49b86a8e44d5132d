package graft.functions

/** Container-metadata tier 2: WebP, TIFF and Ogg — the remaining
  * image/audio wrappers a web corpus actually contains (WebP is the
  * modern web's image default; TIFF dominates scans/archives; Ogg
  * carries Vorbis/Opus). META ONLY, same contract as mp3Meta/mp4Meta:
  * pure byte arithmetic, total (null on anything malformed), the
  * payload never leaves its partition; pixel/sample DECODE of these
  * codecs is the documented stub boundary (VP8/VP8L entropy coding,
  * LZW/packbits TIFF payloads, CELT/MDCT audio). Cited layouts: RIFF
  * WebP container spec, TIFF 6.0 baseline, RFC 3533 (Ogg), RFC 7845
  * (Opus-in-Ogg), Vorbis I spec.
  */
object ContainerMeta {

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def tag4(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
      b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

  /** WebP: [width, height, lossless(0/1), extended(0/1)] from the
    * first VP8 (lossy key frame), VP8L (lossless signature) or VP8X
    * (extended canvas) chunk. */
  def webpMeta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 20) return null
    if (!tag4(b, 0, "RIFF") || !tag4(b, 8, "WEBP")) return null
    val riffLen = u32le(b, 4)
    val end = math.min(b.length.toLong, 8 + riffLen).toInt
    var p = 12
    while (p + 8 <= end) {
      val len = u32le(b, p + 4)
      val d = p + 8
      if (d + len > end) return null
      if (tag4(b, p, "VP8 ")) {
        // key frame: 3-byte frame tag, start code 9D 01 2A, 14-bit dims
        if (len < 10 || (b(d) & 1) != 0) return null // inter frame first = invalid
        if ((b(d + 3) & 0xFF) != 0x9D || (b(d + 4) & 0xFF) != 0x01 ||
          (b(d + 5) & 0xFF) != 0x2A) return null
        val w = u16le(b, d + 6) & 0x3FFF
        val h = u16le(b, d + 8) & 0x3FFF
        return Array(w, h, 0L, 0L)
      } else if (tag4(b, p, "VP8L")) {
        if (len < 5 || (b(d) & 0xFF) != 0x2F) return null
        val bits = u32le(b, d + 1)
        val w = (bits & 0x3FFF) + 1
        val h = ((bits >> 14) & 0x3FFF) + 1
        return Array(w, h, 1L, 0L)
      } else if (tag4(b, p, "VP8X")) {
        if (len < 10) return null
        val w = ((b(d + 4) & 0xFFL) | ((b(d + 5) & 0xFFL) << 8) |
          ((b(d + 6) & 0xFFL) << 16)) + 1
        val h = ((b(d + 7) & 0xFFL) | ((b(d + 8) & 0xFFL) << 8) |
          ((b(d + 9) & 0xFFL) << 16)) + 1
        return Array(w, h, 0L, 1L)
      }
      p = d + len.toInt + (len.toInt & 1) // chunks pad to even
    }
    null
  }

  /** TIFF 6.0: [width, height, samples_per_pixel, compression] from
    * IFD0 (both byte orders; SHORT and LONG value types). */
  def tiffMeta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 8) return null
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return null
    def rd16(i: Int) = if (le) u16le(b, i) else u16be(b, i)
    def rd32(i: Int) = if (le) u32le(b, i) else u32be(b, i)
    if (rd16(2) != 42) return null
    val ifd = rd32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = rd16(ifd.toInt)
    if (n == 0 || n > 4096) return null
    var width = -1L; var height = -1L
    var samples = 1L; var compression = 1L
    var k = 0
    while (k < n) {
      val e = ifd.toInt + 2 + k * 12
      if (e + 12 > b.length) return null
      val tag = rd16(e)
      val typ = rd16(e + 2)
      val count = rd32(e + 4)
      // inline SHORT/LONG single values only (the baseline dims are)
      if (count == 1 && (typ == 3 || typ == 4)) {
        val v = if (typ == 4) rd32(e + 8) else rd16(e + 8).toLong
        tag match {
          case 256 => width = v
          case 257 => height = v
          case 277 => samples = v
          case 259 => compression = v
          case _ =>
        }
      }
      k += 1
    }
    if (width < 0 || height < 0) return null
    Array(width, height, samples, compression)
  }

  /** JPEG EXIF metadata — the APP1 face of the TIFF IFD walker above:
    * marker scan to the first APP1 whose payload is `Exif\0\0`, then a
    * TIFF walk (both byte orders) of IFD0 for Orientation (tag 274,
    * SHORT), Make (271), Model (272), DateTime (306) and the Exif
    * sub-IFD pointer (34665) whose DateTimeOriginal (36867) is the
    * capture timestamp curation pipelines actually want. ASCII values
    * inline (count ≤ 4) or at TIFF-relative offsets, trailing NULs
    * stripped; every read bounds-checked against the APP1 payload.
    * Returns (orientation, make, model, datetime, datetime_original)
    * with absent fields null; the whole row is null when the input is
    * not a JPEG or carries no well-formed Exif APP1. Cited layouts:
    * JEITA CP-3451 (Exif 2.3) §4.5.4, TIFF 6.0 §2. */
  def exifMeta(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.unsafe.types.UTF8String
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    // marker scan: standalone markers have no length field
    var p = 2
    var t = -1 // TIFF structure start
    var tEnd = -1
    var guard = 0
    while (t < 0 && p + 4 <= b.length && (b(p) & 0xFF) == 0xFF &&
        guard < 4096) {
      guard += 1
      val m = b(p + 1) & 0xFF
      if (m == 0xFF) p += 1 // fill byte
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) p += 2
      else if (m == 0xD9 || m == 0xDA) p = b.length // EOI / entropy data
      else {
        val len = u16be(b, p + 2)
        if (len < 2 || p + 2 + len > b.length) return null
        if (m == 0xE1 && len >= 16 &&
          b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
          b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0) {
          t = p + 10
          tEnd = p + 2 + len
        }
        p += 2 + len
      }
    }
    if (t < 0 || t + 8 > tEnd) return null
    val le =
      if (b(t) == 'I' && b(t + 1) == 'I') true
      else if (b(t) == 'M' && b(t + 1) == 'M') false
      else return null
    def rd16(i: Int): Int =
      if (i < t || i + 2 > tEnd) -1
      else if (le) u16le(b, i) else u16be(b, i)
    def rd32(i: Int): Long =
      if (i < t || i + 4 > tEnd) -1L
      else if (le) u32le(b, i) else u32be(b, i)
    if (rd16(t + 2) != 42) return null
    var orientation: Integer = null
    var make: UTF8String = null
    var model: UTF8String = null
    var datetime: UTF8String = null
    var dtOriginal: UTF8String = null
    def ascii(e: Int, count: Long): UTF8String = {
      if (count <= 0 || count > 4096) return null
      val at =
        if (count <= 4) e + 8
        else {
          val off = rd32(e + 8)
          if (off < 0) return null
          (t + off).toInt
        }
      if (at < t || at + count > tEnd) return null
      var end = at + count.toInt
      while (end > at && b(end - 1) == 0) end -= 1
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, at, end))
    }
    def walkIfd(off: Long, isExifIfd: Boolean): Unit = {
      if (off < 0) return
      val ifd = t + off
      if (ifd < t || ifd + 2 > tEnd) return
      val n = rd16(ifd.toInt)
      if (n <= 0 || n > 4096) return
      var k = 0
      while (k < n) {
        val e = ifd.toInt + 2 + k * 12
        if (e + 12 > tEnd) return
        val tag = rd16(e)
        val typ = rd16(e + 2)
        val count = rd32(e + 4)
        (tag, isExifIfd) match {
          case (274, false) if typ == 3 && count == 1 =>
            orientation = Integer.valueOf(rd16(e + 8))
          case (271, false) if typ == 2 => make = ascii(e, count)
          case (272, false) if typ == 2 => model = ascii(e, count)
          case (306, false) if typ == 2 => datetime = ascii(e, count)
          case (34665, false) if typ == 4 && count == 1 =>
            walkIfd(rd32(e + 8), isExifIfd = true) // one level, no cycle
          case (36867, true) if typ == 2 => dtOriginal = ascii(e, count)
          case _ =>
        }
        k += 1
      }
    }
    walkIfd(rd32(t + 4), isExifIfd = false)
    if (orientation == null && make == null && model == null &&
      datetime == null && dtOriginal == null) return null
    org.apache.spark.sql.catalyst.InternalRow(
      orientation, make, model, datetime, dtOriginal)
  }

  // Ogg page CRC: poly 0x04C11DB7, MSB-first, init 0, no final xor.
  private val oggCrcTable: Array[Int] = Array.tabulate(256) { n =>
    var c = n << 24
    var k = 0
    while (k < 8) {
      c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
      k += 1
    }
    c
  }

  /** Ogg (RFC 3533): [codec (1=vorbis, 2=opus), channels, rate,
    * last_granule] — id header from the first BOS page (Vorbis
    * `\1vorbis` per Vorbis I §4.2.2, Opus `OpusHead` per RFC 7845
    * §5.1), duration granule from the LAST page of the same serial
    * (Opus granules are 48 kHz by definition; Vorbis granules are in
    * `rate` samples). Every page's CRC-32 is VERIFIED (field zeroed
    * for the computation, per spec). */
  def oggMeta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 28) return null
    var p = 0
    var codec = 0L; var channels = -1L; var rate = -1L
    var serial = 0L; var haveSerial = false
    var lastGranule = 0L
    while (p + 27 <= b.length) {
      if (!tag4(b, p, "OggS") || b(p + 4) != 0) return null
      val granule = {
        var g = 0L; var i = 7
        while (i >= 0) { g = (g << 8) | (b(p + 6 + i) & 0xFFL); i -= 1 }
        g
      }
      val pageSerial = u32le(b, p + 14)
      val wantCrc = u32le(b, p + 22)
      val nSegs = b(p + 26) & 0xFF
      if (p + 27 + nSegs > b.length) return null
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += b(p + 27 + s) & 0xFF; s += 1 }
      val pageLen = 27 + nSegs + bodyLen
      if (p + pageLen > b.length) return null
      // CRC over the page with the CRC field zeroed
      var c = 0
      var i = p
      while (i < p + pageLen) {
        val x = if (i >= p + 22 && i < p + 26) 0 else b(i) & 0xFF
        c = (c << 8) ^ oggCrcTable(((c >>> 24) ^ x) & 0xFF)
        i += 1
      }
      if ((c.toLong & 0xFFFFFFFFL) != wantCrc) return null
      val body = p + 27 + nSegs
      val isBos = (b(p + 5) & 0x02) != 0
      if (isBos && !haveSerial && bodyLen >= 16) {
        if (b(body) == 0x01 && b(body + 1) == 'v' && b(body + 2) == 'o' &&
          b(body + 3) == 'r' && b(body + 4) == 'b' && b(body + 5) == 'i' &&
          b(body + 6) == 's' && bodyLen >= 16) {
          codec = 1L
          channels = b(body + 11) & 0xFFL
          rate = u32le(b, body + 12)
          serial = pageSerial; haveSerial = true
        } else if (tag4(b, body, "Opus") && bodyLen >= 19 &&
          b(body + 4) == 'H' && b(body + 5) == 'e' && b(body + 6) == 'a' &&
          b(body + 7) == 'd') {
          codec = 2L
          channels = b(body + 9) & 0xFFL
          rate = 48000L // Opus granules are 48 kHz by definition
          serial = pageSerial; haveSerial = true
        }
      }
      if (haveSerial && pageSerial == serial && granule > 0)
        lastGranule = math.max(lastGranule, granule)
      p += pageLen
    }
    if (!haveSerial || codec == 0L) return null
    Array(codec, channels, rate, lastGranule)
  }
}
