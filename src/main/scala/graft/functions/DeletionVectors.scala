package graft.functions

/** Delta deletion-vector decoding, from the PUBLIC Delta protocol and
  * the public RoaringFormatSpec — no delta or roaring library:
  *
  *  - 32-bit roaring bitmaps in the interoperable "portable"
  *    serialization (cookies 12346/12347, array / bitmap / run
  *    containers) — cross-verified in RoaringSpec against the REAL
  *    org.roaringbitmap implementation Spark bundles;
  *  - the 64-bit RoaringBitmapArray "portable" wrapper Delta stores in
  *    DV files (magic 1681511377, little-endian bitmap count, dense
  *    32-bit bitmaps in key order);
  *  - the DV FILE framing (1-byte format version, then per-DV
  *    [4-byte BE length][data][4-byte BE CRC-32 of data]);
  *  - Base85 with the RFC 1924 alphabet (4-byte big-endian blocks) for
  *    `u`-storage UUID file names and `i`-storage inline bitmaps.
  *
  * Everything is LOUD on mismatch (wrong magic, cookie, bounds, CRC,
  * cardinality): a reader must never silently mis-apply row-level
  * deletes. Used by `operators/DeltaLite`.
  *
  * Reference scope: beyond-reference §2.10.
  */
private[graft] object DeletionVectors {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"deletion vector: $msg")

  /** Hard cap on decoded positions (a DV names row ordinals of ONE
    * file; anything past this is hostile or out of scope). */
  val MaxPositions: Long = 1L << 26

  // ---- Base85, RFC 1924 alphabet, 4-byte big-endian blocks ----

  private val B85 =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
  private val B85Rev: Array[Int] = {
    val r = Array.fill(128)(-1)
    B85.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  def base85Decode(s: String): Array[Byte] = {
    if (s.length % 5 != 0) fail(s"base85 length ${s.length} not a 5-multiple")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var k = 0
      while (k < 5) {
        val c = s.charAt(i + k)
        val d = if (c < 128) B85Rev(c.toInt) else -1
        if (d < 0) fail(s"invalid base85 char '$c'")
        v = v * 85 + d
        k += 1
      }
      if (v > 0xffffffffL) fail("base85 block overflows 32 bits")
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  /** The `u`-storage 20-char base85 UUID → canonical string. */
  def uuidFromBase85(s: String): String = {
    if (s.length != 20) fail(s"uuid base85 length ${s.length} != 20")
    val b = base85Decode(s)
    val bb = java.nio.ByteBuffer.wrap(b)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  // ---- 32-bit roaring, portable serialization ----

  private def leU16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def leInt(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private val SerialCookie = 12347 // with run containers
  private val SerialCookieNoRun = 12346
  private val NoOffsetThreshold = 4

  /** Decodes one 32-bit portable bitmap at `pos0` into `out` (each
    * value OR'd with `high`, a key<<32 prefix); returns the position
    * just past the bitmap. */
  def decode32(b: Array[Byte], pos0: Int, high: Long,
               out: scala.collection.mutable.ArrayBuffer[Long]): Int = {
    var pos = pos0
    def need(n: Int): Unit =
      if (pos + n > b.length) fail("truncated roaring bitmap")
    need(4)
    val cookie = leInt(b, pos); pos += 4
    var size = 0
    var runFlags: Array[Byte] = null
    if ((cookie & 0xffff) == SerialCookie) {
      size = (cookie >>> 16) + 1
      val flagBytes = (size + 7) / 8
      need(flagBytes)
      runFlags = java.util.Arrays.copyOfRange(b, pos, pos + flagBytes)
      pos += flagBytes
    } else if (cookie == SerialCookieNoRun) {
      need(4)
      size = leInt(b, pos); pos += 4
    } else fail(f"bad roaring cookie 0x$cookie%08x")
    if (size < 0 || size > 65536) fail(s"bad container count $size")
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    need(size * 4)
    var i = 0
    while (i < size) {
      keys(i) = leU16(b, pos); cards(i) = leU16(b, pos + 2) + 1
      pos += 4
      i += 1
    }
    // offset header: present without runs, or with ≥4 containers
    if (runFlags == null || size >= NoOffsetThreshold) {
      need(size * 4)
      pos += size * 4 // sequential read — offsets unused but validated
    }
    i = 0
    while (i < size) {
      if (out.length + cards(i) > MaxPositions) fail("position cap exceeded")
      val base = high | (keys(i).toLong << 16)
      val isRun = runFlags != null && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
      if (isRun) {
        need(2)
        val nRuns = leU16(b, pos); pos += 2
        need(nRuns * 4)
        var r = 0
        var total = 0L
        while (r < nRuns) {
          val start = leU16(b, pos); val len = leU16(b, pos + 2) + 1
          pos += 4
          total += len
          if (total > MaxPositions) fail("run cardinality bomb")
          var v = start
          val end = start + len
          if (end > 65536) fail("run past container range")
          while (v < end) { out += (base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) { // array container
        need(cards(i) * 2)
        var k = 0
        while (k < cards(i)) {
          out += (base | leU16(b, pos)); pos += 2; k += 1
        }
      } else { // bitmap container: 1024 × 8-byte words
        need(8192)
        var w = 0
        while (w < 1024) {
          var word = 0L
          var k = 7
          while (k >= 0) { word = (word << 8) | (b(pos + 8 * w + k) & 0xffL); k -= 1 }
          while (word != 0) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            out += (base | (w * 64 + t))
            word &= word - 1
          }
          w += 1
        }
        pos += 8192
      }
      i += 1
    }
    pos
  }

  /** Delta RoaringBitmapArray, "portable" format: magic 1681511377
    * (4 B LE), 8 B LE count, then that many 32-bit portable bitmaps in
    * dense key order. Returns the sorted 64-bit positions. */
  val PortableMagic = 1681511377

  def decodeBitmapArray(b: Array[Byte]): Array[Long] = {
    if (b.length < 12) fail("bitmap array too short")
    if (leInt(b, 0) != PortableMagic)
      fail(f"bad RoaringBitmapArray magic 0x${leInt(b, 0)}%08x " +
        "(only the portable format is readable)")
    val n = (leInt(b, 4).toLong & 0xffffffffL) |
      ((leInt(b, 8).toLong & 0xffffffffL) << 32)
    if (n < 0 || n > (1 << 16)) fail(s"bad bitmap count $n")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 12
    var k = 0L
    while (k < n) {
      pos = decode32(b, pos, k << 32, out)
      k += 1
    }
    if (pos != b.length) fail("trailing bytes after bitmap array")
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  /** One DV out of a DV FILE's bytes: 1-byte format version at offset
    * 0, then at `offset`: [4 B BE length][data][4 B BE CRC-32]. */
  def decodeFromFile(file: Array[Byte], offset: Int,
                     sizeInBytes: Int): Array[Long] = {
    if (file.length < 1 || file(0) != 1)
      fail(s"unsupported DV file format version ${if (file.isEmpty) -1 else file(0)}")
    if (offset < 1 || offset + 4 > file.length) fail("DV offset out of range")
    val len = ((file(offset) & 0xff) << 24) | ((file(offset + 1) & 0xff) << 16) |
      ((file(offset + 2) & 0xff) << 8) | (file(offset + 3) & 0xff)
    if (len != sizeInBytes)
      fail(s"DV length $len != descriptor sizeInBytes $sizeInBytes")
    val start = offset + 4
    if (len < 0 || start + len + 4 > file.length) fail("DV data out of range")
    val data = java.util.Arrays.copyOfRange(file, start, start + len)
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val want = ((file(start + len) & 0xffL) << 24) |
      ((file(start + len + 1) & 0xffL) << 16) |
      ((file(start + len + 2) & 0xffL) << 8) |
      (file(start + len + 3) & 0xffL)
    if (crc.getValue != want) fail("DV checksum mismatch")
    decodeBitmapArray(data)
  }
}
