package graft.functions

/** ORC FILE WRITER — closes the round-17 format-tier asymmetry
  * (parquet and Avro write both directions; ORC was read-only).
  * Emits plain-stripe ORC per the public spec that BOTH consumers
  * accept: Spark's native ORC reader (orc-core) and our own
  * [[OrcValues]] stripe decoder:
  *
  *  - layout: 3-byte "ORC" header, stripes (no index streams,
  *    `rowIndexStride` 0), empty Metadata section, protobuf Footer
  *    (headerLength / contentLength / StripeInformation / Type tree /
  *    numberOfRows / count-only ColumnStatistics), uncompressed
  *    PostScript, 1-byte PostScript length;
  *  - column shapes (the flat struct-of-primitives scope OrcValues
  *    reads): LONG and DATE under EITHER integer-RLE generation —
  *    v1 (runs for ≥3-value constant stretches, literal groups
  *    otherwise — the Hive-0.11 DIRECT lineage) or v2 (DIRECT_V2,
  *    DIRECT sub-encoding: ≤512-value runs at the closest fixed
  *    width, MSB-first) — DOUBLE as IEEE 754 LE DATA, STRING as
  *    DIRECT/DIRECT_V2 (UTF-8 DATA + RLE LENGTH);
  *  - nulls: PRESENT boolean byte-RLE streams (MSB-first bit packing,
  *    literal control bytes), omitted for null-free columns;
  *  - compression NONE (raw streams) or ZLIB — real raw-deflate
  *    chunks (java.util.zip.Deflater, nowrap) inside ORC's 3-byte
  *    `length << 1 | isOriginal` framing, falling back to original
  *    chunks when deflate does not shrink;
  *  - protobuf encoding written directly (varint / length-delimited
  *    tags — the mirror of [[ProtoWire.fieldsRaw]]).
  *
  * The writer is a byte-level fixture/export function like
  * [[AvroWrite.genericFileBytes]] — LOUD on unsupported shapes, never
  * a silent miswrite.
  *
  * Reference scope: beyond-reference §2.10 (the reference has no
  * columnar storage at all).
  */
object OrcWrite {

  private final val ChunkSize = 1 << 18 // 256 KiB, well under the 23-bit cap

  // ---- protobuf writing (mirror of ProtoWire's reader) ----

  private def vint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }
  private def pbVarint(out: java.io.ByteArrayOutputStream, fieldNo: Int,
                       v: Long): Unit = {
    vint(out, (fieldNo.toLong << 3) | 0L)
    vint(out, v)
  }
  private def pbBytes(out: java.io.ByteArrayOutputStream, fieldNo: Int,
                      b: Array[Byte]): Unit = {
    vint(out, (fieldNo.toLong << 3) | 2L)
    vint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }
  private def pbString(out: java.io.ByteArrayOutputStream, fieldNo: Int,
                       s: String): Unit =
    pbBytes(out, fieldNo, s.getBytes("UTF-8"))
  private def msg(build: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    build(out)
    out.toByteArray
  }

  // ---- stream encoders ----

  /** Integer RLE v1: runs of h+3 IDENTICAL values (delta 0) when a
    * stretch of ≥3 repeats, literal groups of ≤128 varints otherwise.
    * Signed streams zigzag. */
  private def rleV1Bytes(vals: Seq[Long], signed: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vals.length)
    def varint(v0: Long): Unit = {
      val z = if (signed) (v0 << 1) ^ (v0 >> 63) else v0
      vint(out, z)
    }
    val n = vals.length
    var i = 0
    val lit = new scala.collection.mutable.ArrayBuffer[Long](128)
    def flushLits(): Unit = {
      var k = 0
      while (k < lit.length) {
        val take = math.min(128, lit.length - k)
        out.write(-take & 0xff) // negative header: `take` literals
        var j = 0
        while (j < take) { varint(lit(k + j)); j += 1 }
        k += take
      }
      lit.clear()
    }
    while (i < n) {
      var runEnd = i + 1
      while (runEnd < n && vals(runEnd) == vals(i)) runEnd += 1
      val run = runEnd - i
      if (run >= 3) {
        flushLits()
        var k = i
        while (k < runEnd) {
          val take = math.min(130, runEnd - k)
          if (take < 3) { // tail shorter than a run: literals
            var j = 0
            while (j < take) { lit += vals(k + j); j += 1 }
          } else {
            out.write(take - 3) // run header
            out.write(0) // delta 0
            varint(vals(i))
          }
          k += take
        }
        i = runEnd
      } else {
        var j = i
        while (j < runEnd) { lit += vals(j); j += 1 }
        i = runEnd
      }
    }
    flushLits()
    out.toByteArray
  }

  /** ORC FixedBitSizes: smallest table width holding `n` bits, and its
    * 5-bit code (the inverse of the reader's decodeWidth). */
  private def closestWidthV2(n: Int): Int =
    if (n <= 1) 1
    else if (n <= 24) n
    else if (n <= 26) 26
    else if (n <= 28) 28
    else if (n <= 30) 30
    else if (n <= 32) 32
    else if (n <= 40) 40
    else if (n <= 48) 48
    else if (n <= 56) 56
    else 64
  private def widthCodeOf(w: Int): Int =
    if (w <= 24) w - 1
    else w match {
      case 26 => 24; case 28 => 25; case 30 => 26; case 32 => 27
      case 40 => 28; case 48 => 29; case 56 => 30; case _ => 31
    }

  /** Integer RLE v2, DIRECT sub-encoding only (valid for any values):
    * runs of ≤512 values at the chunk's closest fixed width, MSB-first
    * bit packing, byte-aligned per run. Signed streams zigzag. */
  private def rleV2Bytes(vals: Seq[Long], signed: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vals.length)
    var i = 0
    while (i < vals.length) {
      val take = math.min(512, vals.length - i)
      val enc = new Array[Long](take)
      var maxBits = 1
      var j = 0
      while (j < take) {
        val v = vals(i + j)
        val z = if (signed) (v << 1) ^ (v >> 63) else v
        enc(j) = z
        val bits = 64 - java.lang.Long.numberOfLeadingZeros(z)
        if (bits > maxBits) maxBits = bits
        j += 1
      }
      val width = closestWidthV2(maxBits)
      out.write(0x40 | (widthCodeOf(width) << 1) | ((take - 1) >> 8))
      out.write((take - 1) & 0xff)
      var cur = 0
      var curBits = 0
      j = 0
      while (j < take) {
        var left = width
        while (left > 0) {
          val t = math.min(8 - curBits, left)
          val piece = ((enc(j) >>> (left - t)) & ((1L << t) - 1)).toInt
          cur = (cur << t) | piece
          curBits += t
          left -= t
          if (curBits == 8) { out.write(cur); cur = 0; curBits = 0 }
        }
        j += 1
      }
      if (curBits > 0) out.write(cur << (8 - curBits))
      i += take
    }
    out.toByteArray
  }

  /** PRESENT stream: MSB-first bit packing wrapped in boolean byte-RLE
    * (literal control bytes: `256 - n` then n bytes). */
  private def presentBytes(present: Seq[Boolean]): Array[Byte] = {
    val nBytes = (present.length + 7) >> 3
    val packed = new Array[Byte](nBytes)
    var i = 0
    while (i < present.length) {
      if (present(i)) packed(i >> 3) = (packed(i >> 3) | (1 << (7 - (i & 7)))).toByte
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(nBytes + 8)
    var k = 0
    while (k < nBytes) {
      val take = math.min(128, nBytes - k)
      out.write(-take & 0xff)
      out.write(packed, k, take)
      k += take
    }
    out.toByteArray
  }

  /** ORC chunk framing: [3-byte LE `len << 1 | isOriginal`][chunk].
    * NONE returns the stream raw; ZLIB deflates each ≤256 KiB chunk
    * (original chunk kept when deflate does not shrink). */
  private def frame(b: Array[Byte], codecId: Int): Array[Byte] = {
    if (codecId == 0 || b.isEmpty) return b // zero-length streams stay bare
    val out = new java.io.ByteArrayOutputStream(b.length + 16)
    var pos = 0
    while (pos < b.length) {
      val take = math.min(ChunkSize, b.length - pos)
      val chunk = java.util.Arrays.copyOfRange(b, pos, pos + take)
      val defl = {
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(chunk)
        d.finish()
        val buf = new Array[Byte](chunk.length + 64)
        val m = d.deflate(buf)
        val done = d.finished()
        d.end()
        if (done && m < chunk.length) java.util.Arrays.copyOf(buf, m)
        else null
      }
      val (payload, original) =
        if (defl != null) (defl, 0) else (chunk, 1)
      val h = (payload.length << 1) | original
      out.write(h & 0xff); out.write((h >>> 8) & 0xff)
      out.write((h >>> 16) & 0xff)
      out.write(payload, 0, payload.length)
      pos += take
    }
    out.toByteArray
  }

  /** Column kinds this writer emits. */
  private def typeKind(c: Char): Int = c match {
    case 'l' => 4 // LONG
    case 'd' => 6 // DOUBLE
    case 's' => 7 // STRING
    case 'a' => 15 // DATE (values = epoch days as boxed Long)
    case 't' => 9 // TIMESTAMP (values = epoch MICROS ≥ 0 as boxed Long)
    case other => sys.error(s"orc write: unsupported column kind '$other'" +
      " (supported: l=long, d=double, s=string, a=date, t=timestamp)")
  }

  /** ORC's 2015-01-01T00:00:00Z timestamp base, in epoch seconds. */
  private val TsBaseSeconds = 1420070400L

  /** SECONDARY-stream nanos encoding: ≥2 trailing decimal zeros are
    * stripped, their count-1 rides in the bottom 3 bits. */
  private def encodeNanos(nanos: Long): Long = {
    require(nanos >= 0 && nanos <= 999999999L, s"bad nanos $nanos")
    if (nanos == 0) 0L
    else {
      var n = nanos
      var z = 0
      while (n % 10 == 0 && z < 8) { n /= 10; z += 1 }
      if (z >= 2) (n << 3) | (z - 1).toLong
      else nanos << 3
    }
  }

  /** Writes a flat struct-of-primitives ORC file: `cols` as
    * (name, kind) with kind `l`/`d`/`s`/`a`, `rows` row-major with
    * boxed Long / Double / String / Long-epoch-days values (null
    * allowed → PRESENT streams). `codec` "none" or "zlib";
    * `rle` picks the integer encoding generation: "v1" (Hive-0.11
    * DIRECT) or "v2" (DIRECT_V2, DIRECT-sub-encoding runs);
    * `stripeRows` bounds rows per stripe. */
  def fileBytes(cols: Seq[(String, Char)], rows: Seq[Seq[Any]],
                codec: String = "none",
                stripeRows: Int = 100000,
                rle: String = "v1"): Array[Byte] = {
    require(cols.nonEmpty, "orc write: no columns")
    require(stripeRows > 0, s"orc write: bad stripeRows $stripeRows")
    require(rle == "v1" || rle == "v2",
      s"orc write: unsupported rle generation '$rle'")
    val v2 = rle == "v2"
    def intStream(vals: Seq[Long], signed: Boolean): Array[Byte] =
      if (v2) rleV2Bytes(vals, signed) else rleV1Bytes(vals, signed)
    val codecId = codec match {
      case "none" => 0
      case "zlib" => 1
      case other => sys.error(s"orc write: unsupported codec '$other'")
    }
    cols.foreach { case (_, ck) => typeKind(ck) } // validate upfront
    rows.foreach(r => require(r.length == cols.length,
      s"orc write: row arity ${r.length} != ${cols.length} columns"))

    val out = new java.io.ByteArrayOutputStream(1 << 16)
    out.write("ORC".getBytes("UTF-8"))

    // ---- stripes ----
    final case class StripeInfo(offset: Long, dataLength: Long,
                                footerLength: Long, nRows: Int)
    val stripeInfos = rows.grouped(stripeRows).map { stripe =>
      val offset = out.size().toLong
      // per column: (physical stream payloads in write order)
      val streams = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, Array[Byte])] // (kind, column, framed bytes)
      cols.zipWithIndex.foreach { case ((_, ck), ci) =>
        val colId = ci + 1
        val vals = stripe.map(_(ci))
        val present = vals.map(_ != null)
        val nonNull = vals.filter(_ != null)
        if (present.contains(false))
          streams += ((0, colId, frame(presentBytes(present), codecId)))
        ck match {
          case 'l' | 'a' =>
            streams += ((1, colId, frame(intStream(
              nonNull.map(_.asInstanceOf[Number].longValue), signed = true),
              codecId)))
          case 't' =>
            // TIMESTAMP: DATA = seconds relative to 2015-01-01 (signed
            // RLE v2), SECONDARY = trailing-zero-packed nanos (unsigned
            // RLE v2). Readers only take the v2 generation here; the
            // pre-1970 truncating-division edge is out of scope — both
            // declined loudly.
            require(v2,
              "orc write: timestamp columns need rle=\"v2\" (readers " +
                "take DIRECT_V2 only)")
            val micros = nonNull.map(_.asInstanceOf[Number].longValue)
            micros.foreach(m => require(m >= 0,
              s"orc write: pre-1970 timestamp $m out of scope"))
            streams += ((1, colId, frame(rleV2Bytes(
              micros.map(m => m / 1000000L - TsBaseSeconds),
              signed = true), codecId)))
            streams += ((5, colId, frame(rleV2Bytes(
              micros.map(m => encodeNanos((m % 1000000L) * 1000L)),
              signed = false), codecId)))
          case 'd' =>
            val b = new java.io.ByteArrayOutputStream(nonNull.length * 8)
            nonNull.foreach { v =>
              val bits = java.lang.Double.doubleToLongBits(
                v.asInstanceOf[Number].doubleValue)
              var k = 0
              while (k < 8) { b.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
            }
            streams += ((1, colId, frame(b.toByteArray, codecId)))
          case 's' =>
            val data = new java.io.ByteArrayOutputStream(nonNull.length * 8)
            val lens = nonNull.map { v =>
              val b = v.toString.getBytes("UTF-8")
              data.write(b, 0, b.length)
              b.length.toLong
            }
            streams += ((1, colId, frame(data.toByteArray, codecId)))
            streams += ((2, colId, frame(intStream(lens, signed = false),
              codecId)))
          case _ => () // typeKind raised already
        }
      }
      streams.foreach { case (_, _, b) => out.write(b, 0, b.length) }
      val dataLength = out.size().toLong - offset
      val sf = msg { o =>
        streams.foreach { case (kind, colId, b) =>
          pbBytes(o, 1, msg { so =>
            pbVarint(so, 1, kind.toLong)
            pbVarint(so, 2, colId.toLong)
            pbVarint(so, 3, b.length.toLong)
          })
        }
        // one ColumnEncoding per type id, root first; integer and
        // string columns carry the RLE generation (DIRECT=0 ↔ v1,
        // DIRECT_V2=2), doubles are always DIRECT
        val encKinds = 0L +: cols.map { case (_, ck) =>
          if (v2 && ck != 'd') 2L else 0L }
        encKinds.foreach(k => pbBytes(o, 2, msg(eo => pbVarint(eo, 1, k))))
        // timestamps are written in UTC; say so (readers otherwise
        // assume their local zone)
        pbString(o, 3, "UTC")
      }
      val framedSf = frame(sf, codecId)
      out.write(framedSf, 0, framedSf.length)
      StripeInfo(offset, dataLength, framedSf.length.toLong, stripe.length)
    }.toSeq
    require(stripeInfos.nonEmpty, "orc write: empty file (no rows)")
    val contentLength = out.size().toLong

    // ---- (empty) Metadata section, then Footer ----
    val footer = msg { o =>
      pbVarint(o, 1, 3L) // headerLength
      pbVarint(o, 2, contentLength)
      stripeInfos.foreach(si => pbBytes(o, 3, msg { so =>
        pbVarint(so, 1, si.offset)
        pbVarint(so, 2, 0L) // indexLength: no row indexes
        pbVarint(so, 3, si.dataLength)
        pbVarint(so, 4, si.footerLength)
        pbVarint(so, 5, si.nRows.toLong)
      }))
      // type tree: root struct + one primitive per column
      pbBytes(o, 4, msg { to =>
        pbVarint(to, 1, 12L) // STRUCT
        cols.indices.foreach(i => pbVarint(to, 2, (i + 1).toLong))
        cols.foreach { case (name, _) => pbString(to, 3, name) }
      })
      cols.foreach { case (_, ck) =>
        pbBytes(o, 4, msg(to => pbVarint(to, 1, typeKind(ck).toLong)))
      }
      pbVarint(o, 6, rows.length.toLong)
      // count-only ColumnStatistics per type id (root counts rows)
      pbBytes(o, 7, msg(so => pbVarint(so, 1, rows.length.toLong)))
      cols.zipWithIndex.foreach { case ((_, _), ci) =>
        val nonNull = rows.count(_(ci) != null).toLong
        pbBytes(o, 7, msg { so =>
          pbVarint(so, 1, nonNull)
          pbVarint(so, 10, if (nonNull < rows.length) 1L else 0L) // hasNull
        })
      }
      pbVarint(o, 8, 0L) // rowIndexStride: none written
    }
    val framedFooter = frame(footer, codecId)
    out.write(framedFooter, 0, framedFooter.length)

    // ---- PostScript (always uncompressed) + its length byte ----
    val ps = msg { o =>
      pbVarint(o, 1, framedFooter.length.toLong)
      pbVarint(o, 2, codecId.toLong)
      pbVarint(o, 3, ChunkSize.toLong)
      pbVarint(o, 4, 0L); pbVarint(o, 4, 12L) // file version 0.12
      pbVarint(o, 5, 0L) // metadataLength: empty section
      pbVarint(o, 6, 1L) // writerVersion
      pbString(o, 8000, "ORC")
    }
    require(ps.length < 256, "postscript too large")
    out.write(ps, 0, ps.length)
    out.write(ps.length)
    out.toByteArray
  }
}
