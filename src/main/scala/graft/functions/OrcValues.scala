package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ORC STRIPE-DATA column reader — the row-reading tier the round-15
  * [[OrcMeta]] planner stops short of, built on the same machinery:
  * [[ProtoWire.fieldsRaw]] walks the StripeFooter (stream list +
  * column encodings), [[OrcMeta.unframe]] undoes the 3-byte chunk
  * framing per stream (ZLIB through [[Inflate.raw]], SNAPPY through
  * [[BlockCodecs.snappyBlock]]), and the decoders here implement the
  * ORC v1 data encodings from the spec:
  *
  *  - integer RLE v2, all four sub-encodings: SHORT_REPEAT, DIRECT
  *    (MSB-first bit packing, 5-bit closest-fixed-width table),
  *    PATCHED_BASE (sign-magnitude base, gap+patch entries at the
  *    combined closest width, 255-gap continuation), DELTA (zigzag
  *    base/delta-base, fixed or literal deltas);
  *  - boolean byte-RLE PRESENT streams (run/literal control bytes,
  *    MSB-first bits) for null interleaving;
  *  - string columns in both DIRECT_V2 (LENGTH + DATA) and
  *    DICTIONARY_V2 (dictionary LENGTH/DATA + index stream);
  *  - integer RLE **v1** (the Hive 0.11 lineage: run = header+3 with
  *    signed delta byte and varint base, literals = negative header)
  *    for DIRECT(0)/DICTIONARY(1) column encodings — integers,
  *    string lengths, and dictionary index streams alike.
  *
  * Scope: flat top-level smallint/int/bigint, float/double (IEEE 754
  * LE direct streams, widened to double), and string columns from
  * NONE/ZLIB/SNAPPY/ZSTD files (ZSTD through the in-house
  * [[ZstdDecode]]) — what the mainstream writers emit for the shapes
  * [[OrcMeta]] plans over. Anything else (other types, LZO/LZ4,
  * nested structure) DECLINES to null, the total-parser contract,
  * with all claims bounded before allocation.
  *
  * Reference scope: beyond-reference §2.10 (the reference has no
  * columnar storage at all).
  */
object OrcValues {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  private val MaxOut = BlockCodecs.MaxOut

  // ---- RLE v2 ----

  /** 5-bit closest-fixed-width code → bit width (ORC FixedBitSizes). */
  private def decodeWidth(c: Int): Int =
    if (c < 24) c + 1
    else c match {
      case 24 => 26; case 25 => 28; case 26 => 30; case 27 => 32
      case 28 => 40; case 29 => 48; case 30 => 56; case _ => 64
    }

  /** Smallest width in the table that holds `n` bits. */
  private def closestWidth(n: Int): Int =
    if (n == 0) 1
    else if (n <= 24) n
    else if (n <= 26) 26
    else if (n <= 28) 28
    else if (n <= 30) 30
    else if (n <= 32) 32
    else if (n <= 40) 40
    else if (n <= 48) 48
    else if (n <= 56) 56
    else 64

  /** MSB-first bit cursor over a byte array (ORC packs big-endian,
    * unlike parquet's LSB-first hybrid). */
  private final class Bits(val d: Array[Byte], var pos: Int) {
    private var bit = 0
    def u8(): Int = {
      if (bit != 0) fail() // byte reads only at byte boundaries
      if (pos >= d.length) fail()
      val v = d(pos) & 0xff; pos += 1; v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var got = 0
      while (got < n) {
        if (pos >= d.length) fail()
        val avail = 8 - bit
        val take = math.min(avail, n - got)
        val bits = (d(pos) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | bits
        bit += take; got += take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      v
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def varint(): Long = {
      var shift = 0; var v = 0L; var c = 0
      do {
        if (shift > 63) fail()
        c = u8(); v |= (c & 0x7fL) << shift; shift += 7
      } while ((c & 0x80) != 0)
      v
    }
    def zigzag(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1) }
  }

  /** Decodes exactly `n` integer-RLE-v2 values. `signed` selects
    * zigzag decode for SHORT_REPEAT/DIRECT values and the DELTA base
    * (PATCHED_BASE carries sign in the base, per spec). */
  /** Integer RLE **version 1** (the Hive 0.11 lineage; column encodings
    * DIRECT(0) / DICTIONARY(1)): header byte ≥ 0 → a run of h+3 values
    * (signed delta byte, base varint); header < 0 → −h literal
    * varints. Signed streams zigzag. Runs past the requested count are
    * corrupt, not padding. */
  private[functions] def rleV1(d: Array[Byte], n: Int,
                               signed: Boolean): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var produced = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var c = 0
      do {
        if (pos >= d.length || shift > 63) fail()
        c = d(pos) & 0xff; pos += 1
        v |= (c & 0x7fL) << shift; shift += 7
      } while ((c & 0x80) != 0)
      v
    }
    def value(): Long = {
      val u = varint()
      if (signed) (u >>> 1) ^ -(u & 1L) else u
    }
    while (produced < n) {
      if (pos >= d.length) fail()
      val h = d(pos).toInt // signed header byte
      pos += 1
      if (h >= 0) {
        val run = h + 3
        if (run > n - produced) fail()
        if (pos >= d.length) fail()
        val delta = d(pos).toInt
        pos += 1
        val base = value()
        var i = 0
        while (i < run) {
          out(produced) = base + i.toLong * delta
          produced += 1; i += 1
        }
      } else {
        val cnt = -h
        if (cnt > n - produced) fail()
        var i = 0
        while (i < cnt) { out(produced) = value(); produced += 1; i += 1 }
      }
    }
    out
  }

  private[functions] def rleV2(d: Array[Byte], n: Int, signed: Boolean): Array[Long] = {
    if (n < 0 || n > MaxOut) fail()
    val out = new Array[Long](n)
    val c = new Bits(d, 0)
    var produced = 0
    while (produced < n) {
      val first = c.u8()
      (first >>> 6) match {
        case 0 => // SHORT_REPEAT
          val width = ((first >>> 3) & 7) + 1
          val run = (first & 7) + 3
          if (produced + run > n) fail()
          var v = 0L
          var k = 0
          while (k < width) { v = (v << 8) | c.u8(); k += 1 }
          if (signed) v = (v >>> 1) ^ -(v & 1)
          k = 0
          while (k < run) { out(produced) = v; produced += 1; k += 1 }
        case 1 => // DIRECT
          val width = decodeWidth((first >>> 1) & 31)
          val len = (((first & 1) << 8) | c.u8()) + 1
          if (produced + len > n) fail()
          var k = 0
          while (k < len) {
            var v = c.readBits(width)
            if (signed) v = (v >>> 1) ^ -(v & 1)
            out(produced) = v; produced += 1; k += 1
          }
          c.alignByte()
        case 2 => // PATCHED_BASE
          val width = decodeWidth((first >>> 1) & 31)
          val len = (((first & 1) << 8) | c.u8()) + 1
          if (produced + len > n) fail()
          val third = c.u8()
          val baseBytes = ((third >>> 5) & 7) + 1
          val patchWidth = decodeWidth(third & 31)
          val fourth = c.u8()
          val gapWidth = ((fourth >>> 5) & 7) + 1
          val patchLen = fourth & 31
          var base = 0L
          var k = 0
          while (k < baseBytes) { base = (base << 8) | c.u8(); k += 1 }
          val signMask = 1L << (baseBytes * 8 - 1)
          if (baseBytes < 8 && (base & signMask) != 0)
            base = -(base & (signMask - 1)) // sign-magnitude, per spec
          val data = new Array[Long](len)
          k = 0
          while (k < len) { data(k) = c.readBits(width); k += 1 }
          c.alignByte()
          val entryWidth = closestWidth(gapWidth + patchWidth)
          val patchMask = if (patchWidth == 64) -1L else (1L << patchWidth) - 1
          var idx = 0
          var gapAcc = 0L
          k = 0
          while (k < patchLen) {
            val e = c.readBits(entryWidth)
            val gap = e >>> patchWidth
            val patch = e & patchMask
            gapAcc += gap
            if (patch != 0) { // gap==255 && patch==0 is a pure continuation
              val at = gapAcc.toInt
              if (at < 0 || at >= len) fail()
              data(at) |= patch << width
              idx += 1
            }
            k += 1
          }
          c.alignByte()
          if (idx > patchLen) fail()
          k = 0
          while (k < len) {
            out(produced) = base + data(k); produced += 1; k += 1
          }
        case _ => // DELTA
          val wc = (first >>> 1) & 31
          val width = if (wc == 0) 0 else decodeWidth(wc)
          val len = (((first & 1) << 8) | c.u8()) + 1
          if (produced + len > n) fail()
          if (len < 2) fail() // spec minimum: base + delta base
          val base = if (signed) c.zigzag() else c.varint()
          out(produced) = base; produced += 1
          if (len > 1) {
            val deltaBase = c.zigzag()
            out(produced) = out(produced - 1) + deltaBase; produced += 1
            var k = 2
            if (width == 0) { // fixed delta run
              while (k < len) {
                out(produced) = out(produced - 1) + deltaBase
                produced += 1; k += 1
              }
            } else {
              val sign = if (deltaBase < 0) -1L else 1L
              while (k < len) {
                val dv = c.readBits(width)
                out(produced) = out(produced - 1) + sign * dv
                produced += 1; k += 1
              }
              c.alignByte()
            }
          }
      }
    }
    out
  }

  /** Boolean byte-RLE PRESENT stream → `rows` bits (MSB-first within
    * each byte); trailing padding bits ignored. */
  private def presentBits(d: Array[Byte], rows: Int): Array[Boolean] = {
    if (rows < 0 || rows > MaxOut) fail()
    val nBytes = (rows + 7) >> 3
    val bytes = new Array[Byte](nBytes)
    var produced = 0
    var pos = 0
    while (produced < nBytes) {
      if (pos >= d.length) fail()
      val control = d(pos) & 0xff; pos += 1
      if (control < 128) { // run of control+3 copies of the next byte
        val run = control + 3
        if (pos >= d.length) fail()
        val v = d(pos); pos += 1
        val take = math.min(run, nBytes - produced)
        java.util.Arrays.fill(bytes, produced, produced + take, v)
        produced += take
      } else { // 256-control literal bytes
        val lit = 256 - control
        val take = math.min(lit, nBytes - produced)
        if (pos + take > d.length) fail()
        System.arraycopy(d, pos, bytes, produced, take)
        pos += take // a final run may encode past the needed bits
        produced += take
      }
    }
    val out = new Array[Boolean](rows)
    var i = 0
    while (i < rows) {
      out(i) = ((bytes(i >> 3) >> (7 - (i & 7))) & 1) == 1
      i += 1
    }
    out
  }

  // ---- file walk ----

  private final class Stripe(val offset: Long, val indexLength: Long,
                             val dataLength: Long, val footerLength: Long,
                             val rows: Long)

  /** [stream kind, column, length] triplets in footer order plus the
    * per-column encodings (kind, dictionarySize). */
  private final class StripeMeta(
      val streams: Array[(Int, Int, Long)],
      val encodings: Array[(Int, Int)])

  private def parseStripeFooter(raw: Array[Byte]): StripeMeta = {
    val streams = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    val encodings = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    ProtoWire.fieldsRaw(raw).foreach { f =>
      f.fieldNo match {
        case 1 if f.wireType == 2 => // Stream
          var kind = 0; var column = 0; var length = 0L
          ProtoWire.fieldsRaw(f.payload).foreach { sf =>
            if (sf.wireType == 0) sf.fieldNo match {
              case 1 => kind = sf.raw.toInt
              case 2 => column = sf.raw.toInt
              case 3 => length = sf.raw
              case _ => ()
            }
          }
          streams += ((kind, column, length))
        case 2 if f.wireType == 2 => // ColumnEncoding
          var kind = 0; var dictSize = 0
          ProtoWire.fieldsRaw(f.payload).foreach { sf =>
            if (sf.wireType == 0) sf.fieldNo match {
              case 1 => kind = sf.raw.toInt
              case 2 => dictSize = sf.raw.toInt
              case _ => ()
            }
          }
          encodings += ((kind, dictSize))
        case _ => ()
      }
    }
    new StripeMeta(streams.toArray, encodings.toArray)
  }

  /** Footer walk shared by both faces: root field names, per-root-field
    * type kinds, stripe list. Flat struct-of-primitives only. */
  private final class FilePlan(val codec: Int, val names: Array[String],
                               val kinds: Array[Int],
                               val stripes: Array[Stripe])

  private def plan(b: Array[Byte]): FilePlan = {
    val t = OrcMeta.tail(b)
    var rootNames: Array[String] = null
    var rootSubtypes = -1
    val typeKinds = scala.collection.mutable.ArrayBuffer.empty[Int]
    val stripes = scala.collection.mutable.ArrayBuffer.empty[Stripe]
    var typeIdx = 0
    ProtoWire.fieldsRaw(t.footer).foreach { f =>
      f.fieldNo match {
        case 3 if f.wireType == 2 => // StripeInformation
          var off = -1L; var il = 0L; var dl = -1L; var fl = -1L; var rows = -1L
          ProtoWire.fieldsRaw(f.payload).foreach { sf =>
            if (sf.wireType == 0) sf.fieldNo match {
              case 1 => off = sf.raw
              case 2 => il = sf.raw
              case 3 => dl = sf.raw
              case 4 => fl = sf.raw
              case 5 => rows = sf.raw
              case _ => ()
            }
          }
          if (off < 0 || dl < 0 || fl <= 0 || rows < 0) fail()
          stripes += new Stripe(off, il, dl, fl, rows)
        case 4 if f.wireType == 2 => // Type (depth-first; root first)
          var kind = -1
          var nSub = 0
          val names = scala.collection.mutable.ArrayBuffer.empty[String]
          ProtoWire.fieldsRaw(f.payload).foreach { sf =>
            sf.fieldNo match {
              case 1 if sf.wireType == 0 => kind = sf.raw.toInt
              case 2 if sf.wireType == 0 => nSub += 1
              case 2 if sf.wireType == 2 => // packed subtypes
                nSub += sf.payload.count(x => (x & 0x80) == 0)
              case 3 if sf.wireType == 2 =>
                names += new String(sf.payload, "UTF-8")
              case _ => ()
            }
          }
          if (typeIdx == 0) {
            if (kind != 12) fail() // root must be a struct
            rootNames = names.toArray
            rootSubtypes = nSub
          } else typeKinds += kind
          typeIdx += 1
        case _ => ()
      }
    }
    if (rootNames == null || rootNames.length != rootSubtypes) fail()
    // flat file: every type after the root is a root child (primitives)
    if (typeKinds.length != rootSubtypes) fail()
    new FilePlan(t.codec, rootNames, typeKinds.toArray, stripes.toArray)
  }

  // value kinds for readColumn
  private final val KLong = 0
  private final val KString = 1
  private final val KDouble = 2
  private final val KDate = 3 // days since epoch, as long
  private final val KTimestamp = 4 // microseconds since epoch, as long

  /** ORC's 2015-01-01T00:00:00Z timestamp base, in epoch seconds. */
  private val TsBaseSeconds = 1420070400L

  /** SECONDARY-stream nanos: bottom 3 bits `z` encode removed trailing
    * decimal zeros; a non-zero `z` restores z+1 of them (the ORC
    * reader's exact rule — the writer strips ≥2 zeros, so z=1 ⇒ two
    * zeros removed). */
  private def parseNanos(v: Long): Long = {
    val tail = (v & 7).toInt
    var n = v >>> 3
    if (tail != 0) {
      var k = 0
      while (k <= tail) { n *= 10; k += 1 }
    }
    if (n < 0 || n > 999999999L) fail()
    n
  }

  /** Reads one column's values across all stripes; boxed Long /
    * UTF8String / Double / null elements per `want`. */
  private def readColumn(b: Array[Byte], colName: String,
                         want: Int): Array[Any] = {
    val wantString = want == KString
    val p = plan(b)
    val fi = p.names.indexOf(colName)
    if (fi < 0) fail()
    val colId = fi + 1 // column 0 is the root struct
    val kind = p.kinds(fi)
    // Type.Kind: SHORT=2 INT=3 LONG=4 FLOAT=5 DOUBLE=6 STRING=7
    // TIMESTAMP=9 DATE=15 TIMESTAMP_INSTANT=18
    want match {
      case KLong => if (kind != 2 && kind != 3 && kind != 4) fail()
      case KString => if (kind != 7) fail()
      case KDouble => if (kind != 5 && kind != 6) fail()
      case KDate => if (kind != 15) fail()
      case _ => if (kind != 9 && kind != 18) fail()
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    p.stripes.foreach { stripe =>
      // bound the Long BEFORE narrowing: a corrupt claim like 2^32+100
      // would wrap to 100 under toInt-first and misread as a decode
      if (stripe.rows < 0 || stripe.rows > MaxOut) fail()
      val rows = stripe.rows.toInt
      val footStart = stripe.offset + stripe.indexLength + stripe.dataLength
      if (footStart < 0 || footStart + stripe.footerLength > b.length) fail()
      val sfRaw = OrcMeta.unframe(java.util.Arrays.copyOfRange(b,
        footStart.toInt, (footStart + stripe.footerLength).toInt), p.codec)
      val sm = parseStripeFooter(sfRaw)
      if (colId >= sm.encodings.length) fail()
      val (encKind, dictSize) = sm.encodings(colId)

      // stream layout: sequential in footer order from the stripe start
      var cursor = stripe.offset
      var present: Array[Byte] = null
      var data: Array[Byte] = null
      var length: Array[Byte] = null
      var dictData: Array[Byte] = null
      var secondary: Array[Byte] = null
      // Stream.Kind: PRESENT=0 DATA=1 LENGTH=2 DICTIONARY_DATA=3 SECONDARY=5
      sm.streams.foreach { case (skind, scol, slen) =>
        if (slen < 0 || cursor + slen > b.length) fail()
        if (scol == colId && skind >= 0 && skind <= 5 && skind != 4) {
          val raw = java.util.Arrays.copyOfRange(b, cursor.toInt,
            (cursor + slen).toInt)
          val dec = OrcMeta.unframe(raw, p.codec, MaxOut)
          skind match {
            case 0 => present = dec
            case 1 => data = dec
            case 2 => length = dec
            case 3 => dictData = dec
            case 5 => secondary = dec
          }
        }
        cursor += slen
      }
      if (data == null) fail()

      val isPresent: Array[Boolean] =
        if (present == null) Array.fill(rows)(true)
        else presentBits(present, rows)
      val nPresent = isPresent.count(identity)

      if (want == KDouble) {
        // FLOAT/DOUBLE: DATA = IEEE 754 little-endian values, DIRECT
        val width = if (kind == 5) 4 else 8
        if (encKind != 0) fail()
        if (nPresent.toLong * width > data.length) fail()
        var vi = 0
        var off = 0
        isPresent.foreach { pr =>
          if (pr) {
            var v = 0L
            var k = width - 1
            while (k >= 0) { v = (v << 8) | (data(off + k) & 0xffL); k -= 1 }
            val d = if (kind == 5)
              java.lang.Float.intBitsToFloat(v.toInt).toDouble
            else java.lang.Double.longBitsToDouble(v)
            out += java.lang.Double.valueOf(d)
            off += width; vi += 1
          } else out += null
        }
      } else if (want == KLong || want == KDate) {
        // DIRECT_V2 (RLEv2) or the Hive-0.11 DIRECT (RLEv1) lineage
        if (encKind != 2 && encKind != 0) fail()
        val vals =
          if (encKind == 2) rleV2(data, nPresent, signed = true)
          else rleV1(data, nPresent, signed = true)
        var vi = 0
        isPresent.foreach { pr =>
          if (pr) { out += java.lang.Long.valueOf(vals(vi)); vi += 1 }
          else out += null
        }
      } else if (want == KTimestamp) {
        if (encKind != 2) fail()
        if (secondary == null) fail()
        val secs = rleV2(data, nPresent, signed = true) // rel. 2015-01-01
        val nanosEnc = rleV2(secondary, nPresent, signed = false)
        var vi = 0
        isPresent.foreach { pr =>
          if (pr) {
            val nanos = parseNanos(nanosEnc(vi))
            // pre-1970 values: the writer's truncating millis/1000
            // division rounds toward zero, so a negative EPOCH second
            // with a fractional part sits one second ahead
            var s = secs(vi) + TsBaseSeconds
            if (s < 0 && nanos != 0) s -= 1
            out += java.lang.Long.valueOf(s * 1000000L + nanos / 1000)
            vi += 1
          } else out += null
        }
      } else encKind match {
        case 0 | 2 => // DIRECT (v1 lengths) / DIRECT_V2: LENGTH + DATA
          if (length == null) fail()
          val lens =
            if (encKind == 2) rleV2(length, nPresent, signed = false)
            else rleV1(length, nPresent, signed = false)
          var off = 0L
          val cut = new Array[Any](nPresent)
          var k = 0
          while (k < nPresent) {
            val l = lens(k)
            if (l < 0 || off + l > data.length) fail()
            cut(k) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(
              data, off.toInt, (off + l).toInt))
            off += l; k += 1
          }
          var vi = 0
          isPresent.foreach { pr =>
            if (pr) { out += cut(vi); vi += 1 } else out += null
          }
        case 1 | 3 => // DICTIONARY (v1) / DICTIONARY_V2
          if (length == null || dictData == null) fail()
          if (dictSize < 0 || dictSize > MaxOut) fail()
          val v2 = encKind == 3
          val lens =
            if (v2) rleV2(length, dictSize, signed = false)
            else rleV1(length, dictSize, signed = false)
          val dict = new Array[UTF8String](dictSize)
          var off = 0L
          var k = 0
          while (k < dictSize) {
            val l = lens(k)
            if (l < 0 || off + l > dictData.length) fail()
            dict(k) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(
              dictData, off.toInt, (off + l).toInt))
            off += l; k += 1
          }
          val idx =
            if (v2) rleV2(data, nPresent, signed = false)
            else rleV1(data, nPresent, signed = false)
          var vi = 0
          isPresent.foreach { pr =>
            if (pr) {
              val ix = idx(vi)
              if (ix < 0 || ix >= dictSize) fail()
              out += dict(ix.toInt); vi += 1
            } else out += null
          }
        case _ => fail()
      }
    }
    out.toArray
  }

  // ---- faces ----

  private def face(b: Array[Byte], name: UTF8String, want: Int): ArrayData =
    try {
      if (b == null || name == null) fail()
      new GenericArrayData(readColumn(b, name.toString, want))
    } catch {
      case Malformed => null
      case e: RuntimeException if e eq OrcMeta.Malformed => null
      case e: RuntimeException if e eq ProtoWire.ProtoMalformed => null
    }

  def int64Values(b: Array[Byte], name: UTF8String): ArrayData =
    face(b, name, KLong)
  def stringValues(b: Array[Byte], name: UTF8String): ArrayData =
    face(b, name, KString)
  def doubleValues(b: Array[Byte], name: UTF8String): ArrayData =
    face(b, name, KDouble)
  /** DATE column as days-since-epoch longs. */
  def dateDays(b: Array[Byte], name: UTF8String): ArrayData =
    face(b, name, KDate)
  /** TIMESTAMP / TIMESTAMP_INSTANT column as epoch microseconds. */
  def timestampMicros(b: Array[Byte], name: UTF8String): ArrayData =
    face(b, name, KTimestamp)

  // ---- expressions ----

  abstract class OrcColumn extends BinaryExpression {
    override def nullable: Boolean = true
    def method: String
    def elemType: DataType
    override def dataType: DataType = ArrayType(elemType, containsNull = true)
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, string) inputs")
      }
    override def nullSafeEval(b: Any, c: Any): Any = method match {
      case "int64Values" => OrcValues.int64Values(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "stringValues" => OrcValues.stringValues(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "doubleValues" => OrcValues.doubleValues(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "dateDays" => OrcValues.dateDays(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
      case "timestampMicros" => OrcValues.timestampMicros(
        b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bytes, name) => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.OrcValues.$method($bytes, $name);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
  }

  case class OrcInt64Column(left: Expression, right: Expression)
      extends OrcColumn {
    override def method: String = "int64Values"
    override def elemType: DataType = LongType
    override def prettyName: String = "orc_int64_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class OrcStringColumn(left: Expression, right: Expression)
      extends OrcColumn {
    override def method: String = "stringValues"
    override def elemType: DataType = StringType
    override def prettyName: String = "orc_string_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class OrcDoubleColumn(left: Expression, right: Expression)
      extends OrcColumn {
    override def method: String = "doubleValues"
    override def elemType: DataType = DoubleType
    override def prettyName: String = "orc_double_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class OrcDateDays(left: Expression, right: Expression)
      extends OrcColumn {
    override def method: String = "dateDays"
    override def elemType: DataType = LongType
    override def prettyName: String = "orc_date_days"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class OrcTimestampMicros(left: Expression, right: Expression)
      extends OrcColumn {
    override def method: String = "timestampMicros"
    override def elemType: DataType = LongType
    override def prettyName: String = "orc_timestamp_micros"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def int64ColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(OrcInt64Column(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def stringColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(OrcStringColumn(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def doubleColumnCol(content: Column, name: Column): Column =
    SparkInternals.column(OrcDoubleColumn(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def dateDaysCol(content: Column, name: Column): Column =
    SparkInternals.column(OrcDateDays(
      SparkInternals.expression(content), SparkInternals.expression(name)))
  def timestampMicrosCol(content: Column, name: Column): Column =
    SparkInternals.column(OrcTimestampMicros(
      SparkInternals.expression(content), SparkInternals.expression(name)))
}
