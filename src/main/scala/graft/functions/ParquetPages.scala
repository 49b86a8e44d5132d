package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parquet DATA-PAGE column reader — the full decode path from raw
  * file bytes to typed values with no parquet library: footer walk
  * ([[ParquetFooter]]) → per-chunk page walk (thrift-compact
  * PageHeader) → page decompression (our own [[BlockCodecs.snappyBlock]]
  * / [[BlockCodecs.lz4Block]]; UNCOMPRESSED pass-through) → PLAIN
  * dictionary decode → RLE/bit-packed-hybrid definition levels and
  * dictionary indices → null interleaving. This is the layer that
  * proves the format tier end to end: the footer gate shows we can
  * PLAN from metadata; this shows we can READ the data itself, i.e. a
  * ranged-GET column fetch on a 100 TB lake without an engine round
  * trip (inventory backfills, stat repair, page-level sampling).
  *
  * Supported (= what the mainstream writers emit for flat columns):
  * data pages v1 AND v2 (v2's uncompressed level prefix + separately
  * compressed values); dictionary pages PLAIN / PLAIN_DICTIONARY;
  * value encodings RLE_DICTIONARY / PLAIN_DICTIONARY / PLAIN /
  * DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY
  * (the parquet-mr v2-writer set); codecs UNCOMPRESSED, SNAPPY, GZIP
  * (RFC 1952 framing over the in-house [[Inflate]]), ZSTD (the
  * in-house [[ZstdDecode]]), LZ4_RAW; physical
  * INT32 / INT64 (widened to long), FLOAT / DOUBLE (widened to
  * double) and BYTE_ARRAY (string face);
  * required or optional flat leaves, LIST columns at ANY nesting depth
  * (generalized Dremel def/rep assembly over the standard 3-level,
  * legacy 2-level, and bare-repeated shapes — list faces for depth 1,
  * a list-of-lists face for depth 2), and MAP columns with string keys
  * (both leaf chunks decoded and zipped, surfaced as a sorted `k=v`
  * CSV). Everything else — struct columns, nested map values, other
  * codecs or encodings — DECLINES to null rather than misreading, the
  * same total-parser contract as every decoder here.
  * Page sizes AND value-count claims are bounded by the shared 64 MiB
  * ratio-bomb cap before any allocation.
  *
  * Reference scope: beyond-reference §2.10 (the reference has no
  * columnar storage at all).
  */
object ParquetPages {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  private val MaxPage = BlockCodecs.MaxOut

  // ---- RLE / bit-packed hybrid (parquet encodings spec) ----

  /** Decodes `n` values from the hybrid runs starting at `pos` into
    * `out(off ..< off+n)`; returns the new position. */
  private def rleHybrid(d: Array[Byte], pos0: Int, end: Int, bitWidth: Int,
                        n: Int, out: Array[Int], off: Int = 0): Int = {
    if (bitWidth < 0 || bitWidth > 32) fail()
    val byteWidth = (bitWidth + 7) >> 3
    var pos = pos0
    var produced = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var c = 0
      do {
        if (pos >= end || shift > 35) fail()
        c = d(pos) & 0xff; pos += 1
        v |= (c & 0x7fL) << shift; shift += 7
      } while ((c & 0x80) != 0)
      v
    }
    while (produced < n) {
      val h = varint()
      if ((h & 1L) == 0L) { // RLE run
        val run = (h >>> 1).toInt
        if (run <= 0) fail()
        var v = 0
        var k = 0
        if (pos + byteWidth > end) fail()
        while (k < byteWidth) { v |= (d(pos + k) & 0xff) << (8 * k); k += 1 }
        pos += byteWidth
        val take = math.min(run, n - produced)
        var i = 0
        while (i < take) { out(off + produced) = v; produced += 1; i += 1 }
        // a run longer than needed is malformed padding; tolerate exact-fit
        if (take < run) fail()
      } else { // bit-packed groups of 8
        val groups = (h >>> 1).toInt
        if (groups <= 0 || groups > (MaxPage >> 3)) fail()
        val nbytes = groups * bitWidth // groups*8*bitWidth/8
        if (pos + nbytes > end) fail()
        var count = groups * 8
        var bitPos = 0
        while (count > 0 && produced < n) {
          var v = 0
          var got = 0
          while (got < bitWidth) {
            val byteAt = pos + (bitPos >> 3)
            val avail = 8 - (bitPos & 7)
            val take = math.min(avail, bitWidth - got)
            val bits = (d(byteAt) >> (bitPos & 7)) & ((1 << take) - 1)
            v |= bits << got
            got += take; bitPos += take
          }
          out(off + produced) = v; produced += 1; count -= 1
        }
        pos += nbytes // trailing padding values in the last group discarded
      }
    }
    pos
  }

  // ---- PLAIN decode per physical type ----

  private def leInt(d: Array[Byte], p: Int): Int = {
    if (p + 4 > d.length) fail()
    (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8) | ((d(p + 2) & 0xff) << 16) |
      ((d(p + 3) & 0xff) << 24)
  }
  private def leLong(d: Array[Byte], p: Int): Long = {
    if (p + 8 > d.length) fail()
    var v = 0L; var k = 7
    while (k >= 0) { v = (v << 8) | (d(p + k) & 0xffL); k -= 1 }
    v
  }

  private final class Plain(d: Array[Byte], var pos: Int) {
    def nextLong(ptype: Int): Long = ptype match {
      case 1 => val v = leInt(d, pos).toLong; pos += 4; v
      case 2 => val v = leLong(d, pos); pos += 8; v
      case _ => fail()
    }
    def nextDouble(ptype: Int): Double = ptype match {
      case 4 => // FLOAT widened, like INT32 → long
        val v = java.lang.Float.intBitsToFloat(leInt(d, pos)); pos += 4
        v.toDouble
      case 5 =>
        val v = java.lang.Double.longBitsToDouble(leLong(d, pos)); pos += 8; v
      case _ => fail()
    }
    /** INT96 timestamp → epoch micros: 8-byte LE nanos-of-day + 4-byte
      * LE Julian day (the legacy Hive/Spark lineage). */
    def nextInt96Micros(): Long = {
      val nanos = leLong(d, pos)
      val julian = leInt(d, pos + 8)
      pos += 12
      if (nanos < 0 || nanos >= 86400000000000L) fail()
      (julian.toLong - 2440588L) * 86400000000L + nanos / 1000
    }
    def nextBytes(): Array[Byte] = {
      val len = leInt(d, pos); pos += 4
      if (len < 0 || len > d.length - pos) fail()
      val r = java.util.Arrays.copyOfRange(d, pos, pos + len); pos += len; r
    }
  }

  // ---- DELTA_* encodings (parquet encodings spec) ----

  private[functions] final class Cursor(val d: Array[Byte], var pos: Int) {
    def u8(): Int = { if (pos >= d.length) fail(); val v = d(pos) & 0xff; pos += 1; v }
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

  /** Unpacks the first `count` of `stored` LSB-first `bitWidth`-bit
    * values starting at `c.pos` (consumes exactly
    * ceil(stored*bitWidth/8) bytes — trailing padding values are
    * skipped without being allocated, so a claim-heavy header cannot
    * size an output array beyond what the caller actually needs). */
  private def unpackBits64(c: Cursor, bitWidth: Int, count: Int,
                           stored: Int): Array[Long] = {
    if (bitWidth < 0 || bitWidth > 64 || count > stored) fail()
    val nbytes = ((stored.toLong * bitWidth + 7) >> 3).toInt
    if (c.pos + nbytes > c.d.length) fail()
    val out = new Array[Long](count)
    var bitPos = 0
    var k = 0
    while (k < count) {
      var v = 0L
      var got = 0
      while (got < bitWidth) {
        val byteAt = c.pos + (bitPos >> 3)
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, bitWidth - got)
        val bits = ((c.d(byteAt) >> (bitPos & 7)) & ((1 << take) - 1)).toLong
        v |= bits << got
        got += take; bitPos += take
      }
      out(k) = v; k += 1
    }
    c.pos += nbytes
    out
  }

  /** DELTA_BINARY_PACKED: block header + miniblocks of zigzag-varint
    * deltas. Trailing miniblocks with no values are not stored; a
    * miniblock with any value is stored in full. */
  private[functions] def deltaBinaryPacked(c: Cursor): Array[Long] = {
    val blockSize = c.varint().toInt
    val miniblocks = c.varint().toInt
    val total = c.varint().toInt
    // claim-bomb bound: header counts size allocations, so cap them
    // against MaxPage BEFORE any array is created (a hostile blockSize
    // with a bit-width-0 miniblock would otherwise allocate GBs while
    // consuming zero input bytes)
    if (blockSize <= 0 || blockSize > MaxPage || miniblocks <= 0 ||
      blockSize % miniblocks != 0) fail()
    val vpm = blockSize / miniblocks
    if (vpm <= 0 || vpm % 8 != 0) fail()
    if (total < 0 || total > MaxPage) fail()
    val out = new Array[Long](total)
    if (total == 0) { c.zigzag(); return out } // first value still present
    out(0) = c.zigzag()
    var produced = 1
    while (produced < total) {
      val minDelta = c.zigzag()
      val bws = new Array[Int](miniblocks)
      var i = 0
      while (i < miniblocks) { bws(i) = c.u8(); i += 1 }
      var mb = 0
      while (mb < miniblocks && produced < total) {
        // allocate only the values still needed; the miniblock's full
        // byte span (vpm values) is consumed positionally either way
        val need = math.min(vpm, total - produced)
        val deltas = unpackBits64(c, bws(mb), need, vpm)
        var k = 0
        while (k < need) {
          out(produced) = out(produced - 1) + minDelta + deltas(k)
          produced += 1; k += 1
        }
        mb += 1
      }
    }
    out
  }

  /** DELTA_LENGTH_BYTE_ARRAY: packed lengths then concatenated bytes. */
  private def deltaLengthByteArray(c: Cursor, n: Int): Array[Array[Byte]] = {
    val lens = deltaBinaryPacked(c)
    if (lens.length != n) fail()
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val len = lens(i)
      if (len < 0 || len > c.d.length - c.pos) fail()
      out(i) = java.util.Arrays.copyOfRange(c.d, c.pos, c.pos + len.toInt)
      c.pos += len.toInt
      i += 1
    }
    out
  }

  /** DELTA_BYTE_ARRAY: per-value shared-prefix lengths + suffixes. */
  private def deltaByteArray(c: Cursor, n: Int): Array[Array[Byte]] = {
    val prefixLens = deltaBinaryPacked(c)
    if (prefixLens.length != n) fail()
    val suffixes = deltaLengthByteArray(c, n)
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val pl = prefixLens(i)
      if (pl < 0 || (i == 0 && pl != 0)) fail()
      if (i > 0 && pl > out(i - 1).length) fail()
      val v = new Array[Byte](pl.toInt + suffixes(i).length)
      if (pl > 0) System.arraycopy(out(i - 1), 0, v, 0, pl.toInt)
      System.arraycopy(suffixes(i), 0, v, pl.toInt, suffixes(i).length)
      out(i) = v
      i += 1
    }
    out
  }

  // ---- page walk ----

  private final class PageHeader {
    var ptype: Int = -1
    var uncompressed: Int = -1
    var compressed: Int = -1
    var numValues: Int = -1
    var encoding: Int = -1
    // data page v2 extras
    var numNulls: Int = -1
    var defBytes: Int = 0
    var repBytes: Int = 0
    var v2Compressed: Boolean = true
  }

  private def parsePageHeader(r: ParquetFooter.TReader): PageHeader = {
    val h = new PageHeader
    ParquetFooter.walkStruct(r) { (fid, t, rr) =>
      (fid, t) match {
        case (1, ParquetFooter.T_I32) => h.ptype = rr.zigzag().toInt; true
        case (2, ParquetFooter.T_I32) => h.uncompressed = rr.zigzag().toInt; true
        case (3, ParquetFooter.T_I32) => h.compressed = rr.zigzag().toInt; true
        case (5, ParquetFooter.T_STRUCT) | (7, ParquetFooter.T_STRUCT) =>
          ParquetFooter.walkStruct(rr) { (sfid, st, srr) =>
            (sfid, st) match {
              case (1, ParquetFooter.T_I32) => h.numValues = srr.zigzag().toInt; true
              case (2, ParquetFooter.T_I32) => h.encoding = srr.zigzag().toInt; true
              case _ => false
            }
          }
          true
        case (8, ParquetFooter.T_STRUCT) => // DataPageHeaderV2
          ParquetFooter.walkStruct(rr) { (sfid, st, srr) =>
            (sfid, st) match {
              case (1, ParquetFooter.T_I32) => h.numValues = srr.zigzag().toInt; true
              case (2, ParquetFooter.T_I32) => h.numNulls = srr.zigzag().toInt; true
              case (4, ParquetFooter.T_I32) => h.encoding = srr.zigzag().toInt; true
              case (5, ParquetFooter.T_I32) => h.defBytes = srr.zigzag().toInt; true
              case (6, ParquetFooter.T_I32) => h.repBytes = srr.zigzag().toInt; true
              case (7, _) => h.v2Compressed = st == ParquetFooter.T_BOOL_TRUE; true
              case _ => false
            }
          }
          true
        case _ => false
      }
    }
    h
  }

  private def decompress(b: Array[Byte], from: Int, compLen: Int,
                         uncompLen: Int, codec: Int): Array[Byte] = {
    if (compLen < 0 || from + compLen > b.length) fail()
    if (uncompLen < 0 || uncompLen > MaxPage) fail()
    val slice = java.util.Arrays.copyOfRange(b, from, from + compLen)
    val out = codec match {
      case 0 => slice
      case 1 => BlockCodecs.snappyBlock(slice)
      case 2 => Inflate.gzip(slice) // RFC 1952 over the in-house inflate
      case 6 => ZstdDecode.decompress(slice) // zstd frames (RFC 8878)
      case 7 => BlockCodecs.lz4Block(slice)
      case _ => fail()
    }
    if (out == null || out.length != uncompLen) fail()
    out
  }

  /** Footer statistic of an int chunk as a long (modern pair preferred,
    * legacy accepted for int types); None when absent/undecodable. */
  private def statLong(c: ParquetFooter.ColChunk, wantMax: Boolean): Option[Long] = {
    if (c.stats == null) return None
    val v = if (wantMax) {
      if (c.stats.maxValue != null) c.stats.maxValue else c.stats.legacyMax
    } else {
      if (c.stats.minValue != null) c.stats.minValue else c.stats.legacyMin
    }
    if (v == null) None
    else if (c.ptype == 2 && v.length == 8) Some(leLong(v, 0))
    else if (c.ptype == 1 && v.length == 4) Some(leInt(v, 0).toLong)
    else None
  }

  // ---- schema shape resolution ----

  /** Readable column geometry: the chunk's dotted path, its leaf
    * element, the maximum def/rep levels, and `defOfRep(k-1)` = the
    * cumulative definition level AT the k-th repeated node (both
    * optional and repeated nodes contribute a def level). For
    * repetition level k, `defOfRep(k-1) - 1` is the "defined but
    * empty" threshold; below it the container is null. maxRep 0 =
    * flat, 1 = list / map, 2 = list-of-lists, … */
  private final class Shape(val path: String,
      val leaf: ParquetFooter.SchemaElem, val maxDef: Int, val maxRep: Int,
      val defOfRep: Array[Int]) {
    def optBefore(k: Int): Int = defOfRep(k - 1) - 1 // k is 1-based
  }

  /** Index just past the subtree rooted at `i` in the depth-first
    * schema list. */
  private def subtreeEnd(s: scala.collection.IndexedSeq[ParquetFooter.SchemaElem],
                         i: Int): Int = {
    if (i >= s.length) fail()
    var j = i + 1
    var c = 0
    while (c < s(i).numChildren) { j = subtreeEnd(s, j); c += 1 }
    j
  }

  /** Top-level field index in the depth-first schema list, or fail. */
  private def topField(f: ParquetFooter.Footer, colName: String): Int = {
    val s = f.schema
    if (s.isEmpty) fail()
    var i = 1
    var c = 0
    while (c < s.head.numChildren) {
      if (s(i).name == colName) return i
      i = subtreeEnd(s, i); c += 1
    }
    fail()
  }

  /** Resolves a column name — optionally a DOTTED PATH through struct
    * groups — to a readable [[Shape]]. Single-child groups on the way
    * auto-descend (the LIST wrapper patterns: flat leaf, bare repeated
    * leaf, 2-level legacy, standard 3-level, any nesting of those);
    * multi-child groups (structs) are navigated only when the next
    * path segment NAMES a child. A struct reached without a naming
    * segment fails — auto-descending it would misread its subfield
    * under the struct's name (MAPs resolve via [[resolveMapShapes]]). */
  private def resolveShape(f: ParquetFooter.Footer, colName: String): Shape = {
    val parts = colName.split('.')
    if (parts.isEmpty || parts.exists(_.isEmpty)) fail()
    val s = f.schema
    var i = topField(f, parts(0))
    var consumed = 1
    var defLevel = 0
    val reps = scala.collection.mutable.ArrayBuffer.empty[Int]
    val path = new java.lang.StringBuilder
    var depth = 0
    // LIST-shape guard: an AUTO-DESCENDED non-repeated group is only
    // readable when a repeated node follows below it; an explicitly
    // NAMED struct segment clears the guard (the caller chose it)
    var pendingGroups = 0
    while (true) {
      val e = s(i)
      if (depth > 16) fail()
      if (path.length > 0) path.append('.')
      path.append(e.name)
      e.repetition match {
        case 0 => ()
        case 1 => defLevel += 1
        case 2 => defLevel += 1; reps += defLevel; pendingGroups = 0
        case _ => fail()
      }
      if (e.numChildren == 0) {
        if (consumed != parts.length) fail() // unconsumed path segments
        if (pendingGroups > 0) fail() // struct chain with no list below
        return new Shape(path.toString, e, defLevel, reps.length,
          reps.toArray)
      }
      // child selection: explicit segment first, else lone-child descent
      val byName =
        if (consumed < parts.length) {
          var j = i + 1
          var c = 0
          var found = -1
          while (c < e.numChildren && found < 0) {
            if (s(j).name == parts(consumed)) found = j
            j = subtreeEnd(s, j); c += 1
          }
          found
        } else -1
      if (byName >= 0) {
        consumed += 1
        pendingGroups = 0 // the caller named this step
        i = byName
      } else if (e.numChildren == 1) {
        if (e.repetition != 2) pendingGroups += 1
        i += 1
      } else fail() // struct with no naming segment
      depth += 1
    }
    fail() // unreachable
  }

  /** Resolves a MAP column (group → repeated key_value(key, value)) to
    * its two leaf shapes. Keys must be REQUIRED leaves per the spec;
    * non-leaf values (nested maps) fail. */
  private def resolveMapShapes(f: ParquetFooter.Footer,
                               colName: String): (Shape, Shape) = {
    val s = f.schema
    val i = topField(f, colName)
    val e = s(i)
    val opt = e.repetition match { case 0 => 0; case 1 => 1; case _ => fail() }
    if (e.numChildren != 1) fail()
    val kv = s(i + 1)
    if (kv.repetition != 2 || kv.numChildren != 2) fail()
    val repDef = opt + 1
    val key = s(i + 2)
    if (key.numChildren != 0 || key.repetition != 0) fail()
    val value = s(i + 3)
    if (value.numChildren != 0) fail() // nested map values out of scope
    val valOpt = value.repetition match {
      case 0 => 0; case 1 => 1; case _ => fail()
    }
    val prefix = s"${e.name}.${kv.name}"
    (new Shape(s"$prefix.${key.name}", key, repDef, 1, Array(repDef)),
      new Shape(s"$prefix.${value.name}", value, repDef + valOpt, 1,
        Array(repDef)))
  }

  private def levelWidth(maxLevel: Int): Int =
    32 - Integer.numberOfLeadingZeros(maxLevel)

  // value kinds for readColumn (which boxed type the face yields)
  private final val KLong = 0
  private final val KString = 1
  private final val KDouble = 2
  private final val KInt96 = 3 // INT96 timestamps, yielded as epoch micros
  private final val KBool = 4 // BOOLEAN (PLAIN bit-packed / v2 RLE)

  /** Decodes every page of one column chunk into its definition /
    * repetition level streams and the boxed non-null value stream
    * (java.lang.Long / UTF8String / java.lang.Double / Boolean per
    * `kind`). All claim bounds enforced here. */
  private def decodeChunk(b: Array[Byte], chunk: ParquetFooter.ColChunk,
                          shape: Shape, kind: Int)
      : (Array[Int], Array[Int],
         scala.collection.mutable.ArrayBuffer[Any]) = {
        val leaf = shape.leaf
        val maxDef = shape.maxDef
        val maxRep = shape.maxRep
        val wantString = kind == KString
        val defWidth = levelWidth(maxDef)
        val repWidth = levelWidth(maxRep)
        if (chunk.ptype != leaf.ptype) fail()
        // value-count claim bound: numValues is capped like byte claims
        // (MaxPage), but NOT against file bytes — an all-null column's
        // RLE level stream legitimately packs far more than 64 values
        // per file byte, so any density bound falsely declines sparse
        // files. Hostile over-claims are neutralized below instead: the
        // level arrays grow lazily as pages actually deliver values, so
        // a tiny file claiming 64 Mi values allocates only what its
        // pages confirm before the parse fails
        if (chunk.numValues < 0 || chunk.numValues > MaxPage) fail()
        val total = chunk.numValues.toInt
        var pos = {
          val d = chunk.dataPageOffset
          val dict = chunk.dictPageOffset
          if (dict >= 0 && (d < 0 || dict < d)) dict else d
        }
        if (pos < 0 || pos >= b.length) fail()

        // level + value streams for the WHOLE chunk: a v1 page may
        // split a record mid-list, so list assembly must happen after
        // every page of the chunk is decoded. Allocated lazily (doubled
        // per page up to `total`) so a hostile value-count claim costs
        // only what real pages deliver
        var defs = new Array[Int](math.min(total, 1 << 16))
        var reps = new Array[Int](math.min(total, 1 << 16))
        def ensureLevels(n: Int): Unit = if (n > defs.length) {
          var cap = math.max(defs.length, 1)
          while (cap < n) cap = math.min(total, cap * 2)
          defs = java.util.Arrays.copyOf(defs, cap)
          reps = java.util.Arrays.copyOf(reps, cap)
        }
        val vals = scala.collection.mutable.ArrayBuffer.empty[Any]

        var dictLongs: Array[Long] = null
        var dictBytes: Array[Array[Byte]] = null
        var dictDoubles: Array[Double] = null
        var dictMicros: Array[Long] = null
        var produced = 0
        while (produced < total) {
          val r = new ParquetFooter.TReader(b, pos.toInt, b.length)
          val h = parsePageHeader(r)
          if (h.compressed < 0 || h.uncompressed < 0) fail() // no backward walk
          val dataStart = r.pos
          pos = dataStart.toLong + h.compressed

          /** Decodes nNonNull values of a data page's value region and
            * appends them to the chunk's value stream. */
          def decodeValues(values: Array[Byte], cur0: Int, nNonNull: Int,
                           encoding: Int): Unit = {
            val a: Array[Any] = encoding match {
              case 2 | 8 => // PLAIN_DICTIONARY / RLE_DICTIONARY indices
                var cur = cur0
                if (cur >= values.length && nNonNull > 0) fail()
                val bw = if (nNonNull > 0) values(cur) & 0xff else 0
                if (nNonNull > 0) cur += 1
                val idx = new Array[Int](nNonNull)
                if (nNonNull > 0) rleHybrid(values, cur, values.length, bw, nNonNull, idx)
                val a = new Array[Any](nNonNull)
                var i = 0
                while (i < nNonNull) {
                  val ix = idx(i)
                  kind match {
                    case KString =>
                      if (dictBytes == null || ix < 0 || ix >= dictBytes.length) fail()
                      a(i) = UTF8String.fromBytes(dictBytes(ix))
                    case KLong =>
                      if (dictLongs == null || ix < 0 || ix >= dictLongs.length) fail()
                      a(i) = java.lang.Long.valueOf(dictLongs(ix))
                    case KDouble =>
                      if (dictDoubles == null || ix < 0 || ix >= dictDoubles.length) fail()
                      a(i) = java.lang.Double.valueOf(dictDoubles(ix))
                    case _ =>
                      if (dictMicros == null || ix < 0 || ix >= dictMicros.length) fail()
                      a(i) = java.lang.Long.valueOf(dictMicros(ix))
                  }
                  i += 1
                }
                a
              case 0 if kind == KBool => // PLAIN booleans: LSB bit-packed
                if (cur0 + ((nNonNull + 7) >> 3) > values.length) fail()
                Array.tabulate[Any](nNonNull)(i => java.lang.Boolean.valueOf(
                  ((values(cur0 + (i >> 3)) >> (i & 7)) & 1) == 1))
              case 0 => // PLAIN
                val p = new Plain(values, cur0)
                Array.tabulate[Any](nNonNull)(_ => kind match {
                  case KString => UTF8String.fromBytes(p.nextBytes())
                  case KLong => java.lang.Long.valueOf(p.nextLong(leaf.ptype))
                  case KDouble => java.lang.Double.valueOf(p.nextDouble(leaf.ptype))
                  case _ => java.lang.Long.valueOf(p.nextInt96Micros())
                })
              case 3 => // RLE values (v2 booleans): 4-byte len + runs
                if (kind != KBool) fail()
                val len = leInt(values, cur0)
                if (len < 0 || cur0 + 4 + len > values.length) fail()
                val idx = new Array[Int](nNonNull)
                if (nNonNull > 0)
                  rleHybrid(values, cur0 + 4, cur0 + 4 + len, 1, nNonNull, idx)
                idx.map[Any](v => java.lang.Boolean.valueOf(v == 1))
              case 5 => // DELTA_BINARY_PACKED (ints)
                if (kind != KLong) fail()
                val got = deltaBinaryPacked(new Cursor(values, cur0))
                if (got.length != nNonNull) fail()
                // INT32 columns carry 32-bit semantics: truncate like a
                // 32-bit reader would
                got.map[Any](v => java.lang.Long.valueOf(
                  if (leaf.ptype == 1) v.toInt.toLong else v))
              case 6 => // DELTA_LENGTH_BYTE_ARRAY (strings)
                if (!wantString) fail()
                deltaLengthByteArray(new Cursor(values, cur0), nNonNull)
                  .map[Any](UTF8String.fromBytes)
              case 7 => // DELTA_BYTE_ARRAY (strings)
                if (!wantString) fail()
                deltaByteArray(new Cursor(values, cur0), nNonNull)
                  .map[Any](UTF8String.fromBytes)
              case _ => fail()
            }
            vals ++= a
          }

          /** Bounds-checks the page's levels and counts its non-null
            * values (def == maxDef). */
          def countNonNull(from: Int, nv: Int): Int = {
            var nNonNull = 0
            var k = from
            while (k < from + nv) {
              if (defs(k) < 0 || defs(k) > maxDef ||
                reps(k) < 0 || reps(k) > maxRep) fail()
              if (defs(k) == maxDef) nNonNull += 1
              k += 1
            }
            nNonNull
          }

          if (h.ptype == 2) { // dictionary page (PLAIN / PLAIN_DICTIONARY)
            if (h.encoding != 0 && h.encoding != 2) fail()
            val d = decompress(b, dataStart, h.compressed, h.uncompressed, chunk.codec)
            val p = new Plain(d, 0)
            // every PLAIN dict entry consumes a fixed minimum width, so
            // the count claim is bounded EXACTLY by the decompressed
            // bytes before any entry array is allocated
            val minEntryBytes = kind match {
              case KString => 4 // 4-byte length prefix
              case KLong => if (leaf.ptype == 1) 4 else 8
              case KDouble => if (leaf.ptype == 4) 4 else 8
              case KInt96 => 12
              case _ => 1
            }
            if (h.numValues < 0 || h.numValues > MaxPage ||
              h.numValues.toLong * minEntryBytes > d.length) fail()
            kind match {
              case KString =>
                dictBytes = Array.fill(h.numValues)(p.nextBytes())
              case KLong =>
                dictLongs = Array.tabulate(h.numValues)(_ => p.nextLong(leaf.ptype))
              case KDouble =>
                dictDoubles = Array.tabulate(h.numValues)(_ => p.nextDouble(leaf.ptype))
              case KInt96 =>
                dictMicros = Array.tabulate(h.numValues)(_ => p.nextInt96Micros())
              case _ => fail() // booleans are never dictionary-encoded
            }
          } else if (h.ptype == 0) { // data page v1: [rep][def][values]
            val d = decompress(b, dataStart, h.compressed, h.uncompressed, chunk.codec)
            val nv = h.numValues
            if (nv < 0 || produced + nv > total) fail()
            ensureLevels(produced + nv)
            var cur = 0
            if (repWidth > 0) {
              val len = leInt(d, cur)
              if (len < 0 || cur + 4 + len > d.length) fail()
              rleHybrid(d, cur + 4, cur + 4 + len, repWidth, nv, reps, produced)
              cur += 4 + len
            }
            if (defWidth > 0) {
              val len = leInt(d, cur)
              if (len < 0 || cur + 4 + len > d.length) fail()
              rleHybrid(d, cur + 4, cur + 4 + len, defWidth, nv, defs, produced)
              cur += 4 + len
            } else {
              java.util.Arrays.fill(defs, produced, produced + nv, maxDef)
            }
            decodeValues(d, cur, countNonNull(produced, nv), h.encoding)
            produced += nv
          } else if (h.ptype == 3) { // data page v2: levels uncompressed
            val nv = h.numValues
            if (nv < 0 || produced + nv > total) fail()
            ensureLevels(produced + nv)
            if (h.repBytes < 0 || h.defBytes < 0 ||
              h.repBytes + h.defBytes > h.compressed) fail()
            if (dataStart + h.compressed > b.length) fail()
            if (repWidth > 0) {
              rleHybrid(b, dataStart, dataStart + h.repBytes, repWidth, nv,
                reps, produced)
            } else if (h.repBytes != 0) fail()
            val defStart = dataStart + h.repBytes
            if (defWidth > 0) {
              if (h.defBytes == 0 && nv > 0) fail()
              rleHybrid(b, defStart, defStart + h.defBytes, defWidth, nv,
                defs, produced)
            } else {
              if (h.defBytes != 0) fail()
              java.util.Arrays.fill(defs, produced, produced + nv, maxDef)
            }
            val nNonNull = countNonNull(produced, nv)
            if (h.numNulls >= 0 && nv - nNonNull != h.numNulls) fail()
            val levelBytes = h.repBytes + h.defBytes
            val valuesComp = h.compressed - levelBytes
            val valuesUncomp = h.uncompressed - levelBytes
            val d =
              if (h.v2Compressed)
                decompress(b, dataStart + levelBytes, valuesComp, valuesUncomp,
                  chunk.codec)
              else decompress(b, dataStart + levelBytes, valuesComp, valuesComp, 0)
            decodeValues(d, 0, nNonNull, h.encoding)
            produced += nv
          } else if (h.ptype == 1) {
            () // index page: no values, skip its bytes
          } else fail()
          if (pos > b.length) fail()
        }

        (defs, reps, vals)
  }

  /** Flat-column assembly: null-interleave by def level. */
  private def assembleFlat(maxDef: Int, defs: Array[Int],
      vals: scala.collection.mutable.ArrayBuffer[Any],
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var vi = 0
    var k = 0
    while (k < defs.length) {
      if (defs(k) == maxDef) { out += vals(vi); vi += 1 }
      else out += null
      k += 1
    }
    if (vi != vals.length) fail()
  }

  /** Dremel record assembly for ANY list depth (maxRep ≥ 1): walks the
    * (rep, def) stream keeping one open container per repetition
    * level. rep = the deepest level this entry CONTINUES (0 = new
    * record); def decides how deep the entry reaches — below a level's
    * null threshold the container is null, at it the container is
    * empty, at maxDef a value. Appends one value (container tree or
    * null) per record to `out`. */
  private def assembleLists(shape: Shape, defs: Array[Int],
      reps: Array[Int], vals: scala.collection.mutable.ArrayBuffer[Any],
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val L = shape.maxRep
    val maxDef = shape.maxDef
    var vi = 0
    val buf = new Array[scala.collection.mutable.ArrayBuffer[Any]](L + 1)
    var recOpen = false
    var recNull = false

    def materialize(v: Any): Any = v match {
      case ab: scala.collection.mutable.ArrayBuffer[_] =>
        new GenericArrayData(ab.map(materialize).toArray)
      case other => other
    }
    def close(): Unit = if (recOpen) {
      out += (if (recNull) null else materialize(buf(1)))
    }
    /** Fills the entry's reach from depth k0 (whose container exists
      * and has an entry) downward per `d`. */
    def fillFrom(k0: Int, d: Int): Unit = {
      var k = k0
      var done = false
      while (!done) {
        if (k == L) {
          if (d == maxDef) { buf(k) += vals(vi); vi += 1 }
          else buf(k) += null
          done = true
        } else {
          val emptyAt = shape.optBefore(k + 1)
          if (d < emptyAt) { buf(k) += null; done = true }
          else {
            val child = scala.collection.mutable.ArrayBuffer.empty[Any]
            buf(k) += child
            buf(k + 1) = child
            if (d >= shape.defOfRep(k)) k += 1
            else done = true // defined but EMPTY child list
          }
        }
      }
      // stale deeper containers must not be continuable
      var j = k + 1
      while (j <= L) { buf(j) = null; j += 1 }
    }

    var i = 0
    while (i < defs.length) {
      val r = reps(i)
      val d = defs(i)
      if (r < 0 || r > L) fail()
      if (r == 0) {
        close()
        recOpen = true
        java.util.Arrays.fill(buf.asInstanceOf[Array[AnyRef]], null)
        if (d < shape.optBefore(1)) recNull = true
        else {
          recNull = false
          buf(1) = scala.collection.mutable.ArrayBuffer.empty[Any]
          if (d >= shape.defOfRep(0)) fillFrom(1, d)
        }
      } else {
        // a continuation entry must land in an OPEN container with an
        // actual occurrence at its level (a null/empty container is a
        // whole record — it cannot be continued)
        if (!recOpen || recNull || buf(r) == null) fail()
        if (d < shape.defOfRep(r - 1)) fail()
        fillFrom(r, d)
      }
      i += 1
    }
    close()
    if (vi != vals.length) fail()
  }

  /** Reads one column (flat or `wantRep`-deep lists); flat elements
    * are boxed java.lang.Long / UTF8String / java.lang.Double / null
    * per `kind`, list elements GenericArrayData / null, nested per
    * depth. With a `range`, row groups whose footer [min, max] cannot
    * intersect it are SKIPPED — their pages are never touched (the
    * stats-based pruning an engine does before any I/O; groups
    * without stats are conservatively kept). Returns
    * (n_groups, kept_groups, values) or null on any unsupported or
    * malformed structure. */
  private def readColumn(b: Array[Byte], colName: String,
                         kind: Int, wantRep: Int,
                         range: (Long, Long) = null): (Int, Int, Array[Any]) = {
    val f = ParquetFooter.parse(b)
    if (f == null) return null
    try {
      val shape = resolveShape(f, colName)
      if (shape.maxRep != wantRep) fail()
      val leaf = shape.leaf
      kind match {
        case KLong => if (leaf.ptype != 1 && leaf.ptype != 2) fail()
        case KString => if (leaf.ptype != 6) fail()
        case KDouble => if (leaf.ptype != 4 && leaf.ptype != 5) fail()
        case KInt96 => if (leaf.ptype != 3) fail()
        case _ => if (leaf.ptype != 0) fail() // BOOLEAN
      }
      if (range != null && (kind != KLong || wantRep != 0)) fail()

      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var kept = 0
      f.rowGroups.foreach { rg =>
        val chunk = rg.columns.find(_.path == shape.path).getOrElse(fail())
        val pruned = range != null && {
          val (lo, hi) = range
          statLong(chunk, wantMax = false).exists(_ > hi) ||
            statLong(chunk, wantMax = true).exists(_ < lo)
        }
        if (!pruned) {
          kept += 1
          val (defs, reps, vals) = decodeChunk(b, chunk, shape, kind)
          if (shape.maxRep == 0) assembleFlat(shape.maxDef, defs, vals, out)
          else assembleLists(shape, defs, reps, vals, out)
        }
      }
      (f.rowGroups.length, kept, out.toArray)
    } catch {
      case Malformed => null
      case ParquetFooter.Malformed => null // walker primitives' sentinel
    }
  }

  /** Reads a map<string-or-int, int-like> column: both leaf chunks
    * decode independently (keys, values), assemble as one-level lists,
    * and zip row-by-row into the deterministic sorted `k=v` CSV face
    * (null map → null row; null value → `k=`). String keys sort
    * lexicographically; integer keys (the Iceberg column-stats map
    * shape, map<int,long>) numerically. */
  private def readMap(b: Array[Byte], colName: String): Array[Any] = {
    val f = ParquetFooter.parse(b)
    if (f == null) return null
    try {
      val (kShape, vShape) = resolveMapShapes(f, colName)
      val intKeys = kShape.leaf.ptype == 1 || kShape.leaf.ptype == 2
      if (!intKeys && kShape.leaf.ptype != 6) fail()
      if (vShape.leaf.ptype != 1 && vShape.leaf.ptype != 2) fail()
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      f.rowGroups.foreach { rg =>
        val kc = rg.columns.find(_.path == kShape.path).getOrElse(fail())
        val vc = rg.columns.find(_.path == vShape.path).getOrElse(fail())
        val krows = scala.collection.mutable.ArrayBuffer.empty[Any]
        val vrows = scala.collection.mutable.ArrayBuffer.empty[Any]
        val (kd, kr, kv) = decodeChunk(b, kc, kShape,
          if (intKeys) KLong else KString)
        assembleLists(kShape, kd, kr, kv, krows)
        val (vd, vr, vv) = decodeChunk(b, vc, vShape, KLong)
        assembleLists(vShape, vd, vr, vv, vrows)
        if (krows.length != vrows.length) fail()
        var i = 0
        while (i < krows.length) {
          (krows(i), vrows(i)) match {
            case (null, null) => out += null
            case (ks: ArrayData, vs: ArrayData) =>
              if (ks.numElements() != vs.numElements()) fail()
              val pairs = (0 until ks.numElements()).map { j =>
                if (ks.isNullAt(j)) fail() // keys are required
                val (k, ord) =
                  if (intKeys) {
                    val x = ks.getLong(j)
                    (x.toString, x)
                  } else (ks.getUTF8String(j).toString, 0L)
                val v = if (vs.isNullAt(j)) "" else vs.getLong(j).toString
                (k, v, ord)
              }
              val sorted =
                if (intKeys) pairs.sortBy(_._3) else pairs.sortBy(_._1)
              out += UTF8String.fromString(sorted
                .map { case (k, v, _) => s"$k=$v" }.mkString(","))
            case _ => fail() // torn key/value presence
          }
          i += 1
        }
      }
      out.toArray
    } catch {
      case Malformed => null
      case ParquetFooter.Malformed => null
    }
  }

  private def face(b: Array[Byte], colName: UTF8String, kind: Int,
                   wantRep: Int): ArrayData = {
    if (b == null || colName == null) return null
    val r = readColumn(b, colName.toString, kind, wantRep)
    if (r == null) null else new GenericArrayData(r._3)
  }
  def int64Values(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KLong, wantRep = 0)
  def stringValues(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KString, wantRep = 0)
  def doubleValues(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KDouble, wantRep = 0)
  /** One-level LIST faces: one array (or null) per row. */
  def int64ListValues(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KLong, wantRep = 1)
  def stringListValues(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KString, wantRep = 1)
  def doubleListValues(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KDouble, wantRep = 1)
  /** Two-level LIST face: one array-of-arrays (or null) per row. */
  def int64List2Values(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KLong, wantRep = 2)
  /** MAP face: string→int map per row as a sorted `k=v` CSV string. */
  def mapInt64Csv(b: Array[Byte], colName: UTF8String): ArrayData = {
    if (b == null || colName == null) return null
    val r = readMap(b, colName.toString)
    if (r == null) null else new GenericArrayData(r)
  }
  /** INT96 timestamp column as epoch microseconds. */
  def int96Micros(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KInt96, wantRep = 0)
  /** BOOLEAN column. */
  def boolValues(b: Array[Byte], colName: UTF8String): ArrayData =
    face(b, colName, KBool, wantRep = 0)

  /** Stats-pruned int read: struct(n_groups, kept_groups, values). */
  def int64ValuesPruned(b: Array[Byte], colName: UTF8String,
                        lo: Long, hi: Long): org.apache.spark.sql.catalyst.InternalRow = {
    if (b == null || colName == null) return null
    val r = readColumn(b, colName.toString, KLong,
      wantRep = 0, range = (lo, hi))
    if (r == null) null
    else org.apache.spark.sql.catalyst.InternalRow(r._1, r._2,
      new GenericArrayData(r._3))
  }

  // ---- expressions ----

  abstract class PagesProbe extends BinaryExpression {
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
    override def nullSafeEval(b: Any, c: Any): Any = {
      val r = method match {
        case "int64Values" =>
          ParquetPages.int64Values(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "stringValues" =>
          ParquetPages.stringValues(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "int64ListValues" =>
          ParquetPages.int64ListValues(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "stringListValues" =>
          ParquetPages.stringListValues(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "doubleValues" =>
          ParquetPages.doubleValues(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "doubleListValues" =>
          ParquetPages.doubleListValues(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "int96Micros" =>
          ParquetPages.int96Micros(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "boolValues" =>
          ParquetPages.boolValues(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "int64List2Values" =>
          ParquetPages.int64List2Values(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
        case "mapInt64Csv" =>
          ParquetPages.mapInt64Csv(b.asInstanceOf[Array[Byte]],
            c.asInstanceOf[UTF8String])
      }
      r
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bytes, name) => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.ParquetPages.$method($bytes, $name);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
  }

  case class ParquetInt64Column(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "int64Values"
    override def elemType: DataType = LongType
    override def prettyName: String = "parquet_int64_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetStringColumn(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "stringValues"
    override def elemType: DataType = StringType
    override def prettyName: String = "parquet_string_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetInt64ListColumn(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "int64ListValues"
    override def elemType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "parquet_int64_list_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetStringListColumn(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "stringListValues"
    override def elemType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "parquet_string_list_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetDoubleColumn(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "doubleValues"
    override def elemType: DataType = DoubleType
    override def prettyName: String = "parquet_double_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetDoubleListColumn(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "doubleListValues"
    override def elemType: DataType = ArrayType(DoubleType, containsNull = true)
    override def prettyName: String = "parquet_double_list_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetInt64List2Column(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "int64List2Values"
    override def elemType: DataType =
      ArrayType(ArrayType(LongType, containsNull = true), containsNull = true)
    override def prettyName: String = "parquet_int64_list2_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetMapInt64Csv(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "mapInt64Csv"
    override def elemType: DataType = StringType
    override def prettyName: String = "parquet_map_int64_csv"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetInt96Micros(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "int96Micros"
    override def elemType: DataType = LongType
    override def prettyName: String = "parquet_int96_micros"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
  case class ParquetBoolColumn(left: Expression, right: Expression)
      extends PagesProbe {
    override def method: String = "boolValues"
    override def elemType: DataType = BooleanType
    override def prettyName: String = "parquet_bool_column"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Stats-pruned read face: struct(n_groups, kept_groups, values).
    * `lo`/`hi` are plan-time constants (the pushed-down predicate). */
  case class ParquetInt64Pruned(left: Expression, right: Expression,
                                lo: Long, hi: Long) extends BinaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "parquet_int64_pruned"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, string) inputs")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("n_groups", IntegerType, nullable = false),
      StructField("kept_groups", IntegerType, nullable = false),
      StructField("values", ArrayType(LongType, containsNull = true))))
    override def nullSafeEval(b: Any, c: Any): Any =
      ParquetPages.int64ValuesPruned(b.asInstanceOf[Array[Byte]],
        c.asInstanceOf[UTF8String], lo, hi)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bytes, name) => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.ParquetPages.int64ValuesPruned($bytes, $name, ${lo}L, ${hi}L);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def int64PrunedCol(content: Column, colName: Column, lo: Long, hi: Long): Column =
    SparkInternals.column(ParquetInt64Pruned(
      SparkInternals.expression(content), SparkInternals.expression(colName),
      lo, hi))

  def int64ColumnCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetInt64Column(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def stringColumnCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetStringColumn(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def int64ListColumnCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetInt64ListColumn(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def stringListColumnCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetStringListColumn(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def doubleColumnCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetDoubleColumn(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def doubleListColumnCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetDoubleListColumn(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def int64List2ColumnCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetInt64List2Column(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def mapInt64CsvCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetMapInt64Csv(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def int96MicrosCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetInt96Micros(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
  def boolColumnCol(content: Column, colName: Column): Column =
    SparkInternals.column(ParquetBoolColumn(
      SparkInternals.expression(content), SparkInternals.expression(colName)))
}
