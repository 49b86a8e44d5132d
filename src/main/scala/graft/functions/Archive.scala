package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Archive container walk — the packaging tier of corpus ingestion.
  * Real corpora arrive as archives (web dumps, book collections, code
  * snapshots); a crawl/ingest engine that parses WARC and multi-member
  * gzip (functions/BinaryMeta) but cannot open a .zip or .tar still
  * leaves the most common packaging unread. Same total-parser contract
  * as the rest of the decode tier: pure byte layout + the JDK's public
  * `java.util.zip.Inflater`/`CRC32`, anything malformed yields null,
  * never throws; per-ENTRY defects (unsupported method, CRC mismatch,
  * encrypted) null that entry's `data` but keep it listed, so a
  * partially-readable archive still inventories completely.
  *
  * Scale shape: map-side, one pass per payload, entries never leave
  * their partition; callers explode the returned array. Reference
  * scope: beyond-reference corpus surface (the reference treats all
  * payloads as opaque).
  */
object Archive {

  // ---- ZIP (PKWARE APPNOTE) ----

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** Entries of a ZIP archive as (name, method, usize, data) rows,
    * walked through the END-OF-CENTRAL-DIRECTORY record and the
    * central directory (the authoritative index — local headers may
    * carry zeros + data descriptors, so sizes/CRCs read from the CD):
    * method 0 (stored) slices, method 8 (deflate) inflates through the
    * JDK `Inflater`; every extracted entry's CRC-32 is VERIFIED and a
    * mismatch, an unsupported method, or an encrypted entry (flag bit
    * 0) nulls `data` while keeping the listing row. Names decode UTF-8
    * when flag bit 11 says so, Latin-1 otherwise (the cp437 subset
    * that survives either way is what corpus names use). ZIP64
    * archives decline whole (null) — the 0xFFFF/0xFFFFFFFF sentinels
    * are checked, not misread. Null for anything that is not a
    * walkable ZIP. */
  def zipEntries(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 22) return null
    // EOCD: scan backwards over the (≤64K) comment for PK\5\6
    var e = b.length - 22
    val stopAt = math.max(0, b.length - 22 - 65535)
    while (e >= stopAt && !(b(e) == 0x50 && b(e + 1) == 0x4B &&
        b(e + 2) == 0x05 && b(e + 3) == 0x06)) e -= 1
    if (e < stopAt) return null
    if (u16(b, e + 4) != 0 || u16(b, e + 6) != 0) return null // multi-disk
    val count = u16(b, e + 10)
    val cdSize = u32(b, e + 12)
    val cdOff = u32(b, e + 16)
    if (count == 0xFFFF || cdOff == 0xFFFFFFFFL ||
      cdSize == 0xFFFFFFFFL) return null // zip64
    if (cdOff + cdSize > e) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var p = cdOff.toInt
    var k = 0
    while (k < count) {
      if (p + 46 > e || u32(b, p) != 0x02014b50L) return null
      val flags = u16(b, p + 8)
      val method = u16(b, p + 10)
      val crc = u32(b, p + 16)
      val csize = u32(b, p + 20)
      val usize = u32(b, p + 24)
      val nameLen = u16(b, p + 28)
      val extraLen = u16(b, p + 30)
      val commentLen = u16(b, p + 32)
      val local = u32(b, p + 42)
      if (p + 46 + nameLen > e) return null
      if (csize == 0xFFFFFFFFL || usize == 0xFFFFFFFFL ||
        local == 0xFFFFFFFFL) return null // zip64
      val cs = if ((flags & 0x800) != 0) java.nio.charset.StandardCharsets.UTF_8
        else java.nio.charset.StandardCharsets.ISO_8859_1
      val name = new String(b, p + 46, nameLen, cs)
      val data: Array[Byte] =
        if ((flags & 1) != 0) null // encrypted
        else if (local + 30 > b.length) null
        else {
          val lp = local.toInt
          if (u32(b, lp) != 0x04034b50L) null
          else {
            val lNameLen = u16(b, lp + 26)
            val lExtraLen = u16(b, lp + 28)
            val d = lp + 30 + lNameLen + lExtraLen
            if (d + csize > b.length || usize > (1L << 28)) null
            else {
              val raw =
                if (method == 0) {
                  if (csize != usize) null
                  else java.util.Arrays.copyOfRange(b, d, d + usize.toInt)
                } else if (method == 8) {
                  val inf = new java.util.zip.Inflater(true)
                  try {
                    inf.setInput(b, d, csize.toInt)
                    val outBuf = new Array[Byte](usize.toInt)
                    var got = 0
                    var stalled = false
                    while (got < usize && !inf.finished() && !stalled) {
                      val n = inf.inflate(outBuf, got, usize.toInt - got)
                      if (n == 0) stalled = true else got += n
                    }
                    if (got == usize) outBuf else null
                  } catch {
                    case _: java.util.zip.DataFormatException => null
                  } finally inf.end()
                } else null
              if (raw == null) null
              else {
                val c = new java.util.zip.CRC32()
                c.update(raw)
                if (c.getValue == crc) raw else null
              }
            }
          }
        }
      out += InternalRow(UTF8String.fromString(name), method,
        usize, data)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    if (out.isEmpty) null else new GenericArrayData(out.toArray)
  }

  // ---- TAR (POSIX ustar + V7 + GNU longname) ----

  /** NUL/space-terminated octal field, or -1 when malformed (a 0x80
    * lead byte = GNU base-256 big-file encoding — declined). */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    if ((b(off) & 0x80) != 0) return -1L
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ')) i += 1 // leading spaces
    var digits = 0
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; digits += 1
      if (v > (1L << 40)) return -1L
    }
    if (digits == 0) -1L else v
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var e = off
    val end = off + len
    while (e < end && b(e) != 0) e += 1
    new String(b, off, e - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Entries of a tar archive as (name, typeflag, size, data) rows:
    * 512-byte headers with VERIFIED checksums (sum of header bytes
    * with the checksum field as spaces; both the unsigned sum and the
    * historic signed-byte sum accepted), ustar prefix field joined to
    * the name, GNU 'L' longname records applied to the following
    * entry, pax 'x'/'g' records skipped (their own header row is not
    * emitted — they are metadata, not members). Regular files
    * (typeflag '0' or NUL) carry their data; every other type lists
    * with null data. The archive ends at the conventional two zero
    * blocks (a single zero block at EOF is tolerated). Null for
    * anything that is not a walkable tar. */
  def tarEntries(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 512) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var p = 0
    var pendingName: String = null
    var done = false
    while (!done && p + 512 <= b.length) {
      var allZero = true
      var z = p
      while (allZero && z < p + 512) { if (b(z) != 0) allZero = false; z += 1 }
      if (allZero) done = true
      else {
        // checksum: field 148-155 counted as spaces
        val stored = octal(b, p + 148, 8)
        if (stored < 0) return null
        var unsigned = 0L
        var signed = 0L
        var i = p
        while (i < p + 512) {
          val raw = if (i >= p + 148 && i < p + 156) 32 else b(i).toInt
          unsigned += raw & 0xFF
          signed += raw
          i += 1
        }
        if (stored != unsigned && stored != signed) return null
        val size = octal(b, p + 124, 12)
        if (size < 0 || p + 512L + size > b.length) return null
        val tf = b(p + 156) & 0xFF
        val ustar = b.length >= p + 263 && b(p + 257) == 'u' &&
          b(p + 258) == 's' && b(p + 259) == 't' && b(p + 260) == 'a' &&
          b(p + 261) == 'r'
        val rawName = {
          val base = cstr(b, p, 100)
          val prefix = if (ustar) cstr(b, p + 345, 155) else ""
          if (prefix.isEmpty) base else s"$prefix/$base"
        }
        val dataStart = p + 512
        val dataEnd = (dataStart + size).toInt
        if (tf == 'L') { // GNU longname: data names the NEXT entry
          pendingName = cstr(b, dataStart, dataEnd - dataStart)
        } else if (tf == 'x' || tf == 'g') {
          // pax extended headers: metadata records, not members
          // (documented simplification: pax path= overrides not applied)
        } else {
          val name = if (pendingName != null) pendingName else rawName
          pendingName = null
          val isFile = tf == '0' || tf == 0
          val data =
            if (!isFile) null
            else java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
          val tfStr = if (tf == 0) "0" else String.valueOf(tf.toChar)
          out += InternalRow(UTF8String.fromString(name),
            UTF8String.fromString(tfStr), size, data)
        }
        p += 512 + (((size + 511) / 512) * 512).toInt
      }
    }
    if (out.isEmpty) null else new GenericArrayData(out.toArray)
  }

  // ---- expressions (codegen'd; same surface as BinaryMeta probes) ----

  case class ZipEntries(child: Expression) extends BinaryMeta.BinaryProbe {
    override def prettyName: String = "zip_entries"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("method", IntegerType, nullable = false),
      StructField("usize", LongType, nullable = false),
      StructField("data", BinaryType))), containsNull = false)
    override def nullSafeEval(v: Any): Any =
      zipEntries(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.Archive.zipEntries($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class TarEntries(child: Expression) extends BinaryMeta.BinaryProbe {
    override def prettyName: String = "tar_entries"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("typeflag", StringType),
      StructField("size", LongType, nullable = false),
      StructField("data", BinaryType))), containsNull = false)
    override def nullSafeEval(v: Any): Any =
      tarEntries(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.Archive.tarEntries($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def zipEntriesCol(c: Column): Column =
    SparkInternals.column(ZipEntries(SparkInternals.expression(c)))
  def tarEntriesCol(c: Column): Column =
    SparkInternals.column(TarEntries(SparkInternals.expression(c)))
}
