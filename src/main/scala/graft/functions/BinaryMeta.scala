package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-format header parsing over opaque `binary` media columns —
  * the REAL half of the multimodal metadata step (`llm/Multimodal`):
  * PNG / JPEG / GIF / BMP dimensions and WAV audio parameters read
  * straight from the public byte layouts (PNG spec §5.2/11.2.2, JPEG
  * SOFn segments per ITU-T T.81 §B.2.2, GIF89a logical screen
  * descriptor, BMP BITMAPINFOHEADER, RIFF/WAVE fmt chunk). No codec
  * library involved — dimension/rate extraction needs only the headers,
  * so a 100 TB media-manifest pass (group by resolution, filter by
  * sample rate, detect mislabeled blobs) runs as a pure codegen'd scan
  * with the payload bytes never leaving the partition. Since round 10
  * the DECODE tier below is real too — PCM/G.711 samples, BMP/GIF/PNG
  * pixels, baseline grayscale JPEG, and the perceptual dHash built on
  * the positioned-luma faces; `Multimodal`'s header states the narrow
  * remaining stub boundary.
  *
  * All parsers are total: any malformed/truncated/foreign input yields
  * null (sentinel -1 from the static helpers), never an exception —
  * the property that matters on a crawl where every byte string occurs.
  *
  * Reference behavior mirrored: gmall-flink treats media attachments as
  * opaque strings end-to-end; this surface is a beyond-reference
  * extension (SURVEY §2.10).
  */
object BinaryMeta {

  // ---- static parsers (called from both eval and generated code) ----

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  /** Scan JPEG segments for the first SOFn (C0–CF except C4/C8/CC —
    * the frame headers that carry dimensions). Returns the byte offset
    * of the SOF payload (after the 2-byte length), or -1. */
  private def jpegSofOffset(b: Array[Byte]): Int = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return -1 // desynchronized: not a marker
      val m = b(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill byte
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
      else {
        val len = u16be(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return -1
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (len < 7) return -1
          return i + 4 // skip marker (2) + length (2)
        }
        i += 2 + len
      }
    }
    -1
  }

  /** Offset of a RIFF sub-chunk's payload (after the 8-byte chunk
    * header), or -1. Chunks are word-aligned (odd sizes pad a byte). */
  private def wavChunkOffset(b: Array[Byte], c0: Char, c1: Char, c2: Char,
                             c3: Char): Int = {
    var i = 12
    while (i + 8 <= b.length) {
      val size = u32le(b, i + 4)
      if (b(i) == c0 && b(i + 1) == c1 && b(i + 2) == c2 && b(i + 3) == c3)
        return if (i + 8 + size <= b.length || size == 0) i + 8 else -1
      val step = 8L + size + (size & 1L)
      if (step <= 0 || i + step > Int.MaxValue) return -1
      i += step.toInt
    }
    -1
  }

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def hasId3(b: Array[Byte], at: Int): Boolean =
    at + 10 <= b.length && b(at) == 'I' && b(at + 1) == 'D' && b(at + 2) == '3'

  /** Total bytes of ID3v2 tag(s) at `at` (header + syncsafe size +
    * optional footer, chained tags summed), or -1 on a malformed
    * syncsafe field. 0 when no tag is present. */
  private def id3Span(b: Array[Byte], at: Int): Long = {
    var p = at.toLong
    while (p + 10 <= b.length && hasId3(b, p.toInt)) {
      var size = 0L
      var k = 0
      while (k < 4) {
        val v = b(p.toInt + 6 + k) & 0xff
        if (v >= 0x80) return -1 // syncsafe bytes carry 7 bits each
        size = (size << 7) | v
        k += 1
      }
      val footer = (b(p.toInt + 5) & 0x10) != 0
      p += 10 + size + (if (footer) 10 else 0)
      if (p > b.length) return -1
    }
    p - at
  }

  /** MPEG audio frame sync at `p`: 0xFF + 3 more sync bits, with
    * NON-ZERO layer bits (zero layer = ADTS AAC, a different walker). */
  private def isMpegAudioSync(b: Array[Byte], p: Int): Boolean =
    p + 4 <= b.length && (b(p) & 0xff) == 0xff && (b(p + 1) & 0xe0) == 0xe0 &&
      ((b(p + 1) >> 1) & 3) != 0

  /** ADTS sync at `p`: 12 sync bits + layer bits 00. */
  private def isAdtsSync(b: Array[Byte], p: Int): Boolean =
    p + 7 <= b.length && (b(p) & 0xff) == 0xff && (b(p + 1) & 0xf0) == 0xf0 &&
      ((b(p + 1) >> 1) & 3) == 0

  /** Container format by signature: "png" | "jpeg" | "gif" | "bmp" |
    * "wav" | "mp4" | "mp3" | "aac", or null for anything else. An
    * ID3v2-prefixed stream reports "mp3" (the dominant convention;
    * `adtsMeta` still reads an ID3-prefixed ADTS stream). */
  def format(b: Array[Byte]): UTF8String =
    if (isPng(b)) FMT_PNG
    else if (isJpeg(b)) FMT_JPEG
    else if (isGif(b)) FMT_GIF
    else if (isBmp(b)) FMT_BMP
    else if (isWav(b)) FMT_WAV
    else if (isMp4(b)) FMT_MP4
    else if (hasId3(b, 0) || isMpegAudioSync(b, 0)) FMT_MP3
    else if (isAdtsSync(b, 0)) FMT_AAC
    else null
  private val FMT_PNG = UTF8String.fromString("png")
  private val FMT_JPEG = UTF8String.fromString("jpeg")
  private val FMT_GIF = UTF8String.fromString("gif")
  private val FMT_BMP = UTF8String.fromString("bmp")
  private val FMT_WAV = UTF8String.fromString("wav")
  private val FMT_MP4 = UTF8String.fromString("mp4")
  private val FMT_MP3 = UTF8String.fromString("mp3")
  private val FMT_AAC = UTF8String.fromString("aac")

  /** Pixel width, or -1 if not an image / malformed. */
  def width(b: Array[Byte]): Int = {
    if (isPng(b)) { val w = u32be(b, 16); if (w > 0 && w <= Int.MaxValue) w.toInt else -1 }
    else if (isGif(b)) { val w = u16le(b, 6); if (w > 0) w else -1 }
    else if (isBmp(b)) { val w = u32le(b, 18); if (w > 0 && w <= Int.MaxValue) w.toInt else -1 }
    else if (isJpeg(b)) {
      val o = jpegSofOffset(b)
      if (o < 0 || o + 5 > b.length) -1
      else { val w = u16be(b, o + 3); if (w > 0) w else -1 }
    } else -1
  }

  /** Pixel height, or -1. BMP height is signed (negative = top-down
    * row order); the magnitude is the dimension. */
  def height(b: Array[Byte]): Int = {
    if (isPng(b)) { val h = u32be(b, 20); if (h > 0 && h <= Int.MaxValue) h.toInt else -1 }
    else if (isGif(b)) { val h = u16le(b, 8); if (h > 0) h else -1 }
    else if (isBmp(b)) {
      val h = u32le(b, 22).toInt
      if (h == 0 || h == Int.MinValue) -1 else math.abs(h)
    } else if (isJpeg(b)) {
      val o = jpegSofOffset(b)
      if (o < 0 || o + 3 > b.length) -1
      else { val h = u16be(b, o + 1); if (h > 0) h else -1 }
    } else -1
  }

  /** WAV sample rate in Hz from the fmt chunk, or -1. */
  def wavSampleRate(b: Array[Byte]): Int = {
    if (!isWav(b)) return -1
    val o = wavChunkOffset(b, 'f', 'm', 't', ' ')
    if (o < 0 || o + 8 > b.length) -1
    else { val r = u32le(b, o + 4); if (r > 0 && r <= Int.MaxValue) r.toInt else -1 }
  }

  /** WAV channel count from the fmt chunk, or -1. */
  def wavChannels(b: Array[Byte]): Int = {
    if (!isWav(b)) return -1
    val o = wavChunkOffset(b, 'f', 'm', 't', ' ')
    if (o < 0 || o + 4 > b.length) -1
    else { val c = u16le(b, o + 2); if (c > 0) c else -1 }
  }

  // bitrate (kbps) tables, ISO/IEC 11172-3 / 13818-3, index 1..14
  private val MP3_BR_V1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val MP3_BR_V1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val MP3_BR_V1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val MP3_BR_V2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val MP3_BR_V2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val MP3_SR_V1 = Array(44100, 48000, 32000)
  private val ADTS_SR = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000)

  /** MPEG audio (MP3/MP2/MP1) header walk: skip ID3v2 tag(s), parse
    * the first frame header. Returns [sample_rate_hz, bitrate_kbps,
    * channels, id3_bytes], or null for free-format/bad/foreign
    * headers. Header-only — no frame decode (psychoacoustic codecs
    * are the documented stub boundary); a 100 TB audio-manifest pass
    * (group by rate/bitrate, find mislabeled blobs) needs only this. */
  def mp3Meta(b: Array[Byte]): Array[Long] = {
    val id3 = id3Span(b, 0)
    if (id3 < 0) return null
    val p = id3.toInt
    if (!isMpegAudioSync(b, p)) return null
    val vb = (b(p + 1) >> 3) & 3  // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    if (vb == 1) return null
    val layer = (b(p + 1) >> 1) & 3 // 1=III, 2=II, 3=I
    val bi = (b(p + 2) >> 4) & 15
    if (bi == 0 || bi == 15) return null // free-format / invalid
    val si = (b(p + 2) >> 2) & 3
    if (si == 3) return null
    val rate = vb match {
      case 3 => MP3_SR_V1(si)
      case 2 => MP3_SR_V1(si) / 2
      case _ => MP3_SR_V1(si) / 4
    }
    val kbps = (vb, layer) match {
      case (3, 3) => MP3_BR_V1L1(bi)
      case (3, 2) => MP3_BR_V1L2(bi)
      case (3, 1) => MP3_BR_V1L3(bi)
      case (_, 3) => MP3_BR_V2L1(bi)
      case _      => MP3_BR_V2L23(bi)
    }
    val channels = if (((b(p + 3) >> 6) & 3) == 3) 1L else 2L
    Array(rate.toLong, kbps.toLong, channels, id3)
  }

  /** ADTS (AAC transport) header walk: skip ID3v2 tag(s), parse the
    * first ADTS header. Returns [sample_rate_hz, channels,
    * frame_length_bytes, aac_profile(1-4)], or null (channel config 0
    * — "in PCE" — and reserved sampling indices decline). Config 7
    * maps to 8 channels per ISO/IEC 14496-3. */
  def adtsMeta(b: Array[Byte]): Array[Long] = {
    val id3 = id3Span(b, 0)
    if (id3 < 0) return null
    val p = id3.toInt
    if (!isAdtsSync(b, p)) return null
    val profile = ((b(p + 2) >> 6) & 3) + 1
    val sfi = (b(p + 2) >> 2) & 15
    if (sfi >= ADTS_SR.length) return null // reserved/forbidden
    val cfg = ((b(p + 2) & 1) << 2) | ((b(p + 3) >> 6) & 3)
    if (cfg == 0) return null // channels in an in-band PCE: undecidable here
    val channels = if (cfg == 7) 8 else cfg
    val frameLen = ((b(p + 3) & 3) << 11) | ((b(p + 4) & 0xff) << 3) |
      ((b(p + 5) >> 5) & 7)
    if (frameLen < 7) return null
    Array(ADTS_SR(sfi).toLong, channels.toLong, frameLen.toLong, profile.toLong)
  }

  private def syncsafe4(b: Array[Byte], at: Int): Long = {
    var size = 0L
    var k = 0
    while (k < 4) {
      val v = b(at + k) & 0xff
      if (v >= 0x80) return -1
      size = (size << 7) | v
      k += 1
    }
    size
  }

  /** ID3v2 TEXT frames (v2.3 / v2.4) — the audio-manifest metadata
    * tier: walks the tag's frame ladder (v2.3 plain-u32 frame sizes,
    * v2.4 syncsafe), extracting every `T…` text frame as
    * (frame_id, text): TIT2/TPE1/TALB and friends. Body decodes per
    * the declared encoding byte (0 ISO-8859-1, 1 UTF-16 BOM,
    * 2 UTF-16BE, 3 UTF-8); v2.4 multi-value NUL separators render as
    * `/`, trailing NULs strip. Frame FORMAT flags honored: grouping-id
    * and v2.4 data-length-indicator bytes are skipped before the
    * encoding byte; compressed / encrypted frames are not
    * text-extractable and are walked past. UNSYNCHRONISATION is
    * honored (round 12): a v2.3 tag-level flag de-unsyncs the whole
    * tag body (FF 00 → FF, v2.3 §5) before the walk; a v2.4
    * per-frame flag de-unsyncs that frame's body (its size is the
    * on-disk size, §6.1). Stops at padding or tag end; malformed
    * frames stop the walk with the prefix frames kept. v2.2 parses
    * too since round 12 (3-byte ids, 3-byte big-endian sizes, no
    * frame flags, tag-level unsync honored; its undefined-scheme
    * compression tag flag declines the whole tag per the spec). Null
    * when nothing extractable. */
  /** ID3v2 de-unsynchronisation (v2.3 §5 / v2.4 §6.1): every FF 00
    * byte pair collapses to FF — the inverse of the transform writers
    * apply so tag bytes never fake an MPEG sync. */
  private def deUnsync(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, to - from))
    var i = from
    while (i < to) {
      out.write(b(i).toInt)
      if ((b(i) & 0xff) == 0xff && i + 1 < to && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  def id3TextFrames(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (!hasId3(b, 0)) return null
    val ver = b(3) & 0xff
    if (ver < 2 || ver > 4) return null
    val flags = b(5) & 0xff
    val tagSize = syncsafe4(b, 6)
    if (tagSize < 0) return null
    val end0 = math.min(10L + tagSize, b.length.toLong).toInt
    // v2.2's second tag flag is 'compression' with no defined scheme —
    // the spec says ignore the whole tag when set
    if (ver == 2 && (flags & 0x40) != 0) return null
    // v2.2/v2.3 tag-level unsync transforms the WHOLE tag body — undo
    // once, then walk normally (their frame sizes refer to the
    // de-unsynced data). v2.4's tag flag just asserts every frame
    // carries its own per-frame flag, which the walk honors below.
    val (buf, pStart, end) =
      if (ver <= 3 && (flags & 0x80) != 0) {
        val d = deUnsync(b, 10, end0)
        (d, 0, d.length)
      } else (b, 10, end0)
    // v2.2 frames: 3-byte id + 3-byte big-endian size, no format flags
    val idLen = if (ver == 2) 3 else 4
    val fhLen = if (ver == 2) 6 else 10
    var p = pStart
    if (ver >= 3 && (flags & 0x40) != 0) { // extended header
      if (p + 4 > end) return null
      val es =
        if (ver == 4) syncsafe4(buf, p) // v2.4: size INCLUDES the field
        else u32be(buf, p) + 4          // v2.3: size EXCLUDES it
      if (es < 4 || p + es > end) return null
      p += es.toInt
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var stop = false
    while (!stop && p + fhLen <= end) {
      if (buf(p) == 0) stop = true // padding
      else {
        var idOk = true
        var k = 0
        while (k < idLen) {
          val c = buf(p + k) & 0xff
          if (!((c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))) idOk = false
          k += 1
        }
        val fsize: Long =
          if (ver == 2)
            (((buf(p + 3) & 0xff) << 16) | ((buf(p + 4) & 0xff) << 8) |
              (buf(p + 5) & 0xff)).toLong
          else if (ver == 4) syncsafe4(buf, p + 4)
          else u32be(buf, p + 4)
        if (!idOk || fsize < 0 || p + fhLen + fsize > end) stop = true
        else {
          // frame FORMAT flags shift or poison the body: compressed /
          // encrypted frames are not text-extractable (skip, keep
          // walking); grouping-id and v2.4 data-length-indicator
          // prepend 1 / 4 bytes; a v2.4 per-frame-unsynchronised body
          // de-unsyncs before decode (fsize is the on-disk size).
          // ORDER MATTERS (v2.4 §4.1.4 + §6.1): the prepended
          // grouping/DLI bytes are PART of the unsynchronised body, so
          // de-unsync the full body first, then skip them from the
          // de-unsynced buffer — a 0xFF grouping byte stored as FF 00
          // would otherwise mis-align everything after it by one byte
          val f2 = if (ver == 2) 0 else buf(p + 9) & 0xff
          val bodyStart = p + fhLen
          val bodyEnd = p + fhLen + fsize.toInt
          var extractable = true
          var frameUnsync = false
          var skip = 0
          if (ver == 4) {
            if ((f2 & 0x0c) != 0) extractable = false
            frameUnsync = (f2 & 0x02) != 0
            if ((f2 & 0x40) != 0) skip += 1
            if ((f2 & 0x01) != 0) skip += 4
          } else {
            if ((f2 & 0xc0) != 0) extractable = false
            if ((f2 & 0x20) != 0) skip += 1
          }
          if (extractable && buf(p) == 'T' && bodyEnd - bodyStart >= 1) {
            val body0 =
              if (frameUnsync) deUnsync(buf, bodyStart, bodyEnd)
              else java.util.Arrays.copyOfRange(buf, bodyStart, bodyEnd)
            val raw =
              if (skip == 0) body0
              else if (skip >= body0.length) Array.empty[Byte]
              else java.util.Arrays.copyOfRange(body0, skip, body0.length)
            val cs = if (raw.length < 1) null else (raw(0) & 0xff) match {
              case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
              case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-led
              case 2 => java.nio.charset.StandardCharsets.UTF_16BE
              case 3 => java.nio.charset.StandardCharsets.UTF_8
              case _ => null
            }
            if (cs != null) {
              val decoded = new String(raw, 1, raw.length - 1, cs)
              val cleaned = decoded.split('\u0000').filter(_.nonEmpty).mkString("/")
              out += org.apache.spark.sql.catalyst.InternalRow(
                UTF8String.fromBytes(
                  java.util.Arrays.copyOfRange(buf, p, p + idLen)),
                UTF8String.fromString(cleaned))
            }
          }
          p += fhLen + fsize.toInt
        }
      }
    }
    if (out.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** FULL MPEG-audio frame walk — the duration tier of the manifest
    * (the one field [[mp3Meta]]'s single-header parse cannot give):
    * skip ID3v2, then walk frame to frame via the spec frame-length
    * arithmetic (Layer I: (12·br/rate + pad)·4; Layer II and MPEG-1
    * Layer III: 144·br/rate + pad; MPEG-2/2.5 Layer III: 72·br/rate +
    * pad — integer floor division, ISO/IEC 11172-3 §2.4.3.1), summing
    * samples per frame (L1 384; L2 1152; L3 1152 / 576 by version).
    * Returns [n_frames, total_samples, duration_ms, bytes_walked]
    * with duration_ms = samples·1000 div first-frame rate (CBR and
    * same-rate VBR exact; the universal convention). The walk STOPS at
    * the first non-sync byte (ID3v1 "TAG" trailer, truncation,
    * garbage) and counts only COMPLETE frames; zero walked frames →
    * null. Header arithmetic only — no psychoacoustic decode. */
  def mp3FrameStats(b: Array[Byte]): Array[Long] = {
    val id3 = id3Span(b, 0)
    if (id3 < 0) return null
    var p = id3.toInt
    var n = 0L; var samples = 0L; var bytes = 0L
    var rate0 = -1L
    var stop = false
    while (!stop && isMpegAudioSync(b, p)) {
      val vb = (b(p + 1) >> 3) & 3
      val layer = (b(p + 1) >> 1) & 3
      val bi = (b(p + 2) >> 4) & 15
      val si = (b(p + 2) >> 2) & 3
      val pad = (b(p + 2) >> 1) & 1
      if (vb == 1 || bi == 0 || bi == 15 || si == 3) stop = true
      else {
        val rate = vb match {
          case 3 => MP3_SR_V1(si)
          case 2 => MP3_SR_V1(si) / 2
          case _ => MP3_SR_V1(si) / 4
        }
        val br = ((vb, layer) match {
          case (3, 3) => MP3_BR_V1L1(bi)
          case (3, 2) => MP3_BR_V1L2(bi)
          case (3, 1) => MP3_BR_V1L3(bi)
          case (_, 3) => MP3_BR_V2L1(bi)
          case _      => MP3_BR_V2L23(bi)
        }) * 1000
        val (spf, flen) = layer match {
          case 3 => (384L, (12 * br / rate + pad) * 4)         // Layer I
          case 2 => (1152L, 144 * br / rate + pad)             // Layer II
          case _ =>                                             // Layer III
            if (vb == 3) (1152L, 144 * br / rate + pad)
            else (576L, 72 * br / rate + pad)
        }
        if (flen <= 4 || p + flen > b.length) stop = true // partial frame
        else {
          n += 1; samples += spf; bytes += flen
          if (rate0 < 0) rate0 = rate
          p += flen
        }
      }
    }
    if (n == 0 || rate0 <= 0) null
    else Array(n, samples, samples * 1000 / rate0, bytes)
  }

  /** FULL ADTS frame walk — [[adtsMeta]]'s duration tier: hop frame to
    * frame via each header's 13-bit frame-length field, 1024 samples
    * per frame (AAC-LC long frame). Returns [n_frames, total_samples,
    * duration_ms, bytes_walked] with duration against the first
    * frame's sampling rate; stops at the first non-sync / reserved-sfi
    * / partial frame; zero frames → null. */
  def adtsFrameStats(b: Array[Byte]): Array[Long] = {
    val id3 = id3Span(b, 0)
    if (id3 < 0) return null
    var p = id3.toInt
    var n = 0L; var bytes = 0L
    var rate0 = -1L
    var stop = false
    while (!stop && isAdtsSync(b, p)) {
      val sfi = (b(p + 2) >> 2) & 15
      val flen = ((b(p + 3) & 3) << 11) | ((b(p + 4) & 0xff) << 3) |
        ((b(p + 5) >> 5) & 7)
      if (sfi >= ADTS_SR.length || flen < 7 || p + flen > b.length) stop = true
      else {
        n += 1; bytes += flen
        if (rate0 < 0) rate0 = ADTS_SR(sfi)
        p += flen
      }
    }
    if (n == 0 || rate0 <= 0) null
    else Array(n, n * 1024, n * 1024 * 1000 / rate0, bytes)
  }

  /** Payload [start, end) of the first `t` box in [from, to), walking
    * the ISO-BMFF size/type ladder (64-bit largesize supported), or
    * null. */
  private def bmffBox(b: Array[Byte], from: Long, to: Long,
                      t0: Char, t1: Char, t2: Char, t3: Char): (Long, Long) = {
    var i = from
    while (i + 8 <= to) {
      val ii = i.toInt
      var size = u32be(b, ii)
      var hdr = 8L
      if (size == 1) {
        if (i + 16 > to) return null
        // largesize: reject > Int.MaxValue payloads (can't index anyway)
        val hi = u32be(b, ii + 8)
        val lo = u32be(b, ii + 12)
        if (hi != 0) return null
        size = lo; hdr = 16L
      } else if (size == 0) size = to - i // box extends to the end
      if (size < hdr || i + size > to) return null
      if (b(ii + 4) == t0 && b(ii + 5) == t1 && b(ii + 6) == t2 && b(ii + 7) == t3)
        return (i + hdr, i + size)
      i += size
    }
    null
  }

  /** ISO-BMFF (MP4/MOV/M4A) metadata: the moov → mvhd timescale +
    * duration and the first trak → tkhd presentation dimensions
    * (16.16 fixed point, integer part). Returns [timescale, duration,
    * width, height] — width/height 0 for audio-only tracks — or null
    * when ftyp/moov/mvhd is absent or malformed. Versions 0 and 1 of
    * both boxes handled. Header-only: no sample decode, the
    * byte-layout tier a media manifest needs. */
  def mp4Meta(b: Array[Byte]): Array[Long] = {
    if (!isMp4(b)) return null
    val moov = bmffBox(b, 0, b.length.toLong, 'm', 'o', 'o', 'v')
    if (moov == null) return null
    val mvhd = bmffBox(b, moov._1, moov._2, 'm', 'v', 'h', 'd')
    if (mvhd == null) return null
    val mp = mvhd._1.toInt
    if (mvhd._2 - mvhd._1 < 20) return null
    val mv = b(mp) & 0xff
    val (timescale, duration) =
      if (mv == 0) (u32be(b, mp + 12), u32be(b, mp + 16))
      else if (mv == 1) {
        if (mvhd._2 - mvhd._1 < 32) return null
        val hi = u32be(b, mp + 24); val lo = u32be(b, mp + 28)
        (u32be(b, mp + 20), (hi << 32) | lo)
      } else return null
    if (timescale <= 0) return null
    var width = 0L
    var height = 0L
    val trak = bmffBox(b, moov._1, moov._2, 't', 'r', 'a', 'k')
    if (trak != null) {
      val tkhd = bmffBox(b, trak._1, trak._2, 't', 'k', 'h', 'd')
      if (tkhd != null) {
        val tp = tkhd._1.toInt
        val tv = b(tp) & 0xff
        val dimAt = if (tv == 1) tp + 88 else tp + 76
        if (tv <= 1 && tkhd._1 + (dimAt - tp) + 8 <= tkhd._2) {
          width = u32be(b, dimAt) >> 16
          height = u32be(b, dimAt + 4) >> 16
        }
      }
    }
    Array(timescale, duration, width, height)
  }

  /** REAL PCM-16 sample decode over a WAV payload — uncompressed audio
    * needs no codec, only the byte layout: little-endian signed 16-bit
    * samples from the `data` chunk. Returns [n_samples, peak(|s|),
    * sum|s|, sum s²] as exact int64s (bounded: 2³¹ samples × 2³⁰ max
    * square < 2⁶³ only for n ≲ 2·10⁸ — beyond that, chunk the file),
    * or null when the payload is not a PCM-16 WAV. The aggregate-side
    * loudness/clipping stats a media-curation manifest wants, with the
    * stub boundary pushed down to COMPRESSED codecs only. */
  def wavPcmStats(b: Array[Byte]): Array[Long] = {
    if (!isWav(b)) return null
    val f = wavChunkOffset(b, 'f', 'm', 't', ' ')
    if (f < 0 || f + 16 > b.length) return null
    val fmt = u16le(b, f)
    val bits = u16le(b, f + 14)
    if (fmt != 1 || bits != 16) return null // PCM-16 only; else stub regime
    val d = wavChunkOffset(b, 'd', 'a', 't', 'a')
    if (d < 0) return null
    val size = u32le(b, d - 4)
    if (size % 2 != 0 || d + size > b.length) return null
    var i = d
    var n = 0L; var peak = 0L; var sumAbs = 0L; var sumSq = 0L
    while (i + 1 < d + size) {
      val s = (u16le(b, i).toShort).toLong
      val a = math.abs(s)
      n += 1; if (a > peak) peak = a; sumAbs += a; sumSq += s * s
      i += 2
    }
    Array(n, peak, sumAbs, sumSq)
  }

  /** REAL 24-bit uncompressed BMP pixel decode — again pure byte
    * layout: BGR triples, rows padded to 4-byte boundaries, bottom-up
    * (or top-down when height is negative; the sums are order-
    * independent either way). Returns [n_px, sum_b, sum_g, sum_r] as
    * exact int64s, or null for compressed/other-depth BMPs (the
    * documented stub boundary). */
  def bmp24Stats(b: Array[Byte]): Array[Long] = {
    if (!isBmp(b) || b.length < 34) return null
    val bits = u16le(b, 28)
    val compression = u32le(b, 30)
    if (bits != 24 || compression != 0) return null
    val off = u32le(b, 10)
    val w = u32le(b, 18).toInt
    val h = math.abs(u32le(b, 22).toInt)
    if (off <= 0 || w <= 0 || h <= 0) return null
    // Long arithmetic throughout: a declared width near 2^31/3 would
    // wrap `w * 3` negative, slip past the bounds check, and break the
    // never-throws contract with an out-of-bounds read
    val rowBytes = (w.toLong * 3 + 3) / 4 * 4
    if (off + rowBytes * h > b.length) return null
    var sb = 0L; var sg = 0L; var sr = 0L
    var row = 0
    while (row < h) {
      var x = 0
      var i = (off + row * rowBytes).toInt
      while (x < w) {
        sb += (b(i) & 0xff); sg += (b(i + 1) & 0xff); sr += (b(i + 2) & 0xff)
        x += 1; i += 3
      }
      row += 1
    }
    Array(w.toLong * h, sb, sg, sr)
  }

  /** G.711 µ-law byte → linear PCM-16 sample (ITU-T G.711, the
    * classic CCITT reference arithmetic — bias 0x84, 3-bit segment,
    * 4-bit mantissa). */
  def ulaw2linear(uByte: Int): Int = {
    val u = ~uByte & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte → linear PCM-16 sample (even-bit inversion 0x55,
    * segment 0 special-cased; MSB set = positive per the standard). */
  def alaw2linear(aByte: Int): Int = {
    val a = (aByte ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    val t0 = (a & 0x0f) << 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case _ => (t0 + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** REAL G.711 companded-audio decode over a WAV payload — the
    * telephony formats (fmt 7 = µ-law, fmt 6 = A-law, 8 bits/sample)
    * are pure integer arithmetic per ITU-T G.711, no codec library:
    * every data byte expands to its linear PCM-16 sample and the same
    * loudness/clipping stats as [[wavPcmStats]] come back —
    * [n_samples, peak(|s|), Σ|s|, Σs²] exact int64 — or null for
    * anything that is not an 8-bit G.711 WAV. With this the lossy-
    * audio stub boundary excludes the log-companded codecs too;
    * MP3/AAC (psychoacoustic transform codecs) remain the stub. */
  def wavG711Stats(b: Array[Byte]): Array[Long] = {
    if (!isWav(b)) return null
    val f = wavChunkOffset(b, 'f', 'm', 't', ' ')
    if (f < 0 || f + 16 > b.length) return null
    val fmt = u16le(b, f)
    val bits = u16le(b, f + 14)
    if ((fmt != 6 && fmt != 7) || bits != 8) return null
    val d = wavChunkOffset(b, 'd', 'a', 't', 'a')
    if (d < 0) return null
    val size = u32le(b, d - 4)
    if (d + size > b.length) return null
    var i = d
    var n = 0L; var peak = 0L; var sumAbs = 0L; var sumSq = 0L
    val mu = fmt == 7
    while (i < d + size) {
      val s = (if (mu) ulaw2linear(b(i) & 0xff) else alaw2linear(b(i) & 0xff)).toLong
      val a = math.abs(s)
      n += 1; if (a > peak) peak = a; sumAbs += a; sumSq += s * s
      i += 1
    }
    Array(n, peak, sumAbs, sumSq)
  }

  /** REAL GIF first-frame pixel decode — LZW is ~100 lines of pure
    * bit/byte arithmetic (GIF89a spec appendix F + the classic
    * compress(1) variable-width coding), no codec library: walk to the
    * first image descriptor (skipping extensions), read the active
    * color table (local over global), inflate the variable-width LZW
    * code stream across data sub-blocks (dictionary to 4096 entries,
    * width 12 bits max, GIF's "deferred" width change: the decoder
    * widens when ITS next-free code reaches 2^width), and fold every
    * decoded pixel through the palette. Returns
    * [n_px, sum_r, sum_g, sum_b] as exact int64s (palette order —
    * GIF color tables are RGB triples, unlike BMP's BGR), or null for
    * anything malformed: bad structure, palette overrun, corrupt code,
    * pixel count ≠ width×height, or frames past the 2²⁶-pixel decode
    * bound. Interlace needs no handling — the sums are row-order
    * independent. This moves the multimodal stub boundary from
    * "compressed codecs" down: LZW decode is real (see also
    * [[pngPixelStats]] — together they leave only DCT/lossy codecs).
    */
  def gifPixelStats(b: Array[Byte]): Array[Long] = {
    val r = gifCore(b, wantPos = false)
    if (r == null) null else r._4
  }

  /** GIF -> positioned integer luma plane, or null — the dHash face
    * of the LZW decoder. Interlaced streams DE-INTERLACE (the GIF
    * 4-pass row permutation, spec appendix E — unlike PNG's Adam7 it
    * is a pure row remap, so placement costs nothing). */
  private[graft] def gifGray(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val r = gifCore(b, wantPos = true)
    if (r == null) null else (r._1, r._2, r._3)
  }

  private def gifCore(b: Array[Byte], wantPos: Boolean)
      : (Int, Int, Array[Int], Array[Long]) = {
    if (!isGif(b) || b.length < 14) return null
    val packed = b(10) & 0xff
    var i = 13
    var ctOff = -1
    var ctSize = 0
    if ((packed & 0x80) != 0) {
      ctSize = 1 << ((packed & 7) + 1)
      ctOff = 13
      i = 13 + 3 * ctSize
      if (i >= b.length) return null
    }
    // skip extension blocks (introducer 0x21, label, length-prefixed
    // sub-blocks, zero terminator) to the first image descriptor
    while (i < b.length && (b(i) & 0xff) == 0x21) {
      i += 2
      while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
      if (i >= b.length) return null
      i += 1
    }
    if (i + 10 > b.length || (b(i) & 0xff) != 0x2c) return null
    val w = u16le(b, i + 5)
    val h = u16le(b, i + 7)
    val ipacked = b(i + 9) & 0xff
    i += 10
    if ((ipacked & 0x80) != 0) { // local color table wins for this frame
      ctSize = 1 << ((ipacked & 7) + 1)
      ctOff = i
      i += 3 * ctSize
    }
    if (ctOff < 0 || ctOff + 3 * ctSize > b.length) return null
    if (w <= 0 || h <= 0) return null
    val nPx = w.toLong * h
    if (nPx > (1L << 26)) return null // decode bound: 64M px per blob
    if (i >= b.length) return null
    val minCode = b(i) & 0xff
    i += 1
    if (minCode < 2 || minCode > 8) return null
    val clear = 1 << minCode
    val eoi = clear + 1
    // LZW state: entry c (> eoi) = string(prefix(c)) + suffix(c)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var dictSize = eoi + 1
    var width = minCode + 1
    var n = 0L; var sr = 0L; var sg = 0L; var sb = 0L
    // bit reader, LSB-first across length-prefixed sub-blocks
    var pos = i
    var blockEnd = i
    var bitBuf = 0L
    var bitCnt = 0
    var bad = false
    def readCode(): Int = {
      while (bitCnt < width) {
        if (pos >= blockEnd) {
          if (pos >= b.length) return -1
          val len = b(pos) & 0xff
          if (len == 0) return -1 // block terminator mid-stream
          pos += 1
          blockEnd = pos + len
          if (blockEnd > b.length) return -1
        } else {
          bitBuf |= (b(pos) & 0xffL) << bitCnt
          bitCnt += 8
          pos += 1
        }
      }
      val c = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      bitCnt -= width
      c
    }
    val g: Array[Int] = if (wantPos) new Array[Int](nPx.toInt) else null
    // GIF interlace (spec appendix E) is a fixed 4-pass ROW permutation
    // — positioned decode just maps stream row -> image row
    val rowMap: Array[Int] =
      if (g != null && (ipacked & 0x40) != 0) {
        val m = new Array[Int](h)
        var r = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
             y <- start until h by step) { m(r) = y; r += 1 }
        m
      } else null
    def addPixel(v: Int): Unit = {
      if (v >= ctSize) { bad = true; return }
      val o = ctOff + 3 * v
      if (g != null && n < nPx) {
        val pos = if (rowMap == null) n.toInt
          else rowMap((n / w).toInt) * w + (n % w).toInt
        g(pos) = (299 * (b(o) & 0xff) + 587 * (b(o + 1) & 0xff) +
          114 * (b(o + 2) & 0xff)) / 1000
      }
      n += 1
      sr += b(o) & 0xff; sg += b(o + 1) & 0xff; sb += b(o + 2) & 0xff
    }
    /** Emit string(code) (walk prefix chain, reversed via the stack);
      * returns its first literal, or -1 on corrupt chains. */
    def emitString(code: Int): Int = {
      var c = code
      var sp = 0
      while (c > eoi) {
        if (c >= dictSize || sp >= stack.length) return -1
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      if (c >= clear) return -1
      addPixel(c)
      var j = sp - 1
      while (j >= 0) { addPixel(stack(j) & 0xff); j -= 1 }
      c
    }
    var prev = -1
    var run = true
    while (run) {
      val code = readCode()
      if (code < 0) return null // bits exhausted before EOI
      if (code == clear) {
        dictSize = eoi + 1; width = minCode + 1; prev = -1
      } else if (code == eoi) {
        run = false
      } else if (prev == -1) {
        if (code >= clear) return null // first code after clear: literal only
        if (emitString(code) < 0 || bad) return null
        prev = code
      } else {
        var first = -1
        if (code < dictSize) {
          first = emitString(code)
        } else if (code == dictSize) { // KwKwK: string(prev)+first(prev)
          first = emitString(prev)
          if (first >= 0) addPixel(first)
        } // else: reference past next-free — corrupt
        if (first < 0 || bad) return null
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first.toByte
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      if (n > nPx) return null // more pixels than the descriptor declares
    }
    if (n != nPx) return null
    (w, h, g, Array(nPx, sr, sg, sb))
  }

  /** REAL PNG pixel decode — DEFLATE is in the JDK (`java.util.zip.
    * Inflater`, public Java SE, no codec library), and everything
    * around it is pure byte arithmetic from the PNG spec: chunk walk
    * (IHDR / PLTE / concatenated IDATs / IEND, CRCs not validated — a stats pass is
    * lenient by design, integrity is the storage layer's job), zlib
    * inflate of the concatenated IDAT payload, and per-scanline
    * UNFILTERING (all five filter types — None/Sub/Up/Average/Paeth,
    * spec §9.2). Supported: 8-bit depth, color types 0 (gray), 2
    * (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), both interlace
    * modes — an Adam7 stream is seven independently-filtered
    * sub-images (spec §8.2), and since channel SUMS are
    * position-independent each pass just unfilters at its own
    * dimensions, no de-interlace placement needed. 1/2/4/16-bit
    * depths and anything malformed yield null.
    * Returns [n_px, sum_r, sum_g, sum_b] (gray replicates to all
    * three; alpha ignored) — the same contract as gif/bmp. With this,
    * the multimodal stub boundary is DCT/lossy codecs only
    * (JPEG, MP3/AAC). */
  def pngPixelStats(b: Array[Byte]): Array[Long] = {
    val r = pngCore(b, wantPos = false)
    if (r == null) null else r._4
  }

  /** Non-interlaced PNG → positioned integer luma plane, or null — the
    * dHash face of the PNG decoder, SHARING the chunk walk, inflate
    * loop and five-filter reconstruction with [[pngPixelStats]] (one
    * core, two faces — the gifCore shape). Adam7 declines here: its
    * placement is a full re-render, unlike the order-free sums. */
  private[graft] def pngGray(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val r = pngCore(b, wantPos = true)
    if (r == null) null else (r._1, r._2, r._3)
  }

  private def pngCore(b: Array[Byte], wantPos: Boolean)
      : (Int, Int, Array[Int], Array[Long]) = {
    if (!isPng(b) || b.length < 33) return null
    val w = u32be(b, 16)
    val h = u32be(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    if ((b(26) & 0xff) != 0 || (b(27) & 0xff) != 0) return null
    val interlace = b(28) & 0xff
    if (interlace > 1) return null
    if (wantPos && interlace != 0) return null // placement needs de-interlacing
    if (bitDepth != 8) return null
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return null
    }
    val nPx = w * h
    if (nPx > (1L << 26)) return null // decode bound: 64M px per blob
    var i = 8
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (i + 8 <= b.length && !sawEnd) {
      val len = u32be(b, i)
      if (len > Int.MaxValue - 12 || i + 12 + len > b.length) return null
      val n = len.toInt
      if (b(i + 4) == 'P' && b(i + 5) == 'L' && b(i + 6) == 'T' && b(i + 7) == 'E')
        plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + n)
      else if (b(i + 4) == 'I' && b(i + 5) == 'D' && b(i + 6) == 'A' && b(i + 7) == 'T')
        idat.write(b, i + 8, n)
      else if (b(i + 4) == 'I' && b(i + 5) == 'E' && b(i + 6) == 'N' && b(i + 7) == 'D')
        sawEnd = true
      i += 12 + n
    }
    if (idat.size() == 0) return null
    if (colorType == 3 && (plte == null || plte.length % 3 != 0 || plte.length == 0))
      return null
    // pass geometry: one full-frame pass, or Adam7's seven sub-images
    // (xStart, yStart, xStep, yStep per spec §8.2); empty passes absent
    val passes: Seq[(Int, Int)] =
      if (interlace == 0) Seq((w.toInt, h.toInt))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)).map {
        case (xs, ys, xst, yst) =>
          (((w.toInt - xs + xst - 1) / xst), ((h.toInt - ys + yst - 1) / yst))
      }.filter(p => p._1 > 0 && p._2 > 0)
    val bpp = channels
    val rawLen = passes.map { case (pw, ph) => (pw.toLong * bpp + 1) * ph }.sum
    if (rawLen > Int.MaxValue) return null
    val raw = new Array[Byte](rawLen.toInt)
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
          inf.end(); return null // truncated or preset-dictionary stream
        }
        off += n
      }
      inf.end()
      if (off != raw.length) return null
    } catch { case _: java.util.zip.DataFormatException => return null }
    // per pass: unfilter in place (PNG spec 9.2), then channel sums
    // (and, for the positioned face, the luma plane — single pass only,
    // so the scan order IS raster order)
    val gOut: Array[Int] =
      if (wantPos) new Array[Int](w.toInt * h.toInt) else null
    var sr = 0L; var sg = 0L; var sb = 0L
    val maxIdx = if (colorType == 3) plte.length / 3 else 0
    var base = 0
    for ((pw, ph) <- passes) {
      val stride = pw * bpp
      var y = 0
      while (y < ph) {
        val rowOff = base + y * (stride + 1)
        val ft = raw(rowOff) & 0xff
        if (ft > 4) return null
        var x = 0
        while (x < stride) {
          val cur = raw(rowOff + 1 + x) & 0xff
          val left = if (x >= bpp) raw(rowOff + 1 + x - bpp) & 0xff else 0
          val up = if (y > 0) raw(rowOff - stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) raw(rowOff - stride + x - bpp) & 0xff else 0
          val recon = ft match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          }
          raw(rowOff + 1 + x) = (recon & 0xff).toByte
          x += 1
        }
        y += 1
      }
      y = 0
      while (y < ph) {
        val d0 = base + y * (stride + 1) + 1
        var px = 0
        while (px < pw) {
          val o = d0 + px * bpp
          val (pr, pg, pb) = colorType match {
            case 0 | 4 =>
              val v = raw(o) & 0xff; (v, v, v)
            case 2 | 6 =>
              (raw(o) & 0xff, raw(o + 1) & 0xff, raw(o + 2) & 0xff)
            case 3 =>
              val idx = raw(o) & 0xff
              if (idx >= maxIdx) return null
              (plte(3 * idx) & 0xff, plte(3 * idx + 1) & 0xff,
                plte(3 * idx + 2) & 0xff)
          }
          sr += pr; sg += pg; sb += pb
          if (gOut != null)
            gOut(y * pw + px) = (299 * pr + 587 * pg + 114 * pb) / 1000
          px += 1
        }
        y += 1
      }
      base += (stride + 1) * ph
    }
    (w.toInt, h.toInt, gOut, Array(nPx, sr, sg, sb))
  }

  /** Baseline grayscale JPEG decode stats — see [[JpegBaseline]] (the
    * forwarding def keeps the codegen'd static call surface on this
    * object). */
  def jpegPixelStats(b: Array[Byte]): Array[Long] =
    JpegBaseline.jpegPixelStats(b)

  /** Baseline gray OR 4:4:4 color JPEG decode stats (pinned
    * fixed-point YCbCr→RGB) — see [[JpegBaseline.jpegColorStats]]. */
  def jpegColorStats(b: Array[Byte]): Array[Long] =
    JpegBaseline.jpegColorStats(b)

  /** FLAC sample decode (Rice residuals + fixed/LPC prediction) to
    * the wavPcmStats loudness contract — see [[FlacDecode]]. */
  def flacPcmStats(b: Array[Byte]): Array[Long] =
    FlacDecode.flacPcmStats(b)

  /** WebP/TIFF/Ogg container metadata — see [[ContainerMeta]]. */
  def webpMeta(b: Array[Byte]): Array[Long] = ContainerMeta.webpMeta(b)
  def tiffMeta(b: Array[Byte]): Array[Long] = ContainerMeta.tiffMeta(b)
  def oggMeta(b: Array[Byte]): Array[Long] = ContainerMeta.oggMeta(b)

  // ---- positioned grayscale decode (the perceptual-hash substrate) ----

  /** 24-bit BMP → positioned integer luma plane (image row order,
    * handling bottom-up and top-down files), or null. Same byte layout
    * as [[bmp24Stats]]; luma = (299r + 587g + 114b) div 1000 — the
    * ITU-R 601 integer convention shared with the SQL oracle. */
  private[graft] def bmp24Gray(b: Array[Byte]): (Int, Int, Array[Int]) = {
    if (!isBmp(b) || b.length < 34) return null
    val bits = u16le(b, 28)
    val compression = u32le(b, 30)
    if (bits != 24 || compression != 0) return null
    val off = u32le(b, 10)
    val w = u32le(b, 18).toInt
    val hRaw = u32le(b, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (off <= 0 || w <= 0 || h <= 0 || hRaw == Int.MinValue) return null
    if (w.toLong * h > (1L << 26)) return null
    val rowBytes = (w.toLong * 3 + 3) / 4 * 4
    if (off + rowBytes * h > b.length) return null
    val g = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val imgY = if (topDown) row else h - 1 - row
      var x = 0
      var i = (off + row * rowBytes).toInt
      while (x < w) {
        val bl = b(i) & 0xff; val gr = b(i + 1) & 0xff; val r = b(i + 2) & 0xff
        g(imgY * w + x) = (299 * r + 587 * gr + 114 * bl) / 1000
        x += 1; i += 3
      }
      row += 1
    }
    (w, h, g)
  }

  /** Container-dispatched positioned grayscale decode: 24-bit BMP,
    * non-interlaced PNG (8-bit gray/RGB/palette/gray-alpha/RGBA),
    * baseline grayscale JPEG, and GIF (interlaced GIFs de-interlace —
    * a pure row remap). Interlaced PNG declines (Adam7 placement is a
    * full re-render, unlike the order-free sums). */
  private[graft] def grayPixels(b: Array[Byte]): (Int, Int, Array[Int]) =
    if (isBmp(b)) bmp24Gray(b)
    else if (isPng(b)) pngGray(b)
    else if (isJpeg(b)) JpegBaseline.decodeGray(b)
    else if (isGif(b)) gifGray(b)
    else null

  /** PERCEPTUAL difference-hash (dHash) over a binary image payload —
    * the image near-dup key: decode to luma, box-average to a 9×8 grid
    * (cell (i,j) covers x ∈ [⌊iW/9⌋, ⌊(i+1)W/9⌋), exact integer mean),
    * bit (j·8+i) = grid(i+1,j) > grid(i,j). Robust to re-encoding
    * (PNG↔BMP of the same pixels hash IDENTICALLY — spec-pinned — and
    * JPEG re-compression moves only a few bits), which is what makes
    * hamming-bucketed image dedup work where byte-hash dedup cannot.
    * Returns a 1-element array (the 64-bit hash) or null for
    * undecodable/too-small (< 9×8) images — the array wrapper exists
    * because every 64-bit value is a legal hash, so no Long sentinel
    * can mean "invalid". */
  def dhash64(b: Array[Byte]): Array[Long] = {
    val d = grayPixels(b)
    if (d == null) return null
    val (w, h, g) = d
    if (w < 9 || h < 8) return null
    val grid = new Array[Long](72)
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8; val y1 = (j + 1) * h / 8
      var i = 0
      while (i < 9) {
        val x0 = i * w / 9; val x1 = (i + 1) * w / 9
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += g(y * w + x); x += 1 }
          y += 1
        }
        grid(j * 9 + i) = s / ((y1 - y0).toLong * (x1 - x0))
        i += 1
      }
      j += 1
    }
    var hash = 0L
    j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (grid(j * 9 + i + 1) > grid(j * 9 + i))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    Array(hash)
  }

  /** WARC (ISO 28500) record index over a raw crawl blob — the
    * container format web corpora actually ship in. Walks record to
    * record: `WARC/` version line, header lines to the empty line
    * (names case-insensitive per the spec; `WARC-Target-URI`,
    * `Content-Type`, `Content-Length` extracted), then EXACTLY
    * Content-Length payload bytes — the payload is never delimiter-
    * scanned, so bodies containing `WARC/1.0` or blank lines split
    * correctly — then the two CRLF record separators (tolerated
    * missing at end-of-blob). Returns one struct per record
    * `(uri, content_type, off, len)` with `off`/`len` delimiting the
    * payload bytes inside the blob (slice with substr(off+1, len)),
    * or null when no complete record parses. The walk STOPS at the
    * first malformed/truncated record and returns the records before
    * it. Uncompressed WARC only — .warc.gz splits into per-record
    * gzip members upstream (a storage/reader concern, documented). */
  def warcIndex(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var p = 0
    var stop = false
    def lineEnd(from: Int): Int = { // index of '\r' of the next CRLF, or -1
      var i = from
      while (i + 1 < b.length) {
        if (b(i) == '\r' && b(i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    while (!stop) {
      // version line
      if (p + 5 > b.length || b(p) != 'W' || b(p + 1) != 'A' ||
        b(p + 2) != 'R' || b(p + 3) != 'C' || b(p + 4) != '/') stop = true
      else {
        val vEnd = lineEnd(p)
        if (vEnd < 0) stop = true
        else {
          var q = vEnd + 2
          var uri: String = null
          var ctype: String = null
          var clen = -1L
          var headersOk = false
          var headerDone = false
          while (!headerDone) {
            val e = lineEnd(q)
            if (e < 0) { headerDone = true } // truncated headers
            else if (e == q) { headerDone = true; headersOk = true } // empty line
            else {
              val line = new String(b, q, e - q, java.nio.charset.StandardCharsets.ISO_8859_1)
              val ci = line.indexOf(':')
              if (ci > 0) {
                val name = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
                val value = line.substring(ci + 1).trim
                name match {
                  case "warc-target-uri" => uri = value
                  case "content-type" => ctype = value
                  case "content-length" =>
                    clen = try value.toLong catch { case _: NumberFormatException => -1L }
                  case _ =>
                }
              }
              q = e + 2
            }
          }
          if (!headersOk || clen < 0) stop = true
          else {
            val off = q + 2 // past the empty line's CRLF
            if (off + clen > b.length || clen > Int.MaxValue) stop = true
            else {
              out += org.apache.spark.sql.catalyst.InternalRow(
                if (uri == null) null else UTF8String.fromString(uri),
                if (ctype == null) null else UTF8String.fromString(ctype),
                off, clen.toInt)
              p = (off + clen).toInt
              // the two record-separator CRLFs; tolerated absent at EOF
              var sep = 0
              while (sep < 2 && p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n') {
                p += 2; sep += 1
              }
              if (p >= b.length) stop = true
            }
          }
        }
      }
    }
    if (out.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Multi-member gzip (RFC 1952) expansion — the on-disk framing of
    * `.warc.gz` crawls, where every WARC record is its own gzip member
    * and members concatenate: walks member to member (magic 1f 8b,
    * CM=8 deflate, FEXTRA/FNAME/FCOMMENT/FHCRC header fields honored),
    * inflates through the JDK's public `java.util.zip.Inflater`
    * (nowrap — the header was already consumed), and VERIFIES each
    * member's CRC-32 and ISIZE trailer before accepting it. Returns
    * the concatenated decompressed bytes of every complete member
    * before the first malformed/truncated one (the warcIndex
    * stop-at-first-malformed contract), null when no member decodes
    * or the total output exceeds the 64 MiB per-blob bound (a blob is
    * one task's row — bigger crawls split upstream into more rows,
    * not bigger ones). Total: never throws. */
  def gunzipMembers(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var members = 0
    var p = 0
    var stop = false
    while (!stop) {
      if (p + 10 > b.length || (b(p) & 0xff) != 0x1f ||
          (b(p + 1) & 0xff) != 0x8b || (b(p + 2) & 0xff) != 8) stop = true
      else {
        val flg = b(p + 3) & 0xff
        var q = p + 10
        if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian xlen
          if (q + 2 > b.length) q = b.length + 1
          else q += 2 + ((b(q) & 0xff) | ((b(q + 1) & 0xff) << 8))
        }
        if ((flg & 8) != 0) { // FNAME: zero-terminated
          while (q < b.length && b(q) != 0) q += 1
          q += 1
        }
        if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
          while (q < b.length && b(q) != 0) q += 1
          q += 1
        }
        if ((flg & 2) != 0) q += 2 // FHCRC
        if (q > b.length) stop = true
        else {
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(b, q, b.length - q)
          val member = new java.io.ByteArrayOutputStream()
          val crc = new java.util.zip.CRC32()
          val buf = new Array[Byte](8192)
          var corrupt = false
          try {
            while (!inf.finished() && !corrupt) {
              val n = inf.inflate(buf)
              if (n > 0) {
                if (out.size().toLong + member.size() + n > (1L << 26)) {
                  inf.end(); return null // over the per-blob bound
                }
                crc.update(buf, 0, n)
                member.write(buf, 0, n)
              } else if (inf.needsInput() || inf.needsDictionary())
                corrupt = true // truncated / preset-dictionary stream
            }
          } catch { case _: java.util.zip.DataFormatException => corrupt = true }
          val consumed = (b.length - q) - inf.getRemaining
          inf.end()
          val t = q + consumed // trailer: CRC-32 then ISIZE, little-endian
          def le32(at: Int): Long =
            (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
              ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
          if (corrupt || t + 8 > b.length ||
              le32(t) != crc.getValue ||
              le32(t + 4) != (member.size() & 0xffffffffL)) stop = true
          else {
            member.writeTo(out)
            members += 1
            p = t + 8
            if (p >= b.length) stop = true
          }
        }
      }
    }
    if (members == 0) null else out.toByteArray
  }

  /** HTTP/1.x response header parse over one response blob — the
    * content of a WARC `response` record IS the raw HTTP exchange
    * (status line + headers + body as transmitted), so a crawl
    * pipeline must split it before any text extraction. Returns
    * `(status, content_type, charset, content_encoding, chunked,
    * body_off, body_len)` or null: status from the `HTTP/x.y SSS`
    * line (bare LF tolerated alongside CRLF — both occur in the
    * wild), `content_type` the media type lowercased without
    * parameters, `charset` the lowercased charset parameter when
    * present, `content_encoding` lowercased, `chunked` from
    * Transfer-Encoding, `body_off/len` delimiting the RAW body bytes
    * (Content-Length-bounded when declared and shorter than the
    * remainder; the chunked framing is NOT removed here — that is
    * [[httpBody]]'s job). Header names fold with Locale.ROOT. Total:
    * malformed/truncated → null, never an exception. */
  def httpMeta(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    if (b.length < 12 || b(0) != 'H' || b(1) != 'T' || b(2) != 'T' ||
        b(3) != 'P' || b(4) != '/') return null
    // line end tolerant of CRLF and bare LF; returns (contentEnd, next)
    def lineEnd(from: Int): (Int, Int) = {
      var i = from
      while (i < b.length) {
        if (b(i) == '\n')
          return (if (i > from && b(i - 1) == '\r') i - 1 else i, i + 1)
        i += 1
      }
      (-1, -1)
    }
    val (sEnd, afterStatus) = lineEnd(0)
    if (sEnd < 0) return null
    val statusLine = new String(b, 0, sEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val sp1 = statusLine.indexOf(' ')
    if (sp1 < 0 || sp1 + 4 > statusLine.length) return null
    val code = statusLine.substring(sp1 + 1, sp1 + 4)
    if (!code.forall(c => c >= '0' && c <= '9')) return null
    if (sp1 + 4 < statusLine.length && statusLine.charAt(sp1 + 4) != ' ')
      return null
    val status = code.toInt
    if (status < 100 || status > 599) return null
    var ctype: String = null
    var charset: String = null
    var cenc: String = null
    var chunked = false
    var clen = -1L
    var p = afterStatus
    var headerDone = false
    var headersOk = false
    while (!headerDone) {
      val (e, next) = lineEnd(p)
      if (e < 0) headerDone = true // truncated headers
      else if (e == p) { headerDone = true; headersOk = true; p = next }
      else {
        val line = new String(b, p, e - p,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val ci = line.indexOf(':')
        if (ci > 0) {
          val name = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(ci + 1).trim
          name match {
            case "content-type" =>
              val semi = value.indexOf(';')
              ctype = (if (semi < 0) value else value.substring(0, semi))
                .trim.toLowerCase(java.util.Locale.ROOT)
              if (semi >= 0) {
                val params = value.substring(semi + 1)
                  .toLowerCase(java.util.Locale.ROOT)
                val m = params.split(';').map(_.trim)
                  .find(_.startsWith("charset="))
                charset = m.map(_.substring(8).trim.stripPrefix("\"")
                  .stripSuffix("\"")).filter(_.nonEmpty).orNull
              }
            case "content-encoding" =>
              cenc = value.toLowerCase(java.util.Locale.ROOT)
            case "transfer-encoding" =>
              chunked = value.toLowerCase(java.util.Locale.ROOT)
                .contains("chunked")
            case "content-length" =>
              clen = try value.toLong catch {
                case _: NumberFormatException => -1L
              }
            case _ =>
          }
        }
        p = next
      }
    }
    if (!headersOk) return null
    val remaining = b.length - p
    // chunked framing owns the span (Content-Length MUST be ignored
    // with Transfer-Encoding per RFC 9112 §6.2); otherwise an honest
    // Content-Length bounds a blob that carries trailing bytes
    val len =
      if (chunked || clen < 0 || clen > remaining) remaining.toLong
      else clen
    org.apache.spark.sql.catalyst.InternalRow(
      status,
      if (ctype == null) null else UTF8String.fromString(ctype),
      if (charset == null) null else UTF8String.fromString(charset),
      if (cenc == null) null else UTF8String.fromString(cenc),
      chunked, p, len.toInt)
  }

  /** The DECODED body of one HTTP/1.x response blob: the raw span from
    * [[httpMeta]], de-CHUNKED when Transfer-Encoding: chunked (RFC
    * 9112 §7.1: hex size line with optional extensions, data, CRLF,
    * repeat; terminal 0-chunk; trailers dropped), then de-COMPRESSED
    * when Content-Encoding is gzip or x-gzip (through
    * [[gunzipMembers]]' verify-then-concatenate walk; `identity` and
    * absent pass through; any other coding → null rather than
    * mislabeled bytes). Total: malformed chunk framing / failed
    * decompression / malformed response → null. */
  def httpBody(b: Array[Byte]): Array[Byte] = {
    val m = httpMeta(b)
    if (m == null) return null
    val off = m.getInt(5)
    val len = m.getInt(6)
    val chunked = m.getBoolean(4)
    val raw =
      if (!chunked) java.util.Arrays.copyOfRange(b, off, off + len)
      else {
        val out = new java.io.ByteArrayOutputStream(len)
        var p = off
        val end = off + len
        var done = false
        def lineEnd(from: Int): (Int, Int) = {
          var i = from
          while (i < end) {
            if (b(i) == '\n')
              return (if (i > from && b(i - 1) == '\r') i - 1 else i, i + 1)
            i += 1
          }
          (-1, -1)
        }
        while (!done) {
          val (e, next) = lineEnd(p)
          if (e < 0) return null // truncated size line
          val line = new String(b, p, e - p,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val semi = line.indexOf(';') // chunk extensions drop
          val hexStr = (if (semi < 0) line else line.substring(0, semi)).trim
          if (hexStr.isEmpty ||
              !hexStr.forall(c => (c >= '0' && c <= '9') ||
                (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')) ||
              hexStr.length > 8) return null
          val sz = java.lang.Long.parseLong(hexStr, 16)
          if (sz == 0) done = true // terminal chunk; trailers dropped
          else {
            if (next + sz > end) return null // truncated chunk data
            out.write(b, next, sz.toInt)
            p = next + sz.toInt
            // the CRLF after the chunk data
            val (e2, next2) = lineEnd(p)
            if (e2 != p) return null
            p = next2
          }
        }
        out.toByteArray
      }
    val cenc = if (m.isNullAt(3)) null else m.getUTF8String(3).toString
    cenc match {
      case null | "identity" => raw
      case "gzip" | "x-gzip" => gunzipMembers(raw)
      case _ => null // deflate/br/zstd: undecodable here, never mislabel
    }
  }

  // ---- Catalyst expressions (codegen'd static calls) ----

  abstract class BinaryProbe extends UnaryExpression {
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
  }

  /** Int-valued probe: static helper returns -1 for "no value" which
    * the expression surfaces as null. `method` is a def (not a ctor
    * field) so every ancestor keeps a no-arg constructor — Java
    * deserialization of the case classes requires it of the first
    * non-serializable superclass. */
  abstract class IntProbe extends BinaryProbe {
    /** Name of the static parser in [[BinaryMeta]] — eval and codegen
      * both dispatch through it. */
    def method: String
    override def dataType: DataType = IntegerType
    private def call(b: Array[Byte]): Int = method match {
      // qualified: TreeNode declares its own `height`
      case "width" => BinaryMeta.width(b)
      case "height" => BinaryMeta.height(b)
      case "wavSampleRate" => BinaryMeta.wavSampleRate(b)
      case "wavChannels" => BinaryMeta.wavChannels(b)
    }
    override def nullSafeEval(v: Any): Any = {
      val r = call(v.asInstanceOf[Array[Byte]])
      if (r < 0) null else r
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |int $r = graft.functions.BinaryMeta.$method($bytes);
           |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
  }

  case class MediaWidth(child: Expression) extends IntProbe {
    override def method: String = "width"
    override def prettyName: String = "media_width"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class MediaHeight(child: Expression) extends IntProbe {
    override def method: String = "height"
    override def prettyName: String = "media_height"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class WavSampleRate(child: Expression) extends IntProbe {
    override def method: String = "wavSampleRate"
    override def prettyName: String = "wav_sample_rate"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class WavChannels(child: Expression) extends IntProbe {
    override def method: String = "wavChannels"
    override def prettyName: String = "wav_channels"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Array-of-int64 probe (decode stats): static helper returns a
    * long[] or null. */
  abstract class StatsProbe extends BinaryProbe {
    def method: String
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private def call(b: Array[Byte]): Array[Long] = method match {
      case "wavPcmStats" => wavPcmStats(b)
      case "bmp24Stats" => bmp24Stats(b)
      case "gifPixelStats" => gifPixelStats(b)
      case "pngPixelStats" => pngPixelStats(b)
      case "jpegPixelStats" => jpegPixelStats(b)
      case "jpegColorStats" => jpegColorStats(b)
      case "wavG711Stats" => wavG711Stats(b)
      case "dhash64" => dhash64(b)
      case "mp3Meta" => mp3Meta(b)
      case "adtsMeta" => adtsMeta(b)
      case "mp4Meta" => mp4Meta(b)
      case "mp3FrameStats" => mp3FrameStats(b)
      case "adtsFrameStats" => adtsFrameStats(b)
      case "flacPcmStats" => flacPcmStats(b)
      case "webpMeta" => webpMeta(b)
      case "tiffMeta" => tiffMeta(b)
      case "oggMeta" => oggMeta(b)
    }
    override def nullSafeEval(v: Any): Any = {
      val r = call(v.asInstanceOf[Array[Byte]])
      if (r == null) null
      else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(r)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |long[] $r = graft.functions.BinaryMeta.$method($bytes);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($r); }
         """.stripMargin
      })
  }

  case class WavPcmStats(child: Expression) extends StatsProbe {
    override def method: String = "wavPcmStats"
    override def prettyName: String = "wav_pcm_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class Bmp24Stats(child: Expression) extends StatsProbe {
    override def method: String = "bmp24Stats"
    override def prettyName: String = "bmp24_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class GifPixelStats(child: Expression) extends StatsProbe {
    override def method: String = "gifPixelStats"
    override def prettyName: String = "gif_pixel_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class PngPixelStats(child: Expression) extends StatsProbe {
    override def method: String = "pngPixelStats"
    override def prettyName: String = "png_pixel_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class JpegPixelStats(child: Expression) extends StatsProbe {
    override def method: String = "jpegPixelStats"
    override def prettyName: String = "jpeg_pixel_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class JpegColorStats(child: Expression) extends StatsProbe {
    override def method: String = "jpegColorStats"
    override def prettyName: String = "jpeg_color_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class WavG711Stats(child: Expression) extends StatsProbe {
    override def method: String = "wavG711Stats"
    override def prettyName: String = "wav_g711_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class FlacPcmStats(child: Expression) extends StatsProbe {
    override def method: String = "flacPcmStats"
    override def prettyName: String = "flac_pcm_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class WebpMeta(child: Expression) extends StatsProbe {
    override def method: String = "webpMeta"
    override def prettyName: String = "webp_meta"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class TiffMeta(child: Expression) extends StatsProbe {
    override def method: String = "tiffMeta"
    override def prettyName: String = "tiff_meta"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class OggMeta(child: Expression) extends StatsProbe {
    override def method: String = "oggMeta"
    override def prettyName: String = "ogg_meta"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** JPEG EXIF struct probe — the APP1/TIFF walk in
    * [[ContainerMeta.exifMeta]]. */
  case class ExifMeta(child: Expression) extends BinaryProbe {
    override def prettyName: String = "exif_meta"
    override def dataType: DataType = StructType(Seq(
      StructField("orientation", IntegerType),
      StructField("make", StringType),
      StructField("model", StringType),
      StructField("datetime", StringType),
      StructField("datetime_original", StringType)))
    override def nullSafeEval(v: Any): Any =
      ContainerMeta.exifMeta(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.ContainerMeta.exifMeta($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class DHash64(child: Expression) extends StatsProbe {
    override def method: String = "dhash64"
    override def prettyName: String = "dhash64"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class Mp3Meta(child: Expression) extends StatsProbe {
    override def method: String = "mp3Meta"
    override def prettyName: String = "mp3_meta"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class AdtsMeta(child: Expression) extends StatsProbe {
    override def method: String = "adtsMeta"
    override def prettyName: String = "adts_meta"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class Mp4Meta(child: Expression) extends StatsProbe {
    override def method: String = "mp4Meta"
    override def prettyName: String = "mp4_meta"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class Mp3FrameStats(child: Expression) extends StatsProbe {
    override def method: String = "mp3FrameStats"
    override def prettyName: String = "mp3_frame_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  case class AdtsFrameStats(child: Expression) extends StatsProbe {
    override def method: String = "adtsFrameStats"
    override def prettyName: String = "adts_frame_stats"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class Id3TextFrames(child: Expression) extends BinaryProbe {
    override def prettyName: String = "id3_text_frames"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("frame_id", StringType, nullable = false),
      StructField("text", StringType, nullable = false))),
      containsNull = false)
    override def nullSafeEval(v: Any): Any =
      BinaryMeta.id3TextFrames(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.BinaryMeta.id3TextFrames($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WarcIndex(child: Expression) extends BinaryProbe {
    override def prettyName: String = "warc_index"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("uri", StringType),
      StructField("content_type", StringType),
      StructField("off", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
      containsNull = false)
    override def nullSafeEval(v: Any): Any =
      BinaryMeta.warcIndex(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.BinaryMeta.warcIndex($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class HttpMeta(child: Expression) extends BinaryProbe {
    override def prettyName: String = "http_meta"
    override def dataType: DataType = StructType(Seq(
      StructField("status", IntegerType, nullable = false),
      StructField("content_type", StringType),
      StructField("charset", StringType),
      StructField("content_encoding", StringType),
      StructField("chunked", BooleanType, nullable = false),
      StructField("body_off", IntegerType, nullable = false),
      StructField("body_len", IntegerType, nullable = false)))
    override def nullSafeEval(v: Any): Any =
      BinaryMeta.httpMeta(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.BinaryMeta.httpMeta($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class HttpBody(child: Expression) extends BinaryProbe {
    override def prettyName: String = "http_body"
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      BinaryMeta.httpBody(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |byte[] $r = graft.functions.BinaryMeta.httpBody($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class GunzipMembers(child: Expression) extends BinaryProbe {
    override def prettyName: String = "gunzip_members"
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      BinaryMeta.gunzipMembers(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |byte[] $r = graft.functions.BinaryMeta.gunzipMembers($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class MediaFormat(child: Expression) extends BinaryProbe {
    override def prettyName: String = "media_format"
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      format(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |UTF8String $r = graft.functions.BinaryMeta.format($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column faces ----
  def mediaFormat(c: Column): Column =
    SparkInternals.column(MediaFormat(SparkInternals.expression(c)))
  def mediaWidth(c: Column): Column =
    SparkInternals.column(MediaWidth(SparkInternals.expression(c)))
  def mediaHeight(c: Column): Column =
    SparkInternals.column(MediaHeight(SparkInternals.expression(c)))
  def wavSampleRateCol(c: Column): Column =
    SparkInternals.column(WavSampleRate(SparkInternals.expression(c)))
  def wavChannelsCol(c: Column): Column =
    SparkInternals.column(WavChannels(SparkInternals.expression(c)))
  def wavPcmStatsCol(c: Column): Column =
    SparkInternals.column(WavPcmStats(SparkInternals.expression(c)))
  def bmp24StatsCol(c: Column): Column =
    SparkInternals.column(Bmp24Stats(SparkInternals.expression(c)))
  def gifPixelStatsCol(c: Column): Column =
    SparkInternals.column(GifPixelStats(SparkInternals.expression(c)))
  def pngPixelStatsCol(c: Column): Column =
    SparkInternals.column(PngPixelStats(SparkInternals.expression(c)))
  def jpegPixelStatsCol(c: Column): Column =
    SparkInternals.column(JpegPixelStats(SparkInternals.expression(c)))
  def jpegColorStatsCol(c: Column): Column =
    SparkInternals.column(JpegColorStats(SparkInternals.expression(c)))
  def wavG711StatsCol(c: Column): Column =
    SparkInternals.column(WavG711Stats(SparkInternals.expression(c)))
  def flacPcmStatsCol(c: Column): Column =
    SparkInternals.column(FlacPcmStats(SparkInternals.expression(c)))
  def webpMetaCol(c: Column): Column =
    SparkInternals.column(WebpMeta(SparkInternals.expression(c)))
  def tiffMetaCol(c: Column): Column =
    SparkInternals.column(TiffMeta(SparkInternals.expression(c)))
  def oggMetaCol(c: Column): Column =
    SparkInternals.column(OggMeta(SparkInternals.expression(c)))
  def exifMetaCol(c: Column): Column =
    SparkInternals.column(ExifMeta(SparkInternals.expression(c)))
  def mp3MetaCol(c: Column): Column =
    SparkInternals.column(Mp3Meta(SparkInternals.expression(c)))
  def adtsMetaCol(c: Column): Column =
    SparkInternals.column(AdtsMeta(SparkInternals.expression(c)))
  def mp4MetaCol(c: Column): Column =
    SparkInternals.column(Mp4Meta(SparkInternals.expression(c)))
  def warcIndexCol(c: Column): Column =
    SparkInternals.column(WarcIndex(SparkInternals.expression(c)))
  def gunzipMembersCol(c: Column): Column =
    SparkInternals.column(GunzipMembers(SparkInternals.expression(c)))
  def httpMetaCol(c: Column): Column =
    SparkInternals.column(HttpMeta(SparkInternals.expression(c)))
  def httpBodyCol(c: Column): Column =
    SparkInternals.column(HttpBody(SparkInternals.expression(c)))
  def id3TextFramesCol(c: Column): Column =
    SparkInternals.column(Id3TextFrames(SparkInternals.expression(c)))
  def mp3FrameStatsCol(c: Column): Column =
    SparkInternals.column(Mp3FrameStats(SparkInternals.expression(c)))
  def adtsFrameStatsCol(c: Column): Column =
    SparkInternals.column(AdtsFrameStats(SparkInternals.expression(c)))
  /** Scalar face: the 64-bit dHash (null for undecodable payloads). */
  def dhash64Col(c: Column): Column = {
    import org.apache.spark.sql.functions.element_at
    element_at(SparkInternals.column(DHash64(SparkInternals.expression(c))), 1)
  }
}
