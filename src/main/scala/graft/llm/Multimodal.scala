package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed by a batched per-partition "decoder".
  *
  * What is REAL here (no codec library needed, pure byte/bit
  * arithmetic): container-format detection, image dimensions and audio
  * parameters (`describeMedia` over `functions/BinaryMeta`), PCM-16
  * WAV sample decode, 24-bit BMP pixel decode, GIF first-frame
  * LZW pixel decode (incl. de-interlaced placement), PNG pixel decode
  * (both interlace modes), JPEG decode — baseline AND progressive
  * (Annex G multi-scan), grayscale and 4:4:4 color with the pinned
  * fixed-point YCbCr→RGB — G.711 µ-law/A-law audio expansion,
  * MP3/ADTS/MP4 header + frame-walk metadata, WARC record indexing,
  * and the perceptual dHash + banded near-dup pairing built on top
  * (`BinaryMeta.wavPcmStats` / `bmp24Stats` / `gifPixelStats` /
  * `pngPixelStats` / `JpegBaseline` / `wavG711Stats` / `dhash64`).
  * The remaining undecodable-by-design boundary after round 12 is
  * psychoacoustic transform audio codecs only (MP3/AAC sample
  * reconstruction; their container/frame metadata IS parsed) —
  * subsampled-color JPEG (4:2:0/4:2:2/…) decodes for real since round
  * 12, with the implementation-defined chroma upsampling PINNED to
  * the JFIF box rule the way the YCbCr matrix already was. The
  * feature-extraction dispatcher (`decodeFeatures`) routes recognized
  * payloads through the REAL decoders and takes a byte-stats fallback
  * only for those two classes and foreign bytes — no stub marker
  * remains. Everything around it — the binary column, the metadata
  * struct, the mapPartitions batch shape, the partitioning — is what
  * matters at 100 TB: payloads never pass through a shuffle (features
  * are extracted before any aggregation), and the decoder is applied
  * streaming per partition, one batch at a time, like a
  * Pandas-UDF/mapInPandas stage would be.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: String,
                           width: Int, height: Int, mean_byte: Double)

  /** Attach a binary payload + metadata struct to the documents table
    * (payload = utf-8 bytes of the text; stands in for image/audio blobs). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/fake").as("mime"),
        (pmod(col("n_chars"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(32)) + 16).cast("int").as("height")).as("meta"))

  /** REAL per-payload feature decode over the container tier:
    * recognized media decodes to its mean sample value through the
    * round-10/11 decoders (images — PNG/GIF/BMP/JPEG incl. progressive
    * and 4:4:4 color — mean channel value over the RGB sums; WAV —
    * mean |sample| over PCM-16 or G.711); unrecognized payloads fall
    * back to the raw byte mean, keeping the function TOTAL, which is
    * the property a crawl needs. Until round 11 this body was the
    * brief's clearly-marked deterministic stub; the decode tier is
    * now real, so the dispatcher is too — the only format still
    * taking the fallback by design is psychoacoustic audio (no
    * deterministic sample-reconstruction contract exists); JPEG
    * decodes at any T.81-legal sampling since round 12. */
  private def decodeFeatures(payload: Array[Byte]): (Long, Double) = {
    import graft.functions.BinaryMeta
    val len = payload.length.toLong
    val fmt = BinaryMeta.format(payload)
    val fmtStr = if (fmt == null) null else fmt.toString
    val decoded: Array[Long] = fmtStr match {
      case "png" => BinaryMeta.pngPixelStats(payload)
      case "gif" => BinaryMeta.gifPixelStats(payload)
      case "bmp" => BinaryMeta.bmp24Stats(payload)
      case "jpeg" => BinaryMeta.jpegColorStats(payload)
      case "wav" =>
        val p = BinaryMeta.wavPcmStats(payload)
        if (p != null) p else BinaryMeta.wavG711Stats(payload)
      case _ => null
    }
    val mean =
      if (decoded != null && decoded(0) > 0) fmtStr match {
        case "wav" => decoded(2).toDouble / decoded(0) // mean |sample|
        case _ => // mean channel value (bmp's BGR order sums the same)
          (decoded(1) + decoded(2) + decoded(3)).toDouble / (3.0 * decoded(0))
      }
      else if (len == 0) 0.0
      else payload.foldLeft(0L)(_ + java.lang.Byte.toUnsignedInt(_)).toDouble / len
    (len, mean)
  }

  /** Uniform FRAME SAMPLING over a timed payload — the video half of
    * the multimodal plumbing. Sample timestamps are pure metadata
    * arithmetic (duration = chars × msPerChar stands in for the
    * demuxer's duration field), and each emitted frame carries ONLY its
    * own slice of the payload: the explode fans out the tiny
    * (idx, ts) pairs, never the full blob, and the slice happens on the
    * local row before any shuffle — the shape that matters when frames
    * come from multi-GB videos. A real deployment swaps the substring
    * for the codec's seek+decode at `ts_ms`; everything else stands. */
  def sampleFrames(docs: DataFrame, everyMs: Long = 1000L,
                   frameChars: Int = 32, msPerChar: Long = 40L): DataFrame = {
    require(everyMs > 0 && frameChars > 0 && msPerChar > 0)
    val dur = (length(col("text")).cast("long") * msPerChar).as("dur")
    // Generate and the slicing Project fuse inside one codegen stage, so
    // carrying `text` through the explode never materializes a copy per
    // frame — each output row reads the parent buffer and emits only its
    // substring. No join, no shuffle.
    // Empty text means dur=0 and sequence(0, -1), which Spark generates
    // DESCENDING — two bogus frames instead of none. Same load-bearing
    // guard as Dedup.dedupSubstrings.
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"), dur)
      .select(col("doc_id"), col("text"), explode(sequence(lit(0L),
        floor((col("dur") - 1) / lit(everyMs)).cast("long"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * everyMs).as("ts_ms"),
        col("text").substr(
          ((col("frame_idx") * everyMs) / lit(msPerChar)).cast("long") + 1,
          lit(frameChars)).as("frame"))
  }

  /** REAL header metadata over a binary media column — container
    * format, image dimensions and WAV audio parameters parsed straight
    * from the public byte layouts by `functions/BinaryMeta`'s codegen'd
    * expressions. Unlike the faked pixel decode, this step needs no
    * codec: a media-manifest pass (group by resolution, filter by
    * sample rate, find format/extension mismatches) is a pure map-side
    * scan where the payload never leaves its partition. Foreign or
    * malformed payloads yield NULL columns, never an error. */
  def describeMedia(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    import graft.functions.BinaryMeta
    val p = col(payloadCol)
    media
      .withColumn("fmt", BinaryMeta.mediaFormat(p))
      .withColumn("width", BinaryMeta.mediaWidth(p))
      .withColumn("height", BinaryMeta.mediaHeight(p))
      .withColumn("sample_rate", BinaryMeta.wavSampleRateCol(p))
      .withColumn("channels", BinaryMeta.wavChannelsCol(p))
  }

  // hex renderings of little-endian integers — byte-order-critical and
  // shared by BOTH synthetic-container builders, so they live once
  private def le2(v: org.apache.spark.sql.Column) = {
    val h = lpad(hex(v), 4, "0"); concat(h.substr(3, 2), h.substr(1, 2))
  }
  private def le4(v: org.apache.spark.sql.Column) = {
    val h = lpad(hex(v), 8, "0")
    concat(h.substr(7, 2), h.substr(5, 2), h.substr(3, 2), h.substr(1, 2))
  }

  /** Deterministic synthetic container fixtures: VALID PNG / GIF / WAV
    * / JPEG headers built from doc_id arithmetic (dims ≤ 512×300,
    * rates 8–36 kHz), as hex assembled with engine-portable string
    * functions — so a DuckDB oracle can regenerate the same ground
    * truth arithmetically while the Spark side must round-trip the
    * actual BYTES through `BinaryMeta`'s parsers. The JPEG variant
    * carries an APP0 segment before its SOF0 to exercise the marker
    * skip loop; the WAV is a complete RIFF/fmt header. */
  def syntheticContainers(docs: DataFrame): DataFrame = {
    def be(v: org.apache.spark.sql.Column, nBytes: Int) =
      lpad(hex(v), nBytes * 2, "0")
    val w = (pmod(col("doc_id"), lit(512)) + 1).cast("int")
    val h = (pmod(col("doc_id"), lit(300)) + 1).cast("int")
    val rate = (lit(8000) + pmod(col("doc_id"), lit(8)) * 4000).cast("int")
    val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
    val png = concat(lit("89504E470D0A1A0A0000000D49484452"),
      be(w, 4), be(h, 4), lit("0806000000"))
    val gif = concat(lit("474946383961"), le2(w), le2(h), lit("F70000"))
    val wav = concat(lit("52494646"), le4(lit(36)), lit("57415645"),
      lit("666D7420"), le4(lit(16)), le2(lit(1)), le2(ch), le4(rate),
      le4(rate * 2), le2(lit(2)), le2(lit(16)))
    val jpg = concat(lit("FFD8FFE000040000FFC0001108"),
      be(h, 2), be(w, 2), lit("03011100021101031101"))
    val sel = pmod(col("doc_id"), lit(4))
    docs.select(col("doc_id"),
      unhex(when(sel === 0, png).when(sel === 1, gif)
        .when(sel === 2, wav).otherwise(jpg)).as("payload"))
  }

  /** Deterministic synthetic PCM-16 WAV fixtures: 16 samples per doc,
    * s_i = (doc_id·31 + i·17) mod 2¹⁶ reinterpreted signed — assembled
    * as hex with engine-portable string functions, so the DuckDB
    * oracle can regenerate the sample VALUES arithmetically while the
    * Spark side must decode the actual little-endian bytes through
    * `BinaryMeta.wavPcmStats`. Same construction-vs-parse gate shape
    * as `syntheticContainers`. */
  def syntheticWavPcm(docs: DataFrame): DataFrame = {
    val samples = concat_ws("", transform(sequence(lit(1), lit(16)),
      i => le2(pmod(col("doc_id") * 31 + i * 17, lit(65536)))))
    docs.select(col("doc_id"),
      unhex(concat(
        lit("52494646"), le4(lit(68)), lit("57415645"),
        lit("666D7420"), le4(lit(16)), le2(lit(1)), le2(lit(1)),
        le4(lit(8000)), le4(lit(16000)), le2(lit(2)), le2(lit(16)),
        lit("64617461"), le4(lit(32)), samples)).as("payload"))
  }

  // FLAC frame checksums (CRC-8 poly 0x07, CRC-16 poly 0x8005) for the
  // fixture fold below — same table-driven shape as crc32Table.
  private lazy val flacCrc8Table: Seq[Long] = (0 until 256).map { n =>
    var c = n; var k = 0
    while (k < 8) {
      c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
      k += 1
    }
    c.toLong
  }
  private lazy val flacCrc16Table: Seq[Long] = (0 until 256).map { n =>
    var c = n << 8; var k = 0
    while (k < 8) {
      c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
          else (c << 1) & 0xFFFF
      k += 1
    }
    c.toLong
  }
  private def flacCrc16Col(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = typedLit(flacCrc16Table)
    aggregate(bytes, lit(0L), (acc, x) =>
      element_at(t, shiftrightunsigned(acc, 8).bitwiseXOR(x)
          .bitwiseAND(lit(255L)).cast("int") + 1)
        .bitwiseXOR(shiftleft(acc, 8).bitwiseAND(lit(65535L))))
  }

  /** Default content formula for the archive fixtures: 16 lowercase
    * chars, char j of entry k = 'a' + (doc_id·7 + k·13 + j·3) mod 26 —
    * restatable in DuckDB as chr()/string_agg, and built DIRECTLY as a
    * byte array (the string→substring→ascii conversion the custom
    * path pays measured 5-7× slower per gate — bench round-14 triage).
    * Both fixture builders also accept a custom 16-ASCII-char string
    * column per entry slot (the archive-ingest gate needs
    * per-(doc,entry) UNIQUE content so its dedup oracle stays
    * arithmetic); only that path pays the conversion. */
  private def defaultArchiveBytes(k: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(15)), j =>
      pmod(col("doc_id") * 7 + k * 13 + j * 3, lit(26L)) + 97L)
  private def strBytes16(s: org.apache.spark.sql.Column) =
    transform(sequence(lit(1), lit(16)), j =>
      ascii(substring(s, j, lit(1))).cast("long"))
  private def archiveBytesOf(contentOf: Option[Int => org.apache.spark.sql.Column],
                             k: Int): org.apache.spark.sql.Column =
    contentOf.fold(defaultArchiveBytes(k))(f => strBytes16(f(k)))
  private def archiveContentHex(c: org.apache.spark.sql.Column) =
    concat_ws("", transform(c, v => lpad(hex(v), 2, "0")))

  /** Deterministic complete-ZIP fixtures for the archive-walk gate:
    * two STORED entries per doc (`f0.txt`, `f1.txt`, 16 bytes each,
    * the content formula above) with REAL CRC-32s computed as
    * `aggregate` folds — local headers, a full central directory, and
    * the end-of-central-directory record, all offsets template
    * constants because names and sizes are fixed-width. Spec-valid
    * (the JDK's own ZipInputStream reads these — pinned in
    * ArchiveSpec); DEFLATE entries cannot be built in SQL, so the
    * spec's ZipOutputStream round-trip covers method 8. */
  def syntheticZip(docs: DataFrame,
                   contentOf: Option[Int => org.apache.spark.sql.Column] =
                     None): DataFrame = {
    val names = Seq("f0.txt", "f1.txt")
    val nameHex = names.map(_.getBytes.map(b => f"$b%02X").mkString)
    def bytesOf(k: Int) = archiveBytesOf(contentOf, k)
    def crcHex(k: Int) = le4(crc32Col(bytesOf(k)))
    def local(k: Int) = concat(
      lit("504B0304" + "1400" + "0000" + "0000" + "0000" + "0000"),
      crcHex(k), le4(lit(16)), le4(lit(16)),
      lit("0600" + "0000" + nameHex(k)), archiveContentHex(bytesOf(k)))
    def cd(k: Int) = concat(
      lit("504B0102" + "1400" + "1400" + "0000" + "0000" + "0000" + "0000"),
      crcHex(k), le4(lit(16)), le4(lit(16)),
      lit("0600" + "0000" + "0000" + "0000" + "0000" + "00000000"),
      le4(lit(k * 52)), lit(nameHex(k)))
    val eocd = concat(
      lit("504B0506" + "0000" + "0000"), le2(lit(2)), le2(lit(2)),
      le4(lit(104)), le4(lit(104)), lit("0000"))
    docs.select(col("doc_id"),
      unhex(concat(local(0), local(1), cd(0), cd(1), eocd)).as("payload"))
  }

  /** One POSIX ustar header as its hex string — constant per (name,
    * size, typeflag) because the checksum only covers the header. */
  private def tarHeaderHex(name: String, size: Long, typeflag: Char): String = {
    val h = new Array[Byte](512)
    name.getBytes.copyToArray(h, 0)
    "0000644".getBytes.copyToArray(h, 100)
    "0000000".getBytes.copyToArray(h, 108)
    "0000000".getBytes.copyToArray(h, 116)
    f"$size%011o".getBytes.copyToArray(h, 124)
    "00000000000".getBytes.copyToArray(h, 136)
    h(156) = typeflag.toByte
    "ustar".getBytes.copyToArray(h, 257) // magic "ustar\0" + version "00"
    h(263) = '0'; h(264) = '0'
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xFF).sum
    f"$sum%06o".getBytes.copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    h.map(b => f"${b & 0xFF}%02X").mkString
  }

  /** Deterministic complete-tar fixtures: a directory entry plus two
    * 16-byte regular files per doc (same content formula as the ZIP
    * fixture), checksummed ustar headers as template constants, data
    * blocks NUL-padded to 512, two zero trailer blocks. */
  def syntheticTar(docs: DataFrame,
                   contentOf: Option[Int => org.apache.spark.sql.Column] =
                     None): DataFrame = {
    val pad496 = "00" * 496
    val trailer = "00" * 1024
    val hex = concat(
      lit(tarHeaderHex("d/", 0, '5')),
      lit(tarHeaderHex("f0.txt", 16, '0')),
      archiveContentHex(archiveBytesOf(contentOf, 1)),
      lit(pad496),
      lit(tarHeaderHex("f1.txt", 16, '0')),
      archiveContentHex(archiveBytesOf(contentOf, 2)),
      lit(pad496 + trailer))
    docs.select(col("doc_id"), unhex(hex).as("payload"))
  }

  /** Deterministic WebP fixtures: even docs a VP8L (lossless
    * signature, 14+14-bit dims), odd docs a VP8 lossy key frame
    * (start code 9D 01 2A + 14-bit LE dims); dims doc-derived. */
  def syntheticWebp(docs: DataFrame): DataFrame = {
    val w = pmod(col("doc_id"), lit(500L)) + 1L
    val h = pmod(col("doc_id"), lit(300L)) + 1L
    val vp8l = concat(
      lit("52494646"), le4(lit(18)), lit("57454250"),
      lit("5650384C"), le4(lit(5)), lit("2F"),
      le4((w - 1).bitwiseOR(shiftleft(h - 1, 14))), lit("00")) // pad
    val vp8 = concat(
      lit("52494646"), le4(lit(22)), lit("57454250"),
      lit("56503820"), le4(lit(10)), lit("000000"), lit("9D012A"),
      le2(w), le2(h))
    docs.select(col("doc_id"),
      unhex(when(pmod(col("doc_id"), lit(2L)) === 0, vp8l).otherwise(vp8))
        .as("payload"))
  }

  /** Deterministic little-endian TIFF fixtures: IFD0 with
    * width/height/samples/compression as inline SHORTs. */
  def syntheticTiff(docs: DataFrame): DataFrame = {
    val w = pmod(col("doc_id"), lit(2000L)) + 1L
    val h = pmod(col("doc_id"), lit(1200L)) + 1L
    def entry(tag: Int, value: org.apache.spark.sql.Column) =
      concat(le2(lit(tag)), le2(lit(3)), le4(lit(1)), le2(value), le2(lit(0)))
    val tiff = concat(
      lit("49492A00"), le4(lit(8)), // II, magic 42, IFD0 at 8
      le2(lit(4)),
      entry(256, w), entry(257, h),
      entry(259, lit(1)), entry(277, lit(3)),
      le4(lit(0)))
    docs.select(col("doc_id"), unhex(tiff).as("payload"))
  }

  // Ogg page CRC (poly 0x04C11DB7, MSB-first, init 0, no final xor) as
  // an aggregate fold — pages carry REAL checksums like the PNG/FLAC
  // fixtures do.
  private lazy val oggCrcTable: Seq[Long] = (0 until 256).map { n =>
    var c = (n.toLong << 24) & 0xFFFFFFFFL
    var k = 0
    while (k < 8) {
      c = if ((c & 0x80000000L) != 0) ((c << 1) ^ 0x04C11DB7L) & 0xFFFFFFFFL
          else (c << 1) & 0xFFFFFFFFL
      k += 1
    }
    c
  }
  private def oggCrcCol(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = typedLit(oggCrcTable)
    aggregate(bytes, lit(0L), (acc, x) =>
      shiftleft(acc, 8).bitwiseAND(lit(0xFFFFFFFFL)).bitwiseXOR(
        element_at(t, shiftrightunsigned(acc, 24).bitwiseXOR(x)
          .bitwiseAND(lit(255L)).cast("int") + 1)))
  }

  /** Deterministic two-page Ogg/Opus fixtures: a BOS page carrying the
    * OpusHead id header (doc-derived channel count), an EOS page with
    * the doc-derived duration granule; REAL page CRCs via the fold. */
  def syntheticOggOpus(docs: DataFrame): DataFrame = {
    def le(v: org.apache.spark.sql.Column, n: Int) =
      array((0 until n).map(i =>
        shiftrightunsigned(v, i * 8).bitwiseAND(lit(255L))): _*)
    def lit8(xs: Int*) = array(xs.map(x => lit(x.toLong)): _*)
    val ch = pmod(col("doc_id"), lit(7L)) + 1L
    val granule = col("doc_id") * 960L + 960L
    // OpusHead: magic(8) version(1) channels(1) preskip(2) rate(4)
    // gain(2) mapping(1) = 19 bytes
    val opusHead = concat(
      lit8(0x4F, 0x70, 0x75, 0x73, 0x48, 0x65, 0x61, 0x64, 1),
      le(ch, 1), lit8(0x38, 0x01), le(lit(48000L), 4), lit8(0, 0, 0))
    def page(flags: Int, gran: org.apache.spark.sql.Column,
             seq: Int, body: org.apache.spark.sql.Column) = {
      val noCrc = concat(
        lit8(0x4F, 0x67, 0x67, 0x53, 0, flags), le(gran, 8),
        le(lit(7L), 4), le(lit(seq.toLong), 4), lit8(0, 0, 0, 0),
        array(lit(1L), size(body).cast("long")), body) // nsegs=1 + lacing
      val crc = oggCrcCol(noCrc)
      // splice the real CRC into bytes 23-26 (slice is 1-indexed and
      // tolerates a length past the end)
      concat(slice(noCrc, 1, 22), le(crc, 4), slice(noCrc, 27, 1 << 20))
    }
    val data = lit8(0x40, 0, 0) // 3-byte opus packet (silence frame)
    val ogg = concat(
      page(0x02, lit(0L), 0, opusHead),
      page(0x04, granule, 1, data))
    docs.select(col("doc_id"),
      unhex(concat_ws("", transform(ogg, v => lpad(hex(v), 2, "0"))))
        .as("payload"))
  }

  /** Deterministic multipart EML fixtures: a two-part MIME message per
    * doc — quoted-printable text/plain (the accent's UTF-8 bytes
    * spelled as =C3=Ax escapes), base64 text/html with a
    * Content-Disposition filename, and an RFC 2047 B-encoded Subject —
    * assembled with engine-portable string functions (Spark's own
    * base64/encode build the encoded stream; the oracle restates only
    * DECODED values). */
  def syntheticEml(docs: DataFrame): DataFrame = {
    val accentIdx = pmod(col("doc_id"), lit(16L))
    val accent = chr(accentIdx + 224L)
    val subject = concat(lit("Re: caf"), accent, lit(" "), col("doc_id"))
    val eml = concat(
      lit("From: alice@example.com\nTo: bob@example.com\nSubject: =?UTF-8?B?"),
      base64(encode(subject, "UTF-8")),
      lit("?=\nDate: Mon, 1 Jan 2024 00:00:00 +0000\nMessage-ID: <m"),
      col("doc_id"),
      lit("@example>\nMIME-Version: 1.0\n" +
        "Content-Type: multipart/mixed; boundary=\"b42\"\n\n" +
        "--b42\nContent-Type: text/plain; charset=utf-8\n" +
        "Content-Transfer-Encoding: quoted-printable\n\ncaf=C3=A"),
      hex(accentIdx), // the accent's UTF-8 low nibble as a QP escape
      lit(" body "), col("doc_id"),
      lit("\n--b42\nContent-Type: text/html; charset=utf-8\n" +
        "Content-Transfer-Encoding: base64\n" +
        "Content-Disposition: inline; filename=\"doc"),
      col("doc_id"),
      lit(".html\"\n\n"),
      base64(encode(concat(lit("<p>doc "), col("doc_id"), lit("</p>")),
        "UTF-8")),
      lit("\n--b42--\n"))
    docs.select(col("doc_id"), encode(eml, "UTF-8").as("payload"))
  }

  /** Deterministic complete-FLAC fixtures for the Rice/prediction
    * decode gate: mono, 16-bit, 8 kHz, one 16-sample frame per doc,
    * sample i = (doc_id·31 + i·17) mod 64 − 32. The one FLAC bitstream
    * a SQL expression can assemble is chosen here: a FIXED order-0
    * subframe (residual = sample) with partition order 0 and Rice
    * parameter 7, so every zigzag-folded residual u < 128 encodes with
    * quotient 0 as exactly 8 bits — stop bit + 7-bit remainder, i.e.
    * the byte 0x80|u. The residual section still starts 10 bits into
    * its byte (2-bit method + 4-bit partition order + 4-bit param), so
    * each output byte is the shifted splice of two adjacent codes —
    * plain bitwise arithmetic over a `transform`. Frame CRC-8 is a
    * compile-time constant (the header is doc-independent); frame
    * CRC-16 is a REAL `aggregate` fold over the assembled bytes, so
    * the stream passes any conforming decoder's integrity checks. The
    * DuckDB oracle regenerates the samples arithmetically and never
    * sees bytes; the Spark side must undo the actual entropy coding
    * through `BinaryMeta.flacPcmStats`. LPC, nonzero quotients,
    * partitioning, escapes and stereo decorrelation cannot be built in
    * SQL — FlacDecodeSpec's spec-side encoder covers those. */
  def syntheticFlacPcm(docs: DataFrame): DataFrame = {
    // "fLaC" + last-block STREAMINFO: blocksize 16/16, framesize
    // unknown, 8000 Hz | 1 ch | 16 bps | 16 total samples, md5 unknown
    val streamInfo: Seq[Long] = Seq(
      0x66L, 0x4CL, 0x61L, 0x43L,
      0x80L, 0x00L, 0x00L, 0x22L,
      0x00L, 0x10L, 0x00L, 0x10L,
      0x00L, 0x00L, 0x00L, 0x00L, 0x00L, 0x00L,
      0x01L, 0xF4L, 0x00L, 0xF0L,
      0x00L, 0x00L, 0x00L, 0x10L) ++ Seq.fill(16)(0L)
    // frame header: sync/fixed-blocksize, blocksize-code 6 (8-bit
    // value follows) + 8 kHz, mono + 16 bps, frame number 0,
    // blocksize−1 = 15 — doc-independent, so its CRC-8 is a constant
    val frameHdr: Seq[Long] = Seq(0xFFL, 0xF8L, 0x64L, 0x08L, 0x00L, 0x0FL)
    val hdrCrc8 =
      frameHdr.foldLeft(0L)((c, x) => flacCrc8Table(((c ^ x) & 0xFF).toInt))
    // zigzag-folded order-0 residuals as 8-bit rice codes 0x80|u
    val codes = transform(sequence(lit(1L), lit(16L)), i => {
      val s = pmod(col("doc_id") * 31 + i * 17, lit(64L)) - 32L
      when(s >= 0, s * 2).otherwise(s * -2 - 1) + 128L
    })
    // subframe hdr 0x10, then the 10-bit residual preamble
    // 00|0000|0111 followed by the codes and 6 zero pad bits
    val subframe = concat(
      array(lit(0x10L), lit(0x01L)),
      array(shiftrightunsigned(element_at(codes, 1), 2)
        .bitwiseOR(lit(0xC0L))),
      transform(sequence(lit(2), lit(16)), m =>
        shiftleft(element_at(codes, m - 1), 6).bitwiseAND(lit(0xFFL))
          .bitwiseOR(shiftrightunsigned(element_at(codes, m), 2))),
      array(shiftleft(element_at(codes, 16), 6).bitwiseAND(lit(0xFFL))))
    val frame = concat(
      array((frameHdr :+ hdrCrc8).map(lit): _*), subframe)
    val c16 = flacCrc16Col(frame)
    val flac = concat(
      array(streamInfo.map(lit): _*), frame,
      array(shiftrightunsigned(c16, 8), c16.bitwiseAND(lit(255L))))
    docs.select(col("doc_id"),
      unhex(concat_ws("", transform(flac, v => lpad(hex(v), 2, "0"))))
        .as("payload"))
  }

  /** Deterministic complete-GIF fixtures for the LZW pixel-decode gate:
    * a doc-dependent (w × h ≤ 6×4) image over a fixed 128-color global
    * palette (entry j = (3j, 5j+1, 7j+2) mod 256), pixel i =
    * (doc_id·7 + i·13) mod 128. The LZW stream is built the one way a
    * SQL expression can build one: literal codes only, with a CLEAR
    * every 12 pixels so the decoder's dictionary never reaches 2^width
    * and every code stays exactly 8 bits (minCodeSize 7) — i.e. one
    * hex byte per code, assemblable with engine-portable string
    * functions. Spec-valid GIF (the JDK's own ImageIO reader decodes
    * these fixtures identically — pinned in BinaryMetaSpec); the
    * DuckDB oracle regenerates pixel values and palette sums
    * arithmetically while the Spark side must inflate the actual code
    * stream through `BinaryMeta.gifPixelStats`. Dictionary growth,
    * width bumps and multi-block streams are exercised by the spec's
    * real LZW encoder (they cannot be built in SQL). */
  def syntheticGifPixels(docs: DataFrame): DataFrame = {
    val paletteHex = (0 until 128).map(j =>
      f"${j * 3 % 256}%02X${(j * 5 + 1) % 256}%02X${(j * 7 + 2) % 256}%02X")
      .mkString
    val w = (pmod(col("doc_id"), lit(5)) + 2).cast("int")
    val h = (pmod(col("doc_id"), lit(3)) + 2).cast("int")
    val n = w * h
    val codes = concat_ws("", transform(sequence(lit(0), n - 1), i =>
      concat(when(pmod(i, lit(12)) === 0, lit("80")).otherwise(lit("")),
        lpad(hex(pmod(col("doc_id") * 7 + i * 13, lit(128))), 2, "0"))))
    // sub-block byte count: n literals + ceil(n/12) clears + 1 EOI
    // (Column./ is DOUBLE division — floor() restores the integer ceil)
    val subLen = lpad(hex(n + floor((n + lit(11)) / lit(12)).cast("int") + 1), 2, "0")
    docs.select(col("doc_id"),
      unhex(concat(
        lit("474946383961"), le2(w), le2(h),
        lit("F60000"),       // GCT present, 128 entries; bg 0; aspect 0
        lit(paletteHex),
        lit("2C00000000"), le2(w), le2(h), lit("00"), // descriptor at 0,0
        lit("07"),           // LZW minimum code size
        subLen, codes, lit("81"), // one sub-block: codes + EOI
        lit("003B"))).as("payload")) // block terminator + trailer
  }

  /** Standard CRC-32 table (polynomial 0xEDB88320), literal-broadcast
    * into the fixture-builder fold below. */
  private lazy val crc32Table: Seq[Long] = (0 until 256).map { n =>
    var c = n.toLong
    var k = 0
    while (k < 8) { c = if ((c & 1) != 0) 0xEDB88320L ^ (c >>> 1) else c >>> 1; k += 1 }
    c
  }

  /** CRC-32 of a byte array column — a sequential `aggregate` fold:
    * acc' = (acc >>> 8) ^ T[(acc ^ x) & 0xff]. Engine-side only (the
    * oracle never rebuilds bytes); what makes a SQL-built PNG carry
    * VALID chunk CRCs, so independent readers accept it. */
  private def crc32Col(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = typedLit(crc32Table)
    aggregate(bytes, lit(0xFFFFFFFFL), (acc, x) =>
      shiftrightunsigned(acc, 8).bitwiseXOR(
        element_at(t, acc.bitwiseXOR(x).bitwiseAND(lit(255L)).cast("int") + 1)))
      .bitwiseXOR(lit(0xFFFFFFFFL))
  }

  /** Adler-32 (zlib trailer) of a byte array column — the (s1, s2)
    * running pair as a struct-state fold. */
  private def adler32Col(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val st = aggregate(bytes,
      struct(lit(1L).as("s1"), lit(0L).as("s2")),
      (acc, x) => {
        val s1 = (acc.getField("s1") + x) % 65521
        struct(s1.as("s1"), ((acc.getField("s2") + s1) % 65521).as("s2"))
      })
    st.getField("s2") * 65536 + st.getField("s1")
  }

  /** Deterministic complete-PNG fixtures for the inflate+unfilter gate:
    * 8-bit GRAYSCALE w×h (doc-dependent, ≤ 7×5), pixel i =
    * (doc_id·11 + i·7) mod 256, every scanline filter None. The zlib
    * stream is the one a SQL expression can build: a single STORED
    * deflate block (BFINAL=1/BTYPE=00 + LE length + ones-complement) —
    * spec-valid, just uncompressed — with a REAL Adler-32 trailer and
    * REAL CRC-32s on every chunk, both computed as `aggregate` folds
    * over the byte arrays (table-driven CRC as a 256-entry literal).
    * Independent readers accept these fixtures (pinned against the JDK
    * ImageIO PNG reader in BinaryMetaSpec); the DuckDB oracle
    * regenerates pixel sums arithmetically while the Spark side must
    * inflate the actual stream through `BinaryMeta.pngPixelStats`.
    * Compressed blocks and the Sub/Up/Average/Paeth filters cannot be
    * built in SQL — the spec's ImageIO-WRITER round-trip covers those
    * (real encoders emit them). */
  def syntheticPngPixels(docs: DataFrame): DataFrame = {
    val w = pmod(col("doc_id"), lit(6L)) + 2L
    val h = pmod(col("doc_id"), lit(4L)) + 2L
    def be4(v: org.apache.spark.sql.Column) = array(
      shiftrightunsigned(v, 24).bitwiseAND(lit(255L)),
      shiftrightunsigned(v, 16).bitwiseAND(lit(255L)),
      shiftrightunsigned(v, 8).bitwiseAND(lit(255L)),
      v.bitwiseAND(lit(255L)))
    val raw = flatten(transform(sequence(lit(0L), h - 1), y =>
      concat(array(lit(0L)), transform(sequence(lit(0L), w - 1), x =>
        pmod(col("doc_id") * 11 + (y * w + x) * 7, lit(256L))))))
    val len = h * (w + 1)
    val zlib = concat(
      array(lit(120L), lit(1L), lit(1L)),
      array(len.bitwiseAND(lit(255L)),
        shiftrightunsigned(len, 8).bitwiseAND(lit(255L)),
        (lit(65535L) - len).bitwiseAND(lit(255L)),
        shiftrightunsigned(lit(65535L) - len, 8).bitwiseAND(lit(255L))),
      raw, be4(adler32Col(raw)))
    val ihdrType = array(Seq(73L, 72L, 68L, 82L).map(lit): _*) // "IHDR"
    val ihdrBody = concat(be4(w), be4(h),
      array(Seq(8L, 0L, 0L, 0L, 0L).map(lit): _*))
    val idatType = array(Seq(73L, 68L, 65L, 84L).map(lit): _*) // "IDAT"
    val png = concat(
      array(Seq(137L, 80L, 78L, 71L, 13L, 10L, 26L, 10L).map(lit): _*),
      array(Seq(0L, 0L, 0L, 13L).map(lit): _*), ihdrType, ihdrBody,
      be4(crc32Col(concat(ihdrType, ihdrBody))),
      be4(size(zlib).cast("long")), idatType, zlib,
      be4(crc32Col(concat(idatType, zlib))),
      array(Seq(0L, 0L, 0L, 0L, 73L, 69L, 78L, 68L,
        174L, 66L, 96L, 130L).map(lit): _*)) // IEND + fixed CRC
    docs.select(col("doc_id"),
      unhex(concat_ws("", transform(png, v => lpad(hex(v), 2, "0"))))
        .as("payload"))
  }

  /** Deterministic complete-JPEG fixtures for the baseline-decode gate:
    * grayscale SOF0, (1-3)×(1-2) blocks of 8×8, every block DC-ONLY —
    * the one JPEG shape that is integer-EXACT in every conforming
    * decoder (the IDCT collapses to round(dc·q/8) + 128; with q₀ = 8
    * each block is flat 128 + dc), so the hash-exact DuckDB oracle
    * holds. The Huffman tables are minimal-but-valid CUSTOM tables
    * chosen to make the bit stream SQL-expressible: the DC table is
    * canonical over BITS=[1,1,1,1,1,1] so category s encodes as s
    * ones + a zero (unary), and the AC table has the single symbol
    * EOB = '0'. DC diffs ride the standard magnitude/ones-complement
    * encoding; bits assemble as '0'/'1' strings, pack via conv(·,2,10),
    * and 0xFF bytes get their 0x00 stuffing. ImageIO reads these
    * fixtures (spec-pinned); real compressed AC streams and restart
    * markers are covered by the spec against ImageIO-written JPEGs. */
  def syntheticJpegPixels(docs: DataFrame): DataFrame = {
    val bw = pmod(col("doc_id"), lit(3L)) + 1L
    val bh = pmod(col("doc_id"), lit(2L)) + 1L
    def be2(v: org.apache.spark.sql.Column) = lpad(hex(v), 4, "0")
    // per-block '0'/'1' strings: unary DC category code, magnitude
    // bits (ones-complement when negative), 1-bit EOB
    val blockBits = expr(
      """transform(sequence(0, (doc_id % 3 + 1) * (doc_id % 2 + 1) - 1), b ->
        |  concat(
        |    repeat('1', CAST(IF(
        |      ((doc_id*5 + b*7) % 21 - 10) - IF(b = 0, 0, (doc_id*5 + (b-1)*7) % 21 - 10) = 0,
        |      0,
        |      length(bin(abs(((doc_id*5 + b*7) % 21 - 10) - IF(b = 0, 0, (doc_id*5 + (b-1)*7) % 21 - 10))))
        |    ) AS INT)),
        |    '0',
        |    CASE
        |      WHEN ((doc_id*5 + b*7) % 21 - 10) - IF(b = 0, 0, (doc_id*5 + (b-1)*7) % 21 - 10) = 0 THEN ''
        |      WHEN ((doc_id*5 + b*7) % 21 - 10) - IF(b = 0, 0, (doc_id*5 + (b-1)*7) % 21 - 10) > 0 THEN
        |        bin(((doc_id*5 + b*7) % 21 - 10) - IF(b = 0, 0, (doc_id*5 + (b-1)*7) % 21 - 10))
        |      ELSE lpad(
        |        bin(((doc_id*5 + b*7) % 21 - 10) - IF(b = 0, 0, (doc_id*5 + (b-1)*7) % 21 - 10)
        |            + shiftleft(1, CAST(length(bin(abs(((doc_id*5 + b*7) % 21 - 10) - IF(b = 0, 0, (doc_id*5 + (b-1)*7) % 21 - 10)))) AS INT)) - 1),
        |        CAST(length(bin(abs(((doc_id*5 + b*7) % 21 - 10) - IF(b = 0, 0, (doc_id*5 + (b-1)*7) % 21 - 10)))) AS INT),
        |        '0')
        |    END,
        |    '0'))""".stripMargin)
    val stream = array_join(blockBits, "")
    val padded = rpad(stream,
      (floor((length(stream) + 7) / lit(8)) * 8).cast("int"), lit("1"))
    val nBytes = (length(padded) / 8).cast("long")
    val bytes = transform(sequence(lit(1L), nBytes), i =>
      conv(padded.substr(((i - 1) * 8 + 1).cast("int"), lit(8)), 2, 10)
        .cast("long"))
    val stuffed = flatten(transform(bytes, v =>
      when(v === 255L, array(lit(255L), lit(0L))).otherwise(array(v))))
    val entropyHex = concat_ws("", transform(stuffed, v => lpad(hex(v), 2, "0")))
    val w = bw * 8
    val h = bh * 8
    val dqt = "FFDB004300" + "08" * 64
    val dhtDc = "FFC40019" + "00" + "01" * 6 + "00" * 10 + "000102030405"
    val dhtAc = "FFC40014" + "10" + "01" + "00" * 15 + "00"
    docs.select(col("doc_id"),
      unhex(concat(
        lit("FFD8" + dqt + dhtDc + dhtAc),
        lit("FFC0000B08"), be2(h), be2(w), lit("01011100"),
        lit("FFDA000801010000 3F00".replace(" ", "")),
        entropyHex,
        lit("FFD9"))).as("payload"))
  }

  /** Deterministic PROGRESSIVE JPEG fixtures for the multi-scan gate:
    * grayscale SOF2 with THREE scans — the successive-approximation DC
    * pair (scan 1: Al=1 carries dc>>1 through the unary-DC Huffman
    * diff chain; scan 2: Ah=1/Al=0 carries one refinement bit = dc&1
    * per block) plus an explicit all-EOB AC scan over band [1,63]
    * (one '0' EOB bit per block through the single-symbol AC table) —
    * the AC scan both exercises the Annex-G band path and makes the
    * progression COMPLETE, which matters for the ImageIO cross-check:
    * libjpeg-derived readers apply BLOCK SMOOTHING (neighbor-DC AC
    * prediction) to incomplete progressions, a display nicety outside
    * T.81's zero-fill reconstruction. Every block DC-only with
    * dc(d,b) = (d·5+b·7) mod 21 ∈ [0,20] (non-negative so dc div 2 =
    * dc>>1 in BOTH engines), so reconstruction is integer-exact:
    * pixel = 128 + dc. Each scan's bit stream pads to a byte with
    * 1-bits and gets 0xFF stuffing independently, exactly as T.81
    * requires per entropy segment. */
  def syntheticJpegProgressive(docs: DataFrame): DataFrame = {
    val bw = pmod(col("doc_id"), lit(3L)) + 1L
    val bh = pmod(col("doc_id"), lit(2L)) + 1L
    def be2(v: org.apache.spark.sql.Column) = lpad(hex(v), 4, "0")
    def hd(b: String) = s"((doc_id*5 + ($b)*7) % 21) div 2"
    val d = s"(${hd("b")} - IF(b = 0, 0, ${hd("b - 1")}))"
    val scan1Bits = expr(
      s"""array_join(transform(sequence(0, (doc_id % 3 + 1) * (doc_id % 2 + 1) - 1), b ->
         |  concat(
         |    repeat('1', CAST(IF($d = 0, 0, length(bin(abs($d)))) AS INT)),
         |    '0',
         |    CASE WHEN $d = 0 THEN ''
         |         WHEN $d > 0 THEN bin($d)
         |         ELSE lpad(
         |           bin($d + shiftleft(1, CAST(length(bin(abs($d))) AS INT)) - 1),
         |           CAST(length(bin(abs($d))) AS INT), '0')
         |    END)), '')""".stripMargin)
    val scan2Bits = expr(
      """array_join(transform(sequence(0, (doc_id % 3 + 1) * (doc_id % 2 + 1) - 1), b ->
        |  CAST((doc_id*5 + b*7) % 21 % 2 AS STRING)), '')""".stripMargin)
    val scan3Bits = expr(
      "repeat('0', CAST((doc_id % 3 + 1) * (doc_id % 2 + 1) AS INT))")
    def entropyHex(bits: org.apache.spark.sql.Column) = {
      val padded = rpad(bits,
        (floor((length(bits) + 7) / lit(8)) * 8).cast("int"), lit("1"))
      val nBytes = (length(padded) / 8).cast("long")
      val bytes = transform(sequence(lit(1L), nBytes), i =>
        conv(padded.substr(((i - 1) * 8 + 1).cast("int"), lit(8)), 2, 10)
          .cast("long"))
      val stuffed = flatten(transform(bytes, v =>
        when(v === 255L, array(lit(255L), lit(0L))).otherwise(array(v))))
      concat_ws("", transform(stuffed, v => lpad(hex(v), 2, "0")))
    }
    val w = bw * 8
    val h = bh * 8
    val dqt = "FFDB004300" + "08" * 64
    val dhtDc = "FFC40019" + "00" + "01" * 6 + "00" * 10 + "000102030405"
    val dhtAc = "FFC40014" + "10" + "01" + "00" * 15 + "00"
    docs.select(col("doc_id"),
      unhex(concat(
        lit("FFD8" + dqt + dhtDc + dhtAc),
        lit("FFC2000B08"), be2(h), be2(w), lit("01011100"),
        lit("FFDA0008010100000001"), // scan 1: Ss=Se=0, Ah=0, Al=1
        entropyHex(scan1Bits),
        lit("FFDA0008010100000010"), // scan 2: Ss=Se=0, Ah=1, Al=0
        entropyHex(scan2Bits),
        lit("FFDA0008010100013F00"), // scan 3: AC band [1,63], all-EOB
        entropyHex(scan3Bits),
        lit("FFD9"))).as("payload"))
  }

  /** Deterministic 4:4:4 COLOR JPEG fixtures for the interleaved-MCU
    * decode gate: 3-component SOF0, every sampling factor 1×1 (so no
    * chroma resampling exists to be implementation-defined), every
    * block DC-ONLY — per MCU the stream carries one Y, one Cb, one Cr
    * block through the same SQL-expressible custom Huffman tables as
    * [[syntheticJpegPixels]] (unary DC categories, EOB-only AC), with
    * per-COMPONENT DC predictor chains exactly as T.81 F.1.1.5.1
    * requires for interleaved scans. With q₀ = 8 each component block
    * is flat 128 + dc where dc(d,b,c) = (d·5 + b·7 + c·31) mod 21 −
    * 10 ∈ [118,138] — far from the clamp, so the pinned fixed-point
    * YCbCr→RGB stays in the positive-numerator regime and the DuckDB
    * oracle reproduces it with plain integer floor-division. */
  def syntheticJpegColorPixels(docs: DataFrame): DataFrame = {
    val bw = pmod(col("doc_id"), lit(3L)) + 1L
    val bh = pmod(col("doc_id"), lit(2L)) + 1L
    def be2(v: org.apache.spark.sql.Column) = lpad(hex(v), 4, "0")
    // stream block i (MCU i div 3, component i % 3): DC value and the
    // per-component diff chain
    def dc(b: String, c: String) = s"((doc_id*5 + ($b)*7 + ($c)*31) % 21 - 10)"
    val d = s"(${dc("i div 3", "i % 3")} - IF(i div 3 = 0, 0, ${dc("i div 3 - 1", "i % 3")}))"
    val blockBits = expr(
      s"""transform(sequence(0, (doc_id % 3 + 1) * (doc_id % 2 + 1) * 3 - 1), i ->
         |  concat(
         |    repeat('1', CAST(IF($d = 0, 0, length(bin(abs($d)))) AS INT)),
         |    '0',
         |    CASE WHEN $d = 0 THEN ''
         |         WHEN $d > 0 THEN bin($d)
         |         ELSE lpad(
         |           bin($d + shiftleft(1, CAST(length(bin(abs($d))) AS INT)) - 1),
         |           CAST(length(bin(abs($d))) AS INT), '0')
         |    END,
         |    '0'))""".stripMargin)
    val stream = array_join(blockBits, "")
    val padded = rpad(stream,
      (floor((length(stream) + 7) / lit(8)) * 8).cast("int"), lit("1"))
    val nBytes = (length(padded) / 8).cast("long")
    val bytes = transform(sequence(lit(1L), nBytes), i =>
      conv(padded.substr(((i - 1) * 8 + 1).cast("int"), lit(8)), 2, 10)
        .cast("long"))
    val stuffed = flatten(transform(bytes, v =>
      when(v === 255L, array(lit(255L), lit(0L))).otherwise(array(v))))
    val entropyHex = concat_ws("", transform(stuffed, v => lpad(hex(v), 2, "0")))
    val w = bw * 8
    val h = bh * 8
    val dqt = "FFDB004300" + "08" * 64
    val dhtDc = "FFC40019" + "00" + "01" * 6 + "00" * 10 + "000102030405"
    val dhtAc = "FFC40014" + "10" + "01" + "00" * 15 + "00"
    docs.select(col("doc_id"),
      unhex(concat(
        lit("FFD8" + dqt + dhtDc + dhtAc),
        lit("FFC0001108"), be2(h), be2(w),
        lit("03" + "011100" + "021100" + "031100"),
        lit("FFDA000C03" + "0100" + "0200" + "0300" + "003F00"),
        entropyHex,
        lit("FFD9"))).as("payload"))
  }

  /** Deterministic MP3 / ADTS-AAC / MP4 container fixtures for the
    * A/V header-walk gate (k = doc_id div 3 drives every field so the
    * DuckDB oracle regenerates the ground truth arithmetically):
    *  - doc_id%3=0 → ID3v2.4-prefixed MPEG-1 Layer III frame header
    *    (syncsafe tag size k%100+4, bitrate index k%14+1, sample-rate
    *    index k%3, channel mode k%4);
    *  - doc_id%3=1 → ADTS header (profile bits k%4, sampling index
    *    k%12, channel config k%7+1 split across the byte boundary,
    *    13-bit frame length k%4000+7);
    *  - doc_id%3=2 → ftyp + moov[mvhd v0(timescale 1000+k%9000,
    *    duration k%100000+1000) + trak[tkhd v0(16.16 dims
    *    (k%1920+1)×(k%1080+1))]].
    * The Spark side must walk the actual BYTES through
    * `BinaryMeta.mp3Meta/adtsMeta/mp4Meta`; construction and parse
    * cannot share a bug (the X138 pattern). */
  def syntheticAvContainers(docs: DataFrame): DataFrame = {
    def be4(v: org.apache.spark.sql.Column) = lpad(hex(v), 8, "0")
    def byte(v: org.apache.spark.sql.Column) = lpad(hex(v), 2, "0")
    val k = col("doc_id") / lit(3L) cast "long" // floor: doc_id ≥ 0
    // MP3: ID3 header (10) + ts zero bytes + 4-byte frame header
    val ts = pmod(k, lit(100L)) + 4L
    val bi = pmod(k, lit(14L)) + 1L
    val si = pmod(k, lit(3L))
    val cm = pmod(k, lit(4L))
    val mp3 = concat(
      lit("494433" + "0400" + "00" + "000000"), byte(ts),
      repeat(lit("00"), ts.cast("int")),
      lit("FFFB"), byte(bi * 16 + si * 4), byte(cm * 64))
    // ADTS: FF F1, then profile/sfi/cfg/frame-length bit packing
    val pb = pmod(k, lit(4L))
    val sfi = pmod(k, lit(12L))
    val cfg = pmod(k, lit(7L)) + 1L
    val fl = pmod(k, lit(4000L)) + 7L
    val aac = concat(
      lit("FFF1"),
      byte(pb * 64 + sfi * 4 + (cfg / 4).cast("long")),
      byte(pmod(cfg, lit(4L)) * 64 + (fl / 2048).cast("long")),
      byte(pmod((fl / 8).cast("long"), lit(256L))),
      byte(pmod(fl, lit(8L)) * 32 + 31),
      lit("FC"))
    // MP4: ftyp(16) + moov[mvhd v0(108) + trak[tkhd v0(92)]]
    val tsc = lit(1000L) + pmod(k, lit(9000L))
    val dur = pmod(k, lit(100000L)) + 1000L
    val w = pmod(k, lit(1920L)) + 1L
    val h = pmod(k, lit(1080L)) + 1L
    val mvhd = concat(
      lit("0000006C" + "6D766864" + "00000000" + "00000000" + "00000000"),
      be4(tsc), be4(dur),
      lit("00010000" + "0100" + "0000" + "00000000" + "00000000" +
        "00010000" + "00000000" + "00000000" + "00000000" + "00010000" +
        "00000000" + "00000000" + "00000000" + "40000000" +
        "00000000" * 6 + "00000002"))
    val tkhd = concat(
      lit("0000005C" + "746B6864" + "00000007" + "00000000" + "00000000" +
        "00000001" + "00000000"),
      be4(dur),
      lit("00000000" + "00000000" + "0000" + "0000" + "0000" + "0000" +
        "00010000" + "00000000" + "00000000" + "00000000" + "00010000" +
        "00000000" + "00000000" + "00000000" + "40000000"),
      be4(w * 65536L), be4(h * 65536L))
    val mp4 = concat(
      lit("00000010" + "66747970" + "69736F6D" + "00000200"),
      lit("000000D8" + "6D6F6F76"), mvhd,
      lit("00000064" + "7472616B"), tkhd)
    val sel = pmod(col("doc_id"), lit(3L))
    docs.select(col("doc_id"),
      unhex(when(sel === 0, mp3).when(sel === 1, aac).otherwise(mp4))
        .as("payload"))
  }

  /** WARC crawl-blob extraction — one row per record with the payload
    * sliced by the index's (off, len), never delimiter-scanned: the
    * entry stage of a web-corpus pipeline (compose with `htmlToText` /
    * `urlCanonical` downstream). `.warc.gz` blobs (gzip magic) are
    * auto-detected and member-split through `gunzipMembers` first —
    * the framing real crawls ship (one gzip member per record,
    * concatenated), so both the compressed and plain container enter
    * the SAME downstream pipeline. Pure map-side: the codegen'd
    * gunzip + `BinaryMeta.warcIndex` walk + a Generate, payload bytes
    * never leave their partition. Blobs with no complete record
    * vanish (null index → explode drops the row). */
  def warcExtract(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val raw = col(payloadCol)
    val src = when(
      substring(raw, 1, 2) === lit(Array(0x1f.toByte, 0x8b.toByte)),
      graft.functions.BinaryMeta.gunzipMembersCol(raw)).otherwise(raw)
    val idx = graft.functions.BinaryMeta.warcIndexCol(col("__warc"))
    df.withColumn("__warc", src)
      .select(col("*"), posexplode(idx).as(Seq("rec_idx", "__rec")))
      .select(col("doc_id"), col("rec_idx").cast("long").as("rec_idx"),
        col("__rec.uri").as("uri"),
        col("__rec.content_type").as("content_type"),
        col("__rec.len").cast("long").as("content_len"),
        decode(expr("substring(__warc, __rec.off + 1, __rec.len)"),
          "UTF-8").as("content"))
  }

  /** [[warcExtract]] preserving PAYLOAD BYTES (`content_bytes` instead
    * of a UTF-8 `content` string) — the HTTP tier needs the raw body
    * (chunk framing, gzip members, declared charsets); the string
    * face stays for bare-text records. Same gzip auto-detect, same
    * map-side shape. */
  def warcExtractBytes(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val raw = col(payloadCol)
    val src = when(
      substring(raw, 1, 2) === lit(Array(0x1f.toByte, 0x8b.toByte)),
      graft.functions.BinaryMeta.gunzipMembersCol(raw)).otherwise(raw)
    val idx = graft.functions.BinaryMeta.warcIndexCol(col("__warc"))
    df.withColumn("__warc", src)
      .select(col("*"), posexplode(idx).as(Seq("rec_idx", "__rec")))
      .select(col("doc_id"), col("rec_idx").cast("long").as("rec_idx"),
        col("__rec.uri").as("uri"),
        col("__rec.content_type").as("content_type"),
        expr("substring(__warc, __rec.off + 1, __rec.len)").as("content_bytes"))
  }

  /** The FETCH→EXTRACT entry composition a real crawl needs: WARC
    * `response` records carry the RAW HTTP exchange, so each record
    * goes status/header split (`httpMeta`) → RFC 9112 de-chunk +
    * Content-Encoding gunzip (`httpBody`) → charset-aware text decode
    * (UTF-8 default; an explicit iso-8859-1/latin-1 charset honored —
    * from the HTTP header, or, when the header declares none, from an
    * HTML `<meta charset=…>` / `http-equiv` tag sniffed the WHATWG
    * way: the byte-transparent latin-1 view of the body is inspected,
    * which can never misread the ASCII-compatible tag itself) → one
    * row per 2xx page with (uri, status, mime, charset, text);
    * `charset` is the EFFECTIVE one the decode used (null = the UTF-8
    * default). Non-2xx and undecodable-body records drop — the
    * keep-set a corpus pipeline actually wants; compose `htmlToText` /
    * `urlCanonical` downstream exactly as with [[warcExtract]]. Pure
    * map-side: every stage is a codegen'd expression, payload bytes
    * never leave their partition. */
  def fetchPages(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    import graft.functions.BinaryMeta
    val recs = warcExtractBytes(df, payloadCol)
    val m = BinaryMeta.httpMetaCol(col("content_bytes"))
    val metaCs = lower(regexp_extract(decode(col("__body"), "ISO-8859-1"),
      "(?i)<meta[^>]+charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_-]+)", 1))
    recs.select(col("doc_id"), col("rec_idx"), col("uri"),
        m.getField("status").as("status"),
        m.getField("content_type").as("mime"),
        m.getField("charset").as("__hdrCs"),
        BinaryMeta.httpBodyCol(col("content_bytes")).as("__body"))
      .filter(col("status") >= 200 && col("status") < 300 &&
        col("__body").isNotNull)
      .withColumn("__declCs",
        coalesce(col("__hdrCs"),
          when(metaCs =!= "", metaCs)))
      .withColumn("text",
        when(col("__declCs").isin(FetchLatin1Aliases: _*),
          decode(col("__body"), "ISO-8859-1"))
          .when(col("__declCs").isin(FetchCp1252Aliases: _*),
            // exact windows-1252: latin-1 is byte-transparent, then the
            // 27 defined 0x80–0x9F code points remap per the cp1252
            // table (the 5 undefined ones keep their C1 identity —
            // Java's own windows-1252 decoder does the same)
            translate(decode(col("__body"), "ISO-8859-1"),
              Cp1252From, Cp1252To))
          .otherwise(decode(col("__body"), "UTF-8")))
      // `charset` is the EFFECTIVE charset the decode used: a declared
      // charset outside the decodable set fell back to UTF-8, so it
      // reports null (= the UTF-8 default) rather than mislabeling the
      // text with an encoding that was NOT applied
      .withColumn("charset",
        when(col("__declCs").isin(
          FetchLatin1Aliases ++ FetchCp1252Aliases ++
            Seq("utf-8", "utf8", "us-ascii", "ascii"): _*),
          col("__declCs")))
      .drop("__body", "__hdrCs", "__declCs")
  }

  /** Charset aliases [[fetchPages]] decodes natively (beyond the UTF-8
    * default): the latin-1 family byte-transparently, and windows-1252
    * via the latin-1 view + the cp1252 C1-range remap below. */
  private val FetchLatin1Aliases =
    Seq("iso-8859-1", "latin-1", "latin1", "iso8859-1")
  private val FetchCp1252Aliases =
    Seq("windows-1252", "cp1252", "x-cp1252", "win-1252")
  /** The 27 defined cp1252 code points in 0x80–0x9F (source order)
    * and their Unicode targets — the Microsoft code-page table row
    * (0x81/8D/8F/90/9D are undefined and keep their C1 identity, as
    * Java's own windows-1252 decoder does). */
  private val Cp1252From: String =
    Seq(0x80, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
      0x8B, 0x8C, 0x8E, 0x91, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97,
      0x98, 0x99, 0x9A, 0x9B, 0x9C, 0x9E, 0x9F).map(_.toChar).mkString
  private val Cp1252To: String =
    Seq(0x20AC, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021, 0x02C6,
      0x2030, 0x0160, 0x2039, 0x0152, 0x017D, 0x2018, 0x2019, 0x201C,
      0x201D, 0x2022, 0x2013, 0x2014, 0x02DC, 0x2122, 0x0161, 0x203A,
      0x0153, 0x017E, 0x0178).map(_.toChar).mkString

  /** Deterministic uncompressed-WARC fixtures: nr = doc_id%3+1
    * records per blob, record i carrying uri
    * `http://w<doc_id%50>.example/r<i>` and payload
    * `page <i> of doc <doc_id>` behind a REAL Content-Length — the
    * parser must count bytes, not scan delimiters. Pure ASCII, so the
    * blob builds as a string cast to binary and the DuckDB oracle
    * regenerates every field arithmetically. */
  /** Deterministic `.warc.gz` fixtures — the member-per-record framing
    * real crawls ship: nr = doc_id%3+1 records per blob, each record a
    * complete WARC record (uri `http://gz<doc_id%50>.example/r<i>`,
    * payload `gz page <i> of doc <doc_id>` behind a real
    * Content-Length) wrapped in its OWN gzip member. The members are
    * the ones a SQL expression can build: RFC 1952 header (no flags,
    * mtime 0, OS unknown) + a single STORED deflate block
    * (BFINAL=1/BTYPE=00 + LE length + ones-complement) + a REAL CRC-32
    * (Spark's builtin `crc32`) and ISIZE trailer — spec-valid, just
    * uncompressed, so `gunzipMembers`' trailer VERIFICATION must pass
    * on real arithmetic while the DuckDB oracle regenerates every
    * parsed field arithmetically (the X138/X155 round-trip pattern).
    * Compressed blocks come from the spec's GZIPOutputStream
    * round-trip (real encoders emit them). */
  /** Little-endian n-byte encoding of an integer column, as binary. */
  private def leBytes(v: org.apache.spark.sql.Column, n: Int) =
    unhex(concat_ws("", (0 until n).map(k =>
      lpad(hex(shiftrightunsigned(v, 8 * k).bitwiseAND(lit(255L))), 2, "0")): _*))

  /** One RFC 1952 gzip member around a binary body, built in SQL: plain
    * header (CM=8, no flags, mtime 0, OS unknown), a single STORED
    * deflate block (BFINAL=1/BTYPE=00 + LE length + ones-complement),
    * REAL CRC-32 (Spark's builtin) + ISIZE trailer — spec-valid, just
    * uncompressed, so verify-then-accept readers must do real work. */
  private def gzipMemberSql(body: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val blen = octet_length(body).cast("long")
    concat(
      unhex(lit("1F8B08000000000000FF")), // header: CM=8, FLG=0
      unhex(lit("01")), leBytes(blen, 2), leBytes(lit(65535L) - blen, 2),
      body,
      leBytes(crc32(body), 4), leBytes(blen, 4)) // trailer: CRC-32 + ISIZE
  }

  def syntheticWarcGz(docs: DataFrame): DataFrame = {
    val crlf = lit("\r\n")
    val nr = pmod(col("doc_id"), lit(3L)) + 1L
    val members = transform(sequence(lit(1L), nr), i => {
      val payload = concat(lit("gz page "), i, lit(" of doc "), col("doc_id"))
      val rec = concat(
        lit("WARC/1.0"), crlf,
        lit("WARC-Type: response"), crlf,
        lit("WARC-Target-URI: http://gz"), pmod(col("doc_id"), lit(50L)),
        lit(".example/r"), i, crlf,
        lit("Content-Type: text/html"), crlf,
        lit("Content-Length: "), length(payload).cast("string"), crlf,
        crlf, payload, crlf, crlf)
      gzipMemberSql(encode(rec, "UTF-8"))
    })
    docs.select(col("doc_id"),
      aggregate(members, lit(Array.emptyByteArray),
        (acc, m) => concat(acc, m)).as("payload"))
  }

  /** Deterministic raw HTTP/1.x response fixtures — the content of a
    * WARC `response` record (status line + headers + body AS
    * TRANSMITTED), four transfer shapes by doc_id % 4:
    *   0 — plain 200, `charset=UTF-8` parameter, honest
    *       Content-Length, CRLF;
    *   1 — 404 text/plain with BARE-LF line endings (they occur in
    *       the wild; the parser must tolerate both);
    *   2 — 200 with `Transfer-Encoding: chunked`: two hex-sized
    *       chunks, an extension on the first size line, terminal
    *       0-chunk; no header charset but an HTML `<meta charset>`
    *       tag in the body (the sniffing-fallback case);
    *   3 — 301 with `Content-Encoding: gzip`: the body is a REAL gzip
    *       member (stored-deflate, valid CRC-32/ISIZE) of the
    *       redirect notice.
    * Everything is SQL-built so the DuckDB oracle regenerates each
    * decoded field arithmetically while the Spark side must run the
    * actual header walk / de-chunking / gunzip. */
  def syntheticHttpResponses(docs: DataFrame): DataFrame = {
    val crlf = lit("\r\n")
    val id = col("doc_id")
    val sel = pmod(id, lit(4L))
    val plainBody = concat(lit("plain body "), id)
    val plain = encode(concat(
      lit("HTTP/1.1 200 OK"), crlf,
      lit("Server: graft"), crlf,
      lit("Content-Type: text/html; charset=UTF-8"), crlf,
      lit("Content-Length: "), length(plainBody).cast("string"), crlf,
      crlf, plainBody), "UTF-8")
    val lfBody = concat(lit("missing "), id)
    val lfOnly = encode(concat(
      lit("HTTP/1.0 404 Not Found\n"),
      lit("Content-Type: text/plain\n"),
      lit("\n"), lfBody), "UTF-8")
    // the chunked shape declares its charset via an HTML meta tag (the
    // header carries none) — the sniffing fallback must pick it up
    val c1 = concat(lit("<meta charset=ISO-8859-1>chunk one of "), id,
      lit(" "))
    val c2 = concat(lit("tail"), pmod(id, lit(7L)))
    val chunked = encode(concat(
      lit("HTTP/1.1 200 OK"), crlf,
      lit("Content-Type: text/html"), crlf,
      lit("Transfer-Encoding: chunked"), crlf,
      crlf,
      hex(length(c1)), lit(";ext=1"), crlf, c1, crlf,
      hex(length(c2)), crlf, c2, crlf,
      lit("0"), crlf, crlf), "UTF-8")
    val gzBody = concat(lit("redirect target doc "), id)
    val gzMember = gzipMemberSql(encode(gzBody, "UTF-8"))
    val gzipped = concat(encode(concat(
      lit("HTTP/1.1 301 Moved Permanently"), crlf,
      lit("Location: https://site"), pmod(id, lit(10L)), lit(".example/"), crlf,
      lit("Content-Type: text/html"), crlf,
      lit("Content-Encoding: gzip"), crlf,
      lit("Content-Length: "), octet_length(gzMember).cast("string"), crlf,
      crlf), "UTF-8"), gzMember)
    docs.select(col("doc_id"),
      when(sel === 0, plain)
        .when(sel === 1, lfOnly)
        .when(sel === 2, chunked)
        .otherwise(gzipped).as("payload"))
  }

  def syntheticWarc(docs: DataFrame): DataFrame = {
    val crlf = lit("\r\n")
    val nr = pmod(col("doc_id"), lit(3L)) + 1L
    val recs = transform(sequence(lit(1L), nr), i => {
      val payload = concat(lit("page "), i, lit(" of doc "), col("doc_id"))
      concat(
        lit("WARC/1.0"), crlf,
        lit("WARC-Type: response"), crlf,
        lit("WARC-Target-URI: http://w"), pmod(col("doc_id"), lit(50L)),
        lit(".example/r"), i, crlf,
        lit("Content-Type: text/html"), crlf,
        lit("Content-Length: "), length(payload).cast("string"), crlf,
        crlf, payload, crlf, crlf)
    })
    docs.select(col("doc_id"),
      array_join(recs, "").cast("binary").as("payload"))
  }

  /** Deterministic MULTI-FRAME audio streams for the duration gate
    * (k = doc_id div 2, nf = k%4+1 frames):
    *  - even doc_id → ID3v2-prefixed CBR MPEG-1 Layer III: bitrate
    *    index k%14+1, rate index k%3, frame length = 144·br/rate
    *    (integer floor, no padding), zero payload bytes;
    *  - odd doc_id → ADTS: sampling index k%12, 13-bit frame length
    *    k%200+7, identical headers repeated.
    * `BinaryMeta.mp3FrameStats`/`adtsFrameStats` must hop the actual
    * frame-length arithmetic across every frame; the DuckDB oracle
    * regenerates counts/samples/duration arithmetically. */
  def syntheticAvFrames(docs: DataFrame): DataFrame = {
    def byte(v: org.apache.spark.sql.Column) = lpad(hex(v), 2, "0")
    val k = (col("doc_id") / lit(2L)).cast("long")
    val nf = (pmod(k, lit(4L)) + 1L).cast("int")
    // MP3: ID3 prefix + nf identical CBR frames
    val ts = pmod(k, lit(50L)) + 4L
    val bi = pmod(k, lit(14L)) + 1L
    val si = pmod(k, lit(3L))
    val brk = element_at(typedLit(Seq(0L, 32L, 40L, 48L, 56L, 64L, 80L, 96L,
      112L, 128L, 160L, 192L, 224L, 256L, 320L)), bi.cast("int") + 1)
    val rate = element_at(typedLit(Seq(44100L, 48000L, 32000L)), si.cast("int") + 1)
    val mp3Frame = concat(lit("FFFB"), byte(bi * 16 + si * 4), lit("00"),
      repeat(lit("00"), (expr("(144 * __brk * 1000) div __rate") - 4).cast("int")))
    val mp3 = concat(
      lit("494433" + "0400" + "00" + "000000"), byte(ts),
      repeat(lit("00"), ts.cast("int")),
      repeat(mp3Frame, nf))
    // ADTS: nf identical frames, frame length carried in each header
    val sfi = pmod(k, lit(12L))
    val cfg = pmod(k, lit(7L)) + 1L
    val fl = pmod(k, lit(200L)) + 7L
    val aacFrame = concat(
      lit("FFF1"),
      byte(pmod(k, lit(4L)) * 64 + sfi * 4 + (cfg / 4).cast("long")),
      byte(pmod(cfg, lit(4L)) * 64 + (fl / 2048).cast("long")),
      byte(pmod((fl / 8).cast("long"), lit(256L))),
      byte(pmod(fl, lit(8L)) * 32 + 31),
      lit("FC"),
      repeat(lit("00"), (fl - 7).cast("int")))
    val aac = repeat(aacFrame, nf)
    docs
      .withColumn("__brk", brk).withColumn("__rate", rate)
      .select(col("doc_id"),
        unhex(when(pmod(col("doc_id"), lit(2L)) === 0, mp3).otherwise(aac))
          .as("payload"))
  }

  /** Deterministic G.711 WAV fixtures: µ-law (fmt 7) for even doc_ids,
    * A-law (fmt 6) for odd, 24 data bytes b_i = (doc_id·13 + i·29) mod
    * 256 — the DuckDB oracle expands the SAME bytes through the G.711
    * formulas arithmetically while the Spark side must decode the
    * actual WAV container through `BinaryMeta.wavG711Stats`. */
  def syntheticWavG711(docs: DataFrame): DataFrame = {
    val fmt = when(pmod(col("doc_id"), lit(2)) === 0, lit(7)).otherwise(lit(6))
    val data = concat_ws("", transform(sequence(lit(0), lit(23)),
      i => lpad(hex(pmod(col("doc_id") * 13 + i * 29, lit(256))), 2, "0")))
    docs.select(col("doc_id"),
      unhex(concat(
        lit("52494646"), le4(lit(36 + 24)), lit("57415645"),
        lit("666D7420"), le4(lit(16)), le2(fmt), le2(lit(1)),
        le4(lit(8000)), le4(lit(8000)), le2(lit(1)), le2(lit(8)),
        lit("64617461"), le4(lit(24)), data)).as("payload"))
  }

  /** Deterministic 9×8 24-bit BMP fixtures for the image near-dup
    * gate: docs 2k and 2k+1 render the SAME pseudo-random image except
    * the odd twin's blue channel is +1 everywhere — a sub-luma-unit
    * perturbation, so the pair's dHashes differ only where adjacent
    * lumas tie within rounding (hamming small), while unrelated pairs
    * sit ~32 bits apart. 9×8 makes the dHash grid the identity
    * downsample, so the DuckDB oracle can regenerate every grid cell
    * arithmetically. BMP rows are written bottom-up (positive height)
    * with the 1-byte row pad — a REAL file layout the decoder must
    * invert. */
  def syntheticBmpImages(docs: DataFrame): DataFrame = {
    // pixel channels in IMAGE coords (x, y): k = pair id, p = twin bit
    // r = (k*7 + x*13 + y*29) % 200 + 20, g = (k*11 + x*3 + y*17) % 200 + 20
    // b = (k*5 + x*19 + y*7) % 200 + 20 + p
    val rows = expr(
      """concat_ws('', transform(sequence(7, 0, -1), y ->
        |  concat(
        |    concat_ws('', transform(sequence(0, 8), x -> concat(
        |      lpad(hex(((doc_id div 2)*5 + x*19 + y*7) % 200 + 20 + doc_id % 2), 2, '0'),
        |      lpad(hex(((doc_id div 2)*11 + x*3 + y*17) % 200 + 20), 2, '0'),
        |      lpad(hex(((doc_id div 2)*7 + x*13 + y*29) % 200 + 20), 2, '0')))),
        |    '00')))""".stripMargin) // 27 data bytes + 1 pad per row
    docs.select(col("doc_id"),
      unhex(concat(
        // BITMAPFILEHEADER: "BM", size 54 + 28*8 = 278, offset 54
        lit("424D"), lit("16010000"), lit("00000000"), lit("36000000"),
        // BITMAPINFOHEADER: 40, w=9, h=8 (bottom-up), planes 1, 24bpp
        lit("28000000"), lit("09000000"), lit("08000000"),
        lit("0100"), lit("1800"), lit("00000000"), lit("E0000000"),
        lit("00000000"), lit("00000000"), lit("00000000"), lit("00000000"),
        rows)).as("payload"))
  }

  /** Batched per-partition feature extraction over the binary column —
    * the mapInPandas analog: no per-row task overhead, payload bytes stay
    * partition-local. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val typed = media.select(col("doc_id"), col("payload"),
      col("meta.mime").as("mime"), col("meta.width").as("width"),
      col("meta.height").as("height")).as[MediaRow]
    typed.mapPartitions { rows =>
      // One digest instance per partition; `digest()` resets it after each
      // call, so reuse across rows is safe and amortizes the setup cost —
      // the point of the mapPartitions shape.
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = "0123456789abcdef".toCharArray
      rows.map { r =>
        val (len, mean) = decodeFeatures(r.payload)
        val d = md.digest(r.payload)
        val sb = new java.lang.StringBuilder(d.length * 2)
        var i = 0
        while (i < d.length) {
          val b = d(i) & 0xff
          sb.append(hex(b >>> 4)).append(hex(b & 0xf))
          i += 1
        }
        MediaFeatures(r.doc_id, len, sb.toString, r.width, r.height, mean)
      }
    }
  }
}
