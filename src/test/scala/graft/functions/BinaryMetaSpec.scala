package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Container-header parsers against REAL byte fixtures: a genuine
  * minimal PNG, a JPEG whose SOF sits behind APP0+DQT segments (the
  * skip loop), a WAV with a LIST chunk (odd-sized, testing the RIFF
  * word-alignment step) before fmt, GIF87a/89a, BMP — plus the
  * malformed/truncated/foreign inputs that must all yield null. */
class BinaryMetaSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // a real, complete 1x1 transparent PNG (signature + IHDR + IDAT + IEND)
  private val png1x1 = hex(
    "89504E470D0A1A0A0000000D494844520000000100000001" +
    "0806000000 1F15C489 0000000A 49444154 789C6300010000050001" +
    "0D0A2DB4 00000000 49454E44 AE426082")

  // JPEG: SOI, APP0 (JFIF), DQT, then SOF0 with h=7, w=1025, 3 components
  private val jpegWithSegments = hex(
    "FFD8" +
    "FFE0 0010 4A46494600 0101 00 0048 0048 0000" +  // APP0, 16 bytes
    "FFDB 0005 112233" +                              // DQT stub, len 5 = 3 payload
    "FFC0 0011 08 0007 0401 03 011100 021101 031101") // SOF0: h=7 w=1025

  // WAV: RIFF/WAVE, an odd-sized LIST chunk (3 bytes -> 1 pad byte),
  // then fmt: PCM, 2ch, 44100 Hz, 16-bit
  private val wavWithList = hex(
    "52494646 33000000 57415645" +
    "4C495354 03000000 494E46 00" +                    // LIST, size 3 + pad
    "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000")

  private val gif89 = hex("474946383961 2801 F000 F70000")  // 296 x 240
  private val gif87 = hex("474946383761 0500 0300 80")      // 5 x 3
  // BMP: BITMAPINFOHEADER, 640 x -480 (top-down: height = |−480|)
  private val bmp = hex(
    "424D 46000000 00000000 36000000 28000000" +
    "80020000 20FEFFFF 0100 1800")

  test("static parsers: real fixtures decode; malformed inputs are null (-1)") {
    assert(BinaryMeta.format(png1x1).toString == "png")
    assert(BinaryMeta.width(png1x1) == 1 && BinaryMeta.height(png1x1) == 1)

    assert(BinaryMeta.format(jpegWithSegments).toString == "jpeg")
    assert(BinaryMeta.width(jpegWithSegments) == 1025)
    assert(BinaryMeta.height(jpegWithSegments) == 7)

    assert(BinaryMeta.format(wavWithList).toString == "wav")
    assert(BinaryMeta.wavSampleRate(wavWithList) == 44100)
    assert(BinaryMeta.wavChannels(wavWithList) == 2)
    assert(BinaryMeta.width(wavWithList) == -1, "wav has no pixel dims")

    assert(BinaryMeta.format(gif89).toString == "gif")
    assert(BinaryMeta.width(gif89) == 296 && BinaryMeta.height(gif89) == 240)
    assert(BinaryMeta.format(gif87).toString == "gif")
    assert(BinaryMeta.width(gif87) == 5 && BinaryMeta.height(gif87) == 3)

    assert(BinaryMeta.format(bmp).toString == "bmp")
    assert(BinaryMeta.width(bmp) == 640 && BinaryMeta.height(bmp) == 480)

    // malformed / foreign / truncated: null, never an exception
    assert(BinaryMeta.format(Array.empty[Byte]) == null)
    assert(BinaryMeta.format("plain text".getBytes) == null)
    assert(BinaryMeta.width(png1x1.take(12)) == -1, "truncated PNG")
    assert(BinaryMeta.width(hex("FFD8FFC0")) == -1, "JPEG cut before SOF len")
    assert(BinaryMeta.width(hex("FFD8 00C0 0011")) == -1, "desynced marker")
    assert(BinaryMeta.wavSampleRate(hex("52494646 04000000 57415645")) == -1,
      "WAV with no fmt chunk")
    // JPEG with no SOF at all (EOI right after a segment)
    assert(BinaryMeta.width(hex("FFD8 FFE0 0004 0000 FFD9")) == -1)
  }

  test("wavPcmStats decodes real little-endian PCM-16 samples; " +
       "non-PCM and truncated data yield null") {
    // samples: 0, 1000, -1000, 32767, -32768  (LE int16)
    val wav = hex(
      "52494646 2E000000 57415645" +
      "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      "64617461 0A000000" +
      "0000 E803 18FC FF7F 0080")
    val s = BinaryMeta.wavPcmStats(wav)
    assert(s != null)
    assert(s(0) == 5, "n_samples")
    assert(s(1) == 32768, "peak = |-32768|")
    assert(s(2) == 0L + 1000 + 1000 + 32767 + 32768, "sum_abs")
    assert(s(3) == 1000L * 1000 * 2 + 32767L * 32767 + 32768L * 32768, "sum_sq")

    // 8-bit fmt -> stub regime, null
    val pcm8 = hex(
      "52494646 24000000 57415645" +
      "666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800" +
      "64617461 0200 0000 0102")
    assert(BinaryMeta.wavPcmStats(pcm8) == null)
    // data chunk claiming more bytes than present -> null
    val trunc = hex(
      "52494646 2E000000 57415645" +
      "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      "64617461 FF000000 0000")
    assert(BinaryMeta.wavPcmStats(trunc) == null)
  }

  test("bmp24Stats decodes BGR pixels across padded rows; top-down " +
       "height and non-24-bit depth handled") {
    // 2x2, 24-bit: rows are 2*3=6 bytes + 2 pad. Pixels (B,G,R):
    // bottom row: (1,2,3) (4,5,6); top row: (7,8,9) (10,11,12)
    val bmp = hex(
      "424D 46000000 00000000 36000000" +
      "28000000 02000000 02000000 0100 1800 00000000 10000000" +
      "00000000 00000000 00000000 00000000" +
      "010203 040506 0000" +
      "070809 0A0B0C 0000")
    val s = BinaryMeta.bmp24Stats(bmp)
    assert(s != null)
    assert(s(0) == 4, "n_px")
    assert(s(1) == 1L + 4 + 7 + 10, "sum_b")
    assert(s(2) == 2L + 5 + 8 + 11, "sum_g")
    assert(s(3) == 3L + 6 + 9 + 12, "sum_r")
    // top-down (negative height) sums identically
    val topDown = bmp.clone()
    // height at offset 22: -2 LE = FE FF FF FF
    topDown(22) = 0xFE.toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    val t = BinaryMeta.bmp24Stats(topDown)
    assert(t != null && t.sameElements(s))
    // 8-bit depth -> null (stub regime)
    val depth8 = bmp.clone(); depth8(28) = 0x08
    assert(BinaryMeta.bmp24Stats(depth8) == null)
    // adversarial header: width 2^30 would wrap a 32-bit w*3 negative
    // and slip past the bounds check into an out-of-bounds read — must
    // yield null, never throw (the total-parser contract)
    val hugeW = bmp.clone()
    hugeW(18) = 0x00; hugeW(19) = 0x00; hugeW(20) = 0x00; hugeW(21) = 0x40
    assert(BinaryMeta.bmp24Stats(hugeW) == null)
    assert(BinaryMeta.width(hugeW) == (1 << 30), "header width still reads")
  }

  test("expressions run inside codegen over a DataFrame and SQL face") {
    import spark.implicits._
    val df = Seq(
      (1L, png1x1), (2L, jpegWithSegments), (3L, wavWithList),
      (4L, gif89), (5L, "nope".getBytes), (6L, bmp)
    ).toDF("id", "payload")
    val got = df.select(col("id"),
        BinaryMeta.mediaFormat(col("payload")).as("fmt"),
        BinaryMeta.mediaWidth(col("payload")).as("w"),
        BinaryMeta.mediaHeight(col("payload")).as("h"),
        BinaryMeta.wavSampleRateCol(col("payload")).as("sr"),
        BinaryMeta.wavChannelsCol(col("payload")).as("ch"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[Integer](2)), Option(r.getAs[Integer](3)),
        Option(r.getAs[Integer](4)), Option(r.getAs[Integer](5))))
    assert(got(0) == ((1L, "png", Some(1), Some(1), None, None)))
    assert(got(1) == ((2L, "jpeg", Some(1025), Some(7), None, None)))
    assert(got(2) == ((3L, "wav", None, None, Some(44100), Some(2))))
    assert(got(3) == ((4L, "gif", Some(296), Some(240), None, None)))
    assert(got(4) == ((5L, null, None, None, None, None)))
    assert(got(5) == ((6L, "bmp", Some(640), Some(480), None, None)))

    // SQL faces registered by GraftExtensions (FunctionsSpec pattern)
    new GraftExtensionsProbe().register(spark)
    df.createOrReplaceTempView("media_fixture")
    val sql = spark.sql(
      """SELECT id, media_format(payload) AS fmt, media_width(payload) AS w,
        |       wav_sample_rate(payload) AS sr
        |FROM media_fixture WHERE id IN (1, 3) ORDER BY id""".stripMargin)
      .collect()
    assert(sql(0).getString(1) == "png" && sql(0).getInt(2) == 1)
    assert(sql(1).getString(1) == "wav" && sql(1).getInt(3) == 44100)
  }

  test("syntheticContainers round-trip: constructed bytes parse back to " +
       "the constructing arithmetic for all four formats") {
    import spark.implicits._
    val docs = (0L to 63L).toDF("doc_id")
    val got = graft.llm.Multimodal.describeMedia(
        graft.llm.Multimodal.syntheticContainers(docs))
      .orderBy("doc_id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val wantFmt = (id % 4) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "wav"; case _ => "jpeg"
      }
      assert(r.getString(2) == wantFmt, s"doc $id")
      if (id % 4 == 2) {
        assert(r.getInt(5) == 8000 + (id % 8) * 4000, s"doc $id rate")
        assert(r.getInt(6) == (id % 2 + 1), s"doc $id channels")
        assert(r.isNullAt(3) && r.isNullAt(4), s"doc $id: wav has no dims")
      } else {
        assert(r.getInt(3) == id % 512 + 1, s"doc $id width")
        assert(r.getInt(4) == id % 300 + 1, s"doc $id height")
        assert(r.isNullAt(5) && r.isNullAt(6), s"doc $id: image has no rate")
      }
    }
  }

  // ---- GIF LZW pixel decode ----

  /** Real GIF LZW compressor (test-side only): hash-chained dictionary,
    * variable code width with GIF's "late change" (the encoder widens
    * when its next-free code EXCEEDS 2^width — one code after the
    * decoder, whose own counter lags by exactly one entry), CLEAR+reset
    * when the table fills. Used to produce streams the SQL-built
    * literal-coded fixtures cannot: dictionary hits, width bumps to 12
    * bits, KwKwK codes, table-full resets, multi-sub-block data. */
  private def lzwEncode(pixels: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var bitBuf = 0L; var bitCnt = 0; var width = minCode + 1
    def put(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) { out += (bitBuf & 0xff).toByte; bitBuf >>>= 8; bitCnt -= 8 }
    }
    val dict = new java.util.HashMap[Long, Int]()
    var next = eoi + 1
    put(clear)
    var prev = pixels(0)
    var i = 1
    while (i < pixels.length) {
      val k = pixels(i)
      val key = prev.toLong << 16 | k
      val e = dict.getOrDefault(key, -1)
      if (e >= 0) prev = e
      else {
        put(prev)
        if (next < 4096) {
          dict.put(key, next); next += 1
          if (next > (1 << width) && width < 12) width += 1
        } else {
          put(clear); dict.clear(); width = minCode + 1; next = eoi + 1
        }
        prev = k
      }
      i += 1
    }
    put(prev); put(eoi)
    if (bitCnt > 0) out += (bitBuf & 0xff).toByte
    out.toArray
  }

  /** Complete single-frame GIF89a from palette (0xRRGGBB) + pixels. */
  private def makeGif(w: Int, h: Int, palette: Array[Int],
                      pixels: Array[Int], minCode: Int): Array[Byte] = {
    val bits = java.lang.Integer.numberOfTrailingZeros(palette.length)
    require(1 << bits == palette.length && bits >= 1 && bits <= 8)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
    out ++= "GIF89a".getBytes("US-ASCII")
    u16(w); u16(h)
    out += (0x80 | ((bits - 1) & 7)).toByte; out += 0; out += 0
    palette.foreach { rgb =>
      out += ((rgb >> 16) & 0xff).toByte
      out += ((rgb >> 8) & 0xff).toByte
      out += (rgb & 0xff).toByte
    }
    out += 0x2c.toByte; u16(0); u16(0); u16(w); u16(h); out += 0
    out += minCode.toByte
    val data = lzwEncode(pixels, minCode)
    var i = 0
    while (i < data.length) {
      val len = math.min(255, data.length - i)
      out += len.toByte; out ++= data.slice(i, i + len); i += len
    }
    out += 0; out += 0x3b.toByte
    out.toArray
  }

  private def expectStats(palette: Array[Int], pixels: Array[Int]): Array[Long] =
    Array(pixels.length.toLong,
      pixels.map(p => ((palette(p) >> 16) & 0xff).toLong).sum,
      pixels.map(p => ((palette(p) >> 8) & 0xff).toLong).sum,
      pixels.map(p => (palette(p) & 0xff).toLong).sum)

  /** Independent decode through the JDK's own GIF reader. */
  private def imageIoStats(bytes: Array[Byte]): Array[Long] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the fixture")
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    Array(img.getWidth.toLong * img.getHeight, sr, sg, sb)
  }

  test("gifPixelStats: real LZW streams (dict growth, width bumps, " +
       "KwKwK, table-full reset, multi-block) decode identically to the " +
       "JDK ImageIO reader and to the source pixels") {
    val rnd = new scala.util.Random(42)
    val pal16 = Array.tabulate(16)(j => rnd.nextInt(1 << 24))
    val pal256 = Array.tabulate(256)(j => rnd.nextInt(1 << 24))
    val cases = Seq(
      // random 64x64 @ 16 colors: dict grows into width bumps 5->12
      (64, 64, pal16, Array.fill(64 * 64)(rnd.nextInt(16)), 4),
      // uniform 100x80: KwKwK on the second code and ever-deeper chains
      (100, 80, pal16, Array.fill(100 * 80)(7), 4),
      // random 120x120 @ 256 colors: 8-bit roots, table fills -> CLEAR
      (120, 120, pal256, Array.fill(120 * 120)(rnd.nextInt(256)), 8),
      // tiny 3x2: total stream shorter than one sub-block
      (3, 2, pal16, Array(0, 15, 3, 3, 3, 9), 4),
      // repetitive text-like runs: long dictionary hits
      (200, 50, pal16, Array.tabulate(200 * 50)(i => (i / 17) % 16), 4))
    for (((w, h, pal, px, mc), ci) <- cases.zipWithIndex) {
      val g = makeGif(w, h, pal, px, mc)
      val want = expectStats(pal, px)
      val got = BinaryMeta.gifPixelStats(g)
      assert(got != null, s"case $ci: decoder returned null")
      assert(got.toSeq == want.toSeq, s"case $ci: $got vs $want")
      assert(imageIoStats(g).toSeq == want.toSeq,
        s"case $ci: ImageIO disagrees — encoder bug")
    }
  }

  test("gifPixelStats: extensions are skipped; a local color table " +
       "shadows the global one") {
    val pal = Array.tabulate(16)(j => (j * 16) << 16 | j)
    val px = Array.tabulate(40)(_ % 16)
    val base = makeGif(8, 5, pal, px, 4)
    // splice a Graphic Control Extension between LSD+GCT and the
    // image descriptor: 21 F9 04 .. .. .. .. 00
    val lsdEnd = 13 + 3 * 16
    val gce = Array(0x21, 0xf9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    val spliced = base.take(lsdEnd) ++ gce ++ base.drop(lsdEnd)
    assert(BinaryMeta.gifPixelStats(spliced).toSeq ==
      expectStats(pal, px).toSeq)
    assert(imageIoStats(spliced).toSeq == expectStats(pal, px).toSeq)
    // local color table: set the descriptor's LCT flag and insert an
    // all-different palette right after it; stats must follow the LCT
    val pal2 = pal.map(rgb => ~rgb & 0xffffff)
    val descAt = lsdEnd + gce.length
    assert(spliced(descAt) == 0x2c.toByte)
    val withLct = spliced.take(descAt + 9) ++
      Array((0x80 | 3).toByte) ++ // LCT flag, 16 entries
      pal2.flatMap(rgb => Array(((rgb >> 16) & 0xff).toByte,
        ((rgb >> 8) & 0xff).toByte, (rgb & 0xff).toByte)) ++
      spliced.drop(descAt + 10)
    assert(BinaryMeta.gifPixelStats(withLct).toSeq ==
      expectStats(pal2, px).toSeq)
  }

  test("gifPixelStats: malformed inputs yield null, never throw") {
    val pal = Array.tabulate(16)(j => j * 0x010203)
    val px = Array.tabulate(24)(_ % 16)
    val good = makeGif(6, 4, pal, px, 4)
    assert(BinaryMeta.gifPixelStats(good) != null)
    // truncations at every byte must never throw
    for (cut <- 0 until good.length)
      BinaryMeta.gifPixelStats(good.take(cut)) // no exception = pass
    // stream ends before EOI (chop the trailer + terminator + last data)
    assert(BinaryMeta.gifPixelStats(good.dropRight(4)) == null)
    // no color table at all: GCT flag cleared, table removed
    val noCt = (good.take(10) :+ (good(10) & 0x7f).toByte) ++
      good.drop(11 + 3 * 16)
    assert(BinaryMeta.gifPixelStats(noCt) == null)
    // pixel count mismatch: descriptor claims more pixels than coded
    val big = makeGif(6, 4, pal, px, 4)
    val wAt = 13 + 3 * 16 + 5 // image descriptor width offset
    big(wAt) = 7 // 7x4 declared, 24 coded
    assert(BinaryMeta.gifPixelStats(big) == null)
    // corrupt code stream: flip bits in the LZW data
    val bad = makeGif(6, 4, pal, px, 4)
    bad(bad.length - 5) = 0xff.toByte
    BinaryMeta.gifPixelStats(bad) // null or decode — must not throw
    // foreign bytes
    assert(BinaryMeta.gifPixelStats("not a gif at all".getBytes) == null)
    assert(BinaryMeta.gifPixelStats(Array.emptyByteArray) == null)
  }

  // ---- PNG inflate + unfilter ----

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer")
    bos.toByteArray
  }

  test("pngPixelStats: ImageIO-WRITTEN PNGs (real deflate compression, " +
       "encoder-chosen Sub/Up/Average/Paeth filters) decode to the " +
       "source pixel sums for gray, RGB and RGBA images") {
    val rnd = new scala.util.Random(4242)
    // grayscale: smooth gradient (encoders pick predictive filters on
    // smooth data) + random (stress the inflate path)
    for ((kind, w, h) <- Seq(("smooth", 120, 80), ("random", 64, 64))) {
      val g = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var want = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (kind == "smooth") (x + 2 * y) % 256 else rnd.nextInt(256)
        g.getRaster.setSample(x, y, 0, v)
        want += v
      }
      val got = BinaryMeta.pngPixelStats(pngBytes(g))
      assert(got != null, s"gray/$kind: null")
      assert(got.toSeq == Seq(w.toLong * h, want, want, want),
        s"gray/$kind: ${got.toSeq}")
    }
    // RGB and RGBA
    for (typ <- Seq(java.awt.image.BufferedImage.TYPE_3BYTE_BGR,
        java.awt.image.BufferedImage.TYPE_4BYTE_ABGR)) {
      val (w, h) = (90, 60)
      val img = new java.awt.image.BufferedImage(w, h, typ)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g2, b2) = ((x * 3 + y) % 256, (x + y * 5) % 256, rnd.nextInt(256))
        img.setRGB(x, y, 0xff000000 | (r << 16) | (g2 << 8) | b2)
        sr += r; sg += g2; sb += b2
      }
      val got = BinaryMeta.pngPixelStats(pngBytes(img))
      assert(got != null, s"type $typ: null")
      assert(got.toSeq == Seq(w.toLong * h, sr, sg, sb), s"type $typ: ${got.toSeq}")
    }
  }

  test("pngPixelStats: genuinely INTERLACED (Adam7) PNGs decode — " +
       "seven independently-filtered passes, written by ImageIO in " +
       "progressive mode") {
    val rnd = new scala.util.Random(7117)
    for ((w, h) <- Seq((61, 37), (8, 8), (3, 2), (1, 1), (9, 1), (1, 9))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var want = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = rnd.nextInt(256); img.getRaster.setSample(x, y, 0, v); want += v
      }
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      assert((bytes(28) & 0xff) == 1, s"${w}x$h: writer did not interlace")
      val got = BinaryMeta.pngPixelStats(bytes)
      assert(got != null, s"${w}x$h: interlaced decode returned null")
      assert(got.toSeq == Seq(w.toLong * h, want, want, want),
        s"${w}x$h: ${got.toSeq}")
    }
  }

  test("pngPixelStats: malformed inputs yield null, never throw; " +
       "unsupported shapes (16-bit, lying interlace flag) are declined cleanly") {
    val img = new java.awt.image.BufferedImage(10, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 10)
      img.getRaster.setSample(x, y, 0, (x * y) % 256)
    val good = pngBytes(img)
    assert(BinaryMeta.pngPixelStats(good) != null)
    for (cut <- 0 until good.length)
      BinaryMeta.pngPixelStats(good.take(cut)) // must never throw
    // corrupt the deflate stream (inside IDAT): DataFormatException -> null
    val bad = good.clone()
    val idatAt = {
      var i = 8; var at = -1
      while (at < 0 && i + 8 <= bad.length) {
        if (bad(i + 4) == 'I' && bad(i + 5) == 'D' &&
            bad(i + 6) == 'A' && bad(i + 7) == 'T') at = i
        else i += 12 + ((bad(i) & 0xff) << 24 | (bad(i + 1) & 0xff) << 16 |
          (bad(i + 2) & 0xff) << 8 | (bad(i + 3) & 0xff))
      }
      at
    }
    assert(idatAt > 0)
    bad(idatAt + 10) = (~bad(idatAt + 10)).toByte
    bad(idatAt + 11) = (~bad(idatAt + 11)).toByte
    BinaryMeta.pngPixelStats(bad) // null or decode — must not throw
    // 16-bit depth -> declined; a LYING interlace flag (sequential data
    // declared Adam7) -> the pass-geometry length check catches it
    val deep = good.clone(); deep(24) = 16.toByte
    assert(BinaryMeta.pngPixelStats(deep) == null)
    val adam7 = good.clone(); adam7(28) = 1.toByte
    assert(BinaryMeta.pngPixelStats(adam7) == null)
    // foreign bytes
    assert(BinaryMeta.pngPixelStats("not a png".getBytes) == null)
    assert(BinaryMeta.pngPixelStats(png1x1) != null, "the real 1x1 decodes")
  }

  test("syntheticPngPixels round-trip: SQL-built stored-deflate PNGs " +
       "with aggregate-fold CRC32/Adler32 decode through pngPixelStats " +
       "AND the JDK ImageIO reader to the constructing arithmetic") {
    import spark.implicits._
    val docs = (0L to 47L).toDF("doc_id")
    val fixtures = graft.llm.Multimodal.syntheticPngPixels(docs)
      .orderBy("doc_id").collect()
    fixtures.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val n = ((id % 6) + 2) * ((id % 4) + 2)
      val want = (0L until n).map(i => (id * 11 + i * 7) % 256).sum
      val got = BinaryMeta.pngPixelStats(bytes)
      assert(got != null && got.toSeq == Seq(n, want, want, want),
        s"doc $id: ${Option(got).map(_.toSeq)}")
      // a bogus CRC or Adler would make ImageIO reject the fixture —
      // this pins that the SQL aggregate folds compute the REAL sums
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO rejects the SQL-built PNG")
      var s = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        s += img.getRaster.getSample(x, y, 0)
      assert(s == want, s"doc $id: ImageIO disagrees")
    }
  }

  test("G.711 mu-law/A-law expansion: standard extreme values, sign " +
       "symmetry over all 256 codes, and the WAV container face") {
    // published G.711 extremes: mu-law max +-32124, A-law max +-32256;
    // mu-law 0xFF decodes to 0 (the all-ones silent code)
    assert(BinaryMeta.ulaw2linear(0x80) == 32124)
    assert(BinaryMeta.ulaw2linear(0x00) == -32124)
    assert(BinaryMeta.ulaw2linear(0xff) == 0)
    assert(BinaryMeta.alaw2linear(0xaa) == 32256)
    assert(BinaryMeta.alaw2linear(0x2a) == -32256)
    assert(BinaryMeta.alaw2linear(0x55) == -8 && BinaryMeta.alaw2linear(0xd5) == 8)
    for (c <- 0 until 256) {
      // toggling the sign bit negates the sample, both laws
      assert(BinaryMeta.ulaw2linear(c) == -BinaryMeta.ulaw2linear(c ^ 0x80), s"u $c")
      assert(BinaryMeta.alaw2linear(c) == -BinaryMeta.alaw2linear(c ^ 0x80), s"a $c")
      assert(math.abs(BinaryMeta.ulaw2linear(c)) <= 32124)
      assert(math.abs(BinaryMeta.alaw2linear(c)) <= 32256)
    }
    // container: fmt 7, 8-bit, 4 bytes of data 0x80 0x00 0xFF 0xAA
    val g711 = hex(
      "52494646 28000000 57415645" +
      "666D7420 10000000 0700 0100 401F0000 401F0000 0100 0800" +
      "64617461 04000000 8000FFAA")
    val s = BinaryMeta.wavG711Stats(g711)
    assert(s != null && s(0) == 4)
    assert(s(1) == 32124, "peak")
    val vAA = BinaryMeta.ulaw2linear(0xaa)
    assert(s(2) == 32124L * 2 + 0 + math.abs(vAA), "sum_abs")
    // PCM-16 WAV is NOT a G.711 stream and vice versa
    val pcm = hex(
      "52494646 2E000000 57415645" +
      "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      "64617461 0A000000 0000 E803 18FC FF7F 0080")
    assert(BinaryMeta.wavG711Stats(pcm) == null)
    assert(BinaryMeta.wavPcmStats(g711) == null)
    assert(BinaryMeta.wavG711Stats("nope".getBytes) == null)
  }

  // ---- baseline JPEG ----

  private def jpegBytes(img: java.awt.image.BufferedImage,
                        quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("jpeg baseline decode: ImageIO-written grayscale JPEGs (real " +
       "Huffman/AC streams at several qualities) decode within the " +
       "T.81 +-1/pixel IDCT tolerance of the JDK reader") {
    val rnd = new scala.util.Random(909)
    for ((w, h, q) <- Seq((64, 48, 0.95f), (40, 40, 0.7f), (17, 9, 0.5f),
        (128, 96, 0.9f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          ((x * 13 + y * 7) % 160 + rnd.nextInt(40)) % 256)
      val bytes = jpegBytes(img, q)
      val mine = JpegBaseline.decodeGray(bytes)
      assert(mine != null, s"${w}x$h q=$q: decode returned null")
      assert(mine._1 == w && mine._2 == h)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      var totDiff = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(mine._3(y * w + x) - ref.getRaster.getSample(x, y, 0))
        if (d > maxDiff) maxDiff = d
        totDiff += d
      }
      assert(maxDiff <= 1,
        s"${w}x$h q=$q: max per-pixel diff $maxDiff exceeds the IDCT bound")
      assert(totDiff.toDouble / (w * h) <= 0.5,
        s"${w}x$h q=$q: mean diff ${totDiff.toDouble / (w * h)}")
    }
  }

  /** Scala-side DC-only builder mirroring syntheticJpegPixels' custom
    * tables, plus optional restart markers (DRI + RSTn every `ri`
    * blocks) which the SQL form cannot emit. */
  private def dcOnlyJpeg(bw: Int, bh: Int, dcs: Seq[Int],
                         ri: Int = 0): Array[Byte] = {
    require(dcs.length == bw * bh)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def hexAppend(s: String): Unit =
      out ++= s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte)
    hexAppend("FFD8")
    hexAppend("FFDB004300" + "08" * 64)
    hexAppend("FFC40019" + "00" + "01" * 6 + "00" * 10 + "000102030405")
    hexAppend("FFC40014" + "10" + "01" + "00" * 15 + "00")
    hexAppend("FFC0000B08" + f"${bh * 8}%04X" + f"${bw * 8}%04X" + "01011100")
    if (ri > 0) hexAppend("FFDD0004" + f"$ri%04X")
    hexAppend("FFDA0008 0101 0000 3F00")
    val sb = new StringBuilder
    def flushEntropy(): Unit = {
      while (sb.length % 8 != 0) sb.append('1')
      sb.toString.grouped(8).foreach { byte =>
        val v = Integer.parseInt(byte, 2)
        out += v.toByte
        if (v == 0xff) out += 0x00.toByte
      }
      sb.clear()
    }
    var pred = 0
    var rst = 0
    for ((dc, b) <- dcs.zipWithIndex) {
      if (ri > 0 && b > 0 && b % ri == 0) {
        flushEntropy() // byte-align before the marker
        out += 0xff.toByte; out += (0xd0 + rst).toByte
        rst = (rst + 1) & 7
        pred = 0
      }
      val d = dc - pred
      pred = dc
      val s = if (d == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(d))
      sb.append("1" * s).append('0')
      if (s > 0) {
        val v = if (d > 0) d else d + (1 << s) - 1
        val bits = Integer.toBinaryString(v)
        sb.append("0" * (s - bits.length)).append(bits)
      }
      sb.append('0') // EOB
    }
    flushEntropy()
    hexAppend("FFD9")
    out.toArray
  }

  test("jpeg baseline decode: DC-only blocks are integer-exact; " +
       "restart markers reset the DC predictor") {
    val dcs = Seq(5, -3, 0, 10, -10, 7)
    val plain = dcOnlyJpeg(3, 2, dcs)
    val got = JpegBaseline.decodeGray(plain)
    assert(got != null, "plain DC-only: null")
    // every block is flat 128 + dc (q0 = 8 cancels the /8)
    for ((dc, b) <- dcs.zipWithIndex) {
      val (bx, byy) = (b % 3, b / 3)
      val p = got._3((byy * 8) * 24 + bx * 8)
      assert(p == 128 + dc, s"block $b: $p != ${128 + dc}")
    }
    // ImageIO agrees exactly on DC-only data
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(plain))
    for (y <- 0 until 16; x <- 0 until 24)
      assert(ref.getRaster.getSample(x, y, 0) == got._3(y * 24 + x),
        s"($x,$y): ImageIO disagrees on DC-only")
    // with DRI=2: RST markers every 2 blocks, predictor resets
    val rsted = dcOnlyJpeg(3, 2, dcs, ri = 2)
    val got2 = JpegBaseline.decodeGray(rsted)
    assert(got2 != null, "restart stream: null")
    assert(got2._3.sameElements(got._3),
      "restart-marker stream must reconstruct the same pixels")
  }

  /** ImageIO JPEG writer in progressive mode (optionally 4:4:4 via the
    * metadata tree). */
  private def jpegProgressiveBytes(img: java.awt.image.BufferedImage,
                                   quality: Float,
                                   force444: Boolean = false): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val md = if (!force444) null else {
      val m = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), param)
      val fmt = "javax_imageio_jpeg_image_1.0"
      val root = m.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val comps = root.getElementsByTagName("componentSpec")
      for (c <- 0 until comps.getLength) {
        val cs = comps.item(c).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        cs.setAttribute("HsamplingFactor", "1")
        cs.setAttribute("VsamplingFactor", "1")
      }
      m.setFromTree(fmt, root)
      m
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, md), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("jpeg PROGRESSIVE decode: ImageIO-written multi-scan streams " +
       "(DC+AC spectral bands, successive-approximation refinements) " +
       "decode within the T.81 bound for gray and forced-4:4:4 color") {
    val rnd = new scala.util.Random(1213)
    // grayscale progressive at several sizes/qualities
    for ((w, h, q) <- Seq((64, 48, 0.9f), (24, 16, 0.7f), (17, 9, 0.95f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          ((x * 13 + y * 7) % 160 + rnd.nextInt(40)) % 256)
      val bytes = jpegProgressiveBytes(img, q)
      val mine = JpegBaseline.decodeGray(bytes)
      assert(mine != null, s"${w}x$h q=$q: progressive decode null")
      assert(mine._1 == w && mine._2 == h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDiff = math.max(maxDiff,
          math.abs(mine._3(y * w + x) - ref.getRaster.getSample(x, y, 0)))
      assert(maxDiff <= 1, s"${w}x$h q=$q: max diff $maxDiff")
    }
    // color progressive, metadata-forced 4:4:4
    val cimg = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 32)
      cimg.setRGB(x, y,
        (((x * 13 + y * 7) % 200 + rnd.nextInt(30)) << 16) |
        (((x * 5 + y * 11) % 200 + rnd.nextInt(30)) << 8) |
        ((x * 3 + y * 17) % 200 + rnd.nextInt(30)))
    val cbytes = jpegProgressiveBytes(cimg, 0.9f, force444 = true)
    val got = JpegBaseline.decodePlanes(cbytes)
    assert(got != null && got._3.length == 3, "color progressive 4:4:4 null")
    val cref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cbytes))
    var maxDiff = 0
    for (y <- 0 until 24; x <- 0 until 32) {
      val i = y * 32 + x
      val (mr, mg, mb) =
        JpegBaseline.ycbcrToRgb(got._3(0)(i), got._3(1)(i), got._3(2)(i))
      val rgb = cref.getRGB(x, y)
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - mr))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - mg))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - mb))
    }
    assert(maxDiff <= 2, s"color progressive: max channel diff $maxDiff")
    // truncation at every byte must never throw
    val gbytes = jpegProgressiveBytes(
      { val g = new java.awt.image.BufferedImage(24, 16,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY); g }, 0.8f)
    for (cut <- 0 until gbytes.length) JpegBaseline.jpegPixelStats(gbytes.take(cut))
    // default-sampling (4:2:0) progressive color decodes since round
    // 12; constant-chroma (gray) content makes box == fancy chroma
    // upsampling, so the comparison against ImageIO is exact up to
    // the IDCT + conversion bound
    val gcimg = new java.awt.image.BufferedImage(40, 24,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 40) {
      val v = ((x * 13 + y * 7) % 160 + rnd.nextInt(40)) % 256
      gcimg.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val pbytes = jpegProgressiveBytes(gcimg, 0.85f)
    val pgot = JpegBaseline.decodePlanes(pbytes)
    assert(pgot != null && pgot._3.length == 3, "4:2:0 progressive null")
    assert(pgot._1 == 40 && pgot._2 == 24)
    val pref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pbytes))
    var pMax = 0
    for (y <- 0 until 24; x <- 0 until 40) {
      val i = y * 40 + x
      val (mr, mg, mb) =
        JpegBaseline.ycbcrToRgb(pgot._3(0)(i), pgot._3(1)(i), pgot._3(2)(i))
      val rgb = pref.getRGB(x, y)
      pMax = math.max(pMax, math.abs(((rgb >> 16) & 0xff) - mr))
      pMax = math.max(pMax, math.abs(((rgb >> 8) & 0xff) - mg))
      pMax = math.max(pMax, math.abs((rgb & 0xff) - mb))
    }
    assert(pMax <= 3, s"4:2:0 progressive constant-chroma: max diff $pMax")
    for (cut <- 0 until pbytes.length) // subsampled truncation fuzz
      JpegBaseline.jpegColorStats(pbytes.take(cut))
  }

  test("jpeg baseline decode: color/progressive/malformed inputs " +
       "yield null, never throw") {
    // color JPEG through the GRAY face: null (3 planes ≠ gray), even
    // though decodePlanes handles the 4:2:0 stream since round 12
    val cimg = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    cimg.setRGB(3, 3, 0x884422)
    assert(JpegBaseline.jpegPixelStats(jpegBytes(cimg, 0.8f)) == null)
    assert(JpegBaseline.jpegColorStats(jpegBytes(cimg, 0.8f)) != null,
      "the color face decodes default 4:2:0 output since round 12")
    // progressive now DECODES through the gray face (round 11) — the
    // dedicated progressive test pins pixel agreement; here just the
    // non-null contract flip
    val gimg = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(gimg, null, null), param)
    ios.close(); writer.dispose()
    assert(JpegBaseline.jpegPixelStats(bos.toByteArray) != null,
      "grayscale progressive decodes since round 11")
    // truncation at every byte must never throw
    val good = dcOnlyJpeg(2, 1, Seq(4, -4))
    assert(JpegBaseline.jpegPixelStats(good) != null)
    for (cut <- 0 until good.length)
      JpegBaseline.jpegPixelStats(good.take(cut))
    // corrupt entropy data: never throw
    val bad = good.clone()
    bad(bad.length - 3) = 0x55.toByte
    JpegBaseline.jpegPixelStats(bad)
    assert(JpegBaseline.jpegPixelStats("not a jpeg".getBytes) == null)
  }

  test("syntheticJpegPixels round-trip: SQL-built DC-only JPEGs decode " +
       "through jpegPixelStats AND the JDK ImageIO reader to the " +
       "constructing arithmetic") {
    import spark.implicits._
    val docs = (0L to 41L).toDF("doc_id")
    val fixtures = graft.llm.Multimodal.syntheticJpegPixels(docs)
      .orderBy("doc_id").collect()
    fixtures.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val nb = ((id % 3) + 1) * ((id % 2) + 1)
      val want = (0L until nb).map(b => 64L * (128 + (id * 5 + b * 7) % 21 - 10)).sum
      val nPx = nb * 64
      val got = JpegBaseline.jpegPixelStats(bytes)
      assert(got != null, s"doc $id: null")
      assert(got.toSeq == Seq(nPx, want, want, want),
        s"doc $id: ${got.toSeq} != ($nPx, $want)")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO rejects the SQL-built JPEG")
      var s = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        s += img.getRaster.getSample(x, y, 0)
      assert(s == want, s"doc $id: ImageIO disagrees ($s != $want)")
    }
  }

  /** ImageIO JPEG writer forced to 4:4:4 via the native metadata tree
    * (the default writer always subsamples RGB to 4:2:0 — verified in
    * the null-contract test below). */
  private def jpeg444Bytes(img: java.awt.image.BufferedImage,
                           quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val md = writer.getDefaultImageMetadata(
      new javax.imageio.ImageTypeSpecifier(img), param)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val root = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val comps = root.getElementsByTagName("componentSpec")
    for (c <- 0 until comps.getLength) {
      val cs = comps.item(c).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      cs.setAttribute("HsamplingFactor", "1")
      cs.setAttribute("VsamplingFactor", "1")
    }
    md.setFromTree(fmt, root)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, md), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** Color twin of dcOnlyJpeg: 3-component 4:4:4 interleaved DC-only
    * stream with per-component predictor chains, optional restarts. */
  private def dcOnlyColorJpeg(bw: Int, bh: Int, dcs: Seq[(Int, Int, Int)],
                              ri: Int = 0): Array[Byte] = {
    require(dcs.length == bw * bh)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def hexAppend(s: String): Unit =
      out ++= s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte)
    hexAppend("FFD8")
    hexAppend("FFDB004300" + "08" * 64)
    hexAppend("FFC40019" + "00" + "01" * 6 + "00" * 10 + "000102030405")
    hexAppend("FFC40014" + "10" + "01" + "00" * 15 + "00")
    hexAppend("FFC0001108" + f"${bh * 8}%04X" + f"${bw * 8}%04X" +
      "03" + "011100" + "021100" + "031100")
    if (ri > 0) hexAppend("FFDD0004" + f"$ri%04X")
    hexAppend("FFDA000C03 0100 0200 0300 003F00")
    val sb = new StringBuilder
    def flushEntropy(): Unit = {
      while (sb.length % 8 != 0) sb.append('1')
      sb.toString.grouped(8).foreach { byte =>
        val v = Integer.parseInt(byte, 2)
        out += v.toByte
        if (v == 0xff) out += 0x00.toByte
      }
      sb.clear()
    }
    val pred = Array(0, 0, 0)
    var rst = 0
    for ((dcTriple, b) <- dcs.zipWithIndex) {
      if (ri > 0 && b > 0 && b % ri == 0) {
        flushEntropy()
        out += 0xff.toByte; out += (0xd0 + rst).toByte
        rst = (rst + 1) & 7
        pred(0) = 0; pred(1) = 0; pred(2) = 0
      }
      for ((dc, c) <- Seq(dcTriple._1, dcTriple._2, dcTriple._3).zipWithIndex) {
        val d = dc - pred(c)
        pred(c) = dc
        val s = if (d == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(d))
        sb.append("1" * s).append('0')
        if (s > 0) {
          val v = if (d > 0) d else d + (1 << s) - 1
          val bits = Integer.toBinaryString(v)
          sb.append("0" * (s - bits.length)).append(bits)
        }
        sb.append('0') // EOB
      }
    }
    flushEntropy()
    hexAppend("FFD9")
    out.toArray
  }

  /** The spec's independent statement of the pinned fixed-point JFIF
    * matrix (positive-numerator regime: floor division). */
  private def refRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Long): Int = math.max(0L, math.min(255L, v)).toInt
    (cl(Math.floorDiv(y.toLong * 65536 + 91881L * (cr - 128) + 32768, 65536)),
     cl(Math.floorDiv(y.toLong * 65536 - 22554L * (cb - 128) - 46802L * (cr - 128) + 32768, 65536)),
     cl(Math.floorDiv(y.toLong * 65536 + 116130L * (cb - 128) + 32768, 65536)))
  }

  test("jpeg 4:4:4 color decode: DC-only interleaved MCUs are exact, " +
       "per-component predictors reset at restarts, ImageIO agrees") {
    val dcs = Seq((5, -3, 8), (-10, 0, 3), (7, 7, -7), (0, 10, -1), (2, -9, 4), (-4, 1, 0))
    val plain = dcOnlyColorJpeg(3, 2, dcs)
    val got = JpegBaseline.decodePlanes(plain)
    assert(got != null && got._3.length == 3, "color DC-only: null")
    val (w, h, planes) = got
    assert(w == 24 && h == 16)
    for (((dy, dcb, dcr), b) <- dcs.zipWithIndex) {
      val (bx, byy) = (b % 3, b / 3)
      val at = (byy * 8) * w + bx * 8
      assert(planes(0)(at) == 128 + dy, s"block $b Y")
      assert(planes(1)(at) == 128 + dcb, s"block $b Cb")
      assert(planes(2)(at) == 128 + dcr, s"block $b Cr")
    }
    // stats face == the independently-stated fixed-point conversion
    val stats = JpegBaseline.jpegColorStats(plain)
    var er = 0L; var eg = 0L; var eb = 0L
    for (i <- 0 until w * h) {
      val (r, g, bb) = refRgb(planes(0)(i), planes(1)(i), planes(2)(i))
      er += r; eg += g; eb += bb
    }
    assert(stats.toSeq == Seq(w.toLong * h, er, eg, eb), s"${stats.toSeq}")
    // ImageIO (libjpeg-derived fixed point) agrees within ±1/channel
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(plain))
    assert(ref != null)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val i = y * w + x
      val (mr, mg, mb) = refRgb(planes(0)(i), planes(1)(i), planes(2)(i))
      assert(math.abs(((rgb >> 16) & 0xff) - mr) <= 1, s"($x,$y) R")
      assert(math.abs(((rgb >> 8) & 0xff) - mg) <= 1, s"($x,$y) G")
      assert(math.abs((rgb & 0xff) - mb) <= 1, s"($x,$y) B")
    }
    // restart markers: same pixels, per-COMPONENT predictors reset
    val rsted = dcOnlyColorJpeg(3, 2, dcs, ri = 2)
    val got2 = JpegBaseline.decodePlanes(rsted)
    assert(got2 != null, "restart color stream: null")
    for (c <- 0 until 3)
      assert(got2._3(c).sameElements(planes(c)), s"restart plane $c differs")
    // grayscale replicates through the color face
    val gray = dcOnlyJpeg(2, 1, Seq(4, -4))
    val gs = JpegBaseline.jpegColorStats(gray)
    assert(gs != null && gs(1) == gs(2) && gs(2) == gs(3))
  }

  test("jpeg 4:4:4 color decode: ImageIO-written real-AC streams " +
       "(metadata-forced 1x1 sampling) decode within ±2/channel; " +
       "default 4:2:0 output and truncations stay null, never throw") {
    val rnd = new scala.util.Random(777)
    for ((w, h, q) <- Seq((32, 24, 0.95f), (24, 24, 0.7f), (17, 9, 0.9f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y,
          (((x * 13 + y * 7) % 200 + rnd.nextInt(30)) << 16) |
          (((x * 5 + y * 11) % 200 + rnd.nextInt(30)) << 8) |
          ((x * 3 + y * 17) % 200 + rnd.nextInt(30)))
      val bytes = jpeg444Bytes(img, q)
      val got = JpegBaseline.decodePlanes(bytes)
      assert(got != null && got._3.length == 3, s"${w}x$h q=$q: null")
      assert(got._1 == w && got._2 == h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        val (mr, mg, mb) =
          JpegBaseline.ycbcrToRgb(got._3(0)(i), got._3(1)(i), got._3(2)(i))
        val rgb = ref.getRGB(x, y)
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - mr))
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - mg))
        maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - mb))
      }
      // ±1 IDCT (T.81 bound) + ±1 conversion rounding
      assert(maxDiff <= 2, s"${w}x$h q=$q: max channel diff $maxDiff")
    }
    // the default writer subsamples to 4:2:0 — decoded for real since
    // round 12 (the dedicated subsampled test pins pixel agreement)
    val cimg = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    cimg.setRGB(3, 3, 0x884422)
    val sub = JpegBaseline.jpegColorStats(jpegBytes(cimg, 0.8f))
    assert(sub != null && sub(0) == 256L, "4:2:0 decodes since round 12")
    // truncation at every byte must never throw
    val good = dcOnlyColorJpeg(2, 1, Seq((4, -4, 2), (1, 0, -6)))
    assert(JpegBaseline.jpegColorStats(good) != null)
    for (cut <- 0 until good.length)
      JpegBaseline.jpegColorStats(good.take(cut))
    val bad = good.clone()
    bad(bad.length - 3) = 0x55.toByte
    JpegBaseline.jpegColorStats(bad) // null or decode — must not throw
  }

  /** ImageIO JPEG writer with an explicit Y sampling factor (chroma
    * stays 1×1), e.g. (2,2) → 4:2:0, (2,1) → 4:2:2. */
  private def jpegSampledBytes(img: java.awt.image.BufferedImage,
                               quality: Float, hY: Int, vY: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val md = writer.getDefaultImageMetadata(
      new javax.imageio.ImageTypeSpecifier(img), param)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val root = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val comps = root.getElementsByTagName("componentSpec")
    for (c <- 0 until comps.getLength) {
      val cs = comps.item(c).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      cs.setAttribute("HsamplingFactor", if (c == 0) hY.toString else "1")
      cs.setAttribute("VsamplingFactor", if (c == 0) vY.toString else "1")
    }
    md.setFromTree(fmt, root)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, md), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** DC-only 4:2:0 interleaved stream: per MCU 4 Y blocks (raster
    * order within the MCU) + 1 Cb + 1 Cr, per-component predictor
    * chains — the exactness oracle for the MCU-interleave walk and the
    * pinned box chroma upsampling. */
  private def dcOnly420Jpeg(mw: Int, mh: Int, ydcs: Seq[Seq[Int]],
                            cdcs: Seq[(Int, Int)]): Array[Byte] = {
    require(ydcs.length == mw * mh && ydcs.forall(_.length == 4) &&
      cdcs.length == mw * mh)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def hexAppend(s: String): Unit =
      out ++= s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte)
    hexAppend("FFD8")
    hexAppend("FFDB004300" + "08" * 64)
    hexAppend("FFC40019" + "00" + "01" * 6 + "00" * 10 + "000102030405")
    hexAppend("FFC40014" + "10" + "01" + "00" * 15 + "00")
    hexAppend("FFC0001108" + f"${mh * 16}%04X" + f"${mw * 16}%04X" +
      "03" + "012200" + "021100" + "031100")
    hexAppend("FFDA000C03 0100 0200 0300 003F00")
    val sb = new StringBuilder
    def emit(d: Int): Unit = {
      val s = if (d == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(d))
      sb.append("1" * s).append('0')
      if (s > 0) {
        val v = if (d > 0) d else d + (1 << s) - 1
        val bits = Integer.toBinaryString(v)
        sb.append("0" * (s - bits.length)).append(bits)
      }
      sb.append('0') // EOB
    }
    val pred = Array(0, 0, 0)
    for (m <- 0 until mw * mh) {
      for (yb <- 0 until 4) {
        emit(ydcs(m)(yb) - pred(0)); pred(0) = ydcs(m)(yb)
      }
      emit(cdcs(m)._1 - pred(1)); pred(1) = cdcs(m)._1
      emit(cdcs(m)._2 - pred(2)); pred(2) = cdcs(m)._2
    }
    while (sb.length % 8 != 0) sb.append('1')
    sb.toString.grouped(8).foreach { byte =>
      val v = Integer.parseInt(byte, 2)
      out += v.toByte
      if (v == 0xff) out += 0x00.toByte
    }
    hexAppend("FFD9")
    out.toArray
  }

  test("jpeg SUBSAMPLED decode: DC-only 4:2:0 MCU interleave is exact " +
       "with box-replicated chroma; ImageIO agrees on chroma-interior " +
       "pixels; real-AC 4:2:0 and 4:2:2 streams with constant chroma " +
       "match ImageIO (box == fancy there)") {
    // --- exactness oracle: 2×1 MCUs (32×16), flat DC blocks ---
    val ydcs = Seq(Seq(5, -3, 10, -10), Seq(7, 0, -6, 2))
    val cdcs = Seq((8, -8), (-4, 12))
    val plain = dcOnly420Jpeg(2, 1, ydcs, cdcs)
    val got = JpegBaseline.decodePlanes(plain)
    assert(got != null && got._1 == 32 && got._2 == 16 && got._3.length == 3,
      "DC-only 4:2:0: bad shape")
    val (w, h, planes) = got
    for (m <- 0 until 2; yb <- 0 until 4) {
      val px = (m * 16 + (yb % 2) * 8, (yb / 2) * 8)
      assert(planes(0)(px._2 * w + px._1) == 128 + ydcs(m)(yb),
        s"MCU $m Y block $yb")
    }
    // chroma: native 8×8 blocks box-replicated 2×2 — every pixel of
    // MCU m carries that MCU's flat chroma
    for (m <- 0 until 2; y <- 0 until 16; x <- 0 until 16) {
      assert(planes(1)(y * w + m * 16 + x) == 128 + cdcs(m)._1, s"Cb($m,$x,$y)")
      assert(planes(2)(y * w + m * 16 + x) == 128 + cdcs(m)._2, s"Cr($m,$x,$y)")
    }
    // ImageIO (fancy/triangle chroma upsampling) agrees exactly on
    // pixels whose contributing chroma samples are all within one flat
    // 16×16 region (2 ≤ x%16 ≤ 13), ±1 for its integer conversion
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(plain))
    assert(ref != null, "ImageIO rejects the 4:2:0 DC-only stream")
    for (y <- 2 until 14; x <- 0 until w if x % 16 >= 2 && x % 16 <= 13) {
      val i = y * w + x
      val (mr, mg, mb) = refRgb(planes(0)(i), planes(1)(i), planes(2)(i))
      val rgb = ref.getRGB(x, y)
      assert(math.abs(((rgb >> 16) & 0xff) - mr) <= 1, s"($x,$y) R")
      assert(math.abs(((rgb >> 8) & 0xff) - mg) <= 1, s"($x,$y) G")
      assert(math.abs((rgb & 0xff) - mb) <= 1, s"($x,$y) B")
    }
    // stats face consistency on the subsampled path
    val stats = JpegBaseline.jpegColorStats(plain)
    var er = 0L; var eg = 0L; var eb = 0L
    for (i <- 0 until w * h) {
      val (r0, g0, b0) = refRgb(planes(0)(i), planes(1)(i), planes(2)(i))
      er += r0; eg += g0; eb += b0
    }
    assert(stats.toSeq == Seq(w.toLong * h, er, eg, eb))
    // truncation at every byte must never throw
    for (cut <- 0 until plain.length) JpegBaseline.jpegColorStats(plain.take(cut))
    // --- real-AC streams, constant chroma (gray content): box and
    // fancy upsampling agree everywhere, Y rides the full-resolution
    // MCU interleave — odd sizes exercise partial edge MCUs ---
    val rnd = new scala.util.Random(4242)
    for ((iw, ih, hY, vY, q) <- Seq(
        (40, 24, 2, 2, 0.9f), (33, 17, 2, 2, 0.7f),
        (32, 24, 2, 1, 0.9f), (19, 13, 2, 1, 0.8f), (24, 18, 1, 2, 0.85f))) {
      val img = new java.awt.image.BufferedImage(iw, ih,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until ih; x <- 0 until iw) {
        val v = ((x * 13 + y * 7) % 160 + rnd.nextInt(40)) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bytes = jpegSampledBytes(img, q, hY, vY)
      val mine = JpegBaseline.decodePlanes(bytes)
      assert(mine != null && mine._3.length == 3, s"${iw}x$ih $hY:$vY null")
      assert(mine._1 == iw && mine._2 == ih)
      val iref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until ih; x <- 0 until iw) {
        val i = y * iw + x
        val (mr, mg, mb) =
          JpegBaseline.ycbcrToRgb(mine._3(0)(i), mine._3(1)(i), mine._3(2)(i))
        val rgb = iref.getRGB(x, y)
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - mr))
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - mg))
        maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - mb))
      }
      // ±1 IDCT + ±1 conversion + ≤1 chroma quantization ripple
      assert(maxDiff <= 3, s"${iw}x$ih $hY:$vY q=$q: max diff $maxDiff")
    }
  }

  test("syntheticJpegProgressive round-trip: SQL-built two-scan " +
       "successive-approximation DC streams decode through " +
       "jpegPixelStats AND the JDK ImageIO reader to the arithmetic") {
    import spark.implicits._
    val docs = (0L to 41L).toDF("doc_id")
    val fixtures = graft.llm.Multimodal.syntheticJpegProgressive(docs)
      .orderBy("doc_id").collect()
    fixtures.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val nb = ((id % 3) + 1) * ((id % 2) + 1)
      val want = (0L until nb).map(b => 64L * (128 + (id * 5 + b * 7) % 21)).sum
      val got = JpegBaseline.jpegPixelStats(bytes)
      assert(got != null, s"doc $id: null")
      assert(got.toSeq == Seq(nb * 64, want, want, want),
        s"doc $id: ${got.toSeq} != (${nb * 64}, $want)")
      // the refinement bit is load-bearing: decoding scan 1 alone
      // (truncate before the second SOS) reconstructs dc>>1<<1, so any
      // doc with an odd-dc block must differ — proves scan 2 is read
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO rejects the progressive fixture")
      var s = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        s += img.getRaster.getSample(x, y, 0)
      assert(s == want, s"doc $id: ImageIO disagrees ($s != $want)")
    }
    // the codegen'd column face decodes them too
    val viaCol = graft.llm.Multimodal.syntheticJpegProgressive(docs)
      .select(col("doc_id"),
        BinaryMeta.jpegColorStatsCol(col("payload")).as("s"))
      .orderBy("doc_id").collect()
    viaCol.foreach { r => assert(!r.isNullAt(1), s"doc ${r.getLong(0)}") }
  }

  test("syntheticJpegColorPixels round-trip: SQL-built DC-only 4:4:4 " +
       "JPEGs decode through jpegColorStats AND the JDK ImageIO " +
       "reader to the constructing arithmetic") {
    import spark.implicits._
    val docs = (0L to 41L).toDF("doc_id")
    val fixtures = graft.llm.Multimodal.syntheticJpegColorPixels(docs)
      .orderBy("doc_id").collect()
    fixtures.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val nb = ((id % 3) + 1) * ((id % 2) + 1)
      def dc(b: Long, c: Long) = ((id * 5 + b * 7 + c * 31) % 21 - 10).toInt
      var er = 0L; var eg = 0L; var eb = 0L
      for (b <- 0L until nb) {
        val (r0, g0, b0) = refRgb(128 + dc(b, 0), 128 + dc(b, 1), 128 + dc(b, 2))
        er += 64L * r0; eg += 64L * g0; eb += 64L * b0
      }
      val got = JpegBaseline.jpegColorStats(bytes)
      assert(got != null, s"doc $id: null")
      assert(got.toSeq == Seq(nb * 64, er, eg, eb),
        s"doc $id: ${got.toSeq} != (${nb * 64}, $er, $eg, $eb)")
      // ImageIO reads the SQL-built stream; channel sums within
      // ±1/pixel/channel of the pinned conversion
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO rejects the SQL-built JPEG")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      }
      val npx = nb * 64
      assert(math.abs(sr - er) <= npx && math.abs(sg - eg) <= npx &&
        math.abs(sb - eb) <= npx, s"doc $id: ImageIO far off")
    }
    // the gate's codegen'd column face agrees
    val viaCol = graft.llm.Multimodal.syntheticJpegColorPixels(docs)
      .select(col("doc_id"),
        BinaryMeta.jpegColorStatsCol(col("payload")).as("s"))
      .orderBy("doc_id").collect()
    viaCol.foreach { r => assert(!r.isNullAt(1), s"doc ${r.getLong(0)}") }
  }

  test("mp3Meta/adtsMeta: ID3 skip (footer flag, chained tags), " +
       "version/layer/bitrate tables, split-field ADTS packing, " +
       "null contracts") {
    def hexB(s: String) = s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    // ID3v2.4 with FOOTER flag (0x10), syncsafe size 20 -> span 40;
    // then MPEG-2 Layer II frame: FF F4 (vb=2, layer=2, prot=0... use
    // F5: 1111 0101 -> vb=10 (MPEG2), layer=10 (II), prot=1), bitrate
    // index 9 -> V2L23[9] = 80 kbps, srate index 1 -> 24000, mono (C0)
    // header(10) + body(20) + FOOTER(10, "3DI"-led) + frame: span 40
    val mp3 = hexB("494433 0400 10 00000014" + "00" * 20 +
      "334449 0400 00 00000014" +
      "FFF5 96 C0") // 0x96 = bi 9, si 1; 0xC0 = mono
    val m = BinaryMeta.mp3Meta(mp3)
    assert(m != null, "mp3 with ID3 footer: null")
    assert(m.toSeq == Seq(24000L, 80L, 1L, 40L), m.toSeq)
    // chained tags: two ID3 blocks back-to-back
    val chained = hexB("494433 0300 00 00000005" + "00" * 5 +
      "494433 0400 00 00000003" + "00" * 3 + "FFFB 90 00")
    val c = BinaryMeta.mp3Meta(chained)
    assert(c != null && c(3) == 15 + 13, s"chained span: ${c.toSeq}")
    assert(c(0) == 44100 && c(1) == 128 && c(2) == 2, c.toSeq) // V1L3[9]=128
    // null contracts: free-format, invalid bitrate, reserved srate,
    // reserved version, bad syncsafe byte
    assert(BinaryMeta.mp3Meta(hexB("FFFB 04 00")) == null, "free-format")
    assert(BinaryMeta.mp3Meta(hexB("FFFB F4 00")) == null, "bitrate 15")
    assert(BinaryMeta.mp3Meta(hexB("FFFB 9C 00")) == null, "srate 3")
    assert(BinaryMeta.mp3Meta(hexB("FFEB 94 00")) == null, "version reserved")
    assert(BinaryMeta.mp3Meta(hexB("494433 0400 00 000000FF FFFB 94 00")) == null,
      "non-syncsafe size byte")
    // ADTS: profile LC (pb=1), sfi=4 (44100), cfg=6 split across the
    // byte boundary (byte2 bit0 = 1, byte3 top bits = 10), frame
    // length 2055 = 0b100_00000111 across three fields
    // byte2 = 01 0100 1 . 1? wait: pb(2) sfi(4) private(1) cfg_hi(1):
    // 01 0100 0 1 = 0x51; byte3: cfg_lo(2)=10, orig(1) home(1)
    // copyid(1) copystart(1) fl_hi(2)=00... fl=2055=0b0100000000111:
    // fl>>11=1, (fl>>3)&0xFF=0x00? 2055 = 0x807 -> bits 12..11 = 01
    val fl = 2055
    val b3 = (2 << 6) | ((fl >> 11) & 3)
    val b4 = (fl >> 3) & 0xff
    val b5 = ((fl & 7) << 5) | 0x1f
    val adts = Array[Int](0xff, 0xf1, 0x51, b3, b4, b5, 0xfc).map(_.toByte)
    val a = BinaryMeta.adtsMeta(adts)
    assert(a != null && a.toSeq == Seq(44100L, 6L, 2055L, 2L), a.toSeq)
    // cfg 7 -> 8 channels; cfg 0 -> null; sfi 13 -> null
    val a7 = adts.clone(); a7(2) = 0x51.toByte; a7(3) = (0xc0 | ((fl >> 11) & 3)).toByte
    assert(BinaryMeta.adtsMeta(a7)(1) == 8, "cfg 7 maps to 8 channels")
    val a0 = adts.clone(); a0(2) = 0x50.toByte; a0(3) = ((fl >> 11) & 3).toByte
    assert(BinaryMeta.adtsMeta(a0) == null, "cfg 0 (PCE) declines")
    val a13 = adts.clone(); a13(2) = (0x40 | (13 << 2) | 1).toByte
    assert(BinaryMeta.adtsMeta(a13) == null, "reserved sfi declines")
    // format detection; truncation fuzz never throws
    assert(BinaryMeta.format(mp3).toString == "mp3")
    assert(BinaryMeta.format(adts).toString == "aac")
    for (cut <- 0 until mp3.length) BinaryMeta.mp3Meta(mp3.take(cut))
    for (cut <- 0 until adts.length) BinaryMeta.adtsMeta(adts.take(cut))
  }

  test("warcIndex: Content-Length byte discipline (WARC markers inside " +
       "payloads), case-insensitive headers, truncation prefix-stop, " +
       "column face slices content correctly") {
    def rec(uri: String, ctype: String, payload: String,
            lenOverride: Int = -1, nameCase: Boolean = false): String = {
      val n = if (lenOverride >= 0) lenOverride else payload.length
      val (u, c, l) = if (nameCase) ("warc-target-uri", "CONTENT-TYPE", "content-LENGTH")
        else ("WARC-Target-URI", "Content-Type", "Content-Length")
      s"WARC/1.0\r\nWARC-Type: response\r\n$u: $uri\r\n$c: $ctype\r\n" +
        s"$l: $n\r\n\r\n$payload\r\n\r\n"
    }
    def parse(s: String): Seq[(String, String, Int, Int)] = {
      val a = BinaryMeta.warcIndex(s.getBytes("ISO-8859-1"))
      if (a == null) return Nil
      (0 until a.numElements).map { i =>
        val r = a.getStruct(i, 4)
        (if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
         if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
         r.getInt(2), r.getInt(3))
      }
    }
    // a payload CONTAINING a full WARC header block must not re-split:
    // only Content-Length counting parses this correctly
    val trap = "see WARC/1.0\r\nContent-Length: 0\r\n\r\n inside"
    val blob = rec("http://a/1", "text/html", trap) +
      rec("http://a/2", "text/plain", "plain body", nameCase = true) +
      rec("http://a/3", "text/html", "x\r\n\r\ny")
    val got = parse(blob)
    assert(got.length == 3, s"got $got")
    assert(got.map(_._1) == Seq("http://a/1", "http://a/2", "http://a/3"))
    assert(got(1)._2 == "text/plain", "case-insensitive header names")
    val bytes = blob.getBytes("ISO-8859-1")
    got.zip(Seq(trap, "plain body", "x\r\n\r\ny")).foreach { case ((_, _, off, len), want) =>
      assert(new String(bytes, off, len, "ISO-8859-1") == want)
    }
    // truncated third record: the first two still index
    val cut = blob.substring(0, blob.length - 4) // removes final seps + body tail
    assert(parse(cut).length >= 2)
    // missing trailing separators at EOF tolerated
    val noSep = rec("http://b/1", "t", "abc").stripSuffix("\r\n\r\n")
    assert(parse(noSep).map(_._1) == Seq("http://b/1"))
    // declared length beyond the blob -> record not indexed
    assert(parse(rec("http://c/1", "t", "abc", lenOverride = 999)).isEmpty)
    // foreign bytes / empty -> null (Nil here)
    assert(parse("not a warc").isEmpty)
    assert(parse("").isEmpty)
    for (c <- 0 until math.min(bytes.length, 200))
      BinaryMeta.warcIndex(bytes.take(c)) // never throws
    // the DataFrame face: slicing + decode through the codegen'd path
    import spark.implicits._
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
    val rows = graft.llm.Multimodal.warcExtract(df)
      .orderBy("rec_idx")
      .select("uri", "content").as[(String, String)].collect().toSeq
    assert(rows == Seq(("http://a/1", trap), ("http://a/2", "plain body"),
      ("http://a/3", "x\r\n\r\ny")))
  }

  test("gunzipMembers: multi-member .warc.gz framing (real deflate via " +
       "GZIPOutputStream), header flag fields, CRC/ISIZE verification, " +
       "truncation prefix-stop; warcExtract auto-detects the magic") {
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("ISO-8859-1")); g.close()
      bos.toByteArray
    }
    def rec(uri: String, payload: String): String =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Type: text/html\r\nContent-Length: ${payload.length}\r\n" +
        s"\r\n$payload\r\n\r\n"
    val recs = Seq(rec("http://g/1", "alpha body"),
      rec("http://g/2", "see WARC/1.0\r\n\r\n trap"),
      rec("http://g/3", "third"))
    val blob = recs.map(gz).reduce(_ ++ _)
    val plain = recs.mkString.getBytes("ISO-8859-1")
    val got = BinaryMeta.gunzipMembers(blob)
    assert(got != null && got.sameElements(plain), "member concat differs")
    // header with FNAME + FEXTRA + FCOMMENT + FHCRC and a stored block
    def le(v: Long, n: Int) = (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte)
    val body = "flagged member".getBytes("ISO-8859-1")
    val crc = new java.util.zip.CRC32(); crc.update(body)
    val hcrc = { // CRC-32 of the header bytes, low 16 bits (RFC 1952)
      val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8 | 16 | 2).toByte,
        0, 0, 0, 0, 0, 0xff.toByte) ++
        (le(3, 2) ++ Seq[Byte]('x', 'y', 'z')) ++
        ("name.warc".getBytes("ISO-8859-1") :+ 0.toByte) ++
        ("a comment".getBytes("ISO-8859-1") :+ 0.toByte)
      val c = new java.util.zip.CRC32(); c.update(hdr); c.getValue & 0xffff
    }
    val flagged = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8 | 16 | 2).toByte,
        0, 0, 0, 0, 0, 0xff.toByte) ++
      (le(3, 2) ++ Seq[Byte]('x', 'y', 'z')) ++ // FEXTRA xlen=3
      ("name.warc".getBytes("ISO-8859-1") :+ 0.toByte) ++ // FNAME
      ("a comment".getBytes("ISO-8859-1") :+ 0.toByte) ++ // FCOMMENT
      le(hcrc, 2) ++ // FHCRC
      (Array[Byte](1) ++ le(body.length, 2) ++ le(0xffff ^ body.length, 2) ++
        body) ++ // stored deflate block
      le(crc.getValue, 4) ++ le(body.length, 4)
    val fg = BinaryMeta.gunzipMembers(flagged)
    assert(fg != null && fg.sameElements(body), "flagged-header member")
    // the JDK's own reader accepts the same blob (independent decoder)
    val jdk = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(flagged)).readAllBytes()
    assert(jdk.sameElements(body))
    // truncated second member: the first member's bytes survive
    val twoCut = gz("first") ++ gz("second").dropRight(3)
    val partial = BinaryMeta.gunzipMembers(twoCut)
    assert(partial != null && partial.sameElements("first".getBytes), "prefix-stop")
    // corrupt CRC -> member rejected
    val badCrc = gz("only")
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x55).toByte
    assert(BinaryMeta.gunzipMembers(badCrc) == null, "CRC mismatch must reject")
    // truncation at every byte never throws; foreign bytes -> null
    for (cut <- 0 until blob.length) BinaryMeta.gunzipMembers(blob.take(cut))
    assert(BinaryMeta.gunzipMembers("not gzip".getBytes) == null)
    assert(BinaryMeta.gunzipMembers(Array.emptyByteArray) == null)
    // warcExtract auto-detects: the SAME pipeline face handles both
    import spark.implicits._
    val df = Seq((1L, blob), (2L, plain)).toDF("doc_id", "payload")
    val rows = graft.llm.Multimodal.warcExtract(df)
      .orderBy("doc_id", "rec_idx")
      .select("doc_id", "uri", "content").as[(Long, String, String)]
      .collect().toSeq
    assert(rows.map(_._2) == Seq("http://g/1", "http://g/2", "http://g/3",
      "http://g/1", "http://g/2", "http://g/3"))
    assert(rows(0)._3 == "alpha body" && rows(3)._3 == "alpha body")
    // the SQL-built fixture round-trips through the JDK reader too
    val fx = graft.llm.Multimodal.syntheticWarcGz(
      Seq(7L).toDF("doc_id")).select("payload").as[Array[Byte]].head()
    val viaJdk = new String(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(fx)).readAllBytes(), "ISO-8859-1")
    assert(viaJdk.contains("WARC-Target-URI: http://gz7.example/r1") &&
      viaJdk.contains("gz page 2 of doc 7"), viaJdk.take(200))
  }

  test("httpMeta/httpBody: status/header walk over CRLF and bare-LF " +
       "responses, charset params, Content-Length bounding, chunked " +
       "de-framing (extensions, trailers, truncation), gzip bodies, " +
       "unknown codings null") {
    def meta(s: String): org.apache.spark.sql.catalyst.InternalRow =
      BinaryMeta.httpMeta(s.getBytes("ISO-8859-1"))
    def body(b: Array[Byte]): String = {
      val r = BinaryMeta.httpBody(b)
      if (r == null) null else new String(r, "ISO-8859-1")
    }
    // plain CRLF + quoted charset param + honest Content-Length with
    // trailing junk the length must exclude
    val plain = "HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; " +
      "charset=\"ISO-8859-1\"\r\nContent-Length: 5\r\n\r\nhelloJUNK"
    val m1 = meta(plain)
    assert(m1 != null && m1.getInt(0) == 200)
    assert(m1.getUTF8String(1).toString == "text/html")
    assert(m1.getUTF8String(2).toString == "iso-8859-1")
    assert(m1.isNullAt(3) && !m1.getBoolean(4))
    assert(body(plain.getBytes("ISO-8859-1")) == "hello")
    // bare-LF lines; no reason phrase; missing Content-Length -> rest
    val lf = "HTTP/1.0 404\nContent-Type: text/plain\n\nmissing page"
    val m2 = meta(lf)
    assert(m2 != null && m2.getInt(0) == 404)
    assert(body(lf.getBytes("ISO-8859-1")) == "missing page")
    // chunked: extension on a size line, terminal trailers dropped,
    // Content-Length ignored per RFC 9112 s6.2
    val ch = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Length: 3\r\n\r\n" +
      "6;note=x\r\nhello \r\nB\r\nworld again\r\n0\r\nTrailer: t\r\n\r\n"
    val m3 = meta(ch)
    assert(m3 != null && m3.getBoolean(4), "chunked flag")
    assert(body(ch.getBytes("ISO-8859-1")) == "hello world again")
    // malformed chunk framing: bad hex, truncated data, missing CRLF
    assert(body(("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "zz\r\nhm\r\n0\r\n\r\n").getBytes) == null, "bad hex size")
    assert(body(("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "A\r\nshort\r\n").getBytes) == null, "truncated chunk data")
    assert(body(("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhelloX\r\n0\r\n\r\n").getBytes) == null, "missing chunk CRLF")
    // gzip Content-Encoding (real deflate) decodes; br declines
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("compressed payload".getBytes("ISO-8859-1")); g.close()
      bos.toByteArray
    }
    val gzResp = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes("ISO-8859-1") ++ gz
    assert(body(gzResp) == "compressed payload")
    assert(body(("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxx")
      .getBytes) == null, "unknown coding must not mislabel bytes")
    assert(body(("HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\n\r\nok")
      .getBytes) == "ok")
    // chunked THEN gzip composes (Transfer- then Content-decoding)
    val chGz = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes("ISO-8859-1") ++
      (f"${gz.length}%x\r\n".getBytes("ISO-8859-1") ++ gz ++
        "\r\n0\r\n\r\n".getBytes("ISO-8859-1"))
    assert(body(chGz) == "compressed payload")
    // malformed: not HTTP, bad status, truncated headers -> null
    assert(meta("NOPE/1.1 200 OK\r\n\r\n") == null)
    assert(meta("HTTP/1.1 999x OK\r\n\r\n") == null)
    assert(meta("HTTP/1.1 042 odd\r\n\r\n") == null, "status < 100")
    assert(meta("HTTP/1.1 200 OK\r\nContent-Type: t") == null,
      "no empty line terminator")
    // truncation at every byte never throws (both faces)
    val full = ch.getBytes("ISO-8859-1")
    for (c <- 0 until full.length) {
      BinaryMeta.httpMeta(full.take(c)); BinaryMeta.httpBody(full.take(c))
    }
    for (c <- 0 until gzResp.length) BinaryMeta.httpBody(gzResp.take(c))
  }

  test("fetchPages composition: WARC-wrapped HTTP responses keep only " +
       "2xx, latin-1 charset decodes the 0xE9 byte, non-HTTP records drop") {
    import spark.implicits._
    def warcWrap(uri: String, content: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${content.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        content ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val latin = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
      "charset=ISO-8859-1\r\n\r\ncafé").getBytes("ISO-8859-1")
    // no header charset: the HTML meta tag is sniffed instead, and the
    // 0xE9 byte still decodes latin-1
    val metaSniff = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><meta charset=\"iso-8859-1\"><body>café</body></html>")
      .getBytes("ISO-8859-1")
    // a header charset OVERRIDES a conflicting meta tag (RFC 9110
    // precedence): utf-8 wins, the utf-8 bytes decode as utf-8
    val hdrWins = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=utf-8\r\n\r\n<meta charset=iso-8859-1>cafÃ©")
      .getBytes("ISO-8859-1")
    val notFound = "HTTP/1.1 404 Nope\r\n\r\ngone".getBytes("ISO-8859-1")
    val notHttp = "just plain text, no status line".getBytes("ISO-8859-1")
    // windows-1252 decodes for REAL: 0x93/0x94 are the curly quotes
    // (NOT latin-1 C1 controls), 0xE9 still é — Java's own cp1252
    // decoder is the truth the fixture is built from
    val cp1252Body = "“café” — 80‰"
      .getBytes("windows-1252")
    val cp1252 = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
      "charset=windows-1252\r\n\r\n").getBytes("ISO-8859-1") ++ cp1252Body
    // a DECLARED charset outside the decodable set (shift_jis) falls
    // back to UTF-8 — and the row must NOT mislabel the text with the
    // charset that was not applied: effective charset reports null
    val foreignCs = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
      "charset=shift_jis\r\n\r\nplain ascii body").getBytes("ISO-8859-1")
    val df = Seq(
      (1L, warcWrap("http://l.example/a", latin)),
      (2L, warcWrap("http://l.example/b", notFound)),
      (3L, warcWrap("http://l.example/c", notHttp)),
      (4L, warcWrap("http://l.example/d", metaSniff)),
      (5L, warcWrap("http://l.example/e", hdrWins)),
      (6L, warcWrap("http://l.example/f", cp1252)),
      (7L, warcWrap("http://l.example/g", foreignCs))).toDF("doc_id", "payload")
    val got = graft.llm.Multimodal.fetchPages(df)
      .select($"doc_id", $"uri", $"charset", $"text")
      .as[(Long, String, String, String)].collect().toList.sortBy(_._1)
    assert(got == List(
      (1L, "http://l.example/a", "iso-8859-1", "café"),
      (4L, "http://l.example/d", "iso-8859-1",
        "<html><meta charset=\"iso-8859-1\"><body>café</body></html>"),
      (5L, "http://l.example/e", "utf-8", "<meta charset=iso-8859-1>café"),
      (6L, "http://l.example/f", "windows-1252",
        "“café” — 80‰"),
      (7L, "http://l.example/g", null, "plain ascii body")),
      got.toString)
  }

  test("mp3FrameStats/adtsFrameStats: frame-length hopping across " +
       "layers/versions, ID3v1 trailer stop, partial-frame stop") {
    def hexB(s: String) = s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    // 3 CBR MPEG-1 Layer III frames @128kbps/44100: flen = 144*128000/
    // 44100 = 417 bytes; 1152 samples each; ID3v1 "TAG" block after
    def mp3Frame(headHex: String, flen: Int) =
      headHex + "00" * (flen - 4)
    val f417 = mp3Frame("FFFB" + "90" + "00", 417) // bi=9(128k) si=0
    val mp3 = hexB(f417 * 3 + "544147" + "00" * 125)
    val g = BinaryMeta.mp3FrameStats(mp3)
    assert(g != null && g.toSeq == Seq(3L, 3456L, 3456L * 1000 / 44100, 1251L),
      s"${Option(g).map(_.toSeq)}")
    // Layer I: flen = (12*br/rate + pad)*4; 384 samples. bi=9 V1L1 ->
    // 288kbps @32000: (12*288000/32000)*4 = 432
    val l1 = hexB(mp3Frame("FFFF" + "98" + "00", 432)) // layer bits 11, si=2
    val g1 = BinaryMeta.mp3FrameStats(l1)
    assert(g1 != null && g1.toSeq == Seq(1L, 384L, 384L * 1000 / 32000, 432L),
      s"${Option(g1).map(_.toSeq)}")
    // MPEG-2 Layer III: 576 samples, flen = 72*br/rate. vb=2: byte1
    // 1111 0011 = F3; bi=10 V2L23=96kbps, si=1 -> rate 24000:
    // 72*96000/24000 = 288
    val v2 = hexB(mp3Frame("FFF3" + "A4" + "00", 288))
    val g2 = BinaryMeta.mp3FrameStats(v2)
    assert(g2 != null && g2.toSeq == Seq(1L, 576L, 576L * 1000 / 24000, 288L),
      s"${Option(g2).map(_.toSeq)}")
    // a TRUNCATED second frame is not counted; walk reports the first
    val cut = hexB(f417 + f417.substring(0, 100))
    val gc = BinaryMeta.mp3FrameStats(cut)
    assert(gc != null && gc(0) == 1 && gc(3) == 417)
    // ADTS: 4 frames of 50 bytes @ sfi=4 (44100)
    val fl = 50
    val adtsFrame = "FFF1" + "51" +
      f"${(2 << 6) | ((fl >> 11) & 3)}%02X" + f"${(fl >> 3) & 0xff}%02X" +
      f"${((fl & 7) << 5) | 0x1f}%02X" + "FC" + "00" * (fl - 7)
    val ga = BinaryMeta.adtsFrameStats(hexB(adtsFrame * 4))
    assert(ga != null && ga.toSeq == Seq(4L, 4096L, 4096L * 1000 / 44100, 200L),
      s"${Option(ga).map(_.toSeq)}")
    // zero complete frames -> null; foreign bytes -> null
    assert(BinaryMeta.mp3FrameStats(hexB("FFFB9000")) == null, "partial only")
    assert(BinaryMeta.adtsFrameStats("x".getBytes) == null)
    for (c <- 0 until mp3.length) BinaryMeta.mp3FrameStats(mp3.take(c))
  }

  test("id3TextFrames: v2.3/v2.4 sizes, all four text encodings, " +
       "multi-value NULs, padding stop, unsynchronisation, fuzz") {
    def hexB(s: String) = s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    def frames(a: org.apache.spark.sql.catalyst.util.ArrayData)
        : Seq[(String, String)] =
      if (a == null) Nil
      else (0 until a.numElements).map { i =>
        val r = a.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
      }
    def tag(ver: Int, framesHex: String, pad: Int = 0): Array[Byte] = {
      val size = framesHex.length / 2 + pad
      hexB(f"494433 0${ver}00 00 000000$size%02X" + framesHex + "00" * pad)
    }
    // v2.3 plain-u32 size; ISO-8859-1 with trailing NUL stripped
    val iso = "54495432" + "00000007" + "0000" + "00" +
      "416263E90000" // "Abcé" + two trailing NULs -> fsize 7
    assert(frames(BinaryMeta.id3TextFrames(tag(3, iso))) ==
      Seq(("TIT2", "Abcé")))
    // v2.4 syncsafe size; UTF-8; multi-value NUL -> '/'
    val utf8 = "54504531" + "0000000D" + "0000" + "03" +
      "416C70686100426574610000" // "Alpha\0Beta\0\0": 12 data bytes + enc = 13
    assert(frames(BinaryMeta.id3TextFrames(tag(4, utf8))) ==
      Seq(("TPE1", "Alpha/Beta")))
    // UTF-16 with BOM (enc 1) and UTF-16BE (enc 2)
    val u16 = "54414C42" + "00000007" + "0000" + "01" + "FFFE4100CC00"
    assert(frames(BinaryMeta.id3TextFrames(tag(4, u16))) ==
      Seq(("TALB", "AÌ")))
    val u16be = "54414C42" + "00000005" + "0000" + "02" + "00420043"
    assert(frames(BinaryMeta.id3TextFrames(tag(4, u16be))) ==
      Seq(("TALB", "BC")))
    // padding stops the walk; non-text frames skipped but walked past
    val mixed = "50524956" + "00000004" + "0000" + "DEADBEEF" + // PRIV
      "54495432" + "00000002" + "0000" + "00" + "58"            // "X"
    assert(frames(BinaryMeta.id3TextFrames(tag(3, mixed, pad = 6))) ==
      Seq(("TIT2", "X")))
    // v2.4 frame size that is NOT syncsafe declines the frame walk
    val badSync = "54495432" + "000000FF" + "0000" + "00" + "58"
    assert(BinaryMeta.id3TextFrames(tag(4, badSync)) == null)
    // v2.4 DATA-LENGTH-INDICATOR flag (0x01): 4 syncsafe bytes precede
    // the encoding byte; v2.3 GROUPING flag (0x20): 1 byte precedes
    val dli = "54495432" + "00000006" + "0001" + "00000002" + "00" + "59"
    assert(frames(BinaryMeta.id3TextFrames(tag(4, dli))) ==
      Seq(("TIT2", "Y")))
    val grp = "54495432" + "00000003" + "0020" + "AA" + "00" + "5A"
    assert(frames(BinaryMeta.id3TextFrames(tag(3, grp))) ==
      Seq(("TIT2", "Z")))
    // COMPRESSED frames are walked past, later frames still extract
    val comp = "54495432" + "00000002" + "0080" + "00" + "58" +
      "54504531" + "00000002" + "0000" + "00" + "57"
    assert(frames(BinaryMeta.id3TextFrames(tag(3, comp))) ==
      Seq(("TPE1", "W")))
    // v2.3 TAG-LEVEL unsynchronisation (flag 0x80): the whole tag body
    // is FF 00 -> FF de-unsynced before the walk. Body "ÿA" (FF 41)
    // ships as FF 00 41 on disk; fsize (3) counts DE-UNSYNCED bytes.
    val un23 = hexB("494433 0300 80 0000000E" +
      "54495432" + "00000003" + "0000" + "00" + "FF0041")
    assert(frames(BinaryMeta.id3TextFrames(un23)) == Seq(("TIT2", "ÿA")),
      frames(BinaryMeta.id3TextFrames(un23)).toString)
    // a tag-level-unsynced v2.3 tag whose data happens to carry no
    // FF 00 pair parses identically to the plain form
    val un23plain = tag(3, iso); un23plain(5) = 0x80.toByte
    assert(frames(BinaryMeta.id3TextFrames(un23plain)) ==
      Seq(("TIT2", "Abcé")))
    // v2.4 PER-FRAME unsync flag (0x02): fsize is the ON-DISK size,
    // that frame's body de-unsyncs before decode; the next frame is
    // untouched
    val un24 = "54495432" + "00000006" + "0002" + "00" + "FF0041FF00" +
      "54504531" + "00000002" + "0000" + "00" + "51"
    assert(frames(BinaryMeta.id3TextFrames(tag(4, un24))) ==
      Seq(("TIT2", "ÿAÿ"), ("TPE1", "Q")),
      frames(BinaryMeta.id3TextFrames(tag(4, un24))).toString)
    // v2.4 GROUPING (0x40) + per-frame unsync (0x02) together: the
    // grouping byte is PART of the unsynchronised body (§4.1.4), so a
    // 0xFF grouping id ships as FF 00 on disk — de-unsync must run
    // FIRST, then the 1-byte skip. Logical body: [FF][enc 01][BOM FF
    // FE]["A" 41 00]; on-disk FF00 01 FF00FE 4100 (fsize 8). Skipping
    // the raw first byte instead mis-aligns everything by one.
    val grpUn24 = "54495432" + "00000008" + "0042" + "FF0001FF00FE4100"
    assert(frames(BinaryMeta.id3TextFrames(tag(4, grpUn24))) ==
      Seq(("TIT2", "A")),
      frames(BinaryMeta.id3TextFrames(tag(4, grpUn24))).toString)
    // v2.2 (3-byte ids, 3-byte big-endian sizes, no frame flags):
    // TT2 ISO text + TP1 UCS-2 text + padding stop
    def v22(framesHex: String, pad: Int = 0, flags: Int = 0): Array[Byte] = {
      val size = framesHex.length / 2 + pad
      hexB(f"494433 0200 $flags%02X 000000$size%02X" + framesHex + "00" * pad)
    }
    val f22 = "545432" + "000005" + "00" + "48693232" + // TT2 "Hi22"
      "545031" + "000007" + "01" + "FFFE41004200"       // TP1 UCS-2 "AB"
    assert(frames(BinaryMeta.id3TextFrames(v22(f22, pad = 4))) ==
      Seq(("TT2", "Hi22"), ("TP1", "AB")),
      frames(BinaryMeta.id3TextFrames(v22(f22, pad = 4))).toString)
    // v2.2 tag-level unsync: FF 00 -> FF over the tag body
    val f22u = "545432" + "000003" + "00" + "FF0041" // "ÿA" unsynced
    val un22 = v22(f22u, flags = 0x80)
    assert(frames(BinaryMeta.id3TextFrames(un22)) == Seq(("TT2", "ÿA")),
      frames(BinaryMeta.id3TextFrames(un22)).toString)
    // v2.2 compression tag flag (no defined scheme): whole tag declines
    assert(BinaryMeta.id3TextFrames(v22(f22, flags = 0x40)) == null)
    // empty v2.2 tag: nothing extractable; foreign null
    assert(BinaryMeta.id3TextFrames(hexB("494433 0200 00 00000000")) == null)
    assert(BinaryMeta.id3TextFrames("zzz".getBytes) == null)
    val full = tag(3, iso + mixed)
    for (c <- 0 until full.length) BinaryMeta.id3TextFrames(full.take(c))
  }

  test("mp4Meta: v0 and v1 boxes, largesize, audio-only tracks, " +
       "null contracts and truncation fuzz") {
    def be4(v: Long) = f"$v%08X"
    def box(typ: String, payloadHex: String): String = {
      val size = 8 + payloadHex.length / 2
      be4(size) + typ.getBytes.map(b => f"$b%02X").mkString + payloadHex
    }
    def hexB(s: String) = s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    val ftyp = box("ftyp", "69736F6D00000200")
    def mvhd0(tsc: Long, dur: Long) = box("mvhd",
      "00000000" + "00000000" + "00000000" + be4(tsc) + be4(dur) +
        "00010000" + "01000000" + "00000000" * 2 +
        "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 +
        "40000000" + "00000000" * 6 + "00000002")
    def tkhd0(w: Long, h: Long) = box("tkhd",
      "00000007" + "00000000" * 2 + "00000001" + "00000000" + be4(500) +
        "00000000" * 2 + "0000" * 4 +
        "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 +
        "40000000" + be4(w << 16) + be4(h << 16))
    val v0 = hexB(ftyp +
      box("moov", mvhd0(90000, 450000) + box("trak", tkhd0(640, 360))))
    val g0 = BinaryMeta.mp4Meta(v0)
    assert(g0 != null && g0.toSeq == Seq(90000L, 450000L, 640L, 360L), g0.toSeq)
    // v1 mvhd (64-bit times) + v1 tkhd
    val mvhd1 = box("mvhd",
      "01000000" + "00000000" * 4 + be4(1000) +
        be4(0) + be4(7000) + // duration u64 = 7000
        "00010000" + "01000000" + "00000000" * 2 +
        "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 +
        "40000000" + "00000000" * 6 + "00000002")
    val tkhd1 = box("tkhd",
      "01000007" + "00000000" * 4 + "00000001" + "00000000" +
        be4(0) + be4(7000) + // duration u64
        "00000000" * 2 + "0000" * 4 +
        "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 +
        "40000000" + be4(1920L << 16) + be4(1080L << 16))
    val v1 = hexB(ftyp + box("moov", mvhd1 + box("trak", tkhd1)))
    val g1 = BinaryMeta.mp4Meta(v1)
    assert(g1 != null && g1.toSeq == Seq(1000L, 7000L, 1920L, 1080L), g1.toSeq)
    // LARGESIZE moov (size=1 + 64-bit size); free box before it skipped
    val inner = mvhd0(600, 1200) + box("trak", tkhd0(0, 0)) // audio-only dims
    val large = hexB(ftyp + box("free", "AA" * 4) +
      "00000001" + "6D6F6F76" + be4(0) + be4(16 + inner.length / 2) + inner)
    val gl = BinaryMeta.mp4Meta(large)
    assert(gl != null && gl.toSeq == Seq(600L, 1200L, 0L, 0L), "largesize walk")
    // no moov -> null; foreign bytes -> null; truncation never throws
    assert(BinaryMeta.mp4Meta(hexB(ftyp + box("mdat", "00" * 8))) == null)
    assert(BinaryMeta.mp4Meta("not an mp4".getBytes) == null)
    assert(BinaryMeta.format(v0).toString == "mp4")
    for (cut <- 0 until v1.length) BinaryMeta.mp4Meta(v1.take(cut))
  }

  test("syntheticAvContainers round-trip: SQL-built MP3/ADTS/MP4 " +
       "payloads walk back through mp3Meta/adtsMeta/mp4Meta to the " +
       "constructing arithmetic") {
    import spark.implicits._
    val docs = (0L to 47L).toDF("doc_id")
    val rows = graft.llm.Multimodal.syntheticAvContainers(docs)
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val b = r.getAs[Array[Byte]](1)
      val k = id / 3
      (id % 3) match {
        case 0 =>
          val m = BinaryMeta.mp3Meta(b)
          assert(m != null, s"doc $id: mp3 null")
          val br = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
          assert(m.toSeq == Seq(
            Array(44100L, 48000L, 32000L)((k % 3).toInt),
            br((k % 14).toInt).toLong,
            if (k % 4 == 3) 1L else 2L,
            10L + k % 100 + 4), s"doc $id: ${m.toSeq}")
        case 1 =>
          val a = BinaryMeta.adtsMeta(b)
          assert(a != null, s"doc $id: aac null")
          val sr = Array(96000L, 88200L, 64000L, 48000L, 44100L, 32000L,
            24000L, 22050L, 16000L, 12000L, 11025L, 8000L)
          val cfg = k % 7 + 1
          assert(a.toSeq == Seq(sr((k % 12).toInt),
            if (cfg == 7) 8L else cfg, k % 4000 + 7, k % 4 + 1),
            s"doc $id: ${a.toSeq}")
        case _ =>
          val m4 = BinaryMeta.mp4Meta(b)
          assert(m4 != null, s"doc $id: mp4 null")
          assert(m4.toSeq == Seq(1000 + k % 9000, k % 100000 + 1000,
            k % 1920 + 1, k % 1080 + 1), s"doc $id: ${m4.toSeq}")
      }
    }
    // the gate's codegen'd column faces agree (non-null per format)
    val viaCol = graft.llm.Multimodal.syntheticAvContainers(docs)
      .select(col("doc_id"),
        coalesce(
          BinaryMeta.mp3MetaCol(col("payload")),
          BinaryMeta.adtsMetaCol(col("payload")),
          BinaryMeta.mp4MetaCol(col("payload"))).as("m"))
      .orderBy("doc_id").collect()
    viaCol.foreach { r => assert(!r.isNullAt(1), s"doc ${r.getLong(0)}") }
  }

  test("syntheticGifPixels round-trip: the SQL-built fixtures decode " +
       "through gifPixelStats AND the JDK ImageIO reader to the " +
       "constructing arithmetic") {
    import spark.implicits._
    val docs = (0L to 59L).toDF("doc_id")
    val fixtures = graft.llm.Multimodal.syntheticGifPixels(docs)
      .orderBy("doc_id").collect()
    fixtures.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val n = ((id % 5) + 2) * ((id % 3) + 2)
      val pix = Array.tabulate(n.toInt)(i => ((id * 7 + i * 13) % 128).toInt)
      val pal = Array.tabulate(128)(j =>
        ((j * 3 % 256) << 16) | (((j * 5 + 1) % 256) << 8) | ((j * 7 + 2) % 256))
      val want = expectStats(pal, pix)
      val got = BinaryMeta.gifPixelStats(bytes)
      assert(got != null && got.toSeq == want.toSeq, s"doc $id")
      assert(imageIoStats(bytes).toSeq == want.toSeq,
        s"doc $id: ImageIO rejects the SQL-built fixture")
    }
    // and the gate's codegen'd column face agrees
    val viaCol = graft.llm.Multimodal.syntheticGifPixels(docs)
      .select(col("doc_id"),
        BinaryMeta.gifPixelStatsCol(col("payload")).as("s"))
      .orderBy("doc_id").collect()
    viaCol.foreach { r => assert(!r.isNullAt(1), s"doc ${r.getLong(0)}") }
  }
}

/** Registers the extension functions on an existing session the way
  * spark.sql.extensions would at session build. */
class GraftExtensionsProbe {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    val reg = spark.sessionState.functionRegistry
    def in(name: String,
           b: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
             org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(classOf[graft.GraftExtensions].getName, name), b)
    in("media_format", es => BinaryMeta.MediaFormat(es.head))
    in("media_width", es => BinaryMeta.MediaWidth(es.head))
    in("wav_sample_rate", es => BinaryMeta.WavSampleRate(es.head))
  }
}
