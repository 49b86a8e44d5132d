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
