package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz harness for the media decoders' TOTAL-function contract: on a
  * crawl every byte string occurs, so `null, never throw` must hold
  * not just for the curated malformed cases but under adversarial
  * noise. Two generators, both seeded (deterministic CI):
  *   - pure random blobs of random lengths (hostile garbage);
  *   - VALID container fixtures with k random byte mutations — the
  *     nastier class, where magic numbers and structure survive but
  *     lengths/offsets/code streams lie.
  * No Spark session needed — the static parsers are the surface the
  * codegen'd expressions dispatch to. */
class DecoderFuzzSpec extends AnyFunSuite {

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "format" -> (BinaryMeta.format(_)),
    "width" -> (BinaryMeta.width(_)),
    "height" -> (BinaryMeta.height(_)),
    "wavSampleRate" -> (BinaryMeta.wavSampleRate(_)),
    "wavChannels" -> (BinaryMeta.wavChannels(_)),
    "wavPcmStats" -> (BinaryMeta.wavPcmStats(_)),
    "wavG711Stats" -> (BinaryMeta.wavG711Stats(_)),
    "bmp24Stats" -> (BinaryMeta.bmp24Stats(_)),
    "gifPixelStats" -> (BinaryMeta.gifPixelStats(_)),
    "pngPixelStats" -> (BinaryMeta.pngPixelStats(_)),
    "jpegPixelStats" -> (JpegBaseline.jpegPixelStats(_)),
    "dhash64" -> (BinaryMeta.dhash64(_)))

  private def assertTotal(name: String, fn: Array[Byte] => Any,
                          input: Array[Byte], what: String): Unit =
    try fn(input)
    catch {
      case e: Throwable =>
        fail(s"$name threw ${e.getClass.getSimpleName} on $what " +
          s"(len=${input.length}): ${e.getMessage}")
    }

  test("random blobs: every decoder is total over hostile garbage") {
    val rnd = new scala.util.Random(31337)
    for (trial <- 1 to 400) {
      val len = rnd.nextInt(600)
      val blob = new Array[Byte](len)
      rnd.nextBytes(blob)
      // half the trials get a real magic number grafted on, so the
      // parser walks past the signature into the garbage
      if (trial % 2 == 0 && len >= 12) {
        val magic = (trial / 2) % 5 match {
          case 0 => Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
          case 1 => "GIF89a".getBytes
          case 2 => Array(0xff, 0xd8, 0xff).map(_.toByte)
          case 3 => "RIFFxxxxWAVE".getBytes
          case _ => "BM".getBytes
        }
        System.arraycopy(magic, 0, blob, 0, math.min(magic.length, len))
      }
      for ((name, fn) <- decoders)
        assertTotal(name, fn, blob, s"random blob trial $trial")
    }
  }

  test("mutated valid containers: magic survives, structure lies — " +
       "still total") {
    val rnd = new scala.util.Random(4242)
    // valid seeds built without Spark: a real PNG + JPEG via ImageIO,
    // a GIF + WAVs byte-by-byte
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 24)
      img.getRaster.setSample(x, y, 0, (x * y * 7) % 256)
    def write(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def hexBytes(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    val seeds: Seq[Array[Byte]] = Seq(
      write("png"), write("jpeg"), write("gif"), write("bmp"),
      hexBytes("52494646 28000000 57415645" +
        "666D7420 10000000 0700 0100 401F0000 401F0000 0100 0800" +
        "64617461 04000000 8000FFAA"),
      hexBytes("52494646 2E000000 57415645" +
        "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        "64617461 0A000000 0000 E803 18FC FF7F 0080"))
    for (seed <- seeds; trial <- 1 to 120) {
      val mutated = seed.clone()
      val k = 1 + rnd.nextInt(6)
      for (_ <- 1 to k)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      for ((name, fn) <- decoders)
        assertTotal(name, fn, mutated, s"mutation trial $trial")
      // truncation of the mutant too
      val cut = mutated.take(rnd.nextInt(mutated.length + 1))
      for ((name, fn) <- decoders)
        assertTotal(name, fn, cut, s"truncated mutant trial $trial")
    }
  }
}
