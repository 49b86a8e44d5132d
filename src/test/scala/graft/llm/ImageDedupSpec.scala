package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.BinaryMeta

/** Perceptual image dedup: the dHash expression's cross-format and
  * robustness laws, and the banded near-dup operator against a direct
  * quadratic hamming oracle. */
class ImageDedupSpec extends SparkSpec {

  private def img(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, f(x, y))
    im
  }
  private def encode(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }
  private def hash(b: Array[Byte]): Long = {
    val a = BinaryMeta.dhash64(b)
    assert(a != null, "dhash returned null")
    a(0)
  }
  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dhash: PNG and BMP encodings of the SAME pixels hash " +
       "identically; JPEG re-encode stays within a few bits; a " +
       "different image is far away") {
    val rnd = new scala.util.Random(55)
    val base = img(72, 48)((x, y) =>
      ((x * 3 % 256) << 16) | ((y * 5 % 256) << 8) | ((x + y) % 256))
    val hPng = hash(encode(base, "png"))
    val hBmp = hash(encode(base, "bmp"))
    assert(hPng == hBmp,
      f"lossless re-encode must be hash-invariant: $hPng%016x vs $hBmp%016x")
    // GIF re-encode: the writer palettizes (<= 256 colors), so allow a
    // few gradient-sign flips; a gray-ramp image (palette-exact) must
    // hash close to its PNG twin
    val gifH = hash(encode(base, "gif"))
    assert(hamming(hPng, gifH) <= 8,
      s"GIF palettization moved ${hamming(hPng, gifH)} bits (> 8)")
    // JPEG at high quality: small hamming, not zero-cost identical
    val jb = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      // grayscale render of the same pixels (color JPEG declines)
      val g = new java.awt.image.BufferedImage(72, 48,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      g.getGraphics.drawImage(base, 0, 0, null)
      writer.write(null, new javax.imageio.IIOImage(g, null, null), p)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val gPng = {
      val g = new java.awt.image.BufferedImage(72, 48,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      g.getGraphics.drawImage(base, 0, 0, null)
      encode(g, "png")
    }
    val dJpeg = hamming(hash(jb), hash(gPng))
    assert(dJpeg <= 8, s"q95 JPEG re-encode moved $dJpeg bits (> 8)")
    // an unrelated image: far in hamming
    val other = img(72, 48)((x, y) => rnd.nextInt(1 << 24))
    assert(hamming(hPng, hash(encode(other, "png"))) >= 16)
    // too-small and undecodable: null
    assert(BinaryMeta.dhash64(encode(img(8, 8)((_, _) => 0), "png")) == null)
    assert(BinaryMeta.dhash64("garbage".getBytes) == null)
  }

  test("imageNearDupPairs equals the quadratic hamming oracle on a " +
       "planted corpus; plan is a banded equi-join, no cartesian") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // 30 base images; for each a twin with one pixel-block tweaked
    // (small hamming) and decoys far away
    val payloads: Seq[(Long, Array[Byte])] = (0 until 30).flatMap { k =>
      def px(seed: Int)(x: Int, y: Int): Int = {
        val v = (k * 31 + x * 7 + y * 13 + seed) % 200 + 20
        (v << 16) | ((v * 3 % 200 + 20) << 8) | (v * 7 % 200 + 20)
      }
      val base = img(36, 24)(px(0))
      val twin = img(36, 24) { (x, y) =>
        if (x < 4 && y < 3) px(0)(x, y) ^ 0x060606 else px(0)(x, y)
      }
      Seq((2L * k, encode(base, "png")), (2L * k + 1, encode(twin, "bmp")))
    }
    val df = payloads.toDF("doc_id", "payload")
    val got = Dedup.imageNearDupPairs(df, "doc_id", "payload", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // quadratic oracle straight off the hashes
    val hs = payloads.map { case (id, b) => id -> hash(b) }
    val want = (for {
      (i1, h1) <- hs; (i2, h2) <- hs
      if i1 < i2 && hamming(h1, h2) <= 3
    } yield (i1, i2, hamming(h1, h2).toLong)).toSet
    assert(got == want,
      s"got ${got.size} want ${want.size}\nmissing ${want -- got}\nextra ${got -- want}")
    assert(want.nonEmpty, "planted twins must produce at least one pair")
    // every planted twin pair that IS within 3 bits must be present
    val twins = want.filter(p => p._1 + 1 == p._2 && p._1 % 2 == 0)
    assert(twins.nonEmpty, "no twin survived within 3 bits — fixture too hot")
    val plan = Dedup.imageNearDupPairs(df, "doc_id", "payload")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banded equi-join required:\n$plan")
  }

  test("pngGray agrees with pngPixelStats on channel sums (the " +
       "positioned decode is the same machinery); BMP orientation is " +
       "decoded bottom-up correctly") {
    val im = img(20, 15)((x, y) => ((x * 11 % 256) << 16) |
      ((y * 17 % 256) << 8) | ((x * y) % 256))
    val png = encode(im, "png")
    val g = BinaryMeta.grayPixels(png)
    assert(g != null && g._1 == 20 && g._2 == 15)
    // positioned luma pixel (3,4) must equal the direct computation
    val rgb = im.getRGB(3, 4)
    val want = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
      114 * (rgb & 0xff)) / 1000
    assert(g._3(4 * 20 + 3) == want)
    // BMP (bottom-up file order) must yield the SAME positioned plane
    val bmp = encode(im, "bmp")
    val gb = BinaryMeta.grayPixels(bmp)
    assert(gb != null && gb._3.sameElements(g._3),
      "BMP bottom-up decode disagrees with PNG top-down decode")
  }

  test("syntheticBmpImages round-trip: fixture decodes to the " +
       "constructing arithmetic through dhash AND the JDK ImageIO " +
       "BMP reader") {
    import spark.implicits._
    val docs = (0L to 19L).toDF("doc_id")
    val rows = graft.llm.Multimodal.syntheticBmpImages(docs)
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val g = BinaryMeta.grayPixels(bytes)
      assert(g != null && g._1 == 9 && g._2 == 8, s"doc $id")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 9 && img.getHeight == 8, s"doc $id")
      for (y <- 0 until 8; x <- 0 until 9) {
        val k = id / 2; val p = id % 2
        val rr = ((k * 7 + x * 13 + y * 29) % 200 + 20).toInt
        val gg = ((k * 11 + x * 3 + y * 17) % 200 + 20).toInt
        val bb = ((k * 5 + x * 19 + y * 7) % 200 + 20 + p).toInt
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == rr && ((rgb >> 8) & 0xff) == gg &&
          (rgb & 0xff) == bb, s"doc $id ($x,$y): ImageIO pixel mismatch")
        assert(g._3(y * 9 + x) == (299 * rr + 587 * gg + 114 * bb) / 1000,
          s"doc $id ($x,$y): luma mismatch")
      }
    }
  }
}
