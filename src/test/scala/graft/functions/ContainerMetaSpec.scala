package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** ContainerMeta variants the SQL fixtures don't reach: VP8X extended
  * canvases, big-endian and LONG-typed TIFFs, Vorbis id headers,
  * multi-page Ogg streams, CRC rejection, truncation totality. */
class ContainerMetaSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
  private def be(v: Long, n: Int): Array[Byte] = le(v, n).reverse

  test("WebP VP8X extended canvas; stray chunks before the bitstream " +
       "are skipped") {
    val vp8x = "RIFF".getBytes ++ le(4 + 8 + 10 + 8 + 6, 4) ++
      "WEBP".getBytes ++
      "VP8X".getBytes ++ le(10, 4) ++
      bytes(0x10, 0, 0, 0) ++ le(799, 3) ++ le(599, 3) ++ // alpha flag, w-1, h-1
      "EXIF".getBytes ++ le(6, 4) ++ "exif!!".getBytes
    assert(ContainerMeta.webpMeta(vp8x).toSeq == Seq(800L, 600L, 0L, 1L))
    // ICCP chunk before VP8L: the walk skips to the bitstream chunk
    val withIccp = "RIFF".getBytes ++ le(4 + 8 + 4 + 8 + 6, 4) ++
      "WEBP".getBytes ++
      "ICCP".getBytes ++ le(4, 4) ++ "prof".getBytes ++
      "VP8L".getBytes ++ le(5, 4) ++ bytes(0x2F) ++
      le((31L) | (17L << 14), 4) ++ bytes(0)
    assert(ContainerMeta.webpMeta(withIccp).toSeq == Seq(32L, 18L, 1L, 0L))
  }

  test("TIFF: big-endian (MM) and LONG-typed dims both read") {
    def entryBe(tag: Int, typ: Int, v: Long): Array[Byte] =
      be(tag, 2) ++ be(typ, 2) ++ be(1, 4) ++
        (if (typ == 3) be(v, 2) ++ be(0, 2) else be(v, 4))
    val mm = "MM".getBytes ++ be(42, 2) ++ be(8, 4) ++
      be(3, 2) ++ entryBe(256, 4, 70000) ++ entryBe(257, 4, 45000) ++
      entryBe(259, 3, 5) ++ be(0, 4)
    assert(ContainerMeta.tiffMeta(mm).toSeq == Seq(70000L, 45000L, 1L, 5L))
  }

  test("Ogg Vorbis id header and a three-page stream: the LAST page's " +
       "granule wins; a second stream's serial is ignored") {
    def crc(d: Array[Byte]): Long = {
      var c = 0L
      for (x <- d) {
        var t = ((c >> 24) ^ (x & 0xFF)) & 0xFF
        var v = t << 24
        for (_ <- 0 until 8)
          v = if ((v & 0x80000000L) != 0) ((v << 1) ^ 0x04C11DB7L) & 0xFFFFFFFFL
              else (v << 1) & 0xFFFFFFFFL
        c = ((c << 8) & 0xFFFFFFFFL) ^ v
      }
      c
    }
    def page(flags: Int, gran: Long, serial: Long, seq: Long,
             body: Array[Byte]): Array[Byte] = {
      val noCrc = "OggS".getBytes ++ bytes(0, flags) ++ le(gran, 8) ++
        le(serial, 4) ++ le(seq, 4) ++ le(0, 4) ++
        bytes(1, body.length) ++ body
      val c = crc(noCrc)
      noCrc.take(22) ++ le(c, 4) ++ noCrc.drop(26)
    }
    val vorbisId = bytes(0x01) ++ "vorbis".getBytes ++ le(0, 4) ++
      bytes(2) ++ le(44100, 4) ++ le(0, 12) ++ bytes(0xB8, 0x01)
    val ogg = page(0x02, 0, 9, 0, vorbisId) ++
      page(0x00, 44100, 9, 1, bytes(0x41)) ++
      page(0x04, 88200, 9, 2, bytes(0x42)) ++
      page(0x02, 999999, 77, 0, bytes(0x43)) // foreign serial
    assert(ContainerMeta.oggMeta(ogg).toSeq == Seq(1L, 2L, 44100L, 88200L))
  }

  test("Ogg: a corrupted page CRC rejects the stream") {
    // reuse the SQL-fixture shape via a driver-side replica
    val opusHead = "OpusHead".getBytes ++ bytes(1, 2) ++ le(312, 2) ++
      le(48000, 4) ++ bytes(0, 0, 0)
    def rawPage(flags: Int, gran: Long, body: Array[Byte]): Array[Byte] =
      "OggS".getBytes ++ bytes(0, flags) ++ le(gran, 8) ++ le(7, 4) ++
        le(0, 4) ++ le(0, 4) ++ bytes(1, body.length) ++ body
    val p = rawPage(0x02, 0, opusHead) // crc field left zero = wrong
    assert(ContainerMeta.oggMeta(p) == null)
  }

  test("truncation at every byte: all three are total and null") {
    val seeds = Seq(
      "RIFF".getBytes ++ le(22, 4) ++ "WEBP".getBytes ++
        "VP8 ".getBytes ++ le(10, 4) ++ bytes(0, 0, 0, 0x9D, 0x01, 0x2A) ++
        le(100, 2) ++ le(60, 2),
      "II".getBytes ++ le(42, 2) ++ le(8, 4) ++ le(2, 2) ++
        le(256, 2) ++ le(3, 2) ++ le(1, 4) ++ le(9, 2) ++ le(0, 2) ++
        le(257, 2) ++ le(3, 2) ++ le(1, 4) ++ le(7, 2) ++ le(0, 2) ++
        le(0, 4))
    for (s <- seeds; cut <- 0 until s.length) {
      ContainerMeta.webpMeta(s.take(cut))
      ContainerMeta.tiffMeta(s.take(cut))
      ContainerMeta.oggMeta(s.take(cut))
    }
    assert(ContainerMeta.webpMeta(seeds.head).toSeq == Seq(100L, 60L, 0L, 0L))
    assert(ContainerMeta.tiffMeta(seeds(1)).toSeq == Seq(9L, 7L, 1L, 1L))
  }
}
