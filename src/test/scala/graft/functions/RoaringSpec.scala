package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** DeletionVectors' roaring decoder against the REAL org.roaringbitmap
  * implementation Spark bundles (the interoperable "portable" format),
  * plus the RFC 1924 base85 vector from the RFC itself and the DV-file
  * framing contract. */
class RoaringSpec extends AnyFunSuite {

  private def portable(rb: org.roaringbitmap.RoaringBitmap): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    rb.serialize(new java.io.DataOutputStream(out))
    out.toByteArray
  }

  private def arrayBlob(bitmaps: Seq[org.roaringbitmap.RoaringBitmap])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(k => out.write((v >>> (8 * k)) & 0xff))
    le32(DeletionVectors.PortableMagic)
    le32(bitmaps.length); le32(0) // 8-byte LE count
    bitmaps.foreach(rb => out.write(portable(rb)))
    out.toByteArray
  }

  private def rb(values: Seq[Int],
                 runOptimize: Boolean = false): org.roaringbitmap.RoaringBitmap = {
    val r = new org.roaringbitmap.RoaringBitmap()
    values.foreach(r.add)
    if (runOptimize) r.runOptimize()
    r
  }

  test("array / bitmap / run containers decode exactly vs real roaring") {
    val sparse = (0 until 1000).map(i => i * 37 + (i % 7)) // array
    val dense = (0 until 30000).map(i => i * 2) // >4096 per key → bitmap
    val runs = (100 to 5000) ++ (70000 to 90000) // contiguous → runs
    val mixed = sparse ++ dense.map(_ + 200000) ++ runs.map(_ + 1000000)
    Seq(
      rb(sparse), rb(dense), rb(runs, runOptimize = true),
      rb(mixed, runOptimize = true), rb(Seq(0)), rb(Seq(65535, 65536)),
      rb((0 until 70000).toSeq, runOptimize = true)).foreach { r =>
      val want = r.toArray.map(_.toLong & 0xffffffffL).sorted
      val got = DeletionVectors.decodeBitmapArray(arrayBlob(Seq(r)))
      assert(got.length === want.length)
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("multi-bitmap arrays carry the 32-bit key as high bits") {
    val lo = rb(Seq(1, 5, 100000), runOptimize = true)
    val hi = rb(Seq(0, 7))
    val got = DeletionVectors.decodeBitmapArray(arrayBlob(Seq(lo, hi)))
    val want = Array(1L, 5L, 100000L, (1L << 32) | 0L, (1L << 32) | 7L)
    assert(java.util.Arrays.equals(got, want.sorted))
  }

  test("base85: 4-byte-block decode with the RFC 1924 alphabet") {
    // Delta's codec is BLOCK-based (4 bytes ↔ 5 chars, big-endian per
    // block) over the RFC 1924 character set — unlike the RFC's own
    // whole-number example. Hand-computed vectors pin the alphabet
    // (index 1 = '1', 36 = 'a', 47 = 'l'): 1*85 + 47 = 132 = 0x84.
    assert(DeletionVectors.base85Decode("00000").toSeq ===
      Seq[Byte](0, 0, 0, 0))
    assert(DeletionVectors.base85Decode("0001l").toSeq ===
      Seq[Byte](0, 0, 0, 0x84.toByte))
    // round-trip against an independent in-test encoder
    val alpha = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
    def encode(b: Array[Byte]): String =
      b.grouped(4).map { g =>
        var v = 0L
        g.foreach(x => v = (v << 8) | (x & 0xffL))
        (4 to 0 by -1).map(k =>
          alpha(((v / math.pow(85, k).toLong) % 85).toInt)).mkString
      }.mkString
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val bytes = Array.fill(16)(rnd.nextInt(256).toByte)
      assert(DeletionVectors.base85Decode(encode(bytes)).toSeq ===
        bytes.toSeq)
    }
    // uuid face formats canonically
    val uuidBytes = Array[Byte](0x10, 0x80.toByte, 0, 0, 0, 0, 0, 0,
      0, 8, 0x08, 0x00, 0x20, 0x0C, 0x41, 0x7A)
    assert(DeletionVectors.uuidFromBase85(encode(uuidBytes)) ===
      "10800000-0000-0000-0008-0800200c417a")
    intercept[IllegalArgumentException] {
      DeletionVectors.base85Decode("abcd") // not a 5-multiple
    }
    intercept[IllegalArgumentException] {
      DeletionVectors.base85Decode("~~~~~") // block overflows 32 bits
    }
  }

  test("DV file framing: version byte, BE length, CRC; mismatches raise") {
    val data = arrayBlob(Seq(rb(Seq(3, 4, 5), runOptimize = true)))
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // format version
    out.write(Array[Byte](9, 9)) // padding: DVs sit at arbitrary offsets
    def be32(v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >>> (8 * k)) & 0xff).toInt))
    be32(data.length.toLong)
    out.write(data)
    be32(crc.getValue)
    val file = out.toByteArray
    val got = DeletionVectors.decodeFromFile(file, 3, data.length)
    assert(got.toSeq === Seq(3L, 4L, 5L))
    // wrong size, corrupt byte, bad version: all loud
    intercept[IllegalArgumentException] {
      DeletionVectors.decodeFromFile(file, 3, data.length + 1)
    }
    val bad = file.clone(); bad(10) = (bad(10) ^ 0x55).toByte
    intercept[IllegalArgumentException] {
      DeletionVectors.decodeFromFile(bad, 3, data.length)
    }
    val v2 = file.clone(); v2(0) = 2
    intercept[IllegalArgumentException] {
      DeletionVectors.decodeFromFile(v2, 3, data.length)
    }
    intercept[IllegalArgumentException] {
      DeletionVectors.decodeBitmapArray(data.dropRight(1))
    }
  }
}
