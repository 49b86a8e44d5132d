package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Archive walk against INDEPENDENT implementations: ZIP streams are
  * written by the JDK's own ZipOutputStream (deflate and stored —
  * real encoder-chosen layouts, data descriptors and all) and the
  * fixture shape is read back by ZipInputStream; tar streams come
  * from a spec-side ustar builder exercising what the SQL fixture
  * cannot (GNU longnames, pax skips, V7 headers, signed checksums,
  * prefix joins, non-file types). Totality is DecoderFuzzSpec's job;
  * this file pins semantics. */
class ArchiveSpec extends AnyFunSuite {

  private def rows(a: org.apache.spark.sql.catalyst.util.ArrayData)
      : Seq[(String, Int, Long, Array[Byte])] =
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getBinary(3))
    }

  private def tarRows(a: org.apache.spark.sql.catalyst.util.ArrayData)
      : Seq[(String, String, Long, Array[Byte])] =
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
        r.getLong(2), if (r.isNullAt(3)) null else r.getBinary(3))
    }

  private def jdkZip(entries: Seq[(String, Array[Byte])],
                     stored: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    for ((name, data) <- entries) {
      val e = new java.util.zip.ZipEntry(name)
      if (stored) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(data.length)
        val c = new java.util.zip.CRC32(); c.update(data)
        e.setCrc(c.getValue)
      }
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("JDK-written ZIPs (deflate AND stored) round-trip: names, " +
       "sizes, bytes") {
    val entries = Seq(
      "docs/one.txt" -> ("alpha " * 200).getBytes,
      "two.bin" -> Array.tabulate[Byte](4096)(i => (i * 31).toByte),
      "empty.txt" -> Array.empty[Byte])
    for (stored <- Seq(false, true)) {
      val got = rows(Archive.zipEntries(jdkZip(entries, stored)))
      assert(got.map(_._1) == entries.map(_._1), s"stored=$stored")
      assert(got.map(_._3) == entries.map(_._2.length.toLong))
      for (((_, _, _, data), (_, want)) <- got.zip(entries))
        assert(java.util.Arrays.equals(data, want), s"stored=$stored")
      val method = if (stored) 0 else 8
      assert(got.forall(_._2 == method))
    }
  }

  test("UTF-8 names survive (flag bit 11 — the JDK sets it)") {
    val got = rows(Archive.zipEntries(jdkZip(Seq(
      "héllo/wörld.txt" -> "x".getBytes))))
    assert(got.map(_._1) == Seq("héllo/wörld.txt"))
  }

  test("a corrupted entry nulls its data but keeps the listing; the " +
       "sibling entry still extracts") {
    val zip = jdkZip(Seq("a.txt" -> ("payload-a" * 50).getBytes,
      "b.txt" -> "payload-b".getBytes))
    // flip one byte inside a's deflate stream (local header of a is
    // first; data starts past 30 + name; keep clear of b's region)
    val bad = zip.clone()
    bad(40) = (bad(40) ^ 0x55).toByte
    val got = rows(Archive.zipEntries(bad))
    assert(got.size == 2)
    assert(got(0)._4 == null, "corrupt entry must null its data")
    assert(new String(got(1)._4) == "payload-b", "sibling unaffected")
  }

  test("the SQL fixture shape is read by the JDK's own ZipInputStream") {
    // driver-side replica of Multimodal.syntheticZip for doc 37
    val docId = 37L
    def content(k: Int) = Array.tabulate[Byte](16)(j =>
      (97 + (docId * 7 + k * 13 + j * 3) % 26).toByte)
    def le(v: Long, n: Int) =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    def crc(d: Array[Byte]) = {
      val c = new java.util.zip.CRC32(); c.update(d); c.getValue
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Array[Byte]): Unit = bos.write(b)
    for (k <- 0 to 1) {
      w(Array[Byte](0x50, 0x4B, 3, 4)); w(le(20, 2)); w(le(0, 2))
      w(le(0, 2)); w(le(0, 4)); w(le(crc(content(k)), 4))
      w(le(16, 4)); w(le(16, 4)); w(le(6, 2)); w(le(0, 2))
      w(s"f$k.txt".getBytes); w(content(k))
    }
    for (k <- 0 to 1) {
      w(Array[Byte](0x50, 0x4B, 1, 2)); w(le(20, 2)); w(le(20, 2))
      w(le(0, 2)); w(le(0, 2)); w(le(0, 4)); w(le(crc(content(k)), 4))
      w(le(16, 4)); w(le(16, 4)); w(le(6, 2)); w(le(0, 2)); w(le(0, 2))
      w(le(0, 2)); w(le(0, 2)); w(le(0, 4)); w(le(k * 52, 4))
      w(s"f$k.txt".getBytes)
    }
    w(Array[Byte](0x50, 0x4B, 5, 6)); w(le(0, 2)); w(le(0, 2))
    w(le(2, 2)); w(le(2, 2)); w(le(104, 4)); w(le(104, 4)); w(le(0, 2))
    val fixture = bos.toByteArray
    // independent reader: the JDK accepts the stream
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(fixture))
    val jdkNames = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toList
    assert(jdkNames == List("f0.txt", "f1.txt"))
    // our walker agrees byte-for-byte
    val got = rows(Archive.zipEntries(fixture))
    assert(got.map(_._1) == Seq("f0.txt", "f1.txt"))
    for ((r, k) <- got.zipWithIndex)
      assert(java.util.Arrays.equals(r._4, content(k)))
  }

  // ---- tar ----

  private def tarHeader(name: String, size: Long, tf: Char,
                        magic: Boolean = true, prefix: String = "",
                        signedSum: Boolean = false): Array[Byte] = {
    val h = new Array[Byte](512)
    name.getBytes.copyToArray(h, 0)
    "0000644".getBytes.copyToArray(h, 100)
    "0000000".getBytes.copyToArray(h, 108)
    "0000000".getBytes.copyToArray(h, 116)
    f"$size%011o".getBytes.copyToArray(h, 124)
    "00000000000".getBytes.copyToArray(h, 136)
    h(156) = tf.toByte
    if (magic) {
      "ustar".getBytes.copyToArray(h, 257); h(263) = '0'; h(264) = '0'
      prefix.getBytes.copyToArray(h, 345)
    }
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = if (signedSum) h.map(_.toInt).sum else h.map(_ & 0xFF).sum
    f"$sum%06o".getBytes.copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    h
  }

  private def pad512(d: Array[Byte]): Array[Byte] =
    d ++ new Array[Byte](((d.length + 511) / 512) * 512 - d.length)

  private def tarOf(parts: Array[Byte]*): Array[Byte] =
    parts.reduce(_ ++ _) ++ new Array[Byte](1024)

  test("ustar walk: files, dirs, prefix joins; V7 headers (no magic) " +
       "and historic signed checksums still verify") {
    val body = "sixteen bytes ok".getBytes
    val t = tarOf(
      tarHeader("d/", 0, '5'),
      tarHeader("f.txt", body.length, '0'), pad512(body),
      tarHeader("deep.txt", body.length, '0',
        prefix = "very/long/dir/chain"), pad512(body),
      tarHeader("v7.txt", body.length, '0', magic = false), pad512(body),
      tarHeader("sg.txt", body.length, '0', signedSum = true), pad512(body))
    val got = tarRows(Archive.tarEntries(t))
    assert(got.map(_._1) == Seq("d/", "f.txt",
      "very/long/dir/chain/deep.txt", "v7.txt", "sg.txt"), got.map(_._1))
    assert(got.head._4 == null && got.head._2 == "5")
    assert(got.tail.forall(r => new String(r._4) == "sixteen bytes ok"))
  }

  test("GNU 'L' longname applies to the next entry; pax 'x'/'g' " +
       "records are skipped, not listed") {
    val body = "b".getBytes
    val long = ("dir/" * 40) + "leaf.txt" // 168 chars — over the 100 field
    val t = tarOf(
      tarHeader("ignored", long.length, 'L'), pad512(long.getBytes),
      tarHeader("short.txt", body.length, '0'), pad512(body),
      tarHeader("pax", 20, 'x'), pad512(("20 path=nope/ignored\n").getBytes),
      tarHeader("after.txt", body.length, '0'), pad512(body))
    val got = tarRows(Archive.tarEntries(t))
    assert(got.map(_._1) == Seq(long, "after.txt"), got.map(_._1))
  }

  test("a corrupted checksum rejects the archive (null)") {
    val body = "x".getBytes
    val t = tarOf(tarHeader("a.txt", 1, '0'), pad512(body))
    val bad = t.clone(); bad(150) = '7'
    assert(Archive.tarEntries(bad) == null)
  }

  test("zip: truncation at every byte and EOCD-less tails are total") {
    val zip = jdkZip(Seq("a.txt" -> ("abc" * 100).getBytes))
    for (cut <- 0 until zip.length)
      Archive.zipEntries(zip.take(cut)) // must not throw
    assert(Archive.zipEntries("PKjunk".getBytes) == null)
  }

  test("tar: truncation at every 16th byte is total") {
    val body = ("y" * 700).getBytes
    val t = tarOf(tarHeader("a.txt", body.length, '0'), pad512(body))
    for (cut <- 0 until t.length by 16)
      Archive.tarEntries(t.take(cut)) // must not throw
  }
}
