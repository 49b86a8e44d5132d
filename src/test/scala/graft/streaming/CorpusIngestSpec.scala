package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Archive-ingest container routing: the ZIP/tar branch must be
  * decided by what PARSES, not by a byte-prefix guess. Two adversarial
  * shapes: a tar whose first member name starts with "PK" (PKGBUILD at
  * archive root — a real Arch-package layout) and a prefixed
  * self-extracting-style ZIP whose offsets are absolute (the layout
  * zipEntries' backward EOCD scan supports) but whose payload does not
  * start with the PK magic. */
class CorpusIngestSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // minimal ustar writer (mirrors ArchiveSpec's)
  private def tarHeader(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    name.getBytes.copyToArray(h, 0)
    "0000644".getBytes.copyToArray(h, 100)
    "0000000".getBytes.copyToArray(h, 108)
    "0000000".getBytes.copyToArray(h, 116)
    f"$size%011o".getBytes.copyToArray(h, 124)
    "00000000000".getBytes.copyToArray(h, 136)
    h(156) = '0'.toByte
    "ustar".getBytes.copyToArray(h, 257); h(263) = '0'; h(264) = '0'
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xFF).sum
    f"$sum%06o".getBytes.copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    h
  }

  private def pad512(d: Array[Byte]): Array[Byte] =
    d ++ new Array[Byte](((d.length + 511) / 512) * 512 - d.length)

  /** Stored-method ZIP with `prefix` bytes before the first local
    * header; all offsets absolute (how real prefixed ZIPs are built). */
  private def prefixedZip(prefix: Array[Byte],
                          entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    def le(v: Long, n: Int) =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    def crc(d: Array[Byte]) = {
      val c = new java.util.zip.CRC32(); c.update(d); c.getValue
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Array[Byte]): Unit = bos.write(b)
    w(prefix)
    val locals = entries.map { case (name, data) =>
      val off = bos.size()
      w(Array[Byte](0x50, 0x4B, 3, 4)); w(le(20, 2)); w(le(0, 2))
      w(le(0, 2)); w(le(0, 4)); w(le(crc(data), 4))
      w(le(data.length, 4)); w(le(data.length, 4))
      w(le(name.length, 2)); w(le(0, 2))
      w(name.getBytes); w(data)
      off
    }
    val cdStart = bos.size()
    entries.zip(locals).foreach { case ((name, data), off) =>
      w(Array[Byte](0x50, 0x4B, 1, 2)); w(le(20, 2)); w(le(20, 2))
      w(le(0, 2)); w(le(0, 2)); w(le(0, 4)); w(le(crc(data), 4))
      w(le(data.length, 4)); w(le(data.length, 4))
      w(le(name.length, 2)); w(le(0, 2)); w(le(0, 2))
      w(le(0, 2)); w(le(0, 2)); w(le(0, 4)); w(le(off, 4))
      w(name.getBytes)
    }
    val cdSize = bos.size() - cdStart
    w(Array[Byte](0x50, 0x4B, 5, 6)); w(le(0, 2)); w(le(0, 2))
    w(le(entries.size, 2)); w(le(entries.size, 2))
    w(le(cdSize, 4)); w(le(cdStart, 4)); w(le(0, 2))
    bos.toByteArray
  }

  test("routing by what parses: PKGBUILD-first tar is NOT a zip; a " +
       "non-PK-prefixed absolute-offset zip is NOT a tar") {
    import spark.implicits._
    val dir = tmp("arch_route")
    val tarBody = "pkgname=graft tar body".getBytes
    val pkTar = tarHeader("PKGBUILD", tarBody.length) ++ pad512(tarBody) ++
      new Array[Byte](1024)
    assert(pkTar(0) == 'P' && pkTar(1) == 'K',
      "fixture really starts with PK")
    val sfx = prefixedZip("#!/bin/sh\nexit 0\n".getBytes,
      Seq("inner.txt" -> "zip body behind a prefix".getBytes))
    assert(!(sfx(0) == 'P' && sfx(1) == 'K'),
      "fixture really lacks the PK prefix")
    val batch = Seq((1L, pkTar), (2L, sfx)).toDF("doc_id", "payload")
    CorpusIngest.archiveIngestBatch(dir)(batch, 0L)
    val got = spark.read.parquet(s"$dir/docs")
      .select($"doc_id", $"name", $"text")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "PKGBUILD", "pkgname=graft tar body"),
      (2L, "inner.txt", "zip body behind a prefix")), got.toString)
  }
}
