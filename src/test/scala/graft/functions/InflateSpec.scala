package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.util.zip.Deflater

/** Inflate against real java.util.zip.Deflater output — every
  * compression level and strategy, raw and zlib framings — plus
  * hand-built block edges and totality fuzz. */
class InflateSpec extends AnyFunSuite {

  private def sample(seed: Long, n: Int): Array[Byte] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if ((next() & 3) == 0 && i > 128) {
        val off = ((next() >>> 33) % i).toInt
        val len = math.min(16 + ((next() >>> 40) % 200).toInt,
          math.min(n - i, i - off)).max(1)
        System.arraycopy(out, off, out, i, len)
        i += len
      } else { out(i) = ((next() >>> 41) % 250).toByte; i += 1 }
    }
    out
  }

  private def deflate(data: Array[Byte], level: Int, strategy: Int,
                      nowrap: Boolean): Array[Byte] = {
    val d = new Deflater(level, nowrap)
    d.setStrategy(strategy)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](65536)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while (!d.finished()) {
      val n = d.deflate(buf)
      out ++= buf.take(n)
    }
    d.end()
    out.toArray
  }

  test("raw: round-trips Deflater output at all levels and strategies") {
    for {
      n <- Seq(0, 1, 100, 40000, 200000)
      level <- Seq(0, 1, 6, 9) // 0 = stored blocks, others = huffman
      strategy <- Seq(Deflater.DEFAULT_STRATEGY, Deflater.FILTERED,
        Deflater.HUFFMAN_ONLY)
    } {
      val data = sample(n + level * 7L + strategy, n)
      val comp = deflate(data, level, strategy, nowrap = true)
      val got = Inflate.raw(comp)
      assert(got != null, s"n=$n level=$level strat=$strategy declined")
      assert(java.util.Arrays.equals(got, data),
        s"n=$n level=$level strat=$strategy mismatch")
    }
  }

  test("zlib: header + adler32 verified") {
    val data = sample(5L, 30000)
    val comp = deflate(data, 6, Deflater.DEFAULT_STRATEGY, nowrap = false)
    val got = Inflate.zlib(comp)
    assert(got != null && java.util.Arrays.equals(got, data))
    // flip one byte of the adler trailer → decline
    val bad = comp.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    assert(Inflate.zlib(bad) == null)
    // FDICT flag set → decline
    val fd = comp.clone()
    fd(1) = (fd(1) | 0x20).toByte
    assert(Inflate.zlib(fd) == null)
    // raw face must reject the zlib framing (trailing adler = garbage)
    assert(Inflate.raw(comp) == null)
  }

  test("hand-built: multi-block stored + fixed-huffman literals") {
    // stored block (BFINAL=0) "Hi" + stored final block "!"
    val stored = Array[Byte](0x00, 2, 0, 0xfd.toByte, 0xff.toByte, 'H', 'i',
      0x01, 1, 0, 0xfe.toByte, 0xff.toByte, '!')
    assert(new String(Inflate.raw(stored)) === "Hi!")
    // corrupt NLEN → decline
    val bad = stored.clone(); bad(3) = 0
    assert(Inflate.raw(bad) == null)
  }

  test("totality: truncation and corruption fuzz never throws") {
    val data = sample(9L, 20000)
    Seq(true, false).foreach { nowrap =>
      val comp = deflate(data, 6, Deflater.DEFAULT_STRATEGY, nowrap)
      val f = if (nowrap) Inflate.raw _ else Inflate.zlib _
      (1 until comp.length by 3).foreach { keep =>
        f(java.util.Arrays.copyOf(comp, keep))
      }
      (0 until comp.length by 2).foreach { i =>
        val c = comp.clone(); c(i) = (c(i) ^ 0x41).toByte
        f(c)
      }
    }
  }

  test("ratio bomb declines at the shared cap") {
    // level-9 deflate of 256 MiB of zeros is ~256 KiB; decode must stop
    // at MaxOut instead of materializing the claim
    val d = new Deflater(9, true)
    d.setInput(new Array[Byte](1 << 20))
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val buf = new Array[Byte](1 << 16)
    (0 until 256).foreach { _ =>
      d.setInput(new Array[Byte](1 << 20))
      var n = d.deflate(buf)
      while (n > 0) { chunks += java.util.Arrays.copyOf(buf, n); n = d.deflate(buf) }
    }
    d.finish()
    var n = d.deflate(buf)
    while (n > 0) { chunks += java.util.Arrays.copyOf(buf, n); n = d.deflate(buf) }
    d.end()
    val comp = chunks.toArray.flatten
    assert(comp.length < (1 << 23))
    assert(Inflate.raw(comp) == null) // 257 MiB claim > 64 MiB cap
  }

  test("trailing garbage after BFINAL declines") {
    val comp = deflate("clean end".getBytes, 6, Deflater.DEFAULT_STRATEGY, true)
    assert(Inflate.raw(comp) != null)
    assert(Inflate.raw(comp :+ 0x00.toByte) == null)
  }

  test("gzip: real GZIPOutputStream members round-trip; trailers verified") {
    def gz(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(data); g.close()
      out.toByteArray
    }
    val a = (0 until 20000).map(i => s"line-$i payload ${i % 37}\n")
      .mkString.getBytes("UTF-8")
    val b = "short".getBytes("UTF-8")
    assert(Inflate.gzip(gz(a)).toSeq === a.toSeq)
    // multi-member concatenation (the .warc.gz / Hadoop-concat shape)
    assert(Inflate.gzip(gz(a) ++ gz(b)).toSeq === (a ++ b).toSeq)
    // strict contract: corrupt CRC trailer declines the whole input
    val one = gz(b)
    val badCrc = one.clone(); badCrc(one.length - 6) = (badCrc(one.length - 6) ^ 1).toByte
    assert(Inflate.gzip(badCrc) == null)
    val badIsize = one.clone(); badIsize(one.length - 1) = 0x7f.toByte
    assert(Inflate.gzip(badIsize) == null)
    // trailing garbage declines (page-codec strictness)
    assert(Inflate.gzip(one :+ 0x00.toByte) == null)
    // truncation fuzz: total, never throws
    (1 until one.length).foreach { keep =>
      Inflate.gzip(java.util.Arrays.copyOf(one, keep))
    }
  }
}
