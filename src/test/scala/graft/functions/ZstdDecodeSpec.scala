package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import com.github.luben.zstd.{Zstd, ZstdCompressCtx}

/** ZstdDecode against REAL zstd output (zstd-jni, on the Spark
  * classpath): byte-exact round-trips at every compression level over
  * corpora chosen to exercise every block/literals/sequence shape,
  * checksum verification, multi-frame and skippable-frame walks, the
  * dictionary decline, and the totality fuzz contract. */
class ZstdDecodeSpec extends AnyFunSuite {

  // deterministic corpora (no RNG by repo rule)
  private def textCorpus(n: Int): Array[Byte] =
    (0 until n).map(i => s"line $i: the quick brown fox ${i % 97} " +
      s"jumps over ${i % 31} lazy dogs\n").mkString.getBytes("UTF-8")

  private def noisyCorpus(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      b(i) = (x >>> 56).toByte
      i += 1
    }
    b
  }

  private def repetitive(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ('a' + (i % 4)).toByte)

  private val corpora: Seq[(String, Array[Byte])] = Seq(
    "text-200k" -> textCorpus(3000),
    "noisy-64k" -> noisyCorpus(65536), // incompressible → raw blocks
    "repetitive-300k" -> repetitive(300000), // RLE-ish, long matches
    "mixed" -> (textCorpus(500) ++ noisyCorpus(10000) ++ repetitive(50000)),
    "tiny" -> "x".getBytes,
    "empty" -> Array.emptyByteArray)

  test("byte-exact round-trip vs zstd-jni at every level") {
    for {
      (label, data) <- corpora
      level <- Seq(-5, 1, 3, 6, 9, 12, 16, 19)
    } {
      val comp = Zstd.compress(data, level)
      val got = ZstdDecode.decompress(comp)
      assert(got != null, s"$label@$level declined")
      assert(java.util.Arrays.equals(got, data), s"$label@$level mismatch")
    }
  }

  test("content checksum verified; corrupt checksum declines") {
    val ctx = new ZstdCompressCtx()
    ctx.setLevel(3)
    ctx.setChecksum(true)
    val data = textCorpus(2000)
    val comp = ctx.compress(data)
    assert(java.util.Arrays.equals(ZstdDecode.decompress(comp), data))
    val bad = comp.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x55).toByte
    assert(ZstdDecode.decompress(bad) == null)
    ctx.close()
  }

  test("multi-frame concatenation and skippable frames") {
    val a = textCorpus(300)
    val b = repetitive(5000)
    val skippable = {
      // magic 0x184D2A50 + 4-byte size + payload
      val payload = "ignore me".getBytes
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x50, 0x2a, 0x4d, 0x18))
      out.write(Array[Byte](payload.length.toByte, 0, 0, 0))
      out.write(payload)
      out.toByteArray
    }
    val joined = Zstd.compress(a, 3) ++ skippable ++ Zstd.compress(b, 3)
    val got = ZstdDecode.decompress(joined)
    assert(got != null && java.util.Arrays.equals(got, a ++ b))
  }

  test("dictionary frames decline (unsupported), never misread") {
    val dict = textCorpus(50)
    val ctx = new ZstdCompressCtx()
    ctx.setLevel(3)
    ctx.loadDict(dict)
    val comp = ctx.compress(textCorpus(200))
    // zstd writes the dictionary ID into the frame header → decline
    assert(ZstdDecode.decompress(comp) == null)
    ctx.close()
  }

  test("frameStored: real zstd AND our decoder consume the stored frames") {
    Seq(Array.emptyByteArray, "tiny".getBytes, textCorpus(2000),
      noisyCorpus(200000)).foreach { data => // last spans >1 raw block
      val frame = ZstdDecode.frameStored(data)
      assert(java.util.Arrays.equals(ZstdDecode.decompress(frame), data))
      val real = Zstd.decompress(frame, data.length)
      assert(java.util.Arrays.equals(real, data))
      // content checksum is real: flip a content byte → decline
      if (data.nonEmpty) {
        val bad = frame.clone()
        bad(frame.length - 7) = (bad(frame.length - 7) ^ 1).toByte
        assert(ZstdDecode.decompress(bad) == null)
      }
    }
  }

  test("third-party encoder corpus: zstd CLI v1.5.7 frames decode byte-exactly") {
    // fixtures produced by the standalone zstd CLI (a different build
    // lineage than zstd-jni) at levels 1/3/9/19, --ultra -22, and
    // --long window mode — closes the ADVICE watch item that the
    // exact-bitstream-consumption rule might decline another encoder's
    // valid padding. It does not: the RFC's sentinel-bit rule is what
    // every conformant encoder emits.
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/zstd_cli/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val cases = Seq(
      "corpus_text" -> Seq("l1", "l3", "l9", "l19", "l22"),
      "corpus_bin" -> Seq("l1", "l3", "l9", "l19", "long"),
      "corpus_tiny" -> Seq("l1", "l3", "l9", "l19"),
      "corpus_rand" -> Seq("l1", "l3", "l9", "l19"))
    cases.foreach { case (corpus, variants) =>
      val want = res(s"$corpus.bin")
      variants.foreach { v =>
        val got = ZstdDecode.decompress(res(s"${corpus}_$v.zst"))
        assert(got != null, s"$corpus $v declined")
        assert(java.util.Arrays.equals(got, want), s"$corpus $v mismatch")
      }
    }
  }

  test("totality: truncation and corruption fuzz never throws") {
    val data = textCorpus(1500) ++ noisyCorpus(8000)
    Seq(1, 9, 19).foreach { level =>
      val comp = Zstd.compress(data, level)
      (1 until comp.length by 3).foreach { keep =>
        ZstdDecode.decompress(java.util.Arrays.copyOf(comp, keep))
      }
      (0 until comp.length).foreach { i =>
        val c = comp.clone(); c(i) = (c(i) ^ 0x4b).toByte
        val r = ZstdDecode.decompress(c)
        // decline-or-differ; the frame has no checksum so a flipped bit
        // may still decode — it must just never throw
        if (r != null) assert(r.length <= (1 << 26))
      }
    }
    assert(ZstdDecode.decompress(null) == null)
    assert(ZstdDecode.decompress(Array.emptyByteArray) == null)
    assert(ZstdDecode.decompress("not zstd at all".getBytes) == null)
  }
}
