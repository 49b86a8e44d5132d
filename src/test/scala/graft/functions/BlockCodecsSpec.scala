package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** BlockCodecs against the REAL compressors (lz4-java / snappy-java,
  * both on the Spark classpath): whatever the reference encoders emit,
  * our decoders must reproduce byte-for-byte — plus totality fuzz
  * (truncations, corruption, ratio bombs) and hand-built format edges.
  */
class BlockCodecsSpec extends AnyFunSuite {

  /** Deterministic pseudo-random bytes with long repeats (so both
    * codecs actually emit matches, not literal-only blocks). */
  private def sample(seed: Long, n: Int): Array[Byte] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if ((next() & 7) == 0 && i > 64) {
        // splice a repeat of an earlier window
        val off = ((next() >>> 33) % i).toInt
        val len = math.min(32 + ((next() >>> 40) % 64).toInt, n - i)
        System.arraycopy(out, off, out, i, math.min(len, i - off).max(1))
        i += math.min(len, i - off).max(1)
      } else {
        out(i) = ((next() >>> 41) % 96 + 32).toByte
        i += 1
      }
    }
    out
  }

  test("lz4: round-trips blocks emitted by lz4-java (fast + high compressors)") {
    val f = net.jpountz.lz4.LZ4Factory.fastestInstance()
    Seq(0, 1, 13, 500, 65536, 300000).foreach { n =>
      val data = sample(n + 7L, n)
      Seq(f.fastCompressor(), f.highCompressor()).foreach { c =>
        val comp = c.compress(data)
        val got = BlockCodecs.lz4Block(comp)
        assert(got != null, s"n=$n declined")
        assert(java.util.Arrays.equals(got, data), s"n=$n mismatch")
      }
    }
  }

  test("snappy: round-trips blocks emitted by snappy-java") {
    Seq(0, 1, 13, 500, 65536, 300000).foreach { n =>
      val data = sample(n + 11L, n)
      val comp = org.xerial.snappy.Snappy.compress(data)
      val got = BlockCodecs.snappyBlock(comp)
      assert(got != null, s"n=$n declined")
      assert(java.util.Arrays.equals(got, data), s"n=$n mismatch")
    }
  }

  test("totality: every truncation and single-byte corruption declines or differs, never throws") {
    val data = sample(3L, 4096)
    val lz = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      .compress(data)
    val sn = org.xerial.snappy.Snappy.compress(data)
    (1 until lz.length).foreach { keep =>
      BlockCodecs.lz4Block(java.util.Arrays.copyOf(lz, keep)) // must not throw
    }
    (1 until sn.length).foreach { keep =>
      BlockCodecs.snappyBlock(java.util.Arrays.copyOf(sn, keep))
    }
    (0 until lz.length).foreach { i =>
      val c = lz.clone(); c(i) = (c(i) ^ 0x35).toByte
      BlockCodecs.lz4Block(c)
    }
    (0 until sn.length).foreach { i =>
      val c = sn.clone(); c(i) = (c(i) ^ 0x35).toByte
      BlockCodecs.snappyBlock(c)
    }
  }

  test("snappy: preamble is verified, not trusted") {
    val data = "hello hello hello".getBytes
    val comp = org.xerial.snappy.Snappy.compress(data)
    // bump the claimed length: produced != claim → decline
    val c = comp.clone()
    c(0) = (c(0) + 1).toByte
    assert(BlockCodecs.snappyBlock(c) == null)
  }

  test("ratio bombs cap at MaxOut instead of allocating the claim") {
    // LZ4: tiny block expanding to > 64 MiB via chained match continuations
    val bomb = new scala.collection.mutable.ArrayBuffer[Byte]
    bomb += 0x1f.toByte // 1 literal, match len 15+4+ext
    bomb += 'a'.toByte
    bomb += 1; bomb += 0 // offset 1
    // continuation bytes: 0xFF * 300k ≈ matchLen ~76M > MaxOut
    (0 until 300000).foreach(_ => bomb += 0xff.toByte)
    bomb += 0x00.toByte
    assert(BlockCodecs.lz4Block(bomb.toArray) == null)
    // Snappy: claim > MaxOut declines immediately
    val big = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x7f.toByte) // varint ≈ 2^31
    assert(BlockCodecs.snappyBlock(big) == null)
  }

  test("lz4 hand-built edges: RLE offset-1 overlap and literals-only final") {
    // "ab" + copy(offset 1, len 6) + final literal "Z"
    val block = Array[Byte](
      0x22.toByte, 'a', 'b', 1, 0, // 2 literals, match len 2+4=6, offset 1
      0x10.toByte, 'Z') // final: 1 literal
    val got = BlockCodecs.lz4Block(block)
    assert(got != null && new String(got) === "abbbbbbbZ")
    // zero offset is malformed
    val bad = Array[Byte](0x22.toByte, 'a', 'b', 0, 0, 0x10.toByte, 'Z')
    assert(BlockCodecs.lz4Block(bad) == null)
    // offset beyond produced output is malformed
    val far = Array[Byte](0x22.toByte, 'a', 'b', 9, 0, 0x10.toByte, 'Z')
    assert(BlockCodecs.lz4Block(far) == null)
  }
}
