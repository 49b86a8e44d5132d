package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** OrcMeta against ORC files Spark itself writes, in every supported
  * footer compression, plus the decline/fuzz contract. */
class OrcMetaSpec extends SparkSpec {
  import spark.implicits._

  private def writeAndRead(df: org.apache.spark.sql.DataFrame,
                           compression: String): Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("orcmeta").toString
    df.coalesce(1).write.option("compression", compression)
      .mode("overwrite").orc(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).head
    java.nio.file.Files.readAllBytes(f.toPath)
  }

  private val df = spark.range(0, 20000)
    .select((col("id") * 3 - 777).as("k"),
      concat(lit("s"), lpad(pmod(col("id"), lit(40)).cast("string"), 3, "0")).as("w"))

  test("file meta + column stats across codecs (none, zlib, snappy)") {
    Seq("none", "zlib", "snappy").foreach { codec =>
      val b = writeAndRead(df, codec)
      val m = OrcMeta.fileMeta(b)
      assert(m != null, s"$codec declined")
      assert(m.getLong(0) === 20000L, codec)
      assert(m.getLong(2) === 20000L, s"stripe rows $codec")
      assert(m.getInt(1) >= 1)
      assert(m.getUTF8String(4).toString === "k,w")
      val ks = OrcMeta.colStats(b, UTF8String.fromString("k"))
      assert(ks != null)
      assert(ks.getLong(0) === 20000L)
      assert(ks.getLong(1) === -777L) // min
      assert(ks.getLong(2) === 19999L * 3 - 777) // max
      assert(ks.getLong(3) === (0L until 20000L).map(_ * 3 - 777).sum) // sum
      val ws = OrcMeta.colStats(b, UTF8String.fromString("w"))
      assert(ws != null)
      assert(ws.getUTF8String(4).toString === "s000")
      assert(ws.getUTF8String(5).toString === "s039")
      assert(ws.isNullAt(1)) // no int stats on a string column
    }
  }

  test("declines: missing column, foreign bytes, truncation/corruption fuzz") {
    val b = writeAndRead(df, "zlib")
    assert(OrcMeta.colStats(b, UTF8String.fromString("nope")) == null)
    assert(OrcMeta.fileMeta("not orc at all".getBytes) == null)
    assert(OrcMeta.fileMeta(Array.emptyByteArray) == null)
    // tail-region truncation and corruption: decline or differ, never throw
    (1 until 600).foreach { cut =>
      OrcMeta.fileMeta(java.util.Arrays.copyOf(b, math.max(1, b.length - cut)))
    }
    (math.max(0, b.length - 600) until b.length).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x5c).toByte
      OrcMeta.fileMeta(c)
      OrcMeta.colStats(c, UTF8String.fromString("k"))
    }
  }
}
