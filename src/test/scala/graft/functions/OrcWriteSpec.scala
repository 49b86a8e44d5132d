package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OrcWrite against BOTH consumers: Spark's native ORC reader
  * (orc-core — the third-party proof, like real avro-java for
  * AvroWrite) and our own OrcValues stripe decoder, across codecs,
  * nulls, multi-stripe files, and RLE v1 run/literal shapes. */
class OrcWriteSpec extends SparkSpec {

  private def longs(b: Array[Byte], name: String): Array[java.lang.Long] = {
    val a = OrcValues.int64Values(b,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    if (a == null) null
    else (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else java.lang.Long.valueOf(a.getLong(i))).toArray
  }
  private def strings(b: Array[Byte], name: String): Array[String] = {
    val a = OrcValues.stringValues(b,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    if (a == null) null
    else (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else a.getUTF8String(i).toString).toArray
  }
  private def doubles(b: Array[Byte], name: String): Array[java.lang.Double] = {
    val a = OrcValues.doubleValues(b,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    if (a == null) null
    else (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else java.lang.Double.valueOf(a.getDouble(i))).toArray
  }

  // deterministic fixture: runs (k/7), literals (mixed), nulls, empty
  // and multi-byte strings, negative longs and doubles
  private val n = 3000
  private def mkRows: Seq[Seq[Any]] = (0 until n).map { i =>
    Seq[Any](
      java.lang.Long.valueOf(i.toLong / 7 - 50), // runs of 7
      if (i % 11 == 0) null
      else java.lang.Long.valueOf(i.toLong * 2654435761L % 1000003L - 7),
      if (i % 5 == 0) null
      else java.lang.Double.valueOf(i * 0.25 - 100.0),
      if (i % 13 == 0) null
      else if (i % 13 == 1) ""
      else s"v${i % 97}-é")
  }
  private val cols = Seq(("k", 'l'), ("m", 'l'), ("x", 'd'), ("s", 's'))

  private def checkOrcValues(b: Array[Byte]): Unit = {
    val rows = mkRows
    val k = longs(b, "k"); val m = longs(b, "m")
    val x = doubles(b, "x"); val s = strings(b, "s")
    assert(k != null && m != null && x != null && s != null)
    assert(k.length === n && m.length === n && x.length === n &&
      s.length === n)
    (0 until n).foreach { i =>
      assert(k(i) === rows(i)(0), s"k@$i")
      assert(m(i) === rows(i)(1), s"m@$i")
      assert(x(i) === rows(i)(2), s"x@$i")
      assert(s(i) === rows(i)(3), s"s@$i")
    }
  }

  private def sparkRead(b: Array[Byte]): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("orcw").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.orc"), b)
    spark.read.orc(dir)
  }

  test("OrcValues round-trip: none and zlib, single and multi-stripe") {
    Seq("none", "zlib").foreach { codec =>
      checkOrcValues(OrcWrite.fileBytes(cols, mkRows, codec))
      // multi-stripe: 7 stripes of 450 + a 300 tail
      checkOrcValues(OrcWrite.fileBytes(cols, mkRows, codec,
        stripeRows = 450))
    }
  }

  test("Spark's native ORC reader consumes the file exactly") {
    Seq("none", "zlib").foreach { codec =>
      val df = sparkRead(OrcWrite.fileBytes(cols, mkRows, codec,
        stripeRows = 1000))
      assert(df.schema.map(f => f.name -> f.dataType.typeName) ===
        Seq("k" -> "long", "m" -> "long", "x" -> "double",
          "s" -> "string"))
      assert(df.count() === n)
      val got = df.collect().map(r => Seq[Any](
        if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)),
        if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)),
        if (r.isNullAt(3)) null else r.getString(3)))
        .sortBy(r => (String.valueOf(r(0)), String.valueOf(r(1))))
      val want = mkRows
        .sortBy(r => (String.valueOf(r(0)), String.valueOf(r(1))))
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g === w, s"row $i ($codec)")
      }
      // null counts survive both readers
      assert(df.filter(col("m").isNull).count() ===
        mkRows.count(_(1) == null))
    }
  }

  test("RLE v1 shapes: long runs, 130-boundary, all-literal, all-null") {
    // a 1000-value constant run (chunks of 130), then literals
    val rows = (0 until 1000).map(_ => Seq[Any](java.lang.Long.valueOf(42L))) ++
      (0 until 131).map(i => Seq[Any](java.lang.Long.valueOf(i * 37L - 5)))
    val b = OrcWrite.fileBytes(Seq(("k", 'l')), rows)
    val k = longs(b, "k")
    assert(k.length === 1131)
    (0 until 1000).foreach(i => assert(k(i).longValue === 42L))
    (0 until 131).foreach(i => assert(k(1000 + i).longValue === i * 37L - 5))
    assert(sparkRead(b).agg(sum("k")).head().getLong(0) ===
      rows.map(_(0).asInstanceOf[java.lang.Long].longValue).sum)
    // an all-null column writes an empty DATA stream and still reads
    val rows2 = (0 until 200).map(_ => Seq[Any](null,
      java.lang.Long.valueOf(1L)))
    val b2 = OrcWrite.fileBytes(Seq(("a", 'l'), ("b", 'l')), rows2, "zlib")
    val a2 = longs(b2, "a")
    assert(a2.length === 200 && a2.forall(_ == null))
    assert(sparkRead(b2).filter(col("a").isNull).count() === 200)
  }

  test("RLE v2 generation + DATE columns: both consumers again") {
    val colsV = Seq(("k", 'l'), ("m", 'l'), ("s", 's'), ("dt", 'a'))
    def rowsV: Seq[Seq[Any]] = (0 until 2000).map { i =>
      Seq[Any](
        java.lang.Long.valueOf(i.toLong * 977 - 100000),
        if (i % 7 == 0) null else java.lang.Long.valueOf(-i.toLong * 3),
        if (i % 9 == 0) null else s"x${i % 41}",
        java.lang.Long.valueOf((i % 400).toLong - 50))
    }
    def days(b: Array[Byte], name: String): Array[java.lang.Long] = {
      val a = OrcValues.dateDays(b,
        org.apache.spark.unsafe.types.UTF8String.fromString(name))
      if (a == null) null
      else (0 until a.numElements()).map(i =>
        if (a.isNullAt(i)) null
        else java.lang.Long.valueOf(a.getLong(i))).toArray
    }
    Seq("none", "zlib").foreach { codec =>
      val b = OrcWrite.fileBytes(colsV, rowsV, codec, stripeRows = 700,
        rle = "v2")
      val k = longs(b, "k"); val m = longs(b, "m")
      val s = strings(b, "s"); val dt = days(b, "dt")
      assert(k != null && m != null && s != null && dt != null)
      (0 until 2000).foreach { i =>
        assert(k(i) === rowsV(i)(0), s"k@$i")
        assert(m(i) === rowsV(i)(1), s"m@$i")
        assert(s(i) === rowsV(i)(2), s"s@$i")
        assert(dt(i) === rowsV(i)(3), s"dt@$i")
      }
      val df = sparkRead(b)
      assert(df.schema("dt").dataType ===
        org.apache.spark.sql.types.DateType)
      assert(df.count() === 2000)
      assert(df.agg(sum("k")).head().getLong(0) ===
        (0 until 2000).map(i => i.toLong * 977 - 100000).sum)
      assert(df.agg(sum(datediff(col("dt"), lit("1970-01-01"))))
        .head().getLong(0) ===
        (0 until 2000).map(i => (i % 400).toLong - 50).sum)
      assert(df.filter(col("m").isNull).count() ===
        rowsV.count(_(1) == null))
    }
    intercept[IllegalArgumentException] {
      OrcWrite.fileBytes(colsV, rowsV.take(1), rle = "v3")
    }
  }

  test("TIMESTAMP columns: UTC micros through both consumers") {
    // micros with second-aligned, milli-aligned, and odd-micro tails
    // (exercises the trailing-zero nanos packing in all regimes)
    val rows = (0 until 1500).map { i =>
      Seq[Any](
        java.lang.Long.valueOf(i.toLong),
        if (i % 11 == 0) null
        else java.lang.Long.valueOf(1700000000000000L + i.toLong *
          (i % 3 match { case 0 => 1000000L; case 1 => 1000L; case _ => 1L })
          + (i % 7).toLong * 97L))
    }
    Seq("none", "zlib").foreach { codec =>
      val b = OrcWrite.fileBytes(Seq(("k", 'l'), ("ts", 't')), rows,
        codec, stripeRows = 600, rle = "v2")
      // OrcValues face: exact micro round-trip
      val a = OrcValues.timestampMicros(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("ts"))
      assert(a != null && a.numElements() === 1500)
      (0 until 1500).foreach { i =>
        if (rows(i)(1) == null) assert(a.isNullAt(i), s"ts@$i")
        else assert(a.getLong(i) ===
          rows(i)(1).asInstanceOf[java.lang.Long].longValue, s"ts@$i")
      }
      // Spark native: schema + micro-exact values under a UTC session
      val dir = java.nio.file.Files.createTempDirectory("orcts").toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part-0.orc"), b)
      val df = spark.read.orc(dir)
      assert(df.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
      val got = df.select(unix_micros(col("ts"))).collect()
        .map(r => if (r.isNullAt(0)) null
          else java.lang.Long.valueOf(r.getLong(0))).sortBy(v =>
          if (v == null) Long.MinValue else v.longValue)
      val want = rows.map(_(1).asInstanceOf[java.lang.Long]).sortBy(v =>
        if (v == null) Long.MinValue else v.longValue)
      got.zip(want).foreach { case (g, w) => assert(g === w) }
    }
    // v1 generation and pre-1970 micros decline loudly
    intercept[IllegalArgumentException] {
      OrcWrite.fileBytes(Seq(("ts", 't')),
        Seq(Seq[Any](java.lang.Long.valueOf(1L))), rle = "v1")
    }
    intercept[IllegalArgumentException] {
      OrcWrite.fileBytes(Seq(("ts", 't')),
        Seq(Seq[Any](java.lang.Long.valueOf(-5L))), rle = "v2")
    }
  }

  test("loud declines: bad kind, bad codec, arity mismatch, empty file") {
    val r = Seq(Seq[Any](java.lang.Long.valueOf(1L)))
    intercept[RuntimeException] {
      OrcWrite.fileBytes(Seq(("k", 'z')), r)
    }
    intercept[RuntimeException] {
      OrcWrite.fileBytes(Seq(("k", 'l')), r, codec = "snappy")
    }
    intercept[IllegalArgumentException] {
      OrcWrite.fileBytes(Seq(("k", 'l'), ("s", 's')), r)
    }
    intercept[IllegalArgumentException] {
      OrcWrite.fileBytes(Seq(("k", 'l')), Seq.empty)
    }
  }
}
