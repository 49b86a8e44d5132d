package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OrcValues against ORC files written by Spark itself (the real Java
  * ORC writer): value distributions chosen to force every RLE v2
  * sub-encoding (monotonic → DELTA, repeats → SHORT_REPEAT, noisy →
  * DIRECT, noisy-with-outliers → PATCHED_BASE), strings in both
  * DICTIONARY_V2 and DIRECT_V2, nulls (PRESENT streams), all three
  * supported codecs, multi-stripe files, and the decline contract.
  */
class OrcValuesSpec extends SparkSpec {

  private def writeAndRead(df: org.apache.spark.sql.DataFrame,
                           opts: Map[String, String] = Map.empty): Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("orcvals").toString
    df.coalesce(1).write.options(opts).mode("overwrite").orc(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).head
    java.nio.file.Files.readAllBytes(f.toPath)
  }

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

  // deterministic pseudo-noise (no RNG by repo rule)
  private def noise(c: org.apache.spark.sql.Column) =
    pmod(c * 2654435761L, lit(1000003L))

  private val df = spark.range(0, 30000).select(
    col("id").as("mono"), // monotonic → DELTA runs
    (col("id") % 5).as("rep"), // tiny alternating runs → SHORT_REPEAT
    noise(col("id")).as("noisy"), // high-entropy → DIRECT
    // mostly-small with rare huge outliers → PATCHED_BASE
    when(col("id") % 97 === 0, noise(col("id")) * 1000000L + 1234567890123L)
      .otherwise(noise(col("id")) % 500).as("outliers"),
    (noise(col("id")) - 500000L).as("negs"), // negatives → zigzag
    when(col("id") % 11 === 0, lit(null)).otherwise(col("id") * 3).as("opt"),
    (col("id") % 7).cast("int").as("i32"),
    (col("id") % 3).cast("smallint").as("i16"),
    concat(lit("cat-"), (col("id") % 20).cast("string")).as("lowcard"),
    md5(col("id").cast("string")).as("highcard"),
    when(col("id") % 13 === 0, lit(null))
      .otherwise(concat(lit("s"), col("id").cast("string"))).as("opts"),
    when(col("id") % 17 === 0, lit(null))
      .otherwise(col("id") / lit(16.0) - 500.0).as("dbl"),
    (col("id") % 23).cast("float").as("flt"))

  private val intCols = Seq("mono", "rep", "noisy", "outliers", "negs",
    "opt", "i32", "i16")
  private val strCols = Seq("lowcard", "highcard", "opts")
  private val dblCols = Seq("dbl", "flt")

  private def check(b: Array[Byte], label: String): Unit = {
    val want = df.collect()
    intCols.foreach { c =>
      val got = longs(b, c)
      assert(got != null, s"$label/$c declined")
      assert(got.length === want.length, s"$label/$c length")
      val ci = df.columns.indexOf(c)
      want.zipWithIndex.foreach { case (r, i) =>
        val w = if (r.isNullAt(ci)) null
          else java.lang.Long.valueOf(r.get(ci).toString.toLong)
        assert(got(i) === w, s"$label/$c@$i")
      }
    }
    strCols.foreach { c =>
      val got = strings(b, c)
      assert(got != null, s"$label/$c declined")
      val ci = df.columns.indexOf(c)
      want.zipWithIndex.foreach { case (r, i) =>
        val w = if (r.isNullAt(ci)) null else r.getString(ci)
        assert(got(i) === w, s"$label/$c@$i")
      }
    }
    dblCols.foreach { c =>
      val a = OrcValues.doubleValues(b,
        org.apache.spark.unsafe.types.UTF8String.fromString(c))
      assert(a != null, s"$label/$c declined")
      val ci = df.columns.indexOf(c)
      want.zipWithIndex.foreach { case (r, i) =>
        if (r.isNullAt(ci)) assert(a.isNullAt(i), s"$label/$c@$i")
        else {
          val w = r.get(ci) match {
            case f: java.lang.Float => f.toDouble
            case d: java.lang.Double => d.doubleValue
          }
          assert(a.getDouble(i) === w, s"$label/$c@$i")
        }
      }
    }
  }

  test("all RLEv2 shapes + strings + nulls round-trip, four codecs") {
    Seq("none", "zlib", "snappy", "zstd").foreach { codec =>
      check(writeAndRead(df, Map("compression" -> codec)), codec)
    }
  }

  test("multi-stripe files concatenate in order") {
    val b = writeAndRead(df, Map("compression" -> "zlib",
      "orc.stripe.size" -> "65536"))
    val meta = OrcMeta.fileMeta(b)
    assert(meta != null && meta.getInt(1) > 1,
      s"expected multiple stripes, got ${meta.getInt(1)}")
    check(b, "multi-stripe")
  }

  test("declines: missing column, type mismatch, unsupported types") {
    val b = writeAndRead(df)
    assert(longs(b, "nope") == null)
    assert(longs(b, "lowcard") == null) // string via int face
    assert(strings(b, "mono") == null) // int via string face
    val other = spark.range(0, 50).select(col("id").as("k"),
      col("id").cast("double").as("d"),
      col("id").cast("decimal(10,2)").as("dec"))
    val ob = writeAndRead(other)
    assert(longs(ob, "k") != null) // supported beside unsupported reads
    assert(longs(ob, "d") == null) // double via the int face declines
    assert(longs(ob, "dec") == null) // decimal out of scope entirely
    assert(OrcValues.doubleValues(ob,
      org.apache.spark.unsafe.types.UTF8String.fromString("dec")) == null)
  }

  test("RLEv2: the ORC spec's own example vectors decode exactly") {
    def dec(hex: String, n: Int, signed: Boolean = false): Seq[Long] =
      OrcValues.rleV2(hex.grouped(2).map(Integer.parseInt(_, 16).toByte)
        .toArray, n, signed).toSeq
    // SHORT_REPEAT: 10000 x5
    assert(dec("0a2710", 5) === Seq.fill(5)(10000L))
    // DIRECT: [23713, 43806, 57005, 48879]
    assert(dec("5e035ca1ab1edeadbeef", 4) ===
      Seq(23713L, 43806L, 57005L, 48879L))
    // DELTA: primes 2..29 (base 2, delta base +1, 4-bit literal deltas)
    assert(dec("c609020222424246", 10) ===
      Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L))
    // PATCHED_BASE: the spec's 1000000-outlier example — base 2000,
    // 8-bit data, one 14-bit gap+patch entry patching index 3
    assert(dec("8e092b2107d01e00147028323c46505afce8", 10) ===
      Seq(2030L, 2000L, 2020L, 1000000L, 2040L, 2050L, 2060L, 2070L,
        2080L, 2090L))
  }

  test("DATE and TIMESTAMP columns: days/micros match Spark's own read") {
    // timestamps straddle the ORC 2015-01-01 base (negative relative
    // seconds with fractional parts are the tricky path) and carry
    // sub-second precision at several trailing-zero scales
    val tdf = spark.range(0, 3000).select(
      col("id"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(timestamp_micros(
          // spans pre-1970 (negative epoch), 1970..2015 (negative
          // relative to the ORC base), and post-2015
          (col("id") - 1500) * 86400L * 40000000L +
            (col("id") % 5) * 123456L + (col("id") % 3) * 1000000L))
        .as("ts"),
      when(col("id") % 11 === 0, lit(null))
        .otherwise(date_add(to_date(lit("1992-06-15")),
          (col("id") % 4000).cast("int"))).as("dt"))
    Seq("zlib", "none").foreach { codec =>
      val b = writeAndRead(tdf, Map("compression" -> codec))
      val want = tdf.select(
        unix_micros(col("ts")).as("micros"),
        datediff(col("dt"), to_date(lit("1970-01-01"))).as("days")).collect()
      val ts = OrcValues.timestampMicros(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("ts"))
      val dt = OrcValues.dateDays(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("dt"))
      assert(ts != null && dt != null, s"$codec declined")
      want.zipWithIndex.foreach { case (r, i) =>
        if (r.isNullAt(0)) assert(ts.isNullAt(i), s"ts@$i/$codec")
        else assert(ts.getLong(i) === r.getLong(0), s"ts@$i/$codec")
        if (r.isNullAt(1)) assert(dt.isNullAt(i), s"dt@$i/$codec")
        else assert(dt.getLong(i) === r.getInt(1).toLong, s"dt@$i/$codec")
      }
    }
  }

  test("Hive 0.11 format: integer DIRECT + string DIRECT/DICTIONARY RLE v1") {
    val src = spark.range(0, 20000).select(
      col("id").as("mono"), // runs with delta=1
      when(col("id") % 9 === 0, lit(null))
        .otherwise(noise(col("id")) - 500000L).as("noisy"), // literals
      (col("id") % 7 * 100).as("runs"), // short repeat runs
      concat(lit("tag-"), (col("id") % 40).cast("string"))
        .as("dict_s"), // low cardinality → DICTIONARY (v1)
      concat(lit("u"), col("id").cast("string")).as("uniq_s")) // DIRECT
    val b = writeAndRead(src, Map("orc.write.format" -> "0.11",
      "compression" -> "zlib"))
    val want = src.collect()
    val mono = longs(b, "mono"); val noisy = longs(b, "noisy")
    val runs = longs(b, "runs")
    val ds = strings(b, "dict_s"); val us = strings(b, "uniq_s")
    assert(mono != null && noisy != null && runs != null &&
      ds != null && us != null, "v1 RLE declined")
    want.zipWithIndex.foreach { case (r, i) =>
      assert(mono(i).longValue === r.getLong(0), s"mono@$i")
      assert(noisy(i) === (if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(r.getLong(1))), s"noisy@$i")
      assert(runs(i).longValue === r.getLong(2), s"runs@$i")
      assert(ds(i) === r.getString(3), s"dict_s@$i")
      assert(us(i) === r.getString(4), s"uniq_s@$i")
    }
  }

  test("totality: truncation and corruption fuzz never throws") {
    val small = spark.range(0, 400).select(col("id").as("k"),
      when(col("id") % 5 === 0, lit(null))
        .otherwise(concat(lit("v"), (col("id") % 9).cast("string"))).as("s"))
    val b = writeAndRead(small, Map("compression" -> "zlib"))
    (1 until b.length by 11).foreach { keep =>
      val c = java.util.Arrays.copyOf(b, keep)
      OrcValues.int64Values(c,
        org.apache.spark.unsafe.types.UTF8String.fromString("k"))
    }
    (0 until b.length by 5).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x3c).toByte
      OrcValues.int64Values(c,
        org.apache.spark.unsafe.types.UTF8String.fromString("k"))
      OrcValues.stringValues(c,
        org.apache.spark.unsafe.types.UTF8String.fromString("s"))
    }
  }
}
