package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ParquetPages against parquet-mr files written by Spark itself, with
  * options forcing every supported layout: dictionary and PLAIN data
  * pages, dict-overflow mid-chunk fallback, multi-page chunks, nulls,
  * INT32 widening, and the decline contract for unsupported shapes.
  */
class ParquetPagesSpec extends SparkSpec {
  import spark.implicits._

  private def writeAndRead(df: org.apache.spark.sql.DataFrame,
                           opts: Map[String, String] = Map.empty): Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("pqpages").toString
    df.coalesce(1).write.options(opts).mode("overwrite").parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.readAllBytes(f.toPath)
  }

  private def longs(b: Array[Byte], name: String): Array[java.lang.Long] = {
    val a = ParquetPages.int64Values(b,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    if (a == null) null
    else (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else java.lang.Long.valueOf(a.getLong(i))).toArray
  }

  private def strings(b: Array[Byte], name: String): Array[String] = {
    val a = ParquetPages.stringValues(b,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    if (a == null) null
    else (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else a.getUTF8String(i).toString).toArray
  }

  test("dictionary-encoded int64/int32/string with nulls round-trip") {
    val df = spark.range(0, 5000).select(
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 40).as("k"),
      (col("id") % 13).cast("int").as("v32"),
      concat(lit("w"), (col("id") % 25).cast("string")).as("w"))
    val b = writeAndRead(df, Map("compression" -> "snappy"))
    val want = df.collect()
    val k = longs(b, "k"); val v = longs(b, "v32"); val w = strings(b, "w")
    assert(k != null && v != null && w != null)
    assert(k.length === 5000 && v.length === 5000 && w.length === 5000)
    want.zipWithIndex.foreach { case (r, i) =>
      assert(k(i) === (if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))), s"k@$i")
      assert(v(i).longValue === r.getInt(1).toLong, s"v32@$i")
      assert(w(i) === r.getString(2), s"w@$i")
    }
  }

  test("PLAIN pages (dictionary disabled) and uncompressed codec") {
    val df = spark.range(0, 2000).select((col("id") * 17 - 3).as("k"),
      concat(lit("s"), col("id").cast("string")).as("s"))
    val b = writeAndRead(df, Map("compression" -> "none",
      "parquet.enable.dictionary" -> "false"))
    val k = longs(b, "k"); val s = strings(b, "s")
    assert(k != null && s != null)
    assert(k.map(_.longValue).toSeq === (0 until 2000).map(_ * 17L - 3))
    assert(s.toSeq === (0 until 2000).map(i => s"s$i"))
  }

  test("dict-overflow fallback: dictionary pages then PLAIN pages in one chunk") {
    // tiny dictionary page budget → parquet-mr falls back to PLAIN
    // mid-chunk; tiny data pages → many pages
    val n = 20000
    val df = spark.range(0, n).select(col("id").as("k"))
    val b = writeAndRead(df, Map("compression" -> "snappy",
      "parquet.dictionary.page.size" -> "1024",
      "parquet.page.size" -> "2048"))
    val k = longs(b, "k")
    assert(k != null, "mixed-encoding chunk declined")
    assert(k.length === n)
    assert(k.map(_.longValue).toSeq === (0L until n.toLong))
  }

  test("multi-row-group read concatenates in order") {
    val df = spark.range(0, 50000).select(col("id").as("k"))
    val b = writeAndRead(df, Map("compression" -> "snappy",
      "parquet.block.size" -> "65536"))
    val m = {
      val one = Seq(b).toDF("content")
      one.select(ParquetFooter.fileMetaCol(col("content")).as("m"))
        .select("m.n_row_groups").collect().head.getInt(0)
    }
    assert(m > 1)
    val k = longs(b, "k")
    assert(k != null && k.length === 50000)
    assert(k.map(_.longValue).toSeq === (0L until 50000L))
  }

  test("data page v2 + DELTA encodings (parquet-mr v2 writer) round-trip") {
    val df = spark.range(0, 8000).select(
      when(col("id") % 11 === 0, lit(null)).otherwise(col("id") * 5 - 1000).as("k"),
      (col("id") % 9 - 4).cast("int").as("v32"),
      // shared prefixes exercise DELTA_BYTE_ARRAY's prefix reconstruction
      concat(lit("prefix/shared/"), lpad((col("id") % 300).cast("string"), 5, "0"))
        .as("s"))
    Seq("snappy", "none").foreach { codec =>
      // dictionary DISABLED → v2 writer emits DELTA_BINARY_PACKED for
      // ints and DELTA_BYTE_ARRAY for strings
      val b = writeAndRead(df, Map("compression" -> codec,
        "parquet.writer.version" -> "v2",
        "parquet.enable.dictionary" -> "false"))
      val want = df.collect()
      val k = longs(b, "k"); val v = longs(b, "v32"); val s = strings(b, "s")
      assert(k != null && v != null && s != null, s"codec=$codec declined")
      want.zipWithIndex.foreach { case (r, i) =>
        assert(k(i) === (if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))), s"k@$i/$codec")
        assert(v(i).longValue === r.getInt(1).toLong, s"v32@$i/$codec")
        assert(s(i) === r.getString(2), s"s@$i/$codec")
      }
      // dictionary ENABLED under v2 framing (RLE_DICTIONARY in v2 pages)
      val b2 = writeAndRead(df, Map("compression" -> codec,
        "parquet.writer.version" -> "v2"))
      val k2 = longs(b2, "k")
      assert(k2 != null && k2.length === 8000)
      want.zipWithIndex.foreach { case (r, i) =>
        assert(k2(i) === (if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))), s"k2@$i/$codec")
      }
    }
  }

  test("stats pruning skips row groups; kept groups still decode exactly") {
    val n = 50000
    val df = spark.range(0, n).select(col("id").as("k"))
    val b = writeAndRead(df, Map("compression" -> "snappy",
      "parquet.block.size" -> "65536"))
    def pruned(lo: Long, hi: Long) = {
      val r = ParquetPages.int64ValuesPruned(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("k"), lo, hi)
      assert(r != null)
      val a = r.getArray(2)
      val vals = (0 until a.numElements()).map(a.getLong)
      (r.getInt(0), r.getInt(1), vals)
    }
    val (groups, keptAll, allVals) = pruned(Long.MinValue, Long.MaxValue)
    assert(groups > 2 && keptAll === groups && allVals.size === n)
    // a narrow range keeps a strict subset of groups, and every
    // qualifying value is still present (pruning is sound)
    val (g2, kept2, vals2) = pruned(10000L, 12000L)
    assert(g2 === groups && kept2 < groups && kept2 >= 1)
    assert(vals2.filter(v => v >= 10000L && v <= 12000L).toSeq ===
      (10000L to 12000L))
    // a range past the data touches nothing
    val (_, kept3, vals3) = pruned(n + 10L, n + 999L)
    assert(kept3 === 0 && vals3.isEmpty)
  }

  private def int64Lists(b: Array[Byte], name: String): Array[Array[java.lang.Long]] = {
    val a = ParquetPages.int64ListValues(b,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    if (a == null) null
    else (0 until a.numElements()).map { i =>
      if (a.isNullAt(i)) null
      else {
        val inner = a.getArray(i)
        (0 until inner.numElements()).map(j =>
          if (inner.isNullAt(j)) null
          else java.lang.Long.valueOf(inner.getLong(j))).toArray
      }
    }.toArray
  }

  private def stringLists(b: Array[Byte], name: String): Array[Array[String]] = {
    val a = ParquetPages.stringListValues(b,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    if (a == null) null
    else (0 until a.numElements()).map { i =>
      if (a.isNullAt(i)) null
      else {
        val inner = a.getArray(i)
        (0 until inner.numElements()).map(j =>
          if (inner.isNullAt(j)) null else inner.getUTF8String(j).toString).toArray
      }
    }.toArray
  }

  test("GZIP and ZSTD codecs: pages through the in-house inflate/zstd") {
    val df = spark.range(0, 6000).select(
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id") * 3 - 11).as("k"),
      concat(lit("v"), (col("id") % 50).cast("string")).as("s"))
    (for {
      codec <- Seq("gzip", "zstd")
      extra <- Seq(Map.empty[String, String],
        Map("parquet.enable.dictionary" -> "false"),
        Map("parquet.writer.version" -> "v2"))
    } yield Map("compression" -> codec) ++ extra)
      .foreach { opts =>
        val b = writeAndRead(df, opts)
        val want = df.collect()
        val k = longs(b, "k"); val s = strings(b, "s")
        assert(k != null && s != null, s"declined under $opts")
        want.zipWithIndex.foreach { case (r, i) =>
          assert(k(i) === (if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))), s"k@$i $opts")
          assert(s(i) === r.getString(1), s"s@$i $opts")
        }
      }
  }

  test("LIST columns: 3-level shape, nulls at every level, all codecs") {
    val df = spark.range(0, 3000).select(col("id"),
      when(col("id") % 11 === 0, lit(null)) // null list
        .when(col("id") % 7 === 0, array()) // empty list
        .otherwise(transform(sequence(lit(0), pmod(col("id"), lit(5))),
          x => when(x === 2, lit(null)).otherwise(col("id") * 10 + x)))
        .as("xs"),
      when(col("id") % 13 === 0, lit(null))
        .otherwise(transform(sequence(lit(0), pmod(col("id"), lit(3))),
          x => concat(lit("e"), x.cast("string"))))
        .as("ss"))
    val want = df.select("xs", "ss").collect()
    for {
      codec <- Seq("snappy", "gzip", "none")
      version <- Seq("v1", "v2")
    } {
      val b = writeAndRead(df, Map("compression" -> codec,
        "parquet.writer.version" -> version,
        "parquet.page.size" -> "4096")) // many pages → records split mid-page
      val xs = int64Lists(b, "xs")
      val ss = stringLists(b, "ss")
      assert(xs != null && ss != null, s"list declined $codec/$version")
      assert(xs.length === 3000 && ss.length === 3000)
      want.zipWithIndex.foreach { case (r, i) =>
        val wantXs = if (r.isNullAt(0)) null
          else r.getSeq[Any](0).map(v =>
            if (v == null) null else java.lang.Long.valueOf(v.toString.toLong)).toArray
        assert(xs(i) === wantXs, s"xs@$i $codec/$version")
        val wantSs = if (r.isNullAt(1)) null
          else r.getSeq[String](1).toArray
        assert(ss(i) === wantSs, s"ss@$i $codec/$version")
      }
    }
  }

  test("LIST columns: flat column beside a list still reads; deep nesting declines") {
    val df = spark.range(0, 500).select(col("id").as("k"),
      array(col("id"), col("id") * 2).as("xs"),
      array(array(col("id"))).as("deep"), // list<list<…>> out of scope
      struct(col("id").as("a")).as("st")) // struct out of scope
    val b = writeAndRead(df)
    assert(longs(b, "k") != null, "flat beside nested must read")
    assert(int64Lists(b, "xs") != null)
    assert(int64Lists(b, "deep") == null)
    assert(int64Lists(b, "st") == null)
    assert(longs(b, "xs") == null, "flat face must not read a list")
    assert(int64Lists(b, "k") == null, "list face must not read a flat column")
  }

  private def doubles(b: Array[Byte], name: String): Array[java.lang.Double] = {
    val a = ParquetPages.doubleValues(b,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    if (a == null) null
    else (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else java.lang.Double.valueOf(a.getDouble(i))).toArray
  }

  test("FLOAT/DOUBLE columns: plain + dictionary + lists, nulls widen") {
    val df = spark.range(0, 4000).select(
      when(col("id") % 9 === 0, lit(null))
        .otherwise(col("id") / lit(8.0) - 100.0).as("d"),
      (col("id") % 10).cast("float").as("f"),
      when(col("id") % 13 === 0, lit(null))
        .otherwise(transform(sequence(lit(0), pmod(col("id"), lit(3))),
          x => x.cast("double") / 2.0)).as("ds"))
    Seq("snappy", "none").foreach { codec =>
      val b = writeAndRead(df, Map("compression" -> codec))
      val want = df.collect()
      val d = doubles(b, "d"); val f = doubles(b, "f")
      assert(d != null && f != null, s"$codec declined")
      want.zipWithIndex.foreach { case (r, i) =>
        assert(d(i) === (if (r.isNullAt(0)) null
          else java.lang.Double.valueOf(r.getDouble(0))), s"d@$i/$codec")
        assert(f(i).doubleValue === r.getFloat(1).toDouble, s"f@$i/$codec")
      }
      val ls = ParquetPages.doubleListValues(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("ds"))
      assert(ls != null && ls.numElements() === 4000)
      want.zipWithIndex.foreach { case (r, i) =>
        if (r.isNullAt(2)) assert(ls.isNullAt(i), s"ds@$i/$codec")
        else {
          val inner = ls.getArray(i)
          val w = r.getSeq[Double](2)
          assert(inner.numElements() === w.length, s"ds@$i/$codec")
          w.indices.foreach(j =>
            assert(inner.getDouble(j) === w(j), s"ds@$i.$j/$codec"))
        }
      }
      assert(doubles(b, "nope") == null)
      assert(longs(b, "d") == null) // double via int64 face declines
    }
  }

  test("BOOLEAN columns: v1 PLAIN bit-packed and v2 RLE, with nulls") {
    val df = spark.range(0, 5000).select(
      when(col("id") % 7 === 0, lit(null))
        .otherwise(col("id") % 3 === 0).as("f"),
      (col("id") % 2 === 1).as("g")) // required-ish, no nulls
    for {
      version <- Seq("v1", "v2")
      codec <- Seq("snappy", "none")
    } {
      val b = writeAndRead(df, Map("compression" -> codec,
        "parquet.writer.version" -> version))
      val want = df.collect()
      Seq("f", "g").foreach { name =>
        val a = ParquetPages.boolValues(b,
          org.apache.spark.unsafe.types.UTF8String.fromString(name))
        assert(a != null, s"$name declined $version/$codec")
        val ci = df.columns.indexOf(name)
        want.zipWithIndex.foreach { case (r, i) =>
          if (r.isNullAt(ci)) assert(a.isNullAt(i), s"$name@$i $version/$codec")
          else assert(a.getBoolean(i) === r.getBoolean(ci),
            s"$name@$i $version/$codec")
        }
      }
      assert(longs(b, "f") == null) // bool via the long face declines
      assert(ParquetPages.boolValues(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("nope")) == null)
    }
  }

  test("INT96 timestamps: the legacy lineage decodes to epoch micros") {
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      val df = spark.range(0, 4000).select(
        when(col("id") % 9 === 0, lit(null))
          .otherwise(timestamp_micros((col("id") - 2000) * 98765432L +
            lit(86400L * 1000000L * 6000L))).as("ts")) // ~1986, sub-second
      val want = df.select(unix_micros(col("ts"))).collect()
      Seq(Map("compression" -> "snappy"), // dictionary path
        Map("compression" -> "none", "parquet.enable.dictionary" -> "false"))
        .foreach { opts =>
          val b = writeAndRead(df, opts)
          val a = ParquetPages.int96Micros(b,
            org.apache.spark.unsafe.types.UTF8String.fromString("ts"))
          assert(a != null, s"int96 declined under $opts")
          assert(a.numElements() === 4000)
          want.zipWithIndex.foreach { case (r, i) =>
            if (r.isNullAt(0)) assert(a.isNullAt(i), s"ts@$i $opts")
            else assert(a.getLong(i) === r.getLong(0), s"ts@$i $opts")
          }
          // the long/string faces must not misread INT96
          assert(longs(b, "ts") == null)
          assert(strings(b, "ts") == null)
        }
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }

  test("claim-bomb: hostile DELTA header cannot allocate past the page cap") {
    def enc(ns: Long*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      ns.foreach { n0 =>
        var v = n0
        do { val b = (v & 0x7f).toInt; v >>>= 7
          out.write(if (v != 0) b | 0x80 else b) } while (v != 0)
      }
      out.toByteArray
    }
    // blockSize 2^30, miniblocks 1 → a bit-width-0 miniblock would
    // allocate an 8 GiB long array while consuming ZERO input bytes;
    // must be rejected on the header alone, before any allocation
    val hostile = enc(1L << 30, 1L, 16L, 0L /* zigzag first value */) ++
      Array[Byte](0, 0) // minDelta + one bit-width byte of 0
    val t0 = System.nanoTime()
    intercept[RuntimeException] {
      ParquetPages.deltaBinaryPacked(new ParquetPages.Cursor(hostile, 0))
    }
    assert(System.nanoTime() - t0 < 1e9.toLong, "must fail fast, not allocate")
    // a legitimate header whose miniblock is larger than the remaining
    // values still decodes (padding skipped positionally, not allocated)
    val legit = enc(128L, 4L, 3L, 10L << 1 /* zigzag 10 */) ++
      enc(1L << 1) ++ Array[Byte](1, 0, 0, 0) ++ // minDelta=1, widths 1,0,0,0
      Array.fill[Byte](4)(0) // 32 one-bit deltas = 4 bytes
    val got = ParquetPages.deltaBinaryPacked(new ParquetPages.Cursor(legit, 0))
    assert(got.toSeq === Seq(10L, 11L, 12L))
  }

  test("map<string,bigint>: csv face with nulls, empties, mid-list page splits") {
    val df = spark.range(0, 3000).select(col("id"),
      when(col("id") % 7 === 0, lit(null))
        .when(col("id") % 5 === 0, map())
        .otherwise(map(
          lit("b"), col("id") * 2,
          lit("a"), col("id"))).as("m"))
    Seq(Map("compression" -> "none", "parquet.page.size" -> "512"),
      Map("compression" -> "snappy")).foreach { opts =>
      val b = writeAndRead(df, opts)
      val csv = ParquetPages.mapInt64Csv(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("m"))
      assert(csv != null && csv.numElements() === 3000, s"$opts declined")
      (0 until 3000).foreach { i =>
        if (i % 7 == 0) assert(csv.isNullAt(i), s"@$i")
        else if (i % 5 == 0)
          assert(csv.getUTF8String(i).toString === "", s"@$i")
        else assert(csv.getUTF8String(i).toString === s"a=$i,b=${2 * i}",
          s"@$i")
      }
    }
  }

  test("list<list<bigint>>: nested assembly, null/empty inner lists, page splits") {
    val df = spark.range(0, 2000).select(col("id"),
      when(col("id") % 11 === 0, lit(null))
        .when(col("id") % 7 === 0, array().cast("array<array<bigint>>"))
        .otherwise(array(
          array(col("id")),
          lit(null).cast("array<bigint>"),
          array().cast("array<bigint>"),
          array(col("id") + 1, lit(null).cast("bigint"), col("id") + 2)))
        .as("aa"))
    Seq(Map("compression" -> "none", "parquet.page.size" -> "512"),
      Map("compression" -> "snappy")).foreach { opts =>
      val b = writeAndRead(df, opts)
      val aa = ParquetPages.int64List2Values(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("aa"))
      assert(aa != null && aa.numElements() === 2000, s"$opts declined")
      (0 until 2000).foreach { i =>
        if (i % 11 == 0) assert(aa.isNullAt(i), s"@$i")
        else if (i % 7 == 0)
          assert(aa.getArray(i).numElements() === 0, s"@$i")
        else {
          val outer = aa.getArray(i)
          assert(outer.numElements() === 4, s"@$i")
          assert(outer.getArray(0).getLong(0) === i.toLong, s"@$i")
          assert(outer.isNullAt(1), s"@$i")
          assert(outer.getArray(2).numElements() === 0, s"@$i")
          val last = outer.getArray(3)
          assert(last.numElements() === 3 && last.getLong(0) === i + 1L &&
            last.isNullAt(1) && last.getLong(2) === i + 2L, s"@$i")
        }
      }
      // depth mismatches decline: 2-level face on a flat column and
      // 1-level face on the 2-level column
      assert(ParquetPages.int64List2Values(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("id")) == null)
      assert(ParquetPages.int64ListValues(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("aa")) == null)
    }
  }

  test("map<int,bigint>: integer keys sort numerically in the csv face") {
    val df = spark.range(0, 500).select(col("id"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(map(
          lit(1000), col("id") * 3, // >2-digit keys: numeric vs lexicographic
          lit(2), col("id"))).as("m"))
    val b = writeAndRead(df, Map("compression" -> "snappy"))
    val csv = ParquetPages.mapInt64Csv(b,
      org.apache.spark.unsafe.types.UTF8String.fromString("m"))
    assert(csv != null && csv.numElements() === 500)
    (0 until 500).foreach { i =>
      if (i % 7 == 0) assert(csv.isNullAt(i), s"@$i")
      else assert(csv.getUTF8String(i).toString === s"2=$i,1000=${3 * i}",
        s"@$i") // 2 before 1000: NUMERIC order, not lexicographic
    }
  }

  test("struct dotted paths: nested fields, struct-in-list, null structs") {
    val df = spark.range(0, 2000).select(col("id"),
      when(col("id") % 3 === 0, lit(null)).otherwise(struct(
        (col("id") * 2).as("a"),
        concat(lit("s"), col("id").cast("string")).as("b"),
        struct((col("id") + 7).as("c")).as("inner"))).as("st"),
      array(struct(col("id").as("x")),
        struct((col("id") * 10).as("x"))).as("arr"))
    val b = writeAndRead(df, Map("compression" -> "snappy"))
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val as = longs(b, "st.a")
    val bs = strings(b, "st.b")
    val cs = longs(b, "st.inner.c")
    assert(as != null && bs != null && cs != null)
    (0 until 2000).foreach { i =>
      if (i % 3 == 0) {
        assert(as(i) == null && bs(i) == null && cs(i) == null, s"@$i")
      } else {
        assert(as(i).longValue === i * 2L, s"@$i")
        assert(bs(i) === s"s$i", s"@$i")
        assert(cs(i).longValue === i + 7L, s"@$i")
      }
    }
    // struct-in-list: field extraction through the list face
    val xs = ParquetPages.int64ListValues(b, u("arr.x"))
    assert(xs != null)
    (0 until 2000).foreach { i =>
      val inner = xs.getArray(i)
      assert(inner.numElements() === 2 &&
        inner.getLong(0) === i.toLong && inner.getLong(1) === i * 10L, s"@$i")
    }
    // the struct itself (or a partial path) still declines
    assert(longs(b, "st") == null)
    assert(longs(b, "st.inner") == null)
    assert(longs(b, "st.nope") == null)
  }

  test("declines: missing column, type mismatch, struct subfield, corruption") {
    val flat = spark.range(0, 100).select(col("id").as("k"),
      col("id").cast("string").as("s"))
    val b = writeAndRead(flat)
    assert(longs(b, "nope") == null)
    assert(longs(b, "s") == null) // string column via int64 face
    assert(strings(b, "k") == null) // int column via string face
    val nested = spark.range(0, 10)
      .select(struct(col("id").as("a")).as("st"), col("id").as("k"))
    val nb = writeAndRead(nested)
    assert(longs(nb, "k") != null) // flat leaf beside a struct READS now
    assert(longs(nb, "st") == null) // the struct itself declines
    assert(longs(nb, "a") == null) // struct subfield is not a top-level name
    // corruption fuzz over the page region: decline-or-differ, never throw
    (0 until math.min(b.length - 8, 2000) by 7).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x6d).toByte
      longs(c, "k")
    }
  }

  test("sparse legitimacy: an all-null RLE column denser than 64 values/byte reads") {
    // 1M all-null rows RLE-compress to a file of a few KB, far past any
    // values-per-file-byte density bound — the claim must NOT decline it
    // (regression: the round-17 64×fileBytes cap silently nulled these)
    val df = spark.range(0, 1000000).select(lit(null).cast("long").as("k"))
    val b = writeAndRead(df, Map("compression" -> "snappy"))
    assert(1000000L > 64L * b.length, s"fixture not sparse enough: ${b.length}")
    val k = longs(b, "k")
    assert(k != null && k.length === 1000000)
    assert(k.forall(_ == null))
    // mostly-null with a few real values: the lazy level growth still
    // assembles the survivors at the right ordinals
    val df2 = spark.range(0, 500000).select(
      when(col("id") % 100000 === 7, col("id")).otherwise(lit(null))
        .as("k"))
    val b2 = writeAndRead(df2, Map("compression" -> "snappy"))
    val k2 = longs(b2, "k")
    assert(k2 != null && k2.length === 500000)
    (0 until 500000).foreach { i =>
      if (i % 100000 == 7) assert(k2(i).longValue === i.toLong)
      else assert(k2(i) == null)
    }
  }
}
