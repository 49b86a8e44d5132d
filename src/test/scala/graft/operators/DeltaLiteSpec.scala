package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths, StandardCopyOption}

/** DeltaLite against hand-built tables following the public Delta
  * protocol: replay order, tombstones + re-adds, time travel,
  * partition-column reconstruction, checkpoint + post-checkpoint
  * commits, and the protocol gate. */
class DeltaLiteSpec extends SparkSpec {
  import spark.implicits._

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def writePart(df: org.apache.spark.sql.DataFrame, dir: String,
                        name: String): Long = {
    val tmp = Files.createTempDirectory("dlpart").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = Paths.get(dir, name)
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.size(dest)
  }

  private def commit(dir: String, v: Long, lines: Seq[String]): Unit = {
    val p = Paths.get(dir, "_delta_log", f"$v%020d.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p, lines.mkString("\n") + "\n")
  }

  private def addJson(path: String, pv: Map[String, String],
                      size: Long): String =
    s"""{"add":{"path":"$path","partitionValues":{${
      pv.map { case (k, x) => s""""$k":"$x"""" }.mkString(",")
    }},"size":$size,"dataChange":true}}"""

  private def removeJson(path: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":1,"dataChange":true}}"""

  private def metaJson(schema: StructType, partCols: Seq[String]): String =
    s"""{"metaData":{"id":"t","schemaString":"${esc(schema.json)}",""" +
      s""""partitionColumns":[${partCols.map(c => s""""$c"""").mkString(",")}]}}"""

  private val protoJson =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  /** Builds a 3-commit partitioned table; returns its dir. Commits:
    * v0 = meta + parts p=a (1..10), p=b (11..20); v1 = p=c (21..30) +
    * a SECOND file for p=a (31..40); v2 = remove the p=b file. */
  private def buildTable(): String = {
    val dir = Files.createTempDirectory("dltab").toString
    def part(lo: Int, hi: Int) =
      spark.range(lo, hi + 1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    val schema = StructType.fromDDL("k BIGINT, s STRING, p STRING")
    val sa = writePart(part(1, 10), dir, "part-a.parquet")
    val sb = writePart(part(11, 20), dir, "part-b.parquet")
    commit(dir, 0, Seq(protoJson, metaJson(schema, Seq("p")),
      addJson("part-a.parquet", Map("p" -> "a"), sa),
      addJson("part-b.parquet", Map("p" -> "b"), sb)))
    val sc = writePart(part(21, 30), dir, "part-c.parquet")
    val sa2 = writePart(part(31, 40), dir, "part-a2.parquet")
    commit(dir, 1, Seq(
      addJson("part-c.parquet", Map("p" -> "c"), sc),
      addJson("part-a2.parquet", Map("p" -> "a"), sa2)))
    commit(dir, 2, Seq(removeJson("part-b.parquet")))
    dir
  }

  test("snapshot replay: adds, tombstone, partition columns") {
    val dir = buildTable()
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq === Seq("k", "s", "p"))
    val got = snap.select("k", "p").as[(Long, String)].collect().sorted
    val want = ((1 to 10) ++ (31 to 40)).map(i => (i.toLong, "a")) ++
      (21 to 30).map(i => (i.toLong, "c"))
    assert(got === want.sorted.toArray) // p=b tombstoned at v2
    assert(DeltaLite.latestVersion(spark, dir) === 2L)
  }

  test("time travel replays a prefix; re-add resurrects a path") {
    val dir = buildTable()
    val v1 = DeltaLite.snapshot(spark, dir, versionAsOf = 1)
    assert(v1.count() === 40) // p=b still live at v1
    assert(v1.filter(col("p") === "b").count() === 10)
    val v0 = DeltaLite.snapshot(spark, dir, versionAsOf = 0)
    assert(v0.count() === 20)
    // v3 re-adds the tombstoned file: it must come back
    commit(dir, 3, Seq(addJson("part-b.parquet", Map("p" -> "b"), 1)))
    assert(DeltaLite.snapshot(spark, dir)
      .filter(col("p") === "b").count() === 10)
  }

  test("checkpoint: parquet snapshot + post-checkpoint commits replay") {
    val dir = buildTable()
    // write a checkpoint at v2 from the json commits themselves, then
    // DELETE the pre-checkpoint jsons — replay MUST go through it
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, " +
        "size: BIGINT, dataChange: BOOLEAN>, " +
        "remove STRUCT<path: STRING, deletionTimestamp: BIGINT, " +
        "dataChange: BOOLEAN>, " +
        "metaData STRUCT<id: STRING, schemaString: STRING, " +
        "partitionColumns: ARRAY<STRING>>, " +
        "protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>")
    val logs = (0 to 2).map(v => s"$dir/_delta_log/" + f"$v%020d.json")
    // checkpoint semantics: only LIVE adds + latest meta/protocol
    val acts = spark.read.schema(schema).json(logs: _*)
    val cp = acts.filter(col("metaData").isNotNull ||
        col("protocol").isNotNull ||
        (col("add").isNotNull && !col("add.path").isin("part-b.parquet")))
    val tmp = Files.createTempDirectory("dlcp").toString
    cp.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath,
      Paths.get(dir, "_delta_log", f"${2L}%020d.checkpoint.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":2,"size":5}""")
    logs.foreach(l => Files.delete(Paths.get(l)))
    assert(DeltaLite.snapshot(spark, dir).count() === 30)
    // a post-checkpoint commit still replays on top
    commit(dir, 3, Seq(removeJson("part-c.parquet")))
    assert(DeltaLite.snapshot(spark, dir).count() === 20)
    assert(DeltaLite.snapshot(spark, dir)
      .agg(sum("k")).as[Long].head() === ((1 to 10) ++ (31 to 40)).sum)
  }

  test("stats file-skipping: pruned snapshot touches only intersecting files") {
    val dir = Files.createTempDirectory("dlprune").toString
    def part(lo: Int, hi: Int) =
      spark.range(lo, hi + 1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    val schema = StructType.fromDDL("k BIGINT, s STRING")
    def addWithStats(path: String, size: Long, mn: Int, mx: Int,
                     n: Int): String =
      s"""{"add":{"path":"$path","partitionValues":{},"size":$size,""" +
        s""""dataChange":true,"stats":"{\\"numRecords\\":$n,""" +
        s"""\\"minValues\\":{\\"k\\":$mn},\\"maxValues\\":{\\"k\\":$mx}}"}}"""
    val sizes = Seq((1, 100), (101, 200), (201, 300), (301, 400)).zipWithIndex
      .map { case ((lo, hi), i) =>
        (writePart(part(lo, hi), dir, s"f$i.parquet"), lo, hi, i)
      }
    commit(dir, 0, Seq(protoJson, metaJson(schema, Seq.empty)) ++
      sizes.map { case (sz, lo, hi, i) =>
        if (i == 3) // one file WITHOUT stats: must be kept conservatively
          s"""{"add":{"path":"f$i.parquet","partitionValues":{},""" +
            s""""size":$sz,"dataChange":true}}"""
        else addWithStats(s"f$i.parquet", sz, lo, hi, hi - lo + 1)
      })
    val p = DeltaLite.prunedSnapshot(spark, dir, "k", 120L, 180L)
    assert(p.nFiles === 4)
    assert(p.keptFiles === 2) // f1 (intersects) + f3 (no stats)
    val ks = p.data.filter(col("k").between(120, 180))
      .select("k").as[Long].collect().sorted
    assert(ks === (120L to 180L).toArray) // pruning is sound
    // a range past all stats keeps only the stats-less file
    val far = DeltaLite.prunedSnapshot(spark, dir, "k", 5000L, 6000L)
    assert(far.keptFiles === 1)
    // unpruned face unchanged
    assert(DeltaLite.snapshot(spark, dir).count() === 400)
  }

  test("protocol gate: reader features beyond base decline loudly") {
    val dir = buildTable()
    commit(dir, 3, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}"""))
    intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, dir)
    }
    // time travel BEFORE the upgrade still works
    assert(DeltaLite.snapshot(spark, dir, versionAsOf = 2).count() === 30)
  }

  private val fullSchema = StructType.fromDDL(
    "add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, " +
      "size: BIGINT, dataChange: BOOLEAN, stats: STRING>, " +
      "remove STRUCT<path: STRING, deletionTimestamp: BIGINT, " +
      "dataChange: BOOLEAN>, " +
      "metaData STRUCT<id: STRING, schemaString: STRING, " +
      "partitionColumns: ARRAY<STRING>>, " +
      "protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT, " +
      "readerFeatures: ARRAY<STRING>>, " +
      "sidecar STRUCT<path: STRING, sizeInBytes: BIGINT>")

  /** Writes one parquet file of actions (from JSON lines) at `rel`
    * under the table dir. */
  private def writeActions(dir: String, rel: String,
                           lines: Seq[String]): Unit = {
    val tmp = Files.createTempDirectory("dlacts").toString
    spark.read.schema(fullSchema).json(lines.toDS())
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = Paths.get(dir, rel)
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
  }

  private val schema3 = StructType.fromDDL("k BIGINT, s STRING, p STRING")

  test("multi-part checkpoint: all parts replay; incomplete sets are ignored") {
    val dir = buildTable()
    val live = Seq(("part-a.parquet", "a"), ("part-c.parquet", "c"),
      ("part-a2.parquet", "a"))
    val metaLines = Seq(protoJson, metaJson(schema3, Seq("p")))
    writeActions(dir, "_delta_log/" + f"${2L}%020d.checkpoint." +
      f"${1L}%010d.${2L}%010d.parquet",
      metaLines :+ addJson(live.head._1, Map("p" -> live.head._2), 1))
    writeActions(dir, "_delta_log/" + f"${2L}%020d.checkpoint." +
      f"${2L}%010d.${2L}%010d.parquet",
      live.tail.map { case (f, p) => addJson(f, Map("p" -> p), 1) })
    (0 to 2).foreach(v =>
      Files.delete(Paths.get(dir, "_delta_log", f"$v%020d.json")))
    assert(DeltaLite.snapshot(spark, dir).count() === 30)
    // post-checkpoint commit replays on top
    commit(dir, 3, Seq(removeJson("part-c.parquet")))
    assert(DeltaLite.snapshot(spark, dir).count() === 20)
    // delete one part: the incomplete checkpoint must be IGNORED, and
    // with no jsons before it the replay is unanchored → loud error
    Files.delete(Paths.get(dir, "_delta_log", f"${2L}%020d.checkpoint." +
      f"${2L}%010d.${2L}%010d.parquet"))
    val e = intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("anchored"))
  }

  test("v2 checkpoint: sidecar replay + readerFeatures gate") {
    val dir = buildTable()
    val uuid = "0f8fad5b-d9cb-469f-a165-70867728950e"
    val scName = "3fa85f64-5717-4562-b3fc-2c963f66afa6.parquet"
    val protoV3 =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"]}}"""
    writeActions(dir, "_delta_log/" + f"${2L}%020d.checkpoint.$uuid.parquet",
      Seq(protoV3, metaJson(schema3, Seq("p")),
        s"""{"sidecar":{"path":"$scName","sizeInBytes":1}}"""))
    writeActions(dir, s"_delta_log/_sidecars/$scName",
      Seq(addJson("part-a.parquet", Map("p" -> "a"), 1),
        addJson("part-c.parquet", Map("p" -> "c"), 1)))
    (0 to 2).foreach(v =>
      Files.delete(Paths.get(dir, "_delta_log", f"$v%020d.json")))
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.count() === 20) // only the sidecar's two files live
    assert(snap.select("p").distinct().as[String].collect().sorted
      === Array("a", "c"))
    // an unknown reader feature raises, even with a readable layout
    commit(dir, 3, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint","timestampNtz"]}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("timestampNtz"))
  }

  test("string stats pruning: lexicographic bounds skip files") {
    val dir = Files.createTempDirectory("dlsprune").toString
    def part(lo: Int, hi: Int, tag: String) =
      spark.range(lo, hi + 1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"),
        lit(tag).as("tag"))
    val schema = StructType.fromDDL("k BIGINT, s STRING, tag STRING")
    val tags = Seq("alpha", "bravo", "carol", "delta")
    val adds = tags.zipWithIndex.map { case (tag, i) =>
      val sz = writePart(part(i * 100 + 1, (i + 1) * 100, tag), dir,
        s"f$i.parquet")
      if (i == 3) // stats-less file: conservatively kept
        s"""{"add":{"path":"f$i.parquet","partitionValues":{},""" +
          s""""size":$sz,"dataChange":true}}"""
      else
        s"""{"add":{"path":"f$i.parquet","partitionValues":{},""" +
          s""""size":$sz,"dataChange":true,"stats":"{\\"numRecords\\":100,""" +
          s"""\\"minValues\\":{\\"tag\\":\\"$tag\\"},""" +
          s"""\\"maxValues\\":{\\"tag\\":\\"$tag\\"}}"}}"""
    }
    commit(dir, 0, Seq(protoJson, metaJson(schema, Seq.empty)) ++ adds)
    val p = DeltaLite.prunedSnapshotString(spark, dir, "tag", "b", "bz")
    assert(p.nFiles === 4)
    assert(p.keptFiles === 2) // bravo + the stats-less delta file
    assert(p.data.filter(col("tag") === "bravo").count() === 100)
    // a range past every bound keeps only the stats-less file
    assert(DeltaLite.prunedSnapshotString(spark, dir, "tag", "zz", "zzz")
      .keptFiles === 1)
  }

  // ---- deletion-vector fixtures (real org.roaringbitmap bytes) ----

  private def dvData(positions: Seq[Long]): Array[Byte] = {
    val rb = new org.roaringbitmap.RoaringBitmap()
    positions.foreach(p => rb.add(p.toInt))
    rb.runOptimize()
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(k => out.write((v >>> (8 * k)) & 0xff))
    le32(graft.functions.DeletionVectors.PortableMagic)
    le32(1); le32(0)
    rb.serialize(new java.io.DataOutputStream(out))
    out.toByteArray
  }

  private def dvFileBytes(data: Array[Byte], padding: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(1)
    (0 until padding).foreach(_ => out.write(0x77))
    def be32(v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >>> (8 * k)) & 0xff).toInt))
    be32(data.length.toLong)
    out.write(data)
    val crc = new java.util.zip.CRC32
    crc.update(data)
    be32(crc.getValue)
    out.toByteArray
  }

  private def b85Encode(b0: Array[Byte]): String = {
    // zero-pad the final block like Delta's codec (the descriptor's
    // sizeInBytes carries the true length)
    val b = java.util.Arrays.copyOf(b0, (b0.length + 3) / 4 * 4)
    val alpha = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
    b.grouped(4).map { g =>
      var v = 0L
      g.foreach(x => v = (v << 8) | (x & 0xffL))
      (4 to 0 by -1).map(k =>
        alpha(((v / math.pow(85, k).toLong) % 85).toInt)).mkString
    }.mkString
  }

  test("deletion vectors: p / u / inline storage all anti-join row ordinals") {
    val dir = buildTable()
    def addDv(path: String, pv: String, storage: String, poi: String,
              offset: Int, size: Int, card: Long): String =
      s"""{"add":{"path":"$path","partitionValues":{"p":"$pv"},""" +
        s""""size":1,"dataChange":false,"deletionVector":{""" +
        s""""storageType":"$storage","pathOrInlineDv":"$poi",""" +
        s""""offset":$offset,"sizeInBytes":$size,"cardinality":$card}}}"""
    // p-storage: delete part-a positions 0,2,4 (k = 1,3,5)
    val dA = dvData(Seq(0L, 2L, 4L))
    Files.write(Paths.get(dir, "dv-a.bin"), dvFileBytes(dA, padding = 2))
    // u-storage: delete part-c positions 0,1 (k = 21,22)
    val dC = dvData(Seq(0L, 1L))
    val uuidBytes = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    val bb = java.nio.ByteBuffer.wrap(uuidBytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong).toString
    Files.write(Paths.get(dir, s"deletion_vector_$uuid.bin"),
      dvFileBytes(dC, padding = 0))
    // inline: delete part-a2 position 9 (k = 40)
    val dA2 = dvData(Seq(9L))
    commit(dir, 3, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"]}}""",
      addDv("part-a.parquet", "a", "p", "dv-a.bin", 3, dA.length, 3L),
      addDv("part-c.parquet", "c", "u", b85Encode(uuidBytes), 1,
        dC.length, 2L),
      addDv("part-a2.parquet", "a", "i", b85Encode(dA2), 0,
        dA2.length, 1L)))
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.count() === 24) // 30 live - 3 - 2 - 1
    val aks = snap.filter(col("p") === "a" && col("k") <= 10)
      .select("k").as[Long].collect().sorted
    assert(aks === Array(2L, 4L, 6L, 7L, 8L, 9L, 10L))
    val cks = snap.filter(col("p") === "c").select("k")
      .as[Long].collect().sorted
    assert(cks === (23L to 30L).toArray)
    assert(snap.filter(col("k") === 40).count() === 0)
    // time travel BEFORE the DV commit sees every row
    assert(DeltaLite.snapshot(spark, dir, versionAsOf = 2).count() === 30)
    // a cardinality lie is loud, never a silent misapply
    commit(dir, 4, Seq(
      addDv("part-a.parquet", "a", "p", "dv-a.bin", 3, dA.length, 99L)))
    val e = intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("cardinality"))
  }

  test("column mapping (name mode): physical parquet names read as logical") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("dlcmap").toString
    def phys(logical: String, p: String, dt: DataType): StructField =
      StructField(logical, dt, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", p)
          .putLong("delta.columnMapping.id", logical.length.toLong)
          .build())
    val schema = StructType(Seq(
      phys("k", "col-9f1a", LongType),
      phys("s", "col-22bc", StringType),
      phys("p", "col-7d03", StringType)))
    def part(lo: Int, hi: Int) =
      spark.range(lo, hi + 1).select(col("id").as("col-9f1a"),
        concat(lit("s"), col("id").cast("string")).as("col-22bc"))
    val sa = writePart(part(1, 10), dir, "part-a.parquet")
    val sb = writePart(part(11, 20), dir, "part-b.parquet")
    def metaCmap(mode: String): String =
      s"""{"metaData":{"id":"t","schemaString":"${esc(schema.json)}",""" +
        s""""partitionColumns":["p"],"configuration":{""" +
        s""""delta.columnMapping.mode":"$mode",""" +
        s""""delta.columnMapping.maxColumnId":"3"}}}"""
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaCmap("name"),
      // partitionValues keyed by the PHYSICAL partition column name
      addJson("part-a.parquet", Map("col-7d03" -> "a"), sa),
      addJson("part-b.parquet", Map("col-7d03" -> "b"), sb)))
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq === Seq("k", "s", "p"))
    val got = snap.select("k", "s", "p").as[(Long, String, String)]
      .collect().sorted
    assert(got.length === 20)
    assert(got.head === ((1L, "s1", "a")))
    assert(got.last === ((20L, "s20", "b")))
    assert(snap.filter(col("p") === "b").agg(sum("k")).as[Long].head()
      === (11 to 20).sum.toLong)
    // id mode without the session's field-id read support: loud
    // guidance (pin the conf OFF — IcebergLite's evolution reader may
    // have auto-enabled it earlier in this shared session)
    commit(dir, 1, Seq(metaCmap("id")))
    val prev = spark.conf.getOption("spark.sql.parquet.fieldId.read.enabled")
    spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
    try {
      val e = intercept[IllegalArgumentException] {
        DeltaLite.snapshot(spark, dir)
      }
      assert(e.getMessage.contains("fieldId.read.enabled"))
    } finally prev.foreach(
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", _))
  }

  test("column mapping (id mode): parquet field ids resolve renamed files") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("dlcmid").toString
    // the FILE's columns are named f_one/f_two — only the field ids
    // (1, 2) tie them to the table schema
    def idMeta(id: Long) =
      new MetadataBuilder().putLong("parquet.field.id", id).build()
    val fileDf = spark.range(1, 21).select(
      col("id").as("f_one", idMeta(1)),
      concat(lit("v"), col("id").cast("string")).as("f_two", idMeta(2)))
    val prevW = spark.conf.getOption("spark.sql.parquet.fieldId.write.enabled")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val sa = try writePart(fileDf, dir, "part-a.parquet")
      finally prevW match {
        case Some(v) => spark.conf.set("spark.sql.parquet.fieldId.write.enabled", v)
        case None => spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
      }
    def phys(logical: String, p: String, id: Long, dt: DataType) =
      StructField(logical, dt, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", p)
          .putLong("delta.columnMapping.id", id)
          .build())
    val schema = StructType(Seq(
      phys("k", "col-aa", 1L, LongType),
      phys("s", "col-bb", 2L, StringType)))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"t","schemaString":"${esc(schema.json)}",""" +
        s""""partitionColumns":[],"configuration":{""" +
        s""""delta.columnMapping.mode":"id",""" +
        s""""delta.columnMapping.maxColumnId":"2"}}}""",
      addJson("part-a.parquet", Map.empty, sa)))
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try {
      val snap = DeltaLite.snapshot(spark, dir)
      assert(snap.schema.fieldNames.toSeq === Seq("k", "s"))
      assert(snap.agg(sum("k")).as[Long].head() === (1 to 20).sum.toLong)
      assert(snap.filter(col("k") === 7).select("s").as[String].head()
        === "v7")
    } finally spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
  }

  test("column mapping renames recursively through nested struct/array types") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("dlcmnest").toString
    // the FILE carries physical col-… names at EVERY nesting level
    val fileDf = spark.range(1, 21).select(
      col("id").as("col-k"),
      struct((col("id") * 10).as("col-na"),
        concat(lit("n"), col("id").cast("string")).as("col-nb"))
        .as("col-rec"),
      array(struct((col("id") * 2).as("col-ea"))).as("col-arr"))
    val sa = writePart(fileDf, dir, "part-a.parquet")
    def pf(logical: String, p: String, id: Long, dt: DataType) =
      StructField(logical, dt, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", p)
          .putLong("delta.columnMapping.id", id).build())
    val nested = StructType(Seq(pf("a", "col-na", 10, LongType),
      pf("b", "col-nb", 11, StringType)))
    val arrElem = StructType(Seq(pf("ea", "col-ea", 12, LongType)))
    val schema = StructType(Seq(
      pf("k", "col-k", 1, LongType),
      pf("rec", "col-rec", 2, nested),
      pf("arr", "col-arr", 3, ArrayType(arrElem))))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"t","schemaString":"${esc(schema.json)}",""" +
        s""""partitionColumns":[],"configuration":{""" +
        s""""delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"12"}}}""",
      addJson("part-a.parquet", Map.empty, sa)))
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq === Seq("k", "rec", "arr"))
    // nested fields surface under their LOGICAL names with real values
    // (regression: a top-level-only rename silently nulled them)
    assert(snap.schema("rec").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("a", "b"))
    val got = snap.agg(sum(col("rec.a")), min(col("rec.b")),
      sum(element_at(col("arr"), 1).getField("ea"))).collect().head
    assert(got.getLong(0) === (1 to 20).map(_ * 10L).sum)
    assert(got.getString(1) === "n1")
    assert(got.getLong(2) === (1 to 20).map(_ * 2L).sum)
    // a nested field missing its physicalName declines loudly
    val bad = StructType(Seq(
      pf("k", "col-k", 1, LongType),
      pf("rec", "col-rec", 2, StructType(Seq(
        pf("a", "col-na", 10, LongType),
        StructField("b", StringType))))))
    commit(dir, 1, Seq(
      s"""{"metaData":{"id":"t","schemaString":"${esc(bad.json)}",""" +
        s""""partitionColumns":[],"configuration":{""" +
        s""""delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"12"}}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("physicalName"))
  }

  test("commitAppend: written tables replay, prune, and time-travel like read ones") {
    val dir = Files.createTempDirectory("dlwrite").toString
    // p = k/34 → per-partition files carry DISJOINT k ranges, so the
    // written stats actually prune
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).coalesce(1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"),
        (col("id") / 34).cast("long").cast("string").as("p"))
    assert(DeltaLite.commitAppend(spark, dir, batch(1, 100),
      partitionBy = Seq("p")) === 0L)
    assert(DeltaLite.commitAppend(spark, dir, batch(101, 150),
      partitionBy = Seq("p")) === 1L)
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.count() === 150)
    assert(snap.agg(sum("k")).head().getLong(0) === (1L to 150L).sum)
    assert(snap.filter(col("p") === "1").count() === 34) // k 34..67
    assert(snap.filter(col("k") === 120).select("s").as[String].head()
      === "s120")
    // time travel: version 0 sees only the first batch
    assert(DeltaLite.snapshot(spark, dir, versionAsOf = 0)
      .count() === 100)
    // the WRITTEN stats prune: [40, 50] lives only in v0's p=1 file
    val p = DeltaLite.prunedSnapshot(spark, dir, "k", 40L, 50L)
    assert(p.keptFiles === 1 && p.nFiles >= 6)
    assert(p.data.filter(col("k").between(40, 50)).count() === 11)
    // string stats prune too
    val ps = DeltaLite.prunedSnapshotString(spark, dir, "s", "s99", "s99")
    assert(ps.keptFiles < ps.nFiles)
    assert(ps.data.filter(col("s") === "s99").count() === 1)
    // CDF over the written table
    val ch = DeltaLite.changes(spark, dir, 1, 1)
    assert(ch.count() === 50)
    assert(ch.select("_change_type").distinct().as[String].collect()
      === Array("insert"))
    // schema / partitioning mismatches decline loudly
    intercept[IllegalArgumentException] {
      DeltaLite.commitAppend(spark, dir,
        batch(1, 5).withColumnRenamed("s", "t"), Seq("p"))
    }
    intercept[IllegalArgumentException] {
      DeltaLite.commitAppend(spark, dir, batch(1, 5), Seq.empty)
    }
  }

  test("commitCompact: content-identical, fewer files, invisible to CDF") {
    val dir = Files.createTempDirectory("dlcompact").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).repartition(4).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    DeltaLite.commitAppend(spark, dir, batch(1, 100))
    DeltaLite.commitAppend(spark, dir, batch(101, 150))
    val pre = DeltaLite.prunedSnapshot(spark, dir, "k",
      Long.MinValue, Long.MaxValue)
    assert(pre.nFiles >= 8) // 4 parts per append
    val v2 = DeltaLite.commitCompact(spark, dir)
    assert(v2 === 2L)
    val post = DeltaLite.prunedSnapshot(spark, dir, "k",
      Long.MinValue, Long.MaxValue)
    assert(post.nFiles === 1) // coalesced
    assert(post.data.count() === 150)
    assert(post.data.agg(sum("k")).head().getLong(0) === (1L to 150L).sum)
    // compaction is INVISIBLE to incremental consumers
    assert(DeltaLite.changes(spark, dir, v2, v2).count() === 0)
    assert(DeltaLite.changes(spark, dir, 0, v2).count() === 150)
    // pre-compaction versions still time-travel to the old layout
    assert(DeltaLite.snapshot(spark, dir, versionAsOf = 1)
      .count() === 150)
    // the rewritten file's stats still prune
    val ps = DeltaLite.prunedSnapshotString(spark, dir, "s", "s5", "s5")
    assert(ps.keptFiles === 1)
    assert(ps.data.filter(col("s") === "s5").count() === 1)
  }

  test("commitCheckpoint: classic checkpoint anchors replay through log cleanup") {
    val dir = Files.createTempDirectory("dlcp").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).coalesce(1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    DeltaLite.commitAppend(spark, dir, batch(1, 50))   // v0
    DeltaLite.commitAppend(spark, dir, batch(51, 80))  // v1
    DeltaLite.commitCompact(spark, dir)                // v2: tombstones
    DeltaLite.commitAppend(spark, dir, batch(81, 100)) // v3
    val cpv = DeltaLite.commitCheckpoint(spark, dir)
    assert(cpv === 3L)
    val hint = Files.readString(
      Paths.get(dir, "_delta_log", "_last_checkpoint"))
    assert(hint.contains("\"version\":3"))
    // the checkpoint carries reconciled state: live adds (compacted
    // file + v3's), the compaction's tombstones, metaData, protocol
    val cp = spark.read.parquet(
      Paths.get(dir, "_delta_log",
        f"${3L}%020d.checkpoint.parquet").toString)
    assert(cp.filter(col("add").isNotNull).count() === 2)
    assert(cp.filter(col("remove").isNotNull).count() === 2)
    assert(cp.filter(col("metaData").isNotNull).count() === 1)
    assert(cp.filter(col("protocol").isNotNull).count() === 1)
    assert(DeltaLite.snapshot(spark, dir).count() === 100)
    DeltaLite.commitAppend(spark, dir, batch(101, 110)) // v4
    // cleanup deletes exactly the commits the checkpoint covers
    assert(DeltaLite.cleanLog(spark, dir) === 4)
    assert(DeltaLite.snapshot(spark, dir).count() === 110)
    assert(DeltaLite.snapshot(spark, dir).agg(sum("k"))
      .head().getLong(0) === (1L to 110L).sum)
    // version travel AT the checkpoint works; BEFORE it declines
    assert(DeltaLite.snapshot(spark, dir, versionAsOf = 3)
      .count() === 100)
    intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, dir, versionAsOf = 1).count()
    }
    // CDF needs the full JSON history — loud decline, not a partial feed
    intercept[IllegalArgumentException] {
      DeltaLite.changes(spark, dir, 0, 4)
    }
    // the next append numbers FROM the checkpoint, never restarts at 0
    val v5 = DeltaLite.commitAppend(spark, dir, batch(111, 115))
    assert(v5 === 5L)
    assert(DeltaLite.snapshot(spark, dir).count() === 115)
    // checkpointed adds keep their stats: pruning still file-skips
    val p = DeltaLite.prunedSnapshot(spark, dir, "k", 112L, 113L)
    assert(p.keptFiles === 1)
    // a second checkpoint at v5, then full cleanup, still replays
    assert(DeltaLite.commitCheckpoint(spark, dir) === 5L)
    assert(DeltaLite.cleanLog(spark, dir) === 2) // v4, v5
    assert(DeltaLite.snapshot(spark, dir).count() === 115)
  }

  test("commitCheckpoint declines: v2Checkpoint feature, txn state") {
    // a v2Checkpoint-featured table expects v2 checkpoints
    val dir = Files.createTempDirectory("dlcpv2").toString
    val sa = writePart(spark.range(1, 11).select(col("id").as("k")),
      dir, "part-a.parquet")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"t","schemaString":"${esc(schema.json)}",""" +
        """"partitionColumns":[],"configuration":{}}}""",
      addJson("part-a.parquet", Map.empty, sa)))
    val e1 = intercept[IllegalArgumentException] {
      DeltaLite.commitCheckpoint(spark, dir)
    }
    assert(e1.getMessage.contains("v2Checkpoint"))
    // txn state must be carried by a checkpoint — decline, not drop
    val dir2 = Files.createTempDirectory("dlcptxn").toString
    val sb = writePart(spark.range(1, 11).select(col("id").as("k")),
      dir2, "part-a.parquet")
    commit(dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t","schemaString":"${esc(schema.json)}",""" +
        """"partitionColumns":[],"configuration":{}}}""",
      """{"txn":{"appId":"ingest","version":7}}""",
      addJson("part-a.parquet", Map.empty, sb)))
    val e2 = intercept[IllegalArgumentException] {
      DeltaLite.commitCheckpoint(spark, dir2)
    }
    assert(e2.getMessage.contains("txn"))
  }

  test("commitDelete: copy-on-write rewrite with a precise CDF delete feed") {
    val dir = Files.createTempDirectory("dldel").toString
    val batch = spark.range(1, 101).coalesce(1).select(col("id").as("k"),
      when(col("id") % 3 === 0, lit(null))
        .otherwise(concat(lit("s"), col("id").cast("string"))).as("s"),
      (col("id") % 2).cast("string").as("g"))
    DeltaLite.commitAppend(spark, dir, batch, Seq("g")) // v0
    val v1 = DeltaLite.commitDelete(spark, dir, col("k") % 10 === 0)
    assert(v1 === 1L)
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.count() === 90)
    assert(snap.filter(col("k") % 10 === 0).count() === 0)
    assert(snap.agg(sum("k")).head().getLong(0) ===
      (1L to 100L).filter(_ % 10 != 0).sum)
    // k%10==0 is always even: the g=1 partition's file was untouched
    val log1 = Files.readString(
      Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    assert(log1.contains("\"remove\""))
    assert(!log1.contains("g=1%2F") && !log1.split("\n")
      .filter(_.contains("\"remove\"")).exists(_.contains("g=1")))
    // the CDF face is the 10 deleted rows, nothing else
    val ch = DeltaLite.changes(spark, dir, v1, v1)
    assert(ch.count() === 10)
    assert(ch.select("_change_type").distinct().as[String].collect()
      === Array("delete"))
    assert(ch.agg(sum("k")).head().getLong(0)
      === (10L to 100L by 10).sum)
    // pre-delete time travel reads the originals
    assert(DeltaLite.snapshot(spark, dir, versionAsOf = 0).count() === 100)
    // NULL-predicate rows are not matches: every null-s row survives a
    // delete keyed on s
    val v2 = DeltaLite.commitDelete(spark, dir, col("s") <= "s199")
    val snap2 = DeltaLite.snapshot(spark, dir)
    assert(snap2.filter(col("s").isNull).count() ===
      (1L to 100L).count(k => k % 3 == 0 && k % 10 != 0))
    assert(snap2.filter(col("s").isNotNull && col("s") <= "s199")
      .count() === 0)
    // a predicate matching nothing is a no-op, not an empty commit
    assert(DeltaLite.commitDelete(spark, dir, col("k") === -1L) === v2)
    // deleting EVERY row of a partition leaves no rewritten file
    val v3 = DeltaLite.commitDelete(spark, dir, col("g") === "1")
    assert(DeltaLite.snapshot(spark, dir).filter(col("g") === "1")
      .count() === 0)
    assert(DeltaLite.changes(spark, dir, v3, v3)
      .select("_change_type").distinct().as[String].collect()
      === Array("delete"))
  }

  test("commitMerge: updates rewrite matched files, inserts append, precise CDC") {
    val dir = Files.createTempDirectory("dlmerge").toString
    def row(k: Long, s: String) = (k, s, (k % 2).toString)
    val batch = spark.range(1, 21).coalesce(1).select(col("id").as("k"),
      concat(lit("s"), col("id").cast("string")).as("s"),
      (col("id") % 2).cast("string").as("g"))
    DeltaLite.commitAppend(spark, dir, batch, Seq("g")) // v0: 2 files
    val src = Seq(row(5, "upd5"), row(6, "upd6"),
      row(100, "new100"), row(101, "new101")).toDF("k", "s", "g")
    val v1 = DeltaLite.commitMerge(spark, dir, src, Seq("k"))
    assert(v1 === 1L)
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.count() === 22)
    assert(snap.filter(col("k") === 5).select("s").as[String].head()
      === "upd5")
    assert(snap.filter(col("k") === 1).select("s").as[String].head()
      === "s1")
    assert(snap.filter(col("k") >= 100).count() === 2)
    // CDC: preimage with old values, postimage with new, inserts
    val ch = DeltaLite.changes(spark, dir, v1, v1)
    assert(ch.count() === 6)
    assert(ch.filter(col("_change_type") === "update_preimage")
      .select("s").as[String].collect().sorted === Array("s5", "s6"))
    assert(ch.filter(col("_change_type") === "update_postimage")
      .select("s").as[String].collect().sorted === Array("upd5", "upd6"))
    assert(ch.filter(col("_change_type") === "insert").count() === 2)
    // an all-new-keys merge is a pure append: no tombstones written
    val v2 = DeltaLite.commitMerge(spark, dir,
      Seq(row(200, "new200")).toDF("k", "s", "g"), Seq("k"))
    val log2 = Files.readString(
      Paths.get(dir, "_delta_log", f"$v2%020d.json"))
    assert(!log2.contains("\"remove\""))
    assert(DeltaLite.snapshot(spark, dir).count() === 23)
    // NULL keys never match: a null-key source row inserts
    val dir2 = Files.createTempDirectory("dlmerge2").toString
    DeltaLite.commitAppend(spark, dir2, Seq((1L, "a"), (2L, null))
      .toDF("k", "s").select(col("k"),
        col("s").cast(org.apache.spark.sql.types.StringType).as("s")))
    DeltaLite.commitMerge(spark, dir2,
      Seq((null.asInstanceOf[java.lang.Long], "nullkey"))
        .toDF("k", "s").select(col("k").cast("long").as("k"), col("s")),
      Seq("k"))
    assert(DeltaLite.snapshot(spark, dir2).count() === 3)
    // ambiguous merges and schema drift decline loudly
    intercept[IllegalArgumentException] {
      DeltaLite.commitMerge(spark, dir,
        Seq(row(1, "a"), row(1, "b")).toDF("k", "s", "g"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      DeltaLite.commitMerge(spark, dir,
        Seq((1L, "a")).toDF("k", "s"), Seq("k"))
    }
  }

  test("commitUpdate: set expressions rewrite matched rows, partition moves restage") {
    val dir = Files.createTempDirectory("dlupd").toString
    val batch = spark.range(1, 21).coalesce(1).select(col("id").as("k"),
      concat(lit("s"), col("id").cast("string")).as("s"),
      (col("id") % 2).cast("string").as("g"))
    DeltaLite.commitAppend(spark, dir, batch, Seq("g")) // v0
    val v1 = DeltaLite.commitUpdate(spark, dir, col("k") <= 5,
      Seq("s" -> concat(lit("u"), col("k").cast("string"))))
    assert(v1 === 1L)
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.count() === 20)
    assert(snap.filter(col("k") === 3).select("s").as[String].head()
      === "u3")
    assert(snap.filter(col("k") === 9).select("s").as[String].head()
      === "s9")
    val ch = DeltaLite.changes(spark, dir, v1, v1)
    assert(ch.filter(col("_change_type") === "update_preimage")
      .count() === 5)
    assert(ch.filter(col("_change_type") === "update_postimage")
      .select("s").as[String].collect().sorted
      === Array("u1", "u2", "u3", "u4", "u5"))
    // updating the PARTITION column moves the row to its new directory
    val v2 = DeltaLite.commitUpdate(spark, dir, col("k") === 7,
      Seq("g" -> lit("9")))
    val snap2 = DeltaLite.snapshot(spark, dir)
    assert(snap2.filter(col("g") === "9").select("k").as[Long].head()
      === 7L)
    assert(snap2.count() === 20)
    assert(v2 === 2L)
    // no-op and unknown-column declines
    assert(DeltaLite.commitUpdate(spark, dir, col("k") === -1,
      Seq("s" -> lit("x"))) === v2)
    intercept[IllegalArgumentException] {
      DeltaLite.commitUpdate(spark, dir, col("k") === 1,
        Seq("nope" -> lit("x")))
    }
  }

  test("vacuum: aged tombstones deleted, live and DV-referenced files survive") {
    val dir = Files.createTempDirectory("dlvac").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).repartition(2).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    DeltaLite.commitAppend(spark, dir, batch(1, 40)) // v0: 2 files
    DeltaLite.commitCompact(spark, dir)              // v1: tombstones ts=1
    // young tombstones survive (cutoff before the deletionTimestamp)
    assert(DeltaLite.vacuum(spark, dir, retentionMs = 100L, nowMs = 50L)
      .isEmpty)
    assert(DeltaLite.snapshot(spark, dir, versionAsOf = 0).count() === 40)
    // aged out: both pre-compaction parts go; the snapshot is intact
    val deleted = DeltaLite.vacuum(spark, dir, 100L, nowMs = 200L)
    assert(deleted.length === 2)
    assert(deleted.forall(_.endsWith(".parquet")))
    assert(DeltaLite.snapshot(spark, dir).count() === 40)
    assert(DeltaLite.snapshot(spark, dir).agg(sum("k"))
      .head().getLong(0) === (1L to 40L).sum)
    // version travel that NEEDS a vacuumed file now fails at read time
    intercept[Exception] {
      DeltaLite.snapshot(spark, dir, versionAsOf = 0).count()
    }
    // untracked stray: aged mtime deleted, fresh mtime kept
    val stray = Paths.get(dir, "stray.bin")
    Files.write(stray, Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(stray,
      java.nio.file.attribute.FileTime.fromMillis(10L))
    val fresh = Paths.get(dir, "fresh.bin")
    Files.write(fresh, Array[Byte](4))
    Files.setLastModifiedTime(fresh,
      java.nio.file.attribute.FileTime.fromMillis(190L))
    assert(DeltaLite.vacuum(spark, dir, 100L, nowMs = 200L)
      === Seq("stray.bin"))
    assert(Files.exists(fresh))

    // a LIVE add's p-storage deletion vector is protected even with
    // zero retention; an orphaned DV file of the same age is not
    val dir2 = Files.createTempDirectory("dlvacdv").toString
    val sa = writePart(spark.range(1, 11).select(col("id").as("k")),
      dir2, "part-a.parquet")
    val schema = StructType(Seq(org.apache.spark.sql.types.StructField(
      "k", org.apache.spark.sql.types.LongType)))
    val dA = dvData(Seq(0L))
    Files.write(Paths.get(dir2, "dv-a.bin"), dvFileBytes(dA, padding = 0))
    Files.write(Paths.get(dir2, "dv-orphan.bin"),
      dvFileBytes(dA, padding = 0))
    Seq("dv-a.bin", "dv-orphan.bin").foreach(n =>
      Files.setLastModifiedTime(Paths.get(dir2, n),
        java.nio.file.attribute.FileTime.fromMillis(1L)))
    commit(dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"t","schemaString":"${esc(schema.json)}",""" +
        """"partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},""" +
        s""""size":$sa,"dataChange":true,"deletionVector":{""" +
        s""""storageType":"p","pathOrInlineDv":"dv-a.bin",""" +
        s""""offset":1,"sizeInBytes":${dA.length},"cardinality":1}}}"""))
    assert(DeltaLite.vacuum(spark, dir2, 0L, nowMs = 1L << 40)
      === Seq("dv-orphan.bin"))
    assert(Files.exists(Paths.get(dir2, "dv-a.bin")))
    assert(DeltaLite.snapshot(spark, dir2).count() === 9)
  }

  test("timestampAsOf resolves the version from commit-file timestamps") {
    val dir = buildTable()
    val t0 = 1700000000000L
    (0 to 2).foreach { v =>
      Files.setLastModifiedTime(
        Paths.get(dir, "_delta_log", f"${v.toLong}%020d.json"),
        java.nio.file.attribute.FileTime.fromMillis(t0 + v * 10000L))
    }
    assert(DeltaLite.versionAtTimestamp(spark, dir, t0 + 15000) === 1L)
    assert(DeltaLite.snapshotAsOfTimestamp(spark, dir, t0 + 15000)
      .count() === 40) // v1: a + b + c + a2
    assert(DeltaLite.versionAtTimestamp(spark, dir, t0) === 0L)
    assert(DeltaLite.snapshotAsOfTimestamp(spark, dir, t0 + 99999)
      .count() === 30) // v2 tombstoned part-b
    // before the first commit: loud, not an empty misread
    intercept[IllegalArgumentException] {
      DeltaLite.versionAtTimestamp(spark, dir, t0 - 1)
    }
  }

  test("change data feed: synthesized inserts/deletes + explicit cdc commits") {
    val dir = buildTable()
    // v3: an explicit cdc commit — its _change_data parquet carries
    // _change_type itself and REPLACES add/remove synthesis for v3
    val cdcDf = Seq((21L, "s21", "update_preimage"),
      (21L, "s21x", "update_postimage")).toDF("k", "s", "_change_type")
    val scc = writePart(cdcDf, dir, "_change_data/cdc-0.parquet")
    commit(dir, 3, Seq(
      s"""{"cdc":{"path":"_change_data/cdc-0.parquet",""" +
        s""""partitionValues":{"p":"c"},"size":$scc,"dataChange":false}}"""))
    val ch = DeltaLite.changes(spark, dir, 0, 3)
    assert(ch.columns.toSeq ===
      Seq("k", "s", "p", "_change_type", "_commit_version"))
    val byV = ch.groupBy("_commit_version", "_change_type").count()
      .as[(Long, String, Long)].collect().toSet
    assert(byV === Set(
      (0L, "insert", 20L), (1L, "insert", 20L), (2L, "delete", 10L),
      (3L, "update_preimage", 1L), (3L, "update_postimage", 1L)))
    // deletes replay the removed file's CONTENT with its partition
    // value resolved through the original add
    assert(ch.filter(col("_change_type") === "delete")
      .agg(sum("k"), min("p"), max("p")).as[(Long, String, String)]
      .head() === (((11L to 20L).sum, "b", "b")))
    // cdc rows surface verbatim, partition-attached
    assert(ch.filter(col("_change_type") === "update_postimage")
      .select("s", "p").as[(String, String)].head() === (("s21x", "c")))
    // sub-ranges slice by commit version
    assert(DeltaLite.changes(spark, dir, 2, 2).count() === 10)
    assert(DeltaLite.changes(spark, dir, 1, 2).count() === 30)
    // declines: bad range, missing history
    intercept[IllegalArgumentException] {
      DeltaLite.changes(spark, dir, 2, 1)
    }
    Files.delete(Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    val e = intercept[IllegalArgumentException] {
      DeltaLite.changes(spark, dir, 2, 2)
    }
    assert(e.getMessage.contains("full JSON history"))
  }

  test("log gaps and unanchored replays raise instead of partial snapshots") {
    val dir = buildTable()
    // gap: delete v1 — replay would silently lose part-c + part-a2
    Files.delete(Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    val e = intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("gap"))
    // unanchored: delete v0 with no checkpoint — nothing anchors replay
    val dir2 = buildTable()
    Files.delete(Paths.get(dir2, "_delta_log", f"${0L}%020d.json"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, dir2)
    }
    assert(e2.getMessage.contains("anchored"))
  }

  test("same-version remove + re-add keeps the file live (add wins ties)") {
    val dir = buildTable()
    val sa = Files.size(Paths.get(dir, "part-a.parquet"))
    commit(dir, 3, Seq(removeJson("part-a.parquet"),
      addJson("part-a.parquet", Map("p" -> "a"), sa)))
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.filter(col("p") === "a" && col("k").between(1, 10))
      .count() === 10)
  }

  test("not-a-table and empty-version errors are loud, not misreads") {
    val none = Files.createTempDirectory("dlnone").toString
    intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, none)
    }
    assert(DeltaLite.latestVersion(spark, none) === -1L)
  }
}
