package graft.operators

import graft.SparkSpec
import graft.functions.AvroWrite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** IcebergLite against a hand-built table following the public Iceberg
  * spec layout: metadata/vN.metadata.json + version-hint, Avro manifest
  * lists + manifests (written by our generic nested Avro writer),
  * Spark-written parquet data files; snapshot pinning, DELETED-entry
  * semantics, URI rebasing, and the loud-decline contract. */
class IcebergLiteSpec extends SparkSpec {
  import spark.implicits._

  private val FakeLoc = "file:///warehouse/tbl" // recorded ≠ actual dir

  private val manifestListSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"partition_spec_id","type":"int"},
      |  {"name":"content","type":"int"},
      |  {"name":"sequence_number","type":["null","long"],"default":null},
      |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
      .stripMargin.replaceAll("\n\\s*", "")

  private val manifestSchema =
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"snapshot_id","type":["null","long"]},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"},
      |    {"name":"file_size_in_bytes","type":"long"},
      |    {"name":"lower_bounds","type":["null",{"type":"array","items":
      |      {"type":"record","name":"kv1","fields":[
      |        {"name":"key","type":"int"},
      |        {"name":"value","type":"bytes"}]}}],"default":null},
      |    {"name":"upper_bounds","type":["null",{"type":"array","items":
      |      {"type":"record","name":"kv2","fields":[
      |        {"name":"key","type":"int"},
      |        {"name":"value","type":"bytes"}]}}],"default":null}]}}]}"""
      .stripMargin.replaceAll("\n\\s*", "")

  private def le64(v: Long): Array[Byte] =
    (0 until 8).map(k => ((v >>> (8 * k)) & 0xff).toByte).toArray

  private def writePart(df: org.apache.spark.sql.DataFrame, dir: String,
                        name: String): Long = {
    val tmp = Files.createTempDirectory("icepart").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = Paths.get(dir, "data", name)
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.size(dest)
  }

  private def entry(status: Int, snapId: Long, path: String,
                    n: Long, size: Long = 1L,
                    format: String = "PARQUET",
                    bounds: Option[(Long, Long)] = None): Map[String, Any] =
    Map("status" -> status, "snapshot_id" -> java.lang.Long.valueOf(snapId),
      "data_file" -> Map("file_path" -> s"$FakeLoc/data/$path",
        "file_format" -> format, "record_count" -> n,
        "file_size_in_bytes" -> size,
        "lower_bounds" -> bounds.map { case (lo, _) =>
          Seq(Map[String, Any]("key" -> 1, "value" -> le64(lo))) }.orNull,
        "upper_bounds" -> bounds.map { case (_, hi) =>
          Seq(Map[String, Any]("key" -> 1, "value" -> le64(hi))) }.orNull))

  private def writeManifest(dir: String, name: String,
                            entries: Seq[Map[String, Any]]): Unit = {
    val p = Paths.get(dir, "metadata", name)
    Files.createDirectories(p.getParent)
    Files.write(p, AvroWrite.genericFileBytes(manifestSchema, entries))
  }

  /** Manifest-list rows as (name, content, sequence_number). */
  private def writeManifestList(dir: String, name: String,
                                manifests: Seq[(String, Int, Long)]): Unit = {
    val rows = manifests.map { case (m, content, seq) => Map[String, Any](
      "manifest_path" -> s"$FakeLoc/metadata/$m",
      "manifest_length" -> 1L, "partition_spec_id" -> 0,
      "content" -> content,
      "sequence_number" -> java.lang.Long.valueOf(seq),
      "added_snapshot_id" -> null)
    }
    Files.write(Paths.get(dir, "metadata", name),
      AvroWrite.genericFileBytes(manifestListSchema, rows))
  }

  private def metadataJson(cur: Long): String =
    s"""{
      |  "format-version": 1,
      |  "table-uuid": "9c12f1b2-0000-4000-8000-00000000000a",
      |  "location": "$FakeLoc",
      |  "last-updated-ms": 1700000000000,
      |  "schema": {"type": "struct", "fields": [
      |    {"id": 1, "name": "k", "required": true, "type": "long"},
      |    {"id": 2, "name": "s", "required": false, "type": "string"},
      |    {"id": 3, "name": "p", "required": false, "type": "string"}]},
      |  "partition-spec": [],
      |  "current-snapshot-id": $cur,
      |  "snapshots": [
      |    {"snapshot-id": 3051729675574597001, "timestamp-ms": 1700000001000,
      |     "summary": {"operation": "append"},
      |     "manifest-list": "$FakeLoc/metadata/snap-1.avro"},
      |    {"snapshot-id": $cur, "parent-snapshot-id": 3051729675574597001,
      |     "timestamp-ms": 1700000002000,
      |     "summary": {"operation": "overwrite"},
      |     "manifest-list": "$FakeLoc/metadata/snap-2.avro"}]
      |}""".stripMargin

  private val Snap1 = 3051729675574597001L
  private val Snap2 = 3051729675574597002L

  /** Table: snap1 adds A(1..10) B(11..20) C(21..30); snap2 rewrites
    * manifest-1 (A,C EXISTING + B DELETED) and adds D(31..40). */
  private def buildTable(): String = {
    val dir = Files.createTempDirectory("icetab").toString
    def part(lo: Int, hi: Int, p: String) =
      spark.range(lo, hi + 1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"), lit(p).as("p"))
    val parts = Seq(("A", 1, 10), ("B", 11, 20), ("C", 21, 30), ("D", 31, 40))
    parts.foreach { case (nm, lo, hi) =>
      writePart(part(lo, hi, nm.toLowerCase), dir, s"part-$nm.parquet")
    }
    writeManifest(dir, "manifest-1.avro", Seq(
      entry(1, Snap1, "part-A.parquet", 10, bounds = Some((1L, 10L))),
      entry(1, Snap1, "part-B.parquet", 10, bounds = Some((11L, 20L))),
      entry(1, Snap1, "part-C.parquet", 10, bounds = Some((21L, 30L)))))
    writeManifestList(dir, "snap-1.avro", Seq(("manifest-1.avro", 0, 1L)))
    writeManifest(dir, "manifest-1r.avro", Seq(
      entry(0, Snap1, "part-A.parquet", 10, bounds = Some((1L, 10L))),
      entry(2, Snap2, "part-B.parquet", 10), // DELETED at snap2
      entry(0, Snap1, "part-C.parquet", 10, bounds = Some((21L, 30L)))))
    writeManifest(dir, "manifest-2.avro", Seq(
      entry(1, Snap2, "part-D.parquet", 10))) // no bounds: kept always
    writeManifestList(dir, "snap-2.avro",
      Seq(("manifest-1r.avro", 0, 1L), ("manifest-2.avro", 0, 2L)))
    Files.writeString(Paths.get(dir, "metadata", "v2.metadata.json"),
      metadataJson(Snap2))
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "2\n")
    dir
  }

  test("current snapshot: live files after DELETED entries, schema from metadata") {
    val dir = buildTable()
    val scan = IcebergLite.scan(spark, dir)
    assert(scan.nManifests === 2)
    assert(scan.nDataFiles === 3) // A, C, D — B deleted
    assert(scan.data.schema.fieldNames.toSeq === Seq("k", "s", "p"))
    assert(scan.data.schema("k").dataType ===
      org.apache.spark.sql.types.LongType) // typed from METADATA, not file
    // (Spark normalizes file-source read schemas to nullable)
    val got = scan.data.select("k", "p").as[(Long, String)].collect().sorted
    val want = ((1 to 10).map((_, "a")) ++ (21 to 30).map((_, "c")) ++
      (31 to 40).map((_, "d"))).map { case (i, p) => (i.toLong, p) }
    assert(got === want.sorted.toArray)
  }

  test("snapshot pinning: the 63-bit first snapshot still sees B") {
    val dir = buildTable()
    val v1 = IcebergLite.snapshot(spark, dir, snapshotId = Snap1)
    assert(v1.count() === 30)
    assert(v1.filter(col("p") === "b").count() === 10)
    assert(v1.filter(col("p") === "d").count() === 0)
  }

  test("timestamp time travel resolves the latest snapshot at or before") {
    val dir = buildTable()
    // snap1 ts = 1700000001000, snap2 ts = 1700000002000
    assert(IcebergLite.snapshotAsOfTimestamp(spark, dir, 1700000001500L)
      .count() === 30) // snap1 still sees B
    assert(IcebergLite.scanAsOfTimestamp(spark, dir, 1700000002000L)
      .data.count() === 30) // snap2 (inclusive): B gone, D added
    assert(IcebergLite.snapshotAsOfTimestamp(spark, dir, 1700000002000L)
      .filter(col("p") === "d").count() === 10)
    intercept[IllegalArgumentException] {
      IcebergLite.snapshotAsOfTimestamp(spark, dir, 1700000000999L)
    }
  }

  test("metadata discovery without version-hint picks the highest version") {
    val dir = buildTable()
    // stale v1 metadata pointing at snap1 only; hint removed
    Files.writeString(Paths.get(dir, "metadata", "v1.metadata.json"),
      metadataJson(Snap2).replace(s""""current-snapshot-id": $Snap2""",
        s""""current-snapshot-id": $Snap1"""))
    Files.delete(Paths.get(dir, "metadata", "version-hint.text"))
    assert(IcebergLite.snapshot(spark, dir).count() === 30) // v2 wins
  }

  test("bounds pruning: manifest stats skip files before any data I/O") {
    val dir = buildTable()
    // [22, 28] intersects only part-C's bounds; part-D has no bounds
    // and is conservatively kept
    val p = IcebergLite.prunedScan(spark, dir, "k", 22L, 28L)
    assert(p.nDataFiles === 3)
    assert(p.keptFiles === 2) // C (intersects) + D (no bounds)
    val ks = p.data.filter(col("k").between(22, 28))
      .select("k").as[Long].collect().sorted
    assert(ks === (22L to 28L).toArray) // pruning is sound
    // a range past every bound keeps only the stats-less file
    assert(IcebergLite.prunedScan(spark, dir, "k", 5000L, 6000L)
      .keptFiles === 1)
    // unknown prune column / non-integer column raise
    intercept[RuntimeException] {
      IcebergLite.prunedScan(spark, dir, "nope", 0L, 1L)
    }
    intercept[IllegalArgumentException] {
      IcebergLite.prunedScan(spark, dir, "s", 0L, 1L)
    }
  }

  test("v2 position deletes: row-level anti-join via _metadata.row_index") {
    val dir = buildTable()
    // delete the EVEN positions of part-C (k = 21..30 written in order,
    // so positions 0,2,4,6,8 → k = 21,23,25,27,29 vanish)
    val delName = "posdel-1.parquet"
    val tmp = Files.createTempDirectory("icedel").toString
    spark.range(0, 5).select(
      lit(s"$FakeLoc/data/part-C.parquet").as("file_path"),
      (col("id") * 2).as("pos"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(dir, "data", delName),
      StandardCopyOption.REPLACE_EXISTING)
    val delEntrySchema = manifestSchema.replace(
      """{"name":"file_path","type":"string"}""",
      """{"name":"content","type":"int"},
        |{"name":"file_path","type":"string"}"""
        .stripMargin.replaceAll("\n\\s*", ""))
    Files.write(Paths.get(dir, "metadata", "manifest-del.avro"),
      AvroWrite.genericFileBytes(delEntrySchema, Seq(
        Map[String, Any]("status" -> 1,
          "snapshot_id" -> java.lang.Long.valueOf(Snap2),
          "data_file" -> Map[String, Any]("content" -> 1,
            "file_path" -> s"$FakeLoc/data/$delName",
            "file_format" -> "PARQUET", "record_count" -> 5L,
            "file_size_in_bytes" -> 1L,
            "lower_bounds" -> null, "upper_bounds" -> null)))))
    // snap-2's list: data manifests (content 0) + the delete manifest
    val rows = Seq(("manifest-1r.avro", 0), ("manifest-2.avro", 0),
      ("manifest-del.avro", 1)).map { case (m, c) =>
      Map[String, Any]("manifest_path" -> s"$FakeLoc/metadata/$m",
        "manifest_length" -> 1L, "partition_spec_id" -> 0,
        "content" -> c, "added_snapshot_id" -> null)
    }
    Files.write(Paths.get(dir, "metadata", "snap-2.avro"),
      AvroWrite.genericFileBytes(manifestListSchema, rows))
    val scan = IcebergLite.scan(spark, dir)
    assert(scan.nDeleteFiles === 1)
    assert(scan.nDataFiles === 3)
    val ks = scan.data.filter(col("p") === "c")
      .select("k").as[Long].collect().sorted
    assert(ks === Array(22L, 24L, 26L, 28L, 30L)) // odd positions survive
    assert(scan.data.count() === 25) // 30 live minus 5 deleted
  }

  test("equality deletes: sequence-aware, null-safe column matching") {
    val dir = buildTable()
    // delete file: one column `s` (field id 2) — values s21, s25 (live
    // in part-C, seq 1), s35 (live in part-D, seq 2), and a NULL row
    // (matches nothing; exercises the null-safe path)
    val tmp = Files.createTempDirectory("iceeq").toString
    Seq(Some("s21"), Some("s25"), Some("s35"), None).toDF("s")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(dir, "data", "eqdel-1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val eqEntrySchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"]},
        |  {"name":"sequence_number","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r3","fields":[
        |    {"name":"content","type":"int"},
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"},
        |    {"name":"equality_ids","type":["null",
        |      {"type":"array","items":"int"}],"default":null}]}}]}"""
        .stripMargin.replaceAll("\n\\s*", "")
    Files.write(Paths.get(dir, "metadata", "manifest-eq.avro"),
      AvroWrite.genericFileBytes(eqEntrySchema, Seq(
        Map[String, Any]("status" -> 1,
          "snapshot_id" -> java.lang.Long.valueOf(Snap2),
          "sequence_number" -> null, // inherits seq 2 from the list row
          "data_file" -> Map[String, Any]("content" -> 2,
            "file_path" -> s"$FakeLoc/data/eqdel-1.parquet",
            "file_format" -> "PARQUET", "record_count" -> 4L,
            "file_size_in_bytes" -> 1L,
            "equality_ids" -> Seq(2))))))
    writeManifestList(dir, "snap-2.avro",
      Seq(("manifest-1r.avro", 0, 1L), ("manifest-2.avro", 0, 2L),
        ("manifest-eq.avro", 1, 2L)))
    val scan = IcebergLite.scan(spark, dir)
    assert(scan.nDeleteFiles === 1)
    val ks = scan.data.select("k").as[Long].collect().sorted
    // s21/s25 die (part-C seq 1 < delete seq 2); s35 SURVIVES — its
    // file entered at seq 2, not strictly smaller
    assert(!ks.contains(21L) && !ks.contains(25L))
    assert(ks.contains(35L))
    assert(ks.length === 28)
    // unknown equality field ids raise
    Files.write(Paths.get(dir, "metadata", "manifest-eq.avro"),
      AvroWrite.genericFileBytes(eqEntrySchema, Seq(
        Map[String, Any]("status" -> 1,
          "snapshot_id" -> java.lang.Long.valueOf(Snap2),
          "sequence_number" -> null,
          "data_file" -> Map[String, Any]("content" -> 2,
            "file_path" -> s"$FakeLoc/data/eqdel-1.parquet",
            "file_format" -> "PARQUET", "record_count" -> 4L,
            "file_size_in_bytes" -> 1L,
            "equality_ids" -> Seq(99))))))
    val e = intercept[RuntimeException] {
      IcebergLite.snapshot(spark, dir).count()
    }
    assert(e.getMessage.contains("equality_ids"))
  }

  test("loud declines: non-parquet files, unknown column type") {
    val dir2 = buildTable()
    writeManifest(dir2, "manifest-2.avro", Seq(
      entry(1, Snap2, "part-D.parquet", 10, format = "ORC")))
    val e2 = intercept[RuntimeException] {
      IcebergLite.snapshot(spark, dir2)
    }
    assert(e2.getMessage.contains("file format"))

    val dir3 = buildTable()
    Files.writeString(Paths.get(dir3, "metadata", "v2.metadata.json"),
      metadataJson(Snap2).replace("\"type\": \"long\"",
        "\"type\": \"variant\""))
    val e3 = intercept[RuntimeException] {
      IcebergLite.snapshot(spark, dir3)
    }
    assert(e3.getMessage.contains("unsupported Iceberg column type"))

    intercept[IllegalArgumentException] {
      IcebergLite.snapshot(spark,
        Files.createTempDirectory("icenone").toString)
    }
  }

  test("nested schema: struct/list/map types map recursively; NTZ timestamps") {
    val dir = Files.createTempDirectory("icenest").toString
    val df = spark.range(1, 21).select(col("id").as("k"),
      struct((col("id") * 10).as("a"),
        concat(lit("b"), col("id").cast("string")).as("b")).as("rec"),
      array(col("id"), col("id") * 2).as("arr"),
      map(lit("x"), col("id").cast("double")).as("m"))
    writePart(df, dir, "part-N.parquet")
    writeManifest(dir, "manifest-1.avro",
      Seq(entry(1, Snap1, "part-N.parquet", 20)))
    writeManifestList(dir, "snap-1.avro", Seq(("manifest-1.avro", 0, 1L)))
    Files.writeString(Paths.get(dir, "metadata", "v1.metadata.json"),
      s"""{
        |  "format-version": 1,
        |  "table-uuid": "9c12f1b2-0000-4000-8000-0000000000aa",
        |  "location": "$FakeLoc",
        |  "last-updated-ms": 1700000000000,
        |  "schema": {"type": "struct", "fields": [
        |    {"id": 1, "name": "k", "required": true, "type": "long"},
        |    {"id": 2, "name": "rec", "required": false, "type":
        |      {"type": "struct", "fields": [
        |        {"id": 4, "name": "a", "required": false, "type": "long"},
        |        {"id": 5, "name": "b", "required": false, "type": "string"}]}},
        |    {"id": 3, "name": "arr", "required": false, "type":
        |      {"type": "list", "element-id": 6, "element": "long",
        |       "element-required": false}},
        |    {"id": 7, "name": "m", "required": false, "type":
        |      {"type": "map", "key-id": 8, "key": "string",
        |       "value-id": 9, "value": "double", "value-required": false}},
        |    {"id": 10, "name": "ts", "required": false, "type": "timestamp"},
        |    {"id": 11, "name": "tz", "required": false, "type": "timestamptz"}]},
        |  "partition-spec": [],
        |  "current-snapshot-id": $Snap1,
        |  "snapshots": [
        |    {"snapshot-id": $Snap1, "timestamp-ms": 1700000001000,
        |     "summary": {"operation": "append"},
        |     "manifest-list": "$FakeLoc/metadata/snap-1.avro"}]
        |}""".stripMargin)
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "1\n")
    val scan = IcebergLite.scan(spark, dir)
    val sc = scan.data.schema
    assert(sc("rec").dataType ===
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.StringType))))
    assert(sc("arr").dataType === org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = true))
    assert(sc("m").dataType === org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.DoubleType, valueContainsNull = true))
    // timestamp (no zone) is NTZ; only timestamptz is session-zoned
    assert(sc("ts").dataType === org.apache.spark.sql.types.TimestampNTZType)
    assert(sc("tz").dataType === org.apache.spark.sql.types.TimestampType)
    // nested DATA round-trips: leaf aggregates over struct/list fields
    val got = scan.data.agg(
      sum(col("rec.a")), min(col("rec.b")), sum(element_at(col("arr"), 2)),
      sum(element_at(col("m"), "x"))).collect().head
    assert(got.getLong(0) === (1 to 20).map(_ * 10L).sum)
    assert(got.getString(1) === "b1")
    assert(got.getLong(2) === (1 to 20).map(_ * 2L).sum)
    assert(got.getDouble(3) === (1 to 20).map(_.toDouble).sum)
  }

  test("string bounds pruning: UTF-8 single-value bounds skip files") {
    val dir = buildTable()
    // rewrite the manifests with honest per-file bounds on the
    // per-file-constant column p (field id 3): A=["a","a"], C=["c","c"];
    // D stays bounds-less (conservatively kept)
    def sb(lo: String, hi: String) = Map[String, Any](
      "lower_bounds" -> Seq(Map[String, Any](
        "key" -> 3, "value" -> lo.getBytes("UTF-8"))),
      "upper_bounds" -> Seq(Map[String, Any](
        "key" -> 3, "value" -> hi.getBytes("UTF-8"))))
    def sentry(status: Int, snapId: Long, path: String, n: Long,
               bounds: Map[String, Any]): Map[String, Any] =
      Map("status" -> status,
        "snapshot_id" -> java.lang.Long.valueOf(snapId),
        "data_file" -> (Map[String, Any](
          "file_path" -> s"$FakeLoc/data/$path",
          "file_format" -> "PARQUET", "record_count" -> n,
          "file_size_in_bytes" -> 1L,
          "lower_bounds" -> null, "upper_bounds" -> null) ++ bounds))
    writeManifest(dir, "manifest-1r.avro", Seq(
      sentry(0, Snap1, "part-A.parquet", 10, sb("a", "a")),
      sentry(0, Snap1, "part-C.parquet", 10, sb("c", "c"))))
    writeManifest(dir, "manifest-2.avro", Seq(
      sentry(1, Snap2, "part-D.parquet", 10, Map.empty)))
    // ["c","c"] prunes A (upper "a" < "c"); C intersects; D kept
    val p = IcebergLite.prunedScanString(spark, dir, "p", "c", "c")
    assert(p.nDataFiles === 3)
    assert(p.keptFiles === 2)
    val got = p.data.filter(col("p") === "c")
      .select("k").as[Long].collect().sorted
    assert(got === (21L to 30L).toArray) // pruning is sound
    // a truncated upper bound (writer bumps the last code point) only
    // WIDENS the kept set: A's upper "a" recorded as "b"
    writeManifest(dir, "manifest-1r.avro", Seq(
      sentry(0, Snap1, "part-A.parquet", 10, sb("a", "b")),
      sentry(0, Snap1, "part-C.parquet", 10, sb("c", "c"))))
    assert(IcebergLite.prunedScanString(spark, dir, "p", "ab", "ab")
      .keptFiles === 2) // A (widened upper ≥ "ab") + D — C pruned
    // long-typed column via the string face declines
    intercept[IllegalArgumentException] {
      IcebergLite.prunedScanString(spark, dir, "k", "a", "b")
    }
  }

  test("partition-transform pruning: identity and bucket[N], loud declines") {
    // Iceberg spec appendix test vector: int/long 34 hashes to
    // 2017239379 under the bucket murmur3
    def le64(v: Long): Array[Byte] =
      (0 until 8).map(k => ((v >>> (8 * k)) & 0xff).toByte).toArray
    assert(IcebergLite.murmur3(le64(34L)) === 2017239379)
    assert(IcebergLite.bucketOf(34L, 16) === (2017239379 % 16))

    val dir = Files.createTempDirectory("icepart").toString
    // four files, each holding exactly the ks of one bucket[4] value
    val byBucket = (1L to 100L).groupBy(k => IcebergLite.bucketOf(k, 4))
    val partEntrySchema = manifestSchema.replace(
      """{"name":"file_size_in_bytes","type":"long"}""",
      """{"name":"file_size_in_bytes","type":"long"},
        |{"name":"partition","type":["null",{"type":"record",
        |  "name":"r102","fields":[
        |    {"name":"k_bucket","type":["null","int"],"default":null}]}],
        | "default":null}""".stripMargin.replaceAll("\n\\s*", ""))
    val entries = byBucket.toSeq.sortBy(_._1).map { case (b, ks) =>
      val df = spark.createDataset(ks.toSeq).select(col("value").as("k"),
        concat(lit("s"), col("value").cast("string")).as("s"))
      writePart(df, dir, s"part-b$b.parquet")
      Map[String, Any]("status" -> 1,
        "snapshot_id" -> java.lang.Long.valueOf(Snap1),
        "data_file" -> Map[String, Any](
          "file_path" -> s"$FakeLoc/data/part-b$b.parquet",
          "file_format" -> "PARQUET", "record_count" -> ks.length.toLong,
          "file_size_in_bytes" -> 1L,
          "lower_bounds" -> null, "upper_bounds" -> null,
          "partition" -> Map[String, Any]("k_bucket" -> b)))
    }
    val p = Paths.get(dir, "metadata", "manifest-1.avro")
    Files.createDirectories(p.getParent)
    Files.write(p, AvroWrite.genericFileBytes(partEntrySchema, entries))
    writeManifestList(dir, "snap-1.avro", Seq(("manifest-1.avro", 0, 1L)))
    def meta(transform: String): String =
      s"""{
        |  "format-version": 1,
        |  "table-uuid": "9c12f1b2-0000-4000-8000-0000000000ab",
        |  "location": "$FakeLoc",
        |  "last-updated-ms": 1700000000000,
        |  "schema": {"type": "struct", "fields": [
        |    {"id": 1, "name": "k", "required": true, "type": "long"},
        |    {"id": 2, "name": "s", "required": false, "type": "string"}]},
        |  "partition-spec": [{"source-id": 1, "field-id": 1000,
        |    "name": "k_bucket", "transform": "$transform"}],
        |  "current-snapshot-id": $Snap1,
        |  "snapshots": [
        |    {"snapshot-id": $Snap1, "timestamp-ms": 1700000001000,
        |     "summary": {"operation": "append"},
        |     "manifest-list": "$FakeLoc/metadata/snap-1.avro"}]
        |}""".stripMargin
    Files.writeString(Paths.get(dir, "metadata", "v1.metadata.json"),
      meta("bucket[4]"))
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "1\n")
    val scan = IcebergLite.partitionPrunedScan(spark, dir, "k", 42L)
    assert(scan.nDataFiles === byBucket.size)
    assert(scan.keptFiles === 1) // only 42's bucket survives
    val got = scan.data.filter(col("k") === 42L)
      .select("k").as[Long].collect()
    assert(got === Array(42L)) // pruning is sound for the point query
    // identity: partition value IS the column value — nothing matches
    // a k that is not a whole file's constant, so files whose recorded
    // k_bucket ≠ 42 all skip (none equal 42 here: buckets are 0..3)
    Files.writeString(Paths.get(dir, "metadata", "v1.metadata.json"),
      meta("identity"))
    val idScan = IcebergLite.partitionPrunedScan(spark, dir, "k", 2L)
    assert(idScan.keptFiles === 1) // the file whose tuple records 2
    // unsupported transform and non-partition column decline loudly
    Files.writeString(Paths.get(dir, "metadata", "v1.metadata.json"),
      meta("day"))
    val e = intercept[RuntimeException] {
      IcebergLite.partitionPrunedScan(spark, dir, "k", 42L)
    }
    assert(e.getMessage.contains("unsupported partition transform"))
    Files.writeString(Paths.get(dir, "metadata", "v1.metadata.json"),
      meta("bucket[4]"))
    val e2 = intercept[RuntimeException] {
      IcebergLite.partitionPrunedScan(spark, dir, "s", 42L)
    }
    assert(e2.getMessage.contains("partition"))
  }

  test("appendsBetween: per-snapshot arrivals, no double-count, declines") {
    val dir = Files.createTempDirectory("iceapp").toString
    val Snap3 = 3051729675574597003L
    def part(lo: Int, hi: Int, p: String) =
      spark.range(lo, hi + 1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"), lit(p).as("p"))
    writePart(part(1, 10, "a"), dir, "part-A.parquet")
    writePart(part(11, 20, "b"), dir, "part-B.parquet")
    writePart(part(21, 30, "c"), dir, "part-C.parquet")
    writePart(part(31, 40, "d"), dir, "part-D.parquet")
    writeManifest(dir, "m1.avro", Seq(entry(1, Snap1, "part-A.parquet", 10)))
    writeManifest(dir, "m2.avro", Seq(entry(1, Snap2, "part-B.parquet", 10)))
    writeManifest(dir, "m3.avro", Seq(
      entry(1, Snap3, "part-C.parquet", 10),
      entry(1, Snap3, "part-D.parquet", 10)))
    writeManifestList(dir, "snap-1.avro", Seq(("m1.avro", 0, 1L)))
    writeManifestList(dir, "snap-2.avro",
      Seq(("m1.avro", 0, 1L), ("m2.avro", 0, 2L)))
    writeManifestList(dir, "snap-3.avro",
      Seq(("m1.avro", 0, 1L), ("m2.avro", 0, 2L), ("m3.avro", 0, 3L)))
    Files.writeString(Paths.get(dir, "metadata", "v1.metadata.json"),
      s"""{
        |  "format-version": 1,
        |  "table-uuid": "9c12f1b2-0000-4000-8000-0000000000ac",
        |  "location": "$FakeLoc",
        |  "last-updated-ms": 1700000000000,
        |  "schema": {"type": "struct", "fields": [
        |    {"id": 1, "name": "k", "required": true, "type": "long"},
        |    {"id": 2, "name": "s", "required": false, "type": "string"},
        |    {"id": 3, "name": "p", "required": false, "type": "string"}]},
        |  "partition-spec": [],
        |  "current-snapshot-id": $Snap3,
        |  "snapshots": [
        |    {"snapshot-id": $Snap1, "timestamp-ms": 1700000001000,
        |     "summary": {"operation": "append"},
        |     "manifest-list": "$FakeLoc/metadata/snap-1.avro"},
        |    {"snapshot-id": $Snap2, "parent-snapshot-id": $Snap1,
        |     "timestamp-ms": 1700000002000,
        |     "summary": {"operation": "append"},
        |     "manifest-list": "$FakeLoc/metadata/snap-2.avro"},
        |    {"snapshot-id": $Snap3, "parent-snapshot-id": $Snap2,
        |     "timestamp-ms": 1700000003000,
        |     "summary": {"operation": "append"},
        |     "manifest-list": "$FakeLoc/metadata/snap-3.avro"}]
        |}""".stripMargin)
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "1\n")
    // full range: arrivals of snap2 + snap3, correctly attributed —
    // m1/m2's EXISTING-era re-listings in later lists never recount
    val ch = IcebergLite.appendsBetween(spark, dir, Snap1)
    assert(ch.columns.toSeq === Seq("k", "s", "p", "_snapshot_id"))
    assert(ch.count() === 30)
    assert(ch.filter(col("_snapshot_id") === Snap2)
      .agg(sum("k")).head().getLong(0) === (11L to 20L).sum)
    assert(ch.filter(col("_snapshot_id") === Snap3).count() === 20)
    // sub-ranges slice by ancestry
    assert(IcebergLite.appendsBetween(spark, dir, Snap2, Snap3)
      .count() === 20)
    assert(IcebergLite.appendsBetween(spark, dir, Snap1, Snap2)
      .count() === 10)
    // from == to: an EMPTY feed, not an error
    assert(IcebergLite.appendsBetween(spark, dir, Snap3).count() === 0)
    // not-an-ancestor raises
    val e = intercept[RuntimeException] {
      IcebergLite.appendsBetween(spark, dir, 999L)
    }
    assert(e.getMessage.contains("ancestor"))
    // an overwrite in range declines loudly (buildTable's snap2)
    val dir2 = buildTable()
    val e2 = intercept[IllegalArgumentException] {
      IcebergLite.appendsBetween(spark, dir2, Snap1)
    }
    assert(e2.getMessage.contains("not an append"))
  }

  test("truncate[W] partition transform prunes point queries") {
    val dir = Files.createTempDirectory("icetrunc").toString
    val partEntrySchema = manifestSchema.replace(
      """{"name":"file_size_in_bytes","type":"long"}""",
      """{"name":"file_size_in_bytes","type":"long"},
        |{"name":"partition","type":["null",{"type":"record",
        |  "name":"r102","fields":[
        |    {"name":"k_trunc","type":["null","long"],"default":null}]}],
        | "default":null}""".stripMargin.replaceAll("\n\\s*", ""))
    // two files: k 0..9 (tuple 0) and k 10..19 (tuple 10)
    val entries = Seq((0, 0L), (1, 10L)).map { case (i, tup) =>
      val df = spark.range(i * 10, i * 10 + 10).select(col("id").as("k"),
        lit(s"f$i").as("s"))
      writePart(df, dir, s"part-t$i.parquet")
      Map[String, Any]("status" -> 1,
        "snapshot_id" -> java.lang.Long.valueOf(Snap1),
        "data_file" -> Map[String, Any](
          "file_path" -> s"$FakeLoc/data/part-t$i.parquet",
          "file_format" -> "PARQUET", "record_count" -> 10L,
          "file_size_in_bytes" -> 1L,
          "lower_bounds" -> null, "upper_bounds" -> null,
          "partition" -> Map[String, Any](
            "k_trunc" -> java.lang.Long.valueOf(tup))))
    }
    val p = Paths.get(dir, "metadata", "manifest-1.avro")
    Files.createDirectories(p.getParent)
    Files.write(p, AvroWrite.genericFileBytes(partEntrySchema, entries))
    writeManifestList(dir, "snap-1.avro", Seq(("manifest-1.avro", 0, 1L)))
    Files.writeString(Paths.get(dir, "metadata", "v1.metadata.json"),
      s"""{
        |  "format-version": 1,
        |  "table-uuid": "9c12f1b2-0000-4000-8000-0000000000ad",
        |  "location": "$FakeLoc",
        |  "last-updated-ms": 1700000000000,
        |  "schema": {"type": "struct", "fields": [
        |    {"id": 1, "name": "k", "required": true, "type": "long"},
        |    {"id": 2, "name": "s", "required": false, "type": "string"}]},
        |  "partition-spec": [{"source-id": 1, "field-id": 1000,
        |    "name": "k_trunc", "transform": "truncate[10]"}],
        |  "current-snapshot-id": $Snap1,
        |  "snapshots": [
        |    {"snapshot-id": $Snap1, "timestamp-ms": 1700000001000,
        |     "summary": {"operation": "append"},
        |     "manifest-list": "$FakeLoc/metadata/snap-1.avro"}]
        |}""".stripMargin)
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "1\n")
    val scan = IcebergLite.partitionPrunedScan(spark, dir, "k", 13L)
    assert(scan.nDataFiles === 2)
    assert(scan.keptFiles === 1) // truncate(13) = 10 → second file only
    assert(scan.data.filter(col("k") === 13L).count() === 1)
    // negative values truncate toward -infinity: truncate(-3) = -10,
    // which matches neither tuple → everything prunes (loud, since an
    // empty keep-set is a raise by contract)
    val e = intercept[IllegalArgumentException] {
      IcebergLite.partitionPrunedScan(spark, dir, "k", -3L)
    }
    assert(e.getMessage.contains("survive"))

    // day transform on a DATE source: the ordinal IS the tuple value
    val dir2 = Files.createTempDirectory("iceday").toString
    val dayEntrySchema = manifestSchema.replace(
      """{"name":"file_size_in_bytes","type":"long"}""",
      """{"name":"file_size_in_bytes","type":"long"},
        |{"name":"partition","type":["null",{"type":"record",
        |  "name":"r102","fields":[
        |    {"name":"d_day","type":["null","long"],"default":null}]}],
        | "default":null}""".stripMargin.replaceAll("\n\\s*", ""))
    val dayEntries = Seq(5L, 15L).zipWithIndex.map { case (day, i) =>
      val df = spark.range(10).select(col("id").as("k"),
        date_add(lit("1970-01-01").cast("date"), day.toInt).as("d"))
      writePart(df, dir2, s"part-d$i.parquet")
      Map[String, Any]("status" -> 1,
        "snapshot_id" -> java.lang.Long.valueOf(Snap1),
        "data_file" -> Map[String, Any](
          "file_path" -> s"$FakeLoc/data/part-d$i.parquet",
          "file_format" -> "PARQUET", "record_count" -> 10L,
          "file_size_in_bytes" -> 1L,
          "lower_bounds" -> null, "upper_bounds" -> null,
          "partition" -> Map[String, Any](
            "d_day" -> java.lang.Long.valueOf(day))))
    }
    val p2 = Paths.get(dir2, "metadata", "manifest-1.avro")
    Files.createDirectories(p2.getParent)
    Files.write(p2, AvroWrite.genericFileBytes(dayEntrySchema, dayEntries))
    writeManifestList(dir2, "snap-1.avro", Seq(("manifest-1.avro", 0, 1L)))
    Files.writeString(Paths.get(dir2, "metadata", "v1.metadata.json"),
      s"""{
        |  "format-version": 1,
        |  "table-uuid": "9c12f1b2-0000-4000-8000-0000000000ae",
        |  "location": "$FakeLoc",
        |  "last-updated-ms": 1700000000000,
        |  "schema": {"type": "struct", "fields": [
        |    {"id": 1, "name": "k", "required": true, "type": "long"},
        |    {"id": 2, "name": "d", "required": false, "type": "date"}]},
        |  "partition-spec": [{"source-id": 2, "field-id": 1000,
        |    "name": "d_day", "transform": "day"}],
        |  "current-snapshot-id": $Snap1,
        |  "snapshots": [
        |    {"snapshot-id": $Snap1, "timestamp-ms": 1700000001000,
        |     "summary": {"operation": "append"},
        |     "manifest-list": "$FakeLoc/metadata/snap-1.avro"}]
        |}""".stripMargin)
    Files.writeString(Paths.get(dir2, "metadata", "version-hint.text"),
      "1\n")
    val dayScan = IcebergLite.partitionPrunedScan(spark, dir2, "d", 15L)
    assert(dayScan.nDataFiles === 2 && dayScan.keptFiles === 1)
    assert(dayScan.data.filter(col("d") ===
      date_add(lit("1970-01-01").cast("date"), 15)).count() === 10)
  }

  test("commitAppend: written tables scan, prune, time-travel, and feed appendsBetween") {
    val dir = Files.createTempDirectory("icewrite").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).coalesce(1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    val snap1 = IcebergLite.commitAppend(spark, dir, batch(1, 100))
    val snap2 = IcebergLite.commitAppend(spark, dir, batch(101, 150))
    assert(snap2 === snap1 + 1)
    val scan = IcebergLite.scan(spark, dir)
    assert(scan.nDataFiles === 2)
    assert(scan.data.count() === 150)
    assert(scan.data.agg(sum("k")).head().getLong(0) === (1L to 150L).sum)
    // snapshot pinning + timestamp travel over written history
    assert(IcebergLite.snapshot(spark, dir, snapshotId = snap1)
      .count() === 100)
    assert(IcebergLite.snapshotAsOfTimestamp(spark, dir, 1700000001000L)
      .count() === 100)
    // the WRITTEN bounds prune: [120, 130] lives only in batch 2
    val p = IcebergLite.prunedScan(spark, dir, "k", 120L, 130L)
    assert(p.keptFiles === 1)
    assert(p.data.filter(col("k").between(120, 130)).count() === 11)
    val ps = IcebergLite.prunedScanString(spark, dir, "s", "s99", "s99")
    assert(ps.keptFiles === 1) // only batch 1's file can hold "s99"
    // the written chain feeds the incremental consumer
    val ch = IcebergLite.appendsBetween(spark, dir, snap1)
    assert(ch.count() === 50)
    assert(ch.select("_snapshot_id").distinct().as[Long].collect()
      === Array(snap2))
    // schema mismatch and empty appends decline loudly
    intercept[IllegalArgumentException] {
      IcebergLite.commitAppend(spark, dir,
        batch(1, 5).withColumnRenamed("s", "t"))
    }
    intercept[IllegalArgumentException] {
      IcebergLite.commitAppend(spark, dir, batch(1, 5).filter(lit(false)))
    }
    // nested column types decline at write
    intercept[RuntimeException] {
      IcebergLite.commitAppend(spark,
        Files.createTempDirectory("icewbad").toString,
        spark.range(1).select(struct(col("id").as("a")).as("st")))
    }
  }

  test("partitioned commitAppend: tuple-only identity columns reconstruct") {
    val dir = Files.createTempDirectory("icewpart").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).coalesce(1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"),
        (col("id") % 3).as("g"))
    val snap1 = IcebergLite.commitAppend(spark, dir, batch(1, 90),
      partitionBy = Seq("g"))
    IcebergLite.commitAppend(spark, dir, batch(91, 120), Seq("g"))
    val scan = IcebergLite.scan(spark, dir)
    // data files DROP g (hive staging layout) — the scan reconstructs
    // it from the manifest partition tuples
    assert(scan.data.columns.toSeq === Seq("k", "s", "g"))
    assert(scan.data.count() === 120)
    assert(scan.data.agg(sum("k")).head().getLong(0) === (1L to 120L).sum)
    (0L to 2L).foreach { g =>
      assert(scan.data.filter(col("g") === g).count() ===
        (1L to 120L).count(_ % 3 == g), s"g=$g")
      // g really rides the tuple: per-group k sums match
      assert(scan.data.filter(col("g") === g).agg(sum("k"))
        .head().getLong(0) === (1L to 120L).filter(_ % 3 == g).sum)
    }
    // partition pruning over the WRITTEN tuples
    val p = IcebergLite.partitionPrunedScan(spark, dir, "g", 1L)
    assert(p.nDataFiles === 6) // 3 tuples × 2 appends
    assert(p.keptFiles === 2)
    assert(p.data.filter(col("g") === 1L).count() ===
      (1L to 120L).count(_ % 3 == 1))
    // pinned old snapshot still reconstructs
    assert(IcebergLite.snapshot(spark, dir, snapshotId = snap1)
      .count() === 90)
    // string partition values round-trip too (incl. a space)
    val dir2 = Files.createTempDirectory("icewpart2").toString
    val df2 = spark.range(1, 21).coalesce(1).select(col("id").as("k"),
      when(col("id") % 2 === 0, "A B").otherwise("c").as("p"))
    IcebergLite.commitAppend(spark, dir2, df2, Seq("p"))
    val s2 = IcebergLite.snapshot(spark, dir2)
    assert(s2.filter(col("p") === "A B").count() === 10)
    assert(s2.filter(col("p") === "c").agg(sum("k")).head().getLong(0)
      === (1L to 20L).filter(_ % 2 == 1).sum)
    // partitioning mismatch on append declines
    intercept[IllegalArgumentException] {
      IcebergLite.commitAppend(spark, dir, batch(1, 3), Seq.empty)
    }
  }

  test("many manifests: parallel decode returns the sequential answer") {
    // one manifest PER FILE (24 of them, above the parallel-pool size)
    // plus a rewrite manifest deleting one file — order-sensitive
    // status replay must survive the parallel decode
    val dir = Files.createTempDirectory("icemany").toString
    val parts = (0 until 24).map { i =>
      val lo = i * 10 + 1
      val df = spark.range(lo, lo + 10).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"),
        lit(s"p$i").as("p"))
      writePart(df, dir, s"part-$i.parquet")
      i
    }
    parts.foreach { i =>
      writeManifest(dir, s"manifest-$i.avro", Seq(
        entry(if (i == 5) 1 else 0, Snap1, s"part-$i.parquet", 10)))
    }
    // manifest 24 re-lists part-5 as DELETED; it must lose no matter
    // which pool thread decodes first (application is manifest-ordered)
    writeManifest(dir, "manifest-24.avro", Seq(
      entry(2, Snap2, "part-5.parquet", 10)))
    writeManifestList(dir, "snap-2.avro",
      (0 until 24).map(i => (s"manifest-$i.avro", 0, 1L)) :+
        (("manifest-24.avro", 0, 2L)))
    Files.writeString(Paths.get(dir, "metadata", "v2.metadata.json"),
      metadataJson(Snap2))
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "2\n")
    val scan = IcebergLite.scan(spark, dir)
    assert(scan.nManifests === 25)
    assert(scan.nDataFiles === 23) // part-5 deleted
    assert(scan.data.count() === 230)
    assert(scan.data.filter(col("p") === "p5").count() === 0)
    assert(scan.data.agg(sum("k")).head().getLong(0) ===
      (1L to 240L).sum - (51L to 60L).sum)
    // a malformed manifest still declines loudly through the pool
    Files.write(Paths.get(dir, "metadata", "manifest-7.avro"),
      Array[Byte](1, 2, 3))
    intercept[RuntimeException] { IcebergLite.scan(spark, dir) }
  }

  test("position deletes are sequence-aware: older deletes skip newer files") {
    val dir = buildTable()
    // position-delete file naming part-D (data seq 2 via its list row)
    val delName = "posdel-d.parquet"
    val tmp = Files.createTempDirectory("icedel2").toString
    spark.range(0, 3).select(
      lit(s"$FakeLoc/data/part-D.parquet").as("file_path"),
      col("id").as("pos"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(dir, "data", delName),
      StandardCopyOption.REPLACE_EXISTING)
    val delEntrySchema = manifestSchema.replace(
      """{"name":"file_path","type":"string"}""",
      """{"name":"content","type":"int"},
        |{"name":"file_path","type":"string"}"""
        .stripMargin.replaceAll("\n\\s*", ""))
    Files.write(Paths.get(dir, "metadata", "manifest-del.avro"),
      AvroWrite.genericFileBytes(delEntrySchema, Seq(
        Map[String, Any]("status" -> 1,
          "snapshot_id" -> java.lang.Long.valueOf(Snap2),
          "data_file" -> Map[String, Any]("content" -> 1,
            "file_path" -> s"$FakeLoc/data/$delName",
            "file_format" -> "PARQUET", "record_count" -> 3L,
            "file_size_in_bytes" -> 1L,
            "lower_bounds" -> null, "upper_bounds" -> null)))))
    // delete manifest at seq 1 < part-D's seq 2: the Iceberg spec
    // applies a position delete only to files with sequence ≤ its own,
    // so part-D keeps all ten rows
    writeManifestList(dir, "snap-2.avro",
      Seq(("manifest-1r.avro", 0, 1L), ("manifest-2.avro", 0, 2L),
        ("manifest-del.avro", 1, 1L)))
    assert(IcebergLite.scan(spark, dir).data.count() === 30)
    // at seq 2 (equal): it applies — three rows of part-D vanish
    writeManifestList(dir, "snap-2.avro",
      Seq(("manifest-1r.avro", 0, 1L), ("manifest-2.avro", 0, 2L),
        ("manifest-del.avro", 1, 2L)))
    assert(IcebergLite.scan(spark, dir).data.count() === 27)
  }

  test("expireSnapshots: append-only history keeps data, drops lists") {
    val dir = Files.createTempDirectory("iceexp").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).coalesce(1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    val s1 = IcebergLite.commitAppend(spark, dir, batch(1, 50))
    val s2 = IcebergLite.commitAppend(spark, dir, batch(51, 80))
    val s3 = IcebergLite.commitAppend(spark, dir, batch(81, 100))
    // s1 ts=1700000001000, s2 +1s, s3 +2s — expire the first two
    val expired = IcebergLite.expireSnapshots(spark, dir,
      olderThanMs = 1700000002000L)
    assert(expired === Seq(s1, s2))
    // the current snapshot re-lists every manifest, so data and
    // manifests all survive; only the expired manifest LISTS go
    assert(!Files.exists(Paths.get(dir, "metadata", s"snap-$s1.avro")))
    assert(!Files.exists(Paths.get(dir, "metadata", s"snap-$s2.avro")))
    assert(Files.exists(Paths.get(dir, "metadata", s"snap-$s3.avro")))
    val scan = IcebergLite.scan(spark, dir)
    assert(scan.nDataFiles === 3)
    assert(scan.data.count() === 100)
    assert(scan.data.agg(sum("k")).head().getLong(0) === (1L to 100L).sum)
    // expired snapshots are gone from the metadata: pinning and
    // incremental reads from them decline loudly
    intercept[RuntimeException] {
      IcebergLite.snapshot(spark, dir, snapshotId = s1)
    }
    intercept[RuntimeException] {
      IcebergLite.appendsBetween(spark, dir, s1).count()
    }
    // appends continue on the trimmed table
    IcebergLite.commitAppend(spark, dir, batch(101, 110))
    assert(IcebergLite.snapshot(spark, dir).count() === 110)
    // expiring nothing is a no-op
    assert(IcebergLite.expireSnapshots(spark, dir, 0L) === Seq.empty)
  }

  test("expireSnapshots: rewritten-away files delete, retained mentions survive") {
    val dir = Files.createTempDirectory("iceexp2").toString
    def part(lo: Int, hi: Int, p: String) =
      spark.range(lo, hi + 1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"), lit(p).as("p"))
    Seq(("A", 1, 10), ("B", 11, 20), ("C", 21, 30), ("D", 31, 40))
      .foreach { case (nm, lo, hi) =>
        writePart(part(lo, hi, nm.toLowerCase), dir, s"part-$nm.parquet")
      }
    // snap1: manifest-1 adds A,B,C. snap2's list DROPS manifest-1
    // entirely (a rewrite) and lists only manifest-2 (adds D).
    writeManifest(dir, "manifest-1.avro", Seq(
      entry(1, Snap1, "part-A.parquet", 10),
      entry(1, Snap1, "part-B.parquet", 10),
      entry(1, Snap1, "part-C.parquet", 10)))
    writeManifestList(dir, "snap-1.avro", Seq(("manifest-1.avro", 0, 1L)))
    writeManifest(dir, "manifest-2.avro", Seq(
      entry(1, Snap2, "part-D.parquet", 10)))
    writeManifestList(dir, "snap-2.avro", Seq(("manifest-2.avro", 0, 2L)))
    Files.writeString(Paths.get(dir, "metadata", "v2.metadata.json"),
      metadataJson(Snap2))
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"),
      "2\n")
    val expired = IcebergLite.expireSnapshots(spark, dir,
      olderThanMs = 1700000001000L)
    assert(expired === Seq(Snap1))
    // A,B,C are reachable ONLY through the expired snapshot: deleted,
    // along with its manifest and list; D and manifest-2 survive
    Seq("A", "B", "C").foreach(nm =>
      assert(!Files.exists(Paths.get(dir, "data", s"part-$nm.parquet"))))
    assert(Files.exists(Paths.get(dir, "data", "part-D.parquet")))
    assert(!Files.exists(Paths.get(dir, "metadata", "manifest-1.avro")))
    assert(!Files.exists(Paths.get(dir, "metadata", "snap-1.avro")))
    assert(Files.exists(Paths.get(dir, "metadata", "manifest-2.avro")))
    val scan = IcebergLite.scan(spark, dir)
    assert(scan.data.count() === 10)
    assert(scan.data.agg(sum("k")).head().getLong(0) === (31L to 40L).sum)
  }

  test("commitDelete: copy-on-write, only affected files rewrite") {
    val dir = Files.createTempDirectory("icedel").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).coalesce(1).select(col("id").as("k"),
        when(col("id") % 3 === 0, lit(null))
          .otherwise(concat(lit("s"), col("id").cast("string"))).as("s"))
    IcebergLite.commitAppend(spark, dir, batch(1, 50))
    IcebergLite.commitAppend(spark, dir, batch(51, 100))
    val preSnap = IcebergLite.commitAppend(spark, dir, batch(101, 150))
    val delSnap = IcebergLite.commitDelete(spark, dir,
      col("k").between(60, 70))
    assert(delSnap === preSnap + 1)
    val scan = IcebergLite.scan(spark, dir)
    // two untouched files + one rewritten file
    assert(scan.nDataFiles === 3)
    assert(scan.data.count() === 139)
    assert(scan.data.filter(col("k").between(60, 70)).count() === 0)
    assert(scan.data.agg(sum("k")).head().getLong(0) ===
      (1L to 150L).filterNot(k => k >= 60 && k <= 70).sum)
    // pre-delete snapshot still reads the originals
    assert(IcebergLite.snapshot(spark, dir, snapshotId = preSnap)
      .count() === 150)
    // the delete is an OVERWRITE: incremental reads across it decline
    intercept[IllegalArgumentException] {
      IcebergLite.appendsBetween(spark, dir, preSnap).count()
    }
    // NULL-predicate rows survive a delete keyed on the null column
    IcebergLite.commitDelete(spark, dir, col("s") <= "s999")
    val snap2 = IcebergLite.snapshot(spark, dir)
    assert(snap2.filter(col("s").isNotNull).count() === 0)
    assert(snap2.count() ===
      (1L to 150L).count(k => k % 3 == 0 && !(k >= 60 && k <= 70)))
    // deleting every row of a file drops it with no replacement
    val scan2 = IcebergLite.scan(spark, dir)
    val allGone = IcebergLite.commitDelete(spark, dir, col("k") <= 50)
    val scan3 = IcebergLite.scan(spark, dir)
    assert(scan3.nDataFiles === scan2.nDataFiles - 1)
    assert(scan3.data.filter(col("k") <= 50).count() === 0)
    assert(allGone > delSnap)
    // a predicate matching nothing is a no-op returning the current id
    assert(IcebergLite.commitDelete(spark, dir, col("k") === -1L)
      === allGone)
    // partitioned tables decline loudly
    val pdir = Files.createTempDirectory("icedelp").toString
    IcebergLite.commitAppend(spark, pdir,
      spark.range(1, 10).select(col("id").as("k"),
        (col("id") % 2).as("g")), partitionBy = Seq("g"))
    intercept[IllegalArgumentException] {
      IcebergLite.commitDelete(spark, pdir, col("k") === 1L)
    }
  }

  test("commitMerge: matched files rewrite, pure inserts stay appends") {
    val dir = Files.createTempDirectory("icemerge").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).coalesce(1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    IcebergLite.commitAppend(spark, dir, batch(1, 50))
    IcebergLite.commitAppend(spark, dir, batch(51, 100))
    val pre = IcebergLite.commitAppend(spark, dir, batch(101, 150))
    val src = spark.range(60, 66).select(col("id").as("k"),
        concat(lit("upd"), col("id").cast("string")).as("s"))
      .unionByName(spark.range(200, 205).select(col("id").as("k"),
        concat(lit("new"), col("id").cast("string")).as("s")))
      .coalesce(1)
    val m1 = IcebergLite.commitMerge(spark, dir, src, Seq("k"))
    assert(m1 === pre + 1)
    val snap = IcebergLite.snapshot(spark, dir)
    assert(snap.count() === 155)
    assert(snap.filter(col("k") === 62).select("s").as[String].head()
      === "upd62")
    assert(snap.filter(col("k") === 30).select("s").as[String].head()
      === "s30")
    assert(snap.filter(col("k") >= 200).count() === 5)
    assert(snap.agg(sum("k")).head().getLong(0) ===
      (1L to 150L).sum + (200L to 204L).sum)
    // the pre-merge snapshot reads the untouched originals
    assert(IcebergLite.snapshot(spark, dir, snapshotId = pre)
      .count() === 150)
    // a rewriting merge is an OVERWRITE: incremental reads decline
    intercept[IllegalArgumentException] {
      IcebergLite.appendsBetween(spark, dir, pre).count()
    }
    // an all-new-keys merge is an APPEND: incremental reads flow
    val m2 = IcebergLite.commitMerge(spark, dir,
      spark.range(300, 303).coalesce(1).select(col("id").as("k"),
        concat(lit("n"), col("id").cast("string")).as("s")), Seq("k"))
    val ch = IcebergLite.appendsBetween(spark, dir, m1)
    assert(ch.count() === 3)
    assert(ch.select("_snapshot_id").distinct().as[Long].collect()
      === Array(m2))
    // ambiguous source keys decline loudly
    intercept[IllegalArgumentException] {
      IcebergLite.commitMerge(spark, dir,
        spark.range(2).select(lit(1L).as("k"), lit("x").as("s")),
        Seq("k"))
    }
  }

  test("commitUpdate: only matched files rewrite, others untouched") {
    val dir = Files.createTempDirectory("iceupd").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi + 1).coalesce(1).select(col("id").as("k"),
        concat(lit("s"), col("id").cast("string")).as("s"))
    IcebergLite.commitAppend(spark, dir, batch(1, 50))
    val pre = IcebergLite.commitAppend(spark, dir, batch(51, 100))
    val u1 = IcebergLite.commitUpdate(spark, dir,
      col("k").between(60, 65), Seq("s" -> lit("X")))
    assert(u1 === pre + 1)
    val snap = IcebergLite.snapshot(spark, dir)
    assert(snap.count() === 100)
    assert(snap.filter(col("s") === "X").count() === 6)
    assert(snap.filter(col("k") === 30).select("s").as[String].head()
      === "s30")
    assert(snap.agg(sum("k")).head().getLong(0) === (1L to 100L).sum)
    // the pre-update snapshot reads the original values
    assert(IcebergLite.snapshot(spark, dir, snapshotId = pre)
      .filter(col("s") === "X").count() === 0)
    // no-op predicate; unknown set column declines
    assert(IcebergLite.commitUpdate(spark, dir, col("k") === -1,
      Seq("s" -> lit("y"))) === u1)
    intercept[IllegalArgumentException] {
      IcebergLite.commitUpdate(spark, dir, col("k") === 1,
        Seq("nope" -> lit("x")))
    }
  }

  test("schema evolution: rename and drop+re-add resolve by field id") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("iceevo").toString
    // v0 schema (k:1, amount:2, grp:3, st:4); data file A carries ids
    val a = spark.range(1, 51).coalesce(1).select(col("id").as("k"),
      (col("id") * 10).as("amount"), lit("old").as("grp"),
      concat(lit("s"), col("id").cast("string")).as("st"))
    val snap1 = IcebergLite.commitAppend(spark, dir, a)
    // rename amount->revenue (id 2 kept), drop st (id 4), re-add st
    // as a FRESH id 5
    IcebergLite.commitSchemaUpdate(spark, dir, Seq(
      (1L, "k", LongType, true), (2L, "revenue", LongType, true),
      (3L, "grp", StringType, true), (5L, "st", StringType, true)))
    val b = spark.range(51, 81).coalesce(1).select(col("id").as("k"),
      (col("id") * 10).as("revenue"), lit("new").as("grp"),
      concat(lit("t"), col("id").cast("string")).as("st"))
    val snap2 = IcebergLite.commitAppend(spark, dir, b)
    try {
    val snap = IcebergLite.snapshot(spark, dir)
    // the reader auto-enabled Spark's native field-id resolution
    assert(spark.conf.get("spark.sql.parquet.fieldId.read.enabled")
      === "true")
    assert(snap.columns.toSeq === Seq("k", "revenue", "grp", "st"))
    // renamed column surfaces file A's old values (a name-based read
    // would silently null all 50 of them)
    assert(snap.agg(sum("revenue")).head().getLong(0)
      === (1L to 80L).map(_ * 10).sum)
    // re-added st reads NULL from file A (id 4 ≠ 5 — a name-based
    // read would resurrect the dropped values), real values from B
    assert(snap.filter(col("st").isNull).count() === 50)
    assert(snap.filter(col("grp") === "new" && col("st").isNotNull)
      .count() === 30)
    // bounds pruning keys on field ids, so the renamed column prunes
    // against file A's recorded id-2 bounds
    val p = IcebergLite.prunedScan(spark, dir, "revenue", 100L, 200L)
    assert(p.keptFiles === 1)
    // incremental reads resolve old snapshots' files by id too
    val ch = IcebergLite.appendsBetween(spark, dir, snap1)
    assert(ch.filter(col("_snapshot_id") === snap2)
      .agg(sum("revenue")).head().getLong(0)
      === (51L to 80L).map(_ * 10).sum)
    // appends under the RETIRED schema decline loudly
    intercept[IllegalArgumentException] {
      IcebergLite.commitAppend(spark, dir, a)
    }
    // update validations: reused id for a new field; type change
    intercept[IllegalArgumentException] {
      IcebergLite.commitSchemaUpdate(spark, dir, Seq(
        (1L, "k", LongType, true), (2L, "revenue", LongType, true),
        (3L, "grp", StringType, true), (4L, "st2", StringType, true)))
    }
    intercept[IllegalArgumentException] {
      IcebergLite.commitSchemaUpdate(spark, dir, Seq(
        (1L, "k", StringType, true), (2L, "revenue", LongType, true),
        (3L, "grp", StringType, true), (5L, "st", StringType, true)))
    }
    } finally // shared session: later suites expect the default
      spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
  }

  test("schema evolution: add-only history keeps the name-based read") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("iceadd").toString
    val snap1 = IcebergLite.commitAppend(spark, dir,
      spark.range(1, 11).coalesce(1).select(col("id").as("k")))
    // ADD a column: no name ever moved, so name resolution stays
    // sound (and stays the path taken — id-pinning would be a
    // behavior change for tables whose files may predate id stamping)
    IcebergLite.commitSchemaUpdate(spark, dir, Seq(
      (1L, "k", LongType, true), (2L, "v", StringType, true)))
    // strip the ids from file A by rewriting it WITHOUT metadata:
    // a name-based read must still work on id-less files
    val dataDir = Paths.get(dir, "data")
    val fA = java.nio.file.Files.list(dataDir).iterator().next()
    val plain = spark.read.parquet(fA.toString)
      .select(col("k").cast("long").as("k"))
    val tmp = Files.createTempDirectory("iceadd2").toString
    plain.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, fA, StandardCopyOption.REPLACE_EXISTING)
    // the original file's Hadoop-local checksum sidecar is stale now
    Files.deleteIfExists(fA.getParent.resolve(
      s".${fA.getFileName.toString}.crc"))
    val snap = IcebergLite.snapshot(spark, dir)
    assert(snap.columns.toSeq === Seq("k", "v"))
    assert(snap.agg(sum("k")).head().getLong(0) === (1L to 10L).sum)
    assert(snap.filter(col("v").isNull).count() === 10)
    assert(snap1 > 0)
  }
}
