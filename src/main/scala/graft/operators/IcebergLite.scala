package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Iceberg TABLE reader (metadata.json → manifest list → manifests →
  * live data files, no Iceberg library) — the manifest tier on top of
  * [[graft.functions.IcebergMeta]]'s planning reader, and the Iceberg
  * sibling of [[DeltaLite]]: where Delta replays a JSON log, Iceberg
  * pins each snapshot to an Avro MANIFEST LIST whose manifests carry
  * per-file entries (status ADDED/EXISTING/DELETED). Implemented
  * Spark-first from the PUBLIC Iceberg table spec (v1 and v2):
  *
  *  - metadata discovery: `version-hint.text` if present, else the
  *    highest `v*.metadata.json` under `metadata/`;
  *  - the current (or requested) snapshot's `manifest-list` Avro is
  *    decoded by OUR nested-tree reader
  *    ([[graft.functions.AvroRead.genericRecords]]); manifests decode
  *    in a BOUNDED PARALLEL pool (planning for a table with thousands
  *    of manifests must not serialize on one thread) and then apply in
  *    manifest order; a file is LIVE iff its newest entry status ≠
  *    DELETED;
  *  - absolute `file:`/`s3:` URIs in manifests are rebased from the
  *    table's recorded `location` onto the directory actually given —
  *    the relocation every snapshot-copied table needs;
  *  - the read schema comes from the METADATA (current-schema-id
  *    resolution, Iceberg→Spark type mapping — including NESTED
  *    struct/list/map types, recursively; `timestamp` without zone
  *    maps to TimestampNTZType) — partition columns need no
  *    reconstruction because Iceberg data files store them as ordinary
  *    columns;
  *  - stats file-skipping ([[prunedScan]], [[prunedScanString]]):
  *    manifest entries carry per-file `lower_bounds`/`upper_bounds`
  *    (Iceberg single-value serialization: int/long little-endian,
  *    strings as UTF-8 bytes — writer-truncated string upper bounds
  *    only WIDEN the kept set, so pruning stays sound) — files whose
  *    bounds cannot intersect the predicate are skipped BEFORE any
  *    data I/O, missing bounds conservatively kept;
  *  - partition-transform file skipping ([[partitionPrunedScan]]):
  *    manifest entries carry the file's `partition` tuple under the
  *    default partition spec; identity and bucket[N] transforms
  *    (Iceberg's 32-bit Murmur3 of the 8-byte little-endian value)
  *    prune files by partition value even where column stats are
  *    absent; other transforms decline loudly;
  *  - v2 row-level deletes applied, BOTH kinds sequence-aware:
  *    POSITION deletes (parquet of file_path + pos, anti-joined
  *    against `_metadata.row_index`, applied only to data files with
  *    sequence number ≤ the delete file's) and EQUALITY deletes
  *    (parquet of the `equality_ids` columns, matched null-safely and
  *    applied only to data files with a strictly SMALLER sequence
  *    number — entry sequence numbers inherit from the manifest-list
  *    row);
  *  - loud declines: non-parquet files, unknown column types,
  *    ambiguous duplicate file names, unknown delete content kinds,
  *    unsupported partition transforms, and malformed metadata all
  *    RAISE rather than misread.
  *
  * The driver-side materialization is the manifest/file PLANNING SET —
  * bounded by manifest count and file count, the same set the real
  * Iceberg planner holds — while the data read is one
  * `spark.read.schema(...).parquet(files)` whose scale path (pushdown,
  * pruning, AQE) is Spark's own.
  *
  * Reference scope: beyond-reference §2.10.
  */
object IcebergLite {

  import graft.functions.AvroRead

  private type JMap = scala.collection.Map[String, Any]

  private def asMap(v: Any): JMap = v match {
    case m: scala.collection.Map[_, _] => m.asInstanceOf[JMap]
    case _ => sys.error(s"iceberg metadata: expected object, got $v")
  }
  private def asSeq(v: Any): scala.collection.Seq[Any] = v match {
    case s: scala.collection.Seq[_] => s
    case _ => sys.error(s"iceberg metadata: expected array, got $v")
  }
  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue
    case s: String => s.toLong
    case _ => sys.error(s"iceberg metadata: expected integer, got $v")
  }
  private def asStr(v: Any): String = v match {
    case s: String => s
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case _ => sys.error(s"iceberg metadata: expected string, got $v")
  }

  /** Iceberg type JSON → Spark type, RECURSIVELY: primitives by name,
    * `struct`/`list`/`map` objects by their element/key/value types.
    * `timestamp` (no zone, isAdjustedToUTC=false) is NTZ — mapping it
    * to session-zoned TimestampType would shift surfaced values.
    * Unknown types decline loudly. */
  private def sparkType(t: Any, withIds: Boolean = false): DataType =
    t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "date" => DateType
    case "timestamp" => TimestampNTZType
    case "timestamptz" => TimestampType
    case "string" => StringType
    case "uuid" => StringType
    case "binary" => BinaryType
    case s: String if s.startsWith("fixed[") && s.endsWith("]") =>
      BinaryType
    case s: String if s.startsWith("decimal(") && s.endsWith(")") =>
      val ps = s.stripPrefix("decimal(").stripSuffix(")").split(",")
      DecimalType(ps(0).trim.toInt, ps(1).trim.toInt)
    case m: scala.collection.Map[_, _] =>
      val obj = m.asInstanceOf[JMap]
      asStr(obj.getOrElse("type",
        sys.error(s"iceberg nested type without 'type': $obj"))) match {
        case "struct" => structOf(obj, withIds)
        case "list" => ArrayType(
          sparkType(obj.getOrElse("element",
            sys.error(s"iceberg list type without element: $obj")), withIds),
          containsNull = !obj.get("element-required").contains(true))
        case "map" => MapType(
          sparkType(obj.getOrElse("key",
            sys.error(s"iceberg map type without key: $obj")), withIds),
          sparkType(obj.getOrElse("value",
            sys.error(s"iceberg map type without value: $obj")), withIds),
          valueContainsNull = !obj.get("value-required").contains(true))
        case other => sys.error(
          s"unsupported Iceberg column type for this reader: $other")
      }
    case other => sys.error(
      s"unsupported Iceberg column type for this reader: $other")
  }

  /** A struct schema object's fields → Spark StructType (top-level
    * table schema and nested structs share this shape). With `withIds`
    * every field (at every nesting level) carries its Iceberg field id
    * as `parquet.field.id` metadata, which Spark's parquet reader
    * resolves columns by under
    * `spark.sql.parquet.fieldId.read.enabled` — the spec's id-based
    * resolution, required once the schema HISTORY shows a rename or a
    * drop+re-add (name matching would misread old data files). */
  private def structOf(obj: JMap, withIds: Boolean = false): StructType =
    StructType(
      asSeq(obj.getOrElse("fields", sys.error("schema without fields")))
        .map(asMap).map { f =>
          val name = asStr(f.getOrElse("name", sys.error("unnamed field")))
          val meta =
            if (!withIds) Metadata.empty
            else new MetadataBuilder().putLong("parquet.field.id",
              asLong(f.getOrElse("id", sys.error(
                s"schema evolution needs field ids: field $name has " +
                  "none")))).build()
          StructField(name,
            sparkType(f.getOrElse("type", sys.error("untyped field")),
              withIds),
            nullable = !f.get("required").contains(true), meta)
        }.toSeq)

  /** File-skipping predicate kinds (resolved against the metadata's
    * schema / partition spec inside [[plan]]). */
  private sealed trait Prune
  private case object NoPrune extends Prune
  private final case class LongBounds(col: String, lo: Long, hi: Long)
    extends Prune
  private final case class StringBounds(col: String, lo: String, hi: String)
    extends Prune
  private final case class PartitionPoint(col: String, value: Long)
    extends Prune

  /** Planning outcome: manifest/file counts (kept = after stats
    * pruning; equal to nDataFiles when none), position-delete file
    * count, plus the table read. */
  final case class Scan(nManifests: Int, nDataFiles: Int, keptFiles: Int,
                        nDeleteFiles: Int, data: DataFrame)

  /** The table at its current snapshot (or `snapshotId`). */
  def snapshot(spark: SparkSession, table: String,
               snapshotId: Long = -1L): DataFrame =
    scan(spark, table, snapshotId).data

  def scan(spark: SparkSession, table: String,
           snapshotId: Long = -1L): Scan =
    plan(spark, table, snapshotId, NoPrune)

  /** Timestamp time travel (Iceberg's rule, the [[DeltaLite
    * .snapshotAsOfTimestamp]] sibling): the latest snapshot whose
    * metadata `timestamp-ms` is at or before `tsMillis`. Raises when
    * the table has no snapshot that old. */
  def snapshotAsOfTimestamp(spark: SparkSession, table: String,
                            tsMillis: Long): DataFrame =
    scanAsOfTimestamp(spark, table, tsMillis).data

  def scanAsOfTimestamp(spark: SparkSession, table: String,
                        tsMillis: Long): Scan =
    plan(spark, table, -1L, NoPrune, asOfMillis = tsMillis)

  /** File-skipping scan: data files whose manifest-entry
    * `lower_bounds`/`upper_bounds` for `colName` (an int/long column)
    * cannot intersect [lo, hi] are SKIPPED before any data I/O — the
    * Iceberg analog of [[DeltaLite.prunedSnapshot]]: manifests ARE the
    * stats store, so a 100 TB table's point query touches manifests,
    * not the table. Files without bounds are conservatively kept; the
    * caller re-filters exactly. */
  def prunedScan(spark: SparkSession, table: String, colName: String,
                 lo: Long, hi: Long, snapshotId: Long = -1L): Scan =
    plan(spark, table, snapshotId, LongBounds(colName, lo, hi))

  /** String-typed file skipping: lexicographic [lo, hi] against the
    * UTF-8 single-value bounds. Iceberg writers may truncate an upper
    * bound with a bumped last code point — the recorded upper stays a
    * valid upper bound, so comparing against it only WIDENS the kept
    * set and pruning stays sound (the [[DeltaLite.prunedSnapshotString]]
    * argument, restated for manifests). */
  def prunedScanString(spark: SparkSession, table: String, colName: String,
                       lo: String, hi: String,
                       snapshotId: Long = -1L): Scan =
    plan(spark, table, snapshotId, StringBounds(colName, lo, hi))

  /** Partition-transform file skipping for a POINT predicate
    * `colName = value` (int/long source column): manifest entries
    * carry the file's partition tuple, so files in other partitions
    * skip even where column stats are absent. Supports `identity`
    * (partition value = column value) and `bucket[N]` (Iceberg's
    * 32-bit Murmur3 of the 8-byte LE value, mod N). A source column
    * not in the spec, or any other transform, declines loudly; files
    * without a partition value for the field are conservatively
    * kept. The caller re-filters exactly. */
  def partitionPrunedScan(spark: SparkSession, table: String,
                          colName: String, value: Long,
                          snapshotId: Long = -1L): Scan =
    plan(spark, table, snapshotId, PartitionPoint(colName, value))

  /** INCREMENTAL APPEND read — the Iceberg face of an incremental
    * consumer (re-process only what arrived, the training-data
    * pipeline's delta loop): rows in data files ADDED by the
    * snapshots after `fromSnapshotId`, up to and including
    * `toSnapshotId` (default: current), each row tagged
    * `_snapshot_id`. Walks the parent chain from `to` back to `from`
    * (raises when `from` is not an ancestor); every snapshot in range
    * must be an `append` — an overwrite/delete in range would surface
    * removed rows as arrivals, so those decline loudly (diff
    * snapshots instead). File attribution: ADDED (status 1) entries
    * whose snapshot id (entry field, else the manifest-list row's
    * `added_snapshot_id`) is the snapshot in question — EXISTING
    * entries re-listed by later rewrites never double-count. */
  def appendsBetween(spark: SparkSession, table: String,
                     fromSnapshotId: Long,
                     toSnapshotId: Long = -1L): DataFrame = {
    val ctx = new Ctx(spark, table)
    val toId =
      if (toSnapshotId >= 0) toSnapshotId
      else asLong(ctx.root.getOrElse("current-snapshot-id",
        sys.error(s"table has no current snapshot: ${ctx.metaFile}")))
    // parent-chain walk: to → … → from (exclusive of `from`)
    val chain = scala.collection.mutable.ArrayBuffer.empty[JMap]
    var cur = toId
    while (cur != fromSnapshotId) {
      require(chain.length <= 100000, "snapshot chain too long")
      val s = ctx.snapById(cur)
      chain += s
      cur = s.get("parent-snapshot-id") match {
        case Some(p) if p != null => asLong(p)
        case _ => sys.error(
          s"snapshot $fromSnapshotId is not an ancestor of $toId in $table")
      }
    }
    import org.apache.spark.sql.functions._
    val perSnap = chain.reverse.toSeq.map { s => // oldest → newest
      val sid = asLong(s.getOrElse("snapshot-id",
        sys.error("snapshot without id")))
      val op = s.get("summary").map(asMap)
        .flatMap(_.get("operation")).map(asStr).getOrElse("append")
      require(op == "append",
        s"appendsBetween: snapshot $sid is '$op', not an append — " +
          "overwrites/deletes in range cannot surface as arrivals")
      val rows = ctx.manifestRowsOf(s)
        .filterNot(_.get("content").exists(asLong(_) == 1L))
      val files = ctx.decodeManifests(rows).flatMap { case (mrow, entries) =>
        val mAdded = mrow.get("added_snapshot_id") match {
          case Some(v) if v != null => asLong(v)
          case _ => -1L
        }
        entries.flatMap { e =>
          val status = asLong(e.getOrElse("status",
            sys.error("manifest entry without status")))
          require(status >= 0 && status <= 2,
            s"invalid manifest entry status $status")
          val df = asMap(e.getOrElse("data_file",
            sys.error("manifest entry without data_file")))
          val esnap = e.get("snapshot_id") match {
            case Some(v) if v != null => asLong(v)
            case _ => mAdded
          }
          if (status == 1 && esnap == sid) {
            val fmt = df.get("file_format").map(_.toString.toUpperCase)
              .getOrElse("PARQUET")
            require(fmt == "PARQUET",
              s"unsupported Iceberg data file format $fmt")
            Some((df.getOrElse("file_path",
              sys.error("data_file without file_path")).toString,
              df.get("partition").map(asMap).orNull))
          } else None
        }
      }
      (sid, files)
    }
    val nonEmpty = perSnap.filter(_._2.nonEmpty)
    if (nonEmpty.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(ctx.sparkSchema.fields.toSeq :+
          StructField("_snapshot_id", LongType, nullable = false)))
    else nonEmpty.map { case (sid, files) =>
      // identity columns reconstruct from the tuples, as in plan()
      if (ctx.identityFields.isEmpty)
        ctx.pinnedParquet(spark,
          files.map(f => ctx.rebase(f._1).toString))
          .withColumn("_snapshot_id", lit(sid))
      else ctx.identityRead(spark, files,
        Seq(lit(sid).as("_snapshot_id")))
    }.reduce(_ unionByName _)
  }

  /** Spark → Iceberg primitive type name (the [[sparkType]] inverse);
    * nested/unsupported types decline loudly — this writer never
    * miswrites a schema. */
  private def iceTypeOf(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case StringType => "string"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case other => sys.error(
      s"iceberg append: unsupported column type ${other.simpleString}")
  }

  /** Minimal JSON serializer over the parsed-metadata value tree
    * (Map / Seq / String / Long / Double / Boolean / null) — what
    * [[commitAppend]] uses to re-emit the carried-forward metadata. */
  private def jsonWrite(v: Any): String = v match {
    case null => "null"
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) =>
        "\"" + jsonEsc(k.toString) + "\":" + jsonWrite(x)
      }.mkString("{", ",", "}")
    case s: scala.collection.Seq[_] =>
      s.map(jsonWrite).mkString("[", ",", "]")
    case s: String => "\"" + jsonEsc(s) + "\""
    case b: java.lang.Boolean => b.toString
    case n: java.lang.Long => n.toString
    case n: java.lang.Integer => n.toString
    case d: java.lang.Double => d.toString
    case other => sys.error(s"iceberg metadata write: cannot emit $other")
  }
  /** %XX-only decode of a Hive partition-dir value segment (a '+' is
    * a literal plus there, not a space). */
  private def uriDecodeSeg(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  private def jsonEsc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Manifest-entry Avro schema; partitioned tables get a `partition`
    * record field typed per partition column. */
  private def manifestWriteSchema(
      partFields: Seq[(String, String)]): String = {
    val partition =
      if (partFields.isEmpty) ""
      else {
        val fs = partFields.map { case (n, t) =>
          s"""{"name":"${n}","type":["null","$t"],"default":null}"""
        }.mkString(",")
        s""",{"name":"partition","type":["null",{"type":"record",""" +
          s""""name":"r102","fields":[$fs]}],"default":null}"""
      }
    s"""{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"snapshot_id","type":["null","long"]},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"},
      |    {"name":"file_size_in_bytes","type":"long"}$partition,
      |    {"name":"lower_bounds","type":["null",{"type":"array","items":
      |      {"type":"record","name":"kv1","fields":[
      |        {"name":"key","type":"int"},
      |        {"name":"value","type":"bytes"}]}}],"default":null},
      |    {"name":"upper_bounds","type":["null",{"type":"array","items":
      |      {"type":"record","name":"kv2","fields":[
      |        {"name":"key","type":"int"},
      |        {"name":"value","type":"bytes"}]}}],"default":null}]}}]}"""
      .stripMargin.replaceAll("\n\\s*", "")
  }
  private val ManifestListWriteSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"partition_spec_id","type":"int"},
      |  {"name":"content","type":"int"},
      |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
      .stripMargin.replaceAll("\n\\s*", "")

  /** APPEND WRITER — the Iceberg sibling of
    * [[DeltaLite.commitAppend]], and the productionized form of what
    * the gate fixtures hand-build: writes `df` as parquet DISTRIBUTED
    * under `data/`, one ADDED-entry manifest (with per-file
    * record_count and int/long/string lower/upper bounds in
    * single-value serialization — so written tables file-skip through
    * [[prunedScan]]/[[prunedScanString]]), a manifest list re-listing
    * the parent snapshot's manifests plus the new one, and the next
    * `vN.metadata.json` (format-version 1, UNPARTITIONED — the
    * carried-forward metadata re-emits verbatim, with the new
    * snapshot chained to its parent). Deterministic snapshot ids /
    * timestamps (monotonic from the table's own history). First
    * commit creates the table from the DataFrame's schema; later
    * appends require matching names + types. Returns the new
    * snapshot id.
    *
    * Declines loudly: nested/unsupported column types,
    * format-version-2 tables (sequence-number semantics this writer
    * does not emit), schema mismatch, empty appends. */
  /** Commits a new CURRENT schema — Iceberg's schema evolution as an
    * operation: RENAME a column by keeping its field id under a new
    * name, DROP one by leaving its id out, ADD one by minting a fresh
    * id (higher than any the table ever used — Iceberg's rule; a
    * reused id would resurrect the dropped column's old values).
    * Existing data files are untouched: reads after an update that
    * moved any name resolve columns by FIELD ID ([[Ctx
    * .needsIdResolution]]), which is why old files keep reading
    * correctly — renamed columns surface their old values under the
    * new name, re-added names read NULL from files written before the
    * re-add.
    *
    * `fields` are (field id, name, Spark type, nullable), the new
    * current schema in order. Appends to the metadata's `schemas`
    * history (wrapping a singular pre-evolution `schema` as schema-id
    * 0) and bumps `current-schema-id`; the next [[commitAppend]] must
    * then match the NEW schema. Declines loudly: unknown table, kept
    * ids whose type changed (promotion is beyond this writer),
    * duplicate ids/names, nested types. */
  def commitSchemaUpdate(spark: SparkSession, table: String,
                         fields: Seq[(Long, String, DataType, Boolean)])
      : Unit = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fields.foreach { case (_, _, dt, _) => iceTypeOf(dt) } // flat only
    require(fields.map(_._1).distinct.length == fields.length,
      "schema update: duplicate field ids")
    require(fields.map(_._2).distinct.length == fields.length,
      "schema update: duplicate field names")
    val ctx = new Ctx(spark, table)
    val m = java.util.regex.Pattern.compile("v(\\d+)\\.metadata\\.json")
      .matcher(ctx.metaFile.getName)
    require(m.matches(), s"unversioned metadata file ${ctx.metaFile}")
    val prevVersion = m.group(1).toLong

    // the full schema history, each entry with a schema-id
    val prevSchemas: Seq[JMap] = ctx.root.get("schemas") match {
      case Some(ss) => asSeq(ss).map(asMap).toSeq
      case None => Seq(asMap(ctx.root.getOrElse("schema",
        sys.error(s"no schema in $table"))).toMap
        .updated("schema-id", 0L))
    }
    def fieldsOf(s: JMap): Seq[JMap] =
      asSeq(s.getOrElse("fields", sys.error("schema without fields")))
        .map(asMap).toSeq
    // kept ids must keep their type; new ids must be genuinely new
    val everUsed: Map[Long, String] = prevSchemas.flatMap(fieldsOf)
      .flatMap(f => f.get("id").map(id =>
        asLong(id) -> asStr(f.getOrElse("type", "")))).toMap
    val curIds: Set[Long] = fieldsOf(ctx.schemaObj)
      .flatMap(_.get("id").map(asLong)).toSet
    fields.foreach { case (id, name, dt, _) =>
      if (curIds(id))
        require(everUsed(id) == iceTypeOf(dt),
          s"schema update: field id $id ($name) changes type " +
            s"${everUsed(id)} -> ${iceTypeOf(dt)} — type promotion " +
            "is beyond this writer")
      else require(!everUsed.contains(id) &&
        id > everUsed.keys.foldLeft(0L)(math.max),
        s"schema update: new field id $id for $name must exceed " +
          "every id the table ever used (a reused id resurrects " +
          "dropped data)")
    }
    require(fields.map(_._1).toSet != curIds ||
      fieldsOf(ctx.schemaObj).flatMap(f => f.get("name").map(asStr)) !=
        fields.map(_._2),
      "schema update: identical to the current schema")

    val newSchemaId = prevSchemas
      .flatMap(_.get("schema-id").map(asLong)).foldLeft(0L)(math.max) + 1
    val newSchema = Map[String, Any]("type" -> "struct",
      "schema-id" -> newSchemaId,
      "fields" -> fields.map { case (id, name, dt, nullable) =>
        Map[String, Any]("id" -> id, "name" -> name,
          "required" -> java.lang.Boolean.valueOf(!nullable),
          "type" -> iceTypeOf(dt))
      })
    val newRoot = ctx.root.toMap - "schema" ++ Map[String, Any](
      "schemas" -> (prevSchemas.map(_.toMap) :+ newSchema),
      "current-schema-id" -> newSchemaId,
      "last-column-id" -> fields.map(_._1)
        .foldLeft(everUsed.keys.foldLeft(0L)(math.max))(math.max))
    val metaDir = new Path(table, "metadata")
    val newVersion = prevVersion + 1
    writeFile(fs, new Path(metaDir, s"v$newVersion.metadata.json"),
      jsonWrite(newRoot).getBytes("UTF-8"))
    writeFile(fs, new Path(metaDir, "version-hint.text"),
      s"$newVersion\n".getBytes("UTF-8"), overwrite = true)
  }

  /** EXPIRE SNAPSHOTS — Iceberg's retention maintenance, the
    * [[DeltaLite.vacuum]]+[[DeltaLite.cleanLog]] sibling in one
    * operation (Iceberg's metadata tree makes reachability exact, so
    * the log and storage halves collapse): drops every snapshot whose
    * `timestamp-ms` is at or before `olderThanMs` — the CURRENT
    * snapshot always survives — writes the next metadata version, and
    * deletes the files only the expired snapshots reach: their
    * manifest lists, manifests no surviving snapshot lists, and data
    * files no surviving manifest MENTIONS. "Mentions" counts every
    * entry status: a file a retained manifest still records as
    * DELETED stays on disk (it may serve other history; Iceberg
    * removes such files later, when manifest rewrites age the entry
    * out) — conservative, never deletes anything a retained snapshot
    * could read. All reachability is computed on the metadata tier
    * (parallel manifest decode); data bytes are never read. Time
    * travel to an expired snapshot, and `appendsBetween` from one,
    * then decline through their existing lookup/ancestry checks.
    * Returns the expired snapshot ids, sorted. */
  def expireSnapshots(spark: SparkSession, table: String,
                      olderThanMs: Long): Seq[Long] = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ctx = new Ctx(spark, table)
    val m = java.util.regex.Pattern.compile("v(\\d+)\\.metadata\\.json")
      .matcher(ctx.metaFile.getName)
    require(m.matches(), s"unversioned metadata file ${ctx.metaFile}")
    val prevVersion = m.group(1).toLong
    val curId = ctx.root.get("current-snapshot-id").map(asLong)
      .getOrElse(sys.error(s"table has no current snapshot: $table"))
    val (expired, survivors) = ctx.snaps.toSeq.partition { s =>
      asLong(s.getOrElse("timestamp-ms", 0L)) <= olderThanMs &&
        !s.get("snapshot-id").map(asLong).contains(curId)
    }
    if (expired.isEmpty) return Seq.empty

    // (manifest-list file, listed manifests, mentioned data files)
    def reachOf(snaps: Seq[JMap]): (Set[String], Set[String], Set[String]) = {
      val lists = snaps.flatMap(_.get("manifest-list").map(asStr)).toSet
      val rows = snaps.flatMap(s => ctx.manifestRowsOf(s))
      val manifests = rows.map(ctx.pathOf).toSet
      // decode each distinct manifest once across the snapshot set
      val dataFiles = ctx.decodeManifests(
        rows.groupBy(ctx.pathOf).map(_._2.head).toSeq)
        .flatMap { case (mrow, entries) =>
          entries.map(e => asStr(asMap(e.getOrElse("data_file",
            sys.error(s"manifest ${ctx.pathOf(mrow)} entry without " +
              "data_file"))).getOrElse("file_path",
            sys.error("data_file without file_path"))))
        }.toSet
      (lists, manifests, dataFiles)
    }
    val (keepLists, keepManifests, keepData) = reachOf(survivors)
    val (dropLists, dropManifests, dropData) = reachOf(expired.toSeq)
    val victims = (dropLists -- keepLists) ++
      (dropManifests -- keepManifests) ++ (dropData -- keepData)
    victims.foreach(uri => fs.delete(ctx.rebase(uri), false))

    // next metadata version: snapshots trimmed (and snapshot-log with
    // them, when present), everything else carried forward
    val survivorIds = survivors
      .flatMap(_.get("snapshot-id").map(asLong)).toSet
    val base = ctx.root.toMap ++ Map[String, Any](
      "snapshots" -> survivors.map(_.toMap))
    val newRoot = base.get("snapshot-log") match {
      case Some(log) => base.updated("snapshot-log",
        asSeq(log).map(asMap).filter(_.get("snapshot-id")
          .exists(id => survivorIds(asLong(id)))).map(_.toMap))
      case None => base
    }
    val metaDir = new Path(table, "metadata")
    val newVersion = prevVersion + 1
    writeFile(fs, new Path(metaDir, s"v$newVersion.metadata.json"),
      jsonWrite(newRoot).getBytes("UTF-8"))
    writeFile(fs, new Path(metaDir, "version-hint.text"),
      s"$newVersion\n".getBytes("UTF-8"), overwrite = true)
    expired.flatMap(_.get("snapshot-id").map(asLong)).sorted
  }

  def commitAppend(spark: SparkSession, table: String,
                   df: DataFrame,
                   partitionBy: Seq[String] = Nil): Long =
    commitSnapshot(spark, table, Option(df), partitionBy, Nil, "append")

  /** Row-level DELETE, COPY-ON-WRITE — the decontamination / GDPR
    * operation ([[DeltaLite.commitDelete]] sibling): ONE distributed
    * scan finds the files holding matching rows, ONLY those files
    * rewrite (their surviving rows re-stage as new data files; the
    * table's other files are untouched), and one `overwrite` snapshot
    * atomically carries the rewritten adds plus DELETED entries for
    * the affected originals. NULL-predicate rows are NOT matches —
    * they survive. A predicate matching nothing commits nothing and
    * returns the current snapshot id. Time travel to pre-delete
    * snapshots still reads the original files; `appendsBetween`
    * across the delete declines through its overwrite check.
    * Unpartitioned format-v1 tables without v2 delete manifests;
    * anything else declines loudly. Returns the new snapshot id. */
  def commitDelete(spark: SparkSession, table: String,
                   predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions._
    val t = dmlLiveTarget(spark, table, "delete")
    val affected = t.df.filter(predicate).select("__file")
      .distinct().collect().map(_.getString(0)).toSet // planning-bounded
    if (affected.isEmpty) return t.curId

    val sq = spark
    import sq.implicits._
    val affDf = broadcast(affected.toSeq.sorted.toDF("__file"))
    // survivors of ONLY the affected files; a NULL predicate is not a
    // match, so those rows must survive the rewrite
    val survivors = t.df.join(affDf, Seq("__file"), "left_semi")
      .filter(not(coalesce(predicate, lit(false))))
      .select(t.dataCols.map(col): _*)
    commitSnapshot(spark, table, Some(survivors), Nil,
      t.deletedEntriesOf(affected), "overwrite")
  }

  /** UPDATE, COPY-ON-WRITE — the [[DeltaLite.commitUpdate]] sibling:
    * `set` expressions applied to every row the predicate matches
    * (NULL-predicate rows are not matches), only files holding
    * matches rewrite, one `overwrite` snapshot. Same decline set as
    * [[commitDelete]]. Returns the new snapshot id (current id on a
    * no-match no-op). */
  def commitUpdate(spark: SparkSession, table: String,
                   predicate: org.apache.spark.sql.Column,
                   set: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    import org.apache.spark.sql.functions._
    require(set.nonEmpty, "UPDATE needs at least one set expression")
    val t = dmlLiveTarget(spark, table, "update")
    val schema = t.ctx.sparkSchema
    set.foreach { case (c, _) =>
      require(schema.fieldNames.contains(c),
        s"UPDATE set column $c not in the table schema") }
    val affected = t.df.filter(predicate).select("__file")
      .distinct().collect().map(_.getString(0)).toSet // planning-bounded
    if (affected.isEmpty) return t.curId

    val sq = spark
    import sq.implicits._
    val affDf = broadcast(affected.toSeq.sorted.toDF("__file"))
    val inAffected = t.df.join(affDf, Seq("__file"), "left_semi")
    val setMap = set.toMap
    // ONE pass over the affected files: every row survives the rewrite
    // (matched rows with `set` applied, the rest verbatim), so a
    // per-column `when(predicate, set)` projection replaces the old
    // two-filter union — half the affected-file scan, same row multiset
    val matched = coalesce(predicate, lit(false))
    val rewrite = inAffected.select(t.dataCols.map { c =>
      setMap.get(c)
        .map(e => when(matched, e.cast(schema(c).dataType))
          .otherwise(col(c)).as(c))
        .getOrElse(col(c)) }: _*)
    commitSnapshot(spark, table, Some(rewrite), Nil,
      t.deletedEntriesOf(affected), "overwrite")
  }

  /** The live target of a copy-on-write DML commit ([[commitDelete]]
    * / [[commitUpdate]] / [[commitMerge]]): the current snapshot's
    * live files (status replay over its data manifests) and ONE
    * pinned read of them with a decoded `__file` key. Unpartitioned
    * format-v1 tables without v2 delete manifests; anything else
    * declines loudly. */
  private final case class DmlTarget(ctx: Ctx, curId: Long,
                                     live: Seq[(String, JMap)],
                                     df: DataFrame) {
    def dataCols: Seq[String] = ctx.sparkSchema.fieldNames.toSeq
    private def decodedFname(p: String): String =
      uriDecodeSeg(p.substring(p.lastIndexOf('/') + 1))
    /** DELETED manifest entries for the affected (by decoded
      * basename) files — wire fields only, bounds dropped. */
    def deletedEntriesOf(affected: Set[String]): Seq[JMap] = {
      val es: Seq[JMap] = live.collect {
        case (p, dfm) if affected(decodedFname(p)) =>
          Map[String, Any]("file_path" -> p,
            "file_format" -> "PARQUET",
            "record_count" -> dfm.get("record_count").map(asLong)
              .getOrElse(0L),
            "file_size_in_bytes" -> dfm.get("file_size_in_bytes")
              .map(asLong).getOrElse(1L),
            "lower_bounds" -> null,
            "upper_bounds" -> null): JMap
      }
      require(es.length == affected.size,
        s"affected files ${affected.size} resolved to " +
          s"${es.length} manifest entries")
      es
    }
  }

  private def dmlLiveTarget(spark: SparkSession, table: String,
                            op: String): DmlTarget = {
    import org.apache.spark.sql.functions._
    val ctx = new Ctx(spark, table)
    require(asLong(ctx.root.getOrElse("format-version", 1L)) == 1L,
      s"iceberg $op supports format-version 1 tables only")
    require(ctx.defaultSpecFields.isEmpty,
      s"iceberg $op on partitioned tables is beyond this writer")
    val curId = asLong(ctx.root.getOrElse("current-snapshot-id",
      sys.error(s"table has no current snapshot: $table")))
    val snap = ctx.snapById(curId)
    val manifestRows = ctx.manifestRowsOf(snap)
    require(!manifestRows.exists(_.get("content").exists(asLong(_) == 1L)),
      s"iceberg $op over v2 delete manifests is beyond this writer")

    // current live files (ADDED/EXISTING minus DELETED, in order)
    val live = scala.collection.mutable.LinkedHashMap.empty[String, JMap]
    ctx.decodeManifests(manifestRows).foreach { case (mrow, entries) =>
      val mp = ctx.pathOf(mrow)
      entries.foreach { e =>
        val status = asLong(e.getOrElse("status",
          sys.error(s"manifest $mp entry without status")))
        val dfm = asMap(e.getOrElse("data_file",
          sys.error(s"manifest $mp entry without data_file")))
        val path = dfm.getOrElse("file_path",
          sys.error(s"manifest $mp data_file without file_path")).toString
        if (status == 2) live.remove(path) else live(path) = dfm
      }
    }
    require(live.nonEmpty, s"empty Iceberg snapshot of $table")
    val df = ctx.pinnedParquet(spark, live.keys.toSeq
        .map(p => ctx.rebase(p).toString),
      Seq(url_decode(regexp_replace(
        element_at(split(col("_metadata.file_path"), "/"), -1),
        "\\+", "%2B")).as("__file")))
    DmlTarget(ctx, curId, live.toSeq, df)
  }

  /** MERGE (upsert), COPY-ON-WRITE — the [[DeltaLite.commitMerge]]
    * sibling: source rows whose `keyCols` match a target row UPDATE
    * every matching copy to the source's values, unmatched source
    * rows INSERT; only files holding matches rewrite, and one
    * snapshot atomically carries the rewritten adds plus DELETED
    * entries for the affected originals (`overwrite` when files
    * rewrite; a pure-insert merge is an `append`, so incremental
    * consumers keep reading through it). NULL keys never match.
    * Declines loudly: duplicate source keys, schema mismatch,
    * partitioned / v2-delete tables. An empty source is a no-op
    * returning the current snapshot id. */
  def commitMerge(spark: SparkSession, table: String, source: DataFrame,
                  keyCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val t = dmlLiveTarget(spark, table, "merge")
    val ctx = t.ctx
    require(source.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      ctx.sparkSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"merge source schema ${source.schema.simpleString} does not " +
        s"match the table schema ${ctx.sparkSchema.simpleString}")
    keyCols.foreach(k =>
      require(ctx.sparkSchema.fieldNames.contains(k),
        s"merge key $k not in the table schema"))
    // the merge SOURCE is consumed four ways (dup-key check, the key
    // broadcasts, the update join, the insert anti-join) — it is
    // batch-sized by definition, so materialize it ONCE instead of
    // re-running its upstream plan per consumer (the DeltaLite.commitMerge
    // treatment)
    val src = source.localCheckpoint(true)
    require(src.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).isEmpty,
      "merge source has duplicate keys — ambiguous merge")
    if (src.isEmpty) return t.curId

    val dataCols = t.dataCols
    val target = t.df
    val srcKeys = src.select(keyCols.map(col): _*)
    // matched target rows are bounded by the source batch's key
    // fan-out; materialized once, they serve both the affected-file
    // list and the update join without two full table scans
    val matchedTarget = target.join(broadcast(srcKeys), keyCols,
      "left_semi").localCheckpoint(true)
    val affected = matchedTarget.select("__file").distinct()
      .collect().map(_.getString(0)).toSet // planning-bounded
    val sq = spark
    import sq.implicits._
    val srcRenamed = src.select(dataCols.map(c =>
      col(c).as(if (keyCols.contains(c)) c else s"__src_$c")): _*)
    val updates = matchedTarget.join(srcRenamed, keyCols)
      .select(dataCols.map(c =>
        (if (keyCols.contains(c)) col(c)
         else col(s"__src_$c").as(c))): _*)
    val inserts = src.join(
      target.select(keyCols.map(col): _*), keyCols, "left_anti")
    val newData =
      (if (affected.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(source.schema.fields.toSeq.map(
            _.copy(metadata = Metadata.empty))))
      else {
        val affDf = broadcast(affected.toSeq.sorted.toDF("__file"))
        target.join(affDf, Seq("__file"), "left_semi")
          .join(broadcast(srcKeys), keyCols, "left_anti")
          .select(dataCols.map(col): _*)
          .unionByName(updates)
      }).unionByName(inserts)
    val deletedEntries = t.deletedEntriesOf(affected)
    commitSnapshot(spark, table, Some(newData), Nil, deletedEntries,
      if (deletedEntries.isEmpty) "append" else "overwrite")
  }

  /** Shared snapshot writer behind [[commitAppend]] and
    * [[commitDelete]]: optional staged data (None = a delete-only
    * snapshot), plus extra DELETED entries appended to the new
    * manifest so removed files replay out atomically with the
    * rewritten ones. */
  private def commitSnapshot(spark: SparkSession, table: String,
                             dfOpt: Option[DataFrame],
                             partitionBy: Seq[String],
                             deletedEntries: Seq[JMap],
                             operation: String): Long = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(table, "metadata")
    val exists = fs.exists(metaDir)
    require(dfOpt.nonEmpty || exists,
      s"a data-less snapshot needs an existing table: $table")
    // ONE Ctx serves the whole commit (validation here, the parent's
    // manifest list below) — a second construction would re-read and
    // re-parse metadata.json for nothing
    val (ctx0, prevVersion): (Ctx, Long) =
      if (!exists) (null, 0L)
      else {
        val ctx = new Ctx(spark, table)
        require(asLong(ctx.root.getOrElse("format-version", 1L)) == 1L,
          "iceberg append supports format-version 1 tables only")
        val specIdentity = ctx.defaultSpecFields.map { f =>
          require(f.get("transform").map(asStr).contains("identity"),
            "iceberg append: the table's partition spec has " +
              "non-identity transforms — beyond this writer")
          asStr(f.getOrElse("name", sys.error("partition field unnamed")))
        }
        require(specIdentity.toSeq == partitionBy,
          s"append partitioning $partitionBy does not match the " +
            s"table's identity spec ${specIdentity.toSeq}")
        val m = java.util.regex.Pattern.compile("v(\\d+)\\.metadata\\.json")
          .matcher(ctx.metaFile.getName)
        require(m.matches(), s"unversioned metadata file ${ctx.metaFile}")
        (ctx, m.group(1).toLong)
      }
    val root0: JMap = if (ctx0 == null) null else ctx0.root
    val tableSchema: StructType =
      if (ctx0 == null) null else ctx0.sparkSchema
    val schema = dfOpt.map(_.schema).getOrElse(StructType(
      tableSchema.fields.toSeq.map(_.copy(metadata = Metadata.empty))))
    schema.fields.foreach(f => iceTypeOf(f.dataType)) // validate upfront
    // identity partition columns: int/long/string sources only (the
    // reconstruction + tuple-Avro faces this writer emits)
    partitionBy.foreach { pc =>
      require(schema.fieldNames.contains(pc),
        s"partition column $pc not in the DataFrame")
      val dt = schema(pc).dataType
      require(dt == LongType || dt == IntegerType || dt == StringType,
        s"iceberg append: unsupported partition column type " +
          s"${dt.simpleString} for $pc (int/long/string)")
    }
    if (exists && dfOpt.nonEmpty)
      require(tableSchema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"append schema ${schema.simpleString} does not match the " +
          s"table schema ${tableSchema.simpleString}")
    val prevSnaps: Seq[JMap] =
      if (root0 == null) Seq.empty
      else root0.get("snapshots")
        .map(v => asSeq(v).map(asMap).toSeq).getOrElse(Seq.empty)
    val parentId: Long =
      if (root0 == null) -1L
      else root0.get("current-snapshot-id").map(asLong).getOrElse(-1L)
    val snapId = prevSnaps
      .map(s => asLong(s.getOrElse("snapshot-id", 0L)))
      .foldLeft(3051800000000000000L)(math.max) + 1
    val tsMs = prevSnaps
      .map(s => asLong(s.getOrElse("timestamp-ms", 0L)))
      .foldLeft(1700000000000L)(math.max) + 1000
    val location =
      if (root0 != null && root0.contains("location"))
        asStr(root0("location"))
      else new Path(table).toUri.toString

    // field ids for this table's columns: a new table numbers 1..n,
    // an existing table reuses the CURRENT schema's ids (appends must
    // agree with the table history, not restart numbering)
    val nameToId: Map[String, Long] =
      if (root0 == null) schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> (i + 1).toLong }.toMap
      else {
        val ctxSchema = root0.get("schemas") match {
          case Some(ss) =>
            val id = asLong(root0.getOrElse("current-schema-id", 0L))
            asSeq(ss).map(asMap)
              .find(m => m.get("schema-id").exists(asLong(_) == id))
              .getOrElse(sys.error("current schema not found"))
          case None => asMap(root0("schema"))
        }
        asSeq(ctxSchema.getOrElse("fields", sys.error("no fields")))
          .map(asMap).map(f => asStr(f("name")) -> asLong(f("id"))).toMap
      }

    // ---- distributed data write: staging (hive layout when
    // partitioned — identity columns then live ONLY in the tuple,
    // like real writers), then flat data/part-… names with the
    // partition value strings remembered per file ----
    // Every column carries its field id as `parquet.field.id`
    // metadata, which Spark's parquet writer stamps into the files
    // (`spark.sql.parquet.fieldId.write.enabled`, default true) — the
    // spec's requirement, and what keeps these files readable after a
    // future rename flips the table to field-id resolution.
    val staging = new Path(table, s".staging-$snapId")
    val moved: Seq[(Path, Seq[String])] = dfOpt match {
      case None => Seq.empty
      case Some(df) =>
        val idDf = df.select(schema.fields.toSeq.map { f =>
          org.apache.spark.sql.functions.col(f.name).as(f.name,
            new MetadataBuilder()
              .putLong("parquet.field.id", nameToId(f.name)).build())
        }: _*)
        val writer = if (partitionBy.isEmpty) idDf.write
          else idDf.write.partitionBy(partitionBy: _*)
        writer.mode("overwrite").parquet(staging.toString)
        def listParquet(dir: Path,
                        prefix: Seq[String]): Seq[(Path, Seq[String])] =
          fs.listStatus(dir).toSeq.flatMap { st =>
            val name = st.getPath.getName
            if (st.isDirectory && name.contains("="))
              listParquet(st.getPath,
                prefix :+ uriDecodeSeg(
                  name.substring(name.indexOf('=') + 1)))
            else if (name.endsWith(".parquet")) Seq(st.getPath -> prefix)
            else Seq.empty
          }
        val staged = listParquet(staging, Seq.empty)
        require(staged.nonEmpty || deletedEntries.nonEmpty,
          s"append of an empty DataFrame to $table")
        staged.foreach { case (_, pv) =>
          require(pv.length == partitionBy.length,
            s"unexpected staging layout under $staging") }
        val mv = staged.zipWithIndex.map { case ((src, pv), i) =>
          val dest = new Path(new Path(table, "data"),
            f"part-$snapId-$i%05d.parquet")
          fs.mkdirs(dest.getParent)
          require(fs.rename(src, dest), s"rename to $dest failed")
          (dest, pv)
        }
        fs.delete(staging, true)
        mv
    }

    // ---- per-file count + bounds from the parquet FOOTERS the write
    // itself produced: driver-side metadata tail-reads, never a
    // distributed read-back of the bytes just written (guide §6; one
    // fewer Spark job per commit). Data files exclude identity
    // partition columns (the tuple carries them), so the recorded
    // bounds do too. The footer's raw stat bytes ARE Iceberg
    // single-value serialization for these types (int/long little-
    // endian, strings UTF-8), so they record verbatim. ----
    val statFields = schema.fields.filter(f =>
      !partitionBy.contains(f.name) &&
        (f.dataType == LongType || f.dataType == IntegerType ||
          f.dataType == StringType))
    val statRows = FooterStats.forFiles(fs, moved.map(_._1))

    def boundsOf(st: FooterStats.FileStats, which: Int): Any = {
      val kvs = statFields.flatMap { f =>
        val expected = f.dataType match {
          case LongType => 2
          case IntegerType => 1
          case _ => 6
        }
        st.bounds.get(f.name) match {
          case Some((pt, mn, mx)) if pt == expected =>
            Some(Map[String, Any]("key" -> nameToId(f.name).toInt,
              "value" -> (if (which == 0) mn else mx)))
          case _ => None // absent/ill-typed stat: no bound (kept)
        }
      }
      if (kvs.isEmpty) null else kvs.toSeq
    }
    def fnameOf(p: Path): String = p.getName
    // zero-row part files carry nothing — drop them instead of
    // committing empty data files
    val (nonEmptyParts, emptyParts) = moved.partition { case (dest, _) =>
      statRows.get(fnameOf(dest)).exists(_.numRows > 0) }
    emptyParts.foreach { case (p, _) => fs.delete(p, false) }
    require(nonEmptyParts.nonEmpty || deletedEntries.nonEmpty,
      s"append of an empty DataFrame to $table")
    // identity tuple values, typed per the source column
    def tupleValue(pc: String, raw: String): Any = {
      require(raw != "__HIVE_DEFAULT_PARTITION__",
        s"iceberg append: null partition value for $pc is beyond " +
          "this writer")
      schema(pc).dataType match {
        case StringType => raw
        case _ => java.lang.Long.valueOf(raw.toLong)
      }
    }
    val entries = nonEmptyParts.map { case (dest, pv) =>
      val r = statRows.getOrElse(fnameOf(dest),
        sys.error(s"no stats row for $dest"))
      val dataFile = Map[String, Any](
        "file_path" -> s"$location/data/${fnameOf(dest)}",
        "file_format" -> "PARQUET",
        "record_count" -> r.numRows,
        "file_size_in_bytes" -> fs.getFileStatus(dest).getLen,
        "lower_bounds" -> boundsOf(r, 0),
        "upper_bounds" -> boundsOf(r, 1)) ++
        (if (partitionBy.isEmpty) Map.empty[String, Any]
         else Map("partition" -> partitionBy.zip(pv).map {
           case (pc, raw) => pc -> tupleValue(pc, raw)
         }.toMap))
      Map[String, Any]("status" -> 1,
        "snapshot_id" -> java.lang.Long.valueOf(snapId),
        "data_file" -> dataFile)
    } ++ deletedEntries.map(df0 => Map[String, Any]("status" -> 2,
      "snapshot_id" -> java.lang.Long.valueOf(snapId),
      "data_file" -> df0.toMap))

    // ---- manifest + manifest list ----
    fs.mkdirs(metaDir)
    val manifestName = s"manifest-$snapId.avro"
    val partAvroFields = partitionBy.map(pc => pc ->
      (if (schema(pc).dataType == StringType) "string" else "long"))
    val manifestBytes = graft.functions.AvroWrite
      .genericFileBytes(manifestWriteSchema(partAvroFields), entries)
    writeFile(fs, new Path(metaDir, manifestName), manifestBytes)
    val prevListRows: Seq[JMap] =
      if (parentId < 0) Seq.empty
      else ctx0.manifestRowsOf(ctx0.snapById(parentId))
    val listRows = prevListRows.map { r =>
      Map[String, Any](
        "manifest_path" -> asStr(r.getOrElse("manifest_path",
          sys.error("manifest row without path"))),
        "manifest_length" -> r.get("manifest_length").map(asLong)
          .getOrElse(1L),
        "partition_spec_id" -> r.get("partition_spec_id").map(asLong)
          .getOrElse(0L).toInt,
        "content" -> r.get("content").map(asLong).getOrElse(0L).toInt,
        "added_snapshot_id" -> r.get("added_snapshot_id").collect {
          case v if v != null => java.lang.Long.valueOf(asLong(v))
        }.orNull)
    } :+ Map[String, Any](
      "manifest_path" -> s"$location/metadata/$manifestName",
      "manifest_length" -> manifestBytes.length.toLong,
      "partition_spec_id" -> 0, "content" -> 0,
      "added_snapshot_id" -> java.lang.Long.valueOf(snapId))
    val listName = s"snap-$snapId.avro"
    writeFile(fs, new Path(metaDir, listName), graft.functions.AvroWrite
      .genericFileBytes(ManifestListWriteSchema, listRows))

    // ---- next metadata version (carry the old root forward) ----
    val newSnap = Map[String, Any](
      "snapshot-id" -> snapId,
      "timestamp-ms" -> tsMs,
      "summary" -> Map[String, Any]("operation" -> operation),
      "manifest-list" -> s"$location/metadata/$listName") ++
      (if (parentId >= 0) Map("parent-snapshot-id" -> parentId)
       else Map.empty[String, Any])
    val baseRoot: Map[String, Any] =
      if (root0 != null) root0.toMap
      else Map[String, Any](
        "format-version" -> 1L,
        "table-uuid" -> f"graft-0000-4000-8000-${table.hashCode.abs}%012d",
        "location" -> location,
        "schema" -> Map[String, Any]("type" -> "struct",
          "fields" -> schema.fields.toSeq.map(f => Map[String, Any](
            "id" -> nameToId(f.name),
            "name" -> f.name,
            "required" -> java.lang.Boolean.valueOf(!f.nullable),
            "type" -> iceTypeOf(f.dataType)))),
        "partition-spec" -> partitionBy.zipWithIndex.map {
          case (pc, i) => Map[String, Any](
            "source-id" -> nameToId(pc), "field-id" -> (1000L + i),
            "name" -> pc, "transform" -> "identity")
        })
    val newRoot = baseRoot ++ Map[String, Any](
      "last-updated-ms" -> tsMs,
      "current-snapshot-id" -> snapId,
      "snapshots" -> (prevSnaps.map(_.toMap) :+ newSnap))
    val newVersion = prevVersion + 1
    writeFile(fs, new Path(metaDir, s"v$newVersion.metadata.json"),
      jsonWrite(newRoot).getBytes("UTF-8"))
    writeFile(fs, new Path(metaDir, "version-hint.text"),
      s"$newVersion\n".getBytes("UTF-8"), overwrite = true)
    snapId
  }

  private def writeFile(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                        bytes: Array[Byte],
                        overwrite: Boolean = false): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(bytes) finally out.close()
  }

  /** Iceberg single-value serialization payload for `fieldId` out of
    * an Iceberg key/value-pair map (Avro array<record<key,value>>). */
  private def boundFor(df: JMap, which: String,
                       fieldId: Long): Option[Array[Byte]] =
    df.get(which) match {
      case Some(s: scala.collection.Seq[_]) =>
        s.iterator.map {
          case m: scala.collection.Map[_, _] => m.asInstanceOf[JMap]
          case _ => return None
        }.find(kv => kv.get("key").exists {
          case l: java.lang.Long => l.longValue == fieldId
          case _ => false
        }).flatMap(_.get("value") match {
          case Some(b: Array[Byte]) => Some(b)
          case _ => None
        })
      case _ => None
    }

  /** Iceberg single-value serialization for int/long bounds: 4- or
    * 8-byte little-endian. Anything else → None (kept). */
  private def boundLong(v: Option[Array[Byte]]): Option[Long] = v match {
    case Some(b) if b.length == 8 =>
      var x = 0L; var k = 7
      while (k >= 0) { x = (x << 8) | (b(k) & 0xffL); k -= 1 }
      Some(x)
    case Some(b) if b.length == 4 =>
      Some(((b(3) & 0xffL) << 24 | (b(2) & 0xffL) << 16 |
        (b(1) & 0xffL) << 8 | (b(0) & 0xffL)).toInt.toLong)
    case _ => None
  }

  /** Iceberg single-value serialization for strings: UTF-8 bytes. */
  private def boundStr(v: Option[Array[Byte]]): Option[String] =
    v.map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))

  /** 32-bit Murmur3 (x86 variant, seed 0) — the public hash the
    * Iceberg spec fixes for bucket transforms. Spec appendix test
    * vector: bucket hash of int/long 34 = 2017239379. */
  private[operators] def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0
    val nblocks = data.length >>> 2
    var i = 0
    while (i < nblocks) {
      var k1 = (data(4 * i) & 0xff) | ((data(4 * i + 1) & 0xff) << 8) |
        ((data(4 * i + 2) & 0xff) << 16) | ((data(4 * i + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks << 2
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ => ()
    }
    if ((data.length & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Iceberg bucket transform for int/long: murmur3 of the 8-byte
    * little-endian value (ints hash as longs), non-negative, mod N. */
  private[operators] def bucketOf(value: Long, n: Int): Int = {
    val b = new Array[Byte](8)
    var k = 0
    while (k < 8) { b(k) = ((value >>> (8 * k)) & 0xff).toByte; k += 1 }
    (murmur3(b) & Integer.MAX_VALUE) % n
  }

  /** Table discovery context shared by [[plan]] and
    * [[appendsBetween]]: metadata.json resolution, schema/spec/
    * snapshot state, URI rebasing, and the parallel manifest decode. */
  private final class Ctx(spark: SparkSession, val table: String) {
    private val conf = spark.sparkContext.hadoopConfiguration
    val fs: org.apache.hadoop.fs.FileSystem =
      new Path(table).getFileSystem(conf)
    private val metaDir = new Path(table, "metadata")
    require(fs.exists(metaDir), s"not an Iceberg table (no metadata/): $table")

    def readBytes(p: Path, cap: Int): Array[Byte] = {
      val st = fs.getFileStatus(p)
      require(st.getLen <= cap, s"metadata file too large: $p (${st.getLen})")
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream(st.getLen.toInt)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    }

    // ---- metadata.json discovery ----
    private val hint = new Path(metaDir, "version-hint.text")
    val metaFile: Path =
      if (fs.exists(hint)) {
        val v = new String(readBytes(hint, 1 << 16), "UTF-8").trim.toLong
        new Path(metaDir, s"v$v.metadata.json")
      } else {
        val cands = fs.listStatus(metaDir).map(_.getPath.getName)
          .flatMap { n =>
            val m = java.util.regex.Pattern
              .compile("v(\\d+)\\.metadata\\.json").matcher(n)
            if (m.matches()) Some(m.group(1).toLong -> n) else None
          }
        require(cands.nonEmpty, s"no v*.metadata.json under $metaDir")
        new Path(metaDir, cands.maxBy(_._1)._2)
      }
    val root: JMap = asMap(new AvroRead.JsonP(
      new String(readBytes(metaFile, 1 << 26), "UTF-8")).parse())

    private val fv = asLong(root.getOrElse("format-version",
      sys.error(s"no format-version in $metaFile")))
    require(fv == 1 || fv == 2, s"unsupported Iceberg format-version $fv")
    private val location = root.get("location").map(asStr).getOrElse("")

    // ---- current schema → Spark schema ----
    val schemaObj: JMap = root.get("schemas") match {
      case Some(ss) =>
        val id = asLong(root.getOrElse("current-schema-id",
          sys.error("schemas without current-schema-id")))
        asSeq(ss).map(asMap)
          .find(m => m.get("schema-id").exists(asLong(_) == id))
          .getOrElse(sys.error(s"current-schema-id $id not in schemas"))
      case None => asMap(root.getOrElse("schema",
        sys.error(s"no schema in $metaFile")))
    }

    // ---- schema-evolution safety: data files written under OLD
    // schemas are readable by NAME only while the history never moved
    // a name. Walk every schema in the metadata (ids are table-global,
    // so nested struct fields walk too) and compare id→path both ways
    // against the current schema:
    //  - same id, different path  → a RENAME happened: an old file
    //    stores the column under its old name, a name-pinned read
    //    silently nulls it;
    //  - same path, different id  → a DROP + RE-ADD happened: a
    //    name-pinned read silently RESURRECTS the dropped column's
    //    old values.
    // Either way name resolution is unsound, so the read schema pins
    // `parquet.field.id` everywhere and Spark's native field-id
    // resolution takes over (auto-enabled below; a data file without
    // ids then fails loudly — real Iceberg writers always stamp ids,
    // and so does [[commitAppend]]). Tables whose history never moved
    // a name — including add-only evolution — keep the plain
    // name-based path. ----
    private def idPathsOf(obj: JMap): Map[Long, String] = {
      val acc = scala.collection.mutable.Map.empty[Long, String]
      def walk(o: JMap, prefix: String): Unit =
        o.get("fields").map(v => asSeq(v).map(asMap)).getOrElse(Seq.empty)
          .foreach { f =>
            val name = asStr(f.getOrElse("name",
              sys.error("unnamed field")))
            val path = if (prefix.isEmpty) name else s"$prefix.$name"
            f.get("id").foreach(id => acc(asLong(id)) = path)
            def intoNested(t: Any, p: String): Unit = t match {
              case m: scala.collection.Map[_, _] =>
                val obj2 = m.asInstanceOf[JMap]
                asStr(obj2.getOrElse("type", "")) match {
                  case "struct" => walk(obj2, p)
                  case "list" => obj2.get("element")
                    .foreach(intoNested(_, s"$p.element"))
                  case "map" => obj2.get("value")
                    .foreach(intoNested(_, s"$p.value"))
                  case _ => ()
                }
              case _ => ()
            }
            f.get("type").foreach(intoNested(_, path))
          }
      walk(obj, "")
      acc.toMap
    }
    val needsIdResolution: Boolean = root.get("schemas") match {
      case None => false
      case Some(ss) =>
        val cur = idPathsOf(schemaObj)
        val curByPath = cur.map(_.swap)
        asSeq(ss).map(asMap).filterNot(_ eq schemaObj).exists { h =>
          val old = idPathsOf(h)
          old.exists { case (id, path) =>
            cur.get(id).exists(_ != path) ||
              curByPath.get(path).exists(_ != id)
          }
        }
    }
    if (needsIdResolution)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val sparkSchema: StructType = structOf(schemaObj, needsIdResolution)

    // ---- COLLIDING names: a current path whose NAME some older
    // schema bound to a DIFFERENT id (drop + re-add). Field-id
    // resolution reads such columns correctly, but Spark's parquet
    // FILTER pushdown still binds pushed predicates to file columns
    // by name — an old file's same-named column then answers the
    // row-group stats test for the wrong data (observed: IsNull over
    // a re-added column prunes old files' row groups because the
    // RETIRED column has no nulls). The cure: request colliding
    // columns under an alias no file has ever used — id resolution
    // ignores the requested name, and pushed filters simply find no
    // such column to bind to (losing pushdown for exactly the columns
    // where pushdown is unsound) — then rename back in the same
    // projection. Top-level only; a NESTED collision declines loudly.
    val collidingTop: Set[String] =
      if (!needsIdResolution) Set.empty
      else root.get("schemas") match {
        case None => Set.empty
        case Some(ss) =>
          val curByPath = idPathsOf(schemaObj).map(_.swap)
          val hit = asSeq(ss).map(asMap).filterNot(_ eq schemaObj)
            .flatMap { h =>
              idPathsOf(h).map(_.swap).collect {
                case (path, oldId)
                  if curByPath.get(path).exists(_ != oldId) => path
              }
            }.toSet
          hit.find(_.contains(".")).foreach(p => sys.error(
            s"schema evolution re-bound the NESTED name $p to a new " +
              "field id — nested drop+re-add is beyond this reader " +
              "(pushed filters cannot be kept sound)"))
          hit
      }

    /** The pinned parquet read every data-path scan goes through:
      * colliding columns are requested under `__fid_<id>` aliases
      * (sound under field-id resolution, invisible to name-bound
      * filter pushdown) and surface under their logical names in the
      * same projection. `extraCols` (e.g. `_metadata` keys) must ride
      * in that projection too — metadata columns die with it. */
    def pinnedParquet(spark2: SparkSession, paths: Seq[String],
                      extraCols: Seq[org.apache.spark.sql.Column] = Nil,
                      schema: StructType = sparkSchema): DataFrame = {
      import org.apache.spark.sql.functions.col
      val colliding = schema.fields.filter(f => collidingTop(f.name))
      if (colliding.isEmpty) {
        val df = spark2.read.schema(schema).parquet(paths: _*)
        if (extraCols.isEmpty) df
        else df.select(col("*") +: extraCols: _*)
      } else {
        val readSchema = StructType(schema.fields.toSeq.map { f =>
          if (!collidingTop(f.name)) f
          else f.copy(name =
            s"__fid_${f.metadata.getLong("parquet.field.id")}")
        })
        spark2.read.schema(readSchema).parquet(paths: _*)
          .select(schema.fields.toSeq.zip(readSchema.fields.toSeq).map {
            case (lf, rf) => col(rf.name).as(lf.name)
          } ++ extraCols: _*)
      }
    }

    // ---- default partition spec (v2 by id; v1 inline) ----
    def defaultSpecFields: scala.collection.Seq[JMap] =
      root.get("partition-specs") match {
        case Some(ss) =>
          val id = asLong(root.getOrElse("default-spec-id",
            sys.error("partition-specs without default-spec-id")))
          asSeq(asMap(asSeq(ss).map(asMap)
            .find(m => m.get("spec-id").exists(asLong(_) == id))
            .getOrElse(sys.error(s"default-spec-id $id not in specs")))
            .getOrElse("fields", sys.error("partition spec without fields")))
            .map(asMap)
        case None => root.get("partition-spec")
          .map(v => asSeq(v).map(asMap)).getOrElse(Seq.empty)
      }

    val snaps: scala.collection.Seq[JMap] =
      root.get("snapshots").map(v => asSeq(v).map(asMap))
        .getOrElse(Seq.empty)

    def snapById(id: Long): JMap = snaps.find(s =>
      s.get("snapshot-id").exists(asLong(_) == id))
      .getOrElse(sys.error(s"snapshot $id not found in $metaFile"))

    /** Rebases a manifest-recorded URI onto the directory we were
      * given: location-prefixed URIs relocate; bare relative paths
      * resolve against the table dir; other absolute URIs pass. */
    def rebase(uri: String): Path = {
      if (location.nonEmpty && uri.startsWith(location))
        new Path(table, uri.stripPrefix(location).stripPrefix("/"))
      else if (!uri.contains(":/")) new Path(table, uri)
      else new Path(uri)
    }

    /** The snapshot's manifest list (v2; v1 fallback: inline
      * "manifests"). */
    def manifestRowsOf(snap: JMap): Seq[JMap] =
      snap.get("manifest-list") match {
        case Some(mlUri) =>
          AvroRead.genericRecords(
            readBytes(rebase(asStr(mlUri)), 1 << 28)).toSeq
        case None => // pre-manifest-list v1 shape: inline manifest paths
          asSeq(snap.getOrElse("manifests",
            sys.error("snapshot has neither manifest-list nor manifests")))
            .map(p => Map[String, Any]("manifest_path" -> asStr(p)): JMap)
            .toSeq
      }

    def pathOf(m: JMap): String = asStr(m.getOrElse("manifest_path",
      sys.error("manifest-list row without manifest_path")))
    def seqOf(m: JMap): Long = m.get("sequence_number") match {
      case Some(s) if s != null => asLong(s)
      case _ => 0L
    }

    /** The default spec's identity fields as
      * (partition-field name, source StructField) — the columns that
      * resolve from partition TUPLES rather than data bytes. */
    def identityFields: Seq[(String, StructField)] = defaultSpecFields
      .filter(f => f.get("transform").map(asStr).contains("identity"))
      .map { f =>
        val pname = asStr(f.getOrElse("name",
          sys.error("partition field without name")))
        val srcId = asLong(f.getOrElse("source-id",
          sys.error("partition field without source-id")))
        val srcName = asSeq(schemaObj.getOrElse("fields",
          sys.error("schema without fields"))).map(asMap)
          .find(m => m.get("id").exists(asLong(_) == srcId))
          .map(m => asStr(m.getOrElse("name", sys.error("unnamed field"))))
          .getOrElse(sys.error(s"identity source id $srcId not in schema"))
        pname -> sparkSchema(sparkSchema.fieldIndex(srcName))
          .copy(name = srcName)
      }.toSeq

    /** One tuple-grouped read over `files` (path → partition JMap or
      * null): identity columns attach as cast literals per group; the
      * full logical column order comes out, plus `extraCols` built
      * per-scan (metadata columns must attach pre-union). */
    def identityRead(spark2: SparkSession, files: Seq[(String, JMap)],
                     extraCols: Seq[org.apache.spark.sql.Column])
        : DataFrame = {
      import org.apache.spark.sql.functions._
      val idf = identityFields
      val readSchema = StructType(sparkSchema.filterNot(f =>
        idf.exists(_._2.name == f.name)))
      def tupleOf(part: JMap, p: String): Seq[Any] =
        idf.map { case (pname, _) =>
          Option(part).flatMap(_.get(pname)).filter(_ != null)
            .getOrElse(sys.error(
              s"file $p has no value for partition field $pname"))
        }
      files.groupBy { case (p, part) => tupleOf(part, p) }.toSeq
        .sortBy(_._1.map(String.valueOf).mkString(","))
        .map { case (tuple, grpFiles) =>
          // extraCols may key off `_metadata`, which only resolves on
          // the scan itself — pinnedParquet materializes them in its
          // own projection, so downstream references go by NAME
          val grp = pinnedParquet(spark2,
            grpFiles.map(f => rebase(f._1).toString), extraCols,
            readSchema)
          val extraNames = grp.columns.drop(readSchema.length).toSeq
          idf.zip(tuple).foldLeft(grp) {
            case (df, ((_, field), v)) =>
              val litVal = v match {
                case u: org.apache.spark.unsafe.types.UTF8String =>
                  u.toString
                case other => other
              }
              df.withColumn(field.name, lit(litVal).cast(field.dataType))
          }.select((sparkSchema.fieldNames.toSeq ++ extraNames)
            .map(col): _*)
        }.reduce(_ unionByName _)
    }

    /** Decodes each manifest's Avro entries in a bounded thread pool
      * (I/O + decode parallelize; a 100 TB table's thousands of
      * manifests must not plan serially), returning them IN MANIFEST
      * ORDER so status replay stays deterministic. Decline exceptions
      * unwrap so the loud-decline contract survives the executor
      * boundary. */
    def decodeManifests(rows: Seq[JMap]): Seq[(JMap, Seq[JMap])] =
      if (rows.isEmpty) Nil
      else if (rows.lengthCompare(2) < 0)
        rows.map(r => r -> AvroRead.genericRecords(
          readBytes(rebase(pathOf(r)), 1 << 28)).toSeq.map(asMap))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(rows.length, 8))
        try {
          val futs = rows.map { r =>
            pool.submit(new java.util.concurrent.Callable[Seq[JMap]] {
              override def call(): Seq[JMap] =
                AvroRead.genericRecords(
                  readBytes(rebase(pathOf(r)), 1 << 28)).toSeq.map(asMap)
            })
          }
          rows.zip(futs.map { f =>
            try f.get()
            catch {
              case e: java.util.concurrent.ExecutionException =>
                throw e.getCause
            }
          })
        } finally pool.shutdownNow()
      }
  }

  private def plan(spark: SparkSession, table: String,
                   snapshotId: Long, prune: Prune,
                   asOfMillis: Long = -1L): Scan = {
    val ctx = new Ctx(spark, table)
    import ctx.{decodeManifests, defaultSpecFields, manifestRowsOf,
      metaFile, pathOf, rebase, schemaObj, seqOf, snaps, sparkSchema}

    val wantId =
      if (snapshotId >= 0) snapshotId
      else if (asOfMillis >= 0) {
        val elig = snaps.filter(s =>
          s.get("timestamp-ms").exists(asLong(_) <= asOfMillis))
        require(elig.nonEmpty,
          s"no Iceberg snapshot at or before timestamp $asOfMillis in $table")
        asLong(elig.maxBy(s => asLong(s.getOrElse("timestamp-ms",
          sys.error("snapshot without timestamp-ms"))))
          .getOrElse("snapshot-id", sys.error("snapshot without id")))
      }
      else asLong(ctx.root.getOrElse("current-snapshot-id",
        sys.error(s"table has no current snapshot: $metaFile")))
    val snap = ctx.snapById(wantId)

    // v2 manifest routing: content 0 = data manifests, 1 = DELETE
    // manifests (position AND equality deletes applied below). Each
    // manifest-list row carries the manifest's sequence number; an
    // entry may override it — position deletes apply to data files
    // with sequence ≤ theirs, equality deletes to strictly smaller.
    val manifestRows = manifestRowsOf(snap)
    val (deleteManifestRows, dataManifestRows) = manifestRows.partition(
      _.get("content").exists(asLong(_) == 1L))
    val manifestPaths = dataManifestRows.map(pathOf)
    val deleteManifestPaths = deleteManifestRows.map(pathOf)

    // ---- manifests → live data files (entry + sequence kept) ----
    val liveFiles =
      scala.collection.mutable.LinkedHashMap.empty[String, (JMap, Long)]
    decodeManifests(dataManifestRows).foreach { case (mrow, entries) =>
      val mp = pathOf(mrow)
      entries.foreach { e =>
        val status = asLong(e.getOrElse("status",
          sys.error(s"manifest $mp entry without status")))
        require(status >= 0 && status <= 2,
          s"manifest $mp: invalid entry status $status")
        val df = asMap(e.getOrElse("data_file",
          sys.error(s"manifest $mp entry without data_file")))
        val path = df.getOrElse("file_path",
          sys.error(s"manifest $mp data_file without file_path")).toString
        if (status == 2) liveFiles.remove(path)
        else {
          val fmt = df.get("file_format").map(_.toString.toUpperCase)
            .getOrElse("PARQUET")
          require(fmt == "PARQUET",
            s"unsupported Iceberg data file format $fmt in $mp")
          val seq = e.get("sequence_number") match {
            case Some(s) if s != null => asLong(s)
            case _ => seqOf(mrow) // inherited from the manifest
          }
          liveFiles(path) = (df, seq)
        }
      }
    }
    require(liveFiles.nonEmpty, s"empty Iceberg snapshot $wantId of $table")

    // ---- delete manifests → position + equality delete files ----
    // content 1 = position deletes (parquet of file_path + pos, applied
    // via _metadata.row_index below); content 2 = EQUALITY deletes
    // (parquet of the equality_ids columns, applied to data files with
    // a strictly smaller sequence number, null-safe matching)
    val posDeletes = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long)] // (path, seq)
    val eqDeletes = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[Long], Long)] // (path, equality field ids, seq)
    decodeManifests(deleteManifestRows).foreach { case (mrow, entries) =>
      val mp = pathOf(mrow)
      entries.foreach { e =>
        val status = asLong(e.getOrElse("status",
          sys.error(s"delete manifest $mp entry without status")))
        require(status >= 0 && status <= 2,
          s"delete manifest $mp: invalid entry status $status")
        if (status != 2) {
          val df = asMap(e.getOrElse("data_file",
            sys.error(s"delete manifest $mp entry without data_file")))
          val fmt = df.get("file_format").map(_.toString.toUpperCase)
            .getOrElse("PARQUET")
          require(fmt == "PARQUET",
            s"unsupported Iceberg delete file format $fmt in $mp")
          val path = df.getOrElse("file_path",
            sys.error(s"delete manifest $mp without file_path")).toString
          val seq = e.get("sequence_number") match {
            case Some(s) if s != null => asLong(s)
            case _ => seqOf(mrow)
          }
          df.get("content").map(asLong).getOrElse(0L) match {
            case 1L => posDeletes += ((path, seq))
            case 2L =>
              val ids = df.get("equality_ids") match {
                case Some(s: scala.collection.Seq[_]) if s.nonEmpty =>
                  s.map(asLong).toSeq
                case _ => sys.error(
                  s"equality delete without equality_ids in $mp")
              }
              eqDeletes += ((path, ids, seq))
            case other => sys.error(
              s"unsupported Iceberg delete content=$other in $mp")
          }
        }
      }
    }

    // ---- file skipping: stats bounds or partition transforms ----
    def schemaField(colName: String): JMap =
      asSeq(schemaObj.getOrElse("fields",
        sys.error("schema without fields"))).map(asMap)
        .find(f => f.get("name").map(asStr).contains(colName))
        .getOrElse(sys.error(s"prune column $colName not in schema"))
    val kept: Seq[String] = prune match {
      case NoPrune => liveFiles.keys.toSeq
      case LongBounds(colName, lo, hi) =>
        val field = schemaField(colName)
        val t = field.getOrElse("type", sys.error("untyped field"))
        // date bounds serialize as 4-byte LE epoch days — the same
        // int face; [lo, hi] is then a day range
        require(t == "long" || t == "int" || t == "date",
          s"long-bounds pruning supports int/long/date columns, not $t")
        val fieldId = asLong(field.getOrElse("id",
          sys.error(s"schema field $colName has no id")))
        liveFiles.collect { case (p, (df, _))
          if !(boundLong(boundFor(df, "lower_bounds", fieldId))
                 .exists(_ > hi) ||
               boundLong(boundFor(df, "upper_bounds", fieldId))
                 .exists(_ < lo)) =>
          p
        }.toSeq
      case StringBounds(colName, lo, hi) =>
        val field = schemaField(colName)
        val t = field.getOrElse("type", sys.error("untyped field"))
        require(t == "string",
          s"string-bounds pruning supports string columns, not $t")
        val fieldId = asLong(field.getOrElse("id",
          sys.error(s"schema field $colName has no id")))
        liveFiles.collect { case (p, (df, _))
          if !(boundStr(boundFor(df, "lower_bounds", fieldId))
                 .exists(_ > hi) ||
               boundStr(boundFor(df, "upper_bounds", fieldId))
                 .exists(_ < lo)) =>
          p
        }.toSeq
      case PartitionPoint(colName, value) =>
        val field = schemaField(colName)
        val t = field.getOrElse("type", sys.error("untyped field"))
        // dates join the int face: epoch days hash/truncate like ints
        require(t == "long" || t == "int" || t == "date",
          s"partition pruning supports int/long/date source columns, not $t")
        val fieldId = asLong(field.getOrElse("id",
          sys.error(s"schema field $colName has no id")))
        val specField = defaultSpecFields
          .find(f => f.get("source-id").exists(asLong(_) == fieldId))
          .getOrElse(sys.error(
            s"column $colName is not a partition source in the default spec"))
        val pname = asStr(specField.getOrElse("name",
          sys.error("partition field without name")))
        val transform = asStr(specField.getOrElse("transform",
          sys.error("partition field without transform")))
        val bucketRe = "bucket\\[(\\d+)\\]".r
        val truncRe = "truncate\\[(\\d+)\\]".r
        val wantPart: Long = transform match {
          case "identity" => value
          case "day" if t == "date" =>
            value // a date's day-of-epoch IS its ordinal
          case bucketRe(n) => bucketOf(value, n.toInt).toLong
          case truncRe(w) => // spec: v - (((v % W) + W) % W), W > 0
            val width = w.toLong
            require(width > 0, s"bad truncate width $w")
            value - (((value % width) + width) % width)
          case other => sys.error(
            s"unsupported partition transform for pruning: $other")
        }
        liveFiles.collect { case (p, (df, _))
          if (df.get("partition").map(asMap)
            .flatMap(_.get(pname)).filter(_ != null) match {
              case Some(v) => asLong(v) == wantPart
              case None => true // spec-evolved / absent tuple: keep
            }) =>
          p
        }.toSeq
    }
    require(kept.nonEmpty,
      s"Iceberg snapshot $wantId of $table: no files survive pruning")

    import org.apache.spark.sql.functions._
    def fname(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val hasDeletes = posDeletes.nonEmpty || eqDeletes.nonEmpty
    if (hasDeletes) {
      // deletes resolve per-file (position ordinals / sequence
      // numbers); recorded and runtime URIs differ in qualification,
      // so the join key is the file NAME — sound only when live names
      // are globally distinct (true of every Iceberg writer's UUID
      // naming; raise otherwise)
      val names = kept.map(fname)
      require(names.distinct.length == names.length,
        s"duplicate data file names in snapshot $wantId — cannot " +
          "apply deletes unambiguously")
    }
    // IDENTITY-partitioned tables: per the spec, identity source
    // columns resolve from each file's partition TUPLE (data files may
    // omit them entirely — real writers' hive-style layouts do), so
    // those columns attach as per-tuple-group literals, Delta-style
    // ([[Ctx.identityRead]]). Overriding is always sound: identity
    // means tuple value == column value on every row of the file.
    // Files without a tuple for an identity field decline loudly.
    val hasIdentity = ctx.identityFields.nonEmpty
    val paths = kept.map(p => rebase(p).toString)
    // `_metadata` resolves only on the scan itself, so the delete join
    // keys must attach INSIDE each group read, pre-union
    val metaCols =
      if (!hasDeletes) Nil
      else Seq(
        element_at(split(col("_metadata.file_path"), "/"), -1).as("__f"),
        col("_metadata.row_index").as("__p"))
    val base0 =
      if (!hasIdentity) ctx.pinnedParquet(spark, paths, metaCols)
      else ctx.identityRead(spark,
        kept.map(p => p -> liveFiles(p)._1.get("partition").map(asMap)
          .getOrElse(sys.error(
            s"identity-partitioned table: file $p has no partition " +
              "tuple"))),
        metaCols)
    val base =
      if (!hasDeletes) base0
      else {
        // per-data-file sequence numbers ride in on the file name —
        // both delete kinds filter on them; the __f/__p keys attached
        // inside the scans' own projections above
        val sq = spark
        import sq.implicits._
        val seqDf = broadcast(kept.map(p =>
          (fname(p), liveFiles(p)._2)).toDF("__f", "__seq"))
        base0.join(seqDf, Seq("__f"), "left")
      }

    val afterPos =
      if (posDeletes.isEmpty) base
      else {
        // ONE distributed read of every position-delete parquet; each
        // delete row inherits its file's sequence number via a
        // broadcast (delete file name → seq) map, and applies only to
        // data rows from files with sequence ≤ the delete file's
        val delNames = posDeletes.map { case (p, _) => fname(p) }
        require(delNames.distinct.length == delNames.length,
          s"duplicate position-delete file names in snapshot $wantId")
        val sq = spark
        import sq.implicits._
        val delSeq = broadcast(posDeletes.toSeq
          .map { case (p, s) => (fname(p), s) }.toDF("__dfile", "__dseq"))
        val dels = spark.read
          .schema(StructType(Seq(
            StructField("file_path", StringType),
            StructField("pos", LongType, nullable = false))))
          .parquet(posDeletes.map { case (p, _) => rebase(p).toString }
            .toSeq: _*)
          .select(
            element_at(split(col("file_path"), "/"), -1).as("__df"),
            col("pos").as("__dp"),
            element_at(split(col("_metadata.file_path"), "/"), -1)
              .as("__dfile"))
          .join(delSeq, Seq("__dfile"))
        base.join(dels,
          base("__f") === dels("__df") && base("__p") === dels("__dp") &&
            base("__seq") <= dels("__dseq"),
          "left_anti")
      }

    val afterEq =
      if (eqDeletes.isEmpty) afterPos
      else {
        // equality ids → column names via the schema's field ids
        val idToName = asSeq(schemaObj.getOrElse("fields",
          sys.error("schema without fields"))).map(asMap)
          .map(f => asLong(f.getOrElse("id",
            sys.error("schema field without id"))) ->
            asStr(f.getOrElse("name", sys.error("unnamed field")))).toMap
        // one anti-join per equality-column set: delete rows match
        // null-safely on their columns AND only data rows from files
        // with a strictly smaller sequence number
        eqDeletes.groupBy(_._2).foldLeft(afterPos) {
          case (df, (ids, group)) =>
            val eqCols = ids.map(id => idToName.getOrElse(id,
              sys.error(s"equality_ids field $id not in schema")))
            val delSchema = StructType(eqCols.map(c =>
              sparkSchema(sparkSchema.fieldIndex(c))
                .copy(nullable = true)))
            val delRows = group.map { case (p, _, seq) =>
              // delete files may be written under OLD schema versions
              // — the pinned read resolves their columns by field id
              // on evolved tables, like the data files'
              ctx.pinnedParquet(spark, Seq(rebase(p).toString),
                Nil, delSchema)
                .withColumn("__dseq", lit(seq))
            }.reduce(_ unionByName _)
            val cond = eqCols.map(c => df(c) <=> delRows(c))
              .reduce(_ && _) && df("__seq") < delRows("__dseq")
            df.join(delRows, cond, "left_anti")
        }
      }
    val data =
      if (!hasDeletes) afterEq
      else afterEq.drop("__f", "__p", "__seq")
    Scan(manifestPaths.length + deleteManifestPaths.length,
      liveFiles.size, kept.length,
      posDeletes.length + eqDeletes.length, data)
  }
}
