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
  *    ([[graft.functions.AvroRead.genericRecords]]), each manifest
  *    likewise; a file is LIVE iff its newest entry status ≠ DELETED;
  *  - absolute `file:`/`s3:` URIs in manifests are rebased from the
  *    table's recorded `location` onto the directory actually given —
  *    the relocation every snapshot-copied table needs;
  *  - the read schema comes from the METADATA (current-schema-id
  *    resolution, Iceberg→Spark type mapping), not from file
  *    inference — partition columns need no reconstruction because
  *    Iceberg data files store them as ordinary columns;
  *  - stats file-skipping ([[prunedScan]]): manifest entries carry
  *    per-file `lower_bounds`/`upper_bounds` (Iceberg single-value
  *    serialization, int/long little-endian) — files whose bounds
  *    cannot intersect the predicate are skipped BEFORE any data I/O,
  *    missing bounds conservatively kept;
  *  - v2 row-level deletes applied, BOTH kinds: POSITION deletes
  *    (parquet of file_path + pos, anti-joined against
  *    `_metadata.row_index`) and EQUALITY deletes (parquet of the
  *    `equality_ids` columns, matched null-safely and applied only to
  *    data files with a strictly SMALLER sequence number — entry
  *    sequence numbers inherit from the manifest-list row);
  *  - loud declines: non-parquet files, nested table schemas,
  *    ambiguous duplicate file names, unknown delete content kinds,
  *    and malformed metadata all RAISE rather than misread.
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

  /** Iceberg primitive → Spark type; nested types decline loudly. */
  private def sparkType(t: Any): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "date" => DateType
    case "timestamp" | "timestamptz" => TimestampType
    case "string" => StringType
    case "uuid" => StringType
    case "binary" => BinaryType
    case s: String if s.startsWith("decimal(") && s.endsWith(")") =>
      val ps = s.stripPrefix("decimal(").stripSuffix(")").split(",")
      DecimalType(ps(0).trim.toInt, ps(1).trim.toInt)
    case other => sys.error(
      s"unsupported Iceberg column type for this reader: $other")
  }

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
    plan(spark, table, snapshotId, pruneCol = null, 0L, 0L)

  /** File-skipping scan: data files whose manifest-entry
    * `lower_bounds`/`upper_bounds` for `colName` (an int/long column)
    * cannot intersect [lo, hi] are SKIPPED before any data I/O — the
    * Iceberg analog of [[DeltaLite.prunedSnapshot]]: manifests ARE the
    * stats store, so a 100 TB table's point query touches manifests,
    * not the table. Files without bounds are conservatively kept; the
    * caller re-filters exactly. */
  def prunedScan(spark: SparkSession, table: String, colName: String,
                 lo: Long, hi: Long, snapshotId: Long = -1L): Scan =
    plan(spark, table, snapshotId, colName, lo, hi)

  /** Iceberg single-value serialization for int/long bounds: 4- or
    * 8-byte little-endian. Anything else → None (kept). */
  private def boundLong(v: Any): Option[Long] = v match {
    case b: Array[Byte] if b.length == 8 =>
      var x = 0L; var k = 7
      while (k >= 0) { x = (x << 8) | (b(k) & 0xffL); k -= 1 }
      Some(x)
    case b: Array[Byte] if b.length == 4 =>
      Some(((b(3) & 0xffL) << 24 | (b(2) & 0xffL) << 16 |
        (b(1) & 0xffL) << 8 | (b(0) & 0xffL)).toInt.toLong)
    case _ => None
  }

  /** The bound entry for `fieldId` out of an Iceberg key/value-pair
    * map (Avro array<record<key,value>> encoding). */
  private def boundFor(df: JMap, which: String, fieldId: Long): Option[Long] =
    df.get(which) match {
      case Some(s: scala.collection.Seq[_]) =>
        s.iterator.map {
          case m: scala.collection.Map[_, _] => m.asInstanceOf[JMap]
          case _ => return None
        }.find(kv => kv.get("key").exists {
          case l: java.lang.Long => l.longValue == fieldId
          case _ => false
        }).flatMap(kv => kv.get("value").flatMap(boundLong))
      case _ => None
    }

  private def plan(spark: SparkSession, table: String,
                   snapshotId: Long, pruneCol: String,
                   lo: Long, hi: Long): Scan = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(table).getFileSystem(conf)
    val metaDir = new Path(table, "metadata")
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
    val hint = new Path(metaDir, "version-hint.text")
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
    val root = asMap(new AvroRead.JsonP(
      new String(readBytes(metaFile, 1 << 26), "UTF-8")).parse())

    val fv = asLong(root.getOrElse("format-version",
      sys.error(s"no format-version in $metaFile")))
    require(fv == 1 || fv == 2, s"unsupported Iceberg format-version $fv")
    val location = root.get("location").map(asStr).getOrElse("")

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
    val sparkSchema = StructType(
      asSeq(schemaObj.getOrElse("fields", sys.error("schema without fields")))
        .map(asMap).map { f =>
          StructField(asStr(f.getOrElse("name", sys.error("unnamed field"))),
            sparkType(f.getOrElse("type", sys.error("untyped field"))),
            nullable = !f.get("required").contains(true))
        }.toSeq)

    // ---- snapshot resolution ----
    val snaps = root.get("snapshots").map(v => asSeq(v).map(asMap))
      .getOrElse(Seq.empty)
    val wantId =
      if (snapshotId >= 0) snapshotId
      else asLong(root.getOrElse("current-snapshot-id",
        sys.error(s"table has no current snapshot: $metaFile")))
    val snap = snaps.find(s =>
      s.get("snapshot-id").exists(asLong(_) == wantId))
      .getOrElse(sys.error(s"snapshot $wantId not found in $metaFile"))

    /** Rebases a manifest-recorded URI onto the directory we were
      * given: location-prefixed URIs relocate; bare relative paths
      * resolve against the table dir; other absolute URIs pass. */
    def rebase(uri: String): Path = {
      if (location.nonEmpty && uri.startsWith(location))
        new Path(table, uri.stripPrefix(location).stripPrefix("/"))
      else if (!uri.contains(":/")) new Path(table, uri)
      else new Path(uri)
    }

    // ---- manifest list (v2; v1 fallback: inline "manifests") ----
    val manifestRows: Seq[JMap] = snap.get("manifest-list") match {
      case Some(mlUri) =>
        AvroRead.genericRecords(
          readBytes(rebase(asStr(mlUri)), 1 << 28)).toSeq
      case None => // pre-manifest-list v1 shape: inline manifest paths
        asSeq(snap.getOrElse("manifests",
          sys.error(s"snapshot $wantId has neither manifest-list nor manifests")))
          .map(p => Map[String, Any]("manifest_path" -> asStr(p)): JMap)
          .toSeq
    }

    // v2 manifest routing: content 0 = data manifests, 1 = DELETE
    // manifests (position AND equality deletes applied below). Each
    // manifest-list row carries the manifest's sequence number; an
    // entry may override it — deletes apply only to data files with a
    // strictly SMALLER sequence number.
    def pathOf(m: JMap): String = asStr(m.getOrElse("manifest_path",
      sys.error("manifest-list row without manifest_path")))
    def seqOf(m: JMap): Long = m.get("sequence_number") match {
      case Some(s) if s != null => asLong(s)
      case _ => 0L
    }
    val (deleteManifestRows, dataManifestRows) = manifestRows.partition(
      _.get("content").exists(asLong(_) == 1L))
    val manifestPaths = dataManifestRows.map(pathOf)
    val deleteManifestPaths = deleteManifestRows.map(pathOf)

    // ---- manifests → live data files (entry + sequence kept) ----
    val liveFiles =
      scala.collection.mutable.LinkedHashMap.empty[String, (JMap, Long)]
    dataManifestRows.foreach { mrow =>
      val mp = pathOf(mrow)
      AvroRead.genericRecords(readBytes(rebase(mp), 1 << 28)).foreach { e =>
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
    val posDeleteFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    val eqDeletes = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[Long], Long)] // (path, equality field ids, seq)
    deleteManifestRows.foreach { mrow =>
      val mp = pathOf(mrow)
      AvroRead.genericRecords(readBytes(rebase(mp), 1 << 28)).foreach { e =>
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
          df.get("content").map(asLong).getOrElse(0L) match {
            case 1L => posDeleteFiles += path
            case 2L =>
              val ids = df.get("equality_ids") match {
                case Some(s: scala.collection.Seq[_]) if s.nonEmpty =>
                  s.map(asLong).toSeq
                case _ => sys.error(
                  s"equality delete without equality_ids in $mp")
              }
              val seq = e.get("sequence_number") match {
                case Some(s) if s != null => asLong(s)
                case _ => seqOf(mrow)
              }
              eqDeletes += ((path, ids, seq))
            case other => sys.error(
              s"unsupported Iceberg delete content=$other in $mp")
          }
        }
      }
    }

    // ---- stats file-skipping via manifest-entry bounds ----
    val kept =
      if (pruneCol == null) liveFiles.keys.toSeq
      else {
        val field = asSeq(schemaObj.getOrElse("fields",
          sys.error("schema without fields"))).map(asMap)
          .find(f => f.get("name").map(asStr).contains(pruneCol))
          .getOrElse(sys.error(s"prune column $pruneCol not in schema"))
        val t = field.getOrElse("type", sys.error("untyped field"))
        require(t == "long" || t == "int",
          s"bounds pruning supports int/long columns, not $t")
        val fieldId = asLong(field.getOrElse("id",
          sys.error(s"schema field $pruneCol has no id")))
        liveFiles.collect { case (p, (df, _))
          if !(boundFor(df, "lower_bounds", fieldId).exists(_ > hi) ||
               boundFor(df, "upper_bounds", fieldId).exists(_ < lo)) =>
          p
        }.toSeq
      }
    require(kept.nonEmpty,
      s"Iceberg snapshot $wantId of $table: no files survive pruning")

    import org.apache.spark.sql.functions._
    def fname(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val hasDeletes = posDeleteFiles.nonEmpty || eqDeletes.nonEmpty
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
    val paths = kept.map(p => rebase(p).toString)
    val base0 = spark.read.schema(sparkSchema).parquet(paths: _*)
    val base =
      if (!hasDeletes) base0
      else base0.select(col("*"),
        element_at(split(col("_metadata.file_path"), "/"), -1).as("__f"),
        col("_metadata.row_index").as("__p"))

    val afterPos =
      if (posDeleteFiles.isEmpty) base
      else {
        val dels = spark.read
          .schema(StructType(Seq(
            StructField("file_path", StringType),
            StructField("pos", LongType, nullable = false))))
          .parquet(posDeleteFiles.map(p => rebase(p).toString).toSeq: _*)
          .select(
            element_at(split(col("file_path"), "/"), -1).as("__f"),
            col("pos").as("__p"))
        base.join(dels, Seq("__f", "__p"), "left_anti")
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
        // per-data-file sequence numbers ride in on the file name
        val sq = spark
        import sq.implicits._
        val seqDf = broadcast(kept.map(p =>
          (fname(p), liveFiles(p)._2)).toDF("__f", "__seq"))
        val withSeq = afterPos.join(seqDf, Seq("__f"), "left")
        // one anti-join per equality-column set: delete rows match
        // null-safely on their columns AND only data rows from files
        // with a strictly smaller sequence number
        eqDeletes.groupBy(_._2).foldLeft(withSeq) {
          case (df, (ids, group)) =>
            val eqCols = ids.map(id => idToName.getOrElse(id,
              sys.error(s"equality_ids field $id not in schema")))
            val delSchema = StructType(eqCols.map(c =>
              sparkSchema(sparkSchema.fieldIndex(c))
                .copy(nullable = true)))
            val delRows = group.map { case (p, _, seq) =>
              spark.read.schema(delSchema)
                .parquet(rebase(p).toString)
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
      posDeleteFiles.length + eqDeletes.length, data)
  }
}
