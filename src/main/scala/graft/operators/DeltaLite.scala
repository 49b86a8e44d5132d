package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}

/** Delta-protocol TABLE reader (log replay, no delta library) — the
  * table-format tier on top of the file-format tier: a Delta table is
  * parquet data files plus a `_delta_log/` of versioned JSON commits
  * (and parquet checkpoints), and a snapshot is the replay of those
  * actions. Implemented Spark-first from the PUBLIC Delta protocol
  * spec:
  *
  *  - version discovery from `%020d.json` names; checkpoints found by
  *    LISTING (classic single-file, multi-part, and v2 UUID-named with
  *    sidecar replay) — checkpoint parquet is read DISTRIBUTED via
  *    Spark's reader and only commits after it replay as JSON;
  *  - action schema (add / remove / metaData / protocol) read with
  *    `spark.read.schema(...).json` — the log parse itself is a
  *    DataFrame job, not a driver loop;
  *  - tombstone semantics: a path is live iff its latest add is newer
  *    than its latest remove (re-adds supported); `versionAsOf` time
  *    travel replays a prefix;
  *  - schema from the latest `metaData.schemaString` (Spark StructType
  *    JSON — the protocol's own format), partition columns
  *    reconstructed from `add.partitionValues` and CAST per schema;
  *  - DELETION VECTORS applied: add.deletionVector descriptors
  *    (storage `p`/`u`/`i`, RFC 1924 base85 ids, the DV-file
  *    length/CRC framing, portable RoaringBitmapArray — decoded by
  *    [[graft.functions.DeletionVectors]], cross-verified against the
  *    real org.roaringbitmap) anti-join deleted row ordinals against
  *    parquet's `_metadata.row_index`;
  *  - COLUMN MAPPING (name and id modes), applied RECURSIVELY through
  *    nested struct/array/map types: parquet reads by each field's
  *    recorded `delta.columnMapping.physicalName` at every nesting
  *    level (id mode additionally pins `parquet.field.id` metadata per
  *    nested field), renamed back to the logical schema — nested
  *    renames via positional struct casts; partitionValues keys are
  *    physical names too;
  *  - protocol gate: the LATEST protocol action governs; the base
  *    protocol, minReaderVersion 2 (legacy column mapping), or 3 with
  *    readerFeatures within {v2Checkpoint, deletionVectors,
  *    columnMapping} is read — unknown features raise rather than
  *    misreading.
  *
  * The one driver-side materialization is the LIVE FILE LIST — the
  * metadata every engine (including Delta itself) plans from; it is
  * bounded by table file count, never by row count. Files grouped by
  * partition tuple read as one `spark.read.parquet(...)` each, so
  * data-side scale is Spark's own scan path (pushdown, pruning, AQE
  * all apply downstream).
  *
  * Reference scope: beyond-reference §2.10.
  */
object DeltaLite {

  private val LogDir = "_delta_log"

  /** Latest version present in the log, or -1 if none. Checkpoint
    * files count: after [[cleanLog]] deletes the JSON commits a
    * checkpoint covers, the checkpoint IS the latest state and the
    * next append must number from it, not restart at 0. */
  def latestVersion(spark: SparkSession, table: String): Long = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(table, LogDir)
    if (!fs.exists(dir)) return -1L
    val vRe = "(\\d{20})\\.(?:json|checkpoint\\..*parquet)".r
    fs.listStatus(dir).map(_.getPath.getName)
      .flatMap(n => vRe.findPrefixMatchOf(n)
        .filter(_.matched == n).map(_.group(1).toLong))
      .foldLeft(-1L)(math.max)
  }

  private def actionSchema: StructType = StructType.fromDDL(
    "add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, " +
      "size: BIGINT, dataChange: BOOLEAN, stats: STRING, " +
      "deletionVector STRUCT<storageType: STRING, pathOrInlineDv: STRING, " +
      "offset: INT, sizeInBytes: INT, cardinality: BIGINT>>, " +
      "remove STRUCT<path: STRING, deletionTimestamp: BIGINT, " +
      "dataChange: BOOLEAN>, " +
      "metaData STRUCT<id: STRING, schemaString: STRING, " +
      "partitionColumns: ARRAY<STRING>, " +
      "configuration: MAP<STRING, STRING>>, " +
      "protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT, " +
      "readerFeatures: ARRAY<STRING>>, " +
      "sidecar STRUCT<path: STRING, sizeInBytes: BIGINT>, " +
      "cdc STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, " +
      "size: BIGINT, dataChange: BOOLEAN>")

  /** Reader features this implementation actually honors: v2Checkpoint
    * (sidecar replay), deletionVectors (row-level delete bitmaps
    * applied via `_metadata.row_index`), and columnMapping in NAME
    * mode (physical→logical renames below; id mode raises at the mode
    * check); anything else (timestampNtz…) raises. */
  private val SupportedReaderFeatures =
    Set("v2Checkpoint", "deletionVectors", "columnMapping")

  /** File-skipping outcome of [[prunedSnapshot]]; `liveFilePaths` are
    * the kept files' log-recorded relative paths (what
    * [[commitCompact]] tombstones). */
  final case class Pruned(nFiles: Int, keptFiles: Int, data: DataFrame,
                          liveFilePaths: Seq[String] = Nil)

  /** The table as a DataFrame at `versionAsOf` (default: latest). */
  def snapshot(spark: SparkSession, table: String,
               versionAsOf: Long = Long.MaxValue): DataFrame =
    build(spark, table, versionAsOf, keep = null).data

  /** Version in effect at `tsMillis`, resolved per the protocol's
    * time-travel rule from COMMIT FILE timestamps (modification time):
    * the latest version whose commit is at or before the timestamp.
    * Raises when the table has no commit that old. */
  def versionAtTimestamp(spark: SparkSession, table: String,
                         tsMillis: Long): Long = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(table, LogDir)
    require(fs.exists(dir), s"not a Delta table (no $LogDir): $table")
    val cands = fs.listStatus(dir)
      .filter(_.getPath.getName.matches("\\d{20}\\.json"))
      .filter(_.getModificationTime <= tsMillis)
      .map(_.getPath.getName.stripSuffix(".json").toLong)
    require(cands.nonEmpty,
      s"no Delta commit at or before timestamp $tsMillis in $table")
    cands.max
  }

  /** `timestampAsOf` time travel: the snapshot at
    * [[versionAtTimestamp]]'s version. */
  def snapshotAsOfTimestamp(spark: SparkSession, table: String,
                            tsMillis: Long): DataFrame =
    snapshot(spark, table, versionAtTimestamp(spark, table, tsMillis))

  /** APPEND WRITER — the direction a training-data pipeline actually
    * uses (append batches, compact later): writes `df` as parquet
    * DISTRIBUTED (optionally Hive-layout partitioned), then one
    * `%020d.json` commit whose per-file add actions carry
    * `numRecords` + min/max stats for long and string leaf columns —
    * the same stats [[prunedSnapshot]]/[[prunedSnapshotString]] skip
    * files by, so written tables point-query through metadata like
    * read ones. Version 0 creates protocol (1, 2) + metaData; later
    * appends REQUIRE the schema to match the table's recorded
    * schemaString (loud decline — this writer never evolves a schema
    * silently). The commit file is written atomically (temp + rename)
    * at the next version; a version collision raises. Returns the
    * committed version.
    *
    * Driver-side work is the file PLANNING set (listing + rename +
    * stats rows, one per file); data bytes never pass the driver. */
  def commitAppend(spark: SparkSession, table: String,
                   df: DataFrame,
                   partitionBy: Seq[String] = Nil): Long = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    val version = latestVersion(spark, table) + 1
    val schema = df.schema
    partitionBy.foreach(pc => require(schema.fieldNames.contains(pc),
      s"partition column $pc not in the DataFrame"))
    if (version > 0) {
      // ONE replay job validates the log (anchored/gap-free checks run
      // inside replayActions, the protocol gate inside replayState) and
      // supplies the governing metaData for the schema check — this
      // formerly cost three replay jobs (build's two collects plus a
      // separate latestMeta replay)
      val rs = replayState(spark, fs, logDir, table, Long.MaxValue)
      require(rs.liveAdds.nonEmpty, s"empty snapshot of $table")
      val tableSchema = DataType.fromJson(rs.schemaString)
        .asInstanceOf[StructType]
      require(tableSchema == schema,
        s"append schema ${schema.simpleString} does not match the " +
          s"table schema ${tableSchema.simpleString}")
      val tablePartCols = rs.partCols
      require(tablePartCols == partitionBy,
        s"append partitioning $partitionBy does not match the table's " +
          s"$tablePartCols")
    }

    val adds = stageAdds(spark, fs, table, df, partitionBy, version,
      dataChange = true)
    val head =
      if (version > 0) Seq.empty
      else {
        val schemaJson = jstr(schema.json)
        Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          s"""{"metaData":{"id":"graft-${table.hashCode.abs}",""" +
            s""""schemaString":"$schemaJson","partitionColumns":[${
              partitionBy.map(c => s""""$c"""").mkString(",")}],""" +
            """"configuration":{}}}""")
      }
    writeCommit(fs, logDir, version, head ++ adds, table)
    version
  }

  /** COMPACTION commit (OPTIMIZE-style): rewrites the current live
    * files into `targetFiles` coalesced data files per layout, then
    * commits removes of every old file + adds of the new ones — ALL
    * with `dataChange=false`, so [[changes]] surfaces NOTHING for a
    * compaction: incremental consumers never re-see rewritten rows.
    * Snapshot content is identical before and after (deletion vectors
    * on old files MATERIALIZE — the rewrite reads the DV-applied
    * snapshot). Declines loudly on column-mapped tables. Returns the
    * committed version. */
  def commitCompact(spark: SparkSession, table: String,
                    targetFiles: Int = 1): Long = {
    require(targetFiles > 0, s"bad targetFiles $targetFiles")
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    val version = latestVersion(spark, table) + 1
    require(version > 0, s"not a Delta table (no commits): $table")
    // one replay job serves the meta checks AND the rewrite's data read
    val rs = replayState(spark, fs, logDir, table, Long.MaxValue)
    val partCols = rs.partCols
    val cmap = rs.configuration
      .getOrElse("delta.columnMapping.mode", "none")
    require(cmap == "none",
      "compaction on column-mapped tables is beyond this writer")
    val cur = buildFrom(spark, fs, table, rs, keep = null)
    val adds = stageAdds(spark, fs, table,
      cur.data.coalesce(targetFiles), partCols, version,
      dataChange = false)
    // tombstones must match the adds' recorded paths BYTE-FOR-BYTE
    // (the replay groups by the raw path string), so the log-recorded
    // rels pass through untouched
    val removes = cur.liveFilePaths.map(rel =>
      s"""{"remove":{"path":"${jstr(rel)}","deletionTimestamp":""" +
        s"""$version,"dataChange":false}}""")
    writeCommit(fs, logDir, version, removes ++ adds, table)
    version
  }

  /** Row-level DELETE, COPY-ON-WRITE — the decontamination / GDPR
    * operation ([[IcebergLite.commitDelete]] sibling): ONE
    * distributed scan finds the files holding matching rows, ONLY
    * those files rewrite (surviving rows re-stage with fresh stats;
    * untouched files keep their adds), and one commit atomically
    * tombstones the affected originals. The commit also writes
    * explicit `cdc` actions — `_change_data/` parquet of exactly the
    * DELETED rows — so [[changes]] surfaces a precise `delete` feed
    * for this commit instead of synthesizing a remove-everything /
    * re-insert-survivors storm from the rewrite. NULL-predicate rows
    * are NOT matches — they survive. A predicate matching nothing
    * commits nothing and returns the current latest version.
    * Declines loudly on column-mapped tables and deletion-vector
    * files (the rewrite would have to apply DVs first). Returns the
    * committed version. */
  def commitDelete(spark: SparkSession, table: String,
                   predicate: org.apache.spark.sql.Column): Long = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    val t = dmlTarget(spark, fs, logDir, table, "DELETE")
    val affected = t.df.filter(predicate).select("__file")
      .distinct().collect().map(_.getString(0)).toSet // planning-bounded
    if (affected.isEmpty) return t.version - 1

    val sq = spark
    import sq.implicits._
    val affDf = broadcast(affected.toSeq.sorted.toDF("__file"))
    val inAffected = t.df.join(affDf, Seq("__file"), "left_semi")
    // NULL-predicate rows are not matches: they must survive
    val survivors = inAffected
      .filter(not(coalesce(predicate, lit(false))))
      .select(t.schema.fieldNames.toSeq.map(col): _*)
    val deleted = inAffected.filter(predicate)
    val adds = stageAdds(spark, fs, table, survivors, t.partCols,
      t.version, dataChange = true, allowEmpty = true)
    val cdcLines = stageCdc(spark, fs, table, deleted
      .select(t.schema.fieldNames.toSeq.map(col): _*)
      .withColumn("_change_type", lit("delete")), t.partCols, t.version)
    writeCommit(fs, logDir, t.version,
      t.removesOf(affected) ++ adds ++ cdcLines, table)
    t.version
  }

  /** UPDATE, COPY-ON-WRITE — `set` expressions applied to every row
    * the predicate matches (NULL-predicate rows are not matches),
    * only the files holding matches rewrite, and the commit carries
    * `update_preimage`/`update_postimage` CDC rows like
    * [[commitMerge]]. Set expressions may reference any column
    * (`"price" -> col("price") * 2`); updating a PARTITION column
    * re-stages moved rows under their new directory. A predicate
    * matching nothing is a no-op. Declines loudly: unknown set
    * columns, column-mapped tables, DV files. Returns the committed
    * version. */
  def commitUpdate(spark: SparkSession, table: String,
                   predicate: org.apache.spark.sql.Column,
                   set: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    require(set.nonEmpty, "UPDATE needs at least one set expression")
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    val t = dmlTarget(spark, fs, logDir, table, "UPDATE")
    set.foreach { case (c, _) =>
      require(t.schema.fieldNames.contains(c),
        s"UPDATE set column $c not in the table schema") }
    val affected = t.df.filter(predicate).select("__file")
      .distinct().collect().map(_.getString(0)).toSet // planning-bounded
    if (affected.isEmpty) return t.version - 1

    val sq = spark
    import sq.implicits._
    val affDf = broadcast(affected.toSeq.sorted.toDF("__file"))
    val inAffected = t.df.join(affDf, Seq("__file"), "left_semi")
    val setMap = set.toMap
    val matchedOld = inAffected.filter(predicate)
      .select(t.schema.fieldNames.toSeq.map(col): _*)
    val matchedNew = matchedOld.select(t.schema.fieldNames.toSeq.map {
      c => setMap.get(c).map(_.cast(t.schema(c).dataType).as(c))
        .getOrElse(col(c)) }: _*)
    val rewrite = inAffected
      .filter(not(coalesce(predicate, lit(false))))
      .select(t.schema.fieldNames.toSeq.map(col): _*)
      .unionByName(matchedNew)
    val adds = stageAdds(spark, fs, table, rewrite, t.partCols,
      t.version, dataChange = true, allowEmpty = true)
    val cdcLines = stageCdc(spark, fs, table,
      matchedOld.withColumn("_change_type", lit("update_preimage"))
        .unionByName(matchedNew
          .withColumn("_change_type", lit("update_postimage"))),
      t.partCols, t.version)
    writeCommit(fs, logDir, t.version,
      t.removesOf(affected) ++ adds ++ cdcLines, table)
    t.version
  }

  /** The live target of a copy-on-write DML commit ([[commitDelete]]
    * / [[commitUpdate]] / [[commitMerge]]): the next version, the
    * governing schema + partition columns, ONE distributed read of
    * every live file — data columns pinned, the `__file` key decoded
    * from `_metadata` (URIs percent-encode), partition columns
    * attached through a broadcast file→tuple join so predicates can
    * reference them — and the reconciled live-file list. */
  private final case class DmlTarget(version: Long, schema: StructType,
                                     partCols: Seq[String], df: DataFrame,
                                     liveRels: Seq[(String,
                                       Map[String, String])]) {
    def baseName(rel: String): String = {
      val p = uriDecode(rel)
      p.substring(p.lastIndexOf('/') + 1)
    }
    /** Tombstone lines for the affected (by basename) files. */
    def removesOf(affected: Set[String]): Seq[String] = liveRels
      .filter { case (rel, _) => affected(baseName(rel)) }
      .map { case (rel, _) =>
        s"""{"remove":{"path":"${jstr(rel)}","deletionTimestamp":""" +
          s"""$version,"dataChange":true}}""" }
  }

  private def dmlTarget(spark: SparkSession,
                        fs: org.apache.hadoop.fs.FileSystem,
                        logDir: Path, table: String,
                        op: String): DmlTarget = {
    require(fs.exists(logDir), s"not a Delta table (no $LogDir): $table")
    val version = latestVersion(spark, table) + 1
    require(version > 0, s"not a Delta table (no commits): $table")
    // ONE replay job supplies meta AND the reconciled live-file list
    // (this path formerly replayed the log twice more: once for
    // latestMeta, once for its own window reconciliation)
    val rs = replayState(spark, fs, logDir, table, Long.MaxValue)
    val schema = DataType.fromJson(rs.schemaString)
      .asInstanceOf[StructType]
    val partCols = rs.partCols
    val cmap = rs.configuration
      .getOrElse("delta.columnMapping.mode", "none")
    require(cmap == "none",
      s"$op on column-mapped tables is beyond this writer")

    val liveRows = rs.liveAdds.map(a => (a.getString(0),
      Option(a.getMap[String, String](1)).map(_.toMap)
        .getOrElse(Map.empty[String, String]),
      !a.isNullAt(5)))
    require(liveRows.forall(!_._3),
      s"$op over deletion-vector files is beyond this writer")

    val dataSchema = StructType(
      schema.filterNot(f => partCols.contains(f.name)))
    def baseName(rel: String): String = {
      val p = uriDecode(rel)
      p.substring(p.lastIndexOf('/') + 1)
    }
    // escape-free basenames (this writer's part-NNNNN names) skip the
    // per-row %XX decode of the join key — see buildFrom
    val escapeFree = liveRows.forall { case (rel, _, _) =>
      baseName(rel).forall(ch =>
        ch.isLetterOrDigit || ch == '.' || ch == '_' || ch == '-') }
    val rawName = substring_index(col("_metadata.file_path"), "/", -1)
    val df0 = spark.read.schema(dataSchema)
      .parquet(liveRows.map { case (rel, _, _) =>
        new Path(table, uriDecode(rel)).toString }.toSeq: _*)
      .select(col("*"),
        (if (escapeFree) rawName
         else url_decode(regexp_replace(rawName, "\\+", "%2B")))
          .as("__file"))
    val pvRows = liveRows.toSeq.map { case (rel, pv, _) =>
      org.apache.spark.sql.Row.fromSeq(
        baseName(rel) +: partCols.map(pc => pv.get(pc).orNull))
    }
    val pvSchema = StructType(StructField("__file", StringType) +:
      partCols.map(pc => StructField(s"__pv_$pc", StringType)).toSeq)
    val pvDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(pvRows, 1), pvSchema))
    val df = partCols.foldLeft(df0.join(pvDf, Seq("__file"))) {
      (d, pc) =>
        val f = schema.find(_.name == pc).getOrElse(
          sys.error(s"partition column $pc missing from schema"))
        d.withColumn(pc, col(s"__pv_$pc").cast(f.dataType))
    }.select(("__file" +: schema.fieldNames.toSeq).map(col): _*)
    DmlTarget(version, schema, partCols, df,
      liveRows.toSeq.map { case (rel, pv, _) => (rel, pv) })
  }

  /** MERGE (upsert), COPY-ON-WRITE — the third side of the DML
    * triangle (append / delete / merge): rows of `source` whose
    * `keyCols` match a target row UPDATE it (every matching target
    * row rewrites to the source's values — duplicate target keys stay
    * duplicated, per classic MERGE), unmatched source rows INSERT.
    * Only files holding matched rows rewrite; the rewrite, the
    * inserts, and the tombstones commit atomically. The commit writes
    * the protocol's precise CDC: `update_preimage` (old values) +
    * `update_postimage` (new values) per updated row and `insert` per
    * inserted one, so [[changes]] replays the merge exactly. NULL
    * keys never match (SQL join semantics): null-key target rows
    * survive untouched, null-key source rows insert. Declines
    * loudly: duplicate keys in `source` (an ambiguous merge),
    * source schema ≠ table schema, column-mapped tables, DV files.
    * An all-new-keys source degenerates to a plain append (no file
    * rewrites). Returns the committed version. */
  def commitMerge(spark: SparkSession, table: String, source: DataFrame,
                  keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    val t = dmlTarget(spark, fs, logDir, table, "MERGE")
    val schema = t.schema
    val partCols = t.partCols
    val version = t.version
    val target = t.df
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"merge key $k not in the table schema"))
    require(source.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"merge source schema ${source.schema.simpleString} does not " +
        s"match the table schema ${schema.simpleString}")
    // the merge SOURCE is consumed five ways (dup-key check, the key
    // broadcasts, the update join, the insert anti-join, CDC) — it is
    // batch-sized by definition, so materialize it ONCE instead of
    // re-running its upstream plan per consumer
    val src = source.localCheckpoint(true)
    require(src.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).isEmpty,
      "merge source has duplicate keys — ambiguous merge")

    val srcKeys = src.select(keyCols.map(col): _*)
    // matched target rows are bounded by the source batch's key
    // fan-out; materialized once, they serve the affected-file list,
    // the update join, and the CDC preimage without three table scans
    val matchedTarget = target.join(broadcast(srcKeys), keyCols,
      "left_semi").localCheckpoint(true)
    val affected = matchedTarget.select("__file").distinct()
      .collect().map(_.getString(0)).toSet // planning-bounded
    val sq = spark
    import sq.implicits._
    val dataCols = schema.fieldNames.toSeq
    // the rewrite set: affected files' unmatched rows verbatim +
    // every matched target row replaced by its source values (an
    // inner join on keys — one source row fans out to each matching
    // target copy) + brand-new source keys
    val srcRenamed = src.select(dataCols.map(c =>
      col(c).as(if (keyCols.contains(c)) c else s"__src_$c")): _*)
    val updates = matchedTarget.join(srcRenamed, keyCols)
      .select(dataCols.map(c =>
        (if (keyCols.contains(c)) col(c)
         else col(s"__src_$c").as(c))): _*)
    // the insert set pays the one unavoidable full-key anti-join; it
    // is consumed twice (rewrite + CDC), so materialize it too —
    // batch-bounded like the source
    val inserts = src.join(
      target.select(keyCols.map(col): _*), keyCols, "left_anti")
      .localCheckpoint(true)
    val newData =
      (if (affected.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(schema.fields))
      else {
        val affDf = broadcast(affected.toSeq.sorted.toDF("__file"))
        target.join(affDf, Seq("__file"), "left_semi")
          .join(broadcast(srcKeys), keyCols, "left_anti")
          .select(dataCols.map(col): _*)
          .unionByName(updates)
      }).unionByName(inserts)
    val adds = stageAdds(spark, fs, table, newData, partCols, version,
      dataChange = true, allowEmpty = true)
    val cdcDf = matchedTarget.select(dataCols.map(col): _*)
      .withColumn("_change_type", lit("update_preimage"))
      .unionByName(updates
        .withColumn("_change_type", lit("update_postimage")))
      .unionByName(inserts.withColumn("_change_type", lit("insert")))
    val cdcLines = stageCdc(spark, fs, table, cdcDf, partCols, version)
    writeCommit(fs, logDir, version,
      t.removesOf(affected) ++ adds ++ cdcLines, table)
    version
  }

  /** Stages `df` (data columns + `_change_type`) as `_change_data/`
    * parquet and returns the commit's `cdc` action lines — partition
    * values ride in the action (the protocol's CDC layout), not the
    * files. */
  private def stageCdc(spark: SparkSession,
                       fs: org.apache.hadoop.fs.FileSystem,
                       table: String, df: DataFrame,
                       partCols: Seq[String], version: Long): Seq[String] = {
    val staging = new Path(table, s".cdc-staging-$version")
    val writer = if (partCols.isEmpty) df.write
      else df.write.partitionBy(partCols: _*)
    writer.mode("overwrite").parquet(staging.toString)
    def listParquet(dir: Path, prefix: String): Seq[(Path, String)] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.contains("="))
          listParquet(st.getPath,
            if (prefix.isEmpty) name else s"$prefix/$name")
        else if (name.endsWith(".parquet")) Seq(st.getPath -> prefix)
        else Seq.empty
      }
    val lines = listParquet(staging, "").zipWithIndex.map {
      case ((src, prefix), i) =>
        val rel = "_change_data/" +
          (if (prefix.isEmpty) "" else s"$prefix/") +
          f"cdc-$version%05d-$i%05d.parquet"
        val dest = new Path(table, rel)
        fs.mkdirs(dest.getParent)
        require(fs.rename(src, dest), s"rename $src -> $dest failed")
        val pv = prefix.split("/").filter(_.nonEmpty).map { seg =>
          val k = seg.substring(0, seg.indexOf('='))
          val x = uriDecode(seg.substring(seg.indexOf('=') + 1))
          s""""$k":"${jstr(x)}""""
        }.mkString(",")
        s"""{"cdc":{"path":"${jstr(rel)}","partitionValues":{$pv},""" +
          s""""size":${fs.getFileStatus(dest).getLen},""" +
          """"dataChange":false}}"""
    }
    fs.delete(staging, true)
    lines
  }

  /** Writes a CLASSIC single-file CHECKPOINT at the table's latest
    * version — the protocol's answer to unbounded log replay: a
    * parquet snapshot of the reconciled state (latest protocol,
    * latest metaData, every LIVE add with its stats / partition
    * values / deletion vector intact, and every still-winning remove
    * as a tombstone), named `%020d.checkpoint.parquet`, plus the
    * `_last_checkpoint` hint. A 100 TB table with thousands of
    * commits then replays ONE parquet file + the JSON tail; the adds
    * flow through a distributed window reconciliation, never a
    * driver loop. After a checkpoint, [[cleanLog]] may delete the
    * JSON commits it covers — snapshots and version time travel at
    * or after the checkpoint keep working (the replay anchors on the
    * checkpoint), while pre-checkpoint travel and [[changes]] decline
    * loudly through their existing history checks.
    *
    * Declines loudly: tables whose protocol lists the `v2Checkpoint`
    * reader feature (such tables expect v2 checkpoints, not classic
    * ones), and tables whose log carries `txn` or `domainMetadata`
    * state (a checkpoint must preserve them; this writer would drop
    * them — decline rather than miswrite). `cdc` actions are
    * correctly EXCLUDED from checkpoints per the protocol. Returns
    * the checkpointed version. */
  def commitCheckpoint(spark: SparkSession, table: String): Long = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    require(fs.exists(logDir), s"not a Delta table (no $LogDir): $table")
    val version = latestVersion(spark, table)
    require(version >= 0, s"empty Delta log in $table")

    // state-bearing actions this schema-pinned replay would DROP:
    // sniff the raw JSON tail + any anchoring checkpoint's columns.
    // The sniff schema is PINNED (presence shows as a non-null struct)
    // so no schema-inference pass runs over the log
    val jsonPaths = fs.listStatus(logDir).map(_.getPath)
      .filter(_.getName.matches("\\d{20}\\.json")).map(_.toString).toSeq
    if (jsonPaths.nonEmpty) {
      val sniffSchema = StructType.fromDDL(
        "txn STRUCT<appId: STRING>, domainMetadata STRUCT<domain: STRING>")
      val raw = spark.read.schema(sniffSchema).json(jsonPaths: _*)
      Seq("txn", "domainMetadata").foreach { a =>
        require(raw.filter(col(a).isNotNull).isEmpty,
          s"checkpointing a table with `$a` actions is beyond this " +
            "writer (the checkpoint must carry them forward)")
      }
    }

    val actions = replayActions(spark, fs, logDir, table, version)

    // protocol gate: v2Checkpoint-featured tables expect v2, not this
    val proto = actions.filter(col("protocol").isNotNull)
      .orderBy(col("v").desc).select("protocol").limit(1)
      .collect().headOption
    proto.foreach { r =>
      val p = r.getStruct(0)
      val feats: Seq[String] =
        if (p.length < 3 || p.isNullAt(2)) Seq.empty else p.getSeq[String](2)
      require(!feats.contains("v2Checkpoint"),
        "table declares the v2Checkpoint feature — writing a classic " +
          "checkpoint to it is beyond this writer")
    }

    // distributed reconciliation: latest add / latest remove per path,
    // live iff the add is at least as new (the replay's tie rule);
    // losing paths keep their winning remove as a tombstone. ONE hash
    // aggregation keyed by path (map-side partials) in place of the
    // former two sort windows + full outer join — at checkpoint scale
    // (every file the table ever had) that is one shuffle of the action
    // set instead of three
    val rec = actions
      .filter(col("add").isNotNull || col("remove").isNotNull)
      .groupBy(coalesce(col("add.path"), col("remove.path")).as("__path"))
      .agg(
        latestBy(col("add"), col("add").isNotNull).as("add"),
        max(when(col("add").isNotNull, col("v"))).as("av"),
        latestBy(col("remove"), col("remove").isNotNull).as("remove"),
        max(when(col("remove").isNotNull, col("v"))).as("rv"))
    val fileActions = rec.select(
      when(col("add").isNotNull &&
        (col("rv").isNull || col("av") >= col("rv")), col("add")).as("add"),
      when(col("remove").isNotNull &&
        (col("av").isNull || col("rv") > col("av")), col("remove"))
        .as("remove"))
      .filter(col("add").isNotNull || col("remove").isNotNull)
    val metaDf = actions.filter(col("metaData").isNotNull)
      .orderBy(col("v").desc).select(col("metaData")).limit(1)
    val protoDf = actions.filter(col("protocol").isNotNull)
      .orderBy(col("v").desc).select(col("protocol")).limit(1)
    val cp = Seq(fileActions, metaDf, protoDf)
      .reduce(_.unionByName(_, allowMissingColumns = true))

    // one parquet part, renamed into the log; the `_last_checkpoint`
    // row count is observed during the SAME write job instead of a
    // read-back count of the freshly written file
    val obs = new org.apache.spark.sql.Observation(s"cp_rows_$version")
    val staging = new Path(table, s".cp-staging-$version")
    cp.coalesce(1).observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    val dest = new Path(logDir, f"$version%020d.checkpoint.parquet")
    require(!fs.exists(dest), s"checkpoint $version already exists")
    require(fs.rename(part, dest), s"rename to $dest failed")
    fs.delete(staging, true)
    val size = obs.get("n").asInstanceOf[Long]
    val hint = new Path(logDir, "_last_checkpoint")
    val out = fs.create(hint, true)
    try out.write(
      s"""{"version":$version,"size":$size}""".getBytes("UTF-8"))
    finally out.close()
    version
  }

  /** Deletes the JSON commits a checkpoint covers (metadata cleanup):
    * every `%020d.json` at or below the latest checkpoint version.
    * The replay then anchors on the checkpoint; pre-checkpoint
    * version/timestamp travel and [[changes]] decline loudly through
    * their existing anchored/gap-free/full-history checks rather than
    * partially replay. Returns the number of commits deleted. */
  def cleanLog(spark: SparkSession, table: String): Int = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    require(fs.exists(logDir), s"not a Delta table (no $LogDir): $table")
    val cpVersions = fs.listStatus(logDir).map(_.getPath.getName)
      .flatMap { n =>
        val m = java.util.regex.Pattern
          .compile("(\\d{20})\\.checkpoint\\.parquet").matcher(n)
        if (m.matches()) Some(m.group(1).toLong) else None
      }
    require(cpVersions.nonEmpty,
      s"no classic checkpoint to clean up to in $table")
    val cp = cpVersions.max
    val victims = fs.listStatus(logDir).map(_.getPath)
      .filter(p => p.getName.matches("\\d{20}\\.json") &&
        p.getName.stripSuffix(".json").toLong <= cp)
    victims.foreach(p => fs.delete(p, false))
    victims.length
  }

  /** VACUUM — the storage half of retention maintenance ([[cleanLog]]
    * is the log half): deletes files under the table that the CURRENT
    * snapshot no longer references and that have aged past
    * `retentionMs` — tombstoned data files by their remove's
    * `deletionTimestamp`, untracked leftovers (crashed staging parts,
    * orphaned DV files) by modification time. The live set protects
    * every reconciled add AND every deletion-vector file a live add
    * references ('p'/'u' storage). Version/timestamp travel to
    * snapshots that needed a vacuumed file fails at READ time
    * afterwards — the protocol's documented trade; the log itself is
    * untouched. `nowMs` is explicit so maintenance jobs and tests are
    * deterministic. Returns the deleted table-relative paths,
    * sorted. */
  def vacuum(spark: SparkSession, table: String, retentionMs: Long,
             nowMs: Long): Seq[String] = {
    require(retentionMs >= 0, s"bad retention $retentionMs")
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    require(fs.exists(logDir), s"not a Delta table (no $LogDir): $table")
    // ONE replay job yields both the live file list and the losing
    // tombstones (this path formerly ran two window/join collects)
    val rs = replayState(spark, fs, logDir, table, Long.MaxValue)
    val liveRows = rs.liveAdds
    val deadRows = rs.tombstones

    def relOf(p: Path): String = {
      val root = new Path(table).toUri.getPath.stripSuffix("/")
      val full = p.toUri.getPath
      require(full.startsWith(root + "/"), s"$p outside $table")
      full.stripPrefix(root + "/")
    }
    // live = decoded data-file paths + referenced DV files
    val liveSet: Set[String] = liveRows.flatMap { r =>
      val dataRel = uriDecode(r.getString(0))
      val dv = if (r.isNullAt(5)) None else Some(r.getStruct(5))
      dataRel +: dv.toSeq.flatMap { d =>
        val storage = d.getString(0)
        val poi = d.getString(1)
        storage match {
          case "i" => Nil
          case "p" =>
            val p = new Path(poi)
            if (p.isAbsolute || poi.contains(":/")) Nil // external
            else Seq(uriDecode(poi))
          case "u" =>
            val prefix = poi.dropRight(20)
            val uuid = graft.functions.DeletionVectors
              .uuidFromBase85(poi.takeRight(20))
            val name = s"deletion_vector_$uuid.bin"
            Seq(if (prefix.isEmpty) name else s"$prefix/$name")
          case other => sys.error(s"unknown DV storage '$other'")
        }
      }
    }.toSet
    val tombstoneTs: Map[String, Long] = deadRows.map { case (p, ts) =>
      uriDecode(p) -> ts
    }.toMap

    // walk the table, skipping the log and hidden/underscore names at
    // every level (other writers' scratch conventions)
    def walk(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st)
      }
    val cutoff = nowMs - retentionMs
    val victims = walk(new Path(table)).flatMap { st =>
      val rel = relOf(st.getPath)
      if (liveSet.contains(rel)) None
      else {
        val aged = tombstoneTs.get(rel) match {
          case Some(ts) => ts <= cutoff
          case None => st.getModificationTime <= cutoff
        }
        if (aged) Some(rel) else None
      }
    }.sorted
    victims.foreach(rel =>
      fs.delete(new Path(table, rel), false))
    victims
  }

  private def jstr(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Shared write tier of [[commitAppend]]/[[commitCompact]]:
    * distributed parquet into a staging dir, rename each part under
    * the table root with a version-unique name, ONE distributed stats
    * job (per-file numRecords + long/string min/max), zero-row parts
    * dropped; returns the add-action JSON lines. The driver touches
    * only the file LIST. */
  private def stageAdds(spark: SparkSession,
                        fs: org.apache.hadoop.fs.FileSystem,
                        table: String, df: DataFrame,
                        partitionBy: Seq[String], version: Long,
                        dataChange: Boolean,
                        allowEmpty: Boolean = false): Seq[String] = {
    val schema = df.schema
    val staging = new Path(table, s".staging-$version")
    val writer = if (partitionBy.isEmpty) df.write
      else df.write.partitionBy(partitionBy: _*)
    writer.mode("overwrite").parquet(staging.toString)
    def listParquet(dir: Path, prefix: String): Seq[(Path, String)] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.contains("="))
          listParquet(st.getPath,
            if (prefix.isEmpty) name else s"$prefix/$name")
        else if (name.endsWith(".parquet"))
          Seq(st.getPath -> prefix)
        else Seq.empty
      }
    val staged = listParquet(staging, "")
    require(staged.nonEmpty || allowEmpty,
      s"append of an empty DataFrame to $table")
    if (staged.isEmpty) { fs.delete(staging, true); return Seq.empty }
    val moved = staged.zipWithIndex.map { case ((src, prefix), i) =>
      val rel = (if (prefix.isEmpty) "" else s"$prefix/") +
        f"part-$version%05d-$i%05d.parquet"
      val destDir =
        if (prefix.isEmpty) new Path(table) else new Path(table, prefix)
      fs.mkdirs(destDir)
      val dest = new Path(table, rel)
      require(fs.rename(src, dest), s"rename $src -> $dest failed")
      (rel, dest, prefix)
    }
    fs.delete(staging, true)

    // per-file counts + min/max of long/string leaves (the prunable
    // stats) from the parquet FOOTERS the write itself produced —
    // driver-side metadata tail-reads, never a distributed read-back
    // of the bytes just written (guide §6; one fewer job per commit).
    // Keyed by BASENAME (version-unique by construction).
    val statCols = schema.fields.filter(f =>
      !partitionBy.contains(f.name) &&
        (f.dataType == LongType || f.dataType == StringType))
    val statRows = FooterStats.forFiles(fs, moved.map(_._2))

    def statsJson(st: FooterStats.FileStats): String = {
      def side(which: Int): String = statCols.map { f =>
        // bounds absent (all-null column, or a writer-dropped stat)
        // render as null — the same shape the old min()/max() job gave
        // for all-null columns; pruning treats null bounds as keep
        val v = st.bounds.get(f.name) match {
          case Some((2, mn, mx)) if f.dataType == LongType =>
            val b = if (which == 0) mn else mx
            var x = 0L; var k = 7
            while (k >= 0) { x = (x << 8) | (b(k) & 0xffL); k -= 1 }
            x.toString
          case Some((6, mn, mx)) if f.dataType == StringType =>
            "\"" + jstr(new String(if (which == 0) mn else mx,
              java.nio.charset.StandardCharsets.UTF_8)) + "\""
          case _ => "null"
        }
        s""""${f.name}":$v"""
      }.mkString(",")
      s"""{"numRecords":${st.numRows},""" +
        s""""minValues":{${side(0)}},""" +
        s""""maxValues":{${side(1)}}}"""
    }
    // zero-row part files carry nothing — drop them instead of
    // committing empty data files
    val (liveParts, emptyParts) = moved.partition { case (_, dest, _) =>
      statRows.get(dest.getName).exists(_.numRows > 0)
    }
    emptyParts.foreach { case (_, dest, _) => fs.delete(dest, false) }
    require(liveParts.nonEmpty || allowEmpty,
      s"append of an empty DataFrame to $table")
    liveParts.map { case (rel, dest, prefix) =>
      val pv = prefix.split("/").filter(_.nonEmpty).map { seg =>
        val k = seg.substring(0, seg.indexOf('='))
        val x = uriDecode(seg.substring(seg.indexOf('=') + 1))
        s""""$k":"${jstr(x)}""""
      }.mkString(",")
      val stats = statRows.get(dest.getName)
        .map(r => s""","stats":"${jstr(statsJson(r))}"""")
        .getOrElse("")
      val escRel = rel.split("/").map(seg =>
        java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20"))
        .mkString("/")
      s"""{"add":{"path":"$escRel","partitionValues":{$pv},""" +
        s""""size":${fs.getFileStatus(dest).getLen},""" +
        s""""dataChange":$dataChange$stats}}"""
    }
  }

  /** Atomic commit: write to a temp name, rename to the version —
    * rename fails if someone else committed the version first. */
  private def writeCommit(fs: org.apache.hadoop.fs.FileSystem,
                          logDir: Path, version: Long,
                          lines: Seq[String], table: String): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, f".$version%020d.json.tmp")
    val out = fs.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val commitFile = new Path(logDir, f"$version%020d.json")
    require(!fs.exists(commitFile) && fs.rename(tmp, commitFile),
      s"commit conflict: version $version already exists in $table")
  }

  /** CHANGE-DATA-FEED read — the incremental-consumer face a
    * training-data pipeline uses to re-process deltas: every change
    * row committed in versions [fromVersion, toVersion], surfaced as
    * the table schema plus `_change_type` and `_commit_version`.
    * Commits that wrote explicit `cdc` actions surface their
    * `_change_data` parquet verbatim (those files carry
    * `_change_type`: insert / delete / update_preimage /
    * update_postimage, and per the protocol REPLACE that commit's
    * add/remove as the change source); plain commits SYNTHESIZE the
    * feed: dataChange adds replay as `insert` rows, dataChange
    * removes replay the removed file's (still-present) content as
    * `delete` rows, with partition values resolved through the file's
    * original add. Per-commit file groups read as pinned-schema
    * distributed scans; only the file PLANNING set is driver-side.
    * Declines loudly on column-mapped tables, deletion vectors, or a
    * JSON history that no longer reaches version 0 (synthesis and
    * partition resolution need the full log). */
  def changes(spark: SparkSession, table: String, fromVersion: Long,
              toVersion: Long): DataFrame = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    require(fs.exists(logDir), s"not a Delta table (no $LogDir): $table")
    require(fromVersion >= 0 && toVersion >= fromVersion,
      s"bad CDF version range [$fromVersion, $toVersion]")
    val present = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).toSet
    (0L to toVersion).foreach(v => require(present.contains(v),
      s"CDF needs the full JSON history: commit $v missing in $table"))
    val files = (0L to toVersion)
      .map(v => new Path(logDir, f"$v%020d.json").toString)
    val actions = spark.read.schema(actionSchema).json(files: _*)
      .withColumn("v", regexp_extract(input_file_name(),
        "(\\d{20})\\.json", 1).cast("long"))

    // ONE driver collect serves the protocol gate, the governing
    // metaData, and all three planning row groups (adds / removes /
    // cdc) — this path formerly ran four separate collects, each
    // re-parsing the whole JSON history
    val actionRows = actions
      .filter(col("add").isNotNull || col("remove").isNotNull ||
        col("cdc").isNotNull || col("metaData").isNotNull ||
        col("protocol").isNotNull)
      .select(col("v"),
        col("add.path").as("ap"), col("add.partitionValues").as("apv"),
        coalesce(col("add.dataChange"), lit(true)).as("adc"),
        col("add.deletionVector").isNotNull.as("adv"),
        col("add").isNotNull.as("isAdd"),
        col("remove.path").as("rp"),
        coalesce(col("remove.dataChange"), lit(true)).as("rdc"),
        col("remove").isNotNull.as("isRemove"),
        col("cdc.path").as("cp"), col("cdc.partitionValues").as("cpv"),
        col("cdc").isNotNull.as("isCdc"),
        col("metaData"), col("protocol"))
      .collect() // metadata-bounded planning rows, like the snapshot list
    val meta = actionRows
      .filter(r => !r.isNullAt(r.fieldIndex("metaData")) ||
        !r.isNullAt(r.fieldIndex("protocol")))
      .map(r => org.apache.spark.sql.Row(r.getLong(0),
        if (r.isNullAt(r.fieldIndex("metaData"))) null
        else r.getStruct(r.fieldIndex("metaData")),
        if (r.isNullAt(r.fieldIndex("protocol"))) null
        else r.getStruct(r.fieldIndex("protocol"))))
    meta.filter(!_.isNullAt(2)).sortBy(_.getLong(0)).lastOption.foreach { r =>
      val p = r.getStruct(2)
      val minReader = if (p.isNullAt(0)) 1 else p.getInt(0)
      val feats: Seq[String] =
        if (p.length < 3 || p.isNullAt(2)) Seq.empty else p.getSeq[String](2)
      val ok = minReader <= 2 ||
        (minReader == 3 && feats.nonEmpty &&
          feats.forall(SupportedReaderFeatures))
      require(ok,
        s"unsupported Delta protocol for CDF: minReaderVersion=$minReader")
    }
    val metaRow = meta.filter(!_.isNullAt(1)).sortBy(_.getLong(0)).lastOption
      .getOrElse(sys.error(s"no metaData action in $table"))
    val schema = DataType.fromJson(metaRow.getStruct(1).getString(1))
      .asInstanceOf[StructType]
    val partCols = Option(metaRow.getStruct(1).getSeq[String](2))
      .getOrElse(Seq.empty)
    val cmapMode = {
      val conf = metaRow.getStruct(1)
      if (conf.length < 4 || conf.isNullAt(3)) "none"
      else Option(conf.getMap[String, String](3))
        .flatMap(_.get("delta.columnMapping.mode")).getOrElse("none")
    }
    require(cmapMode == "none",
      "CDF on column-mapped tables is beyond this reader")

    // driver-side planning rows: adds up to toVersion (remove-pv
    // lookup needs them), removes and cdc actions in range —
    // metadata-bounded, decoded from the single collect above
    val addRows = actionRows.filter(_.getBoolean(5))
      .map(r => (r.getString(1),
        Option(r.getMap[String, String](2)).map(_.toMap)
          .getOrElse(Map.empty[String, String]),
        r.getBoolean(3), r.getBoolean(4), r.getLong(0)))
    require(!addRows.exists(_._4),
      "CDF over deletion-vector tables is beyond this reader")
    val removeRows = actionRows.filter(r => r.getBoolean(8) &&
        r.getLong(0) >= fromVersion && r.getLong(0) <= toVersion)
      .map(r => (r.getString(6), r.getBoolean(7), r.getLong(0)))
    val cdcRows = actionRows.filter(r => r.getBoolean(11) &&
        r.getLong(0) >= fromVersion && r.getLong(0) <= toVersion)
      .map(r => (r.getString(9),
        Option(r.getMap[String, String](10)).map(_.toMap)
          .getOrElse(Map.empty[String, String]), r.getLong(0)))
    // a commit with cdc actions describes its own changes COMPLETELY —
    // its add/remove must not synthesize on top (double counting)
    val cdcVersions = cdcRows.map(_._3).toSet

    val dataFields = schema.filterNot(f => partCols.contains(f.name))
    val ctField = StructField("_change_type", StringType)
    val dataSchema = StructType(dataFields)
    val cdcSchema = StructType(dataFields :+ ctField)

    // one pinned read per (version, partition tuple, change source)
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, String], String, Seq[String])]
    cdcRows.groupBy(r => (r._3, r._2)).foreach { case ((v, pv), rs) =>
      groups += ((v, pv, null, rs.map(_._1).toSeq))
    }
    addRows.filter(a => a._5 >= fromVersion && a._5 <= toVersion &&
        a._3 && !cdcVersions.contains(a._5))
      .groupBy(a => (a._5, a._2)).foreach { case ((v, pv), as) =>
        groups += ((v, pv, "insert", as.map(_._1).toSeq))
      }
    val addsByPath = addRows.groupBy(_._1)
    removeRows.filter(r => r._2 && !cdcVersions.contains(r._3))
      .map { case (path, _, v) =>
        val pv = addsByPath.getOrElse(path, Array.empty)
          .filter(_._5 <= v).sortBy(_._5).lastOption
          .map(_._2).getOrElse(Map.empty[String, String])
        (path, pv, v)
      }
      .groupBy(r => (r._3, r._2)).foreach { case ((v, pv), rs) =>
        groups += ((v, pv, "delete", rs.map(_._1).toSeq))
      }

    val outCols = schema.fieldNames.toSeq ++
      Seq("_change_type", "_commit_version")
    val parts = groups.toSeq
      .sortBy(g => (g._1, String.valueOf(g._3),
        g._2.toSeq.sorted.map { case (k, x) => s"$k=$x" }.mkString(",")))
      .map { case (v, pv, ct, rels) =>
        val paths = rels.map(rel => new Path(table, uriDecode(rel)).toString)
        val base =
          if (ct == null) spark.read.schema(cdcSchema).parquet(paths: _*)
          else spark.read.schema(dataSchema).parquet(paths: _*)
            .withColumn("_change_type", lit(ct))
        partCols.foldLeft(base) { (df, pc) =>
          val f = schema.find(_.name == pc).getOrElse(
            sys.error(s"partition column $pc missing from schema"))
          df.withColumn(pc, pv.get(pc).map(x => lit(x).cast(f.dataType))
            .getOrElse(lit(null).cast(f.dataType)))
        }.withColumn("_commit_version", lit(v))
          .select(outCols.map(col): _*)
      }
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.fields.toSeq ++
          Seq(ctField, StructField("_commit_version", LongType))))
    else parts.reduce(_ unionByName _)
  }

  /** File-skipping snapshot: files whose `add.stats` min/max for
    * `colName` cannot intersect [lo, hi] are SKIPPED before any data
    * I/O (files without stats are conservatively kept) — the Delta
    * analog of row-group pruning, the planning move that makes a
    * 100 TB table's point query touch KBs of metadata instead of the
    * table. The caller re-filters exactly; this only bounds I/O. */
  def prunedSnapshot(spark: SparkSession, table: String, colName: String,
                     lo: Long, hi: Long,
                     versionAsOf: Long = Long.MaxValue): Pruned =
    build(spark, table, versionAsOf, keep = { stats =>
      val mn = jsonObjectAfter(stats, "minValues")
        .flatMap(longField(_, colName))
      val mx = jsonObjectAfter(stats, "maxValues")
        .flatMap(longField(_, colName))
      !(mn.exists(_ > hi) || mx.exists(_ < lo))
    })

  /** String-typed file skipping: lexicographic [lo, hi] against the
    * stats' quoted min/max (writers may truncate string maxima with a
    * bumped last char — that only WIDENS the kept set, so pruning
    * stays sound); absent/undecodable bounds keep the file. */
  def prunedSnapshotString(spark: SparkSession, table: String,
                           colName: String, lo: String, hi: String,
                           versionAsOf: Long = Long.MaxValue): Pruned =
    build(spark, table, versionAsOf, keep = { stats =>
      val mn = jsonObjectAfter(stats, "minValues")
        .flatMap(strField(_, colName))
      val mx = jsonObjectAfter(stats, "maxValues")
        .flatMap(strField(_, colName))
      !(mn.exists(_ > hi) || mx.exists(_ < lo))
    })

  /** %XX-only decoding (a literal '+' is NOT a space in URIs or in the
    * Delta protocol's percent-encoded paths — URLDecoder alone would
    * corrupt it). */
  private def uriDecode(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  /** Balanced-brace JSON object following `"key"`, or None. */
  private def jsonObjectAfter(s: String, key: String): Option[String] = {
    val i = s.indexOf("\"" + key + "\"")
    if (i < 0) return None
    val j = s.indexOf('{', i)
    if (j < 0) return None
    var depth = 0
    var k = j
    while (k < s.length) {
      s.charAt(k) match {
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return Some(s.substring(j, k + 1))
        case _ => ()
      }
      k += 1
    }
    None
  }

  private def longField(obj: String, colName: String): Option[Long] = {
    val m = java.util.regex.Pattern.compile(
      "\"" + java.util.regex.Pattern.quote(colName) +
        "\"\\s*:\\s*(-?\\d+)").matcher(obj)
    if (m.find()) scala.util.Try(m.group(1).toLong).toOption else None
  }

  /** Quoted JSON string value for `colName`, unescaped; None if the
    * stat is absent or not a string. */
  private def strField(obj: String, colName: String): Option[String] = {
    val m = java.util.regex.Pattern.compile(
      "\"" + java.util.regex.Pattern.quote(colName) +
        "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").matcher(obj)
    if (!m.find()) return None
    val raw = m.group(1)
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        i += 1
        raw.charAt(i) match {
          case '"' => sb.append('"'); case '\\' => sb.append('\\')
          case '/' => sb.append('/'); case 'b' => sb.append('\b')
          case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
          case 'r' => sb.append('\r'); case 't' => sb.append('\t')
          case 'u' if i + 4 < raw.length =>
            sb.append(Integer.parseInt(raw.substring(i + 1, i + 5), 16).toChar)
            i += 4
          case other => sb.append(other)
        }
      } else sb.append(c)
      i += 1
    }
    Some(sb.toString)
  }

  /** All actions governing the snapshot at `versionAsOf`, with their
    * commit version in `v`: checkpoint discovery by LISTING (classic
    * single-file, multi-part %020d.checkpoint.%010d.%010d.parquet,
    * and v2 UUID-named files + sidecars) — the newest COMPLETE
    * checkpoint at or before the requested version anchors the
    * replay, JSON commits after it replay on top. _last_checkpoint is
    * only a writer hint — a stale one must never mislead the replay
    * (the anchored/gap checks below still catch a cleaned-up log). */
  private def replayActions(spark: SparkSession,
                            fs: org.apache.hadoop.fs.FileSystem,
                            logDir: Path, table: String,
                            versionAsOf: Long): DataFrame = {
    val logNames = fs.listStatus(logDir).map(_.getPath.getName)
    val classicRe = "(\\d{20})\\.checkpoint\\.parquet".r
    val multiRe = "(\\d{20})\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet".r
    val v2Re = "(\\d{20})\\.checkpoint\\.([0-9a-fA-F-]{36})\\.parquet".r
    // version → (isV2, file names); multi-part only when ALL parts exist
    val checkpoints: Map[Long, (Boolean, Seq[String])] = {
      val classic = logNames.collect {
        case n @ classicRe(v) => v.toLong -> ((false, Seq(n)))
      }
      val v2 = logNames.collect {
        case n @ v2Re(v, _) => v.toLong -> ((true, Seq(n)))
      }
      val multi = logNames.collect { case n @ multiRe(v, _, parts) =>
        (v.toLong, parts.toInt, n)
      }.groupBy(_._1).collect {
        case (v, fs0) if fs0.map(_._2).distinct.length == 1 &&
          fs0.length == fs0.head._2 &&
          fs0.map(_._3).distinct.length == fs0.length =>
          v -> ((false, fs0.map(_._3).sorted.toSeq))
      }
      (classic ++ multi ++ v2).toMap // v2 preferred on version collision
    }
    val cpVersion = checkpoints.keys.filter(_ <= versionAsOf)
      .foldLeft(-1L)(math.max)

    val jsonFiles = fs.listStatus(logDir).map(_.getPath)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .filter { p =>
        val v = p.getName.stripSuffix(".json").toLong
        v > cpVersion && v <= versionAsOf
      }
      .sortBy(_.getName)
    require(cpVersion >= 0 || jsonFiles.nonEmpty,
      s"no commits at or below version $versionAsOf in $table")
    // replay must be ANCHORED (a checkpoint, or commit 0) and GAP-FREE:
    // with a stale _last_checkpoint plus log cleanup, a partial replay
    // would silently return an incomplete snapshot (missing adds)
    val versions = jsonFiles.map(_.getName.stripSuffix(".json").toLong)
    if (versions.nonEmpty) {
      val base = if (cpVersion >= 0) cpVersion + 1 else 0L
      require(versions.head == base,
        s"Delta log replay not anchored: first commit ${versions.head}, " +
          s"expected $base (checkpoint=$cpVersion) in $table")
      versions.zipWithIndex.foreach { case (v, i) =>
        require(v == base + i,
          s"gap in Delta log of $table: expected version ${base + i}, " +
            s"found $v")
      }
    }

    // actions with their commit version (from the file name)
    val jsonActions =
      if (jsonFiles.isEmpty) None
      else Some(spark.read.schema(actionSchema)
        .json(jsonFiles.map(_.toString): _*)
        .withColumn("v", regexp_extract(input_file_name(),
          "(\\d{20})\\.json", 1).cast("long")))
    val cpActions =
      if (cpVersion < 0) None
      else {
        val (isV2, names) = checkpoints(cpVersion)
        // schema-pinned read fills absent optional fields (e.g.
        // add.stats) with nulls — checkpoints from other writers carry
        // varying action-struct widths
        val cpDf = spark.read.schema(actionSchema)
          .parquet(names.map(n => new Path(logDir, n).toString): _*)
        val full =
          if (!isV2) cpDf
          else {
            // v2 checkpoint: file actions live in SIDECARS under
            // _delta_log/_sidecars/ — the sidecar list is the
            // metadata-bounded planning set, each sidecar reads
            // distributed like the checkpoint itself
            val sidecars = cpDf.filter(col("sidecar").isNotNull)
              .select(col("sidecar.path")).collect().map(_.getString(0))
            if (sidecars.isEmpty) cpDf
            else cpDf.unionByName(spark.read.schema(actionSchema)
              .parquet(sidecars.map(p =>
                new Path(new Path(logDir, "_sidecars"), p).toString): _*))
          }
        Some(full.withColumn("v", lit(cpVersion)))
      }
    (cpActions, jsonActions) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case _ => sys.error("unreachable")
    }
  }

  /** Everything the driver needs from ONE log replay, collected by a
    * SINGLE Spark job: the reconciled live add actions, the losing
    * tombstones, and the latest metaData / protocol actions. The
    * reconciliation is one hash aggregation keyed by path (`max_by`
    * picks each path's latest add/remove; the meta singleton rides the
    * same job under a sentinel key) — one shuffle with map-side
    * partials, replacing the former two sort windows + full outer join
    * + per-caller extra replays (build ran two collects; dmlTarget ran
    * a third for latestMeta; commitAppend paid all of them). The
    * driver-side footprint is unchanged: the file PLANNING list plus
    * one meta row. */
  private final case class ReplayState(
      table: String,
      liveAdds: Array[org.apache.spark.sql.Row],
      tombstones: Array[(String, Long)],
      metaData: Option[org.apache.spark.sql.Row],
      protocol: Option[org.apache.spark.sql.Row]) {
    def schemaString: String = metaRow.getAs[String]("schemaString")
    def partCols: Seq[String] = {
      val i = metaRow.fieldIndex("partitionColumns")
      if (metaRow.isNullAt(i)) Seq.empty
      else metaRow.getSeq[String](i).toSeq
    }
    def configuration: Map[String, String] = {
      val i = metaRow.fieldIndex("configuration")
      if (metaRow.isNullAt(i)) Map.empty
      else metaRow.getMap[String, String](i).toMap
    }
    private def metaRow: org.apache.spark.sql.Row = metaData
      .getOrElse(sys.error(s"no metaData action in $table"))
  }

  /** The latest-add-vs-latest-remove winner per action kind, ignoring
    * rows of other kinds (their ordering key collapses to −1, below
    * every real version). */
  private def latestBy(value: org.apache.spark.sql.Column,
                       pred: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    max_by(value, coalesce(when(pred, col("v")), lit(-1L)))

  private def replayState(spark: SparkSession,
                          fs: org.apache.hadoop.fs.FileSystem,
                          logDir: Path, table: String,
                          versionAsOf: Long): ReplayState = {
    val actions = replayActions(spark, fs, logDir, table, versionAsOf)
    val rows = actions
      .filter(col("add").isNotNull || col("remove").isNotNull ||
        col("metaData").isNotNull || col("protocol").isNotNull)
      .groupBy(coalesce(col("add.path"), col("remove.path"),
        lit("__meta__")).as("__path"))
      .agg(
        latestBy(col("add"), col("add").isNotNull).as("add"),
        max(when(col("add").isNotNull, col("v"))).as("av"),
        max(when(col("remove").isNotNull, col("v"))).as("rv"),
        latestBy(col("remove.deletionTimestamp"),
          col("remove").isNotNull).as("rts"),
        latestBy(col("metaData"), col("metaData").isNotNull).as("metaData"),
        latestBy(col("protocol"), col("protocol").isNotNull).as("protocol"))
      .collect() // the snapshot FILE LIST + 1 meta row — metadata-bounded
    val liveAdds = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val tombstones = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long)]
    var metaRow: Option[org.apache.spark.sql.Row] = None
    var protoRow: Option[org.apache.spark.sql.Row] = None
    rows.foreach { r =>
      val add = if (r.isNullAt(1)) null else r.getStruct(1)
      val av = if (r.isNullAt(2)) Long.MinValue else r.getLong(2)
      val rv = if (r.isNullAt(3)) Long.MinValue else r.getLong(3)
      // live iff the latest add is at least as new as the latest remove
      // (the protocol's reconciliation tie rule: the add wins)
      if (add != null && (r.isNullAt(3) || av >= rv)) liveAdds += add
      if (!r.isNullAt(3) && (r.isNullAt(2) || rv > av))
        tombstones += (r.getString(0) ->
          (if (r.isNullAt(4)) Long.MinValue else r.getLong(4)))
      if (!r.isNullAt(5)) metaRow = Some(r.getStruct(5))
      if (!r.isNullAt(6)) protoRow = Some(r.getStruct(6))
    }
    // protocol gate: the LATEST protocol action governs; minReaderVersion
    // 3 is acceptable only when every listed reader feature is one this
    // reader actually implements — unknown features raise, never misread
    protoRow.foreach { p =>
      val minReader = if (p.isNullAt(0)) 1 else p.getInt(0)
      val feats: Seq[String] =
        if (p.length < 3 || p.isNullAt(2)) Seq.empty else p.getSeq[String](2)
      val ok = minReader <= 2 ||
        (minReader == 3 && feats.nonEmpty &&
          feats.forall(SupportedReaderFeatures))
      require(ok,
        s"unsupported Delta protocol: minReaderVersion=$minReader" +
          (if (feats.nonEmpty) s", readerFeatures=${feats.mkString(",")}"
           else "") +
          " (reader features beyond this implementation)")
    }
    ReplayState(table, liveAdds.toArray,
      tombstones.toArray, metaRow, protoRow)
  }

  private def build(spark: SparkSession, table: String, versionAsOf: Long,
                    keep: String => Boolean): Pruned = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    require(fs.exists(logDir), s"not a Delta table (no $LogDir): $table")
    buildFrom(spark, fs, table,
      replayState(spark, fs, logDir, table, versionAsOf), keep)
  }

  /** The data-read plan over an already-collected replay — split from
    * [[build]] so operations that need BOTH the metadata and the data
    * (commitCompact) pay one replay job, not two. */
  private def buildFrom(spark: SparkSession,
                        fs: org.apache.hadoop.fs.FileSystem,
                        table: String, rs: ReplayState,
                        keep: String => Boolean): Pruned = {
    val schema = DataType.fromJson(rs.schemaString).asInstanceOf[StructType]
    val partCols = rs.partCols
    val metaConfiguration = rs.configuration

    // column mapping: NAME mode reads parquet by each field's recorded
    // physicalName and renames to the logical schema (partitionValues
    // keys are physical names too). ID mode additionally attaches each
    // field's columnMapping id as `parquet.field.id` metadata so
    // Spark's field-id resolution matches by id — which requires the
    // session to have it enabled (raise with guidance otherwise; files
    // without ids then fail Spark-side rather than misread).
    val cmapMode = metaConfiguration
      .getOrElse("delta.columnMapping.mode", "none")
    require(cmapMode == "none" || cmapMode == "name" || cmapMode == "id",
      s"unsupported Delta columnMapping mode '$cmapMode'")
    if (cmapMode == "id") {
      require(spark.conf.get("spark.sql.parquet.fieldId.read.enabled",
        "false") == "true",
        "Delta columnMapping mode 'id' needs " +
          "spark.sql.parquet.fieldId.read.enabled=true in this session")
    }
    val physName: Map[String, String] =
      if (cmapMode == "none") schema.fieldNames.map(n => n -> n).toMap
      else schema.fields.map { f =>
        require(f.metadata.contains("delta.columnMapping.physicalName"),
          s"column mapping: field ${f.name} has no physicalName")
        f.name -> f.metadata.getString("delta.columnMapping.physicalName")
      }.toMap
    val fieldIdMeta: Map[String, org.apache.spark.sql.types.Metadata] =
      if (cmapMode != "id") Map.empty
      else schema.fields.map { f =>
        require(f.metadata.contains("delta.columnMapping.id"),
          s"column mapping id mode: field ${f.name} has no id")
        f.name -> new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id",
            f.metadata.getLong("delta.columnMapping.id"))
          .build()
      }.toMap
    // column mapping applies at EVERY nesting level: column-mapped
    // parquet files carry physical names inside nested struct/array/map
    // types too, so the pinned read schema must rename (and, in id
    // mode, field-id-annotate) recursively — a top-level-only rename
    // would silently null every nested field
    def physField(f: StructField): StructField = {
      require(f.metadata.contains("delta.columnMapping.physicalName"),
        s"column mapping: nested field ${f.name} has no physicalName")
      val meta =
        if (cmapMode != "id") org.apache.spark.sql.types.Metadata.empty
        else {
          require(f.metadata.contains("delta.columnMapping.id"),
            s"column mapping id mode: nested field ${f.name} has no id")
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id",
              f.metadata.getLong("delta.columnMapping.id")).build()
        }
      StructField(f.metadata.getString("delta.columnMapping.physicalName"),
        physType(f.dataType), f.nullable, meta)
    }
    def physType(dt: DataType): DataType =
      if (cmapMode == "none") dt
      else dt match {
        case st: StructType => StructType(st.fields.map(physField))
        case at: org.apache.spark.sql.types.ArrayType =>
          at.copy(elementType = physType(at.elementType))
        case mt: org.apache.spark.sql.types.MapType =>
          mt.copy(keyType = physType(mt.keyType),
            valueType = physType(mt.valueType))
        case other => other
      }
    def hasStruct(dt: DataType): Boolean = dt match {
      case _: StructType => true
      case at: org.apache.spark.sql.types.ArrayType => hasStruct(at.elementType)
      case mt: org.apache.spark.sql.types.MapType =>
        hasStruct(mt.keyType) || hasStruct(mt.valueType)
      case _ => false
    }

    // tombstone replay already reconciled by replayState (live iff the
    // latest add is at least as new as the latest remove); decode the
    // carried add structs into the (path, pv, stats, dv) planning tuples
    val liveAll = rs.liveAdds.map(a => (a.getString(0),
      Option(a.getMap[String, String](1)).map(_.toMap)
        .getOrElse(Map.empty[String, String]),
      if (a.isNullAt(4)) null else a.getString(4),
      if (a.isNullAt(5)) null else a.getStruct(5)))

    // stats-based file skipping: drop files the caller's stats
    // predicate rejects; files without stats are conservatively kept
    val live = if (keep == null) liveAll
      else liveAll.filter { case (_, _, stats, _) =>
        stats == null || keep(stats)
      }

    require(live.nonEmpty, s"empty snapshot of $table")
    val dataFields = schema.filterNot(f => partCols.contains(f.name))
    val dataSchema = StructType(dataFields.map(f =>
      StructField(physName(f.name), physType(f.dataType), f.nullable,
        fieldIdMeta.getOrElse(f.name,
          org.apache.spark.sql.types.Metadata.empty))))

    // ---- deletion vectors: decode descriptors to (fileName, pos) ----
    // DV bytes are metadata-scale (the bitmap of ONE file's deleted
    // ordinals); decoded on the driver like the file list itself, then
    // anti-joined DISTRIBUTED against _metadata.row_index below
    import graft.functions.DeletionVectors
    def baseName(rel: String): String = {
      val p = uriDecode(rel)
      p.substring(p.lastIndexOf('/') + 1)
    }
    val hasDv = live.exists(_._4 != null)
    val dvPositions: Seq[(String, Long)] =
      if (!hasDv) Nil
      else {
        val names = live.map(f => baseName(f._1))
        require(names.distinct.length == names.length,
          s"duplicate data file names in $table — cannot apply deletion " +
            "vectors unambiguously")
        live.toSeq.flatMap { case (rel, _, _, dvRow) =>
          if (dvRow == null) Nil
          else {
            val storage = dvRow.getString(0)
            val poi = dvRow.getString(1)
            val positions: Array[Long] = storage match {
              case "i" =>
                // inline base85 pads the final 4-byte block with zeros;
                // sizeInBytes is the true data length
                val raw = DeletionVectors.base85Decode(poi)
                val size = dvRow.getInt(3)
                require(size >= 0 && raw.length >= size &&
                  raw.length - size < 4,
                  s"inline deletion vector length ${raw.length} does not " +
                    s"carry sizeInBytes $size")
                DeletionVectors.decodeBitmapArray(
                  java.util.Arrays.copyOf(raw, size))
              case "p" | "u" =>
                val dvPath =
                  if (storage == "p") {
                    val p = new Path(poi)
                    if (p.isAbsolute || poi.contains(":/")) p
                    else new Path(table, poi)
                  } else {
                    require(poi.length >= 20,
                      s"bad u-storage deletion vector id '$poi'")
                    val prefix = poi.dropRight(20)
                    val uuid = DeletionVectors.uuidFromBase85(poi.takeRight(20))
                    val name = s"deletion_vector_$uuid.bin"
                    if (prefix.isEmpty) new Path(table, name)
                    else new Path(new Path(table, prefix), name)
                  }
                val st = fs.getFileStatus(dvPath)
                require(st.getLen <= (1 << 28),
                  s"deletion vector file too large: $dvPath")
                val in = fs.open(dvPath)
                val bytes = try {
                  val out = new java.io.ByteArrayOutputStream(st.getLen.toInt)
                  val buf = new Array[Byte](1 << 16)
                  var n = in.read(buf)
                  while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
                  out.toByteArray
                } finally in.close()
                DeletionVectors.decodeFromFile(bytes,
                  if (dvRow.isNullAt(2)) 1 else dvRow.getInt(2),
                  dvRow.getInt(3))
              case other =>
                sys.error(s"unsupported deletion vector storageType '$other'")
            }
            val card = dvRow.getLong(4)
            require(positions.length.toLong == card,
              s"deletion vector cardinality mismatch: decoded " +
                s"${positions.length}, descriptor says $card")
            val fn = baseName(rel)
            positions.toSeq.map(pos => (fn, pos))
          }
        }
      }
    require(dvPositions.length <= DeletionVectors.MaxPositions,
      s"deletion vectors name ${dvPositions.length} positions — past " +
        "this reader's cap")

    // physical→logical renames happen HERE, so everything downstream
    // (partition attach, DV anti-join, caller) sees logical names; a
    // nested type renames via a positional struct cast back to the
    // logical field names
    val renameCols = dataFields.map { f =>
      val c = col(physName(f.name))
      (if (cmapMode != "none" && hasStruct(f.dataType)) c.cast(f.dataType)
       else c).as(f.name)
    }
    // `_metadata.file_path` renders as a URI, so the DV/partition join
    // key must %XX-decode the basename to match the log-side decoded
    // name (space, '%', '#' in file names would otherwise silently
    // keep their deleted rows). When every live basename is
    // escape-free (this writer's part-NNNNN names always are) the URI
    // rendering is the identity, so the per-ROW decode work is skipped
    // — at 100 TB the join key is then one substring scan per row
    // instead of substring + regexp + %XX decode.
    val basenames = live.map(f => baseName(f._1))
    val escapeFree = basenames.forall(_.forall(ch =>
      ch.isLetterOrDigit || ch == '.' || ch == '_' || ch == '-'))
    val rawName = substring_index(col("_metadata.file_path"), "/", -1)
    val runtimeName = if (escapeFree) rawName
      else url_decode(regexp_replace(rawName, "\\+", "%2B"))
    val outCols = schema.fieldNames.toSeq ++
      (if (hasDv) Seq("__f", "__p") else Nil)
    val uniqueBasenames = basenames.distinct.length == basenames.length
    val union = if (partCols.isEmpty || uniqueBasenames) {
      // ONE parquet relation over every live file — planning cost is
      // one relation, not one per partition tuple (a 100 TB table
      // carries thousands of tuples; the per-tuple relations + N-way
      // union were pure Catalyst/file-index overhead per read).
      // Partition columns attach through a broadcast basename→tuple
      // join, the same pattern dmlTarget uses; partition-level FILE
      // skipping stays in the planning layer (prunedSnapshot*), which
      // filters the live list before this relation is built.
      val paths = live.map { case (rel, _, _, _) =>
        new Path(table, uriDecode(rel)).toString }
      val base0 = spark.read.schema(dataSchema).parquet(paths.toSeq: _*)
      val needFile = hasDv || partCols.nonEmpty
      val base = if (!needFile) base0.select(renameCols: _*)
        else base0.select(renameCols ++ Seq(runtimeName.as("__f")) ++
          (if (hasDv) Seq(col("_metadata.row_index").as("__p"))
           else Nil): _*)
      val withPv = if (partCols.isEmpty) base
        else {
          val pvRows = live.toSeq.map { case (rel, pv, _, _) =>
            org.apache.spark.sql.Row.fromSeq(baseName(rel) +:
              partCols.map(pc => pv.get(physName(pc)).orNull))
          }
          val pvSchema = StructType(StructField("__f", StringType) +:
            partCols.map(pc => StructField(s"__pv_$pc", StringType)).toSeq)
          val pvDf = broadcast(spark.createDataFrame(
            spark.sparkContext.parallelize(pvRows, 1), pvSchema))
          partCols.foldLeft(base.join(pvDf, Seq("__f"))) { (d, pc) =>
            val f = schema.find(_.name == pc).getOrElse(
              sys.error(s"partition column $pc missing from schema"))
            d.withColumn(pc, col(s"__pv_$pc").cast(f.dataType))
          }
        }
      withPv.select(outCols.map(col): _*)
    } else {
      // basenames collide across partition directories (a foreign
      // writer's layout): the broadcast join key would be ambiguous,
      // so fall back to one read per distinct partition tuple with
      // the tuple attached as CAST literals
      val groups = live.groupBy(_._2).toSeq.sortBy(_._1.toSeq.sortBy(_._1)
        .map { case (k, x) => s"$k=$x" }.mkString(","))
      groups.map { case (pv, files) =>
        val paths = files.map { case (rel, _, _, _) =>
          new Path(table, uriDecode(rel)).toString
        }
        val base0 = spark.read.schema(dataSchema).parquet(paths.toSeq: _*)
        val base = if (!hasDv) base0.select(renameCols: _*)
          else base0.select(renameCols ++ Seq(
            runtimeName.as("__f"),
            col("_metadata.row_index").as("__p")): _*)
        partCols.foldLeft(base) { (df, pc) =>
          val f = schema.find(_.name == pc)
            .getOrElse(sys.error(s"partition column $pc missing from schema"))
          df.withColumn(pc,
            pv.get(physName(pc)).map(v => lit(v).cast(f.dataType))
              .getOrElse(lit(null).cast(f.dataType)))
        }.select(outCols.map(col): _*)
      }.reduce(_ unionByName _)
    }
    val data =
      if (!hasDv) union
      else {
        val sq = spark
        import sq.implicits._
        union.join(dvPositions.toDF("__f", "__p"), Seq("__f", "__p"),
          "left_anti").drop("__f", "__p")
      }
    // liveFilePaths keep the RAW log-recorded strings: a later
    // tombstone must match the add's path byte-for-byte
    Pruned(liveAll.length, live.length, data,
      live.map { case (rel, _, _, _) => rel }.toSeq)
  }
}
